package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Framework-overhead microbenchmark (round-14 diagnosis aid): times
  * repeated trivial jobs over tiny relations to separate per-job /
  * per-stage / per-task fixed costs from real operator work. Not part of
  * the query surface.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-60s med=${runs.sorted.apply(2)}%8.1f ms  runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }

    val df2k = spark.range(2000).select(col("id").as("a"), (col("id") * 7 % 997).as("b"))
    val cp32 = df2k.repartition(32).localCheckpoint(true)
    val cp64 = df2k.repartition(32).union(df2k.repartition(32)).localCheckpoint(true)
    val cp1 = df2k.coalesce(1).localCheckpoint(true)

    time("agg(sum) over 1-part checkpoint")(cp1.agg(sum("a")).collect())
    time("agg(sum) over 32-part checkpoint")(cp32.agg(sum("a")).collect())
    time("agg(sum) over 64-part checkpoint")(cp64.agg(sum("a")).collect())
    time("groupBy(b).count noop over 64-part cp") {
      cp64.groupBy("b").count().write.format("noop").mode("overwrite").save()
    }
    time("join cp64 x cp32 on b, agg") {
      cp64.join(cp32.select(col("b"), col("a").as("a2")), "b")
        .agg(sum("a2")).collect()
    }
    time("localCheckpoint(eager) of 32-part map") {
      df2k.repartition(32).select((col("a") + 1).as("a"), col("b")).localCheckpoint(true)
    }
    time("empty job: range(32).noop") {
      spark.range(32).repartition(32).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
