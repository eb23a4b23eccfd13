package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
object CkptTest {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = spark.range(2000).select(col("id").as("a"), (col("id") * 7 % 997).as("b"))
    val cpRep = df.repartition(4, col("b")).localCheckpoint(true)
    val cpRep2 = df.select(col("b"), col("a").as("a2")).repartition(4, col("b")).localCheckpoint(true)
    val j = cpRep.join(cpRep2, "b")
    j.write.format("noop").mode("overwrite").save()
    println("=== join of two repartition(4,b) checkpoints (broadcast off) ===")
    println(j.queryExecution.executedPlan.toString.linesIterator.take(20).mkString("\n"))
    val g = cpRep.groupBy("b").agg(sum("a"))
    g.write.format("noop").mode("overwrite").save()
    println("=== groupBy(b) over repartition(4,b) checkpoint ===")
    println(g.queryExecution.executedPlan.toString.linesIterator.take(15).mkString("\n"))
    spark.stop()
  }
}
