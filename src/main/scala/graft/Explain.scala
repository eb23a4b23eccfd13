package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <sfDir> <query> [query...]`
  * prints the formatted physical plan of the named SparkEntry queries —
  * the feedback loop for shuffle/pushdown/codegen review (the "is this the
  * plan I'd want at 100 TB" check). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder(cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
