package graft.tools

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Head-to-head growth measurement for the exhaustive vs two-level
  * semDedup assignment (round 14): the sf1/sf3 parquet fixtures top out
  * at 60k vectors, below the two-level crossover (its fixed stage
  * overheads — coarse pass, candidate join, one linear corpus shuffle —
  * still dominate there, masking the N² vs ~N^1.5 separation the design
  * buys). [[FixtureGen.embeddings]] is a deterministic in-memory
  * generator, so this main scales the VECTOR corpus past the parquet
  * fixtures and times both operators on identical in-session corpora:
  * `runMain graft.tools.TwoLevelBench 60000 120000 240000` prints one
  * JSON line with per-size medians of 3 for each operator.
  *
  * Cost model being tested: exhaustive = N·k dots with k = autoCells ∝
  * N (the 200-row cell cap forces cells ∝ N, so the assignment pass is
  * N²/62); two-level = N·√k coarse dots + CoarseProbes·N·√k candidate
  * rows — per doubling of N the exhaustive pass quadruples while the
  * two-level grows ×2^1.5 ≈ 2.8. */
object TwoLevelBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(60000L, 120000L, 240000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(df: => DataFrame): Double = {
      val trio = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        graft.GraftCaches.releaseAll()
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.catalog.clearCache()
      graft.GraftCaches.releaseAll()
      System.gc()
      trio(1)
    }
    val rows = sizes.map { n =>
      val emb = FixtureGen.embeddings(spark, n / 20000.0)
      val k = Similarity.autoCells(n)
      val exact = time(Similarity.semDedup(emb, "vec_id", "embedding",
        threshold = 0.3, k = k, trainIters = 1))
      val two = time(Similarity.semDedup2L(emb, "vec_id", "embedding",
        threshold = 0.3, k = k, trainIters = 1))
      println(s"[2lbench] n=$n cells=$k exact=${f"$exact%.2f"}s two_level=${f"$two%.2f"}s")
      s"""{"n":$n,"cells":$k,"exact_sec":$exact,"two_level_sec":$two}"""
    }
    println(s"""{"metric":"two_level_crossover","sizes":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
