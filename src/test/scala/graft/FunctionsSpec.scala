package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAggregator}
import graft.operators.TextOps
import graft.sources.Tables

/** Native codegen expressions must be bit-identical to the interpreted,
  * SQL-reproducible folds the DuckDB oracles rebuild. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TopKAggregator: any reduce/merge split equals a full sort (property)") {
    val k = 5
    val agg = new TopKAggregator(k)
    val genCase = for {
      n <- Gen.choose(0, 25)
      // distinct ids; scores from a small pool so ties are common
      ids <- Gen.listOfN(n, Gen.choose(-50L, 50L)).map(_.distinct)
      sims <- Gen.listOfN(ids.length, Gen.oneOf(-1.5, -0.25, 0.0, 0.5, 0.5, 2.0, 7.25))
      split <- Gen.choose(0, ids.length)
    } yield (ids.zip(sims), split)
    (0 until 300).foreach { i =>
      val (obs, split) = genCase(Gen.Parameters.default, Seed(1000L + i)).get
      // expected: top-k by (sim desc, id asc) of the whole set
      val expected = obs.sortBy { case (id, s) => (-s, id) }.take(k)
      // actual: fold through an arbitrary two-buffer split, then merge
      val (l, r) = obs.splitAt(split)
      val bl = l.foldLeft(agg.zero)((b, x) => agg.reduce(b, ScoredId(x._1, x._2)))
      val br = r.foldLeft(agg.zero)((b, x) => agg.reduce(b, ScoredId(x._1, x._2)))
      val merged = agg.finish(agg.merge(bl, br))
      assert(merged.ids.toList === expected.map(_._1))
      assert(merged.sims.toList === expected.map(_._2))
    }
  }

  test("chunkTokens with overlap=0 reconstructs every document exactly (property)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val rebuilt = TextOps.chunkTokens(docs, "doc_id", "text", chunkSize = 7, overlap = 0)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("chunk_no"), col("chunk_text")))),
          s => s.getField("chunk_text"))).as("rebuilt"))
    val mismatch = docs.join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt")).count()
    assert(mismatch === 0)
    // with overlap, every chunk except a doc's last must be full-size
    val chunks = TextOps.chunkTokens(docs, "doc_id", "text", chunkSize = 32, overlap = 8)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val short = chunks
      .withColumn("last_no", max("chunk_no").over(w))
      .filter(col("chunk_no") < col("last_no") && col("n_tokens") =!= 32)
      .count()
    assert(short === 0)
  }

  test("codegen VecDot equals the HOF left-fold on every embedding pair") {
    import graft.operators.Similarity
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
    // self-dot over the corpus plus cross-dots against one fixed vector
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val mismatches = e.crossJoin(q)
      .select(
        Similarity.dot(col("v"), col("v")).as("d1"), hofDot(col("v"), col("v")).as("h1"),
        Similarity.dot(col("v"), col("qv")).as("d2"), hofDot(col("v"), col("qv")).as("h2"))
      .filter(col("d1") =!= col("h1") || col("d2") =!= col("h2"))
      .count()
    assert(mismatches === 0)
  }

  test("codegen Simhash32 equals the HOF vote fold on every document") {
    // the reference formulation: floor(h / 2^j) % 2 bit votes, 2^j packing
    def hofSimhash(hs: org.apache.spark.sql.Column) =
      aggregate(
        sequence(lit(0), lit(31)),
        lit(0L),
        (acc, j) => {
          val bitOf = (h: org.apache.spark.sql.Column) =>
            pmod(floor(h / pow(lit(2.0), j)).cast("long"), lit(2L))
          val vote = aggregate(hs, lit(0L),
            (s, h) => s + when(bitOf(h) === 1, 1L).otherwise(-1L))
          acc + when(vote > 0, pow(lit(2.0), j).cast("long")).otherwise(0L)
        })
    val hs = TextOps.wordHashes(col("text"))
    val mismatches = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextOps.simhash32(hs).as("a"), hofSimhash(hs).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(mismatches === 0)
  }

  test("codegen WindowFoldHashes equals the HOF word-hash fold for w in {3, 8, 13}") {
    // The reference formulation: per-word poly-hash then a slice-fold per
    // window — exactly what the DuckDB oracles rebuild with list_reduce.
    def hofWindows(ws: org.apache.spark.sql.Column, w: Int) =
      element_at(transform(array(transform(ws, t => graft.functions.PolyHash.hash(t))), whs =>
        transform(sequence(lit(1), size(whs) - (w - 1)), i =>
          aggregate(slice(whs, i, lit(w)), lit(0L),
            (acc, x) => (acc * 31 + x) % graft.functions.PolyHash.Mod))), 1)
    val ws = TextOps.words(col("text"))
    for (w <- Seq(3, 8, 13)) {
      val mismatches = Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(size(ws) >= w)
        .select(graft.functions.WindowFoldHashes.of(ws, w).as("a"),
          hofWindows(ws, w).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(mismatches === 0, s"w=$w fold diverged from the HOF reference")
    }
  }

  test("JaroWinkler matches DuckDB jaro_winkler_similarity on pinned pairs") {
    // Expected values computed by DuckDB 1.0's independent implementation
    // (the oracle side of name_match_jw / record_linkage_fs); exact double
    // equality is the contract — JW is pure rational arithmetic.
    val pinned = Seq(
      ("martha", "marhta") -> 0.9611111111111111, // transposition + boost
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964,
      ("abcdef", "abxxxx") -> 0.5555555555555555, // jaro <= 0.7: no boost
      ("crate", "trace") -> 0.7333333333333334, // boost branch, prefix 0
      ("small ring", "small rivet") -> 0.9054545454545454,
      ("a", "") -> 0.0, // either side empty -> 0
      ("", "") -> 0.0, // DuckDB: empty-empty is 0, not 1
      ("xy", "yx") -> 0.0, // window 0: no cross-position matches
      ("same", "same") -> 1.0)
    pinned.foreach { case ((a, b), expected) =>
      assert(graft.functions.JaroWinkler.jwString(a, b) === expected, s"($a, $b)")
    }
    // and through the codegen path (both argument orders — JW is symmetric)
    import spark.implicits._
    val df = pinned.map { case ((a, b), e) => (a, b, e) }.toDF("a", "b", "e")
    val viaExpr = df.select(
      graft.functions.JaroWinkler.of(col("a"), col("b")).as("f"),
      graft.functions.JaroWinkler.of(col("b"), col("a")).as("r"), col("e"))
    assert(viaExpr.filter(col("f") =!= col("e") || col("r") =!= col("e")).count() === 0)
  }

  test("JaroWinkler property: byte implementation equals an independent char reference") {
    // Straightforward O(n*m) String-indexed reference, written against the
    // published definition rather than sharing the production code's byte
    // arrays — a latent-divergence differential beyond the pinned pairs.
    def refJw(s1: String, s2: String): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      if (s1 == s2) return 1.0
      val win = math.max(math.max(l1, l2) / 2 - 1, 0)
      val m2 = Array.fill(l2)(false)
      val matched1 = scala.collection.mutable.ArrayBuffer.empty[Char]
      for (i <- 0 until l1) {
        val hit = (math.max(0, i - win) to math.min(l2 - 1, i + win))
          .find(j => !m2(j) && s1(i) == s2(j))
        hit.foreach { j => m2(j) = true; matched1 += s1(i) }
      }
      if (matched1.isEmpty) return 0.0
      val matched2 = (0 until l2).filter(m2).map(s2)
      val t = matched1.zip(matched2).count { case (a, b) => a != b } / 2
      val m = matched1.size.toDouble
      val j = (m / l1 + m / l2 + (m - t) / m) / 3.0
      if (j > 0.7) {
        val p = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.size
        j + p * 0.1 * (1.0 - j)
      } else j
    }
    val rnd = new scala.util.Random(20260815L)
    def randStr() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    (0 until 20000).foreach { i =>
      val (a, b) = (randStr(), randStr())
      assert(graft.functions.JaroWinkler.jwString(a, b) === refJw(a, b), s"#$i ($a, $b)")
    }
  }

  test("jaro_winkler is SQL-callable and in [0,1] over real name pairs") {
    graft.sources.Tables.registerViews(spark, "/root/testdata/sf0.001")
    val r = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").collect()(0)
    assert(r.getDouble(0) === 0.9611111111111111)
    val bad = spark.sql(
      """SELECT jaro_winkler(a.p_name, b.p_name) AS jw
        |FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1""".stripMargin)
      .filter(col("jw") < 0.0 || col("jw") > 1.0 || col("jw").isNull)
      .count()
    assert(bad === 0)
  }

  test("window_fold_hashes is SQL-callable and empty below w") {
    graft.sources.Tables.registerViews(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT size(window_fold_hashes(array('a','b','c','d'), 3)) AS n3,
        |       size(window_fold_hashes(array('a','b'), 3)) AS n0""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 0)
  }
}
