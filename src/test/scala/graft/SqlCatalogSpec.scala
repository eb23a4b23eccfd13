package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The SQL-only door: Tables.registerViews + the zorder_code function
  * registration give a no-Scala user the full fixture surface through
  * spark.sql — including the nanos-repaired events view and re-pointing
  * views at a different scale factor. */
class SqlCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every fixture table is queryable via pure SQL after registerViews") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT COUNT(*) FROM $n").head().getLong(0) > 0L, n)
    }
    // events goes through the nanos repair: ts must be a usable timestamp
    val d = spark.sql(
      "SELECT CAST(MIN(ts) AS DATE) AS d0, COUNT(DISTINCT user_id) AS u FROM events").head()
    assert(d.getDate(0).toString === "2024-01-01")
    assert(d.getLong(1) > 0L)
    // the registered zorder_code function composes with the views
    val z = spark.sql(
      """SELECT MAX(zorder_code(l_partkey, l_suppkey)) AS mz FROM lineitem""").head()
    assert(z.getLong(0) > 0L)
  }

  test("every native engine function is SQL-callable and matches its Scala form") {
    import org.apache.spark.sql.functions.col
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    // poly_hash (string hash) and simhash32 (over the word-hash array),
    // SQL composition vs the Scala expression tree
    val sqlRow = spark.sql(
      """SELECT SUM(poly_hash(text)) AS ph,
        |       SUM(simhash32(transform(filter(split(text, ' '), x -> x != ''),
        |                               w -> poly_hash(w)))) AS sh
        |FROM documents""".stripMargin).head()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val wordHashes = org.apache.spark.sql.functions.transform(
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.split(col("text"), " "), w => w =!= ""),
      w => graft.functions.PolyHash.hash(w))
    val scalaRow = docs.agg(
      org.apache.spark.sql.functions.sum(graft.functions.PolyHash.hash(col("text"))),
      org.apache.spark.sql.functions.sum(graft.functions.Simhash32.of(wordHashes))).head()
    assert(sqlRow.getLong(0) === scalaRow.getLong(0), "poly_hash mismatch")
    assert(sqlRow.getLong(1) === scalaRow.getLong(1), "simhash32 mismatch")
    // vec_dot + lsh_band_key over embeddings (2- and 3-arg forms)
    val v = spark.sql(
      """SELECT SUM(vec_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>))) AS d,
        |       SUM(lsh_band_key(CAST(embedding AS ARRAY<DOUBLE>), 1)) AS k2,
        |       SUM(lsh_band_key(CAST(embedding AS ARRAY<DOUBLE>), 1, 12)) AS k3
        |FROM embeddings""".stripMargin).head()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(graft.operators.Similarity.toDoubleVec(col("embedding")).as("v"))
    val sc = emb.agg(
      org.apache.spark.sql.functions.sum(graft.operators.Similarity.dot(col("v"), col("v"))),
      org.apache.spark.sql.functions.sum(graft.functions.LshBandKey.key(col("v"), 1,
        graft.operators.Similarity.BandBits))).head()
    assert(v.getDouble(0) === sc.getDouble(0), "vec_dot mismatch")
    assert(v.getLong(1) === sc.getLong(1), "lsh_band_key mismatch")
    assert(v.getLong(2) === sc.getLong(1), "explicit-bits form should match the default")
    // a literal-typed misuse fails loudly, not silently
    val err = intercept[Exception](spark.sql(
      "SELECT lsh_band_key(CAST(embedding AS ARRAY<DOUBLE>), vec_id) FROM embeddings").collect())
    assert(err.getMessage.contains("literal INT"), s"got: ${err.getMessage}")
  }

  test("re-registering on another sfDir repoints the views") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val n1 = spark.sql("SELECT COUNT(*) FROM orders").head().getLong(0)
    Tables.registerViews(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT COUNT(*) FROM orders").head().getLong(0)
    assert(n2 > n1, s"sf0.01 view should see more orders: $n1 vs $n2")
    Tables.registerViews(spark, "/root/testdata/sf0.001")
  }
}
