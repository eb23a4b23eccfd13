package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths (SURVEY north-star):
  *  - brute-force cosine top-k: exact baseline — a broadcast of the (small)
  *    query set against a single scan of the corpus; no shuffle of the
  *    corpus, the only exchange is the per-query top-k window.
  *  - random-hyperplane LSH bucketing: the scale path — each vector gets an
  *    int bucket from the sign pattern of 8 fixed ±1 hyperplanes; candidate
  *    generation becomes an equi-join on the bucket key, so the quadratic
  *    step is confined to bucket-local groups (IVF-style cell probing).
  *
  * All math is double-precision with a fixed left-to-right fold so results
  * are bit-reproducible across engines (the DuckDB oracles rebuild the same
  * expression tree). Hot-path note: these are higher-order-function
  * expressions (interpreted per element); if profiling shows them dominant
  * at scale the dot product drops into a native codegen Expression with the
  * same semantics.
  */
object Similarity {

  /** Cast an array<float> column to array<double> once, up front. */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Random-hyperplane LSH bucket: plane j's component i (1-based) is
    * +1 if ((i*31 + j*17) % 7) % 2 == 0 else -1 — a fixed pseudo-random
    * ±1 pattern reproducible in plain SQL. Bucket = 8 sign bits. */
  def lshBucket(v: Column, nPlanes: Int = 8): Column =
    aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L), (acc, j) => {
      val planeDot = aggregate(
        sequence(lit(1), size(v)),
        lit(0.0),
        (s, i) => s + element_at(v, i).cast("double") *
          when(((i * 31 + j * 17) % 7) % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
      acc + when(planeDot > 0, pow(lit(2.0), j).cast("long")).otherwise(0L)
    })

  /** Exact top-k: per query vector (small set, broadcast), the k nearest
    * corpus vectors by cosine; ties broken by candidate id. */
  def bruteForceTopK(corpus: DataFrame, id: String, vec: String,
      queryPred: Column, k: Int): DataFrame = {
    val e = corpus.select(col(id), toDoubleVec(col(vec)).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = e.filter(queryPred)
      .select(col(id).as("q_id"), col("v").as("qv"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(id).asc)
    e.join(broadcast(q), col(id) =!= col("q_id"))
      .select(col("q_id"), col(id),
        (dot(col("qv"), col("v")) / (col("q_nrm") * col("nrm"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: same ranking but candidates restricted to the
    * query's LSH bucket — the join is bucket-equality, not a cross join. */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
      queryPred: Column, k: Int): DataFrame = {
    val e = corpus.select(col(id), toDoubleVec(col(vec)).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("bucket", lshBucket(col("v")))
      .cache() // materialize the index relation once (see Dedup on collapse)
    val q = e.filter(queryPred)
      .select(col(id).as("q_id"), col("v").as("qv"), col("nrm").as("q_nrm"),
        col("bucket").as("q_bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col(id).asc)
    e.join(broadcast(q), col("bucket") === col("q_bucket") && col(id) =!= col("q_id"))
      .select(col("q_id"), col(id),
        (dot(col("qv"), col("v")) / (col("q_nrm") * col("nrm"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  /** Near-duplicate pairs by embedding cosine, LSH-bucket-blocked. */
  def nearDupPairs(corpus: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val e = corpus.select(col(id), toDoubleVec(col(vec)).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("bucket", lshBucket(col("v")))
      .cache() // materialize once; both self-join sides reuse it
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
