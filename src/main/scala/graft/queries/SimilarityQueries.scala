package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Similarity-search queries over `embeddings`, oracle-checked: the DuckDB
  * SQL rebuilds the identical double-precision left-fold dot products
  * (list_reduce with an explicit 0.0 seed — never list_sum, whose reduction
  * order is unspecified), so sims are bit-equal across engines.
  */
object SimilarityQueries {

  /** Inline SQL for the left-fold dot product of two vector expressions. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a)+1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x,y) -> x+y)"

  /** Norms are precomputed per vector (CTE column `nrm`), mirroring the
    * Spark side — same expression tree, so sims stay bit-equal. */
  private def cosSql(a: String, b: String, an: String, bn: String): String =
    s"${dotSql(a, b)} / ($an * $bn)"

  private val eCte: String =
    s"e0 AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)"

  private val bucketSql: String =
    """list_reduce(list_prepend(0::BIGINT, list_transform(range(0,8), j ->
      |   CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len(embedding)+1), i ->
      |        embedding[i]::DOUBLE * (CASE WHEN ((i*31 + j*17) % 7) % 2 = 0 THEN 1.0 ELSE -1.0 END))), (x,y) -> x+y) > 0
      |   THEN (1::BIGINT << j) ELSE 0 END)), (a,b) -> a+b)""".stripMargin

  /** Brute-force cosine top-10 for the 5 query vectors (vec_id < 5). */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        col("vec_id") < 5, k = 10)
      .orderBy("q_id", "rank")

  val cosineTopKSql: String =
    s"""WITH $eCte,
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm FROM e0 WHERE vec_id < 5),
       |s AS (SELECT q.q_id, e.vec_id, ${cosSql("q.qv", "e.embedding", "q.qnrm", "e.nrm")} AS sim
       |      FROM q JOIN e0 e ON e.vec_id != q.q_id)
       |SELECT q_id, vec_id, sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM s) t
       |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** LSH bucket assignment for every vector (the ANN index relation). */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        Similarity.lshBucket(Similarity.toDoubleVec(col("embedding"))).as("bucket"))
      .orderBy("vec_id")

  val lshBucketsSql: String =
    s"SELECT vec_id, $bucketSql AS bucket\nFROM embeddings ORDER BY vec_id"

  /** Approximate top-10: candidates restricted to the query's LSH bucket. */
  def annLshTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        col("vec_id") < 5, k = 10)
      .orderBy("q_id", "rank")

  val annLshTopKSql: String =
    s"""WITH $eCte,
       |e AS (SELECT vec_id, embedding, nrm, $bucketSql AS bucket FROM e0),
       |q AS (SELECT vec_id AS q_id, embedding AS qv, nrm AS qnrm, bucket AS q_bucket FROM e WHERE vec_id < 5),
       |s AS (SELECT q.q_id, e.vec_id, ${cosSql("q.qv", "e.embedding", "q.qnrm", "e.nrm")} AS sim
       |      FROM q JOIN e ON e.bucket = q.q_bucket AND e.vec_id != q.q_id)
       |SELECT q_id, vec_id, sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rank FROM s) t
       |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Embedding-cosine near-dup pairs within LSH buckets, sim >= 0.4. */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4)
      .orderBy("id_a", "id_b")

  val nearDupPairsSql: String =
    s"""WITH $eCte,
       |e AS (SELECT vec_id, embedding, nrm, $bucketSql AS bucket FROM e0)
       |SELECT id_a, id_b, sim FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS sim
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
       |WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_cosine_topk" -> (cosineTopK _),
    "embed_lsh_buckets" -> (lshBuckets _),
    "ann_lsh_topk" -> (annLshTopK _),
    "embed_neardup_pairs" -> (nearDupPairs _))

  val oracles: Map[String, String] = Map(
    "embed_cosine_topk" -> cosineTopKSql,
    "embed_lsh_buckets" -> lshBucketsSql,
    "ann_lsh_topk" -> annLshTopKSql,
    "embed_neardup_pairs" -> nearDupPairsSql)
}
