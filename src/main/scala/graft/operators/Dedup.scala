package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Deduplication operators (SURVEY north-star). Four families:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash, and n-gram Jaccard verification with blocking.
  *
  * Scale design: every candidate-generation path is
  * shuffle-on-a-small-key — LSH pairs shuffle only (id, band, key) rows,
  * never document text; the quadratic step is confined to rows sharing a
  * band key (by construction near-duplicates), and blocking keys bound the
  * Jaccard verify join. At 100 TB the map side computes signatures in one
  * codegen'd pass over the corpus; the reduce side sees kilobytes per key.
  */
object Dedup {
  import TextOps._

  /** Exact dedup: group identical payloads, keep the smallest id.
    * For 100 TB inputs group on a hash of the payload first (same plan
    * shape, fixed-width shuffle key) — see fingerprint op. */
  def exactGroups(docs: DataFrame, id: String, payload: String): DataFrame =
    docs.groupBy(payload)
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_copies"))
      .select("keeper", "n_copies")

  /** (id, hs) where hs = distinct 3-word-shingle hashes; docs with < 3
    * words carry no shingles and are dropped (can't near-dup match). */
  def shingleSets(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), words(col(text)).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col(id), shingleHashes(col("ws")).as("hs"))

  /** MinHash signature relation: id, mh0..mh7. */
  def minhashSignatures(docs: DataFrame, id: String, text: String): DataFrame =
    shingleSets(docs, id, text).select(
      col(id) +: MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
        minhash(col("hs"), a, b).as(s"mh$i")
      }: _*)

  /** LSH bands: 2 bands x 4 rows — P(candidate) = 1-(1-j^4)^2, steep
    * around j≈0.5. Emits (id, band, key). */
  def lshBands(docs: DataFrame, id: String, text: String): DataFrame = {
    val hs = col("hs")
    shingleSets(docs, id, text)
      .select(col(id), explode(array(
        struct(lit(0).as("band"), bandKey(hs, MinhashSeeds.take(4)).as("key")),
        struct(lit(1).as("band"), bandKey(hs, MinhashSeeds.drop(4)).as("key")))).as("b"))
      .select(col(id), col("b.band").as("band"), col("b.key").as("key"))
  }

  /** Distinct candidate pairs from band-key equality (doc_a < doc_b).
    *
    * The band relation is materialized (`cache`) before the self-join:
    * Catalyst's projection collapsing would otherwise inline the whole
    * shingle→hash→minhash expression tree into BOTH join sides and
    * re-evaluate it per reference (measured 25x slowdown). At cluster
    * scale, write the signature relation to a table instead — same idea,
    * durable. */
  def lshCandidatePairs(docs: DataFrame, id: String, text: String): DataFrame = {
    val bands = lshBands(docs, id, text).cache()
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"))
      .distinct()
  }

  /** SimHash relation: id, 32-bit simhash of the distinct word-hash set. */
  def simhashes(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), simhash32(wordHashes(col(text))).as("simhash"))

  /** n-gram Jaccard near-dup pairs, blocked on (lang, length-bucket) so the
    * pairwise join is bounded per block; jacc over distinct 3-gram shingle
    * hashes (longs compare far cheaper than gram strings in the pairwise
    * step, and |A ∪ B| = |A|+|B|-|A ∩ B| needs only one set operation).
    * The gram relation is cached before the self-join (see
    * lshCandidatePairs). */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
      lang: String, nChars: String, threshold: Double): DataFrame = {
    val g = docs
      .select(col(id), col(lang), floor(col(nChars) / 64).as("bucket"),
        words(col(text)).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col(id), col(lang), col("bucket"), shingleHashes(col("ws")).as("grams"))
      .cache()
    val inter = size(array_intersect(col("a.grams"), col("b.grams")))
    g.as("a").join(g.as("b"),
        col(s"a.$lang") === col(s"b.$lang") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"),
        (inter.cast("double") /
          (size(col("a.grams")) + size(col("b.grams")) - inter)).as("jacc"))
      .filter(col("jacc") >= threshold)
  }
}
