package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Mergeable frequency sketches for corpus-scale term statistics.
  *
  * Count-min sketch (Cormode & Muthukrishnan 2005): d hash rows × w
  * buckets of counters; every occurrence increments one cell per row,
  * a point estimate is the MIN over the term's d cells. Estimates are
  * one-sided (est >= exact, always) with overestimate bounded by
  * eps = e/w of the stream length at confidence 1 - (1/2)^d.
  *
  * Why this shape at 100 TB: the sketch relation is at most d·w rows
  * REGARDLESS of corpus size, built in one scan with full map-side
  * combining, and cells merge by plain SUM — per-shard/per-day sketches
  * union into a corpus sketch without touching the data again (the same
  * mergeability contract as the HLL registers in TextQueries). Exact
  * per-term counts at that scale would shuffle the full token stream;
  * the sketch shuffles ≤ d·w rows per partition.
  *
  * Hashing is the engine's cross-engine-reproducible discipline: the
  * term's [[PolyHash]] pushed through the seeded affine permutations of
  * [[TextOps.MinhashSeeds]] (a, b < 1e9 keep a·h+b inside int64), mod w
  * — every cell index is rebuildable in plain SQL, so sketch contents
  * and estimates are DuckDB-checkable bit for bit.
  */
object Sketches {

  /** 4 rows × 512 buckets: eps ≈ 0.5% of stream length at 94% per-query
    * confidence — plenty for heavy-hitter screening; raise w for tighter
    * error, the plan shape is unchanged. */
  val CmsDepth: Int = 4
  val CmsWidth: Int = 512

  /** Row-j cell index of a term: ((polyhash · a_j + b_j) mod P) mod w. */
  def cmsBucket(term: Column, j: Int, w: Int = CmsWidth): Column = {
    val (a, b) = TextOps.MinhashSeeds(j)
    (PolyHash.hash(term) * a + b) % PolyHash.Mod % w
  }

  /** Build the (row_j, bucket, cnt) sketch relation from a token stream:
    * one explode to d cells per occurrence, one groupBy over ≤ d·w groups
    * (fully map-side combined). The relation IS the sketch; merge shards
    * by cell-wise SUM. */
  def cmsSketch(tokens: DataFrame, term: String,
      d: Int = CmsDepth, w: Int = CmsWidth): DataFrame =
    tokens.select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row_j"), cmsBucket(col(term), j, w).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row_j").as("row_j"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a relation of distinct terms:
    * est = min over the term's d cells. The sketch (≤ d·w rows) is
    * broadcast — probing never shuffles the term relation. */
  def cmsEstimates(sketch: DataFrame, terms: DataFrame, term: String,
      d: Int = CmsDepth, w: Int = CmsWidth): DataFrame =
    terms.select(col(term), explode(array((0 until d).map(j =>
        struct(lit(j).as("row_j"), cmsBucket(col(term), j, w).as("bucket"))): _*)).as("c"))
      .select(col(term), col("c.row_j").as("row_j"), col("c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row_j", "bucket"))
      .groupBy(col(term))
      .agg(min(col("cnt")).as("est"))

  /** Bloom filter (Bloom 1970) completing the sketch triple next to CMS
    * (frequency) and the HLL registers (cardinality): set MEMBERSHIP with
    * no false negatives and a tunable false-positive rate. m bits live as
    * `m/32` 32-bit registers packed in BIGINTs ((register, bits) rows, so
    * shards merge by plain bitwise-OR across any partitioning — the same
    * mergeability contract as the CMS cells); k seeded affine
    * permutations of the element hash pick the bit positions, so every
    * bit index is rebuildable in plain SQL and the sketch is
    * DuckDB-checkable bit for bit. 32 bits per register keep every mask
    * below 2^31 — no signed-shift edge cases in either engine. */
  val BloomBits: Int = 65536
  val BloomK: Int = 3

  /** Bit index of hash-element h under permutation j. */
  def bloomBit(h: Column, j: Int): Column = {
    val (a, b) = TextOps.MinhashSeeds(j)
    (h * a + b) % PolyHash.Mod % BloomBits
  }

  /** Build the (reg, bits) register relation from a relation of element
    * hashes: one explode to k bits per element, one groupBy over ≤ m/32
    * groups (fully map-side combined via bit_or). The relation IS the
    * filter; merge shards with cell-wise bit_or. */
  def bloomSketch(elems: DataFrame, hashCol: String): DataFrame =
    elems.select(explode(array((0 until BloomK).map(j =>
        bloomBit(col(hashCol), j)): _*)).as("bit"))
      .select(expr("bit div 32").as("reg"),
        expr("shiftleft(cast(1 as bigint), cast(bit % 32 as int))").as("mask"))
      .groupBy("reg").agg(expr("bit_or(mask)").as("bits"))

  /** Probe a relation of element hashes against the register relation:
    * an element is bloom-positive iff ALL k of its bits are set. The
    * ≤ m/32-row sketch is broadcast; absent registers count as all-zero
    * (left join + coalesce), so probing never shuffles the elements. */
  def bloomProbe(sketch: DataFrame, elems: DataFrame, hashCol: String): DataFrame =
    elems.select(col(hashCol), explode(array((0 until BloomK).map(j =>
        bloomBit(col(hashCol), j)): _*)).as("bit"))
      .select(col(hashCol), expr("bit div 32").as("reg"),
        expr("cast(bit % 32 as int)").as("pos"))
      .join(broadcast(sketch), Seq("reg"), "left")
      .select(col(hashCol),
        expr("(shiftright(coalesce(bits, cast(0 as bigint)), pos) & 1) = 1").as("hit"))
      .groupBy(col(hashCol))
      .agg(min(col("hit")).as("bloom_pos"))
}
