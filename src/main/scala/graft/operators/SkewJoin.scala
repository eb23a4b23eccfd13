package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skewed-key mitigation, the explicit (non-AQE) variants.
  *
  * AQE's skew-join split handles sort-merge skew at runtime, but only
  * after a full skewed shuffle is planned; these operators change the
  * SHAPE so the hot key never lands on one reducer in the first place —
  * the pattern to reach for when one key holds 1% of 100 TB.
  */
object SkewJoin {

  /** Salted equi-join of a large skewed side against a small side. Every
    * skewed-side row gets ONE deterministic salt from `spreadBy` (any
    * row-level column spreads a hot key across `salts` reducers); the
    * small side replicates `salts` ways. The join becomes an equi-join
    * on (key, salt), each skewed row still meets each matching small row
    * exactly once, so the result is row-identical to the plain join —
    * only the shuffle distribution changes. Cost: small side × salts,
    * which is why this wants a dimension-sized right side. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, skewedKey: Column,
      smallKey: Column, spreadBy: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = skewed.withColumn("_salt_l", pmod(hash(spreadBy), lit(salts)))
    val r = small.withColumn("_salt_r",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, skewedKey === smallKey && col("_salt_l") === col("_salt_r"))
      .drop("_salt_l", "_salt_r")
  }

  /** Skew-safe distinct count per key: shuffling on (key, value) first
    * spreads a hot key across reducers proportionally to its distinct
    * values; the second aggregation then carries one row per (key,
    * value) — never the hot key's raw rows — before the final per-key
    * count. Equivalent to countDistinct(value) grouped by key. */
  def distinctCountByKey(df: DataFrame, key: Column, value: Column,
      keyName: String = "key", countName: String = "n_distinct"): DataFrame =
    df.select(key.as(keyName), value.as("_v"))
      .distinct()
      .groupBy(keyName)
      .agg(count(lit(1)).as(countName))
}
