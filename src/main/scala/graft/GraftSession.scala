package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place for every config the
  * engine depends on, so a user embedding graft in their own app gets
  * the same behavior as the Verify/Bench mains.
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong` — the events fixtures carry
  *    TIMESTAMP(NANOS), which the vectorized reader otherwise rejects;
  *    set once here instead of mutating a live session mid-read.
  *  - `spark.sql.shuffle.partitions` sized to the core count — 200-way
  *    shuffles of local data are pure overhead; on a real cluster pass
  *    `shufflePartitions` ≈ 2-3× total executor cores.
  *  - UTC session time zone — every date/timestamp oracle assumes it.
  *  - RocksDB state store provider — required by `transformWithState`
  *    (TypeStats) even in batch mode, and the right default at scale
  *    anyway: state lives off-heap/on-disk with incremental checkpoints
  *    instead of the HDFS-backed provider's full in-memory maps.
  *  - [[graft.plans.GraftExtensions]] registered, so the abs-range join
  *    rewrite (and future Catalyst extensions) are active.
  */
object GraftSession {

  /** Builder preconfigured for a local run; call `.getOrCreate()`, or
    * chain further `.config(...)` overrides first. */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Option[Int] = None): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // AQE for CACHED plans (round-14 optimization, guide §2.2/§2.4):
      // by default Spark plans the body of a persisted relation WITHOUT
      // adaptive execution so its output partitioning stays stable for
      // downstream reuse — which freezes every GraftCaches.track'd
      // working set (LSH bands, shingle sets, ANN index relations) at
      // the static spark.sql.shuffle.partitions regardless of its actual
      // size, and every consumer (and every union of consumers) inherits
      // those partition counts. With AQE allowed, cached relations
      // coalesce to size-appropriate partition counts — the same
      // scale-adaptive partitioning the uncached paths already get.
      // Measured (Profile, sf0.1): semdedup_clusters 1042 → 102 tasks,
      // executor time 141 s → 6.7 s; media_neardup_clusters 97 s → 2.8 s.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // coalescePartitions.parallelismFirst stays at its DEFAULT (true):
      // an A/B with the Profile tool showed `false` over-coalesces any
      // stage whose shuffle is merely moderate (weighted_median 21 MB,
      // ppjoin 10 MB, pagerank_suppliers 76 MB) into ONE task —
      // serializing ~1 s of real CPU that the parallelism-first default
      // spreads across cores (pagerank_suppliers 6.6 s → 4.6 s,
      // weighted_median 4.8 s → 3.4 s, ppjoin 4.3 s → 2.7 s at sf0.1) —
      // while on the tiny-shuffle iterated operators both settings
      // produce identical task counts. At cluster scale the advisory
      // partition size governs either way once bytes/cores exceeds it.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .withExtensions(new graft.plans.GraftExtensions())
}
