package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression guard: the physical plan of every SparkEntry query must
  * keep the shape designed for 100 TB —
  *  - no CartesianProduct anywhere;
  *  - no BroadcastNestedLoopJoin except the one deliberate case
  *    (embed_cosine_topk: the exact baseline scores every corpus row per
  *    query by definition, joined on `id =!= q_id`);
  *  - point/range lookups (find_by_id / find_by_period) must push their
  *    predicates into the parquet scan (non-empty PushedFilters).
  * A refactor that silently degrades a bucket equi-join into a nested loop
  * or loses scan pushdown fails here, not in a 100 TB run. */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // embed_cosine_topk: the exact baseline scores the whole corpus per query
  // by definition; ivf_*: the index build/probe broadcasts 16 tiny centroids
  // against a scan — a deliberate broadcast nested loop over a constant side.
  // source_mix_weights: the corpus-total side is ONE aggregated row
  // cross-broadcast to k source rows — a deliberate scalar broadcast.
  // ann_recall and ivf_recall compose the brute-force baseline
  // (embed_cosine_topk's deliberate exact-scoring BNLJ) as their
  // ground-truth side; ivf_recall's approx side also probes the 16-tiny-
  // centroid constant relation like the other ivf_* queries.
  // cms_heavy_hitters: the same 1-row total cross-broadcast as
  // source_mix_weights. corpus_overlap: the exact-stats row and the
  // minhash-signature row are BOTH single-row aggregates joined into one
  // output row — a deliberate scalar cross-broadcast. (pq_* stay OFF this
  // list: codebook and LUT joins are equi-joins on (mi, code) — they must
  // plan as BroadcastHashJoin. delta_dedup too: every join is an
  // equi-join on band key / content hash / id.)
  private val bnljAllowed =
    Set("embed_cosine_topk", "ivf_assign", "ivf_topk", "ivf_train_assign",
      "ivf_kmeanspp_assign", "source_mix_weights", "ann_recall", "ivf_recall", "mrl_truncation_recall",
      // pq_recall: the truth side is the same deliberate exact-scoring BNLJ
      // as ann_recall/ivf_recall; the PQ side itself is equi-joined.
      "pq_recall",
      // ivfpq_*: the same deliberate 16-tiny-centroid probe broadcast
      // as ivf_topk (+ the exact-truth scoring side in the recall query).
      "ivfpq_topk", "ivfpq_recall",
      // pca_power: the 1-row iterate vector cross-broadcast onto the
      // corpus, once per power iteration — the scalar-broadcast shape.
      "pca_power",
      // token_coverage: the 1-row (total, n_types) cross-broadcast onto
      // the <=5 cutoff rows.
      "token_coverage",
      // source_minhash_overlap / source_overlap_audit: the
      // |sources|x|sources| signature pair enumeration is a deliberate
      // tiny-relation cross (<=20 rows per side, 8 longs each); the
      // audit's gram-level work is all equi-joined.
      "source_minhash_overlap", "source_overlap_audit",
      "cms_heavy_hitters", "zorder_cluster", "hist_quantiles",
      "corpus_overlap", "corpus_card", "type_cooccurrence",
      "decayed_engagement", "key_skew_profile", "mix_apply",
      // rfm_segments: decayed_engagement's 1-row max-date cross-broadcast.
      "rfm_segments",
      // bm25_search: the 1-row avgdl aggregate cross-broadcast onto the
      // scored postings; retrieve_rerank: the 1-row query-vector side
      // cross-broadcast onto the bounded candidate set. Both the same
      // deliberate scalar-broadcast shape as source_mix_weights.
      "bm25_search", "retrieve_rerank",
      // query_expansion / search_snippets: inherit bm25's 1-row avgdl
      // scalar cross-broadcast; their own joins are broadcast equi-joins.
      "query_expansion", "search_snippets",
      // rrf_fusion / ranking_eval: the same 1-row query-vector
      // cross-broadcast as retrieve_rerank, onto the bounded candidate set.
      "rrf_fusion", "ranking_eval",
      // bloom_fpr: the trailing 1-row member-count aggregate
      // cross-broadcast onto the 1-row probe stats — the same deliberate
      // scalar shape; the register probe itself is an equi-join on reg.
      "bloom_fpr",
      // semdedup: the cell assignment is the same deliberate
      // 16-tiny-centroid broadcast nested loop as the ivf_* family; the
      // within-cell pair stage itself is an equi-join on centroid_id.
      "semdedup",
      // semdedup_recall / semdedup_clusters: the same tiny-centroid
      // assignment broadcast (twice in recall: top-1 + probe-2 paths,
      // plus the one-Lloyd-step training assignment since round 12 —
      // still a ≤n/62-row centroid relation broadcast onto one corpus
      // scan); the exact truth baseline is the BLOCKED all-pairs
      // equi-join on (p, q) — never a Cartesian — and candidate pairing
      // is an equi-join on centroid_id.
      // semdedup_recall_sampled: identical shape with the truth relation
      // filtered to the deterministic hash sample first.
      "semdedup_recall", "semdedup_recall_t9", "semdedup_recall_sampled",
      "semdedup_clusters",
      // semdedup_2l / semdedup_recall_2l: the two-level assignment's
      // coarse pass is the same tiny-relation broadcast nested loop (√k
      // coarse centroids onto one corpus scan); the cell pass and the
      // pairing/truth stages are equi-joins.
      "semdedup_2l", "semdedup_recall_2l",
      // embedding_drift: the ivf_* 16-tiny-centroid assignment broadcast
      // plus the 1-row cohort-totals scalar cross-broadcast.
      "embedding_drift",
      // filter_funnel: the 1-row stage-count aggregate cross-broadcast
      // onto the 1-row quota aggregate — scalar broadcast, 1x1 rows.
      "filter_funnel",
      // temperature_mix / dedup_cluster_stats: the same deliberate 1-row
      // totals cross-broadcast as source_mix_weights (share denominators).
      "temperature_mix", "dedup_cluster_stats",
      // ks_drift: the 1-row cohort-totals scalar cross-broadcast onto the
      // distinct-score-level relation (same shape as source_mix_weights).
      "ks_drift",
      // domain_mixture_weights / mixture_resample_plan: the 1-row
      // totals aggregate cross-broadcast onto the per-source totals —
      // the source_mix_weights scalar shape.
      "domain_mixture_weights", "mixture_resample_plan",
      // bigram_lift: the 1-row (t_uni x t_bi) scalar cross-broadcast onto
      // the >=5-count bigram relation (same shape as source_mix_weights).
      "bigram_lift",
      // idle_customers: the 1-row positive-balance average scalar
      // cross-broadcast onto customer (the TPC-H Q22 threshold); the
      // no-orders test itself is a left-anti equi-join on custkey.
      "idle_customers",
      // ivf_probe_curve: ivf_topk's deliberate 16-tiny-centroid probe
      // broadcast, once per probe level of the sweep.
      "ivf_probe_curve",
      // conversion_lag_quantiles: hist_quantiles' 1-row totals + 3-row
      // quantile cross-broadcasts onto the lag-level relation.
      "conversion_lag_quantiles",
      // lsh_band_sweep: ann_recall's deliberate exact-scoring BNLJ on
      // the brute-force truth side (+ the 1-row candidate-count
      // cross-broadcast); the banded candidate joins are equi-joins.
      "lsh_band_sweep",
      // fk_integrity_audit: per edge, the 1-row keys x 1-row orphans
      // scalar cross-broadcast; the orphan probes are anti equi-joins.
      "fk_integrity_audit",
      // binary_embed_recall: the recall family's deliberate
      // exact-baseline BNLJ on BOTH sides (the Hamming scan is the
      // audited index; the cosine truth is the usual exact baseline).
      "binary_embed_recall",
      // source_term_signatures: the 1-row grand-total scalar
      // cross-broadcast onto the cell relation (source_mix_weights shape).
      "source_term_signatures",
      // layout_skipping_audit: zorder_cluster's 1-row maxima scalar
      // cross-broadcast onto the keyed relation, once per layout.
      "layout_skipping_audit",
      // colbert_maxsim_topk: the exact-baseline scan — the 4-row
      // query-vector bag cross-broadcast onto the corpus (the
      // embed_cosine_topk shape, multi-vector edition).
      "colbert_maxsim_topk",
      // hll_source_overlap / kmv_source_overlap: the s1 < s2 pair
      // inventory over the ≤|sources|-row sketch relation (both BNLJ
      // sides tiny by construction — 64 longs per source for KMV); the
      // register/word-hash joins themselves are equi-joins.
      "hll_source_overlap", "kmv_source_overlap",
      // basket_pairs: the 1-row order-total scalar cross-broadcast
      // onto the pair relation; the pair/count joins are equi-joins.
      "basket_pairs",
      // abc_classification: the 1-row grand-total scalar cross-broadcast
      // onto the ranked-part relation (basket_pairs shape).
      "abc_classification",
      // robust_trend: the pairwise-slope inequality join over the
      // |months|-bounded monthly relation (+ the 1-row stats/n_months
      // cross-broadcasts); calendar-bounded by construction.
      "robust_trend")

  private def planOf(name: String): String =
    try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
    finally GraftCaches.releaseAll() // tracked caches would leak into sibling
                                     // suites' plan shapes (round-6 flake class)

  // Partition-less WindowExec whitelist (round-7 VERDICT item 2): a global
  // window moves its ENTIRE input into one task, so it is only acceptable
  // over a relation whose size is bounded by construction — never by the
  // corpus/population. Every entry below names that bound. Anything else
  // must ride PrefixScan (running sums / ranks / ntile) instead.
  private val bareWindowAllowed: Set[String] = Set(
    "benford_audit",          // 9-row leading-digit relation
    "calibration_bins",       // <=11 confidence bins (qmicro div 100000, q in [0,1])
    "changepoint_scan",       // |days|-bounded daily-revenue relation
    "chi2_independence",      // |langs| x |sources| contingency cells
    "curriculum_schedule",    // |sources|-bounded quality-mass relation
    "dedup_method_agreement", // <=3-row method-status relation
    "encode_tokens",          // vocab_build's 100-row vocab (post-limit)
    "event_rate_anomaly",     // |days|-bounded daily-count relation
    "group_kfold",            // 5-row fold relation
    "growth_accounting",      // |months|-bounded cohort relation (per-cust lag IS partitioned)
    "hazard_table",           // duration-level relation (<=|distinct t_days|)
    "interleave_sources",     // |sources|-row index relation (per-source ranks ARE partitioned)
    "loo_source_influence",   // |sources|-bounded source-stats relation
    "lorenz_curve",           // 10-row decile relation (deciles themselves ride PrefixScan.ntile)
    "max_drawdown",           // |days|-bounded daily-net relation
    "mixture_resample_plan",  // |sources|-row quota relation (remainder rank + shortfall)
    "monthly_growth",         // |months|-bounded monthly-revenue relation
    "robust_trend",           // |months|**2-bounded pairwise-slope relation
    "pareto_frontier",        // <=1001 quality-level rows (post rn=1 filter)
    "retrieve_rerank",        // <=30-row rerank candidate set
    "revenue_autocorr",       // |days|-bounded daily-revenue relation
    "rrf_fusion",             // <=30-row fused candidate set
    "vocab_build",            // 100-row vocab (post TakeOrdered limit)
    "zipf_profile")           // 1024-row rank probe (post TakeOrdered limit)

  private def bareWindows(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    p match {
      case a: AdaptiveSparkPlanExec => bareWindows(a.inputPlan)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(w) ++ w.children.flatMap(bareWindows)
      case other => other.children.flatMap(bareWindows) ++
        other.subqueries.flatMap(bareWindows)
    }
  }

  test("no partition-less WindowExec outside the bounded-relation whitelist") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        finally GraftCaches.releaseAll()
      val n = bareWindows(plan).size
      if (n > 0 && !bareWindowAllowed(name)) Some(s"$name($n)") else None
    }
    assert(offenders.isEmpty,
      s"partition-less WindowExec (single-task at scale) in non-whitelisted " +
        s"queries: ${offenders.mkString(", ")}")
  }

  test("no CartesianProduct; BroadcastNestedLoopJoin only where whitelisted") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"$name plan has a CartesianProduct")
      if (!bnljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plan has an unexpected BroadcastNestedLoopJoin")
    }
  }

  // Global-sort discipline (round-10 VERDICT 5): Spark's RangePartitioning
  // exchange SAMPLES its child to pick range bounds, then executes it again
  // to shuffle — so everything between the range exchange and the nearest
  // re-readable boundary runs TWICE. Round 3 measured exactly this class:
  // range_join's trailing orderBy re-executed a whole join stage in the
  // sampling pass (15 s → 0.7 s once fixed). Re-readable boundaries make
  // the double execution cheap: another Exchange (shuffle files are
  // re-read, not recomputed), an InMemoryTableScan (cached), an RDDScan
  // (pinned localCheckpoint), or a limit (bounded rows). What must NOT sit
  // un-boundaried under a range exchange is recompute-expensive work: a
  // join, a Generate (explode), or a window — that is the regression this
  // rule makes structural.
  private val sortOverExpensiveAllowed: Map[String, String] = Map(
    "funnel_by_cohort" ->
      "the trailing sort sits above the stack() Generate over the |cohorts| x 3 funnel matrix — cohort months are calendar-bounded, and the Generate's input is the cohort aggregate (re-read from its own shuffle in the sampling pass)",
    "stream_delta_compress" ->
      "the trailing sort sits above the totals ⋈ kept join of two |event_type|-row (=5) aggregates — both sides re-read from their own shuffles; the re-probed relation is bounded by the type alphabet")

  test("RangePartitioning exchanges sit above re-readable boundaries, not raw joins/explodes/windows") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.{RDDScanExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec, GenerateExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.window.WindowExec

    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    // True if recompute-expensive work is reachable from `p` without
    // crossing a re-readable boundary.
    def expensiveBeneath(p: SparkPlan): Boolean = p match {
      case _: Exchange | _: InMemoryTableScanExec | _: RDDScanExec => false
      case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => false
      case _: BaseJoinExec | _: GenerateExec | _: WindowExec => true
      case other => other.children.exists(expensiveBeneath)
    }
    def offendingSorts(p: SparkPlan): Int = {
      val self = p match {
        case s: ShuffleExchangeExec
            if s.outputPartitioning.isInstanceOf[RangePartitioning] &&
              expensiveBeneath(s.child) => 1
        case _ => 0
      }
      self + p.children.map(offendingSorts).sum +
        p.subqueries.map(q => offendingSorts(unwrap(q))).sum
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan =
        try unwrap(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
        finally GraftCaches.releaseAll()
      val n = offendingSorts(plan)
      if (n > 0 && !sortOverExpensiveAllowed.contains(name)) Some(s"$name($n)") else None
    }
    assert(offenders.isEmpty,
      s"range-exchange directly over join/explode/window (the sampling pass " +
        s"re-executes that stage; pin or aggregate first): ${offenders.mkString(", ")}")
  }

  test("point/range lookups push predicates into the parquet scan") {
    Seq("find_by_id", "find_by_period").foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("PushedFilters: ["), s"$name scan reports no pushdown")
      assert(!plan.contains("PushedFilters: []"), s"$name has empty PushedFilters")
    }
  }
}
