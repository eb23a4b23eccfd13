package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Deduplication operators (SURVEY north-star). Four families:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash, and exact n-gram Jaccard verification over the LSH
  * candidate set.
  *
  * Scale design: every candidate-generation path is
  * shuffle-on-a-small-key — LSH pairs shuffle only (id, band, key) rows,
  * never document text; the quadratic step is confined to rows sharing a
  * band key (by construction near-duplicates) and bounded by the
  * degenerate-bucket cap; the Jaccard verify joins gram arrays back by id
  * only for surviving candidate pairs. At 100 TB the map side computes
  * signatures in one codegen'd pass over the corpus; the reduce side sees
  * kilobytes per key.
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

  /** (id, band, key) from a precomputed (id, hs) shingle relation —
    * lets callers that also need the shingles (the Jaccard verify) compute
    * the expensive gram hashing exactly once. */
  def lshBandsFrom(shingles: DataFrame, id: String): DataFrame = {
    val hs = col("hs")
    shingles
      .select(col(id), explode(array(
        struct(lit(0).as("band"), bandKey(hs, MinhashSeeds.take(4)).as("key")),
        struct(lit(1).as("band"), bandKey(hs, MinhashSeeds.drop(4)).as("key")))).as("b"))
      .select(col(id), col("b.band").as("band"), col("b.key").as("key"))
  }

  /** LSH bands: 2 bands x 4 rows — P(candidate) = 1-(1-j^4)^2, steep
    * around j≈0.5. Emits (id, band, key). */
  def lshBands(docs: DataFrame, id: String, text: String): DataFrame =
    lshBandsFrom(shingleSets(docs, id, text), id)

  /** Distinct candidate pairs from band-key equality (doc_a < doc_b),
    * with a degenerate-bucket cap: a band key shared by more than
    * `maxBucket` docs (boilerplate that collides into one signature)
    * would make the bucket-local join quadratic on a single hot key at
    * corpus scale, so those buckets are dropped before the self-join —
    * the standard LSH skew guard. The DuckDB oracle applies the same
    * HAVING filter, so the cap is differentially tested.
    *
    * The band relation is materialized (`cache`) before the self-join:
    * Catalyst's projection collapsing would otherwise inline the whole
    * shingle→hash→minhash expression tree into BOTH join sides and
    * re-evaluate it per reference (measured 25x slowdown). At cluster
    * scale, write the signature relation to a table instead — same idea,
    * durable. Working-set caches register with [[graft.GraftCaches]];
    * callers release them via `GraftCaches.releaseAll()` after consuming
    * the result (Verify/Bench do this between queries). */
  def lshCandidatePairs(docs: DataFrame, id: String, text: String,
      maxBucket: Int = 100): DataFrame =
    candidatePairsFromBands(lshBands(docs, id, text), id, maxBucket)

  /** Capped bucket self-join over a precomputed (id, band, key) relation. */
  def candidatePairsFromBands(bandRel: DataFrame, id: String,
      maxBucket: Int = 100): DataFrame = {
    val bands = graft.GraftCaches.track(bandRel)
    val okBuckets = bands.groupBy("band", "key")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket)
      .drop("n")
    val bounded = bands.join(okBuckets, Seq("band", "key"))
    bounded.as("a").join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"))
      .distinct()
  }

  /** MinHash Jaccard ESTIMATE on the candidate pairs: fraction of equal
    * signature components — the estimator that makes MinHash useful when
    * the gram sets are too big to rejoin (E[estimate] = true Jaccard;
    * with 8 permutations it is coarse but unbiased). Joins only the
    * 8-long signatures back by id, never the gram arrays — at scale this
    * replaces the exact verify when ±1/8 resolution suffices. */
  def minhashEstimatePairs(docs: DataFrame, id: String, text: String,
      maxBucket: Int = 100): DataFrame = {
    val g = graft.GraftCaches.track(shingleSets(docs, id, text))
    val sig = g.select(
      col(id) +: MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
        minhash(col("hs"), a, b).as(s"mh$i")
      }: _*)
    val agree = (0 until MinhashSeeds.length).map(i =>
      when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidatePairsFromBands(lshBandsFrom(g, id), id, maxBucket)
      .join(sig.select(col(id).as("doc_a") +:
        (0 until MinhashSeeds.length).map(i => col(s"mh$i").as(s"a_mh$i")): _*), "doc_a")
      .join(sig.select(col(id).as("doc_b") +:
        (0 until MinhashSeeds.length).map(i => col(s"mh$i").as(s"b_mh$i")): _*), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (agree.cast("double") / lit(MinhashSeeds.length.toDouble)).as("est_jaccard"))
  }

  /** SimHash relation: id, 32-bit simhash of the distinct word-hash set. */
  def simhashes(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), simhash32(wordHashes(col(text))).as("simhash"))

  /** Edit-distance near-dup pairs, verified on the MinHash-LSH candidate
    * set: Levenshtein is O(len²) per pair, so it only ever runs on the
    * bounded candidate edges — texts join back by id, each crossing the
    * wire once per candidate edge. An integer DP metric: bit-identical
    * across engines by construction. */
  def editDistancePairs(docs: DataFrame, id: String, text: String,
      maxDist: Int): DataFrame = {
    val t = docs.select(col(id), col(text))
    lshCandidatePairs(docs, id, text)
      .join(t.select(col(id).as("doc_a"), col(text).as("ta")), "doc_a")
      .join(t.select(col(id).as("doc_b"), col(text).as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** SimHash near-dup pairs by Hamming distance: the 32-bit fingerprint
    * splits into 4 bytes; by pigeonhole any pair within Hamming distance
    * 3 shares at least one byte at the same position, so candidates come
    * from a plain equi-join on (byte_no, byte) — the same
    * bucket-join-then-exact-check shape as the MinHash path, never an
    * all-pairs pass. Exact check is `bit_count(xor)`. Buckets above
    * `maxBucket` are dropped (degenerate-byte guard, mirrored in the
    * oracle) — same contract as lshCandidatePairs. */
  def simhashNearDupPairs(docs: DataFrame, id: String, text: String,
      maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    val s = simhashes(docs, id, text)
    val b = s.select(col(id), col("simhash"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("bn"),
            expr(s"(simhash div ${1L << (8 * j)}L) % 256").as("byte"))): _*)).as("x"))
      .select(col(id), col("simhash"), col("x.bn").as("bn"), col("x.byte").as("byte"))
    val ok = b.groupBy("bn", "byte").agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket).drop("n")
    val bounded = b.join(ok, Seq("bn", "byte"))
    bounded.as("a").join(bounded.as("b"),
        col("a.bn") === col("b.bn") && col("a.byte") === col("b.byte") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Duplicate-cluster resolution: turn the near-dup candidate EDGES into
    * cluster labels so a keeper can be chosen per cluster (the step after
    * pair generation in every dedup pipeline). Bounded min-label
    * propagation: comp(v) starts as v; each iteration takes the min of a
    * node's label and its neighbors' labels. A FIXED iteration count
    * keeps the operator deterministic and oracle-unrollable; near-dup
    * clusters are bucket-local and near-clique, so the graph diameter is
    * tiny and a few iterations converge in practice (at web scale this
    * is the standard iterated-join CC shape — alternating large/small
    * star — with each round one shuffle on node id; past a handful of
    * rounds, materialize labels per round (checkpoint/table) so the
    * lazily-composed plan doesn't double per iteration).
    * Returns (doc_id, comp_id, is_keeper): comp_id = min doc id reachable
    * within `iters` hops, keeper = the cluster minimum itself. */
  /** Mirrored (src, dst) edge relation in ONE pass (round-14, guide
    * §2.3/§2.4): explode emits both orientations per edge row, where the
    * previous `union(a→b, b→a)` scanned the edge relation twice and
    * DOUBLED the downstream partition count (every per-round stage paid
    * 2× the tasks). Same rows, same multiset semantics, half the scan
    * work and partitions. */
  private[graft] def mirrored(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  def duplicateComponents(edges: DataFrame, iters: Int = 3): DataFrame = {
    // LAZY pins throughout (round-14): no action runs between rounds, so
    // eager checkpoints were ~450 ms dedicated jobs each whose only
    // purpose was materialization — the caller's single consuming action
    // now computes the whole chain, storing each round's blocks as it
    // passes (lineage truncation and loud-lost-block semantics
    // unchanged; see [[graft.GraftCaches.pin]]).
    val bidir = graft.GraftCaches.pin(mirrored(edges), eager = false)
    val init = bidir.select(col("src").as("doc_id")).distinct()
      .withColumn("comp_id", col("doc_id"))
    // Each round references the previous labels TWICE (neighbor-min join
    // + own-label carry): without materialization the lineage doubles per
    // round. PINNED (localCheckpoint), not cached: an evicted cache block
    // recomputes its whole per-round-doubling lineage — the round-4 bench
    // composition penalty — while a checkpointed round is the data
    // (round-4 VERDICT; see [[graft.GraftCaches.pin]]).
    // Round = ONE aggregation (round-14, guide §2.3): each node's next
    // label is min(own, neighbor labels) — the neighbor messages UNION
    // the carried own-label rows feed a single map-side-combined
    // groupBy-min, replacing the old join→agg→left-join-back chain
    // (same fixpoint algebra, one node-keyed shuffle fewer per round).
    val labeled = (1 to iters).foldLeft(init) { (lab, _) =>
      val l = graft.GraftCaches.pin(lab, eager = false)
      bidir.join(l, col("src") === col("doc_id"))
        .select(col("dst").as("doc_id"), col("comp_id"))
        .union(l)
        .groupBy("doc_id").agg(min("comp_id").as("comp_id"))
    }
    labeled.withColumn("is_keeper", col("doc_id") === col("comp_id"))
  }

  /** Iterate-until-stable companion to [[duplicateComponents]]: runs
    * min-label rounds until a round changes ZERO labels (checked with a
    * per-round count action — the standard Spark fixpoint shape; one
    * extra job per round is the price of a convergence guarantee), with
    * `maxIters` as a runaway cap. Use when cluster chains can be deeper
    * than the fixed round count — a path graph of diameter d needs d
    * rounds, and the fixed-3 operator would split such a cluster (the
    * documented honest-but-bounded trade-off). Labels only ever
    * decrease, so "no label decreased" IS the fixpoint; on convergence
    * comp_id = min doc id of the full connected component. */
  def duplicateComponentsConverged(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // Pinned per round (localCheckpoint), not cached — see
    // [[duplicateComponents]] and [[graft.GraftCaches.pin]]. Pins are
    // LAZY (round-14): the per-round convergence probe below is the
    // materializing action, so each round costs ONE job where it used
    // to cost a dedicated eager-checkpoint job plus the probe.
    val bidir = graft.GraftCaches.pin(mirrored(edges), eager = false)
    var lab = graft.GraftCaches.pin(
      bidir.select(col("src").as("doc_id")).distinct()
        .withColumn("comp_id", col("doc_id")), eager = false)
    // Labels only ever DECREASE, so sum(comp_id) is strictly monotone
    // while anything changes: "sum unchanged" IS the fixpoint test. One
    // single-row aggregate per round (exact integer sum over the cached
    // labels) instead of a join-and-count — the cheapest convergence
    // probe that is still exact.
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum("comp_id")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) // null = empty edge set
    }
    var prevSum = labelSum(lab)
    var round = 0
    var converged = false
    // One aggregation per hop — see [[duplicateComponents]] (round-14).
    def hop(l: DataFrame): DataFrame =
      bidir.join(l, col("src") === col("doc_id"))
        .select(col("dst").as("doc_id"), col("comp_id"))
        .union(l)
        .groupBy("doc_id").agg(min("comp_id").as("comp_id"))
    while (!converged && round < maxIters) {
      // TWO hops per probe (round-14): the driver round-trip — pin +
      // convergence probe — is fixed cost, so batching two label hops
      // under one probe halves it for deep graphs. Exactness is
      // unchanged: labels only decrease, so sum(hop(hop(l))) == sum(l)
      // forces both intermediate hops unchanged too; the price is at
      // most one no-op hop of work after the true fixpoint. The inner
      // hop's exchange is referenced twice and reused (AQE exchange
      // reuse), not recomputed.
      val next = graft.GraftCaches.pin(hop(hop(lab)), eager = false)
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      lab = next
      round += 1
    }
    // LOUD failure on exhaustion (round-14, mirroring the star
    // operator's contract): min-label propagation moves the component
    // minimum one hop per hop (two hops per probe round), so a duplicate
    // chain deeper than 2·maxIters leaves far nodes carrying a
    // non-minimum comp_id — labels
    // that silently violate "comp_id = min doc id of the component" and
    // split one cluster into several keepers. The remedy for deep
    // chains is [[duplicateComponentsStar]] (O(log d) alternations),
    // not a silent partial answer; StarComponentsSpec plants a
    // 512-deep chain proving exactly this divergence.
    require(converged,
      s"duplicateComponentsConverged: labels still changing after $maxIters " +
        s"probe rounds (2 min-label hops each) - the graph has a component " +
        s"of diameter > ${2 * maxIters} and the partial labels would split " +
        "it. Raise maxIters or use duplicateComponentsStar (O(log diameter) " +
        "rounds).")
    lab.withColumn("is_keeper", col("doc_id") === col("comp_id"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — the standard shuffle-bounded CC algorithm at web scale).
    * Same output contract as [[duplicateComponentsConverged]] —
    * (doc_id, comp_id = component-min id, is_keeper) — but convergence
    * is O(log² n) ROUNDS ON ANY TOPOLOGY, vs min-label propagation's
    * O(diameter): a duplicate CHAIN of depth d (crawl snapshots, boiler-
    * plate drift) costs the propagation d shuffles and this operator
    * ~log d. Per round: large-star hangs every larger neighbor of u off
    * m = min(Γ(u) ∪ {u}) (doubling star arms without growing the edge
    * count past 2|E|); small-star then re-hangs each node's not-larger
    * neighborhood off its minimum, collapsing two levels at once. The
    * fixpoint test is exact-in-practice and cheap: edge count + both
    * endpoint sums + an order-independent edge-hash sum, all one
    * single-row aggregate over the pinned per-round edge set (partner
    * labels only ever decrease, so an unchanged signature is an
    * unchanged edge set). At the fixpoint the edge set IS the star
    * forest (root = component min), read off without further joins.
    * The query layer differentially checks this against BOTH the
    * min-label fixpoint and the oracle's recursive closure — three
    * algorithms, one hash. */
  def duplicateComponentsStar(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // Lazy pins: the per-round fixpoint signature below is the
    // materializing action (round-14; see [[duplicateComponentsConverged]]).
    var e = graft.GraftCaches.pin(
      edges.select(least(col("doc_a"), col("doc_b")).as("a"),
          greatest(col("doc_a"), col("doc_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct(), eager = false)
    def signature(df: DataFrame): (Long, Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum("a"), sum("b"),
        sum(hash(col("a"), col("b")).cast("long"))).head()
      if (r.isNullAt(1)) (0L, 0L, 0L, 0L)
      else (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    var prev = signature(e)
    var round = 0
    var converged = prev._1 == 0L
    while (!converged && round < maxIters) {
      // large-star: from each node u's full neighborhood, attach every
      // LARGER neighbor to m = min(Γ(u) ∪ {u}); each undirected edge is
      // processed exactly once (from its smaller endpoint's group).
      val bid = e.select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("x"))
        .select(col("x.u").as("u"), col("x.v").as("v"))
      val mn = bid.groupBy("u").agg(min(col("v")).as("nbr_min"))
        .select(col("u"), least(col("nbr_min"), col("u")).as("m"))
      val large = bid.join(mn, "u").filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b")).distinct() // m <= u < v
      // small-star: orient every edge toward its smaller endpoint, then
      // attach each node's not-larger neighborhood (and itself) to the
      // neighborhood minimum.
      val bid2 = large.select(col("b").as("u"), col("a").as("v")) // v < u
      val mn2 = bid2.groupBy("u").agg(min(col("v")).as("m"))      // m < u
      val small = bid2.join(mn2, "u").filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))               // m < v
        .union(mn2.select(col("m").as("a"), col("u").as("b")))    // m < u
        .distinct()
      val next = graft.GraftCaches.pin(small, eager = false)
      val sig = signature(next)
      converged = sig == prev
      prev = sig
      e = next
      round += 1
    }
    // LOUD failure on exhaustion (post-review): a non-fixpoint edge set
    // is NOT a star forest — the read-off below would emit the same
    // doc_id under multiple comp_ids with multiple keepers, silently
    // violating the shared output contract. The algorithm converges in
    // O(log² n) alternations, so 20 rounds covers any graph this engine
    // can hold; hitting the cap means a bug (or a signature collision),
    // and the remedy is raising maxIters, not trusting the output.
    require(converged,
      s"duplicateComponentsStar: no fixpoint after $maxIters large/small-star " +
        "rounds - the edge set is not yet a star forest and the component " +
        "read-off would be malformed. Raise maxIters.")
    // The fixpoint test above is a 4-field SIGNATURE (count + endpoint
    // sums + hash-sum); a collision would silently accept a non-star
    // edge set and the read-off would emit duplicate doc_id rows with
    // multiple keepers (round-13 ADVICE). So assert the star-forest
    // SHAPE exactly before reading it off: every member hangs off
    // exactly one root, and no root is itself a member. Both checks run
    // on the FINAL edge set only (|E| = members, one aggregate + one
    // broadcast-sized semi-join) — negligible next to any round.
    val dup = e.groupBy("b").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).count()
    require(dup == 0L,
      "duplicateComponentsStar: fixpoint signature collision - a member " +
        "node carries two roots; the converged edge set is not a star forest.")
    val rootAsMember = e.select(col("a").as("n")).distinct()
      .join(e.select(col("b").as("n")), Seq("n"), "left_semi").limit(1).count()
    require(rootAsMember == 0L,
      "duplicateComponentsStar: fixpoint signature collision - a root " +
        "appears as another star's member; the converged edge set is not " +
        "a star forest.")
    // fixpoint edge set is a star forest: (root, member) per non-root
    // node, roots re-added as their own component id.
    e.select(col("b").as("doc_id"), col("a").as("comp_id"))
      .union(e.select(col("a").as("doc_id"), col("a").as("comp_id")).distinct())
      .withColumn("is_keeper", col("doc_id") === col("comp_id"))
  }

  /** Final dedup resolution: ONE canonical document per duplicate
    * cluster — the highest-score member (ties to the lowest id), i.e.
    * the "keep the longest/best copy" policy real pipelines apply after
    * clustering (cluster-min keeps an ARBITRARY member; score-argmax
    * keeps the best one). One `row_number` + count window per comp_id —
    * partition-parallel across clusters, and clusters are tiny by
    * construction, so no skew concern. `components` is
    * [[duplicateComponents]]' output; `docs` supplies the score. */
  def keepBest(components: DataFrame, docs: DataFrame, id: String, score: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = components.select(col("doc_id").as("_member_id"), col("comp_id"))
      .join(docs.select(col(id).as("_member_id"), col(score)), "_member_id")
    val w = Window.partitionBy("comp_id")
    labeled
      .withColumn("rn", row_number().over(w.orderBy(col(score).desc, col("_member_id"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("comp_id"), col("_member_id").as("keeper_id"),
        col(score).as("keeper_score"), col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
  }

  /** Benchmark decontamination: fraction of each corpus document's
    * distinct 3-gram shingles that appear in a benchmark set — the
    * eval-contamination check a training pipeline runs before the corpus
    * ships. The benchmark gram set is small (eval suites are), so it
    * broadcasts and the corpus is never shuffled: explode grams, semi
    * match against the broadcast set, partial-aggregate the per-doc
    * match count. At 100 TB the broadcast side becomes a bloom filter —
    * same plan shape, one-sided error only. Documents under `benchPred`
    * form the benchmark and are excluded from the output. */
  /** [[contaminationOverlap]]'s at-scale variant: instead of broadcasting
    * the benchmark gram SET (fine for eval suites, unbounded for a large
    * holdout), build a BLOOM FILTER over the benchmark gram hashes with
    * `df.stat.bloomFilter` (a distributed treeAggregate build — each
    * partition ORs its bits, the driver holds only the final fixed-size
    * bit array) and broadcast that. One-sided error: NO false negatives —
    * every truly contaminated document is flagged at least as strongly as
    * by the exact operator (`overlap_bloom >= overlap`); false positives
    * inflate the estimate by at most the configured fpp. The filter
    * membership test is a deterministic function of the inserted set
    * (bitwise OR is order-insensitive), so results are stable run to run;
    * they are NOT DuckDB-reproducible (Spark's private murmur layout),
    * which is why this variant is pinned by a differential spec against
    * the exact operator instead of a SQL oracle. */
  def contaminationOverlapBloom(docs: DataFrame, id: String, text: String,
      benchPred: Column, threshold: Double, fpp: Double = 0.01): DataFrame = {
    val g = graft.GraftCaches.track(shingleSets(docs, id, text))
    val bench = g.filter(benchPred).select(explode(col("hs")).as("h")).distinct()
    val nBench = math.max(bench.count(), 1L) // bounded: one count over distinct grams
    val bloom = bench.stat.bloomFilter("h", nBench, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
    val corpus = g.filter(!benchPred)
    val matched = corpus.select(col(id), explode(col("hs")).as("h"))
      .filter(mightContain(col("h")))
      .groupBy(id).agg(count(lit(1)).as("n_matched"))
    corpus.select(col(id), size(col("hs")).cast("bigint").as("n_grams"))
      .join(matched, Seq(id), "left")
      .select(col(id), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("overlap",
        col("n_matched").cast("double") / col("n_grams").cast("double"))
      .withColumn("contaminated", col("overlap") >= threshold)
  }

  def contaminationOverlap(docs: DataFrame, id: String, text: String,
      benchPred: Column, threshold: Double): DataFrame = {
    val g = graft.GraftCaches.track(shingleSets(docs, id, text))
    val bench = g.filter(benchPred)
      .select(explode(col("hs")).as("h")).distinct()
    val corpus = g.filter(!benchPred)
    val matched = corpus.select(col(id), explode(col("hs")).as("h"))
      .join(broadcast(bench), "h")
      .groupBy(id).agg(count(lit(1)).as("n_matched"))
    corpus.select(col(id), size(col("hs")).cast("bigint").as("n_grams"))
      .join(matched, Seq(id), "left")
      .select(col(id), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("overlap",
        col("n_matched").cast("double") / col("n_grams").cast("double"))
      .withColumn("contaminated", col("overlap") >= threshold)
  }

  /** n-gram Jaccard near-dup pairs, verified on the MinHash-LSH candidate
    * set: candidate generation is the banded signature join (bounded by
    * the bucket cap, shuffling only (id, band, key) rows), and only the
    * surviving candidate pairs pull their gram arrays back by id — each
    * doc's gram set crosses the wire at most once per candidate edge,
    * never inside an unbounded quadratic block. Exact Jaccard over
    * distinct 3-gram shingle hashes (|A ∪ B| = |A|+|B|-|A ∩ B| needs one
    * set operation); the candidate set bounds the pairwise work, so this
    * is the LSH-recall/exact-precision shape that survives 100 TB. */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
      threshold: Double): DataFrame = {
    // One shingle pass feeds BOTH the band keys and the gram arrays.
    val g = graft.GraftCaches.track(shingleSets(docs, id, text))
    val inter = size(array_intersect(col("ga"), col("gb")))
    candidatePairsFromBands(lshBandsFrom(g, id), id)
      .join(g.select(col(id).as("doc_a"), col("hs").as("ga")), "doc_a")
      .join(g.select(col(id).as("doc_b"), col("hs").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") /
          (size(col("ga")) + size(col("gb")) - inter)).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** PageRank over the undirected duplicate-candidate graph — the
    * centrality pass that ranks cluster "hubs" (documents similar to many
    * others: boilerplate templates, canonical sources) for triage and
    * keeper selection. Fixed `iters` power-iteration rounds of
    * r = teleport + damping * Σ_in (r_src / outdeg_src).
    *
    * Determinism at any partitioning: the per-edge contribution
    * r/outdeg is one IEEE double division, then micro-scaled to an
    * integral DECIMAL (1e-9 units) and summed EXACTLY — decimal addition
    * is associative, so partial aggregation order can't perturb ranks,
    * and the whole trajectory is DuckDB-checkable (the oracle unrolls
    * every round). teleport/damping are passed separately rather than
    * derived (1.0 - 0.85 != the parsed literal 0.15 in doubles).
    *
    * Scale shape: per round, one shuffle keyed on dst for the
    * contribution sum (map-side combined) + a node-keyed left join; the
    * edge relation is computed once and reused (pinned — at cluster
    * scale, a table). Per-round label state is PINNED (localCheckpoint),
    * not cached: the round-4 driver bench measured 17.9 s vs 5.5 s
    * isolated for this operator — cache eviction under full-run heap
    * pressure recomputing per-round lineage (round-4 VERDICT). A
    * checkpointed round cannot recompute; see [[graft.GraftCaches.pin]]. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Degree-annotated mirrored edges in ONE pass (round-14, guide §2.4):
    // count() over a src-partitioned window replaces the groupBy-count +
    // edges⋈degree join — one src-keyed shuffle of the edge relation
    // instead of two. Pinned LAZILY: every round consumes this one
    // relation; the caller's single action materializes it.
    val withDeg = graft.GraftCaches.pin(
      mirrored(edges).withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src"))),
      eager = false)
    val init = withDeg.select(col("src").as("doc_id")).distinct()
      .withColumn("rank", lit(1.0))
    // The per-round join BACK to the rank relation is gone (round-14):
    // on a MIRRORED edge relation every node has indegree >= 1, so the
    // contribution sum's dst set IS the node set — the left join it
    // replaced only ever re-attached rows that contrib already carried
    // (its coalesce-to-0 branch was unreachable). One node-keyed shuffle
    // per round instead of two — and with the ranks now referenced ONCE
    // per round the composed plan grows linearly, so the per-round pins
    // (which existed for the old two-reference doubling shape) are gone
    // too: one action executes the whole chain.
    (1 to iters).foldLeft(init) { (r, _) =>
      withDeg
        .join(r, col("src") === col("doc_id"))
        .select(col("dst"),
          round(col("rank") / col("outdeg") * lit(1e9)).cast(DecimalType(38, 0)).as("c"))
        .groupBy("dst").agg(sum("c").as("cs"))
        .select(col("dst").as("doc_id"),
          (lit(teleport) + lit(damping) * (col("cs").cast("double") / lit(1e9)))
            .as("rank"))
    }
  }

  /** Label-propagation communities over the undirected candidate graph —
    * the coarser-than-components clustering pass (components merge
    * anything connected; LPA splits a weakly-bridged blob into dense
    * cores, which is what boilerplate-family triage wants). Synchronous
    * LPA with a DETERMINISTIC vote: each round every node adopts the
    * most frequent label among its neighbors, ties broken by the LOWEST
    * label (classic LPA's random tie-break can't be oracle-checked or
    * reproduced); isolated carry their label. Fixed `iters` rounds,
    * oracle-unrollable like [[pageRank]].
    *
    * Scale shape per round: one map-side-combined shuffle on (dst,
    * label) for the vote counts, one argmax per dst (struct-max — never
    * a per-node window), one node-keyed left join; per-round labels are
    * PINNED (localCheckpoint) like every iterated operator here. */
  def labelPropagation(edges: DataFrame, iters: Int = 2): DataFrame = {
    // Lazy pins — see [[pageRank]] (round-14).
    val bidir = graft.GraftCaches.pin(mirrored(edges), eager = false)
    val init = bidir.select(col("src").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
    val labeled = (1 to iters).foldLeft(init) { (lab, _) =>
      val l = graft.GraftCaches.pin(lab, eager = false)
      // Votes: neighbor labels per dst; winner = max (count, -label).
      val win = bidir.join(l, col("src") === col("doc_id"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("dst")
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("w"))
        .select(col("dst"), (-col("w.neg")).as("win_lbl"))
      l.join(win, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"), coalesce(col("win_lbl"), col("lbl")).as("lbl"))
    }
    labeled
  }

  /** Segment-level exact dedup with document reassembly — the CCNet-style
    * line/paragraph dedup pass (boilerplate headers, licence blocks, nav
    * text repeat ACROSS documents; whole-doc dedup never sees them).
    * Documents split into fixed `segTokens`-word segments; only the
    * globally-FIRST occurrence of each distinct segment text survives
    * (first = lowest (doc_id, seg_no) — deterministic under any
    * partitioning); surviving documents reassemble from their kept
    * segments in original order.
    *
    * Scale shape: ONE shuffle keyed on segment text for the dedup — a
    * groupBy struct-min emitting one keeper row per distinct segment
    * (map-side combined; never a per-key window sort, which a hot
    * boilerplate segment repeated 10⁸ times would serialize) — and one
    * shuffle on doc_id for reassembly. At 100 TB, key the dedup shuffle
    * on poly_hash(segment) and carry the text only on keeper rows. */
  def paragraphDedup(docs: DataFrame, id: String, text: String,
      segTokens: Int = 8): DataFrame = {
    val segs = graft.GraftCaches.track(
      TextOps.chunkTokens(docs, id, text, chunkSize = segTokens, overlap = 0)
        .select(col(id), col("chunk_no").as("seg_no"), col("chunk_text").as("seg_text")))
    val keepers = segs.groupBy("seg_text")
      .agg(min(struct(col(id), col("seg_no"))).as("k"))
      .select(col(s"k.$id").as(id), col("k.seg_no").as("seg_no"), col("seg_text"))
    val perDoc = segs.groupBy(id).agg(count(lit(1)).as("n_segs"))
    keepers.groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_no"), col("seg_text")))),
          s => s.getField("seg_text")), " ").as("dedup_text"))
      .join(perDoc, Seq(id))
      .select(col(id), col("dedup_text"), col("n_kept"), col("n_segs"))
  }

  /** Cross-document boilerplate strip (the CCNet/RefinedWeb per-domain
    * cleaning step): fixed `segTokens`-token segments; a segment whose
    * (source, seg_text) occurs in >= `minDf` DISTINCT documents of the
    * SAME source is boilerplate (nav bars, headers, license footers
    * repeat within a site, not across the web) and is removed from every
    * document — unlike [[paragraphDedup]]'s global keep-FIRST, boilerplate
    * keeps NO copy. Scale shape: one per-row explode, one two-phase
    * count-distinct keyed on (source, seg_text), and the boilerplate
    * relation — bounded by the repeated mass, tiny by construction —
    * joins back on the same key; documents never ride a shuffle, only
    * segments do, and reconstruction is one per-doc sorted collect. */
  def boilerplateStrip(docs: DataFrame, id: String, text: String,
      source: String, segTokens: Int = 2, minDf: Int = 3): DataFrame = {
    val segs = graft.GraftCaches.track(
      docs.select(col(id), col(source).as("src"), split(col(text), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("s",
          explode(expr(s"sequence(0, greatest(n - 1, 0), $segTokens)")))
        .select(col(id), col("src"),
          (col("s") / segTokens).cast("int").as("seg_no"),
          array_join(slice(col("toks"), col("s") + 1, lit(segTokens)), " ").as("seg_text")))
    val bf = segs.groupBy("src", "seg_text")
      .agg(count_distinct(col(id)).as("ndoc"))
      .filter(col("ndoc") >= minDf)
      .select("src", "seg_text")
    val perDoc = segs.groupBy(id).agg(count(lit(1)).as("n_segs"))
    val kept = segs.join(bf, Seq("src", "seg_text"), "left_anti")
    perDoc.join(
      kept.groupBy(id).agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_no"), col("seg_text")))),
          s => s.getField("seg_text")), " ").as("clean_text")),
      Seq(id), "left")
      .select(col(id), coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("n_segs"))
  }

  /** Incremental delta-dedup: score a NEW batch against the EXISTING
    * corpus without ever self-joining the corpus — the production ingest
    * shape (the corpus is petabytes and already deduped; only new-vs-old
    * edges matter). `isNew` partitions `docs` into the batch and the
    * corpus. Exact path: md5(text) semi-probe against the corpus's
    * distinct hashes. Near-dup path: banded-LSH candidates restricted to
    * new-old pairs under the shared bucket cap, exact Jaccard confined
    * to candidate edges, per-new-doc best-match aggregation. Emits
    * (id, is_exact_dup, n_candidates, best_jacc, is_near_dup).
    *
    * At scale the old side's band relation and hash set are precomputed
    * tables maintained across ingests; here both derive from `docs` in
    * one pass (the tracked shingle relation is shared by both sides). */
  def deltaDedup(docs: DataFrame, id: String, text: String, isNew: Column,
      threshold: Double = 0.5, maxBucket: Int = 100): DataFrame = {
    val g = graft.GraftCaches.track(shingleSets(docs, id, text))
    val bands = lshBandsFrom(g, id)
    val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket).select("band", "key")
    val bb = bands.join(ok, Seq("band", "key"))
      .join(docs.select(col(id), isNew.as("is_new")), id)
    val cand = bb.filter(col("is_new"))
      .select(col(id).as("new_id"), col("band"), col("key"))
      .join(bb.filter(!col("is_new"))
        .select(col(id).as("old_id"), col("band"), col("key")), Seq("band", "key"))
      .select("new_id", "old_id").distinct()
    val inter = size(array_intersect(col("ga"), col("gb")))
    val agg = cand
      .join(g.select(col(id).as("new_id"), col("hs").as("ga")), "new_id")
      .join(g.select(col(id).as("old_id"), col("hs").as("gb")), "old_id")
      .select(col("new_id"), col("old_id"),
        (inter.cast("double") / (size(col("ga")) + size(col("gb")) - inter)).as("j"))
      .groupBy("new_id")
      .agg(count_distinct(col("old_id")).as("n_candidates"), max("j").as("best_jacc"))
    val hashes = docs.select(col(id), isNew.as("is_new"), md5(col(text)).as("th"))
    hashes.filter(col("is_new"))
      .join(hashes.filter(!col("is_new")).select("th").distinct()
        .withColumn("_ex", lit(1)), Seq("th"), "left")
      .select(col(id), col("_ex").isNotNull.as("is_exact_dup"))
      .join(agg, col(id) === col("new_id"), "left")
      .select(col(id), col("is_exact_dup"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_jacc"),
        coalesce(col("best_jacc") >= lit(threshold), lit(false)).as("is_near_dup"))
  }

  /** Span-level exact dedup — remove repeated cross-document token spans
    * from INSIDE surviving documents (the "deduplicating training data
    * makes language models better" transformation: whole-doc and
    * paragraph dedup both miss a licence block or nav bar stitched into
    * otherwise-unique pages mid-document). Every `w`-token rolling
    * window is poly-hashed; a window hash seen in MORE THAN ONE document
    * marks its `w` token positions as duplicated; per document the
    * covered positions of all duplicated windows merge (the span-merge
    * union) and the cleaned text is the remaining tokens in original
    * order. Removal is symmetric (every copy loses the span): the
    * target is cross-document boilerplate, where keeping one arbitrary
    * copy re-introduces the skew dedup exists to remove. Documents
    * shorter than `w` tokens carry no windows and pass through intact.
    *
    * Emits (id, n_tokens, n_dup_tokens, clean_text).
    *
    * Scale shape: the window relation is one codegen'd explode (n rows
    * per n-token doc — same mass as the tokenized corpus, never
    * quadratic); duplicated hashes come from ONE map-side-combined
    * groupBy on the 8-byte hash; marking joins (id, start) rows back on
    * that hash; the span merge is a per-doc collect_set of START offsets
    * only (bounded by the doc's duplicated-window count — never
    * materializing per-position rows on the shuffle); reassembly is one
    * id-keyed left join against the pinned token relation. No document
    * text ever rides a shuffle keyed on content — only 8-byte hashes
    * and int offsets. */
  def spanDedup(docs: DataFrame, id: String, text: String,
      w: Int = 8): DataFrame = {
    val toks = graft.GraftCaches.track(
      docs.select(col(id), TextOps.words(col(text)).as("l"))
        .withColumn("n", size(col("l"))))
    // Window starts are 1-based; guarded by n >= w (sequence would run
    // descending otherwise — the shingleHashes discipline).
    // Window fingerprint (round 8, the shingleHashes discipline): hash
    // each word once, fold the w word-hashes arithmetically per window
    // in the native WindowFoldHashes codegen expression (the array is
    // emitted in window order, so posexplode's 0-based pos + 1 IS the
    // 1-based window start).
    val wins = graft.GraftCaches.track(
      toks.filter(col("n") >= w)
        .select(col(id),
          posexplode(graft.functions.WindowFoldHashes.of(col("l"), w)).as(Seq("p", "h")))
        .select(col(id), (col("p") + 1).cast("int").as("i"), col("h")))
    val dup = wins.groupBy("h")
      .agg(count_distinct(col(id)).as("nd"))
      .filter(col("nd") > 1)
      .select("h")
    val starts = wins.join(dup, "h")
      .groupBy(id)
      .agg(collect_set(col("i")).as("starts"))
    val covered = array_distinct(flatten(
      transform(col("starts"), s => sequence(s, s + (w - 1)))))
    val cov = coalesce(covered, expr("array()").cast("array<int>"))
    toks.join(starts, Seq(id), "left")
      .select(col(id), col("n").cast("bigint").as("n_tokens"),
        size(cov).cast("bigint").as("n_dup_tokens"),
        array_join(filter(col("l"),
          (tok, idx) => not(array_contains(cov, (idx + 1).cast("int")))), " ")
          .as("clean_text"))
  }
}
