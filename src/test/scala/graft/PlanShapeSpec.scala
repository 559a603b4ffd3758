package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the scale properties the engine is
  * built around, asserted on the physical plans so a refactor can't
  * silently reintroduce a scale-killer (the round-1 failure mode).
  */
class PlanShapeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    Queries.byName(q).fn(spark, d).queryExecution.executedPlan.toString

  /** A windowspecdefinition whose FIRST argument is already a sort
    * order has no partition keys — the structural marker for the
    * "Moving all data to a single partition" WindowExec (the log text
    * itself never appears in plan strings, so matching on it is
    * vacuous). */
  private val globalWindowRe = """windowspecdefinition\([^,)]*\s(ASC|DESC)""".r
  private def hasGlobalWindow(p: String): Boolean =
    globalWindowRe.findFirstIn(p).isDefined

  test("q04: range predicates are pushed into the parquet scan") {
    val p = plan("q04_filter_range")
    assert(p.contains("PushedFilters: [IsNotNull"), "filters must reach the scan")
    assert(p.contains("LessThanOrEqual(l_quantity"), "range filter must be pushed")
  }

  test("q02: dimension join broadcasts, never sort-merges") {
    val p = plan("q02_join_left")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q14: global row_number has NO window operator at all") {
    // the scalable variant derives (partition, position) from
    // monotonically_increasing_id and folds offsets on the driver —
    // no single-partition window, no window exchange, no join
    val p = plan("q14_row_number")
    assert(!p.contains("windowspecdefinition"), "q14 must not plan a Window")
  }

  test("q14: the range-sorted frame is cached, not computed twice") {
    // offsets agg and final join both consume the sorted+windowed frame;
    // without the persist Spark re-runs the full range exchange + sort
    // for each (the round-2 2.9x regression)
    val p = plan("q14_row_number")
    assert(p.contains("InMemoryTableScan"),
      "both consumers of the sorted frame must read the persisted copy")
  }

  test("q38: top-k aggregates partially BEFORE the exchange (bounded shuffle)") {
    val p = plan("q38_ann_topk")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(_.contains("partial_topkagg"))
    val exchangeIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning(query_id"))
    assert(partialIdx >= 0, "partial top-k aggregation must exist")
    assert(exchangeIdx >= 0)
    assert(partialIdx > exchangeIdx,
      "partial agg must be below (run before) the exchange in the plan tree")
  }

  test("q167: label filter runs before the bounded top-k heap, probes broadcast") {
    val p = plan("q167_hard_negatives")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(_.contains("partial_topkagg"))
    val exchangeIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning(query_id"))
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "hard negatives must keep q38's bounded-shuffle shape")
    // the mismatch filter must sit BELOW the partial aggregation (rows
    // are dropped before they ever enter the heap, not after the rank)
    val filterIdx = lines.indexWhere(_.contains("NOT (nl"))
    assert(filterIdx >= 0, s"label-mismatch filter must exist in-plan:\n$p")
    assert(filterIdx > partialIdx,
      "filter must run before (sit below) the partial top-k aggregation")
  }

  test("q166: source overlap never joins two corpus-scale frames") {
    val p = plan("q166_source_overlap")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"only the two 20-row count joins may appear (broadcast hash):\n$p")
    assert(p.contains("BroadcastHashJoin"), "count frames must broadcast")
    assert(p.contains("collect_set"), "the in-row pair fold starts from collect_set")
  }

  test("q33: exact-dup window reuses the 8-byte-hash repartition (one exchange)") {
    val p = plan("q33_dedup_prefix")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(exchanges === 1, s"expected exactly one exchange, plan:\n$p")
    assert(p.contains("REPARTITION_BY_COL"))
  }

  test("q59: IVF assign/probe are codegen kernels, not Scala UDFs") {
    val p = plan("q59_ivf_topk")
    assert(!p.contains("ScalaUDF"), "centroid assign/probe must be Expressions")
    assert(p.contains("nearest_centroid") && p.contains("top_cells"))
  }

  test("q66: HLL sketch partial-aggregates below the exchange") {
    val p = plan("q66_hll_distinct")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(_.contains("partial_approx_count_distinct"))
    val exchangeIdx = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning(o_orderpriority"))
    assert(partialIdx >= 0, "partial HLL aggregation must exist")
    assert(exchangeIdx >= 0)
    assert(partialIdx > exchangeIdx,
      "partial sketch must be below (run before) the exchange")
  }

  test("q67: hash sampling is a narrow filter ahead of the aggregation") {
    val p = plan("q67_stratified_sample")
    assert(p.contains("xxhash64"), "sampling filter must be in the plan")
    assert(p.contains("partial_count"))
  }

  test("q71: the benchmark shingle set broadcasts (corpus side never shuffles for the probe)") {
    val p = plan("q71_contamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "contamination probe must be a broadcast left-semi join")
  }

  test("q01: aggregation is partial+final with a pruned scan schema") {
    val p = plan("q01_agg_pricing")
    assert(p.contains("partial_sum"))
    assert(p.contains("ReadSchema: struct<l_quantity"))
    assert(!p.contains("l_comment"), "unused wide column must be pruned from the scan")
  }

  test("q82: the incoming batch's band keys broadcast against the corpus scan") {
    val p = plan("q82_minhash_incremental")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate generation must broadcast the incoming side:\n$p")
  }

  test("q80: line dedup shuffles on the 8-byte line hash, window reuses it") {
    // the keep-first window's (hash, line) clustering must be satisfied
    // by the explicit hash repartition — no second exchange for the
    // window, text rides as payload
    val p = plan("q80_line_dedup")
    assert(p.contains("Exchange hashpartitioning(_h#"),
      "explicit 8-byte hash repartition must be the window's exchange")
    val windowExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(_h#") && !l.contains("Reused"))
    assert(windowExchanges === 1, s"one hash exchange expected:\n$p")
  }

  test("q94: k-means assignment is a single scan-speed projection (no exchange)") {
    // after fit, labeling 100 TB is one narrow codegen pass — any
    // exchange here would mean the assignment shuffles the corpus
    val p = plan("q94_kmeans")
    assert(p.contains("nearest_centroid_score_d"), "assignment must be the codegen kernel")
    assert(!p.contains("Exchange"), s"assignment must be narrow:\n$p")
  }

  test("q95: semantic-dedup candidates come from a cluster-keyed equi-join") {
    // the SemDeDup shape: candidate pairs join on the cluster id (the
    // id inequality rides as a join filter) — never a nested-loop /
    // cartesian over the corpus, and no exchanges beyond the two
    // cluster-keyed ones (AQE reuses the identical sides at runtime)
    val p = plan("q95_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidates must be an equi-join on cluster:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(cluster") && !l.contains("Reused"))
    assert(exchanges <= 2, s"only the cluster-keyed exchanges expected:\n$p")
  }

  test("q96: classifier scoring is a narrow codegen pass over the scan") {
    val p = plan("q96_quality_classifier")
    assert(p.contains("linear_text_score"), "scoring must be the codegen kernel")
    assert(!p.contains("Exchange"), s"scoring must not shuffle:\n$p")
  }

  test("q97: stratum quota window partitions by stratum (never global)") {
    val p = plan("q97_stratum_sample")
    assert(!hasGlobalWindow(p), s"global window leaked in:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(exchanges === 1, s"one stratum exchange expected:\n$p")
  }

  test("q99: PQ scores via broadcast query tables with partial top-k below the exchange") {
    // the coded corpus is scanned once (no shuffle of codes); the query
    // ADC tables broadcast; top-k state bounds the exchange like q38
    val p = plan("q99_pq_topk")
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      "PQ must run as codegen kernels")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query tables must broadcast:\n$p")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l => l.contains("partial_topkagg") ||
      (l.contains("ObjectHashAggregate") && l.contains("partial")))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning(query_id"))
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"bounded top-k must partial-aggregate before the exchange:\n$p")
  }

  test("q79: Misra-Gries partial-aggregates below the single-partition exchange") {
    // the global heavy-hitter agg must combine map-side (bounded
    // capacity-sized buffers travel, never the token stream)
    val p = plan("q79_heavy_hitters")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(_.contains("partial_misragries"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(partialIdx >= 0, s"partial MG aggregation must exist:\n$p")
    assert(exchangeIdx >= 0)
    assert(partialIdx > exchangeIdx,
      "partial agg must run before the single-partition exchange")
  }

  test("q77: repetition gates are MAP-ONLY (no exchange at all)") {
    // rep-2/rep-3 and top-token share are all per-row kernels now; the
    // round-6 shape shuffled every token occurrence twice plus a join
    val p = plan("q77_repetition")
    assert(!p.contains("Exchange"), s"q77 must not shuffle:\n$p")
  }

  test("q111: grid radius join shuffles on the cell key, never cross-joins") {
    val p = plan("q111_grid_join")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no nested-loop fallback:\n$p")
    // the join must be an EQUI-join on the cell key (distance only as a
    // post-join filter); whether the small probe side broadcasts or
    // both sides exchange is Spark's size-based choice — both are fine
    assert(p.contains("HashJoin [_cx") || p.contains("Exchange hashpartitioning(_cx"),
      s"join must key on the grid cell:\n$p")
  }

  test("q113: fuzzy-match top-1 partial-aggregates before the exchange") {
    // max(struct) instead of a rank window: one row per supplier
    // crosses the wire
    val p = plan("q113_jaro_winkler")
    assert(!p.contains("windowspecdefinition"), s"q113 must not plan a Window:\n$p")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l => l.contains("partial_max") ||
      (l.contains("HashAggregate") && l.contains("partial") && l.contains("max")))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning(s_suppkey"))
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"top-1 must partial-aggregate below the exchange:\n$p")
  }

  test("q114: the BM25 query probe broadcasts; the corpus never shuffles for it") {
    val p = plan("q114_bm25")
    assert(p.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage:\n$p")
  }

  test("q116: the three rolling percentiles share ONE Window operator and one exchange") {
    // same partition/order/frame spec -> Catalyst must collapse
    // med/q1/q3 into a single Window exec (one sort, one state pass)
    val p = plan("q116_rolling_median")
    val windows = p.linesIterator.count(_.contains("- Window ["))
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(windows === 1, s"expected one collapsed Window op:\n$p")
    assert(exchanges === 1, s"expected one user-key exchange:\n$p")
  }

  test("q141: KS cumulative windows partition by the bin id; NO global window anywhere") {
    // the data-sized window must be keyed on _bin (the two-level prefix
    // sum); bin offsets are driver-folded literal maps, so not even
    // the ≤`bins`-row frame plans an unpartitioned window
    val (result, caches) = operators.Stats.ksTestPlan(
      spark.read.parquet(s"$d/lineitem.parquet"), "l_extendedprice",
      "l_returnflag", "R", "A", bins = 1024)
    val p = result.queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(_bin"),
      s"in-bin cumulative must partition by _bin:\n$p")
    assert(!hasGlobalWindow(p), s"global window leaked in:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the final pass must read the binned cache:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no data-sized join anywhere:\n$p")
    caches.foreach(_.unpersist())
  }

  test("q141/q159: the public KS operators clean up their own caches") {
    spark.catalog.clearCache() // earlier tests leave q14-contract caches
    Queries.byName("q141_ks_test").fn(spark, d).collect()
    assert(spark.sharedState.cacheManager.isEmpty, "ksTest left frames cached")
    Queries.byName("q159_ks_matrix").fn(spark, d).collect()
    assert(spark.sharedState.cacheManager.isEmpty, "ksMatrix left frames cached")
  }

  test("q143: time-weighted avg shares ONE key exchange between window and agg") {
    val p = plan("q143_time_weighted_avg")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(exchanges === 1, s"lead() window and final agg must reuse one exchange:\n$p")
  }

  test("q144: chi2 top-k is TakeOrdered (no global sort), counts join broadcasts") {
    val p = plan("q144_chi2_features")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the 1-row totals must broadcast:\n$p")
  }

  test("q139: SNM rank comes from the scalable structure (no Window op at all)") {
    val p = plan("q139_sorted_neighborhood")
    assert(!p.contains("windowspecdefinition"), s"q139 must not plan a Window:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the ranked frame must be persisted for its two consumers:\n$p")
    spark.catalog.clearCache()
  }

  test("q147: rank percentiles plan NO unpartitioned window (all windows keyed)") {
    // the whole point of the rank-based path: bin offsets window on g,
    // target-bin ranks window on (g, bin) — nothing global-ordered.
    // Uses the lazy variant: the public operator is eager (it
    // materializes, then releases its own caches)
    val (result, caches) = operators.Stats.groupedExactPercentilesPlan(
      spark.read.parquet(s"$d/lineitem.parquet"), "l_returnflag",
      "l_extendedprice", Seq(0.5, 0.95, 0.99))
    val p = result.queryExecution.executedPlan.toString
    assert(!hasGlobalWindow(p), s"global window leaked in:\n$p")
    // binned is persisted: both its consumers (bin counts and target-
    // bin ranks) must read the cache, not replay the source scan —
    // the source appears in the plan only through InMemoryRelation
    assert(p.contains("InMemoryTableScan"),
      s"binned must be persisted for its two consumers:\n$p")
    caches.foreach(_.unpersist())
  }

  test("q147: the public operator cleans up its own caches") {
    Queries.byName("q147_rank_percentiles").fn(spark, d).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "groupedExactPercentiles must unpersist gstats/binned/binOff on return")
  }

  test("catalog-wide: unpartitioned windows appear ONLY on the documented allowlist") {
    // every current global-window case is constant-bounded by
    // construction; anything new must either partition, driver-fold
    // (the q14/ksTest offsets pattern), or justify itself onto this
    // list
    val allowed = Map(
      // one row per calendar day: bounded by the timespan, not the data
      "q154_cusum_changepoint" -> "day-bounded CUSUM series",
      "q151_kaplan_meier" -> "day-bounded survival grid",
      // scores snap to micro units -> ≤ 1e6+1 distinct rows at any SF
      "q149_auc" -> "score-granularity-bounded rank frame",
      // fixed decile calibration bins (10 rows)
      "q150_isotonic_calibration" -> "constant 10-bin frame",
      // integer acctbal buckets (~thousands), then survivor sliver only
      "q133_skyline" -> "bucket-bounded prefix-max + pruned sliver")
    val offenders = Queries.all.flatMap { q =>
      val p = q.fn(spark, d).queryExecution.executedPlan.toString
      if (hasGlobalWindow(p) && !allowed.contains(q.name)) Some(q.name)
      else None
    }
    // EAGER operators (collect-to-LocalRelation / lineage-truncating)
    // return a plan the sweep above can't see into — their internal
    // windows are inspected through the private[graft] *Plan variants
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val lazyPlans = Seq(
      ("q141_ks_test(plan)",
        operators.Stats.ksTestPlan(li, "l_extendedprice", "l_returnflag",
          "R", "A", 1024)),
      ("q159_ks_matrix(plan)",
        operators.Stats.ksMatrixPlan(li, "l_extendedprice", "l_returnflag",
          1024, 16)),
      ("q147_rank_percentiles(plan)",
        operators.Stats.groupedExactPercentilesPlan(li, "l_returnflag",
          "l_extendedprice", Seq(0.05, 0.5, 0.95))))
    val lazyOffenders = lazyPlans.flatMap { case (name, (result, caches)) =>
      val p = result.queryExecution.executedPlan.toString
      caches.foreach(_.unpersist())
      if (hasGlobalWindow(p)) Some(name) else None
    }
    spark.catalog.clearCache()
    assert((offenders ++ lazyOffenders).isEmpty,
      s"unallowlisted single-partition windows in: ${(offenders ++ lazyOffenders).mkString(", ")}")
  }

  test("q160: the allocation result is a shuffle-free driver-local relation") {
    // temperatureAllocate's apportionment is a bounded-domain driver
    // fold; the returned frame must be directly consumable (scan of
    // driver rows), never a plan that re-runs distributed work
    val p = plan("q160_mixture_allocate")
    assert(!p.contains("Exchange"),
      s"apportionment result must not plan a shuffle:\n$p")
  }

  test("q161: k-anonymity audit is ONE keyed aggregation (no join, no window)") {
    val p = plan("q161_k_anonymity")
    assert(!p.contains("Join"), s"audit must not join:\n$p")
    assert(!p.contains("windowspecdefinition"), s"audit must not window:\n$p")
    // one distinct-agg: Spark plans key-exchange (+ optional
    // key+value partial-distinct exchange) — never more
    val nEx = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused"))
    assert(nEx <= 2, s"distinct-agg needs at most 2 exchanges, got $nEx:\n$p")
  }

  test("q162: no all-pairs product; the binary column collapses BELOW every shuffle") {
    val p = plan("q162_image_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"banded Hamming join must never plan an all-pairs product:\n$p")
    // tree walk: no Exchange may appear in the SUBTREE of a decode
    // (MapPartitions) node — i.e. images are fingerprinted in the
    // scan's own stage and only (id, sh, band) rows ever shuffle
    val lines = p.linesIterator.toVector
    def indent(l: String): Int = l.indexWhere(c => c.isLetter)
    for ((l, idx) <- lines.zipWithIndex if l.contains("MapPartitions")) {
      val n = indent(l)
      val subtree = lines.drop(idx + 1).takeWhile(x => indent(x) > n)
      assert(!subtree.exists(_.contains("Exchange")),
        s"an Exchange below the decode means the binary column shuffled:\n$p")
    }
    assert(lines.exists(_.contains("MapPartitions")), "decode stage missing")
  }

  /** K8: every pair adjacent — C(8,3)=56 triangles, each node in
    * C(7,2)=21 of them. */
  private def k8 = {
    val n = spark.range(0, 8)
    n.as("l").crossJoin(n.as("r")).filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
  }

  test("q134: triangle intersections run the sorted-merge kernel; broadcast is GATED") {
    // below the edge limit the gate hints broadcast (bench shape);
    // above it the joins stay UNHINTED — Catalyst/AQE may still pick
    // broadcast from size stats (it does here, the graph is tiny),
    // but a web-scale adjacency can no longer force a driver OOM
    val (small, caches, usedBc) = operators.Graph.triangleParticipationPlan(
      k8, "a", "b", broadcastEdgeLimit = 1L << 22)
    val p = small.queryExecution.executedPlan.toString
    assert(usedBc, "tiny graph must take the broadcast branch")
    assert(p.contains("sorted_intersect_count"),
      s"intersect must be the codegen kernel, not array_intersect:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"gated adjacency joins must broadcast:\n$p")
    caches.foreach(_.unpersist())
    val (large, caches2, usedBc2) = operators.Graph.triangleParticipationPlan(
      k8, "a", "b", broadcastEdgeLimit = 0)
    assert(!usedBc2, "edge count above the limit must refuse the hint")
    assert(!large.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "above the limit no broadcast hint may be planted")
    caches2.foreach(_.unpersist())
  }

  test("self-cleaning operators leave the cache manager empty (no harness clearCache needed)") {
    // q14/q139/q85 keep their sorted-frame caches BY CONTRACT (the
    // result is corpus-scale lineage over the cache; callers unpersist
    // the result, which cascades) — every other persisting catalog
    // query must reclaim its own corpus-scale frames on return
    spark.catalog.clearCache()
    for (q <- Seq("q129_assoc_rules", "q155_dbscan", "q126_bpe_train",
                  "q128_pagerank", "q140_label_propagation")) {
      Queries.byName(q).fn(spark, d).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q left persisted frames behind")
    }
  }

  test("q182/q184/q185: the map-only kernels plan NO exchange and no UDF") {
    for (q <- Seq("q182_int8_quantize", "q184_blocklist_redact",
                  "q185_intra_dup_spans")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must be a pure scan, got an exchange")
      assert(!p.contains("ScalaUDF"), s"$q must stay inside codegen")
    }
  }

  test("q191/q192: the multimodal stat kernels are map-only (no exchange)") {
    for (q <- Seq("q191_audio_vad", "q192_video_scene_cuts")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must plan no shuffle")
      assert(p.contains("MapPartitions"),
        s"$q is the partition-batched decode shape")
    }
  }

  test("q194/q195-sig: the new multimodal kernels stay map-only where claimed") {
    // q194 keyframes: pure partition-batched pass, no shuffle at all
    val p194 = plan("q194_shot_keyframes")
    assert(!p194.contains("Exchange"), "q194 must plan no shuffle")
    assert(p194.contains("MapPartitions"))
  }

  test("q196: modality scores collapse BELOW the joins; no corpus broadcast of wide rows") {
    val p = plan("q196_multimodal_gate")
    // binary columns must never cross an exchange: every Exchange
    // operates on the skinny post-score frames (id + flags/floats)
    val bad = p.linesIterator.filter(_.contains("Exchange"))
      .exists(l => l.contains("img#") || l.contains("aud#") || l.contains("vid#"))
    assert(!bad, "binary columns must collapse before any exchange")
    assert(!p.contains("CartesianProduct"))
  }

  test("q197: no pair product (star edges only), like q189") {
    val p = plan("q197_audio_canonical")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("MapPartitions"), "fingerprint decode is partition-batched")
  }

  test("q200: star edges anchored on per-bucket minima, never a pair product") {
    // connectedComponents eagerly truncates its input lineage, so the
    // catalog entry's final plan never shows the star stage — inspect
    // the stage frame itself
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val sig = docs.select(col("doc_id").as("id"),
      graft.plans.Exprs.minhashSig(col("text"), 3, 64).as("sig"))
    val p = operators.Dedup.minhashStarEdges(sig, 64, 16, 0.2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    // the band buckets must collapse to min-id anchors (the star-edge
    // source), not self-join into a candidate pair list
    assert("""functions=\[(partial_)?min\(id""".r.findFirstIn(p).isDefined,
      "bucket minima must anchor the star edges")
    // the 512B signature is joined back by id for the verify — it must
    // never ride the ×bands bucket explode: no exchange partitioned on
    // the band hash may carry sig in scope
    val sigOnBandExchange = p.linesIterator
      .exists(l => l.contains("hashpartitioning(band#") && l.contains("sig#"))
    assert(!sigOnBandExchange, "signatures must not ride the band shuffle")
  }

  test("q68: gap-emit fill — grid rows are born downstream of the window, never sorted") {
    val p = plan("q68_resample_ffill")
    // the grid-asof formulation this replaced (100x: 35.8 -> 12.5 s,
    // ABResample) unions grid+events through one WindowExec — the
    // OUTPUT-sized rows went through a sort. The gap-emit plan must
    // show the explode (Generate) ABOVE the window and no union
    assert(!p.contains("Union"), "no union-asof trick in the gap-emit plan")
    assert(p.contains("Generate explode"), "grid ranges must be emitted by explode")
    val genIdx = p.indexOf("Generate explode")
    val winIdx = p.indexOf("Window")
    assert(winIdx > genIdx,
      "the window (lower in the tree = later in the string) must run BELOW the explode")
    // two exchanges total: the (user, ts) pre-average and the per-user
    // window — the bounds/grid/asof shuffles of the old plan are gone
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      "gap-emit fill shuffles exactly twice (pre-average + window)")
  }

  test("q190: hot set broadcasts; corpus lines shuffle ONCE (the doc regroup)") {
    val p = plan("q190_boilerplate_lines")
    // the hot-flag join is COUNT-GATED (Dedup.boilerplateLinesPlan):
    // on this corpus the hot set is far below the limit, so the gate
    // must choose the broadcast branch — never a corpus-wide shuffled
    // join on the default path
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // exactly one doc-keyed exchange: the single regroup that computes
    // n_lines + n_removed + rebuilt text together (the 3-scan/2-shuffle
    // formulation this replaced would show two)
    assert("Exchange hashpartitioning\\(id#".r.findAllIn(p).size === 1,
      "corpus lines must shuffle exactly once")
  }

  test("q190 fallback: a tripped hot-set gate drops the broadcast HINT on the hot join") {
    // limit 0 trips the gate: the hot frame must not carry a FORCED
    // broadcast hint (the unconditional hint overriding the size
    // threshold is the executor-heap cliff the gate exists to avoid).
    // A size-based auto-broadcast is still fine — it only fires below
    // spark.sql.autoBroadcastJoinThreshold — so distinguish hint from
    // auto by disabling auto-broadcast while building the plan: a
    // hinted plan would STILL broadcast, a gated plan must not.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lined = Tables.documents(spark, d).select(col("doc_id"), col("source"),
        plans.Exprs.chunkTokens(col("text"), 8).as("t"))
      val (f, used) = operators.Dedup.boilerplateLinesPlan(
        lined, "t", "doc_id", "source", minDf = 2, sep = "\n",
        broadcastHotLimit = 0L)
      assert(!used)
      val pf = f.queryExecution.executedPlan.toString
      val hotJoin = pf.linesIterator.filter(l =>
        l.contains("Join") && l.contains("_h#")).toSeq
      assert(hotJoin.nonEmpty, s"expected the hot-flag join in plan:\n$pf")
      assert(!hotJoin.exists(_.contains("Broadcast")),
        "tripped gate must not FORCE a broadcast of the hot frame")
      // and the default gate DOES force it, threshold notwithstanding
      val (g, usedB) = operators.Dedup.boilerplateLinesPlan(
        lined, "t", "doc_id", "source", minDf = 2, sep = "\n",
        broadcastHotLimit = 1L << 20)
      assert(usedB)
      assert(g.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "untripped gate must broadcast regardless of the auto threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q189: no pair product, no corpus cache (persist measured slower at 100x)") {
    val p = plan("q189_image_canonical")
    assert(!p.contains("CartesianProduct"))
    // the skinny-sig persist regressed 100x 17.3 -> 28.5 s (cache
    // partitioning throttles the banded join); the decode is re-run
    // per consumer BY CHOICE — keep it that way until the codec is
    // genuinely expensive
    assert(!p.contains("InMemoryTableScan"),
      "q189 deliberately avoids caching the sig frame")
  }

  test("q177: the gram index shuffles only skinny hash rows; hot-gram agg is partial") {
    val p = plan("q177_dup_spans")
    // the only exchanges are on the 8-byte gram hash and the doc id —
    // never on a text column
    assert(!p.contains("Exchange hashpartitioning(text"),
      "document payload must never be a partitioning key")
    assert(p.contains("partial_min") || p.contains("partial min"),
      "hot-gram detection must partially aggregate map-side (min/max, no distinct)")
    assert(!p.toLowerCase.contains("distinct"),
      "the min!=max rewrite must leave no distinct aggregation in the plan")
  }

  test("q178: training feature frame is cached; gradient agg keys on the bucket") {
    val w = operators.Trainer.trainHashedLinear(
      Tables.documents(spark, d).withColumn("y",
        when(col("lang") === "en", 1.0).otherwise(0.0)),
      "text", "y", m = 64, iters = 1, lr = 4.0)
    assert(w.length === 64)
    assert(spark.sharedState.cacheManager.isEmpty,
      "trainer must release its feature cache on return")
  }

  test("q186: the funnel releases every stage cache on return") {
    operators.Curation.funnel(Tables.documents(spark, d)).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "funnel must unpersist s2/s3 (and the gate its scored frame)")
  }

  test("q134: the public operator cleans up its own caches and both gate branches agree") {
    val bc = operators.Graph.triangleParticipation(k8, "a", "b").collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangleParticipation must unpersist its adjacency on return")
    val smj = operators.Graph.triangleParticipation(k8, "a", "b",
      broadcastEdgeLimit = 0).collect()
    assert(bc.map(_.toString).sorted.toSeq === smj.map(_.toString).sorted.toSeq,
      "broadcast and sort-merge branches must produce identical counts")
    assert(bc.length === 8 && bc.forall(_.getLong(1) == 21L),
      s"K8: every node participates in C(7,2)=21 triangles, got ${bc.mkString(", ")}")
  }

  test("q201: line metrics ride the codegen kernel; every window doc-keyed") {
    val p = plan("q201_repetition_profile")
    // the re-lining must be the single-pass chunk_tokens_ws kernel and
    // not an in-row array regroup (O(lines) allocations). Since the r17
    // tokenizer unification chunk_tokens computes the same function,
    // but q201's plan stays pinned to the _ws name — the kernel whose
    // contract (engine ws class = RE2 \s) the r15/r16 advisors audited
    assert(p.contains("chunk_tokens_ws"),
      s"q201 must re-line via the regex-\\s kernel:\n$p")
    assert(!p.contains("chunk_tokens("),
      s"plain chunkTokens must not appear in q201:\n$p")
    // the line metrics are in-row arithmetic: the only shuffles allowed
    // are the top-bigram path's (doc,gram) agg, its doc-keyed window,
    // and the id join-back — nothing global-ordered
    assert(!hasGlobalWindow(p), s"q201 planned a global window:\n$p")
  }

  test("q129: pair generation is in-row over the cached sets — no self-join") {
    // the public brandRules returns a LocalRelation (post-collect), so
    // the audit runs on the pre-collect seam. Shape contract: the
    // per-order sets persist and feed every consumer (InMemoryTableScan
    // in the plan), the denominators/pair frames join via broadcast
    // only, and NO sort-merge join or cartesian product exists anywhere
    // — the quadratic work lives inside the in-row transform, never in
    // a join of the order-brand table with itself
    val (out, sets) = graft.operators.AssocRules.brandRulesFrame(
      Tables.lineitem(spark, d), Tables.part(spark, d),
      minSupport = 2L, topN = 25, maxPairCombos = Long.MaxValue,
      maxBrands = 100000)
    try {
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"),
        s"q129's consumers must read the persisted sets:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"q129's denominator joins must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"q129 must not sort-merge anything:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"q129 must not plan a cartesian product:\n$p")
      assert(!hasGlobalWindow(p), s"q129 planned a global window:\n$p")
    } finally sets.unpersist(blocking = false)
  }
}
