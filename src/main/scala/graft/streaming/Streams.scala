package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is batch-only (SURVEY
  * §2.10), so these are the engine's forward-looking stream operators
  * over the `events` table shape (event_id, user_id, ts, event_type,
  * value, props): the same transforms run identically on a batch
  * DataFrame or a `readStream` DataFrame — Spark's unified Dataset API
  * — which the tests exploit by checking stream output == batch output
  * on the same rows.
  *
  * Scale notes: all operators are keyed aggregations — the stream
  * shuffles once on the grouping key. Watermarks bound the state of
  * the window and dedup operators; the sessionizer keeps one small
  * state object per user (not per event) and is bounded by the user
  * population, not a watermark — see its scaladoc.
  */
object Streams {

  /** Tumbling-window event counts with a watermark (the streaming twin
    * of the batch q30): `window(ts, windowDur)` × event_type.
    */
  def windowedCounts(events: DataFrame, windowDur: String,
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming distribution-drift monitor: per event-time window, the
    * value column is bucketed into `bins` fixed bins and the window's
    * realized distribution is scored against a broadcast BASELINE
    * (expected per-bin fractions, e.g. from last month's batch
    * profile) with PSI = Σ (p−q)·ln(p/q), both sides ε-floored.
    *
    * ONE stateful aggregation: per-bin counts are conditional sums in
    * a single groupBy(window), so state = `bins` longs per open window,
    * watermark-evicted; the PSI fold is a stateless projection with
    * the baseline as a literal array. (The alternative — groupBy
    * (window, bin) then a second windowed agg — would chain two
    * stateful operators for the same result.)
    */
  def driftStream(events: DataFrame, tsCol: String, valueCol: String,
                  windowDur: String, lo: Double, hi: Double, bins: Int,
                  baseline: Array[Double],
                  watermark: String = "1 hour"): DataFrame = {
    require(baseline.length == bins)
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int")))
    val counts = events.withWatermark(tsCol, watermark)
      .filter(col(valueCol).isNotNull)
      .withColumn("_b", bin)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("total"),
        array((0 until bins).map(i =>
          sum(when(col("_b") === i, 1L).otherwise(0L))): _*).as("ns"))
    val psi = (0 until bins).map { i =>
      val p = greatest(col("ns")(i).cast("double") / col("total").cast("double"),
        lit(1e-6))
      val qi = lit(math.max(baseline(i), 1e-6))
      (p - qi) * log(p / qi)
    }.reduce(_ + _)
    counts.select(col("w.start").as("window_start"), col("total"),
      round(psi, 6).as("psi"))
  }

  /** Streaming two-sample Kolmogorov–Smirnov drift monitor: per
    * event-time window, `D = sup_x |F_win(x) − F_base(x)|` between the
    * window's `valueCol` distribution and a BROADCAST baseline
    * histogram on the same fixed grid (per-bin counts, e.g. last
    * month's batch profile binned once) — the KS companion to
    * [[driftStream]]'s PSI, reusing [[graft.operators.Stats.ksTest]]'s
    * binned-CDF decomposition.
    *
    * ONE stateful aggregation, state = `bins` longs per open window
    * (the same conditional-sum array as [[driftStream]]),
    * watermark-evicted. The CDF fold is a STATELESS projection of
    * constant plan size: cumulative window counts come from a
    * `transform(sequence, aggregate(slice))` higher-order expression
    * (runtime O(bins²) per emitted window row — window rows are few),
    * the baseline cumulative rides as a literal array, and the sup is
    * the same exact integer cross-difference
    * `max_k |cumW_k·n_b − cumB_k·n_win|` as the batch operator, taken
    * at the SMALLEST attaining bin (`array_position` finds the first
    * maximum).
    *
    * Exactness contract: when every value lies on a bin lower edge
    * (grid-quantized scores, integer counts, micro-units — with
    * `lo + k·(hi−lo)/bins` exactly representable), both empirical CDFs
    * are constant inside every bin, so the binned sup IS the exact
    * two-sample statistic and `d_stat`/`at_value` equal
    * `Stats.ksTest` on the union of window rows and baseline sample
    * (the parity StreamsSpec pins). Off-grid values bin-quantize the
    * evaluation points: `d_stat` then underestimates by at most the
    * largest within-bin CDF movement — size `bins` to the resolution
    * the alert threshold needs.
    */
  def ksStream(events: DataFrame, tsCol: String, valueCol: String,
               windowDur: String, lo: Double, hi: Double, bins: Int,
               baselineBins: Array[Long],
               watermark: String = "1 hour"): DataFrame = {
    require(baselineBins.length == bins,
      s"baselineBins must have one count per bin ($bins)")
    require(baselineBins.forall(_ >= 0L))
    val nB = baselineBins.sum
    require(nB > 0L, "baseline histogram is empty")
    val cumB: Seq[Long] = baselineBins.scanLeft(0L)(_ + _).tail.toSeq
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int")))
    val counts = events.withWatermark(tsCol, watermark)
      .filter(col(valueCol).isNotNull)
      .withColumn("_b", bin)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("total"),
        array((0 until bins).map(i =>
          sum(when(col("_b") === i, 1L).otherwise(0L))): _*).as("ns"))
    val cumW = transform(sequence(lit(1), lit(bins)),
      k => aggregate(slice(col("ns"), lit(1), k), lit(0L), (a, x) => a + x))
    val diffs = zip_with(cumW, typedLit(cumB),
      (wc, bc) => abs(wc * lit(nB) - bc * col("total")))
    val step = (hi - lo) / bins
    counts
      .withColumn("_diffs", diffs)
      .withColumn("_dint", array_max(col("_diffs")))
      .select(col("w.start").as("window_start"),
        col("total").as("n_win"), lit(nB).as("n_base"),
        round(col("_dint").cast("double") /
          (col("total").cast("double") * lit(nB.toDouble)), 9).as("d_stat"),
        (lit(lo) + (array_position(col("_diffs"), col("_dint")) - 1) *
          lit(step)).as("at_value"))
  }

  /** Streaming windowed percentile monitor: per event-time window, a
    * bin-resolution BRACKET `[lo_bound, hi_bound)` for each requested
    * percentile — the streaming twin of the batch rank-based
    * percentile path ([[graft.operators.Stats.groupedExactPercentiles]]).
    * The batch operator resolves the exact order statistic with a
    * second within-bin pass; a single-pass windowed aggregation cannot
    * revisit data, so the streaming contract is the honest one-pass
    * half: the target rank `⌈p·n⌉` is located in the cumulative bin
    * histogram and the crossing bin's value-domain edges are emitted.
    * Bracket width = (hi−lo)/bins — size `bins` to the alert
    * resolution needed (the p99-latency-dashboard shape).
    *
    * ONE stateful aggregation, state = `bins` longs per open window
    * (same bound as [[driftStream]]/[[ksStream]]), watermark-evicted;
    * the rank lookup is a stateless projection per percentile. By
    * construction the true within-window percentile lies inside the
    * emitted bracket — the invariant the spec pins against the exact
    * batch path.
    */
  def percentileStream(events: DataFrame, tsCol: String, valueCol: String,
                       windowDur: String, lo: Double, hi: Double, bins: Int,
                       percentiles: Seq[Double],
                       watermark: String = "1 hour"): DataFrame = {
    require(bins >= 1 && bins <= 100000, s"bins out of range: $bins")
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0,1]: $percentiles")
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int")))
    // clamp out-of-range values into the edge bins (same policy as the
    // drift/KS monitors): the bracket for a percentile that lands in an
    // edge bin is then a one-sided bound
    val counts = events.withWatermark(tsCol, watermark)
      .filter(col(valueCol).isNotNull)
      .withColumn("_b", bin)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("total"),
        array((0 until bins).map(i =>
          sum(when(col("_b") === i, 1L).otherwise(0L))): _*).as("ns"))
    val cum = transform(sequence(lit(1), lit(bins)),
      k => aggregate(slice(col("ns"), lit(1), k), lit(0L), (a, x) => a + x))
    val step = (hi - lo) / bins
    counts
      .withColumn("_cum", cum)
      .select(col("w.start").as("window_start"), col("total").as("n_win"),
        explode(array(percentiles.map { p =>
          val target = greatest(lit(1L), ceil(col("total") * lit(p)).cast("long"))
          val idx = size(filter(col("_cum"), c => c < target)) // 0-based crossing bin
          struct(lit(p).as("p"),
            (lit(lo) + idx.cast("double") * lit(step)).as("lo_bound"),
            (lit(lo) + (idx + 1).cast("double") * lit(step)).as("hi_bound"))
        }: _*)).as("q"))
      .select(col("window_start"), col("n_win"), col("q.p"),
        col("q.lo_bound"), col("q.hi_bound"))
  }

  /** Streaming heavy hitters: per event-time window, the top-`topN`
    * terms by Misra–Gries estimate (the streaming twin of the batch
    * q79 — "what's trending in the ingest feed right now").
    *
    * ONE stateful aggregation: the mergeable
    * [[graft.operators.Sketches.MisraGries]] Aggregator runs inside
    * the windowed groupBy, so streaming state is a ≤`capacity`-entry
    * counter map per open window — bounded regardless of stream
    * volume or term universe, watermark-evicted. Ranking the single
    * result map is a stateless array_sort projection (no second
    * aggregation, no window function).
    *
    * Estimate semantics: identical to batch Misra–Gries — exact when a
    * window's distinct-term count stays ≤ capacity (the parity the
    * spec pins), within n/capacity under-count otherwise. Above
    * capacity the surviving counter SET can additionally depend on
    * micro-batch arrival order (the classic mergeable-sketch caveat —
    * same as running batch MG under a different partitioning); size
    * capacity for the tail you care about.
    */
  def heavyHittersStream(events: DataFrame, tsCol: String, termCol: String,
                         windowDur: String, capacity: Int, topN: Int,
                         watermark: String = "1 hour"): DataFrame = {
    val agg = udaf(new graft.operators.Sketches.MisraGries(capacity),
      Encoders.STRING)
    val ranked = array_sort(map_entries(col("_m")), (a, b) =>
      when(a.getField("value") > b.getField("value"), -1)
        .when(a.getField("value") < b.getField("value"), 1)
        .when(a.getField("key") < b.getField("key"), -1)
        .when(a.getField("key") > b.getField("key"), 1)
        .otherwise(0))
    events.withWatermark(tsCol, watermark)
      .filter(col(termCol).isNotNull && length(col(termCol)) > 0)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(agg(col(termCol)).as("_m"))
      .select(col("w.start").as("window_start"),
        posexplode(slice(ranked, 1, topN)))
      .select(col("window_start"), col("col.key").as("term"),
        col("col.value").as("est_count"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Streaming windowed distinct-count estimate: per event-time window,
    * the approximate number of distinct `keyCol` values (unique users /
    * documents / sources per window) via the mergeable
    * [[graft.operators.Sketches.KmvDistinct]] sketch.
    *
    * State = k longs per open window, watermark-evicted. Unlike the
    * Misra–Gries stream (whose surviving counter SET can depend on
    * micro-batch arrival order above capacity), the KMV state is the
    * SET of the k smallest distinct hashes — a commutative, idempotent
    * merge — so stream output equals batch output EXACTLY at any
    * cardinality, not just below the sketch size. Exact (integer)
    * counts below k distinct; (k−1)/kth-min estimate above.
    * `keyCol` must be integral (the sketch hashes with the engine's
    * reproducible splitmix64, the q62 oracle contract); pre-hash other
    * types with xxhash64 and [[Sketches.kmvDistinctHashed]].
    */
  def distinctCountStream(events: DataFrame, tsCol: String, keyCol: String,
                          windowDur: String, k: Int = 256,
                          watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .filter(col(keyCol).isNotNull)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(graft.operators.Sketches.kmvDistinct(col(keyCol), k), 4)
          .as("est_distinct"))
      .select(col("w.start").as("window_start"), col("n_events"),
        col("est_distinct"))

  /** Streaming exact dedup: drops re-deliveries of the same key across
    * micro-batches; the watermark bounds the dedup state (keys older
    * than the watermark are evicted, so state is O(keys within the
    * lateness window), not O(stream)).
    */
  def dedupStream(events: DataFrame, keyCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keyCol, tsCol)

  /** Streaming corpus-ingest curation: score each arriving document
    * with the hashed linear classifier (the same narrow codegen
    * projection as batch — kernels run at scan speed inside
    * micro-batches), keep docs above `minScore`, and drop exact
    * re-deliveries by 8-byte content hash. The watermark bounds the
    * dedup state: one hash per kept doc within the lateness horizon —
    * never the text, never unbounded.
    */
  def curateStream(docs: DataFrame, textCol: String, tsCol: String,
                   weights: Array[Double], minScore: Double,
                   watermark: String = "1 hour"): DataFrame = {
    val gated = docs.withWatermark(tsCol, watermark)
      .withColumn("score",
        graft.operators.QualityClassifier.scoreCol(col(textCol), weights))
      .filter(col("score") >= minScore)
      .withColumn("_h", xxhash64(col(textCol)))
    // dedup on the hash ALONE (same text at a different ts is still a
    // dup); WithinWatermark gives state eviction without the event-time
    // column in the key — but only exists for streams, so the batch
    // twin of the same pipeline uses plain dropDuplicates
    val deduped =
      if (docs.isStreaming) gated.dropDuplicatesWithinWatermark("_h")
      else gated.dropDuplicates("_h")
    deduped.drop("_h")
  }

  /** Streaming eval-contamination guard: every arriving document's
    * shingle set is intersected IN-ROW against the benchmark's distinct
    * shingle-hash set (a broadcast sorted-array literal — eval suites
    * are catalog-scale by contract, thousands of items), and each
    * event-time window reports how many docs overlap the benchmark
    * above `minOverlap` — the online twin of the batch
    * [[graft.operators.Dedup.contaminationRate]] gate, catching eval
    * leakage AT INGEST instead of at the next full-corpus audit.
    *
    * Scale shape: no stream-stream join, no per-doc state — the
    * intersection is the allocation-free sorted-merge kernel
    * ([[graft.plans.Exprs.sortedIntersectCount]]) over two sorted
    * arrays, a stateless map; the only stateful operator is the
    * windowed aggregation (three longs + one double per open window,
    * watermark-evicted).
    */
  def contaminationStream(docs: DataFrame, textCol: String, tsCol: String,
                          benchmark: DataFrame, benchTextCol: String,
                          shingleK: Int = 3, minOverlap: Double = 0.5,
                          windowDur: String = "1 hour",
                          watermark: String = "1 hour",
                          maxBenchShingles: Int = 10000000): DataFrame = {
    import graft.plans.Exprs
    // the eval-suite-is-catalog-scale contract, enforced instead of
    // prose-only: the sorted array rides the plan as one broadcast
    // literal (8 B/shingle — the 10M default is an ~80 MB literal,
    // about the practical broadcast ceiling). A corpus-sized
    // `benchmark` belongs in the batch contaminationRate join, not
    // here. The guard bounds the COLLECT itself, not just the literal
    // (r14 advisor: an unbounded collect would OOM the driver before
    // any require fires) — the same fused bounded-collect the ngram
    // pair gate uses: ONE limit(max+1) action both proves the bound
    // and yields the whole set; the sort happens driver-side (≤ 10M
    // longs) instead of a cluster-wide orderBy whose result a refusal
    // would discard anyway.
    // refuse an un-boundable cap up front rather than clamping: a clamp
    // below max+1 would let an over-cap benchmark PASS the require while
    // the collected set is silently truncated — contamination
    // under-detection instead of refusal (r15 advisor). The collect
    // couldn't hold more than Int.MaxValue rows anyway.
    require(maxBenchShingles <= Int.MaxValue - 2,
      s"maxBenchShingles=$maxBenchShingles cannot be bound-checked by a " +
        "driver collect (limit is Int-sized); a benchmark that large " +
        "belongs in the batch Dedup.contaminationRate join")
    val probe = benchmark
      .select(explode(Exprs.shingleHashes(col(benchTextCol), shingleK)).as("sh"))
      .distinct()
      .limit(maxBenchShingles + 1)
      .collect()
    require(probe.length <= maxBenchShingles,
      s"benchmark has > maxBenchShingles=$maxBenchShingles distinct " +
        "shingles — too large to ride the stream plan as a broadcast " +
        "literal; use the batch Dedup.contaminationRate join, or raise " +
        "maxBenchShingles explicitly")
    val benchArr: Seq[Long] = probe.map(_.getLong(0)).sorted.toSeq
    val benchLit = typedLit(benchArr)
    docs.withWatermark(tsCol, watermark)
      .withColumn("_hs", Exprs.shingleHashes(col(textCol), shingleK))
      .withColumn("_n", size(col("_hs")))
      .filter(col("_n") > 0)
      .withColumn("_ov",
        Exprs.sortedIntersectCount(col("_hs"), benchLit).cast("double") /
          col("_n").cast("double"))
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_ov") >= minOverlap, 1L).otherwise(0L)).as("n_contaminated"),
        round(max(col("_ov")), 6).as("max_overlap"))
      .select(col("w.start").as("window_start"), col("n_docs"),
        col("n_contaminated"), col("max_overlap"))
  }

  /** Streaming ingest-time NEAR-dup gate against a static reference
    * corpus — the online twin of the batch
    * [[graft.operators.Dedup.minhashAgainst]] (q82), catching
    * near-duplicates of already-held documents AT INGEST: each
    * arriving document computes its MinHash signature and band keys
    * in-row (stateless map), the band keys probe the corpus's
    * precomputed band index through a stream-static equi-join, and
    * surviving candidates verify by the usual signature-agreement
    * estimate (matches/numPerms ≥ `threshold`) after fetching the
    * corpus signature in a second stream-static join. Emits
    * (existing_id, incoming_id, est_jaccard) per flagged arrival.
    *
    * Scale shape: the ONLY stateful operator is the within-watermark
    * pair dedup (multiple band collisions of one pair produce
    * identical rows); both joins are stream-static — the corpus never
    * shuffles per micro-batch and holds no join state. At production
    * corpus sizes persist the two corpus-side frames (band index +
    * signatures) before starting the query, or the static plan
    * re-derives them every micro-batch. Runs identically on batch
    * frames (plain dropDuplicates replaces the watermark variant).
    */
  def nearDupAgainstStream(incoming: DataFrame, textCol: String,
                           tsCol: String, idCol: String,
                           corpus: DataFrame, corpusTextCol: String,
                           corpusIdCol: String,
                           shingleK: Int = 3, numPerms: Int = 64,
                           bands: Int = 16, threshold: Double = 0.5,
                           watermark: String = "1 hour"): DataFrame = {
    import graft.plans.Exprs
    require(numPerms % bands == 0, "numPerms must divide into bands")
    // textCol/idCol are renamed into the plan's working names, but
    // tsCol rides VERBATIM next to the intermediates — a ts column
    // named like one of them alias-clashes (ambiguous-column analysis
    // error at best, a silently wrong join key at worst). Refuse with
    // the contract spelled out
    locally {
      val reserved = Set("band", "bh", "bk", "_sig", "_exsig", "_est",
        "existing_id", "incoming_id", "est_jaccard")
      require(!reserved(tsCol),
        s"tsCol '$tsCol' collides with nearDupAgainstStream's reserved " +
          s"intermediates (${reserved.toSeq.sorted.mkString(", ")}); " +
          "rename the timestamp column")
    }
    val rows = numPerms / bands
    def bandKeys(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array((0 until bands).map(bi =>
        struct(lit(bi).as("band"),
          xxhash64(slice(sig, bi * rows + 1, rows)).as("bh"))): _*)
    val exSig = corpus.select(col(corpusIdCol).as("existing_id"),
      Exprs.minhashSig(col(corpusTextCol), shingleK, numPerms).as("_exsig"))
    val exBanded = exSig.select(col("existing_id"),
        explode(bandKeys(col("_exsig"))).as("bk"))
      .select(col("existing_id"), col("bk.band"), col("bk.bh"))
    val inBanded = incoming.withWatermark(tsCol, watermark)
      .withColumn("_sig", Exprs.minhashSig(col(textCol), shingleK, numPerms))
      .select(col(idCol).as("incoming_id"), col(tsCol), col("_sig"),
        explode(bandKeys(col("_sig"))).as("bk"))
      .select(col("incoming_id"), col(tsCol), col("_sig"),
        col("bk.band"), col("bk.bh"))
    val verified = inBanded.join(exBanded, Seq("band", "bh"))
      .join(exSig, Seq("existing_id"))
      .withColumn("_est",
        aggregate(zip_with(col("_sig"), col("_exsig"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") /
          lit(numPerms).cast("double"))
      // filter on the RAW estimate, round only the output — the exact
      // operator order of the batch twin (q82 rounds after its filter)
      .filter(col("_est") >= threshold)
      .select(col("existing_id"), col("incoming_id"), col(tsCol),
        round(col("_est"), 4).as("est_jaccard"))
    val deduped =
      if (incoming.isStreaming)
        verified.dropDuplicatesWithinWatermark("existing_id", "incoming_id")
      else verified.dropDuplicates("existing_id", "incoming_id")
    deduped.drop(tsCol)
  }

  /** Streaming FINGERPRINT near-dup gate against a static corpus —
    * [[nearDupAgainstStream]]'s sibling for the 64-bit Hamming
    * modalities (image dHash / audio energy-delta fingerprints, the
    * q162/q195 signature contract): arriving (id, ts, sh) rows key
    * their fingerprint with the guaranteed-recall block-combination
    * scheme in-row, probe the corpus's precomputed key index through a
    * stream-static join, and survivors verify the exact Hamming
    * distance. Emits (existing_id, incoming_id, hamming ≤
    * `maxHamming`) per flagged arrival; the within-watermark pair
    * dedup (one pair can collide on several block keys) is the only
    * stateful operator — the corpus never shuffles per micro-batch.
    * Decode the media to fingerprints UPSTREAM (e.g.
    * [[graft.operators.Multimodal.dhash64]] via its column kernels) so
    * binary payloads never enter the stream plan. Runs identically on
    * batch frames.
    */
  def hammingAgainstStream(incoming: DataFrame, tsCol: String,
                           idCol: String, shCol: String,
                           corpus: DataFrame, corpusIdCol: String,
                           corpusShCol: String, maxHamming: Int,
                           watermark: String = "1 hour"): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.HashFunctions
    // same verbatim-tsCol contract as nearDupAgainstStream (idCol and
    // shCol are renamed into the kernel's working names id/sh, so only
    // the ts column can clash — blockKeyed emits t/k beside it)
    locally {
      val reserved = Set("id", "sh", "t", "k", "_exsh", "_insh",
        "existing_id", "incoming_id", "hamming")
      require(!reserved(tsCol),
        s"tsCol '$tsCol' collides with hammingAgainstStream's reserved " +
          s"intermediates (${reserved.toSeq.sorted.mkString(", ")}); " +
          "rename the timestamp column")
    }
    val exKeyed = Dedup.blockKeyed(
        corpus.select(col(corpusIdCol).as("id"), col(corpusShCol).as("sh")),
        maxHamming)
      .select(col("id").as("existing_id"), col("sh").as("_exsh"),
        col("t"), col("k"))
    val inKeyed = Dedup.blockKeyed(
        incoming.withWatermark(tsCol, watermark)
          .select(col(idCol).as("id"), col(shCol).as("sh"), col(tsCol)),
        maxHamming, extraCols = Seq(tsCol))
      .select(col("id").as("incoming_id"), col("sh").as("_insh"),
        col(tsCol), col("t"), col("k"))
    val verified = inKeyed.join(exKeyed, Seq("t", "k"))
      .withColumn("hamming",
        HashFunctions.hamming64(col("_insh"), col("_exsh")))
      .filter(col("hamming") <= maxHamming)
      .select(col("existing_id"), col("incoming_id"), col(tsCol),
        col("hamming").cast("long").as("hamming"))
    val deduped =
      if (incoming.isStreaming)
        verified.dropDuplicatesWithinWatermark("existing_id", "incoming_id")
      else verified.dropDuplicates("existing_id", "incoming_id")
    deduped.drop(tsCol)
  }

  /** Stream-stream inner equi-join with an event-time interval: each
    * left row pairs with right rows of the same key whose timestamp is
    * within `[leftTs - lowerSec, leftTs + upperSec]`. Both sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions, so Spark can size the join state to the interval + the
    * watermark horizon and evict — the required shape for an unbounded
    * stream-stream join (an unconstrained one grows state forever).
    * One shuffle per side on the key. Runs identically on batch frames.
    *
    * Non-key column names must be disjoint across the two sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long,
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark).withColumnRenamed(key, "_rkey")
    l.join(r,
        col(key) === col("_rkey") &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECONDS"))
      .drop("_rkey")
  }

  case class EventIn(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionState(sessionCount: Long, lastTs: Long, nEvents: Long)
  case class SessionOut(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization via `flatMapGroupsWithState` (the
    * streaming twin of the batch q31): counts sessions per user with a
    * `gapSeconds` inactivity threshold. State is one small
    * (count, lastTs, nEvents) record per user — never per event — and
    * each micro-batch emits the user's running totals (Update mode).
    *
    * State-boundedness: the state is O(distinct users), NOT bounded by
    * a watermark — `NoTimeout` is deliberate because evicting a user's
    * state would reset their running totals (the operator's contract).
    * To bound state on an unbounded user population, key on
    * (user, coarse time bucket) so old buckets go cold, or switch to
    * `EventTimeTimeout` + final-emission semantics.
    *
    * Late arrivals: a cross-batch late event (ts before the user's
    * `lastTs`) joins the current session and never moves `lastTs`
    * backwards, so it cannot fabricate a session break for the next
    * on-time event. Within ±gap of the true order this matches the
    * batch answer; an event later than that would have opened its own
    * session in batch — a documented divergence of running-total
    * streaming semantics.
    */
  case class FunnelIn(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                      event_type: String)
  case class FunnelState(pendingViews: Seq[Long], nViews: Long,
                         nConverted: Long, maxTs: Long)
  case class FunnelOut(user_id: Long, n_views: Long, n_converted: Long)

  /** Stateful streaming funnel (the streaming twin of the batch q83):
    * a view CONVERTS when some click of the same user follows it within
    * `gapSeconds`. State per user is (pending view timestamps within
    * the gap horizon, running counters) — pending views older than
    * `maxTs − gap` can never be converted by a later on-time click and
    * are evicted each batch, so state is bounded by the click window,
    * not the stream.
    *
    * Ordering contract mirrors [[sessionize]]: rows are sorted
    * (ts, event_id) within each micro-batch; a cross-batch late click
    * still converts any pending view in its window, but a view whose
    * convertible window was already evicted stays unconverted — the
    * documented divergence of running-total streaming semantics.
    */
  def funnelStream(events: Dataset[FunnelIn], gapSeconds: Long): Dataset[FunnelOut] = {
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(FunnelState(Vector.empty, 0L, 0L, Long.MinValue))
          var pending = st.pendingViews.toVector
          var (nViews, nConv, maxTs) = (st.nViews, st.nConverted, st.maxTs)
          val gapMs = gapSeconds * 1000
          sorted.foreach { e =>
            val t = e.ts.getTime
            maxTs = math.max(maxTs, t)
            e.event_type match {
              case "view" => pending :+= t; nViews += 1
              case "click" =>
                val (converted, still) = pending.partition(v => v <= t && t - v <= gapMs)
                nConv += converted.size
                pending = still
              case _ => ()
            }
          }
          // horizon eviction: no future on-time click can convert these
          pending = pending.filter(v => maxTs - v <= gapMs)
          state.update(FunnelState(pending, nViews, nConv, maxTs))
          Iterator.single(FunnelOut(userId, nViews, nConv))
      }(Encoders.product[FunnelState], Encoders.product[FunnelOut])
  }

  case class TransState(lastTs: Long, lastId: Long, lastType: String)
  case class TransOut(user_id: Long, prev_type: String, next_type: String)

  /** Streaming twin of the batch transition matrix (q115): emits one
    * (prev_type, next_type) pair per consecutive event of a user, as
    * an APPEND stream — downstream windowed counts turn it into the
    * running matrix. State is ONE small record per user (the last
    * event seen), never per event.
    *
    * Ordering contract mirrors [[sessionize]]: rows sort by
    * (ts, event_id) within a micro-batch; across batches a user's
    * events are assumed in order — a cross-batch late event appends a
    * transition out of true order (running-total streaming semantics,
    * documented divergence).
    */
  def transitionStream(events: Dataset[FunnelIn]): Dataset[TransOut] = {
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[TransState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[TransOut]
          sorted.foreach { e =>
            last.foreach(s => out += TransOut(userId, s.lastType, e.event_type))
            last = Some(TransState(e.ts.getTime, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }(Encoders.product[TransState], Encoders.product[TransOut])
  }

  def sessionize(events: Dataset[EventIn], gapSeconds: Long): Dataset[SessionOut] = {
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          // within a micro-batch rows arrive unordered: sort by ts
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var (count, last, nEvents) = state.getOption
            .map(s => (s.sessionCount, s.lastTs, s.nEvents))
            .getOrElse((0L, Long.MinValue, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (last == Long.MinValue || t - last > gapSeconds * 1000) count += 1
            last = math.max(last, t) // late events never rewind the clock
            nEvents += 1
          }
          state.update(SessionState(count, last, nEvents))
          Iterator.single(SessionOut(userId, count, nEvents))
      }(Encoders.product[SessionState], Encoders.product[SessionOut])
  }
}
