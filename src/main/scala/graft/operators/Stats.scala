package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics over big columns — the evaluation/monitoring
  * side of a training-data pipeline (does the new crawl batch match the
  * reference distribution? what did a filter do to the length profile?).
  *
  * Everything here is exact and integer-graded where sums cross the
  * wire, so results are reproducible across engines and partitionings.
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov statistic
    * `D = sup_x |F_a(x) − F_b(x)|` between the `valueCol` distributions
    * of two `groupCol` populations, plus the location where the supremum
    * is attained (smallest such value).
    *
    * Scale shape — a two-level prefix sum, no global-order window AT
    * ALL (not even over the bin totals), and no join anywhere:
    *  1. one scan folds the global (lo, hi, n_a, n_b) into driver
    *     literals — a 1-row collect, so the bin expression needs no
    *     broadcast of a globals frame; binned rows persisted (they
    *     feed two passes);
    *  2. per-bin totals (≤ `bins` rows at ANY scale) COLLECT to the
    *     driver and fold into exclusive prefix offsets — the q14
    *     offsets pattern: a literal-map lookup in a projection replaces
    *     both the single-partition window and its broadcast join;
    *  3. in-bin running sums: one shuffle on the bin id, window state =
    *     two scalars; cumulative = bin offset + in-bin running sum.
    * Parallelism of step 3 is capped at `bins` — raise it with the
    * distinct-value count (it only needs to exceed the executor count).
    * The 1-row result collects into a driver-held LocalRelation
    * ([[Ckpt.toLocal]] — survives executor loss, composes lazily) and
    * the bin cache is released before returning.
    *
    * Determinism: cumulative counts are exact longs; the sup is taken
    * over the INTEGER cross-difference `|cum_a·n_b − cum_b·n_a|`
    * (exact while n_a·n_b < 2^53 — beyond that, swap the final compare
    * to decimal), so the max and its argmin location are engine-stable.
    * The one float, `D = diff/(n_a·n_b)`, divides two exactly-
    * representable integers — a single IEEE op both engines agree on.
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
             groupA: String, groupB: String, bins: Int = 1024): DataFrame = {
    val (result, caches) = ksTestPlan(df, valueCol, groupCol, groupA, groupB, bins)
    val out = Ckpt.toLocal(result)
    caches.foreach(_.unpersist(blocking = false))
    out
  }

  /** The lazy final plan + persisted intermediates (the driver-folded
    * globals and offsets jobs run here), for plan-shape tests and
    * callers that want to manage materialization themselves. */
  private[graft] def ksTestPlan(df: DataFrame, valueCol: String, groupCol: String,
                                groupA: String, groupB: String,
                                bins: Int): (DataFrame, Seq[DataFrame]) = {
    require(bins >= 1 && bins <= (1 << 17),
      s"bins=$bins out of [1, 131072]: the per-bin offset folds are " +
        "plan-embedded literal maps, linear in bins — beyond ~1e5 bins " +
        "the literal belongs in a broadcast join, and bin resolution " +
        "gains nothing (the refine pass is already exact)")
    // raw (v, 0/1, 0/1) rows — no per-value pre-aggregation: real-world
    // measure columns are nearly all-distinct (l_extendedprice: 98%),
    // so a groupBy(v) is a full extra shuffle that buys nothing. Ties
    // are instead handled by the RANGE window frame below, which sums
    // ALL peers of the current value — exactly the CDF at v.
    val rows = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .select(col(valueCol).as("v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("ca"),
        when(col(groupCol) === groupB, 1L).otherwise(0L).as("cb"))
    // global envelope + population sizes: 1 row, folded to driver
    // literals (binning is any MONOTONE function of v — the cumulative
    // math below derives offsets from the actual binned data, so the
    // exact bin boundaries never affect the statistic)
    val g = rows.agg(min(col("v").cast("double")).as("_lo"),
      max(col("v").cast("double")).as("_hi"),
      sum(col("ca")).as("_na"), sum(col("cb")).as("_nb")).head()
    val empty = g.isNullAt(0)
    val (lo, hi) = if (empty) (0.0, 0.0) else (g.getDouble(0), g.getDouble(1))
    val na = if (g.isNullAt(2)) 0L else g.getLong(2)
    val nb = if (g.isNullAt(3)) 0L else g.getLong(3)
    val binned = rows
      .withColumn("_bin",
        if (hi == lo) lit(0)
        else least(lit(bins - 1),
          floor((col("v").cast("double") - lit(lo)) / lit(hi - lo) * bins)
            .cast("int")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-bin totals: ≤ `bins` rows at ANY scale — collected and folded
    // into exclusive prefix offsets on the driver (the q14 pattern).
    // This action also materializes the binned cache for the final pass.
    val totals = binned.groupBy(col("_bin"))
      .agg(sum(col("ca")).as("_ta"), sum(col("cb")).as("_tb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def exclusivePrefix(ts: Seq[(Int, Long)]): Map[Int, Long] =
      ts.scanLeft((-1, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
        .sliding(2).collect { case Seq((_, off), (b, _)) => b -> off }.toMap
    val offA = exclusivePrefix(totals.map(t => (t._1, t._2)).toSeq)
    val offB = exclusivePrefix(totals.map(t => (t._1, t._3)).toSeq)
    // RANGE frame: every row's cumulative includes ALL rows with value
    // ≤ its own (peers included), so duplicate values never expose a
    // partial, interleaving-order-dependent cumulative
    val wBin = Window.partitionBy(col("_bin")).orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .select(col("v"),
        (coalesce(element_at(typedLit(offA), col("_bin")), lit(0L)) +
          sum(col("ca")).over(wBin)).as("_cuma"),
        (coalesce(element_at(typedLit(offB), col("_bin")), lit(0L)) +
          sum(col("cb")).over(wBin)).as("_cumb"))
      .withColumn("_diff", abs(col("_cuma") * lit(nb) - col("_cumb") * lit(na)))
    val result = cum.agg(
        max(col("_diff")).as("_dint"),
        // rows are raw (duplicate values allowed), but the RANGE frame
        // gives every peer of a value the identical cumulative — tied
        // (diff, −v) keys therefore carry the SAME v, so max_by is
        // deterministic; (diff, −v) picks the SMALLEST value among
        // genuine sup ties
        max_by(col("v"), struct(col("_diff"), -col("v"))).as("at_value"))
      .select(
        // n_a/n_b mirror the pre-fold aggregate semantics: null on an
        // empty input, the exact counts otherwise
        (if (empty) lit(null).cast("long") else lit(na)).as("n_a"),
        (if (empty) lit(null).cast("long") else lit(nb)).as("n_b"),
        round(col("_dint").cast("double") /
          (lit(na.toDouble) * lit(nb.toDouble)), 9).as("d_stat"),
        col("at_value"))
    (result, Seq(binned))
  }

  /** All-pairs two-sample KS matrix: `D = sup_x |F_i(x) − F_j(x)|`
    * for EVERY unordered pair of `groupCol` populations — the shape a
    * drift dashboard actually wants (which shards moved vs which?).
    *
    * Same two-level prefix decomposition as [[ksTest]], computing ALL
    * pairs together: every row carries G indicator columns, so the
    * driver-folded bin offsets and the in-bin cumulative window
    * compute all G merged CDFs simultaneously (G extra sum states in
    * the SAME window operator — no per-pair re-scan, no join, no
    * global window). Total corpus reads: one discovery scan (a single
    * per-group aggregate that yields the group domain, every nᵢ, and
    * the global [lo, hi] envelope at once), one binning scan into the
    * persisted bin frame, and one cached pass for the cumulative
    * window — independent of the pair count. The G(G−1)/2 integer
    * cross-differences are row-local projections; one final aggregate
    * takes each pair's sup and arg-min location, and the single
    * 1×(pairs) row explodes to the output. Groups are driver-collected
    * by contract (a drift dimension is config-scale — shards, splits,
    * date buckets; `maxGroups` guards the contract).
    *
    * Determinism: identical to [[ksTest]] — exact long cumulatives,
    * integer cross-difference sup (exact while n_i·n_j < 2^53), RANGE
    * frames so duplicate values share one cumulative, min-value
    * tie-break on the sup location. Rows of OTHER groups also evaluate
    * each pair's diff, but a step CDF only changes at its own sample
    * points, so extra evaluation points never raise the sup and the
    * interval-opening point (an i-or-j sample) always wins the min
    * tie-break.
    *
    * `maxGroups` also bounds the PLAN width, not just the collect: the
    * diff projection is G(G−1)/2 columns wide and the final aggregate
    * carries two expressions per pair — at G=16 that is 120 pairs /
    * ~300 agg expressions (comfortably codegen-able); at G=64 it would
    * be 2016 pairs and Janino starts splitting methods. Raise the cap
    * explicitly for wider grids, or batch the groups.
    */
  def ksMatrix(df: DataFrame, valueCol: String, groupCol: String,
               bins: Int = 1024, maxGroups: Int = 16): DataFrame = {
    val (result, caches) = ksMatrixPlan(df, valueCol, groupCol, bins, maxGroups)
    // pairs-bounded result: collect into a LocalRelation and release
    // the bin cache
    val out = Ckpt.toLocal(result)
    caches.foreach(_.unpersist(blocking = false))
    out
  }

  /** The lazy final plan + persisted intermediates (the discovery and
    * offset-fold jobs run here), for plan-shape tests. */
  private[graft] def ksMatrixPlan(df: DataFrame, valueCol: String, groupCol: String,
                                  bins: Int, maxGroups: Int): (DataFrame, Seq[DataFrame]) = {
    require(bins >= 1 && bins <= (1 << 17),
      s"bins=$bins out of [1, 131072]: the per-bin offset folds are " +
        "plan-embedded literal maps, linear in bins — beyond ~1e5 bins " +
        "the literal belongs in a broadcast join, and bin resolution " +
        "gains nothing (the refine pass is already exact)")
    // ONE discovery pass: the per-group (lo, hi, n) aggregate yields
    // the group domain, every population size, AND the global [lo, hi]
    // envelope — no separate distinct() scan for the domain and no
    // globals broadcast (all of it folds to driver literals). A group
    // whose values are all null has no sample points and is dropped.
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
    val gstats = base.groupBy(col(groupCol).cast("string").as("g"))
      .agg(min(col(valueCol).cast("double")).as("_lo"),
        max(col(valueCol).cast("double")).as("_hi"), count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    val groups = gstats.map(_._1).toSeq
    require(groups.size >= 2, "ksMatrix needs at least two groups")
    require(groups.size <= maxGroups,
      s"${groups.size} groups exceed maxGroups=$maxGroups — a KS grid over a " +
        "data-scale dimension is a different (all-pairs) problem; for a wider " +
        "config-scale grid raise maxGroups explicitly or batch the group pairs " +
        "across passes (see SCALE.md §ksMatrix)")
    val lo = gstats.map(_._2).min
    val hi = gstats.map(_._3).max
    val ns = gstats.map(_._4)
    val gi = groups.indices
    val rows = base
      .select(col(valueCol).as("v") +: gi.map(i =>
        when(col(groupCol).cast("string") === groups(i), 1L).otherwise(0L)
          .as(s"_c$i")): _*)
    val binned = rows
      .withColumn("_bin",
        if (hi == lo) lit(0)
        else least(lit(bins - 1),
          floor((col("v").cast("double") - lit(lo)) / lit(hi - lo) * bins)
            .cast("int")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-bin totals driver-folded into exclusive prefix offsets (the
    // q14 pattern, see ksTest) — ≤ bins × G longs, no global window;
    // the collect doubles as the action that fills the binned cache
    val totals = binned.groupBy(col("_bin"))
      .agg(sum(col("_c0")).as("_t0"),
        gi.tail.map(i => sum(col(s"_c$i")).as(s"_t$i")): _*)
      .collect().map(r => r.getInt(0) -> gi.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val offs: IndexedSeq[Map[Int, Long]] = gi.map { i =>
      totals.map { case (b, ts) => (b, ts(i)) }
        .scanLeft((-1, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
        .sliding(2).collect { case Array((_, off), (b, _)) => b -> off }.toMap
    }
    val wBin = Window.partitionBy(col("_bin")).orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .select(col("v") +: gi.map(i =>
        (coalesce(element_at(typedLit(offs(i)), col("_bin")), lit(0L)) +
          sum(col(s"_c$i")).over(wBin)).as(s"_cum$i")): _*)
    val pairs = for { i <- gi; j <- gi if i < j } yield (i, j)
    val diffs = cum.select(col("v") +:
      pairs.map { case (i, j) =>
        abs(col(s"_cum$i") * lit(ns(j)) - col(s"_cum$j") * lit(ns(i)))
          .as(s"_d_${i}_$j") }: _*)
    val aggs = pairs.flatMap { case (i, j) => Seq(
        max(col(s"_d_${i}_$j")).as(s"_m_${i}_$j"),
        max_by(col("v"), struct(col(s"_d_${i}_$j"), -col("v"))).as(s"_at_${i}_$j")) }
    val result = diffs.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (i, j) =>
        struct(lit(groups(i)).as("g_a"), lit(groups(j)).as("g_b"),
          lit(ns(i)).as("n_a"), lit(ns(j)).as("n_b"),
          round(col(s"_m_${i}_$j").cast("double") /
            (lit(ns(i).toDouble) * lit(ns(j).toDouble)), 9)
            .as("d_stat"),
          col(s"_at_${i}_$j").as("at_value")) }: _*)).as("_p"))
      .select(col("_p.g_a").as("g_a"), col("_p.g_b").as("g_b"),
        col("_p.n_a").as("n_a"), col("_p.n_b").as("n_b"),
        col("_p.d_stat").as("d_stat"), col("_p.at_value").as("at_value"))
    (result, Seq(binned))
  }

  /** [[ksMatrix]] for WIDE config-scale grids (G > 16 groups — e.g. 64
    * shards): the all-pairs KS matrix computed in BATCHED passes so no
    * single plan exceeds the 120-pair codegen envelope the `maxGroups`
    * cap protects (G=64 monolithic would be 2016 pair-diff columns and
    * Janino starts splitting methods).
    *
    * Pass algebra (the SCALE.md §ksMatrix recipe, now an API): sort
    * the group domain, split into batches of `batchSize` ≤ 8, and run
    * one [[ksMatrix]] pass per unordered BATCH pair (i < j) over only
    * those two batches' rows — each pass holds ≤ 2·batchSize ≤ 16
    * groups. Every pass necessarily recomputes both batches' internal
    * pairs alongside the cross-batch ones, so each batch's internals
    * are OWNED by the first cross pass that touches it (and dropped
    * from every later pass) — no separate diagonal passes, and every
    * unordered group pair is emitted by exactly one pass. With a
    * single batch (G ≤ batchSize) the one diagonal pass owns its own
    * internals.
    *
    * The passes are independent (each collects its own pairs-bounded
    * LocalRelation), so they SUBMIT CONCURRENTLY — Spark's scheduler
    * interleaves the per-pass jobs across the executors, which turns
    * the per-pass fixed cost (two driver folds + codegen) from a
    * serial sum into a parallel max. Result order stays deterministic:
    * parts are awaited and unioned in pass order.
    *
    * Cost: (G/b)(G/b−1)/2 passes, each scanning only the rows of ≤ 2b
    * groups — for G=64, b=8 that is 28 passes over ~1/4 of the corpus
    * each (~7 corpus-equivalent scans for 2016 pairs). Each pass bins
    * over its own [lo, hi] envelope; D and at_value stay EXACT (the
    * decomposition is bin-local — see [[ksTest]]), so the batched
    * result is bit-identical to a monolithic [[ksMatrix]] with a
    * raised cap ([[StatsSpec]] pins this at G=20).
    *
    * Output: same schema as [[ksMatrix]] (g_a, g_b, n_a, n_b, d_stat,
    * at_value), one row per unordered group pair, pairs-bounded and
    * driver-held. If the group dimension is DATA-scale (thousands of
    * groups), an all-pairs matrix is the wrong tool at any batch size —
    * the OUTPUT is quadratic; use [[ksTest]] against a fixed baseline.
    */
  def ksMatrixBatched(df: DataFrame, valueCol: String, groupCol: String,
                      bins: Int = 1024, batchSize: Int = 8): DataFrame = {
    require(batchSize >= 1 && batchSize <= 8,
      s"batchSize=$batchSize out of [1, 8]: a pass holds 2*batchSize groups " +
        "and must stay inside ksMatrix's 16-group / 120-pair codegen envelope")
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
    val groups = base.select(col(groupCol).cast("string").as("g"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    require(groups.size >= 2, "ksMatrixBatched needs at least two groups")
    val passes = ksBatchPasses(groups, batchSize)
    // the passes are independent pairs-bounded collects — submit them
    // concurrently (bounded pool; Spark job submission is thread-safe)
    // and await in pass order so the union stays deterministic
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(passes.size, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val parts =
      try {
        val fs = passes.map { case (bi, bj, owned) => Future {
          val keep = (bi ++ bj).distinct
          val part = ksMatrix(
            base.filter(col(groupCol).cast("string").isin(keep: _*)),
            valueCol, groupCol, bins, maxGroups = 2 * batchSize)
          // a pass re-derives both batches' internal pairs alongside
          // the cross-batch ones — keep the cross pairs plus only the
          // internals this pass OWNS (first pass touching the batch)
          val cross = (col("g_a").isin(bi: _*) && col("g_b").isin(bj: _*)) ||
            (col("g_a").isin(bj: _*) && col("g_b").isin(bi: _*))
          part.filter(owned.foldLeft(cross)((c, b) =>
            c || (col("g_a").isin(b: _*) && col("g_b").isin(b: _*))))
        } }
        fs.map(Await.result(_, Duration.Inf))
      } finally pool.shutdown()
    // each part is already a driver-held LocalRelation (ksMatrix
    // collects its pairs-bounded result); the union stays local
    parts.reduce(_ unionByName _)
  }

  /** The batched pass plan: one (batchI, batchJ, ownedInternals) entry
    * per ksMatrix invocation, i < j (plus the single diagonal pass when
    * there is only one batch). `ownedInternals` lists the batches whose
    * INTERNAL pairs this pass emits — each batch is owned by the first
    * cross pass that touches it, so no diagonal passes are needed and
    * every unordered group pair is claimed by exactly one pass.
    * Exposed for the StatsSpec envelope/cover gates. */
  private[graft] def ksBatchPasses(groups: Seq[String], batchSize: Int)
      : Seq[(Seq[String], Seq[String], Seq[Seq[String]])] = {
    val batches = groups.grouped(batchSize).toIndexedSeq
    if (batches.size == 1) return Seq((batches(0), batches(0), Seq(batches(0))))
    val assigned = Array.tabulate(batches.size)(i => batches(i).size < 2)
    for {
      i <- batches.indices
      j <- (i + 1) until batches.size
    } yield {
      val owned = Seq(i, j).filter(!assigned(_)).map { k =>
        assigned(k) = true; batches(k)
      }
      (batches(i), batches(j), owned)
    }
  }

  /** Exact interpolated percentiles per group WITHOUT the built-in
    * `percentile` aggregate's per-group counts map (state ∝ distinct
    * values — at 100 TB of near-unique doubles that map IS the data).
    * Rank-based plan with every group-/bin-bounded intermediate folded
    * on the DRIVER (the q14/ksTest offsets pattern):
    *  1. per-group (lo, hi, n) — one scan, collected (groups rows);
    *  2. per-(group, bin) counts — one scan of the persisted bin
    *     frame, collected (≤ groups × `bins` rows at ANY scale); the
    *     driver folds exclusive offsets and locates, for each target
    *     order statistic `p·(n−1)` (both bracketing positions), the
    *     bin that holds it and the in-bin rank it needs;
    *  3. ONLY the target bins' rows (≈ n/bins per hit, a literal-map
    *     filter — no join) rank in a tiny (group, bin) window; the
    *     bracketing values join one broadcast LocalRelation of target
    *     positions. Everything else never shuffles, and no
    *     group-/bin-bounded frame ever becomes a Spark-side join
    *     input.
    * Interpolation mirrors Spark's `Percentile.getPercentile`
    * arithmetic op-for-op — `(higher−index)·lo + (index−lower)·hi`
    * with `index = p·(n−1)` — so results are bit-identical to the
    * built-in (and to DuckDB's `quantile_cont`, which q53 pins equal
    * on this arithmetic).
    *
    * Rows with a null group are dropped (matching the built-in
    * aggregate's join-path behavior for this operator since round 7).
    * Group keys are matched through their canonical string form —
    * injective for the atomic types a partition dimension carries.
    *
    * Returns one row per group: `g` (original type preserved),
    * `p_<i>` value columns in `ps` order — collected into a
    * driver-held LocalRelation (one row per group is summary-sized by
    * contract), so the operator releases its own corpus-scale cache
    * and the result survives executor loss.
    */
  def groupedExactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                              ps: Seq[Double], bins: Int = 1024): DataFrame = {
    val (result, caches) = groupedExactPercentilesPlan(df, groupCol, valueCol, ps, bins)
    val out = Ckpt.toLocal(result)
    caches.foreach(_.unpersist(blocking = false))
    out
  }

  /** The lazy plan + its persisted intermediates (the driver-side
    * stats/offset folds run here), for plan-shape tests and callers
    * that want to manage cache lifetime themselves. */
  private[graft] def groupedExactPercentilesPlan(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], bins: Int = 1024): (DataFrame, Seq[DataFrame]) = {
    require(bins >= 1 && bins <= (1 << 17),
      s"bins=$bins out of [1, 131072]: the per-bin offset folds are " +
        "plan-embedded literal maps, linear in bins — beyond ~1e5 bins " +
        "the literal belongs in a broadcast join, and bin resolution " +
        "gains nothing (the refine pass is already exact)")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val spark = df.sparkSession
    val rows = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(groupCol).cast("string").as("_gk"),
        col(valueCol).cast("double").as("v"))
    // pass 1: per-group bounds and counts — groups rows, driver-folded
    val gstats = rows.groupBy(col("_gk"))
      .agg(min(col("v")).as("_lo"), max(col("v")).as("_hi"), count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val gIdx: Map[String, Int] = gstats.keys.toSeq.sorted.zipWithIndex.toMap
    val loM = gstats.map { case (k, (l, _, _)) => k -> l }
    val hiM = gstats.map { case (k, (_, h, _)) => k -> h }
    // binned feeds BOTH the bin-count pass and the target-bin rank
    // pass: unpersisted, each consumer replays the full source scan
    // (the round-7 bench's 10 s q147). Cached, the source is scanned
    // once for gstats and once here — the floor for range-binning
    // (bounds must exist before bins). MEMORY_AND_DISK: corpus-sized,
    // spills instead of evicting. Bounds ride as literal maps — no
    // broadcast join.
    val binned = rows
      .withColumn("_lo", element_at(typedLit(loM), col("_gk")))
      .withColumn("_hi", element_at(typedLit(hiM), col("_gk")))
      .withColumn("_bin",
        when(col("_hi") === col("_lo"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("v") - col("_lo")) / (col("_hi") - col("_lo")) * bins)
              .cast("int"))))
      .select(col("g"), col("_gk"), col("v"), col("_bin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 2: per-(group, bin) counts — ≤ groups × bins rows at ANY
    // scale, collected and folded on the driver (this action also
    // fills the binned cache for the final pass)
    val counts = binned.groupBy(col("_gk"), col("_bin"))
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // driver fold: exclusive bin offsets per group, then for each
    // target order statistic the (bin, in-bin rank) that holds it
    val offsets: Map[String, IndexedSeq[(Int, Long, Long)]] =
      counts.groupBy(_._1).map { case (gk, cs) =>
        var acc = 0L
        gk -> cs.sortBy(_._2).map { case (_, b, c) =>
          val o = acc; acc += c; (b, o, c)
        }.toIndexedSeq
      }
    val hitKeys = scala.collection.mutable.Set.empty[Long]    // gIdx·bins + bin
    val targetRows = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Int, Double)]
    for ((gk, (_, _, n)) <- gstats; (p, pi) <- ps.zipWithIndex) {
      val idx = p * (n - 1).toDouble
      val positions = Set(math.floor(idx).toLong, math.ceil(idx).toLong)
      for (pos <- positions) {
        val (b, off, _) = offsets(gk)
          .find(t => pos >= t._2 && pos < t._2 + t._3)
          .getOrElse(offsets(gk).last)
        hitKeys += gIdx(gk).toLong * bins + b
        targetRows += ((gk, b, pos - off, pi, idx))
      }
    }
    // in-bin rank over ONLY the hit bins (≈ n/bins rows per hit,
    // selected by a literal-map filter on the composite gIdx·bins+bin
    // key — collision-free because _bin < bins): the window partition
    // is (group, bin) — thousands of small partitions
    val hitM: Map[Long, Boolean] = hitKeys.iterator.map(_ -> true).toMap
    val wBin = Window.partitionBy(col("_gk"), col("_bin")).orderBy(col("v"))
    val ranked = binned
      .filter(element_at(typedLit(hitM),
        element_at(typedLit(gIdx), col("_gk")).cast("long") * bins + col("_bin"))
        .isNotNull)
      .withColumn("_rk", row_number().over(wBin).cast("long") - 1)
    // the target positions are a driver-built LocalRelation (groups ×
    // ps × ≤2 rows) broadcast against the ranked sliver
    import spark.implicits._
    val targets = targetRows.toSeq
      .toDF("_tgk", "_tbin", "_trk", "_pi", "_idx")
    val vals = ranked.join(broadcast(targets),
      col("_gk") === col("_tgk") && col("_bin") === col("_tbin") &&
        col("_rk") === col("_trk"))
      .select(col("g"), col("_pi"), col("_idx"), col("v"))
    // fold the ≤2 bracketing values into Spark's interpolation formula
    val interp = vals.groupBy(col("g"), col("_pi"), col("_idx"))
      .agg(min(col("v")).as("_vlo"), max(col("v")).as("_vhi"))
      .withColumn("_lower", floor(col("_idx")))
      .withColumn("_val",
        when(col("_vlo") === col("_vhi"), col("_vlo"))
          .otherwise((col("_lower") + 1 - col("_idx")) * col("_vlo") +
            (col("_idx") - col("_lower")) * col("_vhi")))
    val result = interp.groupBy(col("g"))
      .pivot("_pi", ps.indices.map(i => i: Any).toSeq)
      .agg(first(col("_val")))
      .select(col("g") +: ps.indices.map(i => col(i.toString).as(s"p_$i")): _*)
    (result, Seq(binned))
  }

  /** Per-group median and median absolute deviation (the robust
    * location/dispersion pair) in ONE pipeline over a single cached
    * binned frame — the fused alternative to calling
    * [[groupedExactPercentiles]] twice with a corpus join in between.
    *
    * Two-level statistics (a median OF deviations FROM a median) look
    * inherently two-pass over the source; they are not. The source is
    * scanned exactly twice (bounds, then bin+cache — the same floor as
    * [[groupedExactPercentiles]] alone): once the binned frame
    * `(g, v, bin)` is cached, BOTH medians resolve against it —
    *  1. the value median via bin-count prefix sums + target-bin rank
    *     (O(bins) shuffle state, rank windows only over hit bins);
    *  2. the deviation `|v − med_g|` is a map-only projection OVER THE
    *     CACHE (med_g rides as a driver literal map, no join against
    *     the corpus), re-binned into `[0, max(med−lo, hi−med)]` —
    *     bounds already known from pass 1's extrema, so the deviation
    *     stage needs NO discovery scan — and its median resolves by
    *     the same prefix-sum + hit-bin machinery.
    * All four post-cache passes read cache, not source; every
    * aggregate is ≤ groups × bins rows. Interpolation replicates
    * Spark/DuckDB `percentile`/`quantile_cont` IEEE-exactly (same
    * bracketing order statistics, same lerp), so `quantile_cont`
    * oracles apply unchanged to both output columns.
    *
    * Returns one row per group: `g` (string group key), `n`, `median`,
    * `mad` — summary-bounded, materialized as a LocalRelation so the
    * corpus-scale cache is released before return.
    */
  def groupedMedianAbsDeviation(df: DataFrame, groupCol: String,
                                valueCol: String, bins: Int = 1024): DataFrame = {
    require(bins >= 1 && bins <= (1 << 17),
      s"bins=$bins out of [1, 131072] (plan-embedded per-bin literal folds)")
    val spark = df.sparkSession
    val rows = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_gk"), col(valueCol).cast("double").as("v"))
    // pass 1 (source): per-group bounds + counts, driver-folded
    val gstats = rows.groupBy(col("_gk"))
      .agg(min(col("v")).as("_lo"), max(col("v")).as("_hi"), count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val gIdx: Map[String, Int] = gstats.keys.toSeq.sorted.zipWithIndex.toMap
    val nM = gstats.map { case (k, (_, _, n)) => k -> n }
    def binExpr(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0)).otherwise(least(lit(bins - 1),
        floor((v - lo) / (hi - lo) * bins).cast("int")))
    // pass 2 (source): bin + cache — the frame every later pass reads
    val binned = rows
      .withColumn("_bin", binExpr(col("v"),
        element_at(typedLit(gstats.map { case (k, (l, _, _)) => k -> l }), col("_gk")),
        element_at(typedLit(gstats.map { case (k, (_, h, _)) => k -> h }), col("_gk"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact interpolated p-quantile of (_gk, v, _bin) via the bin-
    // prefix-sum + hit-bin-rank machinery, folded to a driver map
    def quantileOf(frame: DataFrame, p: Double): Map[String, Double] = {
      val counts = frame.groupBy(col("_gk"), col("_bin"))
        .agg(count(lit(1)).as("_c"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      val offsets: Map[String, IndexedSeq[(Int, Long, Long)]] =
        counts.groupBy(_._1).map { case (gk, cs) =>
          var acc = 0L
          gk -> cs.sortBy(_._2).map { case (_, b, c) =>
            val o = acc; acc += c; (b, o, c)
          }.toIndexedSeq
        }
      val hitKeys = scala.collection.mutable.Set.empty[Long]
      val targetRows = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long)]
      for ((gk, n) <- nM) {
        val idx = p * (n - 1).toDouble
        for (pos <- Set(math.floor(idx).toLong, math.ceil(idx).toLong)) {
          val (b, off, _) = offsets(gk)
            .find(t => pos >= t._2 && pos < t._2 + t._3)
            .getOrElse(offsets(gk).last)
          hitKeys += gIdx(gk).toLong * bins + b
          targetRows += ((gk, b, pos - off))
        }
      }
      val hitM: Map[Long, Boolean] = hitKeys.iterator.map(_ -> true).toMap
      val wBin = Window.partitionBy(col("_gk"), col("_bin")).orderBy(col("v"))
      val ranked = frame
        .filter(element_at(typedLit(hitM),
          element_at(typedLit(gIdx), col("_gk")).cast("long") * bins + col("_bin"))
          .isNotNull)
        .withColumn("_rk", row_number().over(wBin).cast("long") - 1)
      import spark.implicits._
      val targets = targetRows.toSeq.toDF("_tgk", "_tbin", "_trk")
      val brackets = ranked.join(broadcast(targets),
          col("_gk") === col("_tgk") && col("_bin") === col("_tbin") &&
            col("_rk") === col("_trk"))
        .groupBy(col("_gk")).agg(min(col("v")).as("_vlo"), max(col("v")).as("_vhi"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      brackets.map { case (gk, (vlo, vhi)) =>
        val idx = p * (nM(gk) - 1).toDouble
        val lower = math.floor(idx)
        gk -> (if (vlo == vhi) vlo else (lower + 1 - idx) * vlo + (idx - lower) * vhi)
      }
    }
    val medM = quantileOf(binned, 0.5)
    // deviation stage: map-only projection over the CACHE. Bounds come
    // free from pass 1: 0 ≤ |v − med| ≤ max(med − lo, hi − med); loose
    // at the low end costs only bin utilization, never exactness (the
    // rank pass refines inside whatever bin the target lands in).
    val devHi = gstats.map { case (k, (l, h, _)) =>
      k -> math.max(medM(k) - l, h - medM(k)) }
    val dev = binned.select(col("_gk"),
        abs(col("v") - element_at(typedLit(medM), col("_gk"))).as("v"))
      .withColumn("_bin", binExpr(col("v"), lit(0.0),
        element_at(typedLit(devHi), col("_gk"))))
    val madM = quantileOf(dev, 0.5)
    binned.unpersist(blocking = false)
    import spark.implicits._
    gstats.keys.toSeq.sorted
      .map(gk => (gk, nM(gk), medM(gk), madM(gk)))
      .toDF("g", "n", "median", "mad")
  }

  /** Wald sequential probability ratio test (SPRT) per experiment key:
    * the classic always-valid A/B stop rule. Events walk in
    * (`tsCol`, `tieCol`) order; each success adds `c1Micro` =
    * round(ln(p1/p0)·10⁶) to the log-likelihood ratio, each failure
    * `c0Micro` = round(ln((1−p1)/(1−p0))·10⁶); the FIRST row where the
    * running LLR reaches `aMicro` (≥ ⇒ accept H1) or `bMicro`
    * (≤ ⇒ accept H0) decides the key. Keys whose walk never crosses
    * report `continue` with their final state.
    *
    * The four micro-nat constants are caller-supplied INTEGER literals
    * (compute them once, offline), so the whole walk is exact integer
    * arithmetic — cross-engine identical by construction, no
    * transcendental evaluated in either engine at query time.
    *
    * Scale shape: ONE shuffle on the key; the running sum and row
    * counter share the key-partitioned window's exchange and sort, the
    * first crossing is a `min_by` aggregation on the same partitioning,
    * and per-key output is one row. No global window, no join back —
    * finals and crossings fold in a single grouped aggregation.
    */
  def sprt(df: DataFrame, keyCol: Column, tsCol: String, tieCol: String,
           successCol: Column, c1Micro: Long, c0Micro: Long,
           aMicro: Long, bMicro: Long): DataFrame = {
    require(aMicro > 0 && bMicro < 0, "boundaries must bracket zero")
    val w = Window.partitionBy(col("_k")).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = df
      .select(keyCol.as("_k"), col(tsCol), col(tieCol),
        when(successCol, lit(c1Micro)).otherwise(lit(c0Micro)).as("_step"))
      .withColumn("_llr", sum(col("_step")).over(w))
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_dec",
        when(col("_llr") >= aMicro, lit("accept_h1"))
          .when(col("_llr") <= bMicro, lit("accept_h0")))
    walked.groupBy(col("_k").as("key"))
      .agg(count(lit(1)).as("n_seen"),
        min(when(col("_dec").isNotNull, col("_n"))).as("n_at_decision"),
        min_by(col("_dec"), when(col("_dec").isNotNull, col("_n"))).as("_d"),
        min_by(col("_llr"), when(col("_dec").isNotNull, col("_n"))).as("_l"),
        max_by(col("_llr"), col("_n")).as("_lf"))
      .select(col("key"), col("n_seen"),
        coalesce(col("_d"), lit("continue")).as("decision"),
        col("n_at_decision"),
        coalesce(col("_l"), col("_lf")).as("llr_micro"))
  }

  /** Per-key time-weighted average of a step function: each observation
    * holds its value until the next one; the last observation carries no
    * weight. `twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first)`, keys with a
    * single observation are dropped (zero span).
    *
    * ONE shuffle on the key — the lead() window and the final aggregation
    * share the exchange. Integer grading: values snap to cents (one
    * IEEE multiply + half-up round), durations to whole milliseconds
    * (integer division of exact epoch-μs), so the weighted sum is a long
    * — order-free — and the single closing division is engine-stable.
    * Long headroom: cents·ms ≤ 2^63 needs value·span < ~9e13 unit-years
    * per ROW and the per-key sum bounded likewise — monitoring-scale
    * series by contract (document per-key spans when applying to
    * decade-long event histories).
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_us"), col(tieCol))
    df.filter(col(valCol).isNotNull)
      .select(col(keyCol), col(tieCol), col(valCol),
        unix_micros(col(tsCol)).as("_us"))
      .withColumn("_cents", round(col(valCol) * 100).cast("long"))
      .withColumn("_lead", lead(col("_us"), 1).over(w))
      .withColumn("_durms", expr("(_lead - _us) div 1000"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("_cents") * col("_durms")).as("_num"),
        sum(col("_durms")).as("_den"))
      .filter(col("_den") > 0)
      .select(col(keyCol), col("n_obs"),
        round(col("_num").cast("double") / (col("_den").cast("double") * 100.0), 6)
          .as("twa"))
  }

  /** χ² feature scoring of token presence against a binary document
    * label (the classic supervised feature-selection step before
    * training a fastText-style quality/domain classifier). For each
    * token with document frequency ≥ `minDf`, the 2×2 contingency table
    * (token present × label) yields
    * `χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`.
    *
    * Scale shape: per-doc DISTINCT tokens come from the in-row
    * `termCounts` kernel (token multiplicity never crosses the wire);
    * ONE shuffle on the token aggregates (df, df∧label); N and N_label
    * ride as a 1-row broadcast. Top-k is TakeOrderedAndProject — no
    * global sort. Pure rational arithmetic — no transcendentals —
    * evaluated over exact-integer-valued doubles in the SAME expression
    * tree both engines codegen, so scores are bit-identical; counts
    * here are ≤ doc count, far inside double's 2^53 integer range.
    */
  def chi2Features(df: DataFrame, textCol: String, labelCol: Column,
                   minDf: Int, topK: Int): DataFrame = {
    val docs = df.select(labelCol.cast("long").as("_y"),
      map_keys(graft.plans.Exprs.termCounts(col(textCol))).as("_toks"))
    val totals = docs.agg(count(lit(1)).as("_n"), sum(col("_y")).as("_npos"))
    val tok = docs.select(col("_y"), explode(col("_toks")).as("_t"))
      .groupBy(col("_t"))
      .agg(count(lit(1)).as("_df"), sum(col("_y")).as("_dfpos"))
      .filter(col("_df") >= minDf)
    val a = col("_dfpos").cast("double")            // token ∧ label
    val b = (col("_df") - col("_dfpos")).cast("double")
    val c = (col("_npos") - col("_dfpos")).cast("double")
    val dd = (col("_n") - col("_df") - col("_npos") + col("_dfpos")).cast("double")
    val n = col("_n").cast("double")
    val chi2 = n * (a * dd - b * c) * (a * dd - b * c) /
      ((a + b) * (c + dd) * (a + c) * (b + dd))
    tok.crossJoin(broadcast(totals))
      // a token present in EVERY document zeroes the (c+d) margin —
      // no discriminative signal and a 0/0; drop it (oracle mirrors)
      .filter(col("_df") < col("_n"))
      .select(col("_t").as("token"), col("_df").as("df"),
        col("_dfpos").as("df_pos"), round(chi2, 6).as("chi2"))
      .orderBy(col("chi2").desc, col("token"))
      .limit(topK)
  }
}
