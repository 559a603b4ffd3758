package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count sketching: the KMV (k-minimum-values) estimator as a
  * typed Aggregator. State is the k smallest 64-bit hashes seen; the
  * estimate is (k−1) / normalized k-th minimum — standard error
  * ≈ 1/√(k−2). Fully deterministic (hash-based, no RNG), mergeable
  * (union of mins is the mins of the union), so partial aggregation
  * works map-side like any algebraic aggregate and the shuffle carries
  * ≤ k longs per group.
  *
  * `approx_count_distinct` (HLL) is the built-in alternative; KMV's
  * draw is the mergeable exact-under-k behavior (≤ k distinct values →
  * exact count) and a state that doubles as a uniform sample of the
  * value hashes.
  */
object Sketches {

  /** Mutable sketch state: `mins` is a capacity-`k` primitive array
    * whose first `n` slots hold the distinct minima, sorted ascending.
    * A case class so `Encoders.product` serializes it at shuffle
    * boundaries; between rows the aggregation operator keeps the
    * object form, so `reduce`/`merge` mutate the array in place —
    * the per-row hot path is one O(1) rejection compare (full buffer,
    * hash above the k-th min) or an O(log k) membership probe, never
    * an immutable-Seq rebuild.
    */
  case class KmvBuf(mins: Array[Long], var n: Int) {
    /** In-place insert preserving (sorted, distinct, ≤ k) — returns this. */
    def insert(h: Long): KmvBuf = {
      val k = mins.length
      if (n == k && h >= mins(k - 1)) return this // common case: reject
      val i = java.util.Arrays.binarySearch(mins, 0, n, h)
      if (i >= 0) return this // already present
      val pos = -i - 1
      val shift = math.min(n, k - 1) - pos // drop the last slot when full
      if (shift > 0) System.arraycopy(mins, pos, mins, pos + 1, shift)
      mins(pos) = h
      if (n < k) n += 1
      this
    }
  }

  class KmvDistinct(k: Int) extends Aggregator[Long, KmvBuf, Double] {
    require(k >= 8, "k < 8 gives useless error bounds")
    def zero: KmvBuf = KmvBuf(new Array[Long](k), 0)
    def reduce(b: KmvBuf, a: Long): KmvBuf = b.insert(a)
    def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      var i = 0
      // y.mins ascending: once an element rejects on the full-buffer
      // fast path, every later one does too
      while (i < y.n && !(x.n == k && y.mins(i) >= x.mins(k - 1))) {
        x.insert(y.mins(i))
        i += 1
      }
      x
    }
    def finish(b: KmvBuf): Double = {
      if (b.n < k) b.n.toDouble // fewer than k distinct → exact
      else {
        // map the k-th min from [Long.Min, Long.Max] onto (0, 1)
        val kth = (b.mins(k - 1).toDouble - Long.MinValue.toDouble) /
          (Long.MaxValue.toDouble - Long.MinValue.toDouble)
        (k - 1) / kth
      }
    }
    def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: KMV distinct estimate of an integral column, hashed
    * with the engine's canonical splitmix64 mixer. Because the hash is
    * plain wraparound arithmetic (not an engine-internal like
    * xxhash64), the whole estimate is reproducible in a second engine —
    * q62's DuckDB oracle recomputes the k-minimum set and the estimate
    * from scratch. For non-integral inputs pre-hash yourself:
    * `kmvDistinctHashed(xxhash64(c), k)` (rows-only checkable).
    */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    kmvDistinctHashed(graft.plans.Exprs.mix64(c.cast("long")), k)

  /** KMV over an already-hashed 64-bit column. */
  def kmvDistinctHashed(hashed: Column, k: Int = 256): Column = {
    val agg = udaf(new KmvDistinct(k), Encoders.scalaLong)
    agg(hashed)
  }

  /** Misra–Gries heavy-hitters buffer: at most `capacity` (term,
    * counter) entries. Guarantee: for every term,
    * trueCount − n/capacity ≤ estimate ≤ trueCount, and any term with
    * frequency > n/capacity is present — so with capacity above the
    * distinct-term count the counters are exactly the frequencies.
    */
  case class MgBuf(counts: Map[String, Long])

  /** Mergeable Misra–Gries aggregator. `reduce` is O(1) on hits and
    * O(capacity) on misses with a full buffer (the decrement sweep);
    * `merge` sums both maps then trims to capacity by subtracting the
    * (capacity+1)-th largest counter — the standard mergeable-MG rule,
    * which preserves the n/capacity error bound. State is ≤ capacity
    * entries regardless of input size, so the shuffle carries a bounded
    * map per group — never the term universe.
    */
  class MisraGries(capacity: Int) extends Aggregator[String, MgBuf, Map[String, Long]] {
    require(capacity >= 1)
    def zero: MgBuf = MgBuf(Map.empty)
    // per-row updates use the immutable HAMT: `updated` is O(log32 cap)
    // with structural sharing — NOT the O(capacity) full-copy-per-row
    // pattern the KMV sketch had to engineer away (its sorted primitive
    // array made every insert a memmove; a persistent map shares all
    // untouched branches). The O(capacity) paths below (decrement
    // sweep, merge trim) run per miss-with-full-buffer / per merge,
    // not per row.
    def reduce(b: MgBuf, t: String): MgBuf = {
      val m = b.counts
      m.get(t) match {
        case Some(c) => MgBuf(m.updated(t, c + 1))
        case None if m.size < capacity => MgBuf(m.updated(t, 1L))
        case None =>
          // decrement sweep: every counter −1, drop zeros (the new
          // term's implicit +1 and −1 cancel)
          MgBuf(m.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None })
      }
    }
    def merge(x: MgBuf, y: MgBuf): MgBuf = {
      val summed = y.counts.foldLeft(x.counts) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (summed.size <= capacity) MgBuf(summed)
      else {
        val cut = summed.values.toArray.sortBy(-_).apply(capacity)
        MgBuf(summed.flatMap { case (k, c) =>
          if (c > cut) Some(k -> (c - cut)) else None
        })
      }
    }
    def finish(b: MgBuf): Map[String, Long] = b.counts
    def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Mutable count-min state: row-major `d × w` counter matrix. Same
    * case-class-over-primitive-array pattern as [[KmvBuf]]: product
    * encoder at shuffle boundaries, in-place mutation between rows.
    */
  case class CmsBuf(counts: Array[Long])

  /** Count-min sketch over pre-hashed 64-bit keys: `d` rows of `w`
    * counters; row `r` buckets a key at `mix64(keyHash + r) mod w`.
    * Point estimate = min over rows — an upper bound on the true
    * count that overshoots only when a key collides in ALL `d` rows
    * (error ≤ 2n/w with prob ≥ 1 − (1/2)^d for w = 2e/ε). Fully
    * deterministic (the [[graft.plans.Kernels.mix64]] family, no RNG)
    * and mergeable by counter addition, so partial aggregation
    * combines map-side and the shuffle carries d·w longs per group —
    * the frequency-table complement to [[MisraGries]] (which keeps
    * top keys, not point-queryable counts).
    */
  class CountMin(d: Int, w: Int) extends Aggregator[Long, CmsBuf, Array[Long]] {
    require(d >= 1 && w >= 2)
    def zero: CmsBuf = CmsBuf(new Array[Long](d * w))
    def reduce(b: CmsBuf, keyHash: Long): CmsBuf = {
      var r = 0
      while (r < d) {
        val c = java.lang.Long.remainderUnsigned(
          graft.plans.Kernels.mix64(keyHash + r), w.toLong).toInt
        b.counts(r * w + c) += 1
        r += 1
      }
      b
    }
    def merge(x: CmsBuf, y: CmsBuf): CmsBuf = {
      var i = 0
      while (i < x.counts.length) { x.counts(i) += y.counts(i); i += 1 }
      x
    }
    def finish(b: CmsBuf): Array[Long] = b.counts
    def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The count-min point estimate for `keyHash` given the flattened
    * `d × w` counter array — min over the same cells [[CountMin]]
    * incremented. Usable driver-side or as a Column over the collected
    * sketch literal.
    */
  def cmsEstimate(counts: Array[Long], keyHash: Long, d: Int, w: Int): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = java.lang.Long.remainderUnsigned(
        graft.plans.Kernels.mix64(keyHash + r), w.toLong).toInt
      est = math.min(est, counts(r * w + c))
      r += 1
    }
    est
  }

  /** Point-query a count-min sketch of `keyCol` for every distinct key
    * in `probes`: the sketch aggregates distributed (one d·w array
    * total), the bounded probe set estimates against the collected
    * sketch and returns (key, est_count). The big side is ONE
    * aggregation pass; probes never join against it.
    */
  def cmsPointEstimates(df: org.apache.spark.sql.DataFrame, keyCol: Column,
                        probes: Seq[Long], d: Int = 4, w: Int = 1024)
      : org.apache.spark.sql.DataFrame = {
    import df.sparkSession.implicits._
    val agg = udaf(new CountMin(d, w), Encoders.scalaLong)
    val counts = df.select(graft.plans.Exprs.mix64(keyCol.cast("long")).as("h"))
      .agg(agg(col("h")).as("cms"))
      .collect()(0).getSeq[Long](0).toArray
    probes.map(k => (k, cmsEstimate(counts, graft.plans.Kernels.mix64(k), d, w)))
      .toDF("probe_key", "est_count")
  }

  /** Self-join size (second frequency moment F₂ = Σ_k c(k)²) estimated
    * from a count-min sketch: `min over rows r of Σ_c counts[r][c]²` —
    * the classic sketch inner product, an upper bound that overshoots
    * by the cross-terms colliding in every row. The query optimizer's
    * join-cardinality guard: one aggregation pass over the input, d·w
    * longs to the driver, no join executed.
    */
  def cmsSelfJoinSize(df: org.apache.spark.sql.DataFrame, keyCol: Column,
                      d: Int = 4, w: Int = 2048): Long = {
    val agg = udaf(new CountMin(d, w), Encoders.scalaLong)
    val counts = df.select(graft.plans.Exprs.mix64(keyCol.cast("long")).as("h"))
      .agg(agg(col("h")).as("cms"))
      .collect()(0).getSeq[Long](0)
    (0 until d).map { r =>
      var s = 0L
      var c = 0
      while (c < w) { val v = counts(r * w + c); s += v * v; c += 1 }
      s
    }.min
  }

  /** Corpus-wide approximate top-`topN` heavy hitters of a string
    * column. One pass, bounded state (`capacity` counters per
    * partition-local buffer); with capacity above the distinct count
    * the result is exact — the configuration an oracle can check.
    */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, termCol: String,
                   capacity: Int, topN: Int): org.apache.spark.sql.DataFrame = {
    val agg = udaf(new MisraGries(capacity), Encoders.STRING)
    // post-agg there is ONE row holding a ≤ capacity map, so ranking is
    // an array_sort over its entries — no window, no extra shuffle
    val ranked = array_sort(map_entries(col("_m")), (a, b) =>
      when(a.getField("value") > b.getField("value"), -1)
        .when(a.getField("value") < b.getField("value"), 1)
        .when(a.getField("key") < b.getField("key"), -1)
        .when(a.getField("key") > b.getField("key"), 1)
        .otherwise(0))
    df.agg(agg(col(termCol)).as("_m"))
      .select(posexplode(slice(ranked, 1, topN)))
      .select(col("col.key").as("term"), col("col.value").as("est_count"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
