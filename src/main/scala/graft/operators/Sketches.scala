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

  case class KmvBuf(mins: Seq[Long])

  class KmvDistinct(k: Int) extends Aggregator[Long, KmvBuf, Double] {
    require(k >= 8, "k < 8 gives useless error bounds")
    private def insert(mins: Seq[Long], h: Long): Seq[Long] = {
      // mins kept sorted ascending, unique, ≤ k entries
      if (mins.length == k && h >= mins.last) mins
      else if (mins.contains(h)) mins
      else {
        val i = mins.indexWhere(_ > h)
        val inserted = if (i < 0) mins :+ h else (mins.take(i) :+ h) ++ mins.drop(i)
        inserted.take(k)
      }
    }
    def zero: KmvBuf = KmvBuf(Vector.empty)
    def reduce(b: KmvBuf, a: Long): KmvBuf = KmvBuf(insert(b.mins, a))
    def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
      KmvBuf(y.mins.foldLeft(x.mins)(insert))
    def finish(b: KmvBuf): Double = {
      val n = b.mins.length
      if (n < k) n.toDouble // fewer than k distinct → exact
      else {
        // map the k-th min from [Long.Min, Long.Max] onto (0, 1)
        val kth = (b.mins.last.toDouble - Long.MinValue.toDouble) /
          (Long.MaxValue.toDouble - Long.MinValue.toDouble)
        (k - 1) / kth
      }
    }
    def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: KMV distinct estimate of `c` (hashed with xxhash64). */
  def kmvDistinct(c: Column, k: Int = 256): Column = {
    val agg = udaf(new KmvDistinct(k), Encoders.scalaLong)
    agg(xxhash64(c))
  }
}
