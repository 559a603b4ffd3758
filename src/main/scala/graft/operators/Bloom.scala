package graft.operators

import graft.plans.{Exprs, Kernels}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter membership pruning — the standard 100-TB semi-join
  * shortcut: build a compact bit array over the SMALL side's content
  * hashes, ship it to every task as a plan literal, and pre-filter the
  * corpus with an O(1) per-row probe before (or instead of) any
  * shuffle. Use cases: benchmark decontamination at ingest, blocklist
  * scrubs, incremental-dedup pre-passes.
  *
  * The filter is deterministic — k probe positions per value from the
  * splitmix64 mixer over the base-31 content fingerprint — so a second
  * engine can reconstruct the EXACT bit set and reproduce every
  * membership flag including the false positives (q81's oracle does).
  * False-negative-freedom is structural (every inserted value's bits
  * are set); the false-positive rate is the classic
  * (1 − e^(−k·n/m))^k — size `mBits` to the small side's cardinality.
  */
object Bloom {

  /** `words` is the packed bit array (mBits/64 longs). */
  case class BloomBuf(words: Array[Long])

  private[operators] def setBits(words: Array[Long], h: Long,
                                 mBits: Int, k: Int): Unit = {
    var i = 0
    while (i < k) {
      val p = java.lang.Long.remainderUnsigned(Kernels.mix64(h + i), mBits.toLong)
      words((p >>> 6).toInt) |= 1L << (p & 63).toInt
      i += 1
    }
  }

  /** Mergeable bit-OR aggregator over 64-bit content fingerprints.
    * State is mBits/64 longs regardless of input size; merge is a word
    * OR, so partial aggregation combines map-side like any algebraic
    * aggregate.
    */
  class BloomAgg(mBits: Int, k: Int) extends Aggregator[Long, BloomBuf, Array[Long]] {
    require(mBits >= 64 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(k >= 1 && k <= 16)
    def zero: BloomBuf = BloomBuf(new Array[Long](mBits / 64))
    def reduce(b: BloomBuf, h: Long): BloomBuf = { setBits(b.words, h, mBits, k); b }
    def merge(x: BloomBuf, y: BloomBuf): BloomBuf = {
      var i = 0
      while (i < x.words.length) { x.words(i) |= y.words(i); i += 1 }
      x
    }
    def finish(b: BloomBuf): Array[Long] = b.words
    def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the bit array over `probeSet`'s `textCol` fingerprints.
    * One aggregation to a single mBits/64-long row; the driver collect
    * is the point — the array becomes a plan literal (like the IVF
    * centroids), NOT a join side.
    */
  def build(probeSet: DataFrame, textCol: String, mBits: Int, k: Int): Array[Long] = {
    val agg = udaf(new BloomAgg(mBits, k), Encoders.scalaLong)
    probeSet.select(Exprs.fingerprint64(col(textCol)).as("_h"))
      .agg(agg(col("_h")).as("_bloom"))
      .head().getAs[scala.collection.Seq[Long]]("_bloom").toArray
  }

  /** Flag each corpus row's `textCol` membership against a pre-built
    * filter: (idCol, flagged). The probe is a codegen expression over
    * the broadcast-style reference array — no shuffle, no join; the
    * corpus is scanned once and the scan's pushed filters survive.
    */
  def membershipFlags(corpus: DataFrame, bits: Array[Long], mBits: Int, k: Int,
                      textCol: String, idCol: String): DataFrame =
    corpus.select(col(idCol),
      Exprs.bloomContains(Exprs.fingerprint64(col(textCol)), bits, mBits, k)
        .as("flagged"))
}
