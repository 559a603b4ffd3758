package graft.operators

import graft.plans.{Exprs, Kernels}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Apply-a-pretrained-linear-classifier at scan speed — the
  * fastText-shaped quality gate every curation pipeline ends with
  * (e.g. a wiki-vs-crawl logistic model deciding what enters the
  * training mix).
  *
  * Features are the hashing trick over unigrams + bigrams of the
  * corpus tokenizer (lowercase whitespace, the [[graft.plans.Kernels]]
  * poly31+mix64 family); the bucketed weight vector is injectable —
  * train anywhere, ship the `Array[Double]` — and rides into codegen
  * as a reference object, so scoring 100 TB is one scan with zero
  * shuffle and no UDF fence. The squash is the rational sigmoid
  * 0.5 + 0.5·z/(1+|z|) (exact IEEE, engine-portable) rather than
  * exp-based logistic.
  *
  * [[pseudoWeights]] is the deterministic stand-in family used by the
  * tests and the cross-engine oracle: weight(b) is a mix64-derived
  * uniform in [-1, 1), so an independent engine can re-derive every
  * score bit-for-bit without shipping the array.
  */
object QualityClassifier {

  /** w(b) = ((mix64(b + salt) >>> 11) / 2^53) · 2 − 1 ∈ [-1, 1). */
  def pseudoWeights(m: Int, salt: Long = 1000003L): Array[Double] = {
    val out = new Array[Double](m)
    var b = 0
    while (b < m) {
      out(b) = ((Kernels.mix64(b + salt) >>> 11).toDouble / 9007199254740992.0) * 2.0 - 1.0
      b += 1
    }
    out
  }

  def scoreCol(text: Column, weights: Array[Double]): Column =
    Exprs.linearTextScore(text, weights)

  /** `(…, score)` — one narrow projection over the corpus. */
  def score(df: DataFrame, textCol: String, weights: Array[Double]): DataFrame =
    df.withColumn("score", scoreCol(col(textCol), weights))
}
