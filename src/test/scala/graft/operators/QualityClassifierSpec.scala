package graft.operators

import graft.SparkSpec
import graft.plans.Kernels
import org.apache.spark.sql.functions._

/** Hashed linear classifier: kernel vs an independent Scala brute
  * force (different tokenizer code path), bounds, and edge cases.
  */
class QualityClassifierSpec extends SparkSpec {

  /** Independent re-derivation: regex split (vs the kernel's offset
    * scan), explicit per-term polynomial, same weight family.
    */
  private def bruteScore(text: String, weights: Array[Double]): Double = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def hash(t: String): Long = {
      var h = 1125899906842597L
      t.foreach(c => h = 31L * h + c)
      Kernels.mix64(h)
    }
    val terms = toks.map(t => hash(t)) ++
      toks.sliding(2).filter(_.length == 2).map(p => hash(p.mkString(" ")))
    if (terms.isEmpty) 0.5
    else {
      var z = 0.0
      terms.foreach(h => z += weights(java.lang.Long.remainderUnsigned(h, weights.length).toInt))
      val zn = z / terms.length
      0.5 + 0.5 * (zn / (1.0 + math.abs(zn)))
    }
  }

  private val w = QualityClassifier.pseudoWeights(4096)

  test("kernel score equals the independent brute force") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "single",
      "  leading and   irregular   whitespace  ",
      "a b a b a b a b",
      "Mixed CASE Tokens mixed case tokens",
      "punctuation, tokens! and? weird--ones")
    val got = texts.toDF("text")
      .select(QualityClassifier.scoreCol(col("text"), w).as("s"))
      .collect().map(_.getDouble(0))
    texts.zip(got).foreach { case (t, s) =>
      assert(math.abs(s - bruteScore(t, w)) < 1e-15, s"text '$t'")
    }
  }

  test("scores are in (0, 1); empty text scores the 0.5 midpoint") {
    import spark.implicits._
    val texts = (0 until 200).map(i =>
      (0 to i % 7).map(j => s"w${Kernels.mix64(i.toLong * 7 + j) % 50}").mkString(" "))
    val got = (texts :+ "" :+ "   ").toDF("text")
      .select(QualityClassifier.scoreCol(col("text"), w).as("s"))
      .collect().map(_.getDouble(0))
    got.foreach(s => assert(s > 0.0 && s < 1.0))
    assert(got.takeRight(2).forall(_ === 0.5))
  }

  test("pseudo-weight family is uniform-ish in [-1, 1)") {
    val ws = QualityClassifier.pseudoWeights(65536)
    assert(ws.forall(x => x >= -1.0 && x < 1.0))
    val mean = ws.sum / ws.length
    assert(math.abs(mean) < 0.02, s"mean $mean")
  }
}
