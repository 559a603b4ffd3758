package graft.operators

import graft.SparkSpec
import graft.plans.{Exprs, Kernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unit oracles for the distributed GD trainer (q178): the feature
  * kernel against a sequential reimplementation, the trainer against a
  * sequential single-threaded trainer (same rounding discipline), and
  * end-to-end separation on a separable fixture.
  */
class TrainerSpec extends SparkSpec {

  private def seqBuckets(text: String, m: Int): Seq[Int] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).toSeq
    def h(term: String): Int = {
      val p = term.foldLeft(1125899906842597L)((a, c) => 31L * a + c)
      java.lang.Long.remainderUnsigned(Kernels.mix64(p), m).toInt
    }
    toks.map(h) ++ toks.sliding(2).filter(_.length == 2)
      .map(p => h(p(0) + " " + p(1)))
  }

  test("termBuckets kernel equals the sequential unigram-then-bigram enumeration") {
    val m = 64
    for (t <- Seq("the quick brown fox", "  one  ", "", "a b", "Mixed CASE text")) {
      val got = Kernels.termBuckets(UTF8String.fromString(t), m)
        .toIntArray().toSeq
      assert(got === seqBuckets(t, m), s"text: '$t'")
    }
  }

  test("weights trained on termBuckets reproduce linearTextScore's z exactly") {
    val m = 32
    val w = Array.tabulate(m)(b => math.sin(b.toDouble))  // arbitrary
    val t = "alpha beta gamma delta epsilon beta"
    val bl = Kernels.termBuckets(UTF8String.fromString(t), m).toIntArray()
    val z = bl.foldLeft(0.0)((a, b) => a + w(b)) / bl.length
    val p = 0.5 + 0.5 * (z / (1.0 + math.abs(z)))
    assert(Kernels.linearTextScore(UTF8String.fromString(t), w) === p)
  }

  private def seqTrain(docs: Seq[(String, Double)], m: Int, iters: Int,
                       lr: Double): Array[Double] = {
    val feats = docs.map { case (t, y) => (seqBuckets(t, m), y) }
      .filter(_._1.nonEmpty)
    val n = feats.size.toDouble
    var w = new Array[Double](m)
    for (_ <- 0 until iters) {
      val g = new Array[Double](m)
      feats.foreach { case (bl, y) =>
        val cnt = bl.length.toDouble
        val z = bl.foldLeft(0.0)((a, b) => a + w(b)) / cnt
        val p = 0.5 + 0.5 * (z / (1.0 + math.abs(z)))
        val gd = (((p - y) * 0.5) / ((1.0 + math.abs(z)) * (1.0 + math.abs(z)))) / cnt
        bl.foreach(b => g(b) += gd)
      }
      w = Array.tabulate(m) { b =>
        if (g(b) == 0.0) w(b)
        else BigDecimal(w(b) - lr * g(b) / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w
  }

  test("distributed trainer matches a sequential trainer to the 6-dp rounding grid") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val va = Vector("aa", "bb", "cc", "dd", "ee")
    val vb = Vector("xx", "yy", "zz", "ww", "vv")
    val docs = (0 until 60).map { i =>
      val v = if (i % 2 == 0) va else vb
      (Seq.fill(12)(v(rnd.nextInt(v.size))).mkString(" "),
        if (i % 2 == 0) 1.0 else 0.0)
    }
    val (m, iters, lr) = (64, 5, 8.0)
    val expected = seqTrain(docs, m, iters, lr)
    val got = Trainer.trainHashedLinear(docs.toDF("text", "y"), "text", "y",
      m = m, iters = iters, lr = lr)
    // cross-document float sums are order-unspecified on the Spark
    // side; the per-iteration 6-dp rounding bounds any divergence to
    // one grid step per weight
    got.zip(expected).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) <= 1.000001e-6, s"bucket $i: $a vs $b")
    }
  }

  test("trainAndScore separates a separable fixture (perfect ranking)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val va = Vector("aa", "bb", "cc", "dd", "ee")
    val vb = Vector("xx", "yy", "zz", "ww", "vv")
    val docs = (0 until 80).map { i =>
      val v = if (i % 2 == 0) va else vb
      (i.toLong, Seq.fill(15)(v(rnd.nextInt(v.size))).mkString(" "),
        if (i % 2 == 0) 1.0 else 0.0)
    }
    val out = Trainer.trainAndScore(docs.toDF("doc_id", "text", "y"),
        "text", "y", keepCols = Seq("doc_id"), m = 64, iters = 8, lr = 16.0)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val pos = out.filter(_._1 == 1.0).map(_._2)
    val neg = out.filter(_._1 == 0.0).map(_._2)
    assert(pos.min > neg.max,
      s"separable classes must rank perfectly: pos.min=${pos.min} neg.max=${neg.max}")
  }

  test("trainer rejects out-of-bound bucket counts (in-plan literal guard)") {
    import spark.implicits._
    val df = Seq(("a b c", 1.0)).toDF("text", "y")
    val e = intercept[IllegalArgumentException] {
      Trainer.trainHashedLinear(df, "text", "y", m = 65536)
    }
    assert(e.getMessage.contains("4096"))
  }
}
