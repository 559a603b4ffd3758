package graft.operators

import graft.SparkSpec
import graft.plans.Kernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Brute-force equality pin for [[Dsir.importanceWeights]]: the spec
  * refits the bucket multinomials and rescores each doc in plain Scala
  * (same kernel, same HALF_UP micro-nat grading) and demands exact
  * equality — including the no-token edge (0 grams, weight 0) and
  * null-target coalescing.
  */
class DsirSpec extends SparkSpec {

  private val buckets = 64
  private val k = 2
  private val alpha = 0.5

  // deterministic mini-corpus: varied lengths incl. empty and
  // whitespace-only texts; every third doc is "target"
  private val docs: Seq[(Long, String, java.lang.Boolean)] = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0L until 60L).map { i =>
      val n = (i % 7 + 1).toInt
      val text = (0 until n)
        .map(j => words(((i * 13 + j * 7) % words.size).toInt)).mkString(" ")
      (i, text, java.lang.Boolean.valueOf(i % 3 == 0))
    } ++ Seq((60L, "", java.lang.Boolean.FALSE),
      (61L, "   ", java.lang.Boolean.TRUE),
      (62L, "alpha", null)) // null target must coalesce to raw side
  }

  private def bucketsOf(text: String): Seq[Long] = {
    val arr = Kernels.shingleHashesPos(UTF8String.fromString(text), k)
    (0 until arr.numElements()).map(i => arr.getLong(i) & (buckets - 1).toLong)
  }

  test("importanceWeights equals the brute-force fit + score exactly") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text", "is_target")
    val got = Dsir.importanceWeights(df, "doc_id", "text", col("is_target"),
        buckets = buckets, shingleK = k, alpha = alpha)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val counts = scala.collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    docs.foreach { case (_, text, t) =>
      val isT = t != null && t.booleanValue()
      bucketsOf(text).foreach { b =>
        val (tc, rc) = counts(b)
        counts(b) = if (isT) (tc + 1, rc) else (tc, rc + 1)
      }
    }
    val totalT = counts.valuesIterator.map(_._1).sum
    val totalR = counts.valuesIterator.map(_._2).sum
    val denT = totalT + alpha * buckets
    val denR = totalR + alpha * buckets
    val w = (0 until buckets).map { b =>
      val (tc, rc) = counts(b.toLong)
      val dl = math.log((tc + alpha) / denT) - math.log((rc + alpha) / denR)
      b.toLong -> BigDecimal(dl * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap

    assert(got.size === docs.size)
    docs.foreach { case (id, text, _) =>
      val bs = bucketsOf(text)
      val (ng, lw) = got(id)
      assert(ng === bs.size.toLong, s"doc $id n_grams")
      assert(lw === bs.map(w).sum.toDouble / 1e6, s"doc $id logw")
    }
    // the corpus must actually exercise both signs of the weight map
    assert(got.valuesIterator.exists(_._2 > 0) && got.valuesIterator.exists(_._2 < 0))
  }

  test("score pass is a map-only projection (fit folded to a literal map)") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text", "is_target")
    val plan = Dsir.importanceWeights(df, "doc_id", "text", col("is_target"),
        buckets = buckets, shingleK = k, alpha = alpha)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scoring must not shuffle")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
  }

  test("buckets must be a power of two") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text", "is_target")
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(df, "doc_id", "text", col("is_target"), buckets = 100)
    }
  }

  test("buckets above 65536 are rejected, not folded into a multi-MB literal plan") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text", "is_target")
    val e = intercept[IllegalArgumentException] {
      Dsir.importanceWeights(df, "doc_id", "text", col("is_target"), buckets = 1 << 20)
    }
    assert(e.getMessage.contains("broadcast join"),
      s"the rejection must name the alternative design: ${e.getMessage}")
    // the boundary itself is legal
    Dsir.importanceWeights(df, "doc_id", "text", col("is_target"), buckets = 1 << 16)
      .collect()
  }
}
