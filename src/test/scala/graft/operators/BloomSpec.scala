package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom membership pruning: structural false-negative-freedom, sane
  * false-positive behavior, layout-invariant build.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"document number $i with body $i")).toDF("id", "text")

  test("no false negatives: every inserted text is flagged") {
    val probe = docs(200)
    val bits = Bloom.build(probe, "text", mBits = 1024, k = 3)
    val flags = Bloom.membershipFlags(probe, bits, 1024, 3, "text", "id")
    assert(flags.filter(!col("flagged")).count() === 0L,
      "a member must always probe true")
  }

  test("false-positive rate is near the (1-e^{-kn/m})^k prediction") {
    val bits = Bloom.build(docs(200), "text", mBits = 4096, k = 3)
    val outside = (10000 until 20000)
      .map(i => (i.toLong, s"other text $i")).toDF("id", "text")
    val fp = Bloom.membershipFlags(outside, bits, 4096, 3, "text", "id")
      .filter(col("flagged")).count()
    // k=3, n=200, m=4096 → p ≈ (1-e^-0.146)^3 ≈ 0.25%; allow 4x slack
    assert(fp < 100, s"$fp of 10000 flagged — far above the predicted FP rate")
  }

  test("build is partition-layout invariant (bit-OR merge)") {
    val a = Bloom.build(docs(500).repartition(2), "text", 512, 3)
    val b = Bloom.build(docs(500).repartition(16).sort(col("id").desc), "text", 512, 3)
    assert(a.toSeq === b.toSeq, "bit array is a set union — layout must not matter")
  }

  test("probe plan is scan+project only — no join, no exchange") {
    val bits = Bloom.build(docs(10), "text", 256, 3)
    val plan = Bloom.membershipFlags(docs(1000), bits, 256, 3, "text", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"probe must not join:\n$plan")
  }
}
