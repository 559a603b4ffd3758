package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("profile: one long-format row per column with null accounting") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(10L)), (Some(3.0), None), (None, Some(30L)))
      .toDF("a", "b")
    val p = Profile.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(p("a") === ((2L, 1L, 1.0, 3.0, 2.0)))
    assert(p("b") === ((2L, 1L, 10.0, 30.0, 20.0)))
  }

  test("profile runs as a single scan (one aggregate, no join/union in the plan)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toDouble, i * 2.0)).toDF("x", "y")
    val plan = Profile.profile(df, Seq("x", "y")).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "must not scan once per column")
    assert(!plan.contains("Join"))
  }

  test("vocabGrowth: exact curve on a corpus with known per-prefix novelty") {
    import spark.implicits._
    // ids 0..9; doc i introduces exactly one new term w{i} plus the
    // shared term "base" — so the prefix ending at id b has seen
    // 1 + (b+1) distinct terms
    val docs = (0 until 10).map(i => (i.toLong, s"base w$i"))
    val got = Profile.vocabGrowth(docs.toDF("doc_id", "text"),
        "doc_id", "text", points = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // grid over the id range [0, 9]: b1 = 3, b2 = 6, b3 = 9
    assert(got(1L) === ((3L, 5L)))   // docs 0..3 → base + w0..w3
    assert(got(2L) === ((6L, 8L)))
    assert(got(3L) === ((9L, 11L)))
    // saturated corpus: curve goes flat
    val sat = (0 until 9).map(i => (i.toLong, "same words every time"))
    val flat = Profile.vocabGrowth(sat.toDF("doc_id", "text"),
        "doc_id", "text", points = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(flat === Map(1L -> 4L, 2L -> 4L, 3L -> 4L))
  }

  test("vocabGrowth: empty input keeps the (k, b, n_terms) schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Profile.vocabGrowth(empty, "doc_id", "text", points = 3)
    assert(got.columns.toSeq === Seq("k", "b", "n_terms"))
    assert(got.count() === 0L)
  }

  test("vocabGrowth: extreme id range does not overflow the grid arithmetic") {
    import spark.implicits._
    // (mx - mn) * k overflows Long for this range; BigInt grid keeps
    // the boundaries exact and monotone
    val docs = Seq((0L, "alpha"), (Long.MaxValue - 1, "alpha beta"))
    val got = Profile.vocabGrowth(docs.toDF("doc_id", "text"),
        "doc_id", "text", points = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val range = BigInt(Long.MaxValue - 1)
    (1 to 4).foreach { k =>
      val b = (range * k / 4).toLong
      assert(got(k.toLong)._1 === b, s"boundary k=$k")
    }
    // only the last prefix contains doc 2's novel term
    assert(got(4L)._2 === 2L && got(1L)._2 === 1L)
  }
}
