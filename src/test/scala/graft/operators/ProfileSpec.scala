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
}
