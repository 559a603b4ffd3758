package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {

  private def versions(rows: (Int, String, java.lang.Double, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "eff_s", "bal", "seg")
      .withColumn("eff", to_date(col("eff_s"))).drop("eff_s")
  }

  test("collapseHistory: no-op updates collapse, intervals chain, nulls are null-safe") {
    val df = versions(
      // key 1: A, A (no-op), B → two intervals
      (1, "2020-01-01", 10.0, "A"),
      (1, "2021-01-01", 10.0, "A"),
      (1, "2022-01-01", 20.0, "B"),
      // key 2: single version → one open interval
      (2, "2020-06-01", 5.0, "X"),
      // key 3: null attr twice (collapse) then a value
      (3, "2020-01-01", null, "Z"),
      (3, "2021-01-01", null, "Z"),
      (3, "2022-01-01", 7.0, "Z"))
    val got = Scd.collapseHistory(df, Seq("k"), "eff", Seq("bal", "seg"))
      .select(col("k"), col("bal"), col("seg"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2),
        r.getString(3), Option(r.getString(4)), r.getBoolean(5))).toSet
    assert(got === Set(
      (1, Some(10.0), "A", "2020-01-01", Some("2022-01-01"), false),
      (1, Some(20.0), "B", "2022-01-01", None, true),
      (2, Some(5.0), "X", "2020-06-01", None, true),
      (3, None, "Z", "2020-01-01", Some("2022-01-01"), false),
      (3, Some(7.0), "Z", "2022-01-01", None, true)))
  }

  test("collapseHistory: both windows share ONE hash exchange on the key") {
    val df = versions((1, "2020-01-01", 1.0, "A"), (1, "2021-01-01", 2.0, "B"))
    val p = Scd.collapseHistory(df, Seq("k"), "eff", Seq("bal", "seg"))
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(k#") && !l.contains("Reused"))
    assert(exchanges === 1, s"expected one key exchange:\n$p")
  }
}
