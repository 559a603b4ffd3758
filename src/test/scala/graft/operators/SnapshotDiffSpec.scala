package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  test("snapshotDiff: added/removed/changed/unchanged with null-safe compares") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, Some(10.0), "A"),   // unchanged
      (2L, Some(20.0), "B"),   // changed value
      (3L, Some(30.0), "C"),   // removed
      (4L, None: Option[Double], "D"), // null -> value (changed)
      (5L, None: Option[Double], "E")  // null -> null (unchanged)
    ).toDF("k", "bal", "seg")
    val newDf = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(25.0), "B"),
      (4L, Some(4.0), "D"),
      (5L, None: Option[Double], "E"),
      (6L, Some(60.0), "F")    // added
    ).toDF("k", "bal", "seg")
    val got = Relational.snapshotDiff(oldDf, newDf, Seq("k"), Seq("bal", "seg"))
      .select(col("k"), col("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "unchanged", 6L -> "added"))
  }

  test("snapshotDiff carries both versions' columns for changed rows") {
    import spark.implicits._
    val oldDf = Seq((2L, 20.0, "B")).toDF("k", "bal", "seg")
    val newDf = Seq((2L, 25.0, "B")).toDF("k", "bal", "seg")
    val r = Relational.snapshotDiff(oldDf, newDf, Seq("k"), Seq("bal", "seg")).head()
    assert(r.getAs[Double]("old_bal") === 20.0)
    assert(r.getAs[Double]("new_bal") === 25.0)
    assert(r.getAs[String]("status") === "changed")
  }
}
