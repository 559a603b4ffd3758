package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built fixtures: inclusive backward
  * match, per-key isolation, nulls before any right row.
  */
class AsofJoinSpec extends SparkSpec {

  test("asofBackward: latest right row at or before each left timestamp") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 15L, "l15"), (1L, 5L, "l5"),
      (2L, 10L, "l2_10")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 12L, "r12"), (2L, 11L, "r11")).toDF("k", "rts", "rv")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "rts", Seq("rv"))
      .collect().map(r => (r.getAs[String]("lv"), Option(r.getAs[String]("rv")).orNull)).toMap
    assert(out("l5") === "r5")    // inclusive: rts == ts matches
    assert(out("l10") === "r5")   // r12 is in the future
    assert(out("l15") === "r12")
    assert(out("l2_10") === null) // key 2's only right row is later
  }

  test("asofBackward tiebreaker: max-tiebreaker right row wins exact (key, ts) ties") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l")).toDF("k", "ts", "lv")
    // three right rows at the SAME (key, ts): seq 3 must be carried
    val right = Seq(
      (1L, 10L, 1L, "first"), (1L, 10L, 3L, "latest"), (1L, 10L, 2L, "middle"))
      .toDF("k", "rts", "seq", "rv")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "rts",
      Seq("rv"), rightTieBreaker = Some("seq"))
    assert(out.select(col("rv")).head().getString(0) === "latest")
    // and the choice is stable across partitionings
    val out2 = AsofJoin.asofBackward(left, right.repartition(7), Seq("k"), "ts", "rts",
      Seq("rv"), rightTieBreaker = Some("seq"))
    assert(out2.select(col("rv")).head().getString(0) === "latest")
  }

  test("asofForward: earliest right row at or after each left timestamp") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 15L, "l15"), (1L, 5L, "l5"),
      (2L, 12L, "l2_12")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 12L, "r12"), (2L, 11L, "r11")).toDF("k", "rts", "rv")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "ts", "rts", Seq("rv"))
      .collect().map(r => (r.getAs[String]("lv"), Option(r.getAs[String]("rv")).orNull)).toMap
    assert(out("l5") === "r5")     // inclusive: rts == ts matches
    assert(out("l10") === "r12")   // r5 is in the past
    assert(out("l15") === null)    // nothing follows
    assert(out("l2_12") === null)  // key 2's only right row is earlier
  }

  test("asofForward tiebreaker: max-tiebreaker right row wins exact (key, ts) ties") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 10L, 1L, "first"), (1L, 10L, 3L, "latest"), (1L, 10L, 2L, "middle"))
      .toDF("k", "rts", "seq", "rv")
    val out = AsofJoin.asofForward(left, right.repartition(5), Seq("k"), "ts", "rts",
      Seq("rv"), rightTieBreaker = Some("seq"))
    assert(out.select(col("rv")).head().getString(0) === "latest")
  }

  test("asofBackward carries multiple payload columns and preserves left schema") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 8L, 99L, 0.5)).toDF("k", "rts", "rid", "rval")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "rts", Seq("rid", "rval"))
    assert(out.columns.toSeq === Seq("k", "ts", "rid", "rval"))
    val r = out.head()
    assert(r.getLong(2) === 99L && r.getDouble(3) === 0.5)
  }
}
