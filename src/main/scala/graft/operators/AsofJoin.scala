package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row, the latest right row
  * whose timestamp is ≤ the left row's, per partition key. Spark has no
  * native as-of join; the scalable formulation here is the union trick:
  *
  *  1. tag right rows 0 and left rows 1, union them;
  *  2. ONE shuffle on the partition key, sort by (ts, tag) within
  *     partitions — a right row at the same timestamp sorts before the
  *     left row, making the match inclusive;
  *  3. running `last(right_payload, ignoreNulls)` over the ordered
  *     window carries the most recent right payload forward;
  *  4. keep the left rows.
  *
  * Cost: one shuffle of |left| + |right| rows, no range explosion, no
  * per-key collect — the shape that survives a 100-TB time-series join
  * (a sort-merge-join on (key, range) would need an interval product;
  * this is linear). Skewed keys can be pre-salted with [[SkewJoin]]
  * only if the window becomes a straggler — the state per key is one
  * payload struct, so skew pressure is sort-only.
  */
object AsofJoin {

  /** `rightPayload` columns are carried onto each left row (null when no
    * right row precedes it). Right payload column names must not
    * collide with left columns.
    *
    * Determinism: when several right rows share one (key, timestamp),
    * `rightTieBreaker` picks the carried row — the one with the MAX
    * tiebreaker value (e.g. a sequence number → "latest write wins").
    * Without it the choice among exact ties is partition-order-defined
    * and may vary run-to-run; pass a tiebreaker or guarantee unique
    * (key, ts) on the right side.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   partitionKeys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String],
                   rightTieBreaker: Option[String] = None): DataFrame =
    asofImpl(left, right, partitionKeys, leftTs, rightTs, rightPayload,
      rightTieBreaker, forward = false)

  /** As-of FORWARD join — for every left row, the EARLIEST right row
    * whose timestamp is ≥ the left row's (the "next event after" form:
    * next click after a view, next quote after an order). Same
    * union-and-running-carry shape as [[asofBackward]] with the sort
    * direction reversed; identical one-shuffle linear cost.
    */
  def asofForward(left: DataFrame, right: DataFrame,
                  partitionKeys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String],
                  rightTieBreaker: Option[String] = None): DataFrame =
    asofImpl(left, right, partitionKeys, leftTs, rightTs, rightPayload,
      rightTieBreaker, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       partitionKeys: Seq[String],
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String],
                       rightTieBreaker: Option[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.intersect(leftCols).isEmpty,
      s"right payload ${rightPayload.mkString(",")} collides with left columns")
    val pay = struct(rightPayload.map(col): _*)
    val tie = rightTieBreaker.map(col).getOrElse(lit(0L))
    val taggedRight = right.select(
      partitionKeys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"), tie.as("_tie"),
          pay.as("_pay")): _*)
    val taggedLeft = left.select(
      partitionKeys.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
          lit(null).cast(taggedRight.schema("_tie").dataType).as("_tie"),
          lit(null).cast(taggedRight.schema("_pay").dataType).as("_pay"),
          struct(leftCols.map(col): _*).as("_lrow")): _*)
    val unioned = taggedRight
      .withColumn("_lrow", lit(null).cast(taggedLeft.schema("_lrow").dataType))
      .unionByName(taggedLeft)
    // ties within same (_ts, _tag=0) resolve by _tie ascending, so the
    // running `last` carries the max-tiebreaker right row; _tie is null
    // on left rows and never reorders across tags (tag dominates).
    // Forward mode reverses only the timestamp direction: scanning
    // descending ts, the running carry holds the nearest FOLLOWING
    // right row, and tag 0 < 1 keeps the same-timestamp match inclusive.
    val tsOrder = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(tsOrder, col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    matched.select(
      leftCols.map(c => col("_lrow").getField(c).as(c)) ++
        rightPayload.map(c => col("_match").getField(c).as(c)): _*)
  }
}
