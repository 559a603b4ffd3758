package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: project each key's irregular observations
  * onto a regular time grid, carrying the last observation forward —
  * the standard densification step before windowed feature extraction
  * or training on fixed-rate sequences.
  *
  * Composition, not a new engine primitive: per-key bounds (one
  * aggregation) → `sequence(lo, hi, step)` explode builds the grid
  * (spans÷step rows per key, no cross-join) → [[AsofJoin.asofBackward]]
  * fills values (one linear shuffle of grid + observations). Everything
  * shuffles on the key, so a 100 TB series set scales with keys ×
  * grid density.
  *
  * `df` must be unique per (keys, tsCol) — pre-aggregate duplicates
  * (e.g. `avg` per timestamp) or the carried value among exact ties is
  * partition-order-defined (see [[AsofJoin.asofBackward]]'s
  * tiebreaker).
  */
object Resample {

  /** `snapOriginTo` (a `date_trunc` unit, e.g. "hour") floors each
    * key's grid origin so grid points sit on calendar boundaries
    * instead of inheriting the first observation's sub-second offset —
    * the usual resampling convention, and immune to reader-dependent
    * microsecond rounding of the source timestamps. A grid point
    * before the first observation carries null.
    */
  def forwardFill(df: DataFrame, keys: Seq[String], tsCol: String,
                  valCols: Seq[String], step: String = "INTERVAL 1 HOUR",
                  snapOriginTo: Option[String] = None): DataFrame = {
    val keyCols = keys.map(col)
    val lo = snapOriginTo.map(u => date_trunc(u, min(col(tsCol))))
      .getOrElse(min(col(tsCol)))
    val bounds = df.groupBy(keyCols: _*)
      .agg(lo.as("_lo"), max(col(tsCol)).as("_hi"))
    val grid = bounds.select(keyCols :+
      explode(sequence(col("_lo"), col("_hi"), expr(step))).as("_grid_ts"): _*)
    AsofJoin.asofBackward(
        grid, df.select((keys :+ tsCol).map(col) ++ valCols.map(col): _*),
        keys, "_grid_ts", tsCol, valCols)
      .withColumnRenamed("_grid_ts", "grid_ts")
  }

  /** [[forwardFill]]'s gap-emit formulation — value-identical output,
    * different plan shape: instead of materializing the grid and
    * as-of-joining it back (the union window sorts grid + observations
    * = OUTPUT-sized rows through one WindowExec), ONE window pass over
    * the OBSERVATIONS computes each event's per-key bounds and
    * successor (`lead`), and every event then EMITS the grid indices
    * it covers — `[ceil((ts−lo)/step), ceil((next−lo)/step))`, with
    * the first event also emitting the leading null-carry range — as a
    * map-side explode. The key-partitioned sort runs over |events|
    * rows instead of |events| + |grid|; the grid rows are born
    * downstream of the window with their carried value already
    * attached, so nothing output-sized is ever sorted.
    *
    * Grid semantics are identical to [[forwardFill]] (same origin
    * snap, same inclusive-carry tie handling: a grid point equal to
    * the next observation's timestamp belongs to that next
    * observation). The step is expressed in SECONDS (default 3600 =
    * the hourly grid); origins snapped with `snapOriginTo` have
    * integral seconds, and grid points are derived in exact
    * microsecond arithmetic, so the emitted timestamps are
    * bit-identical to `sequence(lo, hi, step)`'s.
    *
    * Same uniqueness contract as [[forwardFill]]: `df` unique per
    * (keys, tsCol).
    */
  def forwardFillGaps(df: DataFrame, keys: Seq[String], tsCol: String,
                      valCols: Seq[String], stepSeconds: Long = 3600L,
                      snapOriginTo: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val keyCols = keys.map(col)
    val wKey = Window.partitionBy(keyCols: _*)
    val wOrd = wKey.orderBy(col("_ts"))
    val stepUs = stepSeconds * 1000000L
    val loTs = snapOriginTo.map(u => date_trunc(u, min(col("_ts")).over(wKey)))
      .getOrElse(min(col("_ts")).over(wKey))
    val pay = struct(valCols.map(col): _*)
    val payType = df.select(pay.as("_pay")).schema("_pay").dataType
    val nullPay = lit(null).cast(payType)
    val elemT = ArrayType(StructType(Seq(
      StructField("_k", LongType), StructField("_p", payType))))
    val emptyArr = array().cast(elemT)
    val augmented = df.select((keyCols :+ col(tsCol).as("_ts") :+ pay.as("_pay")): _*)
      .withColumn("_lo", unix_micros(loTs))
      .withColumn("_tsUs", unix_micros(col("_ts")))
      .withColumn("_maxUs", unix_micros(max(col("_ts")).over(wKey)))
      .withColumn("_nextUs", unix_micros(lead(col("_ts"), 1).over(wOrd)))
      .withColumn("_rn", row_number().over(wOrd))
    // grid indices: this event carries every k in [startK, endK];
    // startK = ceil((ts − lo)/step), endK = the index strictly before
    // the successor's first index (a grid point ON the successor
    // belongs to the successor — forwardFill's inclusive-carry tie),
    // or the key's last index when there is no successor. Pure long
    // arithmetic — `div` is exact where a correctly-rounded double
    // quotient could land ON an integer for deltas near 2^53 µs and
    // shift the floor by one (deltas are non-negative, so
    // ceil = (delta + step − 1) div step needs no negative handling).
    val withK = augmented
      .withColumn("_hiK", expr(s"(_maxUs - _lo) div $stepUs"))
      .withColumn("_startK", expr(s"(_tsUs - _lo + ${stepUs - 1}) div $stepUs"))
      .withColumn("_endK",
        when(col("_nextUs").isNull, col("_hiK"))
          .otherwise(expr(s"(_nextUs - _lo + ${stepUs - 1}) div $stepUs") - 1))
    val emitted = withK.select(
      keyCols ++ Seq(col("_lo"),
        explode(concat(
          // the leading null-carry range [0, startK) exists only on
          // the first event and only when the snapped origin precedes
          // the first observation's grid index
          when(col("_rn") === 1 && col("_startK") > 0,
            transform(sequence(lit(0L), col("_startK") - 1),
              k => struct(k.as("_k"), nullPay.as("_p"))))
            .otherwise(emptyArr),
          when(col("_startK") <= col("_endK"),
            transform(sequence(col("_startK"), col("_endK")),
              k => struct(k.as("_k"), col("_pay").as("_p"))))
            .otherwise(emptyArr))).as("_e")): _*)
    emitted.select(
      keyCols ++ Seq(
        timestamp_micros(col("_lo") + col("_e._k") * stepUs).as("grid_ts")) ++
        valCols.map(c => col(s"_e._p.$c").as(c)): _*)
  }
}
