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
}
