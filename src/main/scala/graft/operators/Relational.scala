package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators the reference composes out of dplyr verbs, here
  * as reusable DataFrame transforms. All are shuffle-aware: each states
  * its partitioning (the `Window.partitionBy` key IS the shuffle key, so
  * chains over the same key reuse one exchange).
  */
object Relational {

  /** R `make.unique(x, sep="_")` (notebooks/index.Rmd:392-393): within
    * duplicate groups of `keyCol`, the first row (by `orderCol`) keeps the
    * key, later rows get `_1`, `_2`, … suffixes.
    *
    * One shuffle on `keyCol`. The reference additionally avoids collisions
    * with pre-existing `x_1`-style names; that case never occurs in its
    * data (asserted in tests) and is intentionally not reproduced.
    */
  def makeUnique(df: DataFrame, keyCol: String, orderCol: String,
                 outCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn(outCol,
        when(col("_rn") === 1, col(keyCol))
          .otherwise(concat(col(keyCol), lit("_"), col("_rn") - 1)))
      .drop("_rn")
  }

  /** Duplicate report (notebooks/index.Rmd:381-387): all rows whose
    * `keyCol` occurs more than once, R's
    * `duplicated(x) | duplicated(x, fromLast=TRUE)`. One shuffle on
    * `keyCol`; the count is window-computed so the row payload survives.
    */
  def duplicateReport(df: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    df.withColumn("_cnt", count(lit(1)).over(w))
      .filter(col("_cnt") > 1)
      .drop("_cnt")
  }

  /** Deterministic `distinct(key, .keep_all = TRUE)`
    * (notebooks/index.Rmd:670): keeps the first row per key by
    * `orderCol` — unlike `dropDuplicates`, which keeps an arbitrary row
    * and is not stable across partitionings.
    */
  def distinctByKey(df: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Ordinal-min over a fixed ladder (notebooks/index.Rmd:297-312):
    * aggregating expression returning the ladder element with the lowest
    * position present in the group. Use inside `.agg(...)`:
    * `ordinalMin(col("temporal_resolution"), frequencies)`.
    *
    * `array_position` returns 0 (not null) for off-ladder values, so the
    * 0 sentinel is nulled out before the min — off-ladder and null
    * values are then genuinely ignored (matching R's factor → NA and
    * DuckDB's list_position → NULL); an all-off-ladder group yields null.
    */
  def ordinalMin(c: Column, ladder: Seq[String]): Column = {
    val arr = typedLit(ladder)
    val pos = array_position(arr, c)
    element_at(arr,
      min(when(pos === 0, lit(null)).otherwise(pos)).cast("int"))
  }

  /** Global row_number in a pinned order (notebooks/index.Rmd:347).
    * A single-partition window — acceptable only because the reference
    * numbers a driver-scale table (627 rows); for big data prefer
    * `zipWithIndex`-style or partition-offset numbering
    * (see [[globalRowNumberScalable]]).
    */
  def globalRowNumber(df: DataFrame, outCol: String, orderCols: Column*): DataFrame =
    df.withColumn(outCol, row_number().over(Window.orderBy(orderCols: _*)))

  /** Scale-safe global sequence: sort once, then compute per-partition
    * offsets from partition sizes (two narrow passes, no single-partition
    * window). Ordering ties broken by full sort columns; ids are
    * 1-based and dense, matching `row_number`.
    *
    * The range-sorted frame feeds both the offsets aggregation and the
    * final join, so it is persisted — without the cache Spark re-runs the
    * full range-exchange + sort for each consumer, doubling the most
    * expensive stage (the round-2 q14 regression).
    */
  def globalRowNumberScalable(df: DataFrame, outCol: String, orderCols: Column*): DataFrame = {
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val withPid = sorted.withColumn("_pid", spark_partition_id())
      .withColumn("_prn", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(orderCols: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = withPid.groupBy(col("_pid")).agg(count(lit(1)).as("_psz"))
      .withColumn("_off",
        coalesce(sum(col("_psz")).over(
          Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_off"))
    withPid.join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol, (col("_off") + col("_prn")).cast("long"))
      .drop("_pid", "_prn", "_off")
  }
}
