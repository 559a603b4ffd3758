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

  /** Scale-safe global sequence: ONE range exchange + in-partition sort,
    * then `monotonically_increasing_id` decomposes into (partition id,
    * in-partition position) with zero additional shuffle — no
    * single-partition window, and no second hash exchange like a
    * `Window.partitionBy(spark_partition_id())` would plan. Per-partition
    * offsets come from a partition-count aggregation (32–200 rows at any
    * scale) broadcast back onto the sorted frame. Ids are 1-based and
    * dense, matching `row_number`.
    *
    * The sorted+numbered frame feeds both the offsets aggregation and
    * the final join, so it is persisted — without the cache Spark
    * re-runs the range exchange + sort for each consumer (the round-2
    * q14 regression). The cache entry lives until the session's cache
    * manager drops it: long-lived drivers calling this repeatedly
    * should `result.unpersist()` (cascades to this intermediate) or
    * `spark.catalog.clearCache()` once the result is consumed.
    */
  def globalRowNumberScalable(df: DataFrame, outCol: String, orderCols: Column*): DataFrame = {
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    // monotonically_increasing_id = partitionId << 33 | row-in-partition,
    // evaluated in the sort's own stage: row order IS sort order
    val withPid = sorted.withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33))
      .withColumn("_prn", col("_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("_mid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts are ≤ #partitions rows at ANY data scale —
    // collect them and fold the running offsets on the driver (the same
    // structure RDD.zipWithIndex uses), so the big frame needs no join,
    // no window, no broadcast: just a literal-map lookup in a project
    val counts = withPid.groupBy(col("_pid")).agg(count(lit(1)).as("_psz"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Long, Long] =
      counts.scanLeft((-1L, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
        .sliding(2).collect { case Array((_, off), (pid, _)) => pid -> off }.toMap
    withPid
      .withColumn(outCol,
        (coalesce(element_at(typedLit(offsets), col("_pid")), lit(0L)) +
          col("_prn")).cast("long"))
      .drop("_pid", "_prn")
  }

  /** Snapshot diff (the data-engineering CDC primitive): classify every
    * key across two table versions as `added` / `removed` / `changed` /
    * `unchanged`, carrying both versions' compared columns (prefixed
    * `old_`/`new_`). One full-outer join on the key — co-partitionable,
    * no driver state; change detection is null-safe `<=>` per column.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keyCols ++ valCols).map(col): _*)
      .select(keyCols.map(col) ++ valCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select((keyCols ++ valCols).map(col): _*)
      .select(keyCols.map(col) ++ valCols.map(c => col(c).as(s"new_$c")): _*)
    // full-outer on keys: coalesce lives in a marker column, not the
    // key, so "which side exists" stays unambiguous for nullable keys
    val joined = o.withColumn("_in_old", lit(true))
      .join(n.withColumn("_in_new", lit(true)), keyCols, "full_outer")
    val changed = valCols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.withColumn("status",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .drop("_in_old", "_in_new")
  }
}
