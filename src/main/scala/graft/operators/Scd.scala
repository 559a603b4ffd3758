package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the warehouse-side
  * housekeeping every long-lived analytics deployment grows: turning a
  * stream of versioned snapshots into a Type-2 history (one row per
  * key per distinct attribute state, with a validity interval).
  */
object Scd {

  /** Collapse versioned snapshots into SCD Type-2 history rows.
    *
    * Input: one row per (key, version) carrying the attribute state at
    * `orderCol` (an effective date/timestamp). Consecutive versions
    * whose `attrCols` are unchanged are collapsed into the earlier
    * row (no-op updates don't open a new interval — the detail naive
    * lead/lag treatments get wrong); each surviving state gets
    * `valid_from` = its effective date, `valid_to` = the next CHANGED
    * state's date (null = still current), `is_current`.
    *
    * Scale shape: both windows partition on the key, so Catalyst plans
    * ONE hash exchange and sorts once — per-key state is the handful
    * of versions, never corpus-sized. Null-safe change detection via
    * `<=>` so nullable attributes collapse correctly.
    */
  def collapseHistory(versions: DataFrame, keyCols: Seq[String],
                      orderCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val lagged = attrCols.foldLeft(versions) { (d, a) =>
      d.withColumn(s"_lag_$a", lag(col(a), 1).over(w))
    }.withColumn("_rn", row_number().over(w))
    val changed = attrCols.map(a => !(col(a) <=> col(s"_lag_$a"))).reduce(_ || _)
    val kept = lagged.filter(col("_rn") === 1 || changed)
      .drop(attrCols.map(a => s"_lag_$a") :+ "_rn": _*)
    kept
      .withColumnRenamed(orderCol, "valid_from")
      .withColumn("valid_to",
        lead(col("valid_from"), 1)
          .over(Window.partitionBy(keyCols.map(col): _*).orderBy(col("valid_from"))))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
