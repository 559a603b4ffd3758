package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for training-data release: quantify how
  * identifying the quasi-identifier (QI) combinations in a table are
  * before it ships to an external training run.
  *
  * The reference pipeline redacts point PII (see the q78 regex gates);
  * this operator covers the complementary AGGREGATE re-identification
  * risk: a row whose QI combination is shared by fewer than k rows is
  * re-identifiable by linkage even with direct identifiers removed
  * (Sweeney's k-anonymity), and a group whose sensitive attribute
  * takes fewer than l distinct values leaks the attribute even when
  * k holds (Machanavajjhala's l-diversity).
  */
object Privacy {

  /** Per-QI-group audit: for every combination of `qiCols`, the group
    * size `n`, the number of distinct `sensitive` values
    * `n_sensitive`, and the k-anonymity / l-diversity verdicts as
    * 0/1 flags (`k_ok` = n ≥ k, `l_ok` = distinct ≥ l). Rows in
    * groups with `k_ok = 0` need generalization or suppression before
    * release; `l_ok = 0` groups leak the sensitive attribute by
    * homogeneity.
    *
    * Scale shape: ONE hash aggregation on the QI key with map-side
    * partial combine; the distinct-count is Spark's standard two-phase
    * partial-distinct expansion (state per group bounded by the
    * sensitive domain, not the row count). Output cardinality is the
    * QI-combination domain — key-space-bounded, never row-scale. No
    * windows, no joins, no driver state.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[Column], sensitive: Column,
                      k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"k/l must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("n_sensitive"))
      .withColumn("k_ok", (col("n") >= k).cast("long"))
      .withColumn("l_ok", (col("n_sensitive") >= l).cast("long"))
  }
}
