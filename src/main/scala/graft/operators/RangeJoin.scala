package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each point row with every
  * interval row of the same key whose `[start, end]` contains the
  * point. Spark plans a bare `p BETWEEN s AND e` predicate as a
  * key-equi join with a residual filter — one reducer per key value
  * scans ALL intervals of that key (quadratic per key). The bucketized
  * formulation bounds the work:
  *
  *  1. intervals explode to the buckets they cover
  *     (`floor(start/w) .. floor(end/w)`);
  *  2. points map to their single bucket;
  *  3. equi-join on (key, bucket) — candidates are co-bucketed only —
  *     then the exact containment filter.
  *
  * Each (point, interval) match is produced exactly once (in the
  * point's bucket), so no dedup pass is needed. `bucketWidth` trades
  * explode factor (interval span / width) against candidate precision;
  * set it near the median interval length.
  */
object RangeJoin {

  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], pointCol: String,
                        startCol: String, endCol: String,
                        bucketWidth: Double,
                        joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0)
    val pb = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val joinCond = (keys.map(k => pb(k) === ib(k)) :+
      (pb("_bucket") === ib("_bucket")) :+
      (pb(pointCol) >= ib(startCol)) :+
      (pb(pointCol) <= ib(endCol))).reduce(_ && _)
    val joined = pb.join(ib, joinCond, joinType)
      .drop(pb("_bucket")).drop(ib("_bucket"))
    keys.foldLeft(joined)((df, k) => df.drop(ib(k)))
  }
}
