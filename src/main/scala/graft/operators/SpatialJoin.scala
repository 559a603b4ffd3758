package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed planar radius join via grid-cell binning — the
  * shuffle-native form of a spatial index, and the scale path for the
  * reference's geospatial side (site-proximity / within-distance
  * queries over lat/lon point sets).
  */
object SpatialJoin {

  /** All (left, right) pairs with euclidean distance ≤ `radius`.
    *
    * Cell width = `radius`, so a match's cell indices differ by at
    * most 1 per axis: the LEFT side is keyed by its own cell (each
    * candidate pair materializes at exactly ONE key — no dedup pass),
    * the RIGHT side replicates to its 3×3 neighborhood. One shuffle on
    * the cell key; no all-pairs stage anywhere. Replication is a
    * constant 9× of the (usually smaller) right side — pass the
    * smaller/query side on the right. Skew = densest cell; shrink it
    * by passing a pre-filtered right side or binning a hotter column.
    *
    * Columns must be disjoint across the two inputs; the output keeps
    * them all and appends `dist`.
    */
  def radiusJoin(left: DataFrame, lxCol: String, lyCol: String,
                 right: DataFrame, rxCol: String, ryCol: String,
                 radius: Double): DataFrame = {
    require(radius > 0, s"radius $radius must be positive")
    def cell(c: org.apache.spark.sql.Column) = floor(c / lit(radius)).cast("long")
    val l = left
      .withColumn("_cx", cell(col(lxCol)))
      .withColumn("_cy", cell(col(lyCol)))
    val r = right
      .withColumn("_dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_cx", cell(col(rxCol)) + col("_dx"))
      .withColumn("_cy", cell(col(ryCol)) + col("_dy"))
      .drop("_dx", "_dy")
    val d2 = (col(lxCol) - col(rxCol)) * (col(lxCol) - col(rxCol)) +
      (col(lyCol) - col(ryCol)) * (col(lyCol) - col(ryCol))
    l.join(r, Seq("_cx", "_cy"))
      .filter(d2 <= lit(radius * radius))
      .withColumn("dist", sqrt(d2))
      .drop("_cx", "_cy")
  }
}
