package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, bounded error above it,
  * merge-order invariance.
  */
class SketchesSpec extends SparkSpec {

  test("exact when distinct count <= k") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 100).toLong).toDF("v")
    val est = df.agg(Sketches.kmvDistinct(col("v"), k = 256)).head().getDouble(0)
    assert(est === 100.0)
  }

  test("within 10% of exact for 50k distinct values at k=256") {
    import spark.implicits._
    val df = (0 until 50000).map(_.toLong).toDF("v").repartition(8)
    val est = df.agg(Sketches.kmvDistinct(col("v"), k = 256)).head().getDouble(0)
    assert(math.abs(est - 50000) / 50000 < 0.10, s"estimate $est")
  }

  test("merge-order invariant: partition layout does not change the estimate") {
    import spark.implicits._
    val vals = (0 until 20000).map(_.toLong)
    val a = vals.toDF("v").repartition(2)
      .agg(Sketches.kmvDistinct(col("v"), k = 64)).head().getDouble(0)
    val b = vals.reverse.toDF("v").repartition(16)
      .agg(Sketches.kmvDistinct(col("v"), k = 64)).head().getDouble(0)
    assert(a === b, "k-min-set is a set union — layout must not matter")
  }
}
