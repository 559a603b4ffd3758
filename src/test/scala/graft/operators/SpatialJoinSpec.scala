package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {

  test("radiusJoin equals brute force, including cell-boundary straddlers") {
    import spark.implicits._
    // deterministic pseudo-random points plus hand-placed pairs that
    // straddle cell boundaries (cell width = radius = 10)
    def coords(seed: Long): (Double, Double) = {
      val h1 = graft.plans.Kernels.mix64(seed)
      val h2 = graft.plans.Kernels.mix64(seed + 7777)
      ((((h1 % 100000) + 100000) % 100000) / 1000.0,
        (((h2 % 100000) + 100000) % 100000) / 1000.0)
    }
    val left = ((0L until 200L).map(i => { val (x, y) = coords(i); (i, x, y) }) ++
      Seq((900L, 9.999, 50.0), (901L, 50.0, 19.999))).toDF("lid", "px", "py")
    val right = ((0L until 60L).map(i => { val (x, y) = coords(i + 31) ; (i, x, y) }) ++
      Seq((800L, 10.001, 50.0), (801L, 50.0, 20.001))).toDF("rid", "qx", "qy")

    val got = SpatialJoin.radiusJoin(left, "px", "py", right, "qx", "qy", 10.0)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val l = left.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val r = right.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = (for {
      (li, lx, ly) <- l; (ri, rx, ry) <- r
      if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= 100.0
    } yield (li, ri)).toSet
    assert(got === want)
    // the planted boundary pairs (distance 0.002 across a cell edge) are found
    assert(got.contains((900L, 800L)) && got.contains((901L, 801L)))
  }

  test("radiusJoin: each pair appears exactly once (no cross-cell duplicates)") {
    import spark.implicits._
    val left = Seq((1L, 5.0, 5.0)).toDF("lid", "px", "py")
    val right = Seq((2L, 5.1, 5.1)).toDF("rid", "qx", "qy")
    val rows = SpatialJoin.radiusJoin(left, "px", "py", right, "qx", "qy", 10.0).collect()
    assert(rows.length === 1)
  }
}
