package graft.operators

import graft.SparkSpec
import graft.plans.Kernels
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave, bit-by-bit. */
  private def morton(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until n)
      z |= ((vals(j) >> i) & 1L) << (i * n + (n - 1 - j))
    z
  }

  test("zorder2 matches the bit-by-bit reference on a value grid") {
    import spark.implicits._
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b"), 6).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) === morton(Seq(a, b), 6), s"($a,$b)")
    }
  }

  test("three-dimensional interleave places head column at the MSB of each level") {
    import spark.implicits._
    val rows = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L))
    val z = rows.toDF("a", "b", "c")
      .select(Layout.zorder(Seq(col("a"), col("b"), col("c")), 1).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z === Seq(4L, 2L, 1L))
  }

  test("zorder clustering keeps per-bucket ranges narrow on BOTH dims") {
    import spark.implicits._
    val pts = (for (a <- 0L until 256L; b <- 0L until 256L) yield (a, b)).toDF("a", "b")
    val stats = pts
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b"), 8).as("z"))
      .groupBy(shiftright(col("z"), 8).as("bucket")) // 256 buckets of 256 pts
      .agg((max(col("a")) - min(col("a"))).as("ra"), (max(col("b")) - min(col("b"))).as("rb"))
      .agg(max(col("ra")).as("ra"), max(col("rb")).as("rb")).head()
    // each bucket is one 16x16 Morton tile: range 15 on both dims, vs
    // 255 for a single-column sort's minor dimension
    assert(stats.getLong(0) === 15L)
    assert(stats.getLong(1) === 15L)
  }

  test("zorder is a codegen'd narrow projection (no shuffle, no udf)") {
    import spark.implicits._
    val plan = (0L until 100L).map(i => (i, i * 7 % 100)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 16).as("z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
  }

  test("rendezvousShard matches the driver-side HRW argmax (signed compare, first max wins)") {
    import spark.implicits._
    val n = 5
    val got = (0L until 2000L).toDF("k")
      .select(col("k"), Layout.rendezvousShard(col("k"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 2000L).foreach { k =>
      val h = Kernels.mix64(k)
      var best = 0
      var bestScore = Kernels.mix64(h ^ 0L)
      for (s <- 1 until n) {
        val sc = Kernels.mix64(h ^ s.toLong) // signed JVM compare, strictly
        if (sc > bestScore) { best = s; bestScore = sc } // greater => first max wins
      }
      assert(got(k) === best, s"key $k")
    }
  }

  test("growing n -> n+1 moves ONLY keys won by the new shard, ~1/(n+1) of them") {
    import spark.implicits._
    val n = 7
    val rows = (0L until 20000L).toDF("k")
      .select(col("k"), Layout.rendezvousShard(col("k"), n).as("a"),
        Layout.rendezvousShard(col("k"), n + 1).as("b"))
      .collect()
    val moved = rows.filter(r => r.getInt(1) != r.getInt(2))
    moved.foreach(r =>
      assert(r.getInt(2) === n, s"key ${r.getLong(0)} moved between PRE-EXISTING shards"))
    // binomial(20000, 1/8): sd ~ 0.0023 — bounds are >10 sigma wide
    val frac = moved.length.toDouble / rows.length
    assert(frac > 0.08 && frac < 0.17, s"moved fraction $frac, expected ~1/8")
  }

  test("rendezvousShard is a codegen'd narrow projection (no shuffle, no udf)") {
    import spark.implicits._
    val plan = (0L until 100L).toDF("k")
      .select(Layout.rendezvousShard(col("k"), 8).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
  }
}
