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

  test("Misra-Gries: exact when capacity exceeds the distinct count") {
    import spark.implicits._
    // zipf-ish: term t_i appears (20 - i) times, 20 distinct terms
    val rows = (0 until 20).flatMap(i => Seq.fill(20 - i)(s"t$i"))
    val df = new scala.util.Random(42).shuffle(rows).toDF("term").repartition(8)
    val top = Sketches.heavyHitters(df, "term", capacity = 32, topN = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq === Seq(("t0", 20L, 1L), ("t1", 19L, 2L),
      ("t2", 18L, 3L), ("t3", 17L, 4L), ("t4", 16L, 5L)))
  }

  test("Misra-Gries: sub-capacity estimates honor the n/capacity bound " +
       "and heavy terms survive") {
    import spark.implicits._
    // 1000 occurrences of 'hot', plus 500 singleton terms; capacity 50
    // << 501 distinct. MG bound: est in [true - n/cap, true].
    val rows = Seq.fill(1000)("hot") ++ (0 until 500).map(i => s"rare$i")
    val n = rows.size
    val df = new scala.util.Random(42).shuffle(rows).toDF("term").repartition(8)
    val top = Sketches.heavyHitters(df, "term", capacity = 50, topN = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head._1 === "hot", "a term with freq > n/capacity must survive")
    val est = top.head._2
    assert(est <= 1000 && est >= 1000 - n / 50, s"estimate $est outside MG bound")
  }

  test("count-min: upper bound, error bound, and partitioning-invariant merge") {
    import spark.implicits._
    // zipf-ish: key k appears 1000/k times, k = 1..50 (n = 4500)
    val rows = (1L to 50L).flatMap(k => Seq.fill((1000 / k).toInt)(k))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = new scala.util.Random(7).shuffle(rows).toDF("k")
    val w = 256
    def ests(d: org.apache.spark.sql.DataFrame) =
      Sketches.cmsPointEstimates(d, col("k"), (1L to 50L).toSeq, d = 4, w = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e1 = ests(df)
    (1L to 50L).foreach { k =>
      assert(e1(k) >= truth(k), s"CMS must never undercount (key $k)")
      // ε = 2n/w with prob ≥ 1 − 2⁻⁴; all 50 inside is overwhelmingly likely
      assert(e1(k) <= truth(k) + 2L * rows.size / w, s"key $k overshoot ${e1(k)} vs ${truth(k)}")
    }
    // the sketch is algebraic: any partitioning merges to the same counters
    assert(ests(df.repartition(13)) === e1)
  }

  test("cmsSelfJoinSize: upper-bounds exact F2, tight at large w, layout-invariant") {
    import spark.implicits._
    val rows = (1L to 40L).flatMap(k => Seq.fill((800 / k).toInt)(k))
    val exact = rows.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
    val df = new scala.util.Random(5).shuffle(rows).toDF("k")
    val est = Sketches.cmsSelfJoinSize(df, col("k"), d = 4, w = 2048)
    assert(est >= exact, "inner-product estimate must never undercount")
    assert(est <= (exact * 1.2).toLong, s"overshoot too large: $est vs $exact")
    assert(Sketches.cmsSelfJoinSize(df.repartition(9), col("k"), d = 4, w = 2048) === est)
  }
}
