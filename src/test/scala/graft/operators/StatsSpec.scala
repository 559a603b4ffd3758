package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksTest: matches a brute-force D on fuzzed samples, any bin count") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val g = if (rnd.nextBoolean()) "A" else "B"
      // group B shifted so D is comfortably nonzero
      val v = math.round((rnd.nextGaussian() + (if (g == "B") 0.7 else 0.0)) * 1e3) / 1e3
      (g, v)
    } ++ Seq(("C", 99.9)) // out-of-scope group must be ignored
    val df = rows.toDF("g", "v")

    val a = rows.filter(_._1 == "A").map(_._2).sorted
    val b = rows.filter(_._1 == "B").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    def cdfCount(s: Seq[Double], x: Double) = s.count(_ <= x).toLong
    val diffs = values.map(x => (x, math.abs(cdfCount(a, x) * b.size - cdfCount(b, x) * a.size)))
    val dInt = diffs.map(_._2).max
    val expectD = BigDecimal(dInt.toDouble / (a.size.toLong * b.size))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectAt = diffs.filter(_._2 == dInt).map(_._1).min

    for (bins <- Seq(1, 7, 1024)) {
      val r = Stats.ksTest(df, "v", "g", "A", "B", bins = bins).collect()(0)
      assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
      assert(r.getAs[Double]("d_stat") == expectD, s"bins=$bins")
      assert(r.getAs[Double]("at_value") == expectAt, s"bins=$bins")
    }
  }

  test("ksTest/ksMatrix: degenerate constant column (lo == hi) gives D = 0") {
    // exercises the when(_hi === _lo) single-bin branch the gaussian
    // fuzz never hits
    val df = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val r = Stats.ksTest(df, "v", "g", "A", "B").collect()(0)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 1)
    assert(r.getAs[Double]("d_stat") == 0.0)
    assert(r.getAs[Double]("at_value") == 5.0)
    val m = Stats.ksMatrix(df, "v", "g", bins = 16).collect()(0)
    assert(m.getAs[Double]("d_stat") == 0.0 && m.getAs[Double]("at_value") == 5.0)
  }

  test("sprt: first crossing decides, both boundaries and the continue case, exact llr") {
    import spark.implicits._
    // c1=+10, c0=-10, A=+35, B=-35: key "up" hits +40 at n=4 (and the
    // later dips must not matter); key "down" hits -40 at n=4; key
    // "flat" alternates and never crosses
    def rows(k: String, outcomes: Seq[Boolean]) =
      outcomes.zipWithIndex.map { case (s, i) =>
        (k, new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong, s)
      }
    val df = (rows("up",   Seq(true, true, true, true, false, false, false, false, false)) ++
              rows("down", Seq(false, false, false, false, true, true)) ++
              rows("flat", Seq(true, false, true, false, true, false)))
      .toDF("k", "ts", "eid", "s")
    val got = Stats.sprt(df, col("k"), "ts", "eid", col("s"),
        c1Micro = 10L, c0Micro = -10L, aMicro = 35L, bMicro = -35L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))).toMap
    assert(got("up") === ((9L, "accept_h1", Some(4L), 40L)))
    assert(got("down") === ((6L, "accept_h0", Some(4L), -40L)))
    assert(got("flat") === ((6L, "continue", None, 0L)))
  }

  test("ksMatrix: exceeding maxGroups names the cap and points at the batching recipe") {
    val df = (1 to 40).map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.ksMatrix(df, "v", "g", bins = 16, maxGroups = 16)
    }
    assert(e.getMessage.contains("maxGroups=16"), e.getMessage)
    assert(e.getMessage.contains("SCALE.md"),
      s"the error must point a wide-grid user at the documented batching recipe: ${e.getMessage}")
  }

  test("ksMatrix: the SCALE.md batching recipe reproduces the single wide pass exactly") {
    // pins the documented G > maxGroups escape hatch (SCALE.md §ksMatrix):
    // batch the groups, run ksMatrix per batch pair, keep cross-batch
    // pairs only off the diagonal — the union must equal one wide pass
    val rnd = new scala.util.Random(31)
    val groups = (0 until 6).map(i => s"g$i")
    val rows = (1 to 900).map { _ =>
      val g = groups(rnd.nextInt(groups.size))
      (g, math.round((rnd.nextGaussian() + g.last.asDigit * 0.3) * 1e3) / 1e3)
    }
    val df = rows.toDF("g", "v")
    val wide = Stats.ksMatrix(df, "v", "g", bins = 64, maxGroups = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap

    val batches = groups.grouped(2).toSeq
    val parts =
      (for (i <- batches.indices; j <- i until batches.size) yield {
        val keep = batches(i) ++ batches(j)
        Stats.ksMatrix(df.filter(col("g").isin(keep: _*)), "v", "g", bins = 64)
          .filter(if (i == j) lit(true)
                  else !(col("g_a").isin(batches(i): _*) &&
                         col("g_b").isin(batches(i): _*)) &&
                       !(col("g_a").isin(batches(j): _*) &&
                         col("g_b").isin(batches(j): _*)))
      }).reduce(_ unionByName _)
    val batched = parts.collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap

    assert(batched.keySet == wide.keySet,
      s"pair coverage differs: ${batched.keySet} vs ${wide.keySet}")
    assert(batched.size == groups.size * (groups.size - 1) / 2)
    for ((k, want) <- wide) assert(batched(k) == want, s"pair $k")
  }

  test("ksMatrixBatched at G=20 equals the direct wide pass and honors the envelope") {
    val rnd = new scala.util.Random(47)
    val groups = (0 until 20).map(i => s"g$i")
    val rows = (1 to 3000).map { _ =>
      val gi = rnd.nextInt(groups.size)
      (groups(gi), math.round((rnd.nextGaussian() + gi * 0.17) * 1e3) / 1e3)
    }
    val df = rows.toDF("g", "v").repartition(5)
    val direct = Stats.ksMatrix(df, "v", "g", bins = 64, maxGroups = 20)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    val batched = Stats.ksMatrixBatched(df, "v", "g", bins = 64, batchSize = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(batched.size === 20 * 19 / 2, "every unordered pair exactly once")
    assert(batched.keySet === direct.keySet)
    for ((k, want) <- direct) assert(batched(k) === want, s"pair $k")
    // the pass plan: every pass stays inside ksMatrix's 16-group /
    // 120-pair codegen envelope, and the passes cover every unordered
    // group pair exactly once
    val sorted = groups.sorted
    val passes = Stats.ksBatchPasses(sorted, 8)
    // pure cross-pass plan: B(B-1)/2 passes, internals harvested from
    // the first pass touching each batch — no diagonal passes
    assert(passes.size === 3, "3 batches of 8/8/4 -> 3 cross passes")
    passes.foreach { case (bi, bj, _) =>
      val g = (bi ++ bj).distinct.size
      assert(g <= 16, s"pass holds $g groups — outside the codegen envelope")
      assert(g * (g - 1) / 2 <= 120)
    }
    val covered = scala.collection.mutable.Map.empty[(String, String), Int]
    passes.foreach { case (bi, bj, owned) =>
      val cross =
        if (bi == bj) Seq.empty
        else for (a <- bi; b <- bj) yield if (a < b) (a, b) else (b, a)
      val internal = owned.flatMap(b =>
        for (Seq(a, c) <- b.combinations(2).toSeq) yield (a, c))
      (cross ++ internal).foreach(p => covered(p) = covered.getOrElse(p, 0) + 1)
    }
    val allPairs = (for (Seq(a, b) <- sorted.combinations(2).toSeq) yield (a, b)).toSet
    assert(covered.keySet === allPairs)
    assert(covered.values.forall(_ == 1), "no pair may be claimed by two passes")
    // a batchSize that would widen a pass past the envelope is refused
    val e = intercept[IllegalArgumentException] {
      Stats.ksMatrixBatched(df, "v", "g", batchSize = 9)
    }
    assert(e.getMessage.contains("envelope"))
    // the exact q199 configuration: 25 groups / batches of 8 → 4
    // batches → 6 cross passes, 300 pairs claimed exactly once
    val gs25 = (0 until 25).map(_.toString).sorted
    val p25 = Stats.ksBatchPasses(gs25, 8)
    assert(p25.size === 6, "4 batches of 8/8/8/1 -> C(4,2) = 6 cross passes")
    val cov25 = scala.collection.mutable.Map.empty[(String, String), Int]
    p25.foreach { case (bi, bj, owned) =>
      val cross = for (a <- bi; b <- bj) yield if (a < b) (a, b) else (b, a)
      val internal = owned.flatMap(b =>
        for (Seq(a, c) <- b.combinations(2).toSeq) yield (a, c))
      (cross ++ internal).foreach(p => cov25(p) = cov25.getOrElse(p, 0) + 1)
    }
    assert(cov25.size === 300 && cov25.values.forall(_ == 1),
      "q199's 300 nation pairs, each emitted by exactly one pass")
  }

  test("ksMatrix: every pair row matches the dedicated two-sample ksTest") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map { _ =>
      val g = rnd.nextInt(3) match {
        case 0 => "A"; case 1 => "B"; case 2 => "C"
      }
      val shift = g match { case "A" => 0.0; case "B" => 0.6; case _ => -0.4 }
      (g, math.round((rnd.nextGaussian() + shift) * 1e3) / 1e3)
    }
    val df = rows.toDF("g", "v")
    val matrix = Stats.ksMatrix(df, "v", "g", bins = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(matrix.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    for (((ga, gb), got) <- matrix) {
      val want = Stats.ksTest(df, "v", "g", ga, gb, bins = 64).collect()(0)
      assert(got.getAs[Long]("n_a") == want.getAs[Long]("n_a"), s"($ga,$gb)")
      assert(got.getAs[Long]("n_b") == want.getAs[Long]("n_b"), s"($ga,$gb)")
      assert(got.getAs[Double]("d_stat") == want.getAs[Double]("d_stat"), s"($ga,$gb)")
      assert(got.getAs[Double]("at_value") == want.getAs[Double]("at_value"), s"($ga,$gb)")
    }
  }

  test("groupedExactPercentiles: bit-identical to the built-in percentile aggregate") {
    val rnd = new scala.util.Random(23)
    // mixed profile: near-unique doubles, heavy ties, tiny groups
    val rows = (1 to 3000).map { i =>
      val g = s"g${i % 4}"
      val v = if (i % 3 == 0) (rnd.nextInt(10) * 1.5) else rnd.nextGaussian() * 100
      (g, v)
    } ++ Seq(("solo", 42.0)) // n = 1 group
    val df = rows.toDF("grp", "x")
    val ps = Seq(0.0, 0.05, 0.5, 0.77, 0.95, 1.0)
    for (bins <- Seq(1, 8, 1024)) {
      val got = Stats.groupedExactPercentiles(df, "grp", "x", ps, bins = bins)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
      val want = df.groupBy(col("grp"))
        .agg(expr(s"percentile(x, array(${ps.mkString(",")}))").as("q"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(got.keySet == want.keySet, s"bins=$bins")
      for (g <- want.keySet; i <- ps.indices)
        assert(got(g)(i) == want(g)(i),
          s"bins=$bins group=$g p=${ps(i)}: ${got(g)(i)} != ${want(g)(i)}")
    }
  }

  test("groupedMedianAbsDeviation: bit-identical to the two-pass percentile formulation") {
    spark.catalog.clearCache() // isEmpty below must read OUR leftovers only
    val rnd = new scala.util.Random(31)
    val rows = (1 to 3000).map { i =>
      val g = s"g${i % 4}"
      val v = if (i % 3 == 0) (rnd.nextInt(10) * 1.5) else rnd.nextGaussian() * 100
      (g, v)
    } ++ Seq(("solo", 42.0)) ++ Seq(("const", 7.0), ("const", 7.0), ("const", 7.0))
    val df = rows.toDF("grp", "x")
    for (bins <- Seq(1, 8, 1024)) {
      val got = Stats.groupedMedianAbsDeviation(df, "grp", "x", bins = bins)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      // reference: built-in percentile for the median, then the
      // percentile of |x − med| — the unfused formulation
      val med = df.groupBy(col("grp"))
        .agg(expr("percentile(x, 0.5)").as("m"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val mad = df.withColumn("m", element_at(typedLit(med.map { case (k, v) => k -> v._1 }), col("grp")))
        .select(col("grp"), abs(col("x") - col("m")).as("d"))
        .groupBy(col("grp")).agg(expr("percentile(d, 0.5)").as("mad"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == med.keySet, s"bins=$bins")
      for (g <- med.keySet) {
        assert(got(g)._1 == med(g)._2, s"bins=$bins group=$g n")
        assert(got(g)._2 == med(g)._1,
          s"bins=$bins group=$g median: ${got(g)._2} != ${med(g)._1}")
        assert(got(g)._3 == mad(g),
          s"bins=$bins group=$g mad: ${got(g)._3} != ${mad(g)}")
      }
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "groupedMedianAbsDeviation must release its binned cache")
  }

  test("timeWeightedAvg: hand-computed step series; singleton keys dropped") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val df = Seq(
      // key 1: 10.0 held 1000ms, 20.0 held 3000ms -> (10*1000+20*3000)/4000 = 17.5
      (1L, 1L, ts(0), 10.0),
      (1L, 2L, ts(1000), 20.0),
      (1L, 3L, ts(4000), 99.0), // last value carries no weight
      (2L, 4L, ts(0), 5.0)      // singleton -> dropped
    ).toDF("k", "ev", "t", "v")
    val out = Stats.timeWeightedAvg(df, "k", "t", "ev", "v").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("k") == 1L)
    assert(out(0).getAs[Long]("n_obs") == 3L)
    assert(out(0).getAs[Double]("twa") == 17.5)
  }

  test("timeWeightedAvg: equal-timestamp ties fall back to the tie column") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    // two obs at t=0: tie order (ev) makes v=1 then v=2; v=1 spans 0ms
    val df = Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(0), 2.0),
      (1L, 3L, ts(1000), 9.0)).toDF("k", "ev", "t", "v")
    val out = Stats.timeWeightedAvg(df, "k", "t", "ev", "v").collect()(0)
    assert(out.getAs[Double]("twa") == 2.0) // only v=2 holds nonzero time
  }

  test("chi2Features: matches the textbook 2x2 formula brute-forced") {
    val docs = Seq(
      ("good fresh data", 1), ("good clean data", 1), ("good data", 1),
      ("bad stale data", 0), ("bad data", 0), ("noisy bad data", 0),
      ("fresh good corpus", 1), ("stale bad corpus", 0)
    )
    val df = docs.toDF("text", "y")
    val out = Stats.chi2Features(df, "text", col("y") === 1, minDf = 2, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

    val n = docs.size.toDouble
    val npos = docs.count(_._2 == 1).toDouble
    def chi2(tok: String): Double = {
      val hasTok = docs.map(d => d._1.split("\\s+").distinct.contains(tok))
      val a = docs.zip(hasTok).count { case ((_, y), h) => h && y == 1 }.toDouble
      val b = docs.zip(hasTok).count { case ((_, y), h) => h && y == 0 }.toDouble
      val c = npos - a
      val dd = n - a - b - c
      val raw = n * (a * dd - b * c) * (a * dd - b * c) /
        ((a + b) * (c + dd) * (a + c) * (b + dd))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // perfectly separating tokens score N; 'data' (3 pos, 3 neg) has
    // zero association and scores 0
    assert(out("good") == 8.0 && out("bad") == 8.0)
    assert(out("data") == 0.0 && out("data") == chi2("data"))
    assert(out("fresh") == chi2("fresh") && out("corpus") == chi2("corpus"))
    assert(out("fresh") > 0.0)
  }

  test("sortedIntersectCount kernel: set-intersection size on fuzzed sorted-distinct arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 300) {
      val a = Array.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val got = graft.plans.Kernels.sortedIntersectCount(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(got == a.toSet.intersect(b.toSet).size)
    }
    // hash arrays span the full signed range; signed sort order is the contract
    val n1 = Array(Long.MinValue, -5L, 3L)
    val n2 = Array(-5L, 3L, Long.MaxValue)
    assert(graft.plans.Kernels.sortedIntersectCount(
      new GenericArrayData(n1), new GenericArrayData(n2)) == 2)
  }

  test("q149's rank-sum AUC formula matches the O(n^2) pair-count brute force") {
    // replicate the query's U2 aggregation on a small fuzzed sample and
    // check it against direct pair counting (ties = 1/2)
    val rnd = new scala.util.Random(5)
    val pts = (1 to 300).map { _ =>
      val y = rnd.nextBoolean()
      // coarse grid => plenty of score ties
      val s = rnd.nextInt(20).toLong
      (if (y) 1L else 0L, s)
    }
    val df = pts.toDF("y", "sm")
    val c = df.groupBy(col("sm"))
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("sm"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val r = c.withColumn("negb", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(sum(col("pos") * (col("negb") * 2 + col("neg"))).as("u2"),
        sum(col("pos")).as("np"), sum(col("neg")).as("nn"))
      .collect()(0)
    val pos = pts.filter(_._1 == 1L).map(_._2)
    val neg = pts.filter(_._1 == 0L).map(_._2)
    val brute2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(r.getAs[Long]("u2") == brute2)
    assert(r.getAs[Long]("np") == pos.size && r.getAs[Long]("nn") == neg.size)
  }

  test("minimax isotonic fit: monotone, and pools exactly like PAVA on a hand case") {
    // bins with rates 0.2, 0.6, 0.4, 0.8 and equal n: PAVA pools the
    // middle violators to 0.5; the minimax closed form must agree
    val bins = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L), (3L, 10L, 8L))
      .toDF("bin", "n", "pos")
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bins.withColumn("cn", sum(col("n")).over(wc))
      .withColumn("cp", sum(col("pos")).over(wc))
    val iv = cum.select(col("bin").as("j"), (col("cn") - col("n")).as("cnj"),
        (col("cp") - col("pos")).as("cpj"))
      .join(cum.select(col("bin").as("k"), col("cn").as("cnk"), col("cp").as("cpk")),
        col("k") >= col("j"))
      .select(col("j"), col("k"),
        ((col("cpk") - col("cpj")).cast("double") /
          (col("cnk") - col("cnj")).cast("double")).as("rate"))
    val fit = cum.select(col("bin"))
      .join(iv, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy(col("bin"), col("j")).agg(min(col("rate")).as("mn"))
      .groupBy(col("bin")).agg(max(col("mn")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fit(0L) == 0.2 && fit(3L) == 0.8)
    assert(fit(1L) == 0.5 && fit(2L) == 0.5, s"PAVA pools 0.6,0.4 -> 0.5: $fit")
    assert(fit.toSeq.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("labelPropagation: two cliques joined by a weak bridge keep separate communities") {
    // clique {a,b,c}, clique {x,y,z}, bridge c-x with weight 1 vs
    // intra-clique weight 10: plurality vote keeps each side's min label
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"))
      .map { case (s, d) => (s, d, 10L) } :+ (("c", "x", 1L))
    val df = e.toDF("src", "dst", "w")
    for (limit <- Seq(1L << 19, 0L)) { // driver path AND distributed path
      val r = Graph.labelPropagation(df, "src", "dst", "w", iters = 4,
        driverEdgeLimit = limit)
        .collect().map(x => x.getString(0) -> x.getString(1)).toMap
      assert(Set("a", "b", "c").map(r) == Set("a"), s"limit=$limit: $r")
      assert(Set("x", "y", "z").map(r) == Set("x"), s"limit=$limit: $r")
    }
  }

  test("labelPropagation: driver and distributed paths agree exactly") {
    val rnd = new scala.util.Random(11)
    val nodes = (0 until 30).map(i => s"n$i")
    val e = (1 to 120).map { _ =>
      (nodes(rnd.nextInt(30)), nodes(rnd.nextInt(30)), 1L + rnd.nextInt(5))
    }.toDF("src", "dst", "w")
    val a = Graph.labelPropagation(e, "src", "dst", "w", iters = 3,
      driverEdgeLimit = 1L << 19).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    val b = Graph.labelPropagation(e, "src", "dst", "w", iters = 3,
      driverEdgeLimit = 0L).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(a == b)
  }

  test("sortedNeighborhoodPairs: finds sort-adjacent near-dups, honors the window bound") {
    // docs 1/2 share a 4-token prefix and 5-of-6 tokens -> adjacent in
    // sort order, Jaccard 5/7 >= 1/2. doc 9 is a near-dup of doc 1 but
    // sorts far away (different prefix) -> SNM misses it BY DESIGN.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (9L, "zzz alpha beta gamma delta epsilon"),
      (3L, "completely different text here now"),
      (4L, "more unrelated words in this row")
    ).toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(docs, "text", "doc_id",
      windowSize = 2, prefixLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 9L))
    spark.catalog.clearCache() // globalRowNumberScalable persists its frame
  }

  test("dbscan: two blobs cluster separately, border joins min core, outlier is noise") {
    // blob A: 5 points within eps of each other around (0,0); blob B:
    // 5 points around (10,10); border point at (0.215, 0) reaches only
    // A's right edge (3 cores — too few neighbours to be core itself);
    // (50,50) is noise. Margins keep every distance ≥ 0.005 away from
    // eps so float rounding can't flip a membership
    val eps = 0.2
    val a = (0 until 5).map(i => (i.toLong, i * 0.01, 0.0))
    val b = (0 until 5).map(i => (10L + i, 10.0 + i * 0.01, 10.0))
    val pts = (a ++ b :+ ((20L, 0.215, 0.0)) :+ ((30L, 50.0, 50.0)))
      .toDF("id", "x", "y")
    val out = Density.dbscan(pts, "id", "x", "y", eps, minPts = 5)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    // blob A all core, one cluster rooted at min id 0
    assert((0L to 4L).forall(i => out(i) == ((true, 0L))), s"$out")
    // blob B all core, cluster rooted at 10
    assert((10L to 14L).forall(i => out(i) == ((true, 10L))), s"$out")
    // border: not core (only 4+self neighbours... its neighbours are
    // A's right edge), assigned to A's cluster
    assert(out(20L)._1 == false && out(20L)._2 == 0L, s"$out")
    assert(out(30L) == ((false, -1L)), s"$out")
    spark.catalog.clearCache()
  }

  test("bpeEncode: merges compress exactly the pair occurrences") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the cat food"),
      (3L, "a dog")
    ).toDF("doc_id", "text")
    // round 1: 'the cat' (count 3) wins; round 2 is an all-ties round
    // and the (count desc, pair asc) break picks 'a dog'
    val out = Bpe.encode(df, "doc_id", "text", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L) == ((2L, 1L)))              // 'a dog' -> 'a_dog'
    assert(out(1L) == ((6L, 5L)))              // one 'the cat' fused
    assert(out(2L) == ((6L, 4L)))              // two 'the cat' fused
  }
}
