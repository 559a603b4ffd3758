package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed k-means: assignment vs a driver brute force,
  * partitioning-invariance of the fitted model (the 6-dp pin), and
  * SemDeDup recall on planted near-duplicates.
  */
class KMeansSpec extends SparkSpec {

  /** Deterministic test vectors: dim-8 floats from a hash mix, a few
    * tight planted clusters so k-means has real structure.
    */
  private def vecs(n: Int, dim: Int = 8): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val base = i % 4 // 4 planted directions
      val v = Array.tabulate(dim) { j =>
        val center = if (j % 4 == base) 1.0f else 0.1f
        center + 0.01f * (((graft.plans.Kernels.mix64(i.toLong * dim + j) >>> 40) % 100) / 100.0f)
      }
      (i.toLong, v)
    }

  private def brute(vn: Array[Double], cents: Array[Array[Double]]): (Int, Double) = {
    var best = 0; var bestD = Double.MinValue
    cents.indices.foreach { c =>
      var d = 0.0
      vn.indices.foreach(j => d += vn(j) * cents(c)(j))
      if (d > bestD) { bestD = d; best = c }
    }
    (best, bestD)
  }

  private def normalize(v: Array[Float]): Array[Double] = {
    var ss = 0.0
    v.foreach(x => ss += x.toDouble * x.toDouble)
    val n = math.sqrt(ss)
    v.map(x => if (n == 0.0) x.toDouble else x.toDouble / n)
  }

  test("assignment matches a driver brute force over the fitted model") {
    import spark.implicits._
    val df = vecs(200).toDF("id", "v")
    val model = KMeans.fit(df, "id", "v", k = 4, iters = 3)
    val got = KMeans.assign(df, "id", "v", model)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val data = vecs(200).toMap
    got.foreach { case (id, (cluster, cos)) =>
      val (bc, bd) = brute(normalize(data(id)), model.centroids)
      assert(cluster === bc, s"id $id")
      assert(math.abs(cos - bd) < 1e-12, s"id $id")
    }
    // the planted structure should be recovered: members of one planted
    // direction agree on their cluster
    val byBase = got.groupBy { case (id, _) => id % 4 }.map { case (b, m) =>
      b -> m.values.map(_._1).toSeq.distinct.size
    }
    assert(byBase.values.forall(_ == 1), s"planted directions split: $byBase")
  }

  test("fitted model is invariant to input partitioning (6-dp pin)") {
    import spark.implicits._
    val df1 = vecs(300).toDF("id", "v").repartition(2)
    val df2 = vecs(300).reverse.toDF("id", "v").repartition(17)
    val m1 = KMeans.fit(df1, "id", "v", k = 5, iters = 2)
    val m2 = KMeans.fit(df2, "id", "v", k = 5, iters = 2)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("empty clusters keep their previous centroid") {
    import spark.implicits._
    // 3 identical vectors, k=3: seeds are 3 copies of the same point,
    // every row assigns to cluster 0 (ties to lowest), clusters 1 and 2
    // go empty and must survive as their seed value
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)))
      .toDF("id", "v")
    val m = KMeans.fit(df, "id", "v", k = 3, iters = 2)
    assert(m.k === 3)
    m.centroids.foreach(c => assert(c.toSeq === m.centroids.head.toSeq))
  }

  test("IVF probe with nProbe >= cells equals the flat scan exactly") {
    import spark.implicits._
    val df = vecs(240).toDF("id", "v")
    // full-coverage probe: every cell probed → candidate set is all k
    // fine centroids → fit AND assignment must be bit-identical
    val full = Some(KMeans.Probe(cc = 4, cIters = 2, nProbe = 4))
    val mFlat = KMeans.fit(df, "id", "v", k = 12, iters = 2)
    val mIvf = KMeans.fit(df, "id", "v", k = 12, iters = 2, probe = full)
    mFlat.centroids.zip(mIvf.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
    val aFlat = KMeans.assign(df, "id", "v", mFlat)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val aIvf = KMeans.assign(df, "id", "v", mIvf, probe = full)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(aFlat === aIvf)
  }

  test("buildCoarse partitions the fine centroids; members ascend in-cell") {
    import spark.implicits._
    val df = vecs(200).toDF("id", "v")
    val m = KMeans.fit(df, "id", "v", k = 10, iters = 1)
    val c = KMeans.buildCoarse(m.centroids, KMeans.Probe(cc = 3, cIters = 2))
    val nCells = c.cellStart.length - 1
    assert(nCells >= 1 && nCells <= 3)
    assert(c.cellStart.head === 0 && c.cellStart.last === 10)
    // every fine index appears exactly once; ascending within a cell
    val all = (0 until nCells).flatMap { p =>
      val slice = c.members.slice(c.cellStart(p), c.cellStart(p + 1))
      assert(slice.toSeq === slice.sorted.toSeq, s"cell $p not ascending")
      assert(slice.nonEmpty, s"cell $p empty — only non-empty cells allowed")
      slice
    }
    assert(all.sorted === (0 until 10))
  }

  test("partial IVF probe keeps planted near-dup recall (approximate path)") {
    import spark.implicits._
    val base = vecs(300)
    val planted = base.map { case (id, v) =>
      (id + 1000, v.zipWithIndex.map { case (x, j) => x * (1.0f + 0.001f * (j % 3)) })
    }
    val df = (base ++ planted).toDF("id", "v")
    // genuinely partial probing (2 of up to 4 cells): near-identical
    // vectors walk the same deterministic probe path, so planted pairs
    // still meet inside one fine cluster
    val pairs = KMeans.semanticNearDupPairs(df, "id", "v",
        k = 12, iters = 1, minCosine = 0.99,
        probe = Some(KMeans.Probe(cc = 4, cIters = 2, nProbe = 2)))
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val found = base.count { case (id, _) => pairs.contains((id, id + 1000)) }
    assert(found >= 285, s"found only $found of 300 planted pairs")
  }

  test("semanticNearDupPairs finds planted within-cluster duplicates") {
    import spark.implicits._
    val base = vecs(200)
    // plant near-identical copies at id+1000 (tiny relative perturbation)
    val planted = base.map { case (id, v) =>
      (id + 1000, v.zipWithIndex.map { case (x, j) => x * (1.0f + 0.001f * (j % 3)) })
    }
    val df = (base ++ planted).toDF("id", "v")
    val pairs = KMeans.semanticNearDupPairs(df, "id", "v",
        k = 4, iters = 2, minCosine = 0.99)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val found = base.count { case (id, _) => pairs.contains((id, id + 1000)) }
    // a planted pair is only missed if the copy crosses a cluster
    // boundary; at 0.1% perturbation that should be rare
    assert(found >= 190, s"found only $found of 200 planted pairs")
    // and every reported pair must truly be above threshold
    val all = KMeans.semanticNearDupPairs(df, "id", "v", 4, 2, 0.99)
      .collect()
    all.foreach(r => assert(r.getDouble(3) >= 0.99))
  }

  test("fixed-k pair gate: fails fast past the cap naming the scale-safe twin, cap raise enumerates") {
    import spark.implicits._
    val df = vecs(120).toDF("id", "v")
    // k=2 over 120 vectors → Σ C(cluster,2) ≈ 3.5k pairs ≫ cap=100
    val e = intercept[IllegalArgumentException] {
      KMeans.semanticNearDupPairs(df, "id", "v", k = 2, iters = 1,
        minCosine = 0.0, maxCandidatePairs = 100L)
    }
    assert(e.getMessage.contains("maxCandidatePairs"))
    assert(e.getMessage.contains("scale-safe overload"))
    // explicit raise enumerates the identical frame
    val n = KMeans.semanticNearDupPairs(df, "id", "v", k = 2, iters = 1,
      minCosine = 0.0, maxCandidatePairs = Long.MaxValue).count()
    assert(n > 100L)
    // the k∝N default overload never counts (bound by construction) —
    // same corpus, no throw
    KMeans.semanticNearDupPairs(df, "id", "v", minCosine = 0.99).count()
  }
}
