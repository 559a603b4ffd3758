package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: encode/ADC vs a driver brute force, code
  * compactness, and trained-codebook recall against exact L2.
  */
class PqSpec extends SparkSpec {

  private val dim = 16
  private val m = 4
  private val dsub = 4

  /** Clustered corpus: 8 prototype directions + small deterministic
    * noise — structure PQ can exploit (random vectors would not be).
    */
  private def vecs(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val proto = i % 8
      val v = Array.tabulate(dim) { j =>
        val base = if (j % 8 == proto) 2.0f else 0.2f
        base + 0.05f * (((graft.plans.Kernels.mix64(i.toLong * dim + j) >>> 40) % 100) / 100.0f)
      }
      (i.toLong, v)
    }

  private def bruteEncode(v: Array[Float], cb: Pq.Codebooks): Array[Int] =
    Array.tabulate(cb.m) { mi =>
      (0 until cb.k).minBy { j =>
        (0 until cb.dsub).map { t =>
          val d = v(mi * cb.dsub + t).toDouble - cb.flat((mi * cb.k + j) * cb.dsub + t)
          d * d
        }.sum
      }
    }

  private def bruteAdist(q: Array[Float], codes: Array[Int], cb: Pq.Codebooks): Double =
    (0 until cb.m).map { mi =>
      (0 until cb.dsub).map { t =>
        val d = q(mi * cb.dsub + t).toDouble - cb.flat((mi * cb.k + codes(mi)) * cb.dsub + t)
        d * d
      }.sum
    }.sum

  test("encode and ADC scoring match the driver brute force (pseudo codebooks)") {
    import spark.implicits._
    val cb = Pq.pseudoCodebooks(m, k = 8, dsub)
    val data = vecs(100)
    val df = data.toDF("id", "v")
    val codes = Pq.encode(df, "id", "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    data.foreach { case (id, v) =>
      assert(codes(id).toSeq === bruteEncode(v, cb).toSeq, s"id $id")
    }
    val top = Pq.adcTopK(Pq.encode(df, "id", "v", cb),
        df.filter(col("id") < 3), "id", "id", "v", cb, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = data.toMap
    top.foreach { case (q, nb, adist, _) =>
      // topKPerQuery rounds the score to 6 dp
      assert(math.abs(adist - bruteAdist(byQ(q), codes(nb), cb)) < 1e-6)
    }
    // ranks are 1..4 per query, ascending distance
    top.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to 4))
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq)
    }
  }

  test("trained codebooks preserve coarse structure (ADC neighbors share the " +
       "query's prototype) and beat pseudo codebooks on quantization error") {
    import spark.implicits._
    val data = vecs(400)
    val df = data.toDF("id", "v")
    val cb = Pq.train(df, "v", m, k = 16, dsub, iters = 10)
    val codes = Pq.encode(df, "id", "v", cb)
    val queries = df.filter(col("id") < 5)
    val got = Pq.adcTopK(codes, queries, "id", "id", "v", cb, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    // PQ cannot rank noise-level intra-cluster ties, but every returned
    // neighbor must come from the query's own prototype cluster
    (0L until 5L).foreach { q =>
      val sameProto = got(q).map(_._2).count(nb => nb % 8 == q % 8)
      assert(sameProto >= 9, s"query $q: only $sameProto/10 same-prototype")
    }
    // trained quantization error (ADC self-distance) must be far below
    // the pseudo-codebook baseline — training has to actually help
    def selfErr(c: Pq.Codebooks): Double = {
      val enc = Pq.encode(df, "id", "v", c)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
      data.map { case (id, v) => bruteAdist(v, enc(id), c) }.sum / data.size
    }
    val trained = selfErr(cb)
    val pseudo = selfErr(Pq.pseudoCodebooks(m, 16, dsub))
    assert(trained < pseudo / 10.0,
      s"trained err $trained not << pseudo err $pseudo")
  }

  test("codes are m small ints — the 32x memory contract") {
    import spark.implicits._
    val cb = Pq.pseudoCodebooks(m, k = 8, dsub)
    val codes = Pq.encode(vecs(20).toDF("id", "v"), "id", "v", cb).collect()
    codes.foreach { r =>
      val c = r.getSeq[Int](1)
      assert(c.length === m)
      assert(c.forall(j => j >= 0 && j < 8))
    }
  }
}
