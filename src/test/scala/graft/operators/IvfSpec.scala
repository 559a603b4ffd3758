package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF ANN: quantizer sanity + recall vs exact top-k on clustered
  * vectors, and the exactness limit (nProbe = nCentroids ⇒ identical
  * to brute force).
  */
class IvfSpec extends SparkSpec {

  private def clustered(nClusters: Int, perCluster: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val bases = (0 until nClusters).map(_ => unit(Array.fill(dim)(rng.nextGaussian().toFloat)))
    bases.flatMap(b => (0 until perCluster).map(_ =>
      unit(b.map(x => x + 0.05f * rng.nextGaussian().toFloat))))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
  }

  test("trainCentroids: k spread centroids, unit norm, stable under iteration") {
    val sample = (0 until 200).map(i =>
      Array.fill(8)((i % 5).toFloat + 1f)).toArray
    val cs = Ivf.trainCentroids(sample, 4)
    assert(cs.length === 4)
    cs.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("ivfTopK recall >= 0.9 on clustered data probing 1/4 of the cells") {
    val corpus = clustered(nClusters = 8, perCluster = 30, dim = 16, seed = 3)
    val queries = corpus.filter(col("vec_id") % 30 === 0)
    val exact = Similarity.cosineTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Ivf.ivfTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", "embedding", 5, nCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall")
  }

  test("nProbe = nCentroids degenerates to the exact result") {
    val corpus = clustered(nClusters = 4, perCluster = 15, dim = 8, seed = 9)
    val queries = corpus.filter(col("vec_id") < 3)
    val exact = Similarity.cosineTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", "embedding", 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).toSet
    val ivf = Ivf.ivfTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", "embedding", 4, nCentroids = 6, nProbe = 6)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).toSet
    assert(ivf === exact)
  }
}
