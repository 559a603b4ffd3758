package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * coarse-quantizer scale path next to [[Similarity.lshTopK]]:
  *
  *  1. train `nCentroids` spherical k-means centroids on a driver-side
  *     sample (deterministic seeded init, Lloyd's iterations — the
  *     quantizer is config-scale even when the corpus is 100 TB);
  *  2. assign every corpus vector to its nearest centroid — one
  *     codegen'd scan, centroids broadcast in the closure;
  *  3. per query, probe the `nProbe` nearest centroids and score ONLY
  *     corpus vectors in those cells — the equi-join on cell id prunes
  *     (1 - nProbe/nCentroids) of the corpus per query;
  *  4. bounded per-query top-k ([[Similarity.TopKAgg]]).
  *
  * Recall rises with nProbe (nProbe = nCentroids ⇒ exact).
  */
object Ivf {

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (n == 0) v else v.map(_ / n)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Spherical k-means on a sample: cosine assignment, mean + renorm
    * update, deterministic spread init (every (n/k)-th sample vector).
    */
  private[operators] def trainCentroids(sample: Array[Array[Float]], k: Int,
                                        iters: Int = 10): Array[Array[Float]] = {
    require(sample.nonEmpty && k > 0)
    val normed = sample.map(normalize)
    val kk = math.min(k, normed.length)
    var centroids = Array.tabulate(kk)(i => normed(i * normed.length / kk))
    (0 until iters).foreach { _ =>
      val sums = Array.fill(kk)(new Array[Double](normed.head.length))
      val counts = new Array[Int](kk)
      normed.foreach { v =>
        var best = 0; var bestD = Double.MinValue
        var c = 0
        while (c < kk) {
          val d = dot(v, centroids(c))
          if (d > bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else normalize(sums(c).map(_.toFloat))
      }
    }
    centroids
  }

  /** IVF top-k. `sampleSize` caps the driver-side training sample. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String, k: Int,
              nCentroids: Int = 64, nProbe: Int = 8,
              sampleSize: Int = 10000): DataFrame = {
    val sample = corpus.select(col(corpusVec)).limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    val centroids = trainCentroids(sample, nCentroids)
    // flatten row-major for the codegen kernels — assignment and probe
    // selection run inside whole-stage codegen with the centroid array
    // attached as a reference object, not behind a Scala-UDF fence
    val dim = centroids.head.length
    val flat = new Array[Float](centroids.length * dim)
    centroids.zipWithIndex.foreach { case (cv, i) =>
      System.arraycopy(cv, 0, flat, i * dim, dim)
    }
    val cells = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .withColumn("_cell", Exprs.nearestCentroid(col("cv"), flat, dim))
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("_cell", explode(Exprs.topCells(col("qv"), flat, dim, nProbe)))
    val scored = cells.join(broadcast(probes), Seq("_cell"))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.cosineSim(col("cv"), col("qv")).as("cosine"))
    Similarity.topKPerQuery(scored, k)
  }
}
