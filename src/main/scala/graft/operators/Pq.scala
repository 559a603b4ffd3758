package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the memory-side scale path for embedding
  * search (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", public literature): split each `dim`-vector into `m`
  * subspaces of `dsub` dims, quantize each subspace against its own
  * `k`-entry codebook, and store only the `m` small code indices —
  * 64 float dims become 8 bytes at m=8/k≤256, a 32× memory cut that
  * is what lets a 100 TB corpus' index fit a cluster's RAM.
  *
  * Query-time ADC (asymmetric distance): build ONE `m·k` lookup table
  * per query (the only dim-length work), then score each coded row
  * with `m` table loads — all three steps are codegen kernels with the
  * codebook riding as a reference object, so encode is scan-speed and
  * scoring never touches the original vectors.
  *
  * [[train]] fits per-subspace codebooks by deterministic Lloyd's on a
  * driver-side sample (config-scale, the [[Ivf]] contract);
  * [[pseudoCodebooks]] is the mix64-derived stand-in family that makes
  * the encode/ADC plumbing exactly reproducible by an independent
  * engine without shipping the arrays (the cross-engine oracle path —
  * quantization QUALITY is measured in `PqSpec` against brute force).
  */
object Pq {

  /** Row-major `[m][k][dsub]` codebook. */
  case class Codebooks(m: Int, k: Int, dsub: Int, flat: Array[Double]) {
    require(flat.length == m * k * dsub)
  }

  /** Deterministic stand-in codebooks: entry `((mi·k + j)·dsub + t)`
    * is the [[QualityClassifier.pseudoWeights]] uniform in [-1, 1).
    */
  def pseudoCodebooks(m: Int, k: Int, dsub: Int, salt: Long = 777L): Codebooks =
    Codebooks(m, k, dsub, QualityClassifier.pseudoWeights(m * k * dsub, salt))

  /** Per-subspace Lloyd's on a driver-side sample (plain L2, seeds =
    * every (n/k)-th sample subvector — deterministic).
    */
  def train(df: DataFrame, vecCol: String, m: Int, k: Int, dsub: Int,
            iters: Int = 10, sampleSize: Int = 10000): Codebooks = {
    val sample = df.select(col(vecCol)).limit(sampleSize)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    val flat = new Array[Double](m * k * dsub)
    var mi = 0
    while (mi < m) {
      val subs = sample.map(v => Array.tabulate(dsub)(t => v(mi * dsub + t).toDouble))
      val kk = math.min(k, subs.length)
      var cents = Array.tabulate(kk)(j => subs(j * subs.length / kk).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(kk)(new Array[Double](dsub))
        val counts = new Array[Int](kk)
        subs.foreach { sv =>
          var best = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < kk) {
            var d = 0.0
            var t = 0
            while (t < dsub) { val x = sv(t) - cents(j)(t); d += x * x; t += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          counts(best) += 1
          var t = 0
          while (t < dsub) { sums(best)(t) += sv(t); t += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, j) =>
          if (counts(j) == 0) old else sums(j).map(_ / counts(j))
        }
        it += 1
      }
      var j = 0
      while (j < kk) {
        System.arraycopy(cents(j), 0, flat, (mi * k + j) * dsub, dsub)
        j += 1
      }
      mi += 1
    }
    Codebooks(m, k, dsub, flat)
  }

  /** `(idCol, codes)` — one narrow codegen pass; codes are the
    * `m` sub-centroid indices (store THESE, not the vectors).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame =
    df.select(col(idCol),
      Exprs.pqEncode(col(vecCol), cb.flat, cb.m, cb.k, cb.dsub).as("codes"))

  /** ADC top-k: per query, the `k` coded corpus rows with the smallest
    * asymmetric L2 distance. The query side builds its lookup table
    * once and broadcasts (probe sets are config-scale); the coded
    * corpus is scanned exactly once and the per-(query, partition)
    * top-k state is bounded by [[Similarity.TopKAgg]] below the
    * exchange. Returns (query_id, neighbor_id, adist, rank) —
    * rank 1 = nearest.
    */
  def adcTopK(codes: DataFrame, queries: DataFrame,
              codesId: String, queryId: String, queryVec: String,
              cb: Codebooks, topK: Int): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"),
      Exprs.pqTable(col(queryVec), cb.flat, cb.m, cb.k, cb.dsub).as("_tbl"))
    val scored = codes.select(col(codesId).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        // TopKAgg ranks descending, so feed the negated distance
        (-Exprs.pqAdc(col("_tbl"), col("codes"), cb.k)).as("cosine"))
    Similarity.topKPerQuery(scored, topK)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cosine")).as("adist"), col("rank"))
  }
}
