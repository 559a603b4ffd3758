package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed spherical k-means (Lloyd's iterations) over an
  * `Array[Float]` embedding column, plus the SemDeDup-style semantic
  * dedup built on it.
  *
  * Unlike [[Ivf.trainCentroids]] (a driver-side quantizer over a capped
  * sample — the right tool when the centroids only need to be
  * *plausible* cells), this fit runs every Lloyd's round over the FULL
  * corpus as Spark jobs, so the model is a deterministic function of
  * all the data:
  *
  *  - assignment is one corpus scan — the codegen
  *    [[Exprs.nearestCentroidScoreD]] kernel against the k×dim centroid
  *    matrix riding in the generated class as a reference object;
  *  - the update is one `(cluster, dim)`-keyed mean whose aggregation
  *    state is k·dim cells regardless of corpus size (partial map-side
  *    combine makes the shuffle k·dim rows per task);
  *  - only the k×dim matrix ever reaches the driver — no `.collect()`
  *    of corpus rows.
  *
  * Reproducibility: the one order-nondeterministic step is the
  * cross-row mean (float sums commute only up to ~1e-13 relative
  * noise), so each iteration's means are rounded to 6 dp before the
  * renormalize — pinning the model bit-for-bit across engines,
  * partitionings and core counts. Everything else (normalization,
  * dots, renorm) is correctly-rounded IEEE double arithmetic in index
  * order, which a SQL ordered list_reduce replays exactly.
  *
  * Seeds are the k smallest-id vectors (normalized) — deterministic
  * and cheap (`orderBy(id).limit(k)` is a global top-k, not a sort).
  */
object KMeans {

  /** Normalized centroid rows (k × dim doubles). */
  case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    def dim: Int = if (centroids.isEmpty) 0 else centroids.head.length
    def flat: Array[Double] = {
      val out = new Array[Double](k * dim)
      var i = 0
      while (i < k) { System.arraycopy(centroids(i), 0, out, i * dim, dim); i += 1 }
      out
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def renorm(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v else v.map(_ / n)
  }

  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Model = {
    require(k > 0 && iters >= 0)
    val vn = df.select(col(idCol).as("_id"), Exprs.normalizeD(col(vecCol)).as("_vn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = vn.orderBy(col("_id")).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
      require(seeds.nonEmpty, "empty input")
      var cents = seeds
      val dim = cents.head.length
      var it = 0
      while (it < iters) {
        val flat = Model(cents).flat
        val means = vn
          .select(Exprs.nearestCentroidScoreD(col("_vn"), flat, dim)
              .getItem(0).cast("int").as("_c"),
            posexplode(col("_vn")).as(Seq("_d", "_x")))
          .groupBy(col("_c"), col("_d")).agg(avg(col("_x")).as("_m"))
          .collect()
        // empty clusters keep their previous centroid
        val next = cents.map(_.clone())
        means.groupBy(_.getInt(0)).foreach { case (c, rows) =>
          val mv = new Array[Double](dim)
          rows.foreach(r => mv(r.getInt(1)) = round6(r.getDouble(2)))
          next(c) = renorm(mv)
        }
        cents = next
        it += 1
      }
      Model(cents)
    } finally vn.unpersist(blocking = false)
  }

  /** Nearest-centroid assignment: `(idCol, cluster, cos)` — one codegen
    * scan, no shuffle. `cos` is the dot against the normalized vector
    * (spherical centroids have unit norm, so this is cosine
    * similarity).
    */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.select(col(idCol),
        Exprs.nearestCentroidScoreD(
          Exprs.normalizeD(col(vecCol)), model.flat, model.dim).as("_a"))
      .select(col(idCol), col("_a").getItem(0).cast("int").as("cluster"),
        col("_a").getItem(1).as("cos"))

  /** SemDeDup-style semantic near-duplicate pairs: k-means clusters
    * bound the candidate space — pairs are generated WITHIN a cluster
    * only (shuffle key = cluster id) and exact-cosine verified, so the
    * pair cost is Σ|cluster|² instead of n². Returns
    * `(cluster, id_a, id_b, cosine)` for survivors at ≥ `minCosine`.
    *
    * Scale: the dual of [[Dedup.embeddingNearDupPairs]] — LSH banding
    * gives a recall *guarantee* per band count; SemDeDup gives a
    * *tunable partition count* (grow k with the corpus so n/k stays
    * bounded) and finds pairs LSH bands can miss inside a tight
    * cluster. Cluster-size skew is the failure mode to monitor; the
    * vectors ride the cluster-keyed shuffle once per side, which is
    * unavoidable for an exact verify.
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iters: Int, minCosine: Double): DataFrame = {
    val model = fit(df, idCol, vecCol, k, iters)
    // cluster and vector in ONE narrow scan — no id re-join
    val withV = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Exprs.nearestCentroidScoreD(
        Exprs.normalizeD(col(vecCol)), model.flat, model.dim)
        .getItem(0).cast("int").as("cluster"))
    withV.as("a").join(withV.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.cluster").as("cluster"), col("a.id").as("id_a"),
        col("b.id").as("id_b"), Exprs.cosineSim(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
