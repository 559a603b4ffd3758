package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.{Column, DataFrame}
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

  /** IVF probe configuration for the assignment scans: `cc` coarse
    * cells (clamped to k), `cIters` driver-side Lloyd rounds over the
    * FINE CENTROIDS (k×√k work on the driver — config-scale), probe
    * the `nProbe` best cells per vector. With `nProbe >= cc` the
    * candidate set is all k centroids and assignment equals the flat
    * scan exactly (the KMeansSpec equivalence gate).
    */
  case class Probe(cc: Int, cIters: Int = 2, nProbe: Int = 2) {
    require(cc >= 1 && cIters >= 0 && nProbe >= 1)
  }

  /** Coarse probe structure over a fine-centroid matrix (the
    * [[graft.plans.Kernels.ivfAssignScoreD]] reference-object layout):
    * only NON-EMPTY cells, ascending cell id; members ascending.
    */
  private[operators] case class Coarse(flat: Array[Double],
      cellStart: Array[Int], members: Array[Int])

  /** Deterministic coarse quantizer over the fine centroids, built on
    * the driver (k·cc·dim flops — trivial next to one corpus scan).
    * Every arithmetic step is SQL-replayable (the kmeansCtes
    * discipline): seeds are the fine centroids at indices `j·(k/cc)`,
    * assignment dots are 0.0-seeded index-order folds with ties to the
    * lowest cell, per-cell means fold members in ascending fine-index
    * order then round to 6 dp before the renormalize, and empty cells
    * keep their previous centroid.
    */
  private[operators] def buildCoarse(cents: Array[Array[Double]],
                                     probe: Probe): Coarse = {
    val k = cents.length
    val dim = if (k == 0) 0 else cents.head.length
    val ccEff = math.min(probe.cc, k)
    val step = k / ccEff
    var coarse = Array.tabulate(ccEff)(j => cents(j * step).clone())
    def assignAll(): Array[Int] = {
      val out = new Array[Int](k)
      var i = 0
      while (i < k) {
        var best = 0
        var bestD = Double.NegativeInfinity
        var j = 0
        while (j < ccEff) {
          var d = 0.0
          var t = 0
          while (t < dim) { d += cents(i)(t) * coarse(j)(t); t += 1 }
          if (d > bestD) { bestD = d; best = j }
          j += 1
        }
        out(i) = best
        i += 1
      }
      out
    }
    var it = 0
    while (it < probe.cIters) {
      val a = assignAll()
      val next = coarse.map(_.clone())
      var j = 0
      while (j < ccEff) {
        var cnt = 0
        val sum = new Array[Double](dim)
        var i = 0
        while (i < k) {
          if (a(i) == j) {
            cnt += 1
            var t = 0
            while (t < dim) { sum(t) += cents(i)(t); t += 1 }
          }
          i += 1
        }
        if (cnt > 0) {
          var t = 0
          while (t < dim) { sum(t) = round6(sum(t) / cnt); t += 1 }
          next(j) = renorm(sum)
        }
        j += 1
      }
      coarse = next
      it += 1
    }
    val fin = assignAll()
    val byCell = Array.fill(ccEff)(Vector.newBuilder[Int])
    fin.zipWithIndex.foreach { case (c, i) => byCell(c) += i }
    val cells = (0 until ccEff).map(j => (j, byCell(j).result()))
      .filter(_._2.nonEmpty)
    val flatC = new Array[Double](cells.length * dim)
    val cellStart = new Array[Int](cells.length + 1)
    val members = new Array[Int](k)
    var off = 0
    cells.zipWithIndex.foreach { case ((j, ms), p) =>
      System.arraycopy(coarse(j), 0, flatC, p * dim, dim)
      cellStart(p) = off
      ms.foreach { i => members(off) = i; off += 1 }
    }
    cellStart(cells.length) = off
    Coarse(flatC, cellStart, members)
  }

  /** `[cluster, dot]` assignment column — flat scan, or IVF-probed
    * when a [[Probe]] is given (coarse structure rebuilt from the
    * current centroids, so each Lloyd round probes fresh cells).
    */
  private def assignScore(vn: Column, cents: Array[Array[Double]],
                          probe: Option[Probe]): Column = {
    val model = Model(cents)
    probe match {
      case None => Exprs.nearestCentroidScoreD(vn, model.flat, model.dim)
      case Some(p) =>
        val c = buildCoarse(cents, p)
        Exprs.ivfAssignScoreD(vn, model.flat, model.dim,
          c.flat, c.cellStart, c.members, p.nProbe)
    }
  }

  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
          probe: Option[Probe] = None): Model = {
    require(k > 0 && iters >= 0)
    val vn = df.select(col(idCol).as("_id"), Exprs.normalizeD(col(vecCol)).as("_vn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = vn.orderBy(col("_id")).limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
      require(seeds.nonEmpty, "empty input")
      var cents = seeds
      var it = 0
      while (it < iters) {
        val means = vn
          .select(assignScore(col("_vn"), cents, probe)
              .getItem(0).cast("int").as("_c"),
            posexplode(col("_vn")).as(Seq("_d", "_x")))
          .groupBy(col("_c"), col("_d")).agg(avg(col("_x")).as("_m"))
          .collect()
        // empty clusters keep their previous centroid
        val dim = cents.head.length
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
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model,
             probe: Option[Probe] = None): DataFrame =
    df.select(col(idCol),
        assignScore(Exprs.normalizeD(col(vecCol)), model.centroids, probe).as("_a"))
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
  /** EXPLICIT-k SemDeDup. WARNING — a fixed small k is a measured
    * scale-killer: within-cluster candidate pairs densify as (n/k)²,
    * and the k=8 dial costs 155.6 s at 30× where the k∝N dial costs
    * 8.6 s (SCALE.md). Prefer the corpus-scaled overload below (the
    * k = max(16, n/500) dial, IVF-probed assignment past the flat-scan
    * crossover) unless oracle parity pins a specific k.
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iters: Int, minCosine: Double,
                           probe: Option[Probe] = None,
                           maxCandidatePairs: Long = 1L << 30): DataFrame = {
    val model = fit(df, idCol, vecCol, k, iters, probe)
    // cluster and vector in ONE narrow scan — no id re-join
    val withV = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      assignScore(Exprs.normalizeD(col(vecCol)), model.centroids, probe)
        .getItem(0).cast("int").as("cluster"))
    // fixed k densifies quadratically: expected cluster ≈ N/k, so the
    // within-cluster self-join is ~k·C(N/k, 2) = Θ(N²/k) rows BY
    // DEFINITION. Fail fast past the cap (Σ C(cluster, 2), exact —
    // one skinny assignment pass), naming the scale path: the
    // N-adaptive default overload keeps clusters ~500 so the same
    // count stays linear in N. Long.MaxValue skips the gate (how that
    // overload opts out — its bound is by construction).
    Dedup.guardCandidatePairs(withV.groupBy(col("cluster")), maxCandidatePairs,
      twin = "semanticNearDupPairs(df, idCol, vecCol, minCosine) — the " +
        "k∝N scale-safe overload")
    withV.as("a").join(withV.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.cluster").as("cluster"), col("a.id").as("id_a"),
        col("b.id").as("id_b"), Exprs.cosineSim(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Past this k the flat N·k assignment scan dominates the fit and
    * the IVF probe takes over (measured: k=800 at 100× pays 50.2 s
    * flat — 8.1× for 3.3× data — where probing is ~O(√k) per vector).
    */
  val IvfAssignThreshold = 64

  /** SemDeDup with the SCALE-SAFE defaults — the API most callers
    * want: k grows with the corpus (expected cluster size ≈ 500,
    * floor 16) so within-cluster pair cost stays linear, and once
    * k ≥ [[IvfAssignThreshold]] assignment switches to the IVF probe
    * (coarse cells = ⌈√k⌉, 2 coarse Lloyd rounds, 2 probes) so the
    * assignment scan stays ~O(N·√k) instead of O(N·k) = O(N²/500).
    * One `count()` action sizes the dial.
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                           minCosine: Double): DataFrame = {
    val n = df.count()
    val k = math.max(16, (n / 500L).toInt)
    val probe =
      if (k >= IvfAssignThreshold)
        Some(Probe(cc = math.ceil(math.sqrt(k.toDouble)).toInt))
      else None
    // clusters are ~500 by construction → Σ C(cluster,2) ≈ 250·N,
    // linear in N: the quadratic-densification gate does not apply
    // (and would wrongly refuse the intended linear growth past ~4M
    // vectors), so this overload opts out of the counting pass
    semanticNearDupPairs(df, idCol, vecCol, k, iters = 1, minCosine, probe,
      maxCandidatePairs = Long.MaxValue)
  }
}
