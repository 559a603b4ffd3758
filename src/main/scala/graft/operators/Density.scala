package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering — the companion to [[KMeans]] for cluster
  * shapes a centroid model can't express (crawl-quality point clouds,
  * embedding projections with noise points that should NOT be forced
  * into a cluster).
  */
object Density {

  /** Planar DBSCAN. Neighborhoods come from
    * [[SpatialJoin.radiusJoin]]'s grid-cell join (one shuffle on the
    * cell key, 3×3 replication of one side — never an all-pairs
    * stage); the ε-graph over CORE points collapses with
    * [[Dedup.connectedComponents]] (skinny (id, label) rounds /
    * driver union-find below its bounded cutover). Border points take
    * the MINIMUM neighbouring core's cluster — deterministic, unlike
    * the classic arrival-order assignment — and noise keeps
    * cluster −1.
    *
    * Cluster ids are the minimum core id of each component, so the
    * whole labelling is engine-reproducible (the DuckDB oracle
    * re-derives it with a brute-force ε-join + recursive closure).
    *
    * The pair frame is persisted: it feeds degrees, the core edge
    * list, and border assignment — left lazy those three consumers
    * would each replay the grid join. The skinny per-point labelling
    * (id, is_core, cluster) is materialized eagerly so the operator
    * releases the ε-graph cache itself instead of leaking a
    * corpus-scale frame to the caller.
    */
  def dbscan(df: DataFrame, idCol: String, xCol: String, yCol: String,
             eps: Double, minPts: Int): DataFrame = {
    require(minPts >= 2)
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val pairs = SpatialJoin.radiusJoin(
        pts.select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya")),
        "xa", "ya",
        pts.select(col("id").as("ib"), col("x").as("xb"), col("y").as("yb")),
        "xb", "yb", eps)
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = pairs.groupBy(col("ia").as("id")).agg(count(lit(1)).as("_nb"))
      .filter(col("_nb") + 1 >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("ia")), "ia")
      .join(core.select(col("id").as("ib")), "ib")
      .select(col("ia"), col("ib"))
    val cc = Dedup.connectedComponents(coreEdges, "ia", "ib")
      .select(col("id"), col("component"))
    // cores with no core neighbour are their own singleton cluster
    val coreClusters = core.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val border = pairs
      .join(coreClusters.select(col("id").as("ib"), col("cluster")), "ib")
      .join(core.select(col("id").as("ia")), Seq("ia"), "left_anti")
      .groupBy(col("ia").as("id")).agg(min(col("cluster")).as("_bc"))
    val out = Ckpt.truncate(pts.select(col("id"))
      .join(coreClusters.withColumn("_isc", lit(true)), Seq("id"), "left")
      .join(border, Seq("id"), "left")
      .select(col("id"), coalesce(col("_isc"), lit(false)).as("is_core"),
        coalesce(col("cluster"), col("_bc"), lit(-1L)).as("cluster")))
    pairs.unpersist(blocking = false)
    out
  }
}
