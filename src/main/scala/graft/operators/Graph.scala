package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge DataFrames.
  *
  * The reference pipeline has no graph workloads (its only "graph" is
  * the dedup cluster merge, see [[Dedup.connectedComponents]]); this
  * operator covers the link-analysis slot a training-data curation
  * stack needs — e.g. ranking crawl domains by weighted link mass
  * before sampling.
  */
object Graph {

  /** Weighted PageRank with `iters` unrolled synchronous rounds,
    * damping 0.85.
    *
    * Determinism contract (DuckDB-oracle parity): ranks live as longs
    * in 1e-12 units of total mass. Per-edge contributions are integer
    * truncated divisions `rank * w div wout` (exact, order-free to
    * sum); the damping step is the single floating-point operation per
    * round — `0.85 * (sum of longs < 2^53)` is one IEEE-754 multiply
    * with an identical result in any engine, and `round` half-away-
    * from-zero agrees between Spark and DuckDB for positive values.
    * Nodes with no out-edges leak their damped mass (the standard
    * simplified formulation, e.g. GraphX's static PageRank); teleport
    * keeps every node's rank positive.
    *
    * Scale shape: one shuffle to aggregate parallel edges, one to
    * build out-degrees, then per round an edges⋈ranks shuffle join on
    * `src` plus a groupBy(dst) — the canonical distributed PageRank
    * plan. `edges` is persisted so the (possibly expensive) upstream
    * edge derivation runs once; the node count is one up-front job
    * (it doubles as the action that populates the caches). Rounds
    * stay LAZY by default — for small `iters` a single fused action
    * beats one eager job per round (measured ~2× on the 625-edge
    * nation graph, where per-job codegen dominates). For deep
    * iteration counts set `checkpointEvery` to bound lineage depth
    * and AQE re-planning cost (the [[Dedup.connectedComponents]]
    * pattern).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int, checkpointEvery: Int = 0,
               driverEdgeLimit: Long = 1L << 19): DataFrame = {
    val e = edges
      .groupBy(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .agg(sum(col(wCol).cast("long")).as("_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ADAPTIVE (the [[Dedup.connectedComponents]] contract): after
    // parallel-edge aggregation |E| is bounded by the KEY space, not
    // the data scale — q128's nation graph is ≤ 25² rows no matter how
    // many lineitems derived it. Below the bounded threshold the rank
    // loop runs on the driver with the exact same integer arithmetic
    // (truncated long division per contribution, one 0.85 double
    // multiply + half-up round per node per round), skipping
    // `iters` join+groupBy stages whose cost at that size is pure
    // job-scheduling + codegen overhead (measured q128 7.1 s -> 3.8 s
    // cold at sf0.1). Large aggregated graphs (web-domain scale) take
    // the distributed path below.
    val eCnt = e.count()
    if (eCnt <= driverEdgeLimit) {
      val rows = e.collect()
      val nodeSeq = collection.mutable.LinkedHashSet.empty[Any]
      rows.foreach { r => nodeSeq += r.get(0); nodeSeq += r.get(1) }
      val n = nodeSeq.size.toLong
      val wout = collection.mutable.HashMap.empty[Any, Long]
      rows.foreach(r => wout.updateWith(r.get(0))(p => Some(p.getOrElse(0L) + r.getLong(2))))
      var rank = collection.mutable.HashMap.from(nodeSeq.iterator.map(_ -> 1000000000000L / n))
      val teleport = 150000000000L / n
      for (_ <- 1 to iters) {
        val s = collection.mutable.HashMap.empty[Any, Long]
        rows.foreach { r =>
          val c = rank(r.get(0)) * r.getLong(2) / wout(r.get(0))
          s.updateWith(r.get(1))(p => Some(p.getOrElse(0L) + c))
        }
        rank = collection.mutable.HashMap.from(nodeSeq.iterator.map(v =>
          v -> (teleport + math.round(s.getOrElse(v, 0L).toDouble * 0.85))))
      }
      val spark = edges.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", e.schema("_src").dataType),
        org.apache.spark.sql.types.StructField("rank_micro",
          org.apache.spark.sql.types.DoubleType)))
      val out = nodeSeq.iterator.map(v =>
        org.apache.spark.sql.Row(v, rank(v).toDouble / 1e6)).toSeq
      e.unpersist()
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), schema)
    }
    val nodes = e.select(col("_src").as("_n"))
      .union(e.select(col("_dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outw = e.groupBy(col("_src")).agg(sum(col("_w")).as("_wout"))
    val nCount = nodes.count()

    var rank = nodes.select(col("_n"), lit(1000000000000L / nCount).as("_r"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(rank, e("_src") === rank("_n"))
        .join(outw, "_src")
        .select(col("_dst"), expr("(_r * _w) div _wout").as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_s"))
      rank = nodes
        .join(contrib, col("_n") === col("_dst"), "left")
        .select(col("_n"),
          (lit(150000000000L / nCount) +
            coalesce(round(col("_s").cast("double") * lit(0.85)), lit(0.0))
              .cast("long")).as("_r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        rank = Ckpt.truncate(rank)
    }
    // node-bounded result: materialize eagerly and release the edge/
    // node caches (the driver branch already cleans up after itself)
    val out = Ckpt.truncate(rank.select(col("_n").as("node"),
      (col("_r").cast("double") / 1e6).as("rank_micro")))
    e.unpersist(blocking = false); nodes.unpersist(blocking = false)
    out
  }

  /** Synchronous label propagation (community detection): every node
    * starts in its own community (label = node id); each round every
    * node adopts the label with the largest total incident edge weight
    * among its neighbours, ties broken toward the SMALLEST label.
    * Fixed `iters` rounds — deterministic, unlike the usual
    * random-order asynchronous LPA.
    *
    * The graph is symmetrized (edges counted in both directions, self
    * loops dropped) and parallel edges weight-summed first — like
    * [[pageRank]], |E| is then bounded by the key space, so the same
    * adaptive cutover applies: bounded graphs run the rounds on the
    * driver with identical integer/compare semantics; large graphs take
    * the distributed loop — per round one edges⋈labels shuffle join on
    * the src plus a (dst, label) partial-agg groupBy whose argmax
    * reduces map-side (state = one best-candidate row per dst per
    * partial — a hot node's vote list never materializes).
    *
    * Tie-break ordering on labels is BINARY string/numeric comparison
    * in both engines (no collation), so rounds are engine-replayable.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int,
                       driverEdgeLimit: Long = 1L << 19): DataFrame = {
    // aggregate BEFORE symmetrizing: the union's two branches would
    // otherwise each re-run the (possibly expensive) upstream edge
    // derivation — post-aggregation the frame is key-space-bounded, so
    // the reversed copy unions two small cached reads instead
    val dir = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"), col(wCol).cast("long").as("_w"))
      .groupBy(col("_s"), col("_d")).agg(sum(col("_w")).as("_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = dir.union(dir.select(col("_d").as("_s"), col("_s").as("_d"), col("_w")))
      .groupBy(col("_s"), col("_d")).agg(sum(col("_w")).as("_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eCnt = e.count()
    if (eCnt <= driverEdgeLimit) {
      val rows = e.collect()
      implicit val anyOrd: Ordering[Any] = new Ordering[Any] {
        def compare(a: Any, b: Any): Int = (a, b) match {
          case (x: String, y: String) => x.compareTo(y)
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
          case _ => a.toString.compareTo(b.toString)
        }
      }
      val nodes = collection.mutable.LinkedHashSet.empty[Any]
      rows.foreach { r => nodes += r.get(0); nodes += r.get(1) }
      var label = collection.mutable.HashMap.from(nodes.iterator.map(v => v -> v))
      for (_ <- 1 to iters) {
        val votes = collection.mutable.HashMap.empty[Any, collection.mutable.HashMap[Any, Long]]
        rows.foreach { r =>
          val m = votes.getOrElseUpdate(r.get(1), collection.mutable.HashMap.empty)
          val l = label(r.get(0))
          m.update(l, m.getOrElse(l, 0L) + r.getLong(2))
        }
        label = collection.mutable.HashMap.from(nodes.iterator.map { v =>
          votes.get(v) match {
            case Some(m) =>
              v -> m.toSeq.minBy { case (l, w) => (-w, l) }(
                Ordering.Tuple2(Ordering.Long, anyOrd))._1
            case None => v -> label(v)
          }
        })
      }
      val spark = edges.sparkSession
      val dt = e.schema("_s").dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", dt),
        org.apache.spark.sql.types.StructField("label", dt)))
      val out = nodes.iterator.map(v => org.apache.spark.sql.Row(v, label(v))).toSeq
      e.unpersist(); dir.unpersist()
      return spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
    }
    val nodes = e.select(col("_s").as("_n")).union(e.select(col("_d"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = nodes.select(col("_n"), col("_n").as("_l"))
    for (i <- 1 to iters) {
      val votes = e.join(lab, e("_s") === lab("_n"))
        .groupBy(col("_d"), col("_l")).agg(sum(col("_w")).as("_vw"))
        // min over (−w, label): max weight, then smallest label — the
        // vote key is unique per (_d, _l) row, so min_by is stable
        .groupBy(col("_d"))
        .agg(min_by(col("_l"), struct(-col("_vw"), col("_l"))).as("_nl"))
      lab = nodes.join(votes, col("_n") === col("_d"), "left")
        .select(col("_n"), coalesce(col("_nl"), col("_n")).as("_l"))
      if (i % 4 == 0 && i < iters) lab = Ckpt.truncate(lab)
    }
    // node-bounded result: materialize eagerly and release the caches
    // (the driver branch already cleans up after itself)
    val out = Ckpt.truncate(
      lab.select(col("_n").as("node"), col("_l").as("label")))
    e.unpersist(blocking = false); dir.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** Per-node triangle participation counts over an undirected graph
    * given as ordered edges (one row per edge, `aCol < bCol`).
    *
    * Compact-forward shape: with ordered edges and higher-neighbor
    * adjacency lists, triangle x<y<z is found exactly once at its
    * BOTTOM edge (x,y) as z ∈ adj⁺(x)∩adj⁺(y) — crediting x and y with
    * the intersection size. The max-role credit needs no per-triangle
    * explode either: the same triangle has exactly one TOP edge (y,z),
    * where x ∈ adjLow(y)∩adjLow(z) — so |adjLow(y)∩adjLow(z)| credited
    * to z counts every triangle z closes. Both intersections are
    * in-row sorted-merge probes against adjacency maps; the credit
    * stream is exactly 2 rows per edge, so credit volume scales with
    * |E|, not the (cubically exploding) triangle count.
    *
    * The adjacency side is BROADCAST only below `broadcastEdgeLimit`
    * total edges (the payload is O(|E|) list entries — data-scale, not
    * key-space-bounded like [[pageRank]]'s aggregated graphs): a
    * forced hint on a web-corpus graph is a driver OOM where the
    * unhinted sort-merge join below the limit's else-branch degrades
    * gracefully (AQE still converts to broadcast at runtime when the
    * built side turns out small). The |E| count is one job against the
    * persisted adjacency — the action that populates the cache anyway.
    *
    * Returns `(v, n_triangles)` for every node with ≥1 triangle,
    * materialized eagerly (node-bounded) so the operator releases its
    * own adjacency cache instead of leaking it to the caller.
    *
    * **Power-law hub caveat — the `maxDegree` gate.** The adjacency is
    * one `collect_list` row per node, so a degree-d hub is a single
    * d-element array row (~8d bytes): a 10⁷-degree web/social hub is an
    * 80 MB row that a task must hold (and the broadcast path would
    * replicate). The gate measures the max PER-ROLE degree (the widest
    * actual adj/adjLo row — max(out, in), not their sum) in the same
    * pre-join pass that sizes the broadcast decision and fails
    * loudly — an executor OOM mid-join names nothing. When a real
    * corpus trips it, use [[triangleParticipationSplit]]: the same
    * result via the standard high-degree split, with hub-incident
    * triangles routed through shuffle joins that never build a wide
    * row. A tripped gate also unpersists the adjacency cache before
    * rethrowing, so the split re-run doesn't compete with a stranded
    * corpus-scale cache.
    */
  def triangleParticipation(edges: DataFrame, aCol: String, bCol: String,
                            broadcastEdgeLimit: Long = 1L << 22,
                            maxDegree: Long = 1L << 22): DataFrame = {
    val (result, caches, _) =
      triangleParticipationPlan(edges, aCol, bCol, broadcastEdgeLimit, maxDegree)
    val out = Ckpt.truncate(result)
    caches.foreach(_.unpersist(blocking = false))
    out
  }

  /** The lazy plan + its persisted intermediates + whether the gate
    * chose broadcast, for plan-shape tests. */
  private[graft] def triangleParticipationPlan(
      edges: DataFrame, aCol: String, bCol: String,
      broadcastEdgeLimit: Long,
      maxDegree: Long = 1L << 22): (DataFrame, Seq[DataFrame], Boolean) = {
    // the adjacency IS the edge set: persisting the |V|-row lists makes
    // the (possibly expensive) upstream edge derivation run exactly
    // once — the probe stream is re-exploded from the cached lists and
    // the join sides read them too. Lists SORTED at build: both role
    // intersections run through the sorted-merge count kernel (no
    // per-row hash set).
    val adj = edges
      .groupBy(col(aCol).cast("long").as("a"))
      .agg(sort_array(collect_list(col(bCol).cast("long"))).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val probe = adj.select(col("a").as("ea"), explode(col("nbrs")).as("eb"))
    val adjLo = probe.groupBy(col("eb").as("lb"))
      .agg(sort_array(collect_list(col("ea"))).as("lnbrs"))
    // one pre-join pass over the cached adjacency sizes BOTH gates: the
    // edge count for the broadcast decision and the max PER-ROLE degree
    // for the row-width gate — adj rows are out-degree-wide and adjLo
    // rows in-degree-wide, so the widest actual row is max(out, in),
    // NOT their sum (on a symmetrized edge list the summed gate would
    // trip at half the configured bound). Grouping by (role, v) keeps
    // sum(d) = 2|E| for the broadcast decision while max(d) reads the
    // true widest list. Map-side combine bounds the shuffle at 2|V|.
    // The stats action is the first job against the freshly-persisted
    // adjacency: if it fails, or the gate trips, unpersist before
    // rethrowing — the documented recovery is to catch and re-run on a
    // degree-split graph, which must not compete with a stranded
    // corpus-scale MEMORY_AND_DISK cache.
    val stats = try {
      val st = probe.select(explode(array(
          struct(lit(0).as("r"), col("ea").as("v")),
          struct(lit(1).as("r"), col("eb").as("v")))).as("e"))
        .groupBy(col("e.r"), col("e.v")).agg(count(lit(1)).as("d"))
        .agg(coalesce(sum(col("d")), lit(0L)).cast("long").as("e2"),
          coalesce(max(col("d")), lit(0L)).cast("long").as("dmax"))
        .head()
      require(st.getLong(1) <= maxDegree,
        s"max vertex degree ${st.getLong(1)} exceeds maxDegree=$maxDegree: " +
          "a hub adjacency row this wide risks an executor OOM in the " +
          "in-row merge. Split the graph on degree and route hub-incident " +
          "edges through an explode+join count — see " +
          "triangleParticipationSplit, which does exactly that — or " +
          "raise maxDegree deliberately.")
      st
    } catch { case e: Throwable =>
      adj.unpersist(blocking = false); throw e
    }
    val useBroadcast = stats.getLong(0) / 2 <= broadcastEdgeLimit
    def side(df: DataFrame): DataFrame = if (useBroadcast) broadcast(df) else df
    val result = probe
      .join(side(adj).as("ax"), col("ea") === col("ax.a"))
      .join(side(adj).as("ay"), col("eb") === col("ay.a"), "left")
      .join(side(adjLo).as("lx"), col("ea") === col("lx.lb"), "left")
      .join(side(adjLo).as("ly"), col("eb") === col("ly.lb"))
      .select(col("ea").as("x"), col("eb").as("y"),
        coalesce(graft.plans.Exprs.sortedIntersectCount(col("ax.nbrs"), col("ay.nbrs")), lit(0))
          .cast("long").as("hi"),
        coalesce(graft.plans.Exprs.sortedIntersectCount(col("lx.lnbrs"), col("ly.lnbrs")), lit(0))
          .cast("long").as("lo"))
      .select(explode(array(
        struct(col("x").as("v"), col("hi").as("w")),
        struct(col("y").as("v"), (col("hi") + col("lo")).as("w")))).as("e"))
      .groupBy(col("e.v").as("v"))
      .agg(sum(col("e.w")).as("n_triangles"))
      .filter(col("n_triangles") > 0)
    (result, Seq(adj), useBroadcast)
  }

  /** [[triangleParticipation]] for power-law graphs: identical result
    * (`(v, n_triangles)`, nodes with ≥1 triangle), but hubs above
    * `degreeThreshold` never materialize an adjacency row, so the
    * width gate that aborts the in-row operator cannot trip here.
    *
    * The standard high-degree split. Vertices are classed low/hub by
    * TOTAL degree (one groupBy over both endpoint roles); triangles
    * split by their class profile:
    *
    *  - **All-low triangles** have all three edges inside the low
    *    subgraph (`both endpoints low`), so the in-row compact-forward
    *    operator handles them — its adjacency rows are ≤ threshold
    *    wide BY CONSTRUCTION, no gate needed.
    *  - **Hub-incident triangles** (≥1 hub vertex) are enumerated by
    *    the two-join wedge plan under the degree-aware total order
    *    `ord(v) = (isHub(v), v)` — every edge oriented ≺-upward, each
    *    triangle found exactly once at its ≺-minimum vertex, and a
    *    triangle contains a hub iff its ≺-MAXIMUM endpoint is a hub
    *    (hubs sort last), so the wedge build keeps only pairs whose
    *    larger leg lands on a hub. Wedge volume is Σ_x dH⁺(x)·d⁺(x)
    *    bounded by |E| · #hubs, and #hubs ≤ 2|E|/D by definition —
    *    the join pass stays narrow precisely because hubs are rare.
    *    Everything is equi-join + groupBy: shuffle-bound, no
    *    `collect_list`, no wide rows anywhere on the hub path.
    *
    * The two credit streams union and re-aggregate; both subplans read
    * the one persisted classed-edge frame, released before return.
    * Input contract matches [[triangleParticipation]]: one row per
    * undirected edge with `aCol < bCol`.
    */
  def triangleParticipationSplit(edges: DataFrame, aCol: String, bCol: String,
                                 degreeThreshold: Long = 1L << 12,
                                 broadcastEdgeLimit: Long = 1L << 22): DataFrame = {
    val e0 = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    val deg = e0.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .select(col("v"), (col("d") > degreeThreshold).as("hub"))
    // class both endpoints in one pass and persist: every downstream
    // subplan (low subgraph, wedge build, wedge close) reads this
    // frame, and the upstream edge derivation may be expensive. The
    // degree frame is |V|-bounded and map-side combined; at web scale
    // both joins shuffle on the vertex key — no broadcast assumption.
    val classed = e0
      .join(deg.select(col("v").as("a"), col("hub").as("ah")), "a")
      .join(deg.select(col("v").as("b"), col("hub").as("bh")), "b")
      .select(col("a"), col("b"), col("ah"), col("bh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lowPart = {
      val (res, caches, _) = triangleParticipationPlan(
        classed.filter(!col("ah") && !col("bh")).select(col("a"), col("b")),
        "a", "b", broadcastEdgeLimit, maxDegree = degreeThreshold.max(1L))
      (res, caches)
    }
    // orient ≺-upward under ord(v) = (hub, v): input rows have a < b,
    // so only a hub/low mismatch flips an edge (hub `a` sorts after
    // low `b`). Carry both endpoint classes for the wedge filter.
    val oriented = classed.select(
      when(col("ah") && !col("bh"), col("b")).otherwise(col("a")).as("src"),
      when(col("ah") && !col("bh"), col("a")).otherwise(col("b")).as("dst"),
      when(col("ah") && !col("bh"), col("ah")).otherwise(col("bh")).as("dh"))
    // wedges at the ≺-minimum vertex whose LARGER leg is a hub: the
    // triangle's ≺-max endpoint decides hub membership, so this is
    // exactly the ≥1-hub triangle set, each once. The close join is
    // oriented y→z by construction (ord(y) < ord(z)).
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e2.dh") &&
          (!col("e1.dh") || col("e1.dst") < col("e2.dst")))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    val hubTris = wedges
      .join(oriented.as("c"), col("y") === col("c.src") && col("z") === col("c.dst"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
    val result = lowPart._1.unionByName(hubTris)
      .groupBy(col("v")).agg(sum(col("n_triangles")).as("n_triangles"))
      .filter(col("n_triangles") > 0)
    val out = Ckpt.truncate(result)
    (classed +: lowPart._2).foreach(_.unpersist(blocking = false))
    out
  }
}
