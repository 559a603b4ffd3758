package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: uniform cycle stays uniform (teleport + damping fixed point)") {
    // a 3-cycle with equal weights: every node keeps exactly 1/3 of
    // the mass each round, so rank_micro must be identical across
    // nodes after any number of iterations
    val e = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(e, "src", "dst", "w", iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    assert(r.values.toSet.size == 1, s"cycle ranks diverged: $r")
  }

  test("pageRank: a sink-heavy star ranks the hub above the spokes") {
    // spokes s1..s4 all point at hub h; h points back at s1 only.
    // The hub collects 4 full contributions every round.
    val e = Seq(("s1", "h", 1L), ("s2", "h", 1L), ("s3", "h", 1L),
      ("s4", "h", 1L), ("h", "s1", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(e, "src", "dst", "w", iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("h") > r("s1") && r("s1") > r("s2"),
      s"expected h > s1 > s2 (s1 gets the hub's return edge): $r")
    assert(r("s2") == r("s3") && r("s3") == r("s4"), s"symmetric spokes differ: $r")
  }

  test("pageRank: parallel edges aggregate into weights (2x edge == weight-2 edge)") {
    val dup = Seq(("a", "b", 1L), ("a", "b", 1L), ("b", "a", 1L), ("a", "c", 2L),
      ("c", "a", 1L)).toDF("src", "dst", "w")
    val wtd = Seq(("a", "b", 2L), ("b", "a", 1L), ("a", "c", 2L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val r1 = Graph.pageRank(dup, "src", "dst", "w", iters = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = Graph.pageRank(wtd, "src", "dst", "w", iters = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1 == r2, s"parallel-edge aggregation mismatch: $r1 vs $r2")
  }

  test("pageRank: driver fast path equals the distributed rounds bit-for-bit") {
    // an asymmetric weighted graph where every arithmetic step
    // (truncated long division, 0.85 multiply, half-up round) is
    // exercised; driverEdgeLimit = 0 forces the distributed path
    val e = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
      ("a", "c", 1L), ("c", "b", 5L), ("d", "a", 7L))
      .toDF("src", "dst", "w")
    val fast = Graph.pageRank(e, "src", "dst", "w", iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val dist = Graph.pageRank(e, "src", "dst", "w", iters = 4, driverEdgeLimit = 0)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(fast == dist, s"adaptive paths diverged: $fast vs $dist")
  }

  test("pageRank: dangling node keeps only teleport mass") {
    // b has no out-edges; its damped mass evaporates (simplified
    // formulation) but teleport keeps every rank >= 0.15/N
    val e = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(e, "src", "dst", "w", iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val teleport = 150000000000L / 2 / 1e6
    assert(math.abs(r("a") - teleport) < 1e-6,
      s"a receives nothing, so rank(a) == teleport: $r")
    assert(r("b") > r("a"), s"b collects a's contribution: $r")
  }

  test("triangle degree gate trips on a hub wider than maxDegree, with the split recipe") {
    // suites sharing this session may hold contract-kept caches (q14
    // rank structures); clear first so isEmpty reads OUR leftovers
    spark.catalog.clearCache()
    val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Graph.triangleParticipation(star, "a", "b", maxDegree = 10)
    }
    assert(e.getMessage.contains("explode+join"), "the failure must name the recipe")
    assert(spark.sharedState.cacheManager.isEmpty,
      "a tripped gate must unpersist the adjacency before rethrowing")
    // the same graph passes with the gate above its hub degree
    assert(Graph.triangleParticipation(star, "a", "b", maxDegree = 50).count() === 0L)
  }

  test("triangle gate reads per-role width: a symmetric-role graph is not double-counted") {
    // path 0-1-2: vertex 1 has total degree 2 but its widest adjacency
    // ROW is 1 in each role (out-neighbors {2}, in-neighbors {0}) —
    // the gate must pass at maxDegree = 1, which the old in+out sum
    // would have tripped at 2
    val path = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    assert(Graph.triangleParticipation(path, "a", "b", maxDegree = 1).count() === 0L)
  }

  test("triangleParticipationSplit matches the in-row operator on a hub graph that trips the gate") {
    spark.catalog.clearCache()
    // K4 low clique (0..3), two hubs (100, 101) each wired to the
    // clique plus 20 private leaves, and a hub-hub edge: hub degree 25
    // vs low degree <= 5. Expected triangles: C(4,3)=4 all-low, one
    // per K4 edge through each hub (6+6 single-hub), and (i,100,101)
    // for each clique vertex (4 double-hub).
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val hubEdges = (0L to 3L).flatMap(i => Seq((i, 100L), (i, 101L))) ++
      (10L to 29L).map(l => (l, 100L)) ++ (30L to 49L).map(l => (l, 101L)) :+
      (100L, 101L)
    val edges = (k4 ++ hubEdges).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graph.triangleParticipation(edges, "a", "b", maxDegree = 5)
    }
    val split = Graph.triangleParticipationSplit(edges, "a", "b", degreeThreshold = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graph.triangleParticipation(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split === full, s"split diverged from the in-row operator: $split vs $full")
    // spot-check the closed-form counts: each clique vertex is in 3
    // all-low + 3+3 single-hub + 1 double-hub = 10; each hub in 6
    // single-hub + 4 double-hub = 10
    assert(split(0L) === 10L && split(100L) === 10L && split(101L) === 10L,
      s"closed-form triangle counts off: $split")
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangleParticipationSplit must release its classed-edge and adjacency caches")
  }

  test("triangleParticipationSplit handles all-low and all-hub degenerate classings") {
    val k4 = (for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)).toDF("a", "b")
    // threshold above every degree: pure in-row path
    val allLow = Graph.triangleParticipationSplit(k4, "a", "b", degreeThreshold = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold 0: every vertex is a hub, pure wedge-join path
    val allHub = Graph.triangleParticipationSplit(k4, "a", "b", degreeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L to 3L).map(_ -> 3L).toMap // K4: each vertex in C(3,2)=3 triangles
    assert(allLow === want, s"all-low path wrong: $allLow")
    assert(allHub === want, s"all-hub path wrong: $allHub")
  }
}
