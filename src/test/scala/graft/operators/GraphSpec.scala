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
    val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Graph.triangleParticipation(star, "a", "b", maxDegree = 10)
    }
    assert(e.getMessage.contains("explode+join"), "the failure must name the recipe")
    // the same graph passes with the gate above its hub degree
    assert(Graph.triangleParticipation(star, "a", "b", maxDegree = 50).count() === 0L)
  }
}
