package graft.operators

import graft.SparkSpec
import graft.plans.{Exprs, Kernels}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Unit oracles for the JL Rademacher projection (q182): sequential
  * parity of the derived-matrix kernel, linearity, and the
  * distance-preservation property the lemma promises in expectation.
  */
class JlProjectionSpec extends SparkSpec {

  private val seed = 777L
  private val (inDim, outDim) = (64, 16)

  private def seqProject(x: Array[Float]): Array[Double] = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim) { i =>
      var z = 0.0
      for (j <- x.indices) {
        val s = if ((Kernels.mix64(seed + i.toLong * x.length + j) & 1L) == 0L) 1.0 else -1.0
        z += s * x(j).toDouble
      }
      z * scale
    }
  }

  test("kernel equals the sequential derived-matrix projection bit-for-bit") {
    val rnd = new scala.util.Random(1)
    for (_ <- 0 until 5) {
      val x = Array.fill(inDim)(rnd.nextFloat() * 2 - 1)
      val got = Kernels.projectRademacher(
        new GenericArrayData(x), seed, outDim).toDoubleArray()
      assert(got === seqProject(x))
    }
    // empty input stays empty (no phantom zeros)
    assert(Kernels.projectRademacher(
      new GenericArrayData(Array.empty[Float]), seed, outDim)
      .numElements() === 0)
  }

  test("projection is linear: P(a+b) = P(a) + P(b) up to float widening") {
    val rnd = new scala.util.Random(2)
    val a = Array.fill(inDim)(rnd.nextFloat())
    val b = Array.fill(inDim)(rnd.nextFloat())
    val ab = a.zip(b).map { case (x, y) => x + y }
    val pa = seqProject(a); val pb = seqProject(b); val pab = seqProject(ab)
    pa.indices.foreach { i =>
      assert(math.abs(pab(i) - (pa(i) + pb(i))) < 1e-5)
    }
  }

  test("int8 quantization: codes bounded, reconstruction within half-step, checksums exact") {
    val rnd = new scala.util.Random(4)
    for (_ <- 0 until 5) {
      val x = Array.fill(inDim)(rnd.nextFloat() * 4 - 2)
      val st = Kernels.quantizeInt8Stats(new GenericArrayData(x)).toDoubleArray()
      val maxAbs = x.map(v => math.abs(v.toDouble)).max
      val scale = maxAbs / 127.0
      val codes = x.map(v => math.floor(v.toDouble / scale + 0.5))
      assert(st(0) === scale)
      assert(codes.forall(c => math.abs(c) <= 127.0), "codes bounded by construction")
      // reconstruction error per coordinate is at most half a step
      x.zip(codes).foreach { case (v, c) =>
        assert(math.abs(v.toDouble - c * scale) <= scale / 2 + 1e-12)
      }
      assert(st(1) <= (scale / 2) * (scale / 2) + 1e-12, "mse under the half-step bound")
      assert(st(2) === codes.map(c => c * c).sum)
      assert(st(3) === codes.zipWithIndex.map { case (c, j) => c * (j + 1) }.sum)
    }
    // degenerate inputs: all-zero and empty → zero stats
    assert(Kernels.quantizeInt8Stats(
      new GenericArrayData(Array.fill(8)(0.0f))).toDoubleArray().toSeq === Seq(0.0, 0.0, 0.0, 0.0))
    assert(Kernels.quantizeInt8Stats(
      new GenericArrayData(Array.empty[Float])).toDoubleArray().toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("JL property: squared distances concentrate around 1x across random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(inDim)(rnd.nextFloat() * 2 - 1).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val proj = df.select(col("vec_id"),
        Exprs.projectRademacher(col("embedding"), seed, outDim).as("p"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- 0L until 200L by 7L; j <- (i + 1) until 200L by 13L) yield {
      val ro = d2(orig(i), orig(j))
      d2(proj(i), proj(j)) / ro
    }
    val within = ratios.count(r => r > 0.35 && r < 1.65).toDouble / ratios.size
    // ε ≈ sqrt(8 ln n / k) is loose at k=16; the distribution must
    // still center on 1 with the bulk inside the band
    assert(within > 0.85, s"only ${within * 100}%% of pairs inside [0.35, 1.65]")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean must center on 1")
  }
}
