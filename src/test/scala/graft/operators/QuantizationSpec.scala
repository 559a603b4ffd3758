package graft.operators

import graft.SparkSpec
import graft.plans.Kernels
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Unit oracle for the int8 quantization audit kernel (q182). */
class QuantizationSpec extends SparkSpec {

  test("int8 quantization: codes bounded, reconstruction within half-step, checksums exact") {
    val rnd = new scala.util.Random(4)
    for (_ <- 0 until 5) {
      val x = Array.fill(64)(rnd.nextFloat() * 4 - 2)
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
}
