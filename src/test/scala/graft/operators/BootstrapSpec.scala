package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.{Exprs, Kernels}

class BootstrapSpec extends SparkSpec {

  import spark.implicits._

  test("replicaMeans equals the exploded multiplier-bootstrap formulation bit-for-bit") {
    val df = (1L to 500L).map(k => (k, k * 37L % 9973L)).toDF("key", "cents")

    val viaAgg = df
      .agg(Bootstrap.replicaMeans(col("key"), col("cents"), 16).as("ms"))
      .select(posexplode(col("ms")).as(Seq("r", "m")))
      .orderBy("r").as[(Int, Double)].collect()

    val repArr = transform(
      sequence(lit(0L), lit(15L)),
      r => struct(r.as("r"),
        Exprs.mix64(col("key") * lit(16L) + r).bitwiseAND(lit(3L)).as("h")))
    val viaExplode = df
      .select(explode(repArr).as("e"), col("cents"))
      .select(col("e.r").as("r"),
        expr("CASE WHEN e.h = 0 THEN 2 WHEN e.h = 3 THEN 0 ELSE 1 END").as("w"),
        col("cents"))
      .groupBy(col("r"))
      .agg((sum(col("w") * col("cents")).cast("double") /
        sum(col("w")).cast("double")).as("m"))
      .orderBy("r").as[(Long, Double)].collect()

    assert(viaAgg.length == 16 && viaExplode.length == 16)
    viaAgg.zip(viaExplode).foreach { case ((ra, ma), (re, me)) =>
      assert(ra.toLong == re)
      // exact same long/long division -> identical IEEE doubles
      assert(java.lang.Double.doubleToLongBits(ma) ==
        java.lang.Double.doubleToLongBits(me), s"replica $ra: $ma != $me")
    }
  }

  test("replica weights are mean-1 multipliers in {0,1,2} from mix64") {
    // spot-check the weight mapping against Kernels.mix64 directly
    val key = 42L
    val viaAgg = Seq((key, 100L)).toDF("key", "cents")
      .agg(Bootstrap.replicaMeans(col("key"), col("cents"), 8).as("ms"))
      .select(posexplode(col("ms")).as(Seq("r", "m")))
      .as[(Int, Double)].collect().toMap
    (0 until 8).foreach { r =>
      val h = Kernels.mix64(key * 8 + r) & 3L
      val w = if (h == 0L) 2L else if (h == 3L) 0L else 1L
      val expected = if (w == 0L) Double.NaN else 100.0
      val got = viaAgg(r)
      assert((expected.isNaN && got.isNaN) || expected == got,
        s"replica $r: weight $w, mean $got")
    }
  }
}
