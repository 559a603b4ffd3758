package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join evidence on REAL (fabricated) skew — closing the one
  * "still an extrapolation" item that IS measurable on one machine
  * (SCALE.md "What this does and does not establish": AQE skew
  * splitting on real skew).
  *
  * The harness remaps a deterministic `hotPct`% of lineitem's
  * l_partkey values to ONE hot key, then runs the same
  * join+aggregation three ways and proves them value-identical
  * (digest compare) before timing:
  *
  *   aqe_off  — sort-merge join, AQE skew split disabled: the hot
  *              key collapses onto one reducer (the failure mode).
  *   aqe_on   — AQE skew split enabled: the hot partition is split
  *              at runtime; the final plan is asserted to carry
  *              `skew=true`, i.e. the split REALLY fired, this is
  *              not a vacuous toggle.
  *   salted   — [[SkewJoin.saltedEquiJoin]] (explicit salting, the
  *              tool for pathological keys AQE can't know about).
  *
  * Broadcast is disabled throughout (part would otherwise broadcast
  * at any test SF and no skew path would execute at all). The AQE
  * skew thresholds are set to the production DEFAULTS scaled by the
  * local-vs-cluster volume ratio (256 MB/64 MB advisory → 32 MB/8 MB)
  * so the same code path triggers at test volume; whether the
  * UNSCALED defaults would also fire is reported per run
  * (hot-partition shuffle bytes vs 256 MB).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABSkewJoin /tmp/sf100x 30 32"
  * (args: sfDir [hotPct=30] [saltBuckets=32]; best-of-SPARK_GRAFT_RUNS)
  */
object ABSkewJoin {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 30
    val buckets = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // production defaults 256 MB / 64 MB, scaled ~8x down to local volume
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "33554432")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8388608")

    // deterministic hot-key remap: hotPct% of rows -> l_partkey 1
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("l_partkey",
        when(pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(100L)) < hotPct,
          lit(1L)).otherwise(col("l_partkey")))
    val pt = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))

    def plain(): DataFrame =
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).cast("double").as("qty"),
          count(lit(1)).as("n"))
    def salted(): DataFrame =
      SkewJoin.saltedEquiJoin(li,
          pt.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", buckets)
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).cast("double").as("qty"),
          count(lit(1)).as("n"))

    // order-independent integer digest: a double sum's value depends on
    // the row order the plan produces, so SMJ/AQE/salted plans could
    // flag a spurious divergence on large per-brand sums (r18 advisor;
    // same lesson ABZorderLayout learned the hard way). l_quantity has
    // <= 2dp, so round(qty*100) is exact in long.
    def digest(df: DataFrame) =
      df.agg(count(lit(1)), sum(xxhash64(col("p_brand"))),
        sum(round(col("qty") * 100).cast("long")), sum(col("n"))).head()

    def setSkew(on: Boolean): Unit =
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)

    // value identity across all three paths, before any timing
    setSkew(false); val dOff = digest(plain())
    setSkew(true); val dOn = digest(plain())
    val dSalt = digest(salted())
    require(dOff == dOn && dOn == dSalt,
      s"paths diverge: off=$dOff on=$dOn salted=$dSalt")

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    def time(f: () => DataFrame): Double =
      (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    setSkew(false); val tOff = time(() => plain())
    setSkew(true); val tOn = time(() => plain())
    val tSalt = time(() => salted())

    // prove the split actually fired: after an action on the SAME
    // Dataset (a noop write would build its OWN QueryExecution and
    // leave this one un-finalized, isFinalPlan=false), the adaptive
    // final plan marks the SMJ `skew=true` / the shuffle read
    // `skewed` only when runtime splitting happened. The result is
    // |brands| rows — collect is safe.
    setSkew(true)
    def splitFires(): Boolean = {
      val probe = plain()
      probe.collect()
      val planStr = probe.queryExecution.executedPlan.toString
      planStr.contains("skew=true") || planStr.contains("skewed")
    }
    val skewFired = splitFires()
    // ... and whether the UNSCALED production defaults (256 MB / 64 MB)
    // would have fired at this corpus volume
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val skewFiredDefault = splitFires()

    // hot-partition shuffle volume, to report whether the UNSCALED
    // 256 MB default would also have fired at this corpus
    val hotRows = li.filter(col("l_partkey") === 1L).count()
    println(s"""{"sf":"$sfDir","hot_pct":$hotPct,"hot_rows":$hotRows,"buckets":$buckets,"aqe_skew_off_sec":${math.rint(tOff * 1000) / 1000},"aqe_skew_on_sec":${math.rint(tOn * 1000) / 1000},"salted_sec":${math.rint(tSalt * 1000) / 1000},"skew_split_fired":$skewFired,"skew_split_fired_default_thresholds":$skewFiredDefault,"digests_identical":true,"runs":$runs}""")
    spark.stop()
  }
}
