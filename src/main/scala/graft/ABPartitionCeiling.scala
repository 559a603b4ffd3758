package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The TB-partition proxy (r18 verdict #6) — prices the one local
  * regime the r18 skew work left unexercised: a DELIBERATE multi-GB
  * SINGLE shuffle partition, built by remapping `hotPct`% of
  * lineitem's join keys at a scaled corpus onto one key and padding
  * each row with a `padWidth`-byte deterministic payload so the hot
  * partition's shuffle volume can be dialed past the gigabyte mark —
  * then run with AQE skew splitting OFF (the partition lands on ONE
  * reducer, the cluster failure mode this file's skew section proves
  * AQE avoids) vs ON, digest-proved identical, with a task-level
  * listener recording the LARGEST single-task shuffle read so the
  * "one partition carried N GB" claim is a measured number, not an
  * inference from hotPct.
  *
  * What "breaks" is part of the record: Spark's sort-based shuffle
  * has no 2 GB partition limit since 2.4 — the expected local outcome
  * is completion-with-spill at growing wall (the single reducer's
  * external sort), and the artifact names the largest partition that
  * COMPLETED, its spill, and the AQE-split speedup at the same
  * volume. A true TB partition stays cluster-only; this bounds the
  * regime an 8 g/32-slot box can carry.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABPartitionCeiling
  *        /tmp/sf100x 90 <padWidth> [skipOff]"
  * (one JSON line per run; committed under ab/ as the r19 artifact)
  */
object ABPartitionCeiling {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 90
    val padWidth = if (args.length > 2) args(2).toInt else 64
    val skipOff = args.length > 3 && args(3) == "skipOff"
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
    // the r18-scaled thresholds so the ON leg's split fires at local volume
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "33554432")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8388608")

    // max single-task shuffle read + spill totals, from task metrics
    val maxTaskRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead
          maxTaskRead.getAndAccumulate(r, math.max(_, _))
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    // deterministic hot-key remap + padWidth-byte payload that RIDES
    // THE JOIN SHUFFLE (the aggregation consumes it, so it cannot be
    // pruned before the exchange): the hot partition's bytes scale
    // with padWidth independently of the row count
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .withColumn("l_partkey",
        when(pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(100L)) < hotPct,
          lit(1L)).otherwise(col("l_partkey")))
      // pad = DISTINCT 16-hex-char hash blocks (not one block repeated:
      // lz4 would erase a repeated block and the shuffled partition's
      // on-wire bytes — what the listener measures — would not grow
      // with padWidth)
      .withColumn("pad",
        concat((0 until (padWidth + 15) / 16).map(k =>
          hex(xxhash64(col("l_orderkey"), col("l_partkey"), lit(k)))): _*))
    val pt = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))

    def q(): DataFrame =
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty100"),
          count(lit(1)).as("n"), sum(xxhash64(col("pad"))).as("padh"))

    def digest(df: DataFrame) =
      df.agg(count(lit(1)), sum(xxhash64(col("p_brand"))), sum(col("qty100")),
        sum(col("n")), sum(col("padh"))).head()

    def leg(skewOn: Boolean): (Double, Long, Long, Long, Boolean) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      spark.catalog.clearCache(); System.gc()
      maxTaskRead.set(0L); spillMem.set(0L); spillDisk.set(0L)
      val t0 = System.nanoTime()
      val probe = q()
      probe.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // listener drain
      val planStr = probe.queryExecution.executedPlan.toString
      (wall, maxTaskRead.get, spillMem.get, spillDisk.get,
        planStr.contains("skew=true") || planStr.contains("skewed"))
    }

    val hotRows = li.filter(col("l_partkey") === 1L).count()
    val dOn = digest { spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true"); q() }
    val (tOn, mOn, smOn, sdOn, firedOn) = leg(skewOn = true)
    val offJson = if (skipOff) "null" else {
      val dOff = digest { spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false"); q() }
      require(dOff == dOn, s"digests diverge: off=$dOff on=$dOn")
      val (tOff, mOff, smOff, sdOff, _) = leg(skewOn = false)
      s"""{"wall_sec":${math.rint(tOff * 100) / 100},"max_task_shuffle_read":$mOff,"spill_mem":$smOff,"spill_disk":$sdOff}"""
    }
    println(s"""{"sf":"$sfDir","hot_pct":$hotPct,"pad_width":$padWidth,"hot_rows":$hotRows,"aqe_on":{"wall_sec":${math.rint(tOn * 100) / 100},"max_task_shuffle_read":$mOn,"spill_mem":$smOn,"spill_disk":$sdOn,"skew_split_fired":$firedOn},"aqe_off":$offJson,"digests_identical":true}""")
    spark.stop()
  }
}
