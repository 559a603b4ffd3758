package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition pruning priced — static AND dynamic. The events table is
  * the natural time-partitioned fact at 100 TB (a day-partitioned
  * event log); this harness writes the 100× events once as a plain
  * parquet and once `partitionBy(day)`, then prices the two pruning
  * paths, digest-proved equal against the unpartitioned layout:
  *
  *   static   — `WHERE day = k`: the partitioned scan must carry the
  *              predicate as a PartitionFilter (asserted) and read
  *              only that day's files.
  *   dynamic  — join against a small dimension whose FILTER selects
  *              few days (the classic fact⋈dim DPP shape): the
  *              partition filter is only knowable at runtime, the
  *              plan must carry a `dynamicpruning` subquery
  *              (asserted), and the scan reads only the surviving
  *              partitions.
  *
  * Bytes read (task-metrics listener) are the layout-independent
  * truth; wall clock on local NVMe understates what the same pruning
  * saves on object storage.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABPartitionPruning /tmp/sf100x"
  */
object ABPartitionPruning {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
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
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) bytesRead.addAndGet(m.inputMetrics.bytesRead)
      }
    })

    // Tables.events normalizes ts to a session timestamp (micros)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val base = java.nio.file.Files.createTempDirectory("graft_partprune").toString
    ev.write.mode("overwrite").parquet(s"$base/plain")
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$base/byday")
    // partition-dir values read back type-inferred (int) — normalize
    val days = spark.read.parquet(s"$base/byday")
      .select(col("day").cast("long")).distinct()
      .orderBy(col("day")).collect().map(_.getLong(0))
    val pickDay = days(days.length / 2)
    // a dim whose FILTER survives few days — the DPP shape. The dim's
    // key must carry the PARTITION COLUMN'S read-back type exactly
    // (directory values type-infer to int): a differing type puts a
    // cast on the partition column inside the join key and Spark
    // cannot prune through it — DPP silently degrades to a full scan
    val dayType = spark.read.parquet(s"$base/byday").schema("day").dataType
    locally {
      import spark.implicits._
      days.zipWithIndex.map { case (d, i) => (d, if (i % (days.length / 2).max(2) == 1) "hot" else "cold") }
        .toSeq.toDF("day", "label")
        .withColumn("day", col("day").cast(dayType))
        // a REAL dim table: an in-memory LocalRelation constant-folds
        // its filter away and DPP's selective-predicate detection never
        // sees one — a parquet-backed dim keeps the Filter node alive,
        // which is also the honest 100-TB shape
        .write.mode("overwrite").parquet(s"$base/dim")
    }
    val dim = spark.read.parquet(s"$base/dim")

    def digest(df: DataFrame) =
      df.agg(count(lit(1)),
        sum(round(col("value") * 100).cast("long")),
        sum(xxhash64(col("event_id")))).head()

    def staticQ(path: String): DataFrame =
      spark.read.parquet(path).filter(col("day") === pickDay)
        .select(col("event_id"), col("value"))
    def dppQ(path: String): DataFrame =
      spark.read.parquet(path)
        .join(dim.filter(col("label") === "hot"), "day")
        .select(col("event_id"), col("value"))

    require(digest(staticQ(s"$base/plain")) == digest(staticQ(s"$base/byday")),
      "static layouts diverge")
    require(digest(dppQ(s"$base/plain")) == digest(dppQ(s"$base/byday")),
      "dpp layouts diverge")

    // plan assertions on the partitioned side
    val sPlan = staticQ(s"$base/byday").queryExecution.executedPlan.toString
    require(sPlan.contains(s"PartitionFilters: [isnotnull(day") ||
      sPlan.contains("PartitionFilters: [(day"),
      s"static query lost its partition filter:\n$sPlan")
    val dProbe = dppQ(s"$base/byday")
    dProbe.collect()
    val dPlan = dProbe.queryExecution.executedPlan.toString
    require(dPlan.contains("dynamicpruning"),
      s"DPP subquery missing from the partitioned join plan:\n$dPlan")

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    def measure(f: () => DataFrame): (Double, Long) =
      (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        bytesRead.set(0L)
        val t0 = System.nanoTime()
        val d = digest(f())
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(80)
        (t, bytesRead.get())
      }.minBy(_._1)
    val (tsp, bsp) = measure(() => staticQ(s"$base/plain"))
    val (tsb, bsb) = measure(() => staticQ(s"$base/byday"))
    val (tdp, bdp) = measure(() => dppQ(s"$base/plain"))
    val (tdb, bdb) = measure(() => dppQ(s"$base/byday"))
    println(s"""{"sf":"$sfDir","n_days":${days.length},"static_plain_sec":${math.rint(tsp * 1000) / 1000},"static_pruned_sec":${math.rint(tsb * 1000) / 1000},"static_plain_bytes":$bsp,"static_pruned_bytes":$bsb,"dpp_plain_sec":${math.rint(tdp * 1000) / 1000},"dpp_pruned_sec":${math.rint(tdb * 1000) / 1000},"dpp_plain_bytes":$bdp,"dpp_pruned_bytes":$bdb,"digests_identical":true,"runs":$runs}""")
    spark.stop()
  }
}
