package graft

import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order layout pricing — the scan-pruning benefit q105's zorder
  * kernel exists to buy, measured instead of asserted. Parquet keeps
  * per-row-group min/max stats; a 2-D range predicate over a table
  * laid out in Morton order touches only the row groups whose
  * rectangles intersect the query box, while the same predicate over
  * the natural layout reads essentially everything (every row group's
  * [min,max] spans the full key range).
  *
  * The harness writes the SAME lineitem projection twice — natural
  * order vs `repartitionByRange(zorder2(partkey, suppkey))` +
  * within-partition sort — then runs an identical small-rectangle
  * aggregate over both, digest-proved equal, reporting wall time AND
  * actual bytes read (task-metrics listener; bytes are the
  * layout-independent truth — at 100 TB the saved IO is the whole
  * point, local NVMe just blunts the wall-clock gap).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABZorderLayout /tmp/sf100x"
  */
object ABZorderLayout {
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

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    li.write.mode("overwrite").parquet(s"$base/natural")
    li.repartitionByRange(32, Layout.zorder2(col("l_partkey"), col("l_suppkey"), 16))
      .sortWithinPartitions(Layout.zorder2(col("l_partkey"), col("l_suppkey"), 16))
      .write.mode("overwrite").parquet(s"$base/zordered")

    // a ~1% x ~10% rectangle of the (part, supp) key space
    def query(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("l_partkey").between(500, 520) &&
          col("l_suppkey").between(10, 20))
        // integer-exact digest: a double sum is order-dependent and the
        // two layouts accumulate in different orders by construction
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("q"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("p"),
          count(lit(1)).as("n"))

    val dN = query(s"$base/natural").head()
    val dZ = query(s"$base/zordered").head()
    require(dN == dZ, s"layouts diverge: $dN / $dZ")

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    def measure(path: String): (Double, Long) =
      (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        bytesRead.set(0L)
        val t0 = System.nanoTime()
        query(path).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(80)
        (t, bytesRead.get())
      }.minBy(_._1)
    val (tN, bN) = measure(s"$base/natural")
    val (tZ, bZ) = measure(s"$base/zordered")
    println(s"""{"sf":"$sfDir","natural_sec":${math.rint(tN * 1000) / 1000},"zordered_sec":${math.rint(tZ * 1000) / 1000},"natural_bytes_read":$bN,"zordered_bytes_read":$bZ,"bytes_ratio":${math.rint(bN.toDouble / bZ.max(1L) * 100) / 100},"digests_identical":true,"runs":$runs}""")
    spark.stop()
  }
}
