package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located join, measured at scale — the evidence behind
  * the claim several operator scaladocs make ("at 100 TB the right
  * plan is bucketed lineitem⋈part on partkey"; BucketingSpec pins the
  * zero-exchange SHAPE at unit scale, this harness prices it).
  *
  * One session: lineitem and part are written once as bucketed tables
  * (bucketBy(buckets, key) + sortBy — the one-time cost a recurring
  * join amortizes), then the same join+global-aggregate runs twice,
  * digest-proved identical:
  *
  *   plain     — parquet scans, shuffle join (broadcast disabled so
  *               the exchange is real; the global agg adds no data
  *               exchange, so the join IS the measured cost)
  *   bucketed  — metastore tables; the join plans NO
  *               `Exchange hashpartitioning` (asserted on the final
  *               adaptive plan), each bucket merges locally
  *
  * The report carries the one-time bucketed-write cost alongside the
  * per-join delta: bucketing pays when the join recurs — a nightly
  * 100-TB pipeline joining on the same key reuses the layout every
  * run, which is exactly the recurring-ETL shape of the reference.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABBucketedJoin /tmp/sf100x 32"
  */
object ABBucketedJoin {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val pt = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))

    // one-time layout cost, reported honestly
    val tw0 = System.nanoTime()
    li.write.bucketBy(buckets, "l_partkey").sortBy("l_partkey")
      .option("path", s"$wh/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    pt.write.bucketBy(buckets, "p_partkey").sortBy("p_partkey")
      .option("path", s"$wh/b_part").mode("overwrite").saveAsTable("b_part")
    val writeSec = (System.nanoTime() - tw0) / 1e9

    def joined(l: DataFrame, p: DataFrame): DataFrame =
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(sum(col("l_quantity")).as("q"),
          sum(col("l_extendedprice") * xxhash64(col("p_brand")).cast("double")).as("h"),
          count(lit(1)).as("n"))
    def plain() = joined(li, pt)
    def bucketed() = joined(spark.table("b_lineitem"), spark.table("b_part"))

    val dP = plain().head()
    val dB = bucketed().head()
    require(dP == dB, s"plain vs bucketed diverge: $dP / $dB")

    // the bucketed join must be exchange-free on the join itself
    val probe = bucketed()
    probe.collect()
    val planStr = probe.queryExecution.executedPlan.toString
    require(!planStr.contains("Exchange hashpartitioning"),
      s"bucketed join planned a shuffle:\n$planStr")

    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    def time(f: () => DataFrame): Double =
      (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    val tPlain = time(() => plain())
    val tBucketed = time(() => bucketed())

    println(s"""{"sf":"$sfDir","buckets":$buckets,"plain_join_sec":${math.rint(tPlain * 1000) / 1000},"bucketed_join_sec":${math.rint(tBucketed * 1000) / 1000},"bucketed_write_sec":${math.rint(writeSec * 1000) / 1000},"zero_exchange":true,"digests_identical":true,"runs":$runs}""")
    spark.stop()
  }
}
