package graft

import graft.operators.Resample
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale A/B harness for q68's two value-identical formulations
  * (VERDICT r12 #7): the grid-asof `forwardFill` (grid explode +
  * union-window carry over grid+events) vs the gap-emit
  * `forwardFillGaps` (one window over events only, grid rows born with
  * their value). Runs both on `args(0)`'s events table with the exact
  * q68 configuration, best-of-`SPARK_GRAFT_RUNS` (default 2) noop
  * writes each, and prints one JSON line. A cross-check action first
  * asserts both plans produce the same row count + value checksum at
  * the target scale, so the A/B can't silently time two different
  * results.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABResample /tmp/sf10x"
  */
object ABResample {
  def main(args: Array[String]): Unit = {
    // pin the JVM default locale: Spark's non-ASCII lowercase path
    // reads it while the kernels use Locale.ROOT explicitly — a
    // non-ROOT default (tr-TR 'I'→'ı') would desync the two (r16
    // advisor); ROOT is what every committed hash was captured under
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
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    def e = Tables.events(spark, sfDir).groupBy(col("user_id"), col("ts"))
      .agg(avg(col("value")).as("v"))
    def gridAsof = Resample.forwardFill(e, Seq("user_id"), "ts", Seq("v"),
        snapOriginTo = Some("hour"))
      .select(col("user_id"), col("grid_ts"), round(col("v"), 6).as("v"))
    def gapEmit = Resample.forwardFillGaps(e, Seq("user_id"), "ts", Seq("v"),
        snapOriginTo = Some("hour"))
      .select(col("user_id"), col("grid_ts"), round(col("v"), 6).as("v"))
    def digest(f: org.apache.spark.sql.DataFrame) =
      f.agg(count(lit(1)), sum(hash(col("user_id"), col("grid_ts"), col("v"))
        .cast("long"))).head()
    val (da, db) = (digest(gridAsof), digest(gapEmit))
    require(da == db, s"formulations diverge at $sfDir: $da vs $db")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    def time(f: () => org.apache.spark.sql.DataFrame): Double =
      (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    // warm both plan families once before timing
    time(() => gridAsof.limit(1).toDF()); time(() => gapEmit.limit(1).toDF())
    val (ta, tb) = (time(() => gridAsof), time(() => gapEmit))
    println(f"""{"sf":"$sfDir","rows":${da.getLong(0)},"grid_asof_sec":$ta%.2f,"gap_emit_sec":$tb%.2f,"runs":$runs}""")
    spark.stop()
    sys.exit(0)
  }
}
