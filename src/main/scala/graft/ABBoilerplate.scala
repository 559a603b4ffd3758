package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale A/B harness for q190's count-gated hot-set join (VERDICT r12
  * #2): the broadcast branch (hot set → LocalRelation, forced
  * broadcast) vs the tripped-gate shuffled fallback, both on the exact
  * q190 corpus derivation. A digest action first proves the branches
  * value-identical at the target scale, then each is timed
  * best-of-`SPARK_GRAFT_RUNS` (default 2) through noop writes.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABBoilerplate /tmp/sf10x"
  */
object ABBoilerplate {
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
    def lined = Tables.documents(spark, sfDir).select(col("doc_id"),
      col("source"), graft.plans.Exprs.chunkTokens(col("text"), 8).as("t"))
    def run(limit: Long) = {
      val (f, used) = Dedup.boilerplateLinesPlan(lined, "t", "doc_id",
        "source", minDf = 2, sep = "\n", broadcastHotLimit = limit)
      (f.select(col("id").as("doc_id"), col("n_lines"), col("n_removed"),
        col("text_clean")), used)
    }
    def digest(limit: Long) = {
      val (f, _) = run(limit)
      f.agg(count(lit(1)), sum(col("n_lines")), sum(col("n_removed")),
        sum(hash(col("doc_id"), col("text_clean")).cast("long"))).head()
    }
    val (da, db) = (digest(1L << 20), digest(0L))
    require(da == db, s"branches diverge at $sfDir: $da vs $db")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    def time(limit: Long): (Double, Boolean) = {
      var used = false
      val t = (1 to runs).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val (f, u) = run(limit)
        used = u
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, used)
    }
    val (tb, ub) = time(1L << 20)   // broadcast branch (gate untripped)
    val (ts, us) = time(0L)         // forced shuffled fallback
    require(ub && !us, s"gate branches not as expected: untripped=$ub tripped=$us")
    println(f"""{"sf":"$sfDir","rows":${da.getLong(0)},"broadcast_sec":$tb%.2f,"shuffled_fallback_sec":$ts%.2f,"runs":$runs}""")
    spark.stop()
    sys.exit(0)
  }
}
