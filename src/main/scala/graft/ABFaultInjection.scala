package graft

import graft.operators.Dedup
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Task-failure recovery evidence — the locally-measurable half of the
  * "executor-loss recovery" extrapolation (SCALE.md "What this does
  * and does not establish"). A lost executor manifests to the engine
  * as failed tasks plus lost shuffle/cache blocks; local mode cannot
  * kill a JVM, but it CAN fail tasks and force lineage recomputation —
  * `local[N, maxFailures]` enables the same retry machinery a cluster
  * runs.
  *
  * The harness runs the q36-shaped near-dup pipeline (shingle →
  * minhash → banded join → verify; multiple shuffles over a cached-
  * nothing lineage) three times over the same corpus:
  *
  *   clean      — no injection (the reference digest)
  *   fail_scan  — one task of the SCAN stage throws on its first
  *                attempt (a nondeterministic-marked UDF keyed on
  *                TaskContext partitionId/attemptNumber), so the
  *                retry re-reads parquet and recomputes the map side
  *   fail_late  — one task of the post-shuffle PAIR stage throws on
  *                first attempt, so the retry re-fetches shuffle
  *                blocks and recomputes the reduce side
  *
  * A task-end listener counts actual task failures (asserted ≥ 1 per
  * injected run — the injection provably happened, this is not a
  * vacuous pass), and all three result digests must be identical:
  * recovery is exact, not just "the job finished".
  *
  * Usage: SPARK_GRAFT_CPUS=16 sbt "runMain graft.ABFaultInjection /tmp/sf3x"
  */
object ABFaultInjection {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus,4]") // maxFailures=4: the cluster default
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // injected failures WARN loudly
    val failedTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.reason != org.apache.spark.Success) failedTasks.incrementAndGet()
    })

    // throws on the first attempt of ONE task of whatever stage
    // evaluates it; asNondeterministic keeps Catalyst from folding,
    // reordering, or pushing it across the stage boundary under test
    def failOnce = udf { () =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 1 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected task failure (attempt 0)")
      1
    }.asNondeterministic()

    def pipeline(injectScan: Boolean, injectLate: Boolean): DataFrame = {
      var docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      if (injectScan) docs = docs.filter(failOnce() === 1)
      var pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleK = 3, minJaccard = 0.12)
      if (injectLate) pairs = pairs.filter(failOnce() === 1)
      pairs
    }
    def digest(df: DataFrame) =
      df.agg(count(lit(1)), sum(xxhash64(col("id_a"), col("id_b"))),
        sum(round(col("jaccard") * 1e6, 0).cast("long"))).head()

    def leg(name: String, scan: Boolean, late: Boolean): (String, Any, Long) = {
      failedTasks.set(0L)
      val d = digest(pipeline(scan, late))
      Thread.sleep(100) // listener drain
      (name, d, failedTasks.get())
    }
    val clean = leg("clean", scan = false, late = false)
    val fScan = leg("fail_scan", scan = true, late = false)
    val fLate = leg("fail_late", scan = false, late = true)

    require(fScan._3 >= 1, "scan injection never fired — vacuous run")
    require(fLate._3 >= 1, "late injection never fired — vacuous run")
    require(clean._2 == fScan._2 && clean._2 == fLate._2,
      s"recovery diverged: clean=${clean._2} scan=${fScan._2} late=${fLate._2}")

    // fourth leg: the CACHE-FILL path. Curation.funnel persists two
    // MEMORY_AND_DISK frames; a task failing mid-fill exercises
    // CacheManager recomputation (a lost executor also loses its
    // cached blocks — this is the local analogue). The injection sits
    // below both persists, so the retried partition re-runs the rule
    // scan into the cache.
    def funnelDigest(inject: Boolean): Any = {
      var docs = Tables.documents(spark, sfDir)
      if (inject) docs = docs.filter(failOnce() === 1)
      graft.operators.Curation.funnel(docs)
        .agg(count(lit(1)), sum(xxhash64(col("source"))),
          sum(col("n_docs") + col("n_rules") + col("n_exact") +
            col("n_trim") + col("n_lm"))).head()
    }
    failedTasks.set(0L)
    val cleanF = funnelDigest(inject = false)
    failedTasks.set(0L)
    val injF = funnelDigest(inject = true)
    Thread.sleep(100)
    val fCache = failedTasks.get()
    require(fCache >= 1, "cache-path injection never fired — vacuous run")
    require(cleanF == injF, s"funnel recovery diverged: $cleanF vs $injF")

    println(s"""{"sf":"$sfDir","digest":"${clean._2}","clean_failed_tasks":${clean._3},"fail_scan_failed_tasks":${fScan._3},"fail_late_failed_tasks":${fLate._3},"funnel_cache_failed_tasks":$fCache,"funnel_digest":"$cleanF","digests_identical":true}""")
    spark.stop()
  }
}
