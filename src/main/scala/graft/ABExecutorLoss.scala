package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FULL executor loss, measured — the last entry on SCALE.md's
  * "cannot be measured on one machine" list. `local[N]` cannot kill an
  * executor (one JVM), but Spark's `local-cluster[n, cores, mem]`
  * master launches REAL standalone workers with SEPARATE executor
  * JVMs on this box — the same CoarseGrainedExecutorBackend, shuffle
  * service path, and supervision a cluster runs. This harness:
  *
  *   1. runs the q36-shape near-dup pipeline (multi-shuffle lineage)
  *      CLEAN on a 2-executor local-cluster and records its digest;
  *   2. re-runs it with a stage-triggered assassin: when the first
  *      shuffle-map stage completes, ONE executor JVM is `kill -9`ed —
  *      its shuffle files vanish with it, so the reduce side hits
  *      FetchFailed (not just task retry), the stage resubmits, and
  *      the standalone worker relaunches a replacement executor;
  *   3. asserts the kill REALLY happened (listener counts executor
  *      removals; the run is invalid without one) and that the final
  *      digest is IDENTICAL to the clean run's.
  *
  * Recovery must be exact recomputation, not "the job finished".
  *
  * A second workload (`funnel`) drives [[graft.operators.Curation
  * .funnel]] — the composed 4-stage pipeline with TWO MEMORY_AND_DISK
  * persists — so the kill also takes cached blocks with the JVM: the
  * combined executor-death + cache-loss regime (r18 proved the
  * task-level halves separately).
  *
  * Usage: sbt "runMain graft.ABExecutorLoss /tmp/sf3x [neardup|funnel]"
  * (2 executors × 6 cores × 3 GB; one JSON line, committed under ab/)
  */
object ABExecutorLoss {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val workload = if (args.length > 1) args(1) else "neardup"
    val spark = SparkSession.builder()
      .master("local-cluster[2,6,3072]")
      // executor JVMs launch from SPARK_HOME and do NOT inherit the
      // driver's classpath — hand them ours (same box, paths valid)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    val failedTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val reattempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val killedPid = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onExecutorRemoved(
          e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (!e.taskInfo.successful) failedTasks.incrementAndGet()
      private val stagesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        // attemptNumber > 0 = a stage RESUBMISSION: the dead executor's
        // map outputs were unregistered and recomputed — the
        // shuffle-loss recovery path, observed rather than assumed
        if (s.stageInfo.attemptNumber() > 0) reattempts.incrementAndGet()
        // assassin: when the SECOND stage of the armed run is submitted
        // (a reduce stage that still needs the first stage's map
        // outputs), give its fetches a moment to be in flight, then
        // SIGKILL one executor JVM off-thread — its running tasks AND
        // its stage-1 shuffle files die with it
        if (armed.get && stagesSeen.incrementAndGet() == 2 &&
            armed.compareAndSet(true, false)) {
          new Thread(() => {
            Thread.sleep(300)
            val pids = new String(java.lang.Runtime.getRuntime
                .exec(Array("pgrep", "-f", "CoarseGrainedExecutorBackend"))
                .getInputStream.readAllBytes()).trim.split("\n").filter(_.nonEmpty)
            pids.headOption.foreach { pid =>
              killedPid.set(pid.trim.toLong)
              java.lang.Runtime.getRuntime.exec(Array("kill", "-9", pid.trim)).waitFor()
            }
          }, "executor-assassin").start()
        }
      }
    })

    def digest() = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      workload match {
        case "funnel" =>
          // the composed 4-stage pipeline: its two MEMORY_AND_DISK
          // persists live on the executors, so the SIGKILL also drops
          // cached blocks mid-pipeline
          graft.operators.Curation.funnel(docs)
            .agg(count(lit(1)).as("n"),
              sum(xxhash64(col("source"), col("n_docs"), col("n_rules"),
                col("n_exact"), col("n_trim"), col("n_lm"))).as("h")).head()
        case _ =>
          graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
            shingleK = 3, minJaccard = 0.8)
            .agg(count(lit(1)).as("n"),
              sum(xxhash64(col("id_a"), col("id_b"))).as("h")).head()
      }
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (dClean, tClean) = timed(digest())
    failedTasks.set(0); removed.set(0)
    armed.set(true)
    val (dKill, tKill) = timed(digest())
    // settle the listener bus, then validate the experiment actually ran
    Thread.sleep(500)
    require(killedPid.get != 0L, "assassin never fired: no executor PID found")
    require(removed.get >= 1,
      s"executor kill not observed by the scheduler (removed=${removed.get})")
    require(dClean == dKill, s"digests diverge: clean=$dClean killed=$dKill")
    println(s"""{"sf":"$sfDir","workload":"$workload","mode":"local-cluster[2,6,3072]","clean_sec":${math.rint(tClean * 100) / 100},"killed_sec":${math.rint(tKill * 100) / 100},"executors_removed":${removed.get},"failed_tasks":${failedTasks.get},"stage_resubmissions":${reattempts.get},"killed_pid":${killedPid.get},"digest_rows":${dClean.getLong(0)},"digests_identical":true}""")
    spark.stop()
  }
}
