package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Fetch-path latency/failure probing on the local-cluster rig — the
  * closest one machine gets to the network-remote shuffle dimension
  * (r19 verdict #5). Two legs, each with REAL separate executor JVMs
  * (`local-cluster[2,6,3072]`, the ABExecutorLoss scaffold):
  *
  *   1. THROTTLED FETCH — the same multi-shuffle near-dup workload
  *      under the default reducer window vs a serialized one
  *      (`spark.reducer.maxReqsInFlight=1`,
  *      `spark.reducer.maxSizeInFlight=48k`): every block fetch
  *      becomes its own round trip, so the slowdown factor measures
  *      how exposed the plan is to per-request latency — the knob a
  *      high-RTT network turns. Digest-checked against the default.
  *
  *   2. RETRY PRICING UNDER REAL FAILURE — an executor JVM is
  *      SIGKILLed when the reduce stage is submitted (its shuffle
  *      files die with it) under two IO-retry configs:
  *      patient (`spark.shuffle.io.maxRetries=3, retryWait=5s` — the
  *      defaults) vs fast-fail (`maxRetries=1, retryWait=1s`). The
  *      dead peer refuses connections instantly, so the measured
  *      recovery-time difference is exactly what the retry knobs buy
  *      when the peer is GONE (fast-fail escalates to FetchFailed →
  *      stage resubmission sooner). Digest-exact in both.
  *
  * What this does NOT establish: rack topology and partial network
  * partitions. (Slow-but-ALIVE peers — originally on this residue
  * list — turned out to be same-host-measurable after all via
  * SIGSTOP, which freezes the peer while its TCP endpoints stay open:
  * see [[ABSlowPeer]].)
  *
  * Usage: SPARK_SCALA_VERSION=2.13 sbt "runMain graft.ABFetchLatency /tmp/sf3x"
  * Output: one JSON line (committed under ab/ as the r20 artifact).
  */
object ABFetchLatency {

  private def session(extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .master("local-cluster[2,6,3072]")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def digestOf(spark: SparkSession, sfDir: String): (Row, Double) = {
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val r = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleK = 3, minJaccard = 0.8)
      .agg(count(lit(1)).as("n"), sum(xxhash64(col("id_a"), col("id_b"))).as("h"))
      .head()
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One kill-under-retry-config run: returns (digest, wall sec,
    * fetch-failed task count, stage resubmissions, executor removals).
    * NO warm-up rep, deliberately: a warm run finishes before the
    * assassin's kill can land mid-fetch (measured: 0 FetchFailed on a
    * 3.3 s warm run), and the point of this leg is pricing the retry
    * knobs UNDER a real fetch failure. Both retry configs run equally
    * cold, so their difference is the knobs'. Retries up to 3 fresh
    * sessions until the fetch-failure path provably fired (FetchFailed
    * task or a map-stage resubmission observed). */
  private def killLeg(sfDir: String, retries: Int, waitS: Int): (Row, Double, Int, Int, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      // the kill legs ALSO run under the serialized fetch window: that
      // is precisely the high-RTT regime being proxied, and it keeps
      // fetches in flight long enough for the kill to land on one
      // (unthrottled, the 12-partition reduce drains same-host fetches
      // in <100 ms and the assassin reliably misses — measured 0
      // FetchFailed in 3 attempts)
      val spark = session(Map(
        "spark.shuffle.io.maxRetries" -> retries.toString,
        "spark.shuffle.io.retryWait" -> s"${waitS}s",
        "spark.reducer.maxReqsInFlight" -> "1",
        "spark.reducer.maxSizeInFlight" -> "48k",
        // TWO fat reduce partitions: same-host fetches drain so fast
        // that a 12-partition wave has no in-flight fetch left by the
        // time any task-end trigger can fire; with 2 long-running
        // reduce tasks the second is still streaming blocks when the
        // first completes — the only locally-reachable configuration
        // where the kill severs a live fetch
        "spark.sql.shuffle.partitions" -> "2",
        "spark.sql.adaptive.enabled" -> "false"))
      // joined before spark.stop(): an unjoined assassin delayed under
      // load could fire AFTER this leg ends and SIGKILL a LATER
      // session's executor — burning one of its 3 attempts or adding an
      // unmeasured executor loss to the other retry-config's wall time
      val assassin = new java.util.concurrent.atomic.AtomicReference[Thread]()
      try {
        val fetchFailed = new java.util.concurrent.atomic.AtomicInteger(0)
        val reattempts = new java.util.concurrent.atomic.AtomicInteger(0)
        val removed = new java.util.concurrent.atomic.AtomicInteger(0)
        val stagesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onExecutorRemoved(
              e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit =
            removed.incrementAndGet()
          // trigger: the FIRST completed task that actually READ
          // shuffle data — corpus-independent, unlike stage-count
          // triggers (under AQE every leaf query stage submits
          // concurrently at t=0, so a "second submission" kill lands
          // mid-map, and an executor lost mid-map is plain task retry
          // with no fetch involved). When the first reduce task of a
          // 12-partition wave ends, its siblings are still mid-fetch
          // under the serialized window — the SIGKILL severs their
          // in-flight streams.
          override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            if (e.reason != null &&
                e.reason.getClass.getSimpleName.contains("FetchFailed"))
              fetchFailed.incrementAndGet()
            if (e.taskMetrics != null &&
                e.taskMetrics.shuffleReadMetrics.totalBytesRead > 0 &&
                stagesSeen.incrementAndGet() == 1) {
              val t = new Thread(() => {
                val pids = new String(java.lang.Runtime.getRuntime
                    .exec(Array("pgrep", "-f", "CoarseGrainedExecutorBackend"))
                    .getInputStream.readAllBytes()).trim.split("\n").filter(_.nonEmpty)
                pids.headOption.foreach { pid =>
                  java.lang.Runtime.getRuntime.exec(Array("kill", "-9", pid.trim)).waitFor()
                }
              }, "executor-assassin")
              t.setDaemon(true)
              assassin.set(t)
              t.start()
            }
          }
          override def onStageSubmitted(
              s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
            if (s.stageInfo.attemptNumber() > 0) reattempts.incrementAndGet()
        })
        val (d, t) = digestOf(spark, sfDir)
        Thread.sleep(500)
        require(removed.get >= 1, s"kill not observed (removed=${removed.get})")
        if (fetchFailed.get > 0 || reattempts.get > 0)
          return (d, t, fetchFailed.get, reattempts.get, removed.get)
        require(attempt < 3,
          "kill landed after the shuffle was fully consumed in 3 attempts — " +
            "no fetch failure to price; use a larger corpus")
        System.err.println(s"[ABFetchLatency] attempt $attempt: kill too late " +
          "(no FetchFailed/resubmission) — retrying with a fresh session")
      } finally {
        // unbounded: a timed join that expires under load would let the
        // stale assassin escape into the NEXT session — the exact
        // defect this join exists to close (the thread only runs
        // pgrep + kill, and it is a daemon, so JVM exit is never held)
        Option(assassin.get).foreach(_.join())
        spark.stop()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)

    // leg 1a: default fetch window
    val sDef = session(Map.empty)
    val (dDef, tDefCold) = digestOf(sDef, sfDir)
    val (_, tDef) = digestOf(sDef, sfDir) // warm rep is the comparable one
    sDef.stop()
    // leg 1b: serialized fetch — one in-flight request, 48k window
    val sThr = session(Map(
      "spark.reducer.maxReqsInFlight" -> "1",
      "spark.reducer.maxSizeInFlight" -> "48k"))
    val (dThr, _) = digestOf(sThr, sfDir)
    val (_, tThr) = digestOf(sThr, sfDir)
    sThr.stop()
    require(dDef == dThr, s"throttled digest diverged: $dDef vs $dThr")

    // leg 2: retry pricing under a real mid-reduce executor kill.
    // 3 reps per config — a single cold kill run's wall time swings by
    // more than the 2×retryWait being priced (measured: sign flips
    // between consecutive single captures), so the artifact carries
    // all reps plus medians.
    def reps(retries: Int, waitS: Int): (Seq[Double], Int, Int, Int) = {
      val rs = (1 to 3).map(_ => killLeg(sfDir, retries, waitS))
      rs.foreach { case (d, _, _, _, _) =>
        require(dDef == d, s"kill-leg digest diverged: $dDef vs $d") }
      (rs.map(_._2), rs.map(_._3).sum, rs.map(_._4).sum, rs.map(_._5).sum)
    }
    val (tPat, ffPat, rsPat, rmPat) = reps(retries = 3, waitS = 5)
    val (tFast, ffFast, rsFast, rmFast) = reps(retries = 1, waitS = 1)
    def med(xs: Seq[Double]): Double = math.rint(xs.sorted.apply(xs.size / 2) * 100) / 100
    def arr(xs: Seq[Double]): String =
      xs.map(x => math.rint(x * 100) / 100).mkString("[", ",", "]")

    println(s"""{"sf":"$sfDir","mode":"local-cluster[2,6,3072]","digest_rows":${dDef.getLong(0)},"default_warm_sec":${math.rint(tDef * 100) / 100},"default_cold_sec":${math.rint(tDefCold * 100) / 100},"throttled_warm_sec":${math.rint(tThr * 100) / 100},"throttle_factor":${math.rint(tThr / tDef * 100) / 100},"kill_patient_secs":${arr(tPat)},"kill_patient_median_sec":${med(tPat)},"kill_patient_fetch_failed":$ffPat,"kill_patient_resubmissions":$rsPat,"kill_patient_removed":$rmPat,"kill_fastfail_secs":${arr(tFast)},"kill_fastfail_median_sec":${med(tFast)},"kill_fastfail_fetch_failed":$ffFast,"kill_fastfail_resubmissions":$rsFast,"kill_fastfail_removed":$rmFast,"digests_identical":true}""")
    sys.exit(0)
  }
}
