package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** SLOW-BUT-ALIVE peer probing — the residue dimension the r19/r20
  * fetch work left honestly open. A SIGKILLed executor refuses
  * connections instantly (the ABFetchLatency regime: retry knobs only
  * price knocking on a corpse); a SIGSTOPped executor is the opposite
  * failure shape: its TCP endpoints stay OPEN but unresponsive — the
  * same-host emulation of a peer that is alive but stalled (GC pause,
  * disk stall, CPU-starved node). Fetches from it HANG instead of
  * failing, which is exactly the regime where timeout/retry knobs
  * trade recovery latency against wasted refetch. Two legs on the
  * ABExecutorLoss local-cluster rig (REAL separate executor JVMs):
  *
  *   1. STALL-THEN-RECOVER — SIGSTOP one executor when the first
  *      reduce task that read shuffle data completes (its sibling is
  *      still streaming blocks under the serialized fetch window),
  *      SIGCONT after `stallS`. Under default timeouts (network
  *      timeout 120 s >> stall) nothing fails: the stall surfaces as
  *      pure added latency, zero FetchFailed, digest-exact — measured
  *      at two stall durations so the cost curve (wall vs stall) is
  *      visible, not assumed.
  *
  *   2. STALL-PAST-TIMEOUT — SIGSTOP and never resume; a short
  *      `spark.network.timeout` (with a 5 s heartbeat interval) races
  *      the two detection mechanisms a real cluster has: heartbeat
  *      expiry (driver declares the executor lost, unregisters its map
  *      outputs) vs fetch-channel timeout (reducer gets an IOException
  *      → FetchFailed → map-stage resubmission). Recovery must be
  *      digest-exact on the surviving executor either way; the
  *      patient/fast timeout pair prices what the knob buys when the
  *      peer is stalled, not gone. 3 reps per config (single captures
  *      of recovery walls flip sign — the ABFetchLatency lesson).
  *
  * Still honestly cluster-only after this: rack topology and PARTIAL
  * network partitions (peer reachable from some nodes, not others) —
  * one host cannot hold two network vantage points.
  *
  * Usage: SPARK_SCALA_VERSION=2.13 sbt "runMain graft.ABSlowPeer /tmp/sf10x"
  * Output: one JSON line (committed under ab/ as the r20 artifact).
  */
object ABSlowPeer {

  private def session(extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .master("local-cluster[2,6,3072]")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the slow-peer legs run under the serialized fetch window with
      // two fat reduce partitions — the same locally-reachable
      // configuration ABFetchLatency measured as the only one that
      // keeps a fetch in flight long enough for the fault to land on it
      .config("spark.reducer.maxReqsInFlight", "1")
      .config("spark.reducer.maxSizeInFlight", "48k")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
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

  private def signal(pid: String, sig: String): Unit =
    java.lang.Runtime.getRuntime.exec(Array("kill", s"-$sig", pid)).waitFor()

  /** NEWEST matching pid (`pgrep -n`): executor JVM exit after
    * `spark.stop()` is asynchronous, so the first-listed (oldest) pid
    * can be a dying executor from the PREVIOUS session — freezing that
    * corpse instead of a live peer would silently measure nothing. The
    * current session's executors are always the newest spawn. */
  private def newestExecutorPid(): Option[String] =
    new String(java.lang.Runtime.getRuntime
        .exec(Array("pgrep", "-n", "-f", "CoarseGrainedExecutorBackend"))
        .getInputStream.readAllBytes()).trim.split("\n")
      .filter(_.nonEmpty).headOption.map(_.trim)

  /** One stall run. `contAfterS = Some(s)`: SIGCONT after s seconds
    * (leg 1). `None`: leave stopped until cleanup (leg 2). Returns
    * (digest, wall sec, fetchFailed, resubmissions, executorRemoved,
    * stallLanded — whether the saboteur actually froze a pid).
    */
  private def stallLeg(sfDir: String, contAfterS: Option[Int],
                       extra: Map[String, String]): (Row, Double, Int, Int, Int, Boolean) = {
    val spark = session(extra)
    // the stopped pid outlives the leg unless cleaned up: a later
    // session's pgrep would find the frozen corpse and stall IT — the
    // same cross-leg contamination the ABFetchLatency assassin join
    // closes, so the saboteur is joined AND its pid CONT+KILLed here
    val saboteur = new java.util.concurrent.atomic.AtomicReference[Thread]()
    val stalledPid = new java.util.concurrent.atomic.AtomicReference[String]()
    try {
      val fetchFailed = new java.util.concurrent.atomic.AtomicInteger(0)
      val reattempts = new java.util.concurrent.atomic.AtomicInteger(0)
      val removed = new java.util.concurrent.atomic.AtomicInteger(0)
      val readsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onExecutorRemoved(
            e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit =
          removed.incrementAndGet()
        // same corpus-independent trigger as ABFetchLatency: the first
        // COMPLETED task that actually read shuffle data — its sibling
        // fat reduce partition is still streaming blocks from (or
        // running on) the peer the saboteur freezes
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.reason != null &&
              e.reason.getClass.getSimpleName.contains("FetchFailed"))
            fetchFailed.incrementAndGet()
          if (e.taskMetrics != null &&
              e.taskMetrics.shuffleReadMetrics.totalBytesRead > 0 &&
              readsSeen.incrementAndGet() == 1) {
            val t = new Thread(() => {
              newestExecutorPid().foreach { pid =>
                stalledPid.set(pid)
                signal(pid, "STOP")
                contAfterS.foreach { s =>
                  Thread.sleep(s * 1000L)
                  signal(pid, "CONT")
                }
              }
            }, "executor-saboteur")
            t.setDaemon(true)
            saboteur.set(t)
            t.start()
          }
        }
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          if (s.stageInfo.attemptNumber() > 0) reattempts.incrementAndGet()
      })
      val (d, t) = digestOf(spark, sfDir)
      Thread.sleep(500)
      (d, t, fetchFailed.get, reattempts.get, removed.get,
        stalledPid.get != null)
    } finally {
      Option(saboteur.get).foreach(_.join())
      // leg 2 leaves the pid frozen; a stopped process ignores the
      // worker's shutdown signal chain, so resume it and then kill it
      // outright — otherwise the next leg's pgrep freezes a corpse
      Option(stalledPid.get).foreach { pid =>
        signal(pid, "CONT"); signal(pid, "9")
      }
      spark.stop()
      // the worker relaunches a replacement for a lost executor; give
      // the standalone teardown a beat so no executor JVM from this
      // leg survives into the next leg's pgrep
      Thread.sleep(1000)
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    def r2(x: Double): Double = math.rint(x * 100) / 100

    // baseline: same session shape, no fault — cold then warm; the
    // stall legs below run equally cold, so cold is the comparable
    // one, and warm is the floor the landed-guard builds on. The
    // settle sleep lets this session's executors exit before the first
    // stall leg's pgrep (exit after spark.stop() is asynchronous).
    val s0 = session(Map.empty)
    val (d0, tBaseCold) = digestOf(s0, sfDir)
    val (_, tBaseWarm) = digestOf(s0, sfDir)
    s0.stop()
    Thread.sleep(1500)

    // leg 1: stall-then-recover at two durations under DEFAULT
    // timeouts (120 s network timeout >> stall: nothing may fail —
    // the stall must surface as pure latency). 3 reps per duration
    // (single cold captures swing by seconds — the ABFetchLatency
    // lesson applies to the headline marginal-cost number too), each
    // rep guarded: the saboteur must have frozen a pid AND the stall
    // must SHOW in the wall (wall >= warm floor + stall), so a missed
    // window cannot silently publish a corrupt marginal cost.
    val stallDurations = Seq(8, 20)
    val stalls = stallDurations.map { s =>
      val walls = (1 to 3).map { rep =>
        val (d, t, ff, rs, rm, landed) = stallLeg(sfDir, Some(s), Map.empty)
        require(d == d0, s"stall-$s rep $rep digest diverged: $d0 vs $d")
        require(landed, s"stall-$s rep $rep: saboteur found no executor pid")
        require(ff == 0 && rs == 0 && rm == 0,
          s"stall-$s rep $rep was supposed to be sub-timeout pure latency " +
            s"but saw fetchFailed=$ff resubmissions=$rs removed=$rm")
        require(t >= tBaseWarm + s,
          s"stall-$s rep $rep wall ${r2(t)}s < warm floor ${r2(tBaseWarm)}s " +
            s"+ stall ${s}s — the stall missed the query window")
        t
      }
      s -> walls
    }

    // leg 2: stall past the timeout — patient vs fast detection.
    // 3 reps each; every rep must recover digest-exact WITHOUT the
    // stalled peer (it never resumes inside the run). A rep whose
    // stall missed the fetch window retries with a fresh session (up
    // to 3 attempts, the killLeg convention) instead of discarding
    // the whole multi-minute run.
    def reps(timeoutS: Int): (Seq[Double], Int, Int, Int) = {
      val cfg = Map(
        "spark.network.timeout" -> s"${timeoutS}s",
        // the expiry sweep cadence must not exceed the timeout (Spark
        // requires timeoutInterval <= timeout; its default is 60 s)
        "spark.network.timeoutInterval" -> s"${timeoutS}s",
        "spark.executor.heartbeatInterval" -> "5s")
      val rs = (1 to 3).map { rep =>
        var attempt = 0
        var out: Option[(Row, Double, Int, Int, Int, Boolean)] = None
        while (out.isEmpty) {
          attempt += 1
          val leg = stallLeg(sfDir, None, cfg)
          require(leg._1 == d0, s"timeout-$timeoutS digest diverged: $d0 vs ${leg._1}")
          if (leg._6 && (leg._3 > 0 || leg._4 > 0 || leg._5 > 0)) out = Some(leg)
          else {
            require(attempt < 3,
              s"timeout-$timeoutS rep $rep: no detection fired in 3 attempts " +
                s"(ff=${leg._3} rs=${leg._4} rm=${leg._5} landed=${leg._6}) — " +
                "the stall keeps missing the fetch window; use a larger corpus")
            System.err.println(s"[ABSlowPeer] timeout-$timeoutS rep $rep " +
              s"attempt $attempt missed the fetch window — retrying")
          }
        }
        out.get
      }
      (rs.map(_._2), rs.map(_._3).sum, rs.map(_._4).sum, rs.map(_._5).sum)
    }
    val (tPat, ffPat, rsPat, rmPat) = reps(timeoutS = 45)
    val (tFast, ffFast, rsFast, rmFast) = reps(timeoutS = 20)
    def med(xs: Seq[Double]): Double = r2(xs.sorted.apply(xs.size / 2))
    def arr(xs: Seq[Double]): String = xs.map(r2).mkString("[", ",", "]")
    val Seq((sA, wallsA), (sB, wallsB)) = stalls
    val marginal = r2((med(wallsB) - med(wallsA)) / (sB - sA).toDouble)

    println(s"""{"sf":"$sfDir","mode":"local-cluster[2,6,3072]","digest_rows":${d0.getLong(0)},"baseline_cold_sec":${r2(tBaseCold)},"baseline_warm_sec":${r2(tBaseWarm)},"stall_durations_sec":[$sA,$sB],"stall${sA}_secs":${arr(wallsA)},"stall${sA}_median_sec":${med(wallsA)},"stall${sB}_secs":${arr(wallsB)},"stall${sB}_median_sec":${med(wallsB)},"stall_marginal_sec_per_stall_sec":$marginal,"timeout45_secs":${arr(tPat)},"timeout45_median_sec":${med(tPat)},"timeout45_fetch_failed":$ffPat,"timeout45_resubmissions":$rsPat,"timeout45_removed":$rmPat,"timeout20_secs":${arr(tFast)},"timeout20_median_sec":${med(tFast)},"timeout20_fetch_failed":$ffFast,"timeout20_resubmissions":$rsFast,"timeout20_removed":$rmFast,"digests_identical":true}""")
    sys.exit(0)
  }
}
