package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 evidence for [[graft.operators.Dedup.substringSpans]]'s
  * residue-sharded slow path (r19 verdict #4): re-runs the r19 organic
  * 829.7 s case — the lengthFactor-8192 multi-MB-document corpus whose
  * match volume the default gate ADMITS (`ab/doclen_gate_r19.json`) —
  * both unsharded and at `nShards`, recording per-run wall time, the
  * PEAK single-stage shuffle-write volume (the memory/disk pressure the
  * sharding exists to bound: the pair stream's exchange into the
  * constant-offset window), total spill, and digest equality.
  *
  * Expected shape: identical output rows/digest; sharded peak stage
  * shuffle ≈ unsharded / nShards; total work similar or mildly higher
  * (nShards passes over the persisted posting index).
  *
  * Usage: SPARK_GRAFT_CPUS=16 sbt "runMain graft.ABSpansSharded /tmp/lenbig [nShards]"
  * Output: one JSON line (committed under ab/ as the r20 artifact).
  */
object ABSpansSharded {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val nShards = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val readerBatch = sys.env.getOrElse("SPARK_GRAFT_READER_BATCH", "32")
    // shuffle partitions OVER-provisioned relative to slots: the
    // organic match volume makes per-partition window state the
    // pressure point, and many small spilling partitions beat few
    // giant ones (slots × 8; AQE would coalesce small ones anyway)
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      (cpus.toInt * 8).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", readerBatch)
      // the giant-sort recipe for the organic quadratic case: auto page
      // sizing requests 512 MB task pages at this heap/core ratio and
      // the GCLocker thrashes against the parquet reader's critical
      // sections (measured: shuffle-write OOM at 16 g); 64 MB pages +
      // no spill read-ahead keep the same sort spilling smoothly
      .config("spark.buffer.pageSize", "64m")
      .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
      // the sequential shard jobs accumulate GC-reclaimable execution
      // state (per-job broadcast relations release only on GC, and the
      // default periodic-GC interval is 30 MINUTES — longer than the
      // whole run); without this the unified pool reads exhausted by
      // shard ~5 ([UNABLE_TO_ACQUIRE_MEMORY] got 0)
      .config("spark.cleaner.periodicGC.interval", "45s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `degenerate:N` instead of a corpus dir fabricates the regime the
    // sharded mode EXISTS for: two documents of one repeated token (N
    // tokens each — every k-gram collides, so the self-join emits
    // ~(N-k+1)^2 match rows) plus filler. On the organic lengthFactor
    // corpus the pair exchange is NOT the dominant stage (the
    // posting-index exchanges are — see the committed artifact), so
    // only this shape shows the est/nShards bound moving a peak.
    val docs =
      if (sfDir.startsWith("degenerate:")) {
        val n = sfDir.stripPrefix("degenerate:").toInt
        val rep = Array.fill(n)("tok").mkString(" ")
        import spark.implicits._
        (Seq((1L, rep), (2L, rep)) ++
          (3L to 50L).map(i => (i, s"filler $i " + Array.fill(30)(s"w$i").mkString(" "))))
          .toDF("doc_id", "text").repartition(4)
      } else {
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
        Preflight.checkReaderBatch(spark, d, Seq("text"), lenient = true)
        d
      }

    // per-stage shuffle accounting. The pressure metric sharding
    // bounds is the PAIR/WINDOW EXCHANGE — the stage that both READS
    // shuffle (the posting-index sort) and WRITES shuffle (the match
    // rows heading to the constant-offset window). Pure map-side
    // stages (the posting-index exchange itself) are invariant across
    // legs and would mask the comparison if folded into one max.
    val maxReducerWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxStageWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxStageSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val w = m.shuffleWriteMetrics.bytesWritten
        val r = m.shuffleReadMetrics.totalBytesRead
        totalShuffle.addAndGet(w)
        spilled.addAndGet(m.memoryBytesSpilled)
        maxStageSpill.getAndUpdate(x => math.max(x, m.memoryBytesSpilled))
        maxStageWrite.getAndUpdate(x => math.max(x, w))
        if (r > 0) maxReducerWrite.getAndUpdate(x => math.max(x, w))
      }
    })
    def reset(): Unit = { maxReducerWrite.set(0); maxStageWrite.set(0)
      totalShuffle.set(0); spilled.set(0); maxStageSpill.set(0) }
    def run(shards: Int): (Long, Long, Double, Long, Long, Long, Long, Long) = {
      reset()
      val t0 = System.nanoTime()
      graft.operators.Dedup.substringSpans(docs, "text", "doc_id",
          nShards = shards)
        .agg(count(lit(1)).as("n"),
          coalesce(sum(xxhash64(col("a"), col("b"), col("n_spans"),
            col("max_span_tokens"), col("first_start_a"))), lit(0L)).as("h"))
        .head() match { case row => (row.getLong(0), row.getLong(1),
          (System.nanoTime() - t0) / 1e9,
          maxReducerWrite.get, maxStageWrite.get, totalShuffle.get,
          spilled.get, maxStageSpill.get) }
    }

    val (nS, hS, tS, pairS, peakS, totS, spS, sspS) = run(nShards)
    val (n1, h1, t1, pair1, peak1, tot1, sp1, ssp1) = run(1)
    require(n1 == nS && h1 == hS,
      s"sharded output diverged: unsharded ($n1, $h1) vs sharded ($nS, $hS)")
    println(s"""{"sf":"$sfDir","n_shards":$nShards,"rows":$n1,"digest":$h1,"unsharded_sec":${math.rint(t1 * 100) / 100},"unsharded_pair_exchange_bytes":$pair1,"unsharded_peak_stage_shuffle_bytes":$peak1,"unsharded_total_shuffle_bytes":$tot1,"unsharded_spill_bytes":$sp1,"unsharded_peak_stage_spill_bytes":$ssp1,"sharded_sec":${math.rint(tS * 100) / 100},"sharded_pair_exchange_bytes":$pairS,"sharded_peak_stage_shuffle_bytes":$peakS,"sharded_total_shuffle_bytes":$totS,"sharded_spill_bytes":$spS,"sharded_peak_stage_spill_bytes":$sspS,"pair_exchange_ratio":${if (pairS > 0) math.rint(pair1.toDouble / pairS * 100) / 100 else -1},"digests_identical":true}""")
    spark.stop()
    sys.exit(0)
  }
}
