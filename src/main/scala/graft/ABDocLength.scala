package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Doc-length-axis gate evidence (r18 verdict #1) — drives the two r19
  * refuse-don't-explode gates against a FABRICATED multi-MB-document
  * corpus (ScaleGen `lengthFactor`, e.g. sf0.001 at lengthFactor 8192:
  * 500 docs averaging ~2.6 MB) and records:
  *
  *  - `dupSpanStats`/`dupSpanTrim` `maxDocChars`: a 1 M-char bound
  *    REFUSES the corpus (every doc is multi-MB) with the in-row-state
  *    guidance, while the 20 M default ADMITS it and both operators
  *    complete — books are legitimate training documents; the gate
  *    exists for the pathological multi-hundred-MB row.
  *  - `substringSpans` `maxMatchRows`: the exact one-pass estimate of
  *    the shingle self-join's output (Σ_h (tot²−Σocc²)/2) on this
  *    corpus, and whether the default 2^31 gate admits or refuses.
  *
  * MEASURED CEILING (the harness's first finding, r19): before any
  * kernel runs, the VECTORIZED PARQUET READER itself OOMs on multi-MB
  * documents at the default `columnarReaderBatchSize` of 4096 — one
  * column vector tries a 4096 × avg-doc-bytes contiguous reservation
  * (~190 MB requested at 2.6 MB docs), and 16 concurrent reader tasks
  * sink an 8 g heap. The multi-MB-document recipe is a row-count batch
  * sized to the documents (32 here ⇒ ~83 MB/vector worst-case);
  * `SPARK_GRAFT_READER_BATCH` overrides.
  *
  * Usage: SPARK_GRAFT_CPUS=16 sbt "runMain graft.ABDocLength /tmp/lenbig"
  * Output: one JSON line (committed under ab/ as the r19 artifact).
  */
object ABDocLength {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val readerBatch = sys.env.getOrElse("SPARK_GRAFT_READER_BATCH", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", readerBatch)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    import org.apache.spark.sql.functions._
    val (nDocs, avgChars, maxChars, maxBytes) = {
      val r = docs.agg(count(lit(1)), avg(length(col("text"))),
        max(length(col("text"))), max(octet_length(col("text"))).cast("long")).head()
      (r.getLong(0), r.getDouble(1).round, r.getInt(2), r.getLong(3))
    }
    // the r20 guard's own verdicts on this corpus: what the DEFAULT
    // 4096-row batch would have done (the r19 OOM, now refused with a
    // recipe), what the guard recommends, and that the batch this run
    // actually uses passes — the harness consumes its own guard
    val heap = Runtime.getRuntime.maxMemory
    val slots = spark.sparkContext.defaultParallelism
    val recommended = Preflight.recommendedReaderBatch(heap, slots, maxBytes)
    val defaultVerdict = Preflight.readerBatchWarning(heap, slots, 4096, maxBytes)
      .map(_.take(120)).getOrElse("ok")
    Preflight.checkReaderBatch(spark, docs, Seq("text"), lenient = true)

    // 1. maxDocChars: a 1M bound refuses multi-MB docs with guidance
    val refusedMsg =
      try { Dedup.dupSpanStats(docs, "text", "doc_id", maxDocChars = 1000000L); "NOT_REFUSED" }
      catch { case e: IllegalArgumentException => e.getMessage.take(120) }
    // ... while the default admits them and the operators complete
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (tStats, nStats) = timed(Dedup.dupSpanStats(docs, "text", "doc_id").count())
    val (tTrim, nTrim) = timed(Dedup.dupSpanTrim(docs, "text", "doc_id").count())

    // 2. maxMatchRows: the default gate's verdict on this corpus (the
    //    estimate is printed by the refusal message when it fires)
    val (matchGate, tSpans, nSpans) =
      try {
        val (t, n) = timed(Dedup.substringSpans(docs, "text", "doc_id").count())
        ("admitted", t, n)
      } catch {
        case e: IllegalArgumentException => (e.getMessage.take(160), 0.0, -1L)
      }

    println(s"""{"sf":"$sfDir","n_docs":$nDocs,"avg_chars":$avgChars,"max_chars":$maxChars,"max_bytes":$maxBytes,"reader_batch":$readerBatch,"reader_batch_recommended":$recommended,"reader_batch_default_verdict":"${defaultVerdict.replace("\"", "'")}","max_doc_chars_1m_refusal":"${refusedMsg.replace("\"", "'")}","dup_span_stats_default_sec":${math.rint(tStats * 100) / 100},"dup_span_stats_rows":$nStats,"dup_span_trim_default_sec":${math.rint(tTrim * 100) / 100},"dup_span_trim_rows":$nTrim,"substring_spans_default":"${matchGate.replace("\"", "'")}","substring_spans_sec":${math.rint(tSpans * 100) / 100},"substring_spans_rows":$nSpans}""")
    spark.stop()
  }
}
