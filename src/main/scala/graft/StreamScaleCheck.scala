package graft

import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream==batch parity for the CURATION GATE at scale — the unit
  * StreamsSpec pins [[Streams.curateStream]] on 60 rows; this harness
  * drives the SAME pipeline (quality gate → content dedup) through a
  * real MemoryStream micro-batch loop over the full `documents` table
  * of a ScaleGen volume (50k docs at 10×), then runs the batch twin on
  * the identical rows and compares the kept text sets exactly.
  *
  * Timestamps are synthesized inside one watermark window (ts spread
  * < 1 h) so `dropDuplicatesWithinWatermark` state never evicts
  * mid-run — the regime where stream and batch are CONTRACTED to
  * agree; eviction-after-watermark divergence is the documented
  * streaming-semantics difference, not a bug this harness hunts.
  *
  * Usage: `sbt "runMain graft.StreamScaleCheck /tmp/sf1x 20"`
  * (20 = micro-batch count). Prints one PASS/FAIL line.
  */
object StreamScaleCheck {
  def main(args: Array[String]): Unit = {
    // pin the JVM default locale: Spark's non-ASCII lowercase path
    // reads it while the kernels use Locale.ROOT explicitly — a
    // non-ROOT default (tr-TR 'I'→'ı') would desync the two (r16
    // advisor); ROOT is what every committed hash was captured under
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1700000000000L
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
    val rows = raw.zipWithIndex.map { case (r, i) =>
      (r.getLong(0), new java.sql.Timestamp(t0 + (i % 3000).toLong * 1000L),
        r.getString(1))
    }.toSeq
    val w = graft.operators.QualityClassifier.pseudoWeights(4096)

    val tS = System.nanoTime()
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streams.curateStream(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", w,
        minScore = 0.5)
      .select(col("text"))
      .writeStream.format("memory").queryName("curate_scale")
      .outputMode("append").start()
    val chunk = math.max(1, rows.length / batches)
    rows.grouped(chunk).foreach { g =>
      stream.addData(g)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("curate_scale").as[String].collect()
    val streamSec = (System.nanoTime() - tS) / 1e9

    val tB = System.nanoTime()
    val batch = Streams.curateStream(
        rows.toDF("doc_id", "ts", "text"), "text", "ts", w, minScore = 0.5)
      .select(col("text")).as[String].collect()
    val batchSec = (System.nanoTime() - tB) / 1e9

    val sSet = streamed.toSet
    val bSet = batch.toSet
    val dupFree = streamed.length == sSet.size && batch.length == bSet.size
    val equal = sSet == bSet
    val ok = dupFree && equal
    println(s"[streamscale] ${if (ok) "PASS" else "FAIL"} docs=${rows.length} " +
      s"batches=${math.ceil(rows.length.toDouble / chunk).toInt} " +
      s"kept_stream=${streamed.length} kept_batch=${batch.length} " +
      s"set_equal=$equal dup_free=$dupFree " +
      s"stream_sec=${"%.1f".format(streamSec)} batch_sec=${"%.1f".format(batchSec)}")

    // ---- second leg: SESSIONIZE parity over the events table -------
    // the stateful flatMapGroupsWithState path (per-user session
    // counters across micro-batch boundaries) vs the batch lag-based
    // q31 derivation. Events feed in global (ts, event_id) order —
    // the contract regime: within a batch the operator sorts, across
    // batches the monotone clock never rewinds.
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"), col("ts"), col("event_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(e => (e._2.getTime, e._3))
      .toSeq
    val tS2 = System.nanoTime()
    val estream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val eds = estream.toDS().map { case (u, t, e) => Streams.EventIn(u, t, e) }
    val q2 = Streams.sessionize(eds, gapSeconds = 300)
      .writeStream.format("memory").queryName("sess_scale")
      .outputMode("update").start()
    val echunk = math.max(1, ev.length / batches)
    ev.grouped(echunk).foreach { g =>
      estream.addData(g)
      q2.processAllAvailable()
    }
    q2.stop()
    // both counters are MONOTONE per user, so the final running total
    // is the max update (order-safe, unlike last())
    val sessStream = spark.table("sess_scale")
      .groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("n_sessions"),
        max(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamSec2 = (System.nanoTime() - tS2) / 1e9
    val tB2 = System.nanoTime()
    val w31 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessBatch = ev.toDF("user_id", "ts", "event_id")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w31))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 300,
          1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchSec2 = (System.nanoTime() - tB2) / 1e9
    val ok2 = sessStream == sessBatch
    println(s"[streamscale] ${if (ok2) "PASS" else "FAIL"} sessionize " +
      s"events=${ev.length} users_stream=${sessStream.size} " +
      s"users_batch=${sessBatch.size} set_equal=$ok2 " +
      s"stream_sec=${"%.1f".format(streamSec2)} batch_sec=${"%.1f".format(batchSec2)}")
    // ---- third leg: NEAR-DUP GATE parity over the documents table --
    // q82's online twin: 10% of the corpus (doc_id % 10 == 0) is the
    // static reference, the other 90% arrives as the stream; the
    // stream-static band joins + within-watermark pair dedup must
    // reproduce the batch path's pair set exactly (ts again inside one
    // watermark window, the contracted-agreement regime)
    val corpusRows = rows.filter(_._1 % 10 == 0)
    val arrivals = rows.filter(_._1 % 10 != 0)
    val corpusDf = corpusRows.toDF("doc_id", "ts", "text")
      .select(col("doc_id"), col("text"))
    val tS3 = System.nanoTime()
    val nstream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q3 = Streams.nearDupAgainstStream(
        nstream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "doc_id",
        corpusDf, "text", "doc_id", threshold = 0.2)
      .writeStream.format("memory").queryName("neardup_scale")
      .outputMode("append").start()
    val nchunk = math.max(1, arrivals.length / batches)
    arrivals.grouped(nchunk).foreach { g =>
      nstream.addData(g)
      q3.processAllAvailable()
    }
    q3.stop()
    val ndStream = spark.table("neardup_scale").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val streamSec3 = (System.nanoTime() - tS3) / 1e9
    val tB3 = System.nanoTime()
    val ndBatch = Streams.nearDupAgainstStream(
        arrivals.toDF("doc_id", "ts", "text"), "text", "ts", "doc_id",
        corpusDf, "text", "doc_id", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batchSec3 = (System.nanoTime() - tB3) / 1e9
    val ndSet = ndStream.toSet
    val ok3 = ndStream.length == ndSet.size && ndSet == ndBatch.toSet
    println(s"[streamscale] ${if (ok3) "PASS" else "FAIL"} neardup_gate " +
      s"corpus=${corpusRows.length} arrivals=${arrivals.length} " +
      s"pairs_stream=${ndStream.length} pairs_batch=${ndBatch.length} " +
      s"set_equal=${ndSet == ndBatch.toSet} " +
      s"stream_sec=${"%.1f".format(streamSec3)} batch_sec=${"%.1f".format(batchSec3)}")
    // ---- fourth leg: FINGERPRINT GATE parity (image modality) -------
    // the q162 fabricated corpus: 200 image groups of near-copies; the
    // static corpus holds each group's MIN-id member (the canonical
    // anchor — the production ingest-dedup shape) and every other image
    // arrives as the stream, expected to flag against its anchor
    val imgSig = graft.operators.Multimodal.dhashSig(
        Tables.documents(spark, sfDir).select(col("doc_id"),
          graft.operators.Multimodal.fabricateNearDupImageCol(
            col("doc_id"), 200).as("content")),
        "doc_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val anchorIds = imgSig.groupBy(_._1 % 200).map(_._2.minBy(_._1)._1).toSet
    val anchors = imgSig.filter(t => anchorIds(t._1)).toSeq
      .toDF("doc_id", "sh")
    val fpArrivals = imgSig.filter(t => !anchorIds(t._1)).zipWithIndex.map {
      case ((id, sh), i) =>
        (id, new java.sql.Timestamp(t0 + (i % 3000).toLong * 1000L), sh)
    }.toSeq
    val tS4 = System.nanoTime()
    val fstream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q4 = Streams.hammingAgainstStream(
        fstream.toDF().toDF("doc_id", "ts", "sh"), "ts", "doc_id", "sh",
        anchors, "doc_id", "sh", maxHamming = 4)
      .writeStream.format("memory").queryName("hamgate_scale")
      .outputMode("append").start()
    val fchunk = math.max(1, fpArrivals.length / batches)
    fpArrivals.grouped(fchunk).foreach { g =>
      fstream.addData(g)
      q4.processAllAvailable()
    }
    q4.stop()
    val fpStream = spark.table("hamgate_scale").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val streamSec4 = (System.nanoTime() - tS4) / 1e9
    val tB4 = System.nanoTime()
    val fpBatch = Streams.hammingAgainstStream(
        fpArrivals.toDF("doc_id", "ts", "sh"), "ts", "doc_id", "sh",
        anchors, "doc_id", "sh", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batchSec4 = (System.nanoTime() - tB4) / 1e9
    val fpSet = fpStream.toSet
    val ok4 = fpStream.length == fpSet.size && fpSet == fpBatch.toSet
    println(s"[streamscale] ${if (ok4) "PASS" else "FAIL"} fingerprint_gate " +
      s"anchors=${anchorIds.size} arrivals=${fpArrivals.length} " +
      s"pairs_stream=${fpStream.length} pairs_batch=${fpBatch.length} " +
      s"set_equal=${fpSet == fpBatch.toSet} " +
      s"stream_sec=${"%.1f".format(streamSec4)} batch_sec=${"%.1f".format(batchSec4)}")
    spark.stop()
    if (!ok || !ok2 || !ok3 || !ok4) sys.exit(1)
  }
}
