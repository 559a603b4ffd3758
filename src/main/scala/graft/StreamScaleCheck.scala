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
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
