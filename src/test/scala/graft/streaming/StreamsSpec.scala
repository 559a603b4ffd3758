package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming specs: drive the operators through a real
  * MemoryStream → writeStream micro-batch loop and assert the stream
  * results equal the identical batch computation on the same rows —
  * the unified-API contract the module is built on.
  */
class StreamsSpec extends SparkSpec {

  import Streams._

  private def mkEvents(n: Int): Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    (0 until n).map { i =>
      val user = (i % 7).toLong
      // bursts with gaps: each user's events cluster into sessions
      val ts = new java.sql.Timestamp(1700000000000L + (i / 7) * 600000L + (i % 3) * 1000L)
      (user, ts, i.toLong, if (i % 2 == 0) "view" else "click", (i % 10).toDouble)
    }

  test("windowedCounts: streaming micro-batches equal the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents(500)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = windowedCounts(streamDf, "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    // two micro-batches to exercise incremental state
    stream.addData(events.take(250))
    out.processAllAvailable()
    stream.addData(events.drop(250))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("win_out")
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("sum_value"), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = windowedCounts(events.toDF("user_id", "ts", "event_id", "event_type", "value"),
        "10 minutes")
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("sum_value"), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("driftStream: windowed PSI across micro-batches equals the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents(500)
    val baseline = Array(0.25, 0.25, 0.25, 0.25)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = driftStream(streamDf, "ts", "value", "10 minutes",
        lo = 0.0, hi = 100.0, bins = 4, baseline = baseline)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").start()
    stream.addData(events.take(250))
    out.processAllAvailable()
    stream.addData(events.drop(250))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("drift_out").collect().map(_.toSeq).toSet
    val batch = driftStream(
        events.toDF("user_id", "ts", "event_id", "event_type", "value"),
        "ts", "value", "10 minutes", 0.0, 100.0, 4, baseline)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // a window whose empirical distribution matches the baseline
    // exactly would score ~0; shifted data must score positive
    assert(spark.table("drift_out").agg(max(col("psi"))).head().getDouble(0) >= 0.0)
  }

  test("ksStream: stream == batch, and on-grid windows equal Stats.ksTest exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // grid-quantized values (integers 0..15 on a [0,16)/16-bin grid):
    // the documented exactness contract — binned D IS the exact D
    val events = (0 until 480).map { i =>
      val ts = new java.sql.Timestamp(1700000000000L + (i / 240) * 600000L + (i % 5) * 1000L)
      // first window roughly uniform, second window right-shifted
      val v = if (i < 240) (i % 16).toDouble else (8 + (i % 8)).toDouble
      (i.toLong, ts, v)
    }
    // baseline: uniform-ish histogram over the same 16 bins
    val baselineSample = (0 until 320).map(i => (i % 16).toDouble)
    val baselineBins = Array.tabulate(16)(b => baselineSample.count(_ == b).toLong)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val streamDf = stream.toDF().toDF("event_id", "ts", "value")
    val out = ksStream(streamDf, "ts", "value", "10 minutes",
        lo = 0.0, hi = 16.0, bins = 16, baselineBins = baselineBins)
      .writeStream.format("memory").queryName("ks_out")
      .outputMode("complete").start()
    stream.addData(events.take(200))
    out.processAllAvailable()
    stream.addData(events.drop(200))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("ks_out").collect().map(_.toSeq).toSet
    val batchDf = events.toDF("event_id", "ts", "value")
    val batch = ksStream(batchDf, "ts", "value", "10 minutes",
        0.0, 16.0, 16, baselineBins)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 2)
    // per-window exact parity with the batch two-sample operator on
    // the union of that window's rows and the baseline sample
    for (w <- Seq(0, 1)) {
      val winRows = events.filter(_._2.getTime / 600000L % 2 == w).map(_._3)
      val union = (winRows.map(("w", _)) ++ baselineSample.map(("b", _))).toDF("g", "v")
      val want = graft.operators.Stats.ksTest(union, "v", "g", "w", "b").head()
      val got = spark.table("ks_out")
        .filter(col("window_start").cast("long") / 600 % 2 === w).head()
      assert(got.getAs[Long]("n_win") === want.getAs[Long]("n_a"), s"window $w")
      assert(got.getAs[Long]("n_base") === want.getAs[Long]("n_b"), s"window $w")
      assert(got.getAs[Double]("d_stat") === want.getAs[Double]("d_stat"), s"window $w")
      assert(got.getAs[Double]("at_value") === want.getAs[Double]("at_value"), s"window $w")
    }
  }

  test("percentileStream: stream == batch, and brackets contain the exact percentiles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 480).map { i =>
      val ts = new java.sql.Timestamp(1700000000000L + (i / 240) * 600000L + (i % 5) * 1000L)
      // window 0: uniform over [0,64); window 1: concentrated high
      val v = if (i < 240) (i * 37 % 64).toDouble else (48 + i * 11 % 16).toDouble
      (i.toLong, ts, v)
    }
    val ps = Seq(0.5, 0.95)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val streamDf = stream.toDF().toDF("event_id", "ts", "value")
    val out = percentileStream(streamDf, "ts", "value", "10 minutes",
        lo = 0.0, hi = 64.0, bins = 16, percentiles = ps)
      .writeStream.format("memory").queryName("pct_out")
      .outputMode("complete").start()
    stream.addData(events.take(150))
    out.processAllAvailable()
    stream.addData(events.drop(150))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("pct_out").collect().map(_.toSeq).toSet
    val batch = percentileStream(events.toDF("event_id", "ts", "value"),
        "ts", "value", "10 minutes", 0.0, 64.0, 16, ps)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch, "micro-batched result must equal one-shot batch")
    assert(streamed.size === 4, "2 windows x 2 percentiles")
    // the emitted bin bracket must contain the EXACT within-window
    // percentile (rank ⌈p·n⌉ order statistic, brute-forced)
    for (w <- Seq(0, 1); p <- ps) {
      val winRows = events.filter(_._2.getTime / 600000L % 2 == w)
        .map(_._3).sorted
      val exact = winRows((math.ceil(p * winRows.size).toLong - 1).toInt)
      val got = spark.table("pct_out")
        .filter(col("window_start").cast("long") / 600 % 2 === w &&
          col("p") === p).head()
      assert(got.getAs[Double]("lo_bound") <= exact &&
        exact < got.getAs[Double]("hi_bound"),
        s"window $w p$p: exact $exact outside " +
          s"[${got.getAs[Double]("lo_bound")}, ${got.getAs[Double]("hi_bound")})")
    }
  }

  test("heavyHittersStream: windowed top terms equal the batch computation (sub-capacity exact)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // term universe (7 event "types") far below capacity 64 -> the MG
    // sketch is exact per window, so stream == batch == true counts
    // regardless of micro-batch arrival order
    val events = mkEvents(500).map { case (u, ts, id, _, v) =>
      (u, ts, id, s"term${id % 7}", v)
    }
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = heavyHittersStream(streamDf, "ts", "event_type",
        "10 minutes", capacity = 64, topN = 3)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    stream.addData(events.take(137))
    out.processAllAvailable()
    stream.addData(events.drop(137))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("hh_out").collect().map(_.toSeq).toSet
    val batchDf = events.toDF("user_id", "ts", "event_id", "event_type", "value")
    val batch = heavyHittersStream(batchDf, "ts", "event_type",
        "10 minutes", capacity = 64, topN = 3)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // ranks are 1..3 per window and est_count equals the exact count
    val exact = batchDf
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    spark.table("hh_out").collect().foreach { r =>
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3)
      assert(r.getAs[Long]("est_count") ==
        exact((r.get(0), r.getAs[String]("term"))))
    }
  }

  test("distinctCountStream: windowed KMV estimates equal batch exactly (order-free merge)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents(500)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    // k=8 far BELOW the ~42 distinct event_ids per hour window: parity
    // must hold even in the estimating regime (the k-min set is
    // order-independent)
    val out = distinctCountStream(streamDf, "ts", "event_id", "60 minutes", k = 8)
      .writeStream.format("memory").queryName("dc_out")
      .outputMode("complete").start()
    stream.addData(events.take(333))
    out.processAllAvailable()
    stream.addData(events.drop(333))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("dc_out").collect().map(_.toSeq).toSet
    val batchDf = events.toDF("user_id", "ts", "event_id", "event_type", "value")
    val batch = distinctCountStream(batchDf, "ts", "event_id", "60 minutes", k = 8)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and in the exact regime (k > distinct) the estimate IS the count
    val exactOut = distinctCountStream(batchDf, "ts", "user_id", "10 minutes", k = 64)
    val truth = batchDf
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(countDistinct(col("user_id")).cast("double").as("d"))
      .select(col("w.start"), col("d"))
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap
    exactOut.collect().foreach { r =>
      assert(r.getAs[Double]("est_distinct") == truth(r.get(0)))
    }
  }

  test("dedupStream drops cross-batch re-deliveries, keeping state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Streams.dedupStream(
        stream.toDF().toDF("event_id", "ts", "payload"), "event_id", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = new java.sql.Timestamp(1700000000000L)
    stream.addData(Seq((1L, t0, "a"), (2L, t0, "b"), (1L, t0, "a-dup-in-batch")))
    out.processAllAvailable()
    // batch 2 re-delivers event 1 and 2 (same key+ts) and adds event 3
    stream.addData(Seq((1L, t0, "a-redelivery"), (2L, t0, "b-redelivery"),
      (3L, t0, "c")))
    out.processAllAvailable()
    out.stop()
    val rows = spark.table("dedup_out").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("curateStream: quality gate + content dedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = graft.operators.QualityClassifier.pseudoWeights(4096)
    val t0 = 1700000000000L
    val docs = (0 until 60).map(i =>
      (i.toLong, new java.sql.Timestamp(t0 + i * 1000L),
        (0 to i % 9).map(j => s"tok${(i * 3 + j) % 40}").mkString(" ")))
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Streams.curateStream(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", w, minScore = 0.5)
      .select(col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    stream.addData(docs.take(30))
    out.processAllAvailable()
    // batch 2 re-delivers five already-kept texts (different doc ids /
    // ts) and adds the rest — content dedup must drop the re-deliveries
    val kept1 = spark.table("curate_out").select(col("text")).as[String].collect().toSet
    val redelivered = docs.filter(d => kept1.contains(d._3)).take(5)
      .map { case (id, ts, t) => (id + 10000, new java.sql.Timestamp(ts.getTime + 1000), t) }
    stream.addData(docs.drop(30) ++ redelivered)
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("curate_out").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // every surviving text is unique and above the gate
    assert(streamed.map(_._2).distinct.length === streamed.length)
    assert(streamed.forall { case (_, t) =>
      graft.plans.Kernels.linearTextScore(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), w) >= 0.5
    })
    // no re-delivered id survived
    assert(streamed.forall(_._1 < 10000))
    // and the kept set equals the batch equivalent on the same rows
    val batch = Streams.curateStream(
        docs.toDF("doc_id", "ts", "text"), "text", "ts", w, minScore = 0.5)
      .select(col("text")).as[String].collect().toSet
    assert(streamed.map(_._2).toSet === batch)
    assert(streamed.nonEmpty)
  }

  test("contaminationStream: planted benchmark copies flagged, stream == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six seven")).toDF("bid", "text")
    val t0 = 1700000000000L
    // 40 docs over 4 ten-minute windows; every 8th is a verbatim
    // benchmark copy (overlap 1.0), the rest fresh vocab (overlap 0)
    val docs = (0 until 40).map { i =>
      val text =
        if (i % 8 == 0) (if (i % 16 == 0) "alpha beta gamma delta epsilon zeta"
                         else "one two three four five six seven")
        else (0 until 8).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, new java.sql.Timestamp(t0 + i * 60000L), text)
    }
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Streams.contaminationStream(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
        bench, "text", minOverlap = 0.5, windowDur = "10 minutes")
      .writeStream.format("memory").queryName("contam_out")
      .outputMode("complete").start()
    stream.addData(docs.take(17))
    out.processAllAvailable()
    stream.addData(docs.drop(17))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("contam_out").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // every doc lands in exactly one clock-aligned window; the five
    // verbatim copies (i = 0, 8, 16, 24, 32) are the only flagged docs
    // and score exactly 1.0 wherever they appear
    assert(streamed.toSeq.map(_._2).sum === 40L, s"windows: $streamed")
    assert(streamed.toSeq.map(_._3).sum === 5L)
    assert(streamed.forall(w => if (w._3 > 0) w._4 === 1.0 else w._4 === 0.0))
    // unified-API contract: identical batch computation, identical rows
    val batch = Streams.contaminationStream(
        docs.toDF("doc_id", "ts", "text"), "text", "ts",
        bench, "text", minOverlap = 0.5, windowDur = "10 minutes")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed === batch)
  }

  test("contaminationStream: benchmark past maxBenchShingles is refused, raise enumerates") {
    import spark.implicits._
    val bench = Seq((0L, "alpha beta gamma delta epsilon zeta"))
      .toDF("bid", "text")
    val docs = Seq((0L, new java.sql.Timestamp(1700000000000L), "alpha beta gamma"))
      .toDF("doc_id", "ts", "text")
    // the 6-token benchmark yields 4 distinct 3-shingles > cap 2
    val e = intercept[IllegalArgumentException] {
      Streams.contaminationStream(docs, "text", "ts", bench, "text",
        maxBenchShingles = 2)
    }
    assert(e.getMessage.contains("maxBenchShingles"))
    assert(e.getMessage.contains("contaminationRate"))
    // explicit raise builds the literal and runs
    assert(Streams.contaminationStream(docs, "text", "ts", bench, "text",
      maxBenchShingles = 100).count() >= 1L)
  }

  test("ingest gates refuse a tsCol that collides with reserved intermediates") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c")).toDF("cid", "text")
    val in = Seq((2L, new java.sql.Timestamp(0L), "a b c")).toDF("id", "t", "text")
    val e1 = intercept[IllegalArgumentException] {
      // tsCol named like blockKeyed's combo-id intermediate
      Streams.hammingAgainstStream(
        in.withColumn("sh2", lit(0L)), "t", "id", "sh2",
        corpus.withColumn("csh", lit(0L)), "cid", "csh", maxHamming = 2)
    }
    assert(e1.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException] {
      Streams.nearDupAgainstStream(
        in.withColumnRenamed("t", "bh"), "text", "bh", "id",
        corpus, "text", "cid")
    }
    assert(e2.getMessage.contains("reserved"))
    // renamed-away columns stay legal: shCol "sh" / idCol "id" are the
    // kernel's own working names (the pre-guard contract, still green)
    val okIn = Seq((2L, new java.sql.Timestamp(0L), 5L)).toDF("id", "ts", "sh")
    assert(Streams.hammingAgainstStream(okIn, "ts", "id", "sh",
      corpus.withColumn("csh", lit(5L)), "cid", "csh", maxHamming = 2)
      .count() >= 0L)
  }

  test("nearDupAgainstStream: planted near-dups flagged at ingest, stream == batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away home tonight"),
      (1L, "marine biodiversity observation networks record survey stations at depth"),
      (2L, "a completely unrelated reference document with its own private words"))
      .toDF("doc_id", "text")
    val t0 = 1700000000000L
    // 30 arrivals over two micro-batches: every 10th is a near-copy of
    // corpus doc 0 (one word changed), every 10th+1 a verbatim copy of
    // corpus doc 1; the rest fresh vocab (no candidate bands at all)
    val docs = (0 until 30).map { i =>
      val text =
        if (i % 10 == 0) "the quick brown fox jumps over the lazy cat and runs far away home tonight"
        else if (i % 10 == 1) "marine biodiversity observation networks record survey stations at depth"
        else (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      (100L + i, new java.sql.Timestamp(t0 + i * 60000L), text)
    }
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Streams.nearDupAgainstStream(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "doc_id",
        corpus, "text", "doc_id", threshold = 0.35)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    stream.addData(docs.take(13))
    out.processAllAvailable()
    stream.addData(docs.drop(13))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("neardup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the three near-copies of doc 0 and three verbatim copies of doc 1
    assert(streamed.map(_._2) === Set(100L, 110L, 120L, 101L, 111L, 121L))
    assert(streamed.filter(_._1 == 1L).forall(_._3 === 1.0),
      "verbatim copies must estimate 1.0")
    assert(streamed.forall(p => p._1 == 0L || p._1 == 1L))
    // unified-API contract: the BATCH twin (same code path) and the
    // original q82 operator both produce the identical pair set
    val batchDf = docs.toDF("doc_id", "ts", "text")
    val viaStreamPath = Streams.nearDupAgainstStream(
        batchDf, "text", "ts", "doc_id", corpus, "text", "doc_id",
        threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === viaStreamPath)
    val viaBatchOp = graft.operators.Dedup.minhashAgainst(
        corpus, batchDf, "text", "doc_id", threshold = 0.35)
      .select(col("existing_id"), col("incoming_id"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === viaBatchOp,
      "the streaming gate must equal the batch minhashAgainst (q82)")
  }

  test("nearDupAgainstStream: redelivered micro-batch rows do not re-emit pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((0L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val t0 = 1700000000000L
    val rows = Seq(
      (100L, new java.sql.Timestamp(t0), "the quick brown fox jumps over the lazy dog tonight"),
      (101L, new java.sql.Timestamp(t0 + 60000L), "totally different words here nothing shared at all"))
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Streams.nearDupAgainstStream(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "doc_id",
        corpus, "text", "doc_id", threshold = 0.35)
      .writeStream.format("memory").queryName("neardup_redeliver")
      .outputMode("append").start()
    stream.addData(rows)
    out.processAllAvailable()
    // at-least-once upstream: the SAME rows arrive again in a later
    // micro-batch — the within-watermark pair dedup must swallow them
    stream.addData(rows)
    out.processAllAvailable()
    out.stop()
    val emitted = spark.table("neardup_redeliver").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(emitted.toSeq === Seq((0L, 100L)),
      "exactly one pair emission despite redelivery")
  }

  test("hammingAgainstStream: flipped-bit fingerprints flagged, stream == batch == brute force") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(7)
    // 5 well-separated corpus fingerprints
    val corpusFp = (0 until 5).map(g => g.toLong -> rng.nextLong())
    val corpus = corpusFp.toDF("doc_id", "sh")
    val t0 = 1700000000000L
    // 30 arrivals: i % 3 == 0 → a corpus fingerprint with ≤ 3 bits
    // flipped (must match), else a fresh random fingerprint (may match
    // by chance — brute force decides)
    val arrivals = (0 until 30).map { i =>
      val sh =
        if (i % 3 == 0) {
          var v = corpusFp((i / 3) % 5)._2
          (0 until (i % 4)).foreach(b => v ^= 1L << ((i * 7 + b * 13) % 64))
          v
        } else rng.nextLong()
      (100L + i, new java.sql.Timestamp(t0 + i * 60000L), sh)
    }
    val expected = (for {
      (g, fp) <- corpusFp; (id, _, sh) <- arrivals
      d = java.lang.Long.bitCount(fp ^ sh) if d <= 3
    } yield (g, id, d.toLong)).toSet
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = Streams.hammingAgainstStream(
        stream.toDF().toDF("doc_id", "ts", "sh"), "ts", "doc_id", "sh",
        corpus, "doc_id", "sh", maxHamming = 3)
      .writeStream.format("memory").queryName("hamgate_out")
      .outputMode("append").start()
    stream.addData(arrivals.take(11))
    out.processAllAvailable()
    stream.addData(arrivals.drop(11))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("hamgate_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === expected,
      "block-combination keying guarantees recall at Hamming <= 3")
    assert(streamed.size >= 10, "the planted near-copies must all be flagged")
    val batch = Streams.hammingAgainstStream(
        arrivals.toDF("doc_id", "ts", "sh"), "ts", "doc_id", "sh",
        corpus, "doc_id", "sh", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("intervalJoin: stream-stream join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val views = (0 until 120).map(i =>
      ((i % 5).toLong, new java.sql.Timestamp(t0 + i * 60000L), i.toLong))
    val buys = (0 until 40).map(i =>
      ((i % 5).toLong, new java.sql.Timestamp(t0 + i * 170000L + 30000L), (1000 + i).toLong))
    val vStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val bStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = intervalJoin(
      vStream.toDF().toDF("user_id", "vts", "view_id"),
      bStream.toDF().toDF("user_id", "bts", "buy_id"),
      "user_id", "vts", "bts", lowerSec = 0, upperSec = 120)
    val out = joined.select(col("view_id"), col("buy_id"))
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    vStream.addData(views.take(60)); bStream.addData(buys.take(20))
    out.processAllAvailable()
    vStream.addData(views.drop(60)); bStream.addData(buys.drop(20))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("ij_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = intervalJoin(
        views.toDF("user_id", "vts", "view_id"),
        buys.toDF("user_id", "bts", "buy_id"),
        "user_id", "vts", "bts", lowerSec = 0, upperSec = 120)
      .select(col("view_id"), col("buy_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("funnelStream: stream conversion totals equal the batch suffix-min funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents(400)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val ds = stream.toDS().map { case (u, t, e, ty) => FunnelIn(u, t, e, ty) }
    val out = funnelStream(ds, gapSeconds = 900)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    stream.addData(events.take(200).map(e => (e._1, e._2, e._3, e._4)))
    out.processAllAvailable()
    stream.addData(events.drop(200).map(e => (e._1, e._2, e._3, e._4)))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("funnel_out")
      .groupBy(col("user_id"))
      .agg(last(col("n_views")).as("v"), last(col("n_converted")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch oracle: the q83 suffix-min formulation on the same rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val batch = events.toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("_next_click",
        min(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("v"),
        sum(when(col("_next_click").isNotNull &&
          col("_next_click").cast("double") - col("ts").cast("double") <= 900,
          1L).otherwise(0L)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.exists(_._3 > 0), "fixture must produce conversions")
  }

  test("sessionize: stateful stream totals equal the batch lag-based sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents(400)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ds = stream.toDS().map { case (u, t, e) => EventIn(u, t, e) }
    val out = sessionize(ds, gapSeconds = 300)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    stream.addData(events.take(200).map(e => (e._1, e._2, e._3)))
    out.processAllAvailable()
    stream.addData(events.drop(200).map(e => (e._1, e._2, e._3)))
    out.processAllAvailable()
    out.stop()
    // last update per user is the final running total
    val streamed = spark.table("sess_out")
      .withColumn("_r", monotonically_increasing_id())
      .groupBy(col("user_id"))
      .agg(last(col("n_sessions")).as("n_sessions"), last(col("n_events")).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch oracle: lag + gap threshold (the q31 pattern)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = events.toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 300, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("transitionStream: appended pairs equal the batch lag transition counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents(400)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val ds = stream.toDS().map { case (u, t, e, ty) => FunnelIn(u, t, e, ty) }
    val out = transitionStream(ds)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    // split mid-user so cross-batch state carries the last event over
    stream.addData(events.take(137).map(e => (e._1, e._2, e._3, e._4)))
    out.processAllAvailable()
    stream.addData(events.drop(137).map(e => (e._1, e._2, e._3, e._4)))
    out.processAllAvailable()
    out.stop()
    val streamed = spark.table("trans_out")
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = events.toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
