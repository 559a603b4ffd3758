package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the spill-floor preflight guard (r18 verdict #2): the measured
  * 0.375 GB/slot boundary from SCALE.md r18 becomes an up-front check
  * with an actionable message instead of an obscure
  * UnsafeSorterSpillWriter OOM. */
class PreflightSpec extends AnyFunSuite {

  private val gb = 1L << 30

  test("configurations at or above the measured floor pass") {
    // the r18 surviving leg: 3 g / 8 slots = 0.375 GB/slot (the floor)
    assert(Preflight.heapPerSlotWarning(3 * gb, 8).isEmpty)
    // the standard sizing: 1 GB/core (2.5x above the floor)
    assert(Preflight.heapPerSlotWarning(32 * gb, 32).isEmpty)
    // degenerate slots are clamped, not divide-by-zero
    assert(Preflight.heapPerSlotWarning(8 * gb, 0).isEmpty)
  }

  test("the r18 dying configuration (3 g / 32 slots) refuses with guidance") {
    val msg = Preflight.heapPerSlotWarning(3 * gb, 32)
    assert(msg.isDefined)
    assert(msg.get.contains("0.09 GB/slot"))
    assert(msg.get.contains("UnsafeSorterSpillWriter"))
    assert(msg.get.contains("SCALE.md"))
    assert(msg.get.contains("SPARK_GRAFT_CPUS"))
  }

  test("the floor constant is the measured 0.375 GB/slot") {
    assert(Preflight.SpillFloorBytesPerSlot === (0.375 * gb).toLong)
    // one byte under the floor trips, the floor itself passes
    assert(Preflight.heapPerSlotWarning(
      Preflight.SpillFloorBytesPerSlot - 1, 1).isDefined)
    assert(Preflight.heapPerSlotWarning(
      Preflight.SpillFloorBytesPerSlot, 1).isEmpty)
  }

  // ---- r19 reader-batch ceiling (r19 verdict #1) -----------------------

  test("the r19 OOM configuration (4096-row batch, 2.6 MB docs, 16 tasks, 8 g) " +
      "refuses with the sized-down recipe") {
    val msg = Preflight.readerBatchWarning(8 * gb, 16, 4096, 2600000L)
    assert(msg.isDefined)
    assert(msg.get.contains("columnarReaderBatchSize=4096"))
    assert(msg.get.contains("OOMs"))
    assert(msg.get.contains("SCALE.md"))
    assert(msg.get.contains("ABDocLength"))
    // the emitted recipe is the measured surviving batch size
    assert(msg.get.contains("columnarReaderBatchSize=32 "))
  }

  test("the measured surviving configuration (32-row batch) passes, and the " +
      "recommendation reproduces ABDocLength's recipe") {
    assert(Preflight.readerBatchWarning(8 * gb, 16, 32, 2600000L).isEmpty)
    assert(Preflight.recommendedReaderBatch(8 * gb, 16, 2600000L) === 32)
    // a normal corpus (sub-KB documents) never trips at the default
    assert(Preflight.readerBatchWarning(8 * gb, 32, 4096, 600L).isEmpty)
    // recommendation is floored at 8 even for absurd rows, and capped
    // at the 4096 default for tiny ones
    assert(Preflight.recommendedReaderBatch(8 * gb, 32, Long.MaxValue / 64) === 8)
    assert(Preflight.recommendedReaderBatch(8 * gb, 32, 1L) === 4096)
  }

  test("the reader budget boundary is exact (reservation == heap/4 passes)") {
    // heap 4 GB -> budget 1 GB; 1024 rows x 1 MB x 1 slot == budget
    assert(Preflight.readerBatchWarning(4 * gb, 1, 1024, 1L << 20).isEmpty)
    assert(Preflight.readerBatchWarning(4 * gb, 1, 1025, 1L << 20).isDefined)
    // degenerate slots/rowBytes clamp instead of dividing by zero
    assert(Preflight.readerBatchWarning(4 * gb, 0, 4096, 0L).isEmpty)
  }
}

/** Live half of the reader-batch guard: the probe scan must run at the
  * guard's own floor batch (not the configured one it is checking —
  * at the configured size the probe would reserve the very vectors it
  * exists to warn about and die of the OOM it diagnoses) and restore
  * the session conf afterwards, on the warning path too. */
class PreflightLiveSpec extends SparkSpec {
  test("checkReaderBatch probes safely and restores columnarReaderBatchSize") {
    import spark.implicits._
    val key = "spark.sql.parquet.columnarReaderBatchSize"
    val dir = java.nio.file.Files.createTempDirectory("preflight_live").toString
    Seq(("d1", "x" * 4096), ("d2", "y" * 128)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val before = spark.conf.getOption(key)
    try {
      // configured batch size so extreme the estimate ALWAYS warns —
      // the lenient call must survive (probe at floor batch) and the
      // conf must come back to the pre-call value, not the probe's 8
      spark.conf.set(key, "1048576")
      Preflight.checkReaderBatch(spark, spark.read.parquet(dir),
        Seq("text"), lenient = true)
      assert(spark.conf.get(key) === "1048576")
      // non-lenient: the refusal fires AFTER the probe, conf restored
      val e = intercept[IllegalArgumentException] {
        Preflight.checkReaderBatch(spark, spark.read.parquet(dir), Seq("text"))
      }
      assert(e.getMessage.contains("columnarReaderBatchSize"))
      assert(spark.conf.get(key) === "1048576")
      // an unset key restores to its effective (default) value — true
      // unset-restore is impossible: RuntimeConfig.getOption surfaces
      // the registered default for a never-set key (this pin documents
      // that measured behavior), so explicit-vs-default is not
      // observable and re-setting the effective value is equivalent
      // for the session's lifetime
      spark.conf.unset(key)
      assert(spark.conf.getOption(key) === Some("4096"),
        "RuntimeConfig no longer surfaces the default for an unset key — " +
          "revisit checkReaderBatch's restore, a true unset-restore may " +
          "now be possible")
      Preflight.checkReaderBatch(spark, spark.read.parquet(dir),
        Seq("text"), lenient = true)
      assert(spark.conf.get(key) === "4096")
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
