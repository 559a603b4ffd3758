package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {

  private def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("forwardFill: hourly grid spans [min, max] per key and carries the last value") {
    import spark.implicits._
    // user 1: events at 0min (v=1), 90min (v=2) → grid 0h, 1h
    // user 2: single event → single grid point
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(90), 2.0),
      (2L, ts(10), 9.0)).toDF("user_id", "ts", "v")
    val out = Resample.forwardFill(df, Seq("user_id"), "ts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(out === Set(
      (1L, ts(0), 1.0),   // grid point = first observation
      (1L, ts(60), 1.0),  // forward-filled: 90min event is in the future
      (2L, ts(10), 9.0)))
  }

  test("snapped origin puts grid points on calendar boundaries; pre-observation points carry null") {
    import spark.implicits._
    // event at 10min past the hour → snapped grid starts at the hour
    // with a null, then fills from the observation onward
    val base = java.sql.Timestamp.valueOf("2024-03-01 05:10:00")
    val later = java.sql.Timestamp.valueOf("2024-03-01 06:30:00")
    val df = Seq((1L, base, 2.0), (1L, later, 7.0)).toDF("user_id", "ts", "v")
    val out = Resample.forwardFill(df, Seq("user_id"), "ts", Seq("v"),
        snapOriginTo = Some("hour"))
      .orderBy(col("grid_ts"))
      .collect().map(r => (r.getTimestamp(1).toString, Option(r.get(2)))).toSeq
    assert(out === Seq(
      ("2024-03-01 05:00:00.0", None),      // before first observation
      ("2024-03-01 06:00:00.0", Some(2.0)))) // carried forward
  }

  test("forwardFill with a finer step fills between observations") {
    import spark.implicits._
    val df = Seq((1L, ts(0), 1.0), (1L, ts(45), 5.0)).toDF("user_id", "ts", "v")
    val out = Resample.forwardFill(df, Seq("user_id"), "ts", Seq("v"),
        step = "INTERVAL 15 MINUTES")
      .orderBy(col("grid_ts"))
      .collect().map(r => r.getDouble(2)).toSeq
    assert(out === Seq(1.0, 1.0, 1.0, 5.0)) // 0, 15, 30, 45 minutes
  }

  test("forwardFillGaps is value-identical to forwardFill on a randomized fixture") {
    import spark.implicits._
    // the gap-emit formulation must reproduce the grid-asof output
    // bit-for-bit: random users, random micro-offset timestamps,
    // single-event users, events exactly ON grid points, dense runs
    // (successive events inside one hour → some events cover NO grid
    // point), and a multi-column payload
    val rng = new scala.util.Random(59)
    val rows = (0 until 40).flatMap { u =>
      val n = 1 + rng.nextInt(6)
      val tss = scala.collection.mutable.Set.empty[Long]
      while (tss.size < n) {
        val base = 1700000000000L + rng.nextInt(96) * 3600000L
        val off = rng.nextInt(4) match {
          case 0 => 0L                       // exactly on the hour
          case 1 => rng.nextInt(3600000)     // anywhere in the hour
          case 2 => rng.nextInt(60) * 1000L  // on a second boundary
          case _ => rng.nextInt(1000)        // sub-second, dense
        }
        tss += base + off
      }
      tss.toSeq.map(t => (u.toLong, new java.sql.Timestamp(t),
        rng.nextInt(100).toDouble, s"s$u-${t % 7}"))
    }
    val df = rows.toDF("user_id", "ts", "v", "tag").repartition(7)
    def canon(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.toString).getOrElse("null"),
        Option(r.get(3)).map(_.toString).getOrElse("null"))).toSeq.sorted
    for (snap <- Seq(None, Some("hour"))) {
      val a = canon(Resample.forwardFill(df, Seq("user_id"), "ts",
        Seq("v", "tag"), snapOriginTo = snap))
      val b = canon(Resample.forwardFillGaps(df, Seq("user_id"), "ts",
        Seq("v", "tag"), snapOriginTo = snap))
      assert(a === b, s"snap=$snap")
      assert(a.nonEmpty)
    }
    // finer step too (15 min)
    val a15 = canon(Resample.forwardFill(df, Seq("user_id"), "ts",
      Seq("v", "tag"), step = "INTERVAL 15 MINUTES", snapOriginTo = Some("hour")))
    val b15 = canon(Resample.forwardFillGaps(df, Seq("user_id"), "ts",
      Seq("v", "tag"), stepSeconds = 900L, snapOriginTo = Some("hour")))
    assert(a15 === b15)
  }
}
