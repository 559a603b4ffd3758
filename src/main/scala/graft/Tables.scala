package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; these
  * helpers keep the path convention in one place. Reads are plain
  * parquet scans so Catalyst pushes filters/projections into the scan
  * (verify with `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader
    * truncates to microseconds (exactly what DuckDB's ns→us read does,
    * keeping oracle parity) and restores a proper TimestampType.
    *
    * The truncation MUST be integer division (`div`): the obvious
    * `(ts / 1000).cast("long")` routes through a double, and an
    * epoch-scale nanosecond count (~1.7e18 ≫ 2^53) rounds to a
    * 256 ns grid before dividing — measured +1 μs vs DuckDB on ~12%
    * of rows. Grouping/ordering queries survived that fuzz (the error
    * never inverts order, only ties it); exact μs arithmetic
    * (durations, integer time-weighted sums) would not.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // plain timestamp[us] parquet (isAdjustedToUTC=false) arrives as
      // TIMESTAMP_NTZ; every consumer (unix_micros, casts, windows)
      // expects the session type. All graft sessions pin the session
      // timezone to UTC, so this cast relabels the SAME micros value —
      // DuckDB's naive read of the file agrees integer-for-integer. In
      // any OTHER timezone the cast would silently shift every event
      // instead: fail loudly rather than corrupt oracle parity.
      case TimestampNTZType =>
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events(): the NTZ->TIMESTAMP relabel is value-preserving only " +
            "under spark.sql.session.timeZone=UTC (set by every graft entry " +
            s"point); session has '${spark.conf.get("spark.sql.session.timeZone")}'")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
