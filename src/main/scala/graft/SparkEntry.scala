package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog itself lives in [[Queries]]; each entry covers one or
  * more operators from SURVEY.md §2 or the training-data pipeline suite.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary: scan → filter → grouped agg, all
    * codegen'd built-ins (partial+final agg, filter pushed to parquet).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. As of round 4 EVERY catalog entry has an
    * oracle — the sketch/LSH pipelines are re-derived in SQL via
    * [[OracleSql]]'s mod-2^64 HUGEINT fragments, so nothing falls back
    * to the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
