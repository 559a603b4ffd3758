package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the engine's `SUMMARIZE`/`describe` analog for
  * data-quality gates: one row per requested column with count, null
  * count, min/max, mean.
  *
  * ONE scan regardless of column count: all 5·k aggregates run in a
  * single partial+final global aggregation (state = 5·k scalars, so
  * the single final reducer is trivially safe at any data size), then
  * `stack` pivots the 1×5k row into long format without touching the
  * data again.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"),
      avg(col(c)).cast("double").as(s"${c}__mean")))
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, coalesce(`${c}__nulls`, 0L), `${c}__min`, `${c}__max`, " +
        s"round(`${c}__mean`, 6)").mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, n, nulls, min, max, mean)")
  }
}
