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

  /** Heaps'-law vocabulary-growth curve — "how fast does the corpus
    * stop teaching the tokenizer new words": distinct-term count after
    * each of `points` id-ordered corpus prefixes. A flattening curve
    * means additional data is re-treading vocabulary (crawl saturation,
    * or a near-dup-heavy source); a straight line means the corpus is
    * still novel — the health check run before buying more of a feed.
    *
    * Prefix boundaries are an integer grid over the id RANGE
    * (`mn + (mx−mn)·k/points`, exact Long arithmetic — no percentile
    * interpolation, no global window, no order-by). The curve is
    * exactly reproducible: term → min(doc_id) is one vocabulary-keyed
    * hash agg, and each term then joins the broadcast grid once.
    *
    * 100 TB shape: one (doc,term) distinct projection (in-row term
    * maps, multiplicity never shuffles), one vocab-keyed agg, one
    * broadcast join against `points` rows, one `points`-keyed count.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  points: Int = 10): DataFrame = {
    require(points >= 1 && points <= 1000, s"points in [1,1000], got $points")
    val mm = df.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head()
    if (mm.isNullAt(0)) {
      // empty input keeps the (k, b, n_terms) contract so downstream
      // schema-dependent consumers (joins, unions) still resolve
      import df.sparkSession.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("k", "b", "n_terms")
    }
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    // BigInt grid: (mx-mn)*k overflows Long for extreme id ranges
    // (mx-mn > Long.MaxValue/points); both divisions truncate toward
    // zero on a non-negative range, so values are unchanged in-range
    val bounds = (1 to points).map(k =>
      (k.toLong, (BigInt(mn) + (BigInt(mx) - BigInt(mn)) * k / points).toLong))
    val boundsDf = {
      import df.sparkSession.implicits._
      bounds.toDF("k", "b")
    }
    val tmin = df.select(col(idCol).cast("long").as("doc_id"),
        explode(graft.plans.Exprs.termCounts(col(textCol))).as(Seq("term", "_tf")))
      .groupBy(col("term")).agg(min(col("doc_id")).as("md"))
    tmin.join(broadcast(boundsDf), col("md") <= col("b"))
      .groupBy(col("k"), col("b"))
      .agg(count(lit(1)).as("n_terms"))
  }

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
