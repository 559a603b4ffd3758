package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-bounded equi-join: the salting pattern for keys whose
  * frequency makes a plain shuffle join collapse onto a few reducers
  * (AQE's skew-join split handles moderate skew automatically; salting
  * is the explicit tool when one key is pathological — a boilerplate
  * document, a null-ish default, a celebrity user).
  *
  * Left side: each row gets a random-but-deterministic salt in
  * [0, buckets); right side: each row is replicated `buckets` times,
  * once per salt value. The join key becomes (key, salt), spreading a
  * hot key over `buckets` reducers. Replication cost is |right| ×
  * buckets — use when right is the smaller side but too big to
  * broadcast outright.
  */
object SkewJoin {

  /** Join-key skew diagnosis: the `topN` heaviest key values with row
    * counts and corpus share — the report that decides whether a join
    * needs [[saltedEquiJoin]] (or AQE skew splitting) and how many salt
    * buckets. One partial+final aggregation on the key plus a bounded
    * top-N; at any scale the shuffled state is one count per distinct
    * key and the result is `topN` rows.
    */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.select(count(lit(1)).as("_total"))
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(total))
      .withColumn("share", col("n_rows").cast("double") / col("_total"))
      .drop("_total")
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
  }

  /** Left-preserving join types only: the right side is replicated
    * `buckets` times, so a right-preserving join (right/full outer)
    * would emit each unmatched right row once per replica.
    */
  private val allowedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(allowedJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "_")),
      s"saltedEquiJoin replicates the right side, so only left-preserving " +
        s"join types are well-defined; got '$joinType'")
    // deterministic salt (hash of whole left row modulo buckets) so
    // results are reproducible run-to-run, unlike rand()-based salting
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val saltedRight = right
      .withColumn("_salt", explode(array((0 until buckets).map(lit(_)): _*)))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLeft.join(saltedRight,
        saltedLeft("_salt") === saltedRight("_salt") &&
          saltedLeft(key) === saltedRight(key), joinType)
      .drop("_salt")
      .drop(saltedRight(key))
  }
}
