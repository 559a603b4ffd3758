package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 lexical retrieval over the corpus — the standard ranking
  * function of full-text search and the lexical half of hybrid
  * (BM25 + embedding) retrieval stacks; beside [[TfIdf]] it adds the
  * document-length normalization and term-saturation that make scores
  * comparable across heterogeneous corpora.
  *
  * Shuffle shape at 100 TB: term frequencies come from the in-row
  * [[graft.plans.Kernels.termCounts]] map (multiplicity never crosses
  * the wire), document frequencies aggregate on the term key, and the
  * bounded query set reaches the corpus via a BROADCAST join on term —
  * the corpus never shuffles for the probe. N and avgdl ride in as a
  * broadcast 1-row frame.
  *
  * Cross-engine determinism: each (query, doc, term) partial score is
  * snapped to integer micro-units before the per-doc sum (the
  * [[LanguageModel]] convention), so ranking compares exact integers.
  */
object Bm25 {

  /** Top-`topK` documents per query, scored
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))`. Returns
    * (query_id, doc_id, score, rank); only documents sharing ≥ 1 term
    * with the query are candidates.
    */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
              queries: Seq[(Long, String)], k1: Double = 1.2, b: Double = 0.75,
              topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs.select(col(idCol).as("doc_id"),
        Exprs.scanTokens(col(textCol)).cast("long").as("dl"),
        explode(Exprs.termCounts(col(textCol))).as(Seq("term", "tf_i")))
      .select(col("doc_id"), col("dl"), col("term"), col("tf_i").cast("long").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(Exprs.scanTokens(col(textCol)).cast("long")).as("toks"))
    val qterms = queries
      .flatMap { case (qid, q) =>
        q.toLowerCase(java.util.Locale.ROOT).split(graft.plans.Kernels.WsRun).filter(_.nonEmpty).distinct.map(t => (qid, t))
      }.toDF("query_id", "term")
    val scored = tf
      .join(broadcast(qterms), "term")
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("toks").cast("double") / col("n").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s_micro",
        round(col("idf") * (col("tf") * lit(k1 + 1)).cast("double") /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))) * lit(1e6))
          .cast("long"))
    val totals = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s_micro")).as("t_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("t_micro").desc, col("doc_id"))
    totals.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"),
        (col("t_micro").cast("double") / 1e6).as("score"),
        col("rank").cast("long").as("rank"))
  }
}
