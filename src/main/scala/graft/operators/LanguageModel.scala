package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the KenLM-style
  * quality gate of large-scale training-data pipelines: documents
  * whose token transitions are improbable under a model trained on
  * the corpus itself (boilerplate, mangled encodings, keyword stuffing)
  * score low and can be filtered or bucketed.
  *
  * Shuffle shape at 100 TB: both the bigram and unigram tables start
  * from IN-ROW count maps ([[graft.plans.Kernels.pairCounts]] /
  * `termCounts`), so multiplicity never crosses the wire — the train
  * shuffles carry one row per distinct (doc, gram). Scoring re-joins
  * the per-doc grams against the model on the gram key (cardinality
  * grows with corpus vocabulary, no single-reducer stage) and the
  * vocabulary size rides in as a broadcast literal.
  */
object LanguageModel {

  /** Add-one-smoothed bigram log-likelihood per document:
    * `avg over bigram occurrences of ln((c(w1 w2)+1)/(c(w1)+V))` where
    * counts are corpus totals and `V` is the distinct-unigram vocabulary.
    *
    * Cross-engine determinism: per-bigram log-probs are snapped to
    * INTEGER micro-nats (`round(ln·10⁶)` — a transcendental essentially
    * never sits on the .5 boundary), so the weighted total is exact
    * integer arithmetic and the final mean is one IEEE division of
    * identical integers in every engine. Rounding the mean itself is
    * what breaks: a mean of 1e-6-grid values over an integer
    * denominator lands ON rounding boundaries structurally (measured: 5
    * of 500 docs flipped by exactly 1e-6 against DuckDB).
    * Documents with fewer than two tokens have no bigrams and drop out.
    */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairTf = df.select(col(idCol).as("doc_id"),
        explode(Exprs.pairCounts(col(textCol))).as(Seq("pair", "tf_i")))
      .select(col("doc_id"), col("pair"), col("tf_i").cast("long").as("tf"))
    val uniTf = df.select(col(idCol).as("doc_id"),
        explode(Exprs.termCounts(col(textCol))).as(Seq("term", "utf_i")))
      .select(col("doc_id"), col("term"), col("utf_i").cast("long").as("utf"))
    val bigramC = pairTf.groupBy(col("pair")).agg(sum(col("tf")).as("bc"))
    val uniC = uniTf.groupBy(col("term")).agg(sum(col("utf")).as("uc"))
    val vocab = uniC.select(count(lit(1)).as("v"))
    pairTf
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .join(bigramC, "pair")
      .join(uniC.withColumnRenamed("term", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_micro",
        round(log((col("bc") + 1).cast("double") /
          (col("uc") + col("v")).cast("double")) * lit(1e6)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        (sum(col("tf") * col("lp_micro")).cast("double") /
          (sum(col("tf")) * lit(1000000L)).cast("double")).as("avg_logprob"))
  }
}
