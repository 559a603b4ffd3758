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
  /** Perplexity-gate curation: score every document with the corpus-
    * trained [[bigramScore]] LM, then drop the worst `dropFrac` tail
    * PER GROUP (per language, usually — a single global cutoff mostly
    * deletes whichever language the LM models worst; per-group
    * thresholds are the standard fix). Documents with fewer than two
    * tokens carry no bigrams and drop out of both scoring and output.
    *
    * Scale shape: the scored frame (one row per document) is persisted
    * once; the per-group cutoffs come from
    * [[Stats.groupedExactPercentiles]] (O(bins) aggregation state,
    * groups-bounded driver fold — never the built-in percentile's
    * values map) and ride back as ONE broadcast hash join; no global
    * window anywhere. The output is corpus-sized, so it is eagerly
    * lineage-truncated ([[Ckpt.truncate]]) and the internal caches are
    * released before returning.
    *
    * Cross-engine determinism: scores are exact-integer micro-nat
    * sums divided once (see [[bigramScore]]); the cutoff interpolates
    * between two such scores with Spark's own percentile arithmetic
    * (bit-identical to DuckDB's `quantile_cont`, pinned by q53/q104),
    * and when the bracketing scores are equal both engines return that
    * exact value — so `score >= cutoff` keeps the same set everywhere.
    */
  def perplexityGate(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, dropFrac: Double): DataFrame = {
    require(dropFrac > 0 && dropFrac < 1, s"dropFrac in (0,1), got $dropFrac")
    val scored = bigramScore(df, idCol, textCol)
      .join(df.select(col(idCol).as("doc_id"), col(groupCol).as("grp")), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cutoffs = Stats.groupedExactPercentiles(
        scored, "grp", "avg_logprob", Seq(dropFrac))
      .select(col("g").as("grp"), col("p_0").as("cutoff"))
    val out = Ckpt.truncate(scored
      .join(broadcast(cutoffs), Seq("grp"))
      .filter(col("avg_logprob") >= col("cutoff"))
      .select(col("doc_id"), col("grp"), col("n_bigrams"), col("avg_logprob")))
    scored.unpersist(blocking = false)
    out
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): every
    * document is assigned a per-language perplexity tercile — "head" is
    * the best-modeled third (highest avg log-prob), "tail" the worst —
    * the standard pre-mixing quality stratification (CCNet trains on
    * head+middle and drops or down-samples tail). Same machinery as
    * [[perplexityGate]] — corpus-trained bigram LM, rank-based exact
    * per-group percentiles, broadcast cutoff join — but producing an
    * ASSIGNMENT instead of a filter, so downstream samplers (q160/q173)
    * can weight buckets rather than lose the tail outright.
    *
    * Determinism: scores are exact integer micro-nat sums divided once;
    * both tercile cutoffs interpolate with the quantile_cont arithmetic
    * pinned cross-engine by q53/q104, so the `>=` bucket boundaries
    * land identically in any engine.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String): DataFrame = {
    val scored = bigramScore(df, idCol, textCol)
      .join(df.select(col(idCol).as("doc_id"), col(groupCol).as("grp")), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cutoffs = Stats.groupedExactPercentiles(
          scored, "grp", "avg_logprob", Seq(1.0 / 3, 2.0 / 3))
        .select(col("g").as("grp"), col("p_0").as("c1"), col("p_1").as("c2"))
      Ckpt.truncate(scored
        .join(broadcast(cutoffs), Seq("grp"))
        .select(col("doc_id"), col("grp"), col("n_bigrams"), col("avg_logprob"),
          when(col("avg_logprob") >= col("c2"), "head")
            .when(col("avg_logprob") >= col("c1"), "middle")
            .otherwise("tail").as("bucket")))
    } finally scored.unpersist(blocking = false)
  }

  /** Interpolated Kneser–Ney bigram log-likelihood per document — the
    * smoothing the real perplexity filters use (KenLM's default;
    * add-one over-penalizes frequent-context bigrams). Absolute
    * discount d = 0.75 (EXACT in binary, so the discounted numerator
    * is bit-portable):
    *
    *   p(w2|w1) = (c(w1w2) − d)/c(w1•)
    *            + (d · N1+(w1•)/c(w1•)) · (N1+(•w2)/N1+(••))
    *
    * with c(w1•) the bigram-table context marginal and the N1+ terms
    * the distinct-continuation counts of Kneser & Ney 1995. All five
    * statistics are plain aggregations of the distinct-bigram table —
    * at 100 TB that is one (doc,gram) shuffle to build the table and
    * three vocabulary-keyed hash aggs over it, every one map-side
    * combinable; scoring re-joins on the gram key. Corpus-trained on
    * the scored documents themselves, every scored bigram has c ≥ 1 >
    * d, so no zero-probability branch exists.
    *
    * Same cross-engine contract as [[bigramScore]]: p is an exact
    * rational of integer counts evaluated in a pinned operation order,
    * snapped to integer micro-nats per distinct bigram; per-doc totals
    * are exact integer sums divided once.
    */
  def kneserNeyScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = 0.75
    val pairTf = df.select(col(idCol).as("doc_id"),
        explode(Exprs.pairCounts(col(textCol))).as(Seq("pair", "tf_i")))
      .select(col("doc_id"), col("pair"), col("tf_i").cast("long").as("tf"))
    val bc = pairTf.groupBy(col("pair")).agg(sum(col("tf")).as("c"))
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .withColumn("w2", substring_index(col("pair"), " ", -1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = bc.groupBy(col("w1")).agg(
      sum(col("c")).as("cw1"), count(lit(1)).as("n1fw"))
    val cont = bc.groupBy(col("w2")).agg(count(lit(1)).as("n1pw"))
    val types = bc.select(count(lit(1)).as("tt"))
    try {
      val scored = pairTf
        .join(bc.select(col("pair"), col("c"), col("w1"), col("w2")), "pair")
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(broadcast(types))
        .withColumn("p",
          (col("c").cast("double") - lit(d)) / col("cw1").cast("double") +
            (lit(d) * col("n1fw").cast("double") / col("cw1").cast("double")) *
              (col("n1pw").cast("double") / col("tt").cast("double")))
        .withColumn("lp_micro", round(log(col("p")) * lit(1e6)).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).cast("long").as("n_bigrams"),
          (sum(col("tf") * col("lp_micro")).cast("double") /
            (sum(col("tf")) * lit(1000000L)).cast("double")).as("avg_logprob_kn"))
      // truncation is the action that reads the cache; a failure here
      // must not strand the bigram table for the session's lifetime
      Ckpt.truncate(scored)
    } finally bc.unpersist(blocking = false)
  }

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
