package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation FUNNEL — the composition every
  * web-scale training pipeline actually runs (the FineWeb/CCNet/Gopher
  * recipe), wired from this engine's own proven operators:
  *
  *   stage 1  rule gate        — Gopher word-count + alpha-fraction
  *   stage 2  exact dedup      — keep-lowest-id per identical text
  *   stage 3  ExactSubstr trim — [[Dedup.dupSpanTrim]], then keep
  *                               documents retaining ≥ half their
  *                               tokens (an exact integer comparison)
  *   stage 4  LM quality gate  — corpus-trained bigram LM over the
  *                               TRIMMED text, worst decile dropped
  *                               per language ([[LanguageModel
  *                               .perplexityGate]])
  *
  * Output is the per-source survival funnel (one row per source,
  * counts after each stage) — the report a data-engineering review
  * reads before a mix is approved. Each stage trains/derives only from
  * the previous stage's survivors, exactly like the production
  * pipelines it mirrors.
  *
  * Scale shape: every stage is one of the already-audited operators
  * (scan-speed rule projection; hash-shuffle dedup; skinny gram
  * shuffle + in-row rebuild; one (doc,gram) shuffle + broadcast
  * cutoffs), and the funnel aggregation itself is four source-keyed
  * hash aggs joined on a CATALOG-scale key (tens to hundreds of
  * sources).
  */
object Curation {

  def funnel(df: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", langCol: String = "lang",
             srcCol: String = "source",
             minTokens: Int = 50, maxTokens: Int = 100000,
             minAlphaFrac: Double = 0.8, spanL: Int = 8,
             lmDropFrac: Double = 0.10): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      col(langCol).as("lang"), col(srcCol).as("source"))
    // stage 1: rule gate (q181's non-degenerate document rules)
    val tk = filter(split(trim(col("text")), "\\s+"), (x: Column) => x =!= "")
    val n = size(tk)
    val alphaFrac = size(filter(tk, (t: Column) => t.rlike("[A-Za-z]")))
      .cast("double") / greatest(n, lit(1)).cast("double")
    val s1 = base.filter(n >= minTokens && n <= maxTokens &&
      alphaFrac >= minAlphaFrac)
    // stage 2: exact dedup, keep-lowest-id. PERSISTED: consumed by the
    // trim, the metadata join back, AND its funnel count — without the
    // cache each of those re-runs the rule scan + dedup shuffle.
    val s2 = Dedup.exactDedup(s1, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stage 3: duplicated-span trim + ≥50% retention (integer-exact);
      // persisted for the same reason (LM gate + join + count)
      val s3 = Dedup.dupSpanTrim(s2, "text", "doc_id", L = spanL)
        .withColumnRenamed("id", "doc_id")
        .join(s2.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .filter(col("n_removed") * 2 <= col("n_tokens"))
        .select(col("doc_id"), col("trimmed_text"), col("lang"), col("source"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // stage 4: per-language LM decile gate over the TRIMMED text
        val s4 = LanguageModel.perplexityGate(s3, "doc_id", "trimmed_text",
            "lang", dropFrac = lmDropFrac)
          .join(s3.select(col("doc_id"), col("source")), "doc_id")
        def cnt(x: DataFrame, name: String) =
          x.groupBy(col("source")).agg(count(lit(1)).cast("long").as(name))
        Ckpt.toLocal(cnt(base, "n_docs")
          .join(cnt(s1, "n1"), Seq("source"), "left")
          .join(cnt(s2, "n2"), Seq("source"), "left")
          .join(cnt(s3, "n3"), Seq("source"), "left")
          .join(cnt(s4, "n4"), Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n1"), lit(0L)).as("n_rules"),
            coalesce(col("n2"), lit(0L)).as("n_exact"),
            coalesce(col("n3"), lit(0L)).as("n_trim"),
            coalesce(col("n4"), lit(0L)).as("n_lm")))
      } finally s3.unpersist(blocking = false)
    } finally s2.unpersist(blocking = false)
  }

  /** The MULTIMODAL record gate — [[funnel]]'s cross-modality sibling
    * (the LAION/vision-language assembly step): a training record
    * carrying text + image + audio + video survives only when EVERY
    * modality passes its gate, each gate being one of the engine's
    * proven operators:
    *
    *   text   — token-count band (the q181 rule shape)
    *   image  — [[Multimodal.alignmentGate]] cosine ≥ `minCosine`
    *            against the text-side embedding (q193)
    *   audio  — [[Multimodal.audioSegments]] activity:
    *            2·n_active ≥ n_windows, exact integers (q191)
    *   video  — [[Multimodal.videoSceneCuts]] n_cuts ≥ `minCuts`
    *            (static/slideshow filter, q192)
    *
    * Returns ONE VERDICT ROW PER RECORD: (doc_id, ok_text, ok_image,
    * ok_audio, ok_video, kept) — the per-modality audit a curation
    * review reads, not just the surviving subset.
    *
    * Scale shape: the three binary-column scores are map-only
    * partition-batched passes that collapse each record to a handful
    * of longs BELOW the joins; the image gate is one id-keyed
    * equi-join against the embedding table; the final assembly is
    * three more id-keyed joins of skinny verdict frames. Nothing
    * corpus-sized is broadcast; nothing quadratic exists.
    */
  def multimodalGate(docs: DataFrame, idCol: String, textCol: String,
                     imgCol: String, audCol: String, vidCol: String,
                     texts: DataFrame, textIdCol: String, vecCol: String,
                     minTokens: Int, maxTokens: Int, minCosine: Double,
                     embedDim: Int = 64,
                     vadWindow: Int = 256, vadThreshold: Long = 5500L,
                     cutThreshold: Long = 2000L, minCuts: Long = 3L): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"), col(imgCol).as("img"),
      col(audCol).as("aud"), col(vidCol).as("vid"))
    val tk = filter(split(trim(col("text")), "\\s+"), (x: Column) => x =!= "")
    val txt = base.select(col("id"),
      (size(tk) >= minTokens && size(tk) <= maxTokens).as("ok_text"))
    val img = Multimodal.alignmentGate(base.select(col("id"), col("img")),
        "id", "img", texts, textIdCol, vecCol, embedDim, minCosine)
      .select(col("id"), col("kept").as("ok_image"))
    val aud = Multimodal.audioSegments(base.select(col("id"), col("aud")),
        "id", "aud", vadWindow, vadThreshold)
      .select(col("id"), (col("n_active") * 2 >= col("n_windows")).as("ok_audio"))
    val vid = Multimodal.videoSceneCuts(base.select(col("id"), col("vid")),
        "id", "vid", cutThreshold)
      .select(col("id"), (col("n_cuts") >= minCuts).as("ok_video"))
    // the image verdict joins LEFT: alignmentGate is an id-keyed join
    // against the text-embedding table, so a record with no text-side
    // embedding row would otherwise vanish from the audit output. The
    // contract is ONE VERDICT ROW PER RECORD — a missing embedding
    // FAILS the image gate (ok_image = false) instead of excluding the
    // record. The audio/video joins stay inner: their right sides are
    // map-only derivations of `base` itself, so they are total by
    // construction.
    val okImg = coalesce(col("ok_image"), lit(false))
    txt.join(img, Seq("id"), "left").join(aud, Seq("id")).join(vid, Seq("id"))
      .select(col("id"), col("ok_text"), okImg.as("ok_image"), col("ok_audio"),
        col("ok_video"),
        (col("ok_text") && okImg && col("ok_audio") &&
          col("ok_video")).as("kept"))
  }
}
