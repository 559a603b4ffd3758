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
             lmDropFrac: Double = 0.10,
             maxDocChars: Long = 20000000L): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      col(langCol).as("lang"), col(srcCol).as("source"))
    // stage 1: rule gate (q181's non-degenerate document rules), plus a
    // CHARACTER-length rule: maxTokens bounds the token COUNT only, so
    // a <=100k-token document of multi-MB tokens would otherwise pass
    // the word rules and reach the span trim with unbounded O(len·L)
    // in-row state (r19 advisor). The char rule makes stage 1 the
    // length bound the trim's own gate would enforce — same default as
    // [[Dedup.dupSpanStats]]'s maxDocChars, applied for free inside the
    // rule scan instead of as an extra max(length) pass.
    val tk = filter(split(trim(col("text")), graft.plans.Kernels.WsRun), (x: Column) => x =!= "")
    val n = size(tk)
    val alphaFrac = size(filter(tk, (t: Column) => t.rlike("[A-Za-z]")))
      .cast("double") / greatest(n, lit(1)).cast("double")
    val rulePass = n >= minTokens && n <= maxTokens &&
      alphaFrac >= minAlphaFrac &&
      length(col("text")).cast("long") <= maxDocChars
    val s1 = base.filter(rulePass)
    // stage 2: exact dedup, keep-lowest-id. PERSISTED: consumed by the
    // trim, the metadata join back, AND its funnel count — without the
    // cache each of those re-runs the rule scan + dedup shuffle.
    val s2 = Dedup.exactDedup(s1, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stage 3: duplicated-span trim + ≥50% retention (integer-exact);
      // persisted for the same reason (LM gate + join + count).
      // maxDocChars is disabled HERE because stage 1's rule gate
      // already bounds every surviving document at `maxDocChars`
      // CHARACTERS (the explicit length(text) rule above — not the
      // token-count rule, which bounds nothing about characters) — so
      // the trim's own gate would be a redundant max(length) pass, and
      // a premature cache-fill job for s2.
      val s3 = Dedup.dupSpanTrim(s2, "text", "doc_id", L = spanL,
          maxDocChars = Long.MaxValue)
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
        // n_docs and n_rules fold in ONE aggregation (conditional
        // count) instead of two aggregations joined on source. The
        // byte win is small — the old n_docs scan was column-pruned
        // to `source` alone — but the plan drops one scan, one
        // shuffle, and one join, and the anchor row set is now the
        // full source domain by construction rather than via
        // left-join+coalesce. Values are identical: count(when(rule))
        // per source == count(*) of the rule-filtered frame,
        // including 0-survivor sources. (Measured A/B at sf0.1:
        // wall and input bytes unchanged within noise — this is a
        // plan simplification, not a claimed speedup.)
        val anchor = base.groupBy(col("source")).agg(
          count(lit(1)).cast("long").as("n_docs"),
          count(when(rulePass, 1)).cast("long").as("n_rules"))
        Ckpt.toLocal(anchor
          .join(cnt(s2, "n2"), Seq("source"), "left")
          .join(cnt(s3, "n3"), Seq("source"), "left")
          .join(cnt(s4, "n4"), Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("n_rules"),
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
    val tk = filter(split(trim(col("text")), graft.plans.Kernels.WsRun), (x: Column) => x =!= "")
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

  /** The Gopher REPETITION rules (Rae et al. 2021, Table A1's second
    * half — the within-document half q181's document rules leave out):
    * duplicate-line fraction, duplicate-line CHARACTER fraction, and
    * the top word-2-gram's character coverage, each with its published
    * threshold (0.30 / 0.20 / 0.20) and the conjunction as `kept`.
    *
    * Line structure re-derives deterministically from the single-line
    * corpus exactly like q80/q190 (a line break after every
    * `lineTokens`-th token), via [[graft.plans.Kernels.chunkTokensWs]]
    * — the engine whitespace class ([[graft.plans.Kernels.isRegexWs]],
    * = DuckDB RE2 `\s`), so the lines tokenize EXACTLY like the bigram
    * metrics' [[graft.plans.Kernels.WsRun]]-split `tk` array in the
    * same row and like the DuckDB oracle's `string_split_regex`
    * re-lining — on any corpus, including U+000B and Unicode
    * whitespace, where Java `\s` / `Character.isWhitespace` disagree
    * with RE2 (the r14–r16 advisor desyncs; CurationSpec pins the
    * contract with U+2028 and U+000B fixtures, and since r17 every
    * kernel in the engine shares this one class).
    * Zero tokens ⇒ one empty line (the kernel's
    * zero-tokens → "" contract, and the oracle's CASE branch).
    * Scale shape: the line metrics are pure
    * in-row array arithmetic (no shuffle at all — `array_distinct` +
    * ordered length folds); only the top-2-gram needs the corpus-
    * standard (doc, gram) count, whose doc-keyed aggregation, window
    * and join-back all share one hash partitioning. Ties on the top
    * count break (count DESC, gram ASC) so the reported coverage is
    * deterministic and the oracle replays it with the same
    * row_number ordering. Fractions are integer-count ratios rounded
    * to 6 dp — bit-identical cross-engine.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
                        lineTokens: Int = 8,
                        maxDupLineFrac: Double = 0.30,
                        maxDupCharFrac: Double = 0.20,
                        maxTopBigramCov: Double = 0.20): DataFrame = {
    val tk = filter(split(lower(trim(col(textCol))), graft.plans.Kernels.WsRun),
      (x: Column) => x =!= "")
    // single-pass codegen re-lining on the engine ws class — the
    // SAME tokenization as `tk` above and the oracle's
    // string_split_regex (an in-row transform/sequence/slice regroup of
    // `tk` is bit-identical but allocates O(lines) arrays per row and
    // measured 1.4x slower at sf0.1)
    val lines = split(
      graft.plans.Exprs.chunkTokensWs(col(textCol), lineTokens), "\n")
    def chars(arr: Column): Column =
      aggregate(transform(arr, l => length(l).cast("long")),
        lit(0L), (a, v) => a + v)
    val base = df.select(col(idCol).as("id"), tk.as("tk"), lines.as("ls"))
      .withColumn("n_lines", size(col("ls")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("ls"))).cast("long"))
      .withColumn("c_total", chars(col("ls")))
      .withColumn("c_distinct", chars(array_distinct(col("ls"))))
    val grams = base.select(col("id"),
        explode(when(size(col("tk")) >= 2,
            transform(sequence(lit(1), size(col("tk")) - 1),
              i => concat_ws(" ", element_at(col("tk"), i),
                element_at(col("tk"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
    val top = grams
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("c").desc, col("g").asc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("g").as("top_bigram"),
        (col("c") * length(col("g"))).cast("long").as("top_chars"))
    base.join(top, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        round((col("n_lines") - col("n_distinct")).cast("double") /
          greatest(col("n_lines"), lit(1L)).cast("double"), 6).as("dup_line_frac"),
        round((col("c_total") - col("c_distinct")).cast("double") /
          greatest(col("c_total"), lit(1L)).cast("double"), 6).as("dup_char_frac"),
        col("top_bigram"),
        round(coalesce(col("top_chars"), lit(0L)).cast("double") /
          greatest(col("c_total"), lit(1L)).cast("double"), 6).as("top_bigram_cov"))
      .withColumn("kept",
        col("dup_line_frac") <= maxDupLineFrac &&
          col("dup_char_frac") <= maxDupCharFrac &&
          col("top_bigram_cov") <= maxTopBigramCov)
  }
}
