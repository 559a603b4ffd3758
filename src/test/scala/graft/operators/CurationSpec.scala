package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-by-stage oracle for the curation funnel (q186) on a fixture
  * engineered so each stage removes a KNOWN set of documents.
  */
class CurationSpec extends SparkSpec {

  test("funnel: each stage drops exactly the planted documents; counts monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val good = (0 until 8).map(i => (i.toLong, doc(60), "en", "sA"))
    val short = Seq((100L, doc(10), "en", "sA"))              // fails word count
    val numeric = Seq((101L, (1 to 60).map(_.toString).mkString(" "), "en", "sA")) // fails alpha
    val exactDup = Seq((102L, good.head._2, "en", "sB"))      // exact copy of doc 0
    // near-dup: doc 3's text plus a sentinel-fenced unique tail — most
    // tokens sit in foreign-owned spans, so the trim retention gate fails
    val nearDup = Seq((103L, good(3)._2 + " zzq " + doc(5), "en", "sB"))
    val docs = good ++ short ++ numeric ++ exactDup ++ nearDup
    val out = Curation.funnel(
        docs.toDF("doc_id", "text", "lang", "source"),
        minTokens = 50, maxTokens = 100000, minAlphaFrac = 0.8,
        spanL = 8, lmDropFrac = 0.10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // sA: 10 docs; short + numeric fail rules; the 8 good survive all
    // stages except the per-lang LM decile (which drops ≥ 0 of them)
    val (a0, a1, a2, a3, a4) = out("sA")
    assert((a0, a1, a2) === ((10L, 8L, 8L)))
    assert(a3 === 8L, "no sA doc is majority-covered by foreign spans")
    assert(a4 <= a3 && a4 >= a3 - 2, "decile gate drops at most ~10% +ties")
    // sB: exact dup dies at stage 2, near dup at the trim-retention gate
    val (b0, b1, b2, b3, _) = out("sB")
    assert((b0, b1) === ((2L, 2L)))
    assert(b2 === 1L, "exact copy of a lower id must not survive dedup")
    assert(b3 === 0L, "majority-foreign-owned doc must fail the retention gate")
    // funnel is monotone non-increasing for every source
    out.values.foreach { case (n0, n1, n2, n3, n4) =>
      assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4)
    }
  }

  test("funnel: the stage-1 CHARACTER rule drops a few-token multi-MB-shape doc " +
      "(maxTokens bounds token count, not length — r19 advisor)") {
    import spark.implicits._
    // 60 tokens (passes the word-count band), every token 40 chars of
    // letters (passes alpha fraction), total ~2460 chars — the shape
    // that would reach the span trim with unbounded in-row state if
    // only token count gated stage 1. A tight maxDocChars drops it at
    // stage 1 (n_rules), the default admits it.
    val fat = (0 until 60).map(i => ("abcdefghij" * 4) + ('a' + i % 26).toChar).mkString(" ")
    val slim = (0 until 60).map(i => s"w${i}x").mkString(" ")
    val docs = Seq((1L, fat, "en", "sA"), (2L, slim, "en", "sA"))
      .toDF("doc_id", "text", "lang", "source")
    def rules(maxChars: Long): Long =
      Curation.funnel(docs, maxDocChars = maxChars)
        .collect().map(r => r.getLong(2)).head
    assert(rules(500L) === 1L, "the fat doc must die at the char rule")
    assert(rules(20000000L) === 2L, "the default admits both")
  }

  test("multimodalGate: every flag equals its standalone operator; kept is the conjunction") {
    import spark.implicits._
    val n = 60
    val docs = (0 until n).map { i =>
      // vary text length so ok_text splits: short docs fail minTokens
      (i.toLong, Seq.fill(10 + (i % 3) * 20)("tok").mkString(" "))
    }.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        Multimodal.fabricateImageCol(col("doc_id")).as("img"),
        Multimodal.fabricateAudioCol(col("doc_id")).as("aud"),
        Multimodal.fabricateShotVideoCol(col("doc_id")).as("vid"))
      .repartition(4)
    val txts = (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j => (((i * 13 + j * 5) % 17) - 8).toFloat / 9f))
    }.toDF("vec_id", "embedding")
    val got = Curation.multimodalGate(docs, "doc_id", "text",
        "img", "aud", "vid", txts, "vec_id", "embedding",
        minTokens = 25, maxTokens = 100000, minCosine = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(got.size === n)
    // each flag must equal the standalone operator's verdict
    val img = Multimodal.alignmentGate(docs.select(col("doc_id"), col("img")),
        "doc_id", "img", txts, "vec_id", "embedding", 64, 0.05)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val aud = Multimodal.audioSegments(docs.select(col("doc_id"), col("aud")),
        "doc_id", "aud", 256, 5500L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3) * 2 >= r.getLong(2))).toMap
    val vid = Multimodal.videoSceneCuts(docs.select(col("doc_id"), col("vid")),
        "doc_id", "vid", 2000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2) >= 3L)).toMap
    (0 until n).foreach { i =>
      val id = i.toLong
      val (t, im, au, vi, kept) = got(id)
      assert(t === (10 + (i % 3) * 20 >= 25), s"ok_text doc $i")
      assert(im === img(id), s"ok_image doc $i")
      assert(au === aud(id), s"ok_audio doc $i")
      assert(vi === vid(id), s"ok_video doc $i")
      assert(kept === (t && im && au && vi), s"kept doc $i")
    }
    // the fixture must exercise both sides of every gate
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
  }

  test("multimodalGate: a record with NO text-side embedding keeps its row, ok_image=false") {
    import spark.implicits._
    val n = 20
    val docs = (0 until n).map { i =>
      (i.toLong, Seq.fill(40)("tok").mkString(" "))
    }.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        Multimodal.fabricateImageCol(col("doc_id")).as("img"),
        Multimodal.fabricateAudioCol(col("doc_id")).as("aud"),
        Multimodal.fabricateShotVideoCol(col("doc_id")).as("vid"))
    // embeddings cover only the first half: the second half must NOT
    // silently disappear from the audit (one verdict row per record)
    val txts = (0 until n / 2).map { i =>
      (i.toLong, Array.tabulate(64)(j => (((i * 13 + j * 5) % 17) - 8).toFloat / 9f))
    }.toDF("vec_id", "embedding")
    val got = Curation.multimodalGate(docs, "doc_id", "text",
        "img", "aud", "vid", txts, "vec_id", "embedding",
        minTokens = 25, maxTokens = 100000, minCosine = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(5)))).toMap
    assert(got.size === n, "every record must keep exactly one verdict row")
    (n / 2 until n).foreach { i =>
      val (okImage, kept) = got(i.toLong)
      assert(!okImage, s"doc $i without an embedding must fail the image gate")
      assert(!kept, s"doc $i without an embedding must not be kept")
    }
  }

  test("repetitionProfile: hand-computed Gopher repetition metrics and thresholds") {
    import spark.implicits._
    // doc 1: 16 tokens forming two IDENTICAL 8-token lines
    //   -> dup_line_frac = 1/2, dup_char_frac = 15/30, both over 0.30/0.20
    // doc 2: 12 distinct tokens, every bigram unique -> all metrics low,
    //   kept (note a SHORT doc of long words can legitimately trip the
    //   0.20 coverage rule: 8 tokens of "alpha bravo ..." score 11/49)
    // doc 3: "x y" * 12 -> top bigram "x y" dominates coverage
    val rep = (1 to 2).map(_ => "a b c d e f g h").mkString(" ")
    val clean = "aa bb cc dd ee ff gg hh ii jj kk ll"
    val stuffed = (1 to 12).map(_ => "x y").mkString(" ")
    val df = Seq((1L, rep), (2L, clean), (3L, stuffed)).toDF("doc_id", "text")
    val got = Curation.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getString(4), r.getDouble(5), r.getBoolean(6))).toMap
    val (n1, dl1, dc1, _, _, k1) = got(1L)
    assert(n1 === 2L && dl1 === 0.5 && dc1 === 0.5 && !k1)
    val (n2, dl2, dc2, tb2, cov2, k2) = got(2L)
    // 12 tokens -> 2 distinct lines (23 + 11 chars); 11 distinct
    // bigrams all count 1, ties break lexicographically: "aa bb"
    assert(n2 === 2L && dl2 === 0.0 && dc2 === 0.0 && k2)
    assert(tb2 === "aa bb")
    assert(cov2 === math.rint(5.0 / 34.0 * 1e6) / 1e6)
    val (_, _, _, tb3, cov3, k3) = got(3L)
    // 24 tokens = 3 lines ("x y"*4 = 8 tokens/line, identical): "x y"
    // occurs 12 times as a bigram out of 23; chars/line = 15, total 45
    assert(tb3 === "x y" && cov3 === math.rint(12 * 3.0 / 45.0 * 1e6) / 1e6)
    assert(!k3, "top-bigram coverage 0.8 must trip the 0.20 threshold")
  }

  test("repetitionProfile: Unicode whitespace — lines share the bigrams' " +
      "engine-ws tokenization (U+2028 AND U+000B glue), zero tokens " +
      "is one empty line") {
    import spark.implicits._
    // U+2028 (LINE SEPARATOR) is Character.isWhitespace but NOT regex
    // `\s` in either Java or DuckDB's RE2 — it must stay INSIDE a token,
    // in the line metrics exactly as in the bigram metrics (the r14/r15
    // advisor desync: a chunkTokens-based re-lining split here while
    // the bigrams and the oracle did not). U+000B (vertical tab) is
    // Java-`\s` but NOT RE2 `\s` as shipped in DuckDB 1.0.0
    // (regexp_matches(chr(11), '\s') is FALSE — pinned empirically,
    // r16 advisor): the engine class (Kernels.isRegexWs = RE2 `\s`)
    // keeps it inside the token too. tools/unicode_corpus.py plants
    // both characters in a full-corpus oracle replay.
    val glued = "A\u2028b c d" // tk = [a U+2028 b, c, d]
    val vtab = "A\u000bb c d"  // tk = [a U+000B b, c, d] — same shape
    val blank = "   "          // zero tokens
    val df = Seq((1L, glued), (2L, vtab), (3L, blank)).toDF("doc_id", "text")
    val got = Curation.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) null else r.getString(4), r.getDouble(5),
          r.getBoolean(6))).toMap
    // doc 1: 3 tokens -> ONE 7-char line (U+2028 inside
    // the first token); the two bigrams tie at count 1, gram-ASC
    // tiebreak picks the a-leading 5-char bigram -> coverage 5/7
    val (n1, dl1, dc1, tb1, cov1, k1) = got(1L)
    assert(n1 === 1L && dl1 === 0.0 && dc1 === 0.0)
    assert(tb1 === "a\u2028b c", "U+2028 must stay inside the token")
    assert(cov1 === math.rint(5.0 / 7.0 * 1e6) / 1e6 && !k1)
    // doc 2: identical shape with U+000B — one 7-char line, top
    // bigram [a U+000B b, c] covering 5/7
    val (n2, dl2, dc2, tb2, cov2, k2) = got(2L)
    assert(n2 === 1L && dl2 === 0.0 && dc2 === 0.0)
    assert(tb2 === "a\u000bb c",
      "U+000B must stay inside the token (RE2 \\s excludes it)")
    assert(cov2 === math.rint(5.0 / 7.0 * 1e6) / 1e6 && !k2)
    // doc 3: zero tokens -> exactly one EMPTY line (the oracle's
    // CASE len(tk)=0 branch): no dup, no bigram, kept
    val (n3, dl3, dc3, tb3, cov3, k3) = got(3L)
    assert(n3 === 1L && dl3 === 0.0 && dc3 === 0.0)
    assert(tb3 === null && cov3 === 0.0 && k3)
  }
}
