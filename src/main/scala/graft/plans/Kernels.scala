package graft.plans

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row compute kernels for the custom Catalyst expressions in
  * [[Exprs]]. Static methods so generated code (whole-stage codegen)
  * can call them directly — the expression's `doGenCode` emits a single
  * static call, keeping the operator inside the codegen span instead of
  * falling back to interpreted eval like a Scala UDF would.
  *
  * All kernels are allocation-light and deterministic (no RNG, no time).
  */
object Kernels {

  /** splitmix64 finalizer — public-domain mixing constants. */
  @inline def mix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** SimHash64 over lowercase whitespace tokens: for each token hash,
    * each of the 64 bit positions votes +1/-1; the sign vector is the
    * fingerprint. Near-duplicate texts land within a small Hamming
    * distance.
    */
  def simhash(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        var h = 1125899906842597L
        var j = start
        while (j < i) { h = 31L * h + s.charAt(j); j += 1 }
        h = mix64(h)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature over word `shingleK`-grams in one pass: token
    * boundaries are scanned once, each shingle is hashed once, and every
    * permutation (`a_p*h+b_p`, multiply-shift family with splitmix-derived
    * odd constants) keeps a running min. O(tokens × perms), zero
    * intermediate collections — the Column-composition equivalent
    * materializes the shingle array per row.
    */
  def minhash(text: UTF8String, shingleK: Int, numPerms: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    // token start/end offsets
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      }
    }
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val as = new Array[Long](numPerms)
    val bs = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      as(p) = mix64(2L * p + 1) | 1L
      bs(p) = mix64(2L * p + 2)
      p += 1
    }
    val nShingles = if (nTok == 0) 0 else math.max(1, nTok - shingleK + 1)
    var sh = 0
    while (sh < nShingles) {
      // hash the shingle = tokens[sh, sh+k) joined by a single space
      var h = 1125899906842597L
      var t = sh
      val tEnd = math.min(sh + shingleK, nTok)
      while (t < tEnd) {
        if (t > sh) h = 31L * h + ' '
        var j = tokStarts(t)
        while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
        t += 1
      }
      h = mix64(h)
      p = 0
      while (p < numPerms) {
        val ph = as(p) * h + bs(p)
        if (ph < mins(p)) mins(p) = ph
        p += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct 64-bit hashes of the word `k`-shingles — the
    * single-pass kernel behind the exact-Jaccard inverted index. Same
    * tokenizer and hash family as [[minhash]] (boundaries scanned once,
    * each shingle hashed once), then an in-place sort + dedup. Replaces
    * a `split → transform(sequence) → slice → concat_ws → xxhash64 →
    * array_distinct → array_sort` Column chain whose interpreted
    * higher-order functions cost ~1 ms/row.
    */
  def shingleHashes(text: UTF8String, shingleK: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      }
    }
    val nShingles = if (nTok == 0) 0 else math.max(1, nTok - shingleK + 1)
    val hashes = new Array[Long](nShingles)
    var sh = 0
    while (sh < nShingles) {
      var h = 1125899906842597L
      var t = sh
      val tEnd = math.min(sh + shingleK, nTok)
      while (t < tEnd) {
        if (t > sh) h = 31L * h + ' '
        var j = tokStarts(t)
        while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
        t += 1
      }
      hashes(sh) = mix64(h)
      sh += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted array
    var out = 0
    var idx = 0
    while (idx < nShingles) {
      if (out == 0 || hashes(idx) != hashes(out - 1)) { hashes(out) = hashes(idx); out += 1 }
      idx += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  /** [[shingleHashes]] in POSITION ORDER — no sort, no dedup: slot `i`
    * holds the hash of the shingle starting at token `i`. The span-
    * dedup operator needs positions to merge consecutive shared
    * shingles into maximal repeated substrings; set semantics would
    * destroy exactly the structure it mines. Same tokenization
    * (whitespace scan over the lowercased text), same base-31 + mix64
    * hash, same short-text edge case (0 < nTok < k → one shingle of
    * all tokens).
    */
  def shingleHashesPos(text: UTF8String, shingleK: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      }
    }
    val nShingles = if (nTok == 0) 0 else math.max(1, nTok - shingleK + 1)
    val hashes = new Array[Long](nShingles)
    var sh = 0
    while (sh < nShingles) {
      var h = 1125899906842597L
      var t = sh
      val tEnd = math.min(sh + shingleK, nTok)
      while (t < tEnd) {
        if (t > sh) h = 31L * h + ' '
        var j = tokStarts(t)
        while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
        t += 1
      }
      hashes(sh) = mix64(h)
      sh += 1
    }
    new GenericArrayData(hashes)
  }

  /** The token ARRAY behind [[shingleHashesPos]] — the identical
    * `Locale.ROOT` lowercase + [[isRegexWs]] scan, returned as the
    * tokens themselves instead of shingle hashes. Span-dedup trimming
    * needs both the hash stream (to find duplicated spans) and the
    * token stream (to rebuild the trimmed text); deriving them from
    * ONE tokenizer makes position desync impossible — a Spark-side
    * `split` rebuild (UTF8String lowercase) could silently remove the
    * WRONG tokens under a non-ROOT default locale.
    */
  def wsTokens(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var toks = new Array[AnyRef](16)
    var nTok = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == toks.length) toks = java.util.Arrays.copyOf(toks, nTok * 2)
        toks(nTok) = UTF8String.fromString(s.substring(start, i))
        nTok += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(toks, nTok).asInstanceOf[Array[Any]])
  }

  // ------------------------------------------------------- text metrics
  // Single-pass kernels behind graft.functions.TextFunctions. Each
  // reproduces the exact semantics of the Column chain it replaced —
  // including the split-with-limit-(-1) edge cases (a leading
  // whitespace run after the space-only trim yields an empty first
  // token; an all-space string yields [""]), because the DuckDB
  // oracles' string_split_regex pins those.

  /** The engine-wide tokenizer whitespace class — RE2 `\s` exactly as
    * shipped in DuckDB 1.0.0: `[ \t\n\f\r]`. Pinned EMPIRICALLY against
    * the oracle engine: DuckDB `regexp_matches(chr(11), '\s')` is
    * FALSE, so U+000B (vertical tab) is NOT whitespace here — unlike
    * Java regex `\s` (which adds U+000B) and `Character.isWhitespace`
    * (which adds U+000B, U+001C–U+001F and Unicode spaces
    * U+2028/U+3000/U+1680…). Every token scanner in this file and
    * every Spark-side tokenizing regex ([[WsRun]]/[[UrlRun]]) shares
    * this ONE class, so Spark tokenization replays bit-for-bit under
    * the oracles' `string_split_regex('\s+')` on any corpus, ASCII or
    * not. (History: through r16 this predicate was Java `\s` — a
    * latent U+000B desync — and most kernels below scanned with
    * `Character.isWhitespace`, diverging on the whole list above;
    * both were green only because the driver corpora are
    * printable-ASCII.)
    */
  @inline def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** [[isRegexWs]] as a token-splitting Java regex for Spark-side
    * `split`/`regexp_replace` calls: spelled as an explicit class
    * because writing `\s+` in a JAVA regex would silently re-admit
    * U+000B and desync from the DuckDB oracles' RE2 `\s+`.
    */
  val WsRun: String = "[ \t\n\f\r]+"

  /** RE2 `https?://\S+` as a Java regex (`\S` complements
    * [[isRegexWs]] — a Java-regex `\S` would STOP a URL at U+000B
    * while RE2's runs through it).
    */
  val UrlRun: String = "https?://[^ \t\n\f\r]+"

  /** (start, end) after Spark `trim` semantics: strips ' ' only. */
  @inline private def spaceTrim(s: String): (Int, Int) = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    (a, b)
  }

  /** (nTokens, sumTokenLen, nStopwords) of `split(trim(s), WsRun)` —
    * one scan, no array. Spark's `split` runs with limit −1, so BOTH a
    * leading and a trailing whitespace run (after the space-only trim)
    * contribute an empty token; an empty trimmed string is the `[""]`
    * case: one token, length 0. `stops` may be null to skip stopword
    * counting; matching is done on the lowercased token when `lower`
    * is set.
    */
  private def tokenScan(s: String, lower: Boolean,
                        stops: java.util.Set[String]): (Int, Long, Int) = {
    val (a, b) = spaceTrim(s)
    if (a >= b) return (1, 0L, 0) // "" splits to [""]
    var n = 0
    var sumLen = 0L
    var nStops = 0
    var i = a
    if (isRegexWs(s.charAt(a))) n += 1 // leading empty token
    if (isRegexWs(s.charAt(b - 1))) n += 1 // trailing empty token (limit -1)
    while (i < b) {
      while (i < b && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < b && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        n += 1
        sumLen += s.codePointCount(start, i)
        if (stops != null) {
          val tok = s.substring(start, i)
          if (stops.contains(if (lower) tok.toLowerCase(java.util.Locale.ROOT) else tok)) nStops += 1
        }
      }
    }
    (n, sumLen, nStops)
  }

  /** Whitespace-token count with the empty-string guard (`trim == ""`
    * → 0, matching the `when` in the Column version).
    */
  def tokenCount(text: UTF8String): Int = {
    val s = text.toString
    val (a, b) = spaceTrim(s)
    if (a >= b) 0 else tokenScan(s, lower = false, null)._1
  }

  /** Mean whitespace-token length (code points), `sum / max(n, 1)`. */
  def meanTokenLen(text: UTF8String): Double = {
    val (n, sum, _) = tokenScan(text.toString, lower = false, null)
    sum.toDouble / math.max(n, 1)
  }

  private lazy val stopSet: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFunctions.Stopwords.foreach(s.add)
    s
  }

  /** Fraction of whitespace tokens of the lowercased text that are
    * stopwords.
    */
  def stopwordRatio(text: UTF8String): Double = {
    val (n, _, stops) = tokenScan(text.toString.toLowerCase(java.util.Locale.ROOT), lower = false, stopSet)
    stops.toDouble / math.max(n, 1)
  }

  /** Ratio of non-alphanumeric, non-`\s` code points to all code
    * points.
    */
  def punctRatio(text: UTF8String): Double = {
    val s = text.toString
    var punct = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      total += 1
      if (cp < 128) {
        val c = cp.toChar
        val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9')
        if (!alnum && !isRegexWs(c)) punct += 1
      } else punct += 1 // non-ASCII: not [A-Za-z0-9\s], counts as punct
      i += Character.charCount(cp)
    }
    punct.toDouble / math.max(total, 1)
  }

  /** BPE-ish subword count: maximal `[A-Za-z0-9]+` runs plus every
    * non-alphanumeric code point except the plain space — the closed
    * form of `split` on the GPT-2-style boundary regex
    * `(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])` followed by the space-trim
    * filter (non-space whitespace like `\t` stays a token there, so it
    * counts here too).
    */
  def subwordCount(text: UTF8String): Int = {
    val s = text.toString
    var count = 0
    var inRun = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val alnum = cp < 128 && {
        val c = cp.toChar
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) {
        if (!inRun) { count += 1; inRun = true }
      } else {
        inRun = false
        if (cp != ' ') count += 1
      }
      i += Character.charCount(cp)
    }
    count
  }

  private lazy val langProfiles: Array[(String, Array[String])] =
    graft.functions.TextFunctions.LangProfiles.toSeq.sortBy(_._1)
      .map { case (l, gs) => (l, gs.toArray) }.toArray

  /** Language-ID: trigram-profile hit count per language over the
    * lowercased text, argmax with ties to the lexicographically LARGER
    * language code (identical to `array_max` over lang-ascending
    * (score, lang) structs, which the q41 oracle pins); no hits →
    * "und". One `indexOf` per profile gram — all inside codegen.
    */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var bestLang = "und"
    var bestScore = 0
    var li = 0
    while (li < langProfiles.length) {
      val (lang, grams) = langProfiles(li)
      var score = 0
      var gi = 0
      while (gi < grams.length) {
        if (s.contains(grams(gi))) score += 1
        gi += 1
      }
      // ascending lang order + >= : later (larger) lang wins exact ties
      if (score > 0 && score >= bestScore) { bestScore = score; bestLang = lang }
      li += 1
    }
    UTF8String.fromString(bestLang)
  }

  /** Base-31 rolling hash over code points, 64-bit wraparound — the
    * Rabin-Karp document fingerprint (matches `aggregate` over
    * `split(text, "")` with `ascii`).
    */
  def fingerprint64(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = h * 31L + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** Total token count under the SHINGLE tokenizer ([[minhash]] /
    * [[shingleHashes]] semantics: [[isRegexWs]] boundaries, empty
    * tokens skipped — NOT the split-with-limit-(-1) edge-case
    * semantics of [[tokenCount]], which keeps leading/trailing empty
    * tokens). The denominator for positional n-gram statistics:
    * nShingles(k) = max(1, scanTokens − k + 1) when > 0.
    */
  def scanTokens(text: UTF8String): Int = {
    val s = text.toString
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) n += 1
    }
    n
  }

  /** First `n` lowercase whitespace tokens joined by single spaces —
    * the normalized prefix key for prefix dedup. Single pass, one
    * output allocation; replaces an interpreted `split → slice →
    * concat_ws` Column chain. Same tokenizer as [[minhash]] (empty
    * tokens are skipped, so leading/trailing whitespace is irrelevant);
    * fewer than `n` tokens → all of them; no tokens → "".
    */
  def prefixTokens(text: UTF8String, n: Int): UTF8String = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(math.min(s.length, n * 12))
    var i = 0
    var tok = 0
    val len = s.length
    while (i < len && tok < n) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (tok > 0) sb.append(' ')
        sb.append(s, start, i)
        tok += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Lowercased whitespace tokens joined by single spaces with a
    * newline after every `n`-th token — re-lines unstructured text to a
    * fixed token granularity for line-level operators
    * ([[graft.operators.Dedup.lineDedup]]). Since the r17 tokenizer
    * unification this IS [[chunkTokensWs]] — both names kept because
    * the `chunk_tokens` / `chunk_tokens_ws` expressions are pinned
    * separately by PlanShapeSpec gates.
    */
  def chunkTokens(text: UTF8String, n: Int): UTF8String =
    chunkTokensWs(text, n)

  /** Re-lining on the engine whitespace class ([[isRegexWs]] — RE2
    * `\s` as shipped in DuckDB 1.0.0; NOT Java `\s`, which adds
    * U+000B): for consumers whose sibling metrics tokenize by regex
    * `\s` IN THE SAME ROW and whose DuckDB oracle re-lines from
    * `string_split_regex('\s+')` tokens
    * ([[graft.operators.Curation.repetitionProfile]], q201). Single
    * pass like [[prefixTokens]]; zero tokens → "". (A backtracking-
    * regex formulation measured ~0.4 ms/doc; an in-row
    * transform/sequence/slice regroup of the token array measured
    * 1.4× slower at sf0.1 — this kernel is linear and allocation-
    * light.)
    */
  def chunkTokensWs(text: UTF8String, n: Int): UTF8String = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var tok = 0
    val len = s.length
    while (i < len) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (tok > 0) sb.append(if (tok % n == 0) '\n' else ' ')
        sb.append(s, start, i)
        tok += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Overlapping token windows (RAG / long-context chunking): lowercase
    * whitespace tokens grouped into windows of `n` tokens advancing by
    * `stride` (stride < n ⇒ overlap), each window joined by single
    * spaces. The last window may be short; windows start at token
    * offsets 0, stride, 2·stride, … while an offset < nTokens. No
    * tokens → empty array. Single pass over the string + one slice per
    * window.
    */
  def chunkWindows(text: UTF8String, n: Int, stride: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]
    var off = 0
    while (off < nTok) {
      val end = math.min(off + n, nTok)
      val sb = new java.lang.StringBuilder((end - off) * 8)
      var t = off
      while (t < end) {
        if (t > off) sb.append(' ')
        sb.append(s, tokStarts(t), tokEnds(t))
        t += 1
      }
      out += UTF8String.fromString(sb.toString)
      off += stride
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Most-frequent-token share: max multiplicity of any lowercase
    * whitespace token over the total token count (0.0 for empty text).
    * Counts by 64-bit token hash (same poly31+[[mix64]] family as
    * [[simhash]]) in an open-addressing map sized to the document —
    * per-ROW state bounded by document vocabulary, nothing crosses the
    * wire. Replaced an explode → (doc,term) count → per-doc max/sum
    * pipeline: two corpus-wide shuffles and a join for a quantity each
    * row can compute alone (measured 2.0 s → map-only on q77).
    */
  def topTokenShare(text: UTF8String): Double = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var cap = 64 // power of two; grown at 70% load
    var keys = new Array[Long](cap)
    var cnts = new Array[Int](cap)
    var used = 0
    var total = 0
    var maxC = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        var h = 1125899906842597L
        var j = start
        while (j < i) { h = 31L * h + s.charAt(j); j += 1 }
        h = mix64(h)
        total += 1
        var slot = (h & (cap - 1)).toInt
        while (cnts(slot) != 0 && keys(slot) != h) slot = (slot + 1) & (cap - 1)
        if (cnts(slot) == 0) { keys(slot) = h; used += 1 }
        cnts(slot) += 1
        if (cnts(slot) > maxC) maxC = cnts(slot)
        if (used * 10 >= cap * 7) {
          val oldKeys = keys; val oldCnts = cnts
          cap <<= 1
          keys = new Array[Long](cap)
          cnts = new Array[Int](cap)
          var o = 0
          while (o < oldKeys.length) {
            if (oldCnts(o) != 0) {
              var ns = (oldKeys(o) & (cap - 1)).toInt
              while (cnts(ns) != 0) ns = (ns + 1) & (cap - 1)
              keys(ns) = oldKeys(o); cnts(ns) = oldCnts(o)
            }
            o += 1
          }
        }
      }
    }
    if (total == 0) 0.0 else maxC.toDouble / total.toDouble
  }

  /** Jaro–Winkler similarity, matching DuckDB's
    * `jaro_winkler_similarity` exactly (verified on a probe battery):
    * either side empty → 0, identical → 1, case-sensitive, match
    * window `max(l1,l2)/2 − 1`, transpositions counted over matched
    * sequences, Winkler prefix boost (≤ 4 chars, scale 0.1) only above
    * jaro 0.7. Operates on UTF-16 code units (inputs are expected
    * ASCII-ish identifiers/names). All arithmetic is small-integer
    * rationals, so cross-engine doubles agree to well under any
    * ranking gap that matters.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transposition term floors the half-count (mismatches/2 with
    // INTEGER division) — the rapidfuzz convention DuckDB vendors,
    // which differs from the textbook t/2 exactly when the mismatch
    // count is odd (fuzz-verified against DuckDB on 3009 string pairs)
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Bloom-filter probe: true iff all `k` probe positions of content
    * fingerprint `h` are set in the packed `words` bit array (`mBits`
    * bits). Positions mirror [[graft.operators.Bloom.setBits]] exactly:
    * unsigned mix64(h + i) mod mBits.
    */
  def bloomContains(h: Long, words: Array[Long], mBits: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = java.lang.Long.remainderUnsigned(mix64(h + i), mBits.toLong)
      if (((words((p >>> 6).toInt) >>> (p & 63).toInt) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Index of the centroid (rows of the flattened `cents` array, `dim`
    * floats each) with the highest dot product against the normalized
    * input vector. Mirrors the spherical k-means assignment in
    * `Ivf.trainCentroids` exactly, including its float normalization
    * (norm 0 → vector used as-is) — ties break to the lowest index.
    */
  def nearestCentroid(v: ArrayData, cents: Array[Float], dim: Int): Int = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nf = math.sqrt(ss).toFloat
    val k = cents.length / dim
    var best = 0
    var bestD = Double.MinValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var j = 0
      val m = math.min(n, dim)
      while (j < m) {
        val x = if (nf == 0f) v.getFloat(j) else v.getFloat(j) / nf
        d += x.toDouble * cents(off + j)
        j += 1
      }
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` centroid indices nearest (by dot with the normalized
    * input) to the vector, descending similarity, ties to the lower
    * index — the IVF probe list. Selection is O(k · nProbe) on a
    * per-cell dot array; no sort, no boxing.
    */
  def topCells(v: ArrayData, cents: Array[Float], dim: Int, nProbe: Int): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nf = math.sqrt(ss).toFloat
    val k = cents.length / dim
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var j = 0
      val m = math.min(n, dim)
      while (j < m) {
        val x = if (nf == 0f) v.getFloat(j) else v.getFloat(j) / nf
        d += x.toDouble * cents(off + j)
        j += 1
      }
      dots(c) = d
      c += 1
    }
    val p = math.min(nProbe, k)
    val out = new Array[Int](p)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      var best = -1
      var bestD = 0.0
      c = 0
      while (c < k) {
        if (!taken(c) && (best == -1 || dots(c) > bestD)) { bestD = dots(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine similarity of two float-array embeddings, accumulated in
    * double. Returns 0.0 when either norm is 0.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Intersection SIZE of two ascending-sorted long arrays by linear
    * merge — no per-row hash set like `array_intersect` builds, no
    * allocation at all. The graph kernels (triangle counting) spend
    * their hot loop here: adjacency lists are sorted once at build
    * and every edge probe is O(|a|+|b|) pointer walking.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Dot product of two float arrays (double accumulation). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** Random-hyperplane (sign) LSH signature of a float embedding: bit p
    * of the result is the sign of a dot product with a pseudo-random
    * hyperplane derived from splitmix64(p, dim). With `bits` planes,
    * P(bit match) = 1 - angle/pi — bucketing on bit bands yields
    * cosine-ANN candidates.
    */
  def hyperplaneSig(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // deterministic N(0,1)-ish weight from two uniform mixes (CLT of 2
        // is crude but direction-uniform enough for bucketing)
        val u = mix64(p.toLong << 32 | i)
        val w = (u.toDouble / Long.MaxValue.toDouble)
        dot += v.getFloat(i) * w
        i += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Per-document term frequencies in ONE row-local pass: lowercase
    * whitespace tokens (the `split(lower(trim(s)), WsRun)` +
    * nonempty-filter semantics) → insertion-ordered term→count map.
    * Exploding this map replaces the corpus-wide `(doc, term)`
    * count aggregation — the first and biggest shuffle of TF-IDF —
    * with in-row work: term multiplicity never crosses the wire.
    */
  def termCounts(text: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new java.util.LinkedHashMap[String, Integer]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        val t = s.substring(start, i)
        val c = counts.get(t)
        counts.put(t, if (c == null) 1 else c + 1)
      }
    }
    val keys = new Array[AnyRef](counts.size)
    val vals = new Array[Int](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Per-document adjacent-token-PAIR frequencies in one row-local
    * pass ([[termCounts]]'s bigram sibling; same [[isRegexWs]]
    * tokenizer, pairs joined by a single space). Exploding this map keeps
    * bigram-model training shuffles distinct-pair-per-doc sized —
    * pair multiplicity never crosses the wire.
    */
  def pairCounts(text: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new java.util.LinkedHashMap[String, Integer]()
    var prev: String = null
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        val t = s.substring(start, i)
        if (prev != null) {
          val p = prev + " " + t
          val c = counts.get(p)
          counts.put(p, if (c == null) 1 else c + 1)
        }
        prev = t
      }
    }
    val keys = new Array[AnyRef](counts.size)
    val vals = new Array[Int](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Product-quantization encode: for each of `m` subspaces of `dsub`
    * dims, the index of the L2-nearest sub-centroid (codebook row-major
    * `[m][k][dsub]` doubles). Distances accumulate in index order from
    * 0.0; ties to the lowest index — ordered-fold-reproducible.
    */
  def pqEncode(v: ArrayData, cb: Array[Double], m: Int, k: Int, dsub: Int): ArrayData = {
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val vOff = mi * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val cOff = (mi * k + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v.getFloat(vOff + t).toDouble - cb(cOff + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query ADC table: distance from the query's `mi`-th subvector
    * to every sub-centroid — `m·k` doubles, laid out `[mi][j]`. Built
    * ONCE per query; scoring a corpus row is then `m` lookups
    * ([[pqAdc]]), not a dim-length scan.
    */
  def pqTable(q: ArrayData, cb: Array[Double], m: Int, k: Int, dsub: Int): ArrayData = {
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val vOff = mi * dsub
      var j = 0
      while (j < k) {
        val cOff = (mi * k + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = q.getFloat(vOff + t).toDouble - cb(cOff + t)
          d += diff * diff
          t += 1
        }
        out(mi * k + j) = d
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score of a PQ-coded row against a query's ADC
    * table: Σ_mi table[mi·k + code_mi], accumulated in subspace order.
    */
  def pqAdc(table: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var d = 0.0
    var mi = 0
    while (mi < m) { d += table.getDouble(mi * k + codes.getInt(mi)); mi += 1 }
    d
  }

  /** Double-precision L2 normalization of a float embedding: xᵢ/‖x‖
    * with the squared norm accumulated in index order from 0.0 — the
    * exact arithmetic an ordered SQL left-fold (`list_reduce` with a
    * prepended 0.0) replays, so downstream dot products are
    * bit-reproducible cross-engine. Zero norm → the values pass
    * through widened to double, unscaled.
    */
  def normalizeD(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      out(i) = if (nrm == 0.0) x else x / nrm
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Spherical k-means assignment against DOUBLE centroids (row-major
    * `k × dim`): returns `[bestCluster, bestDot]` for an
    * already-normalized double vector. Each dot accumulates in index
    * order from 0.0 and ties break to the lowest cluster index
    * (strict `>`), mirroring what a SQL ordered list_reduce +
    * `ORDER BY d DESC, cluster` window reproduces.
    */
  def nearestCentroidScoreD(vn: ArrayData, cents: Array[Double], dim: Int): ArrayData = {
    val n = vn.numElements()
    val k = cents.length / dim
    var best = 0
    var bestD = Double.MinValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var j = 0
      val m = math.min(n, dim)
      while (j < m) { d += vn.getDouble(j) * cents(off + j); j += 1 }
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    new GenericArrayData(Array[Double](best.toDouble, bestD))
  }

  /** IVF-probed k-means assignment `[bestCluster, bestDot]` — the
    * scale path past [[nearestCentroidScoreD]]'s flat N·k scan: score
    * the `coarse` cells first (≈√k dots), probe the `nProbe` best
    * (ties to the lowest cell position), and scan only the fine
    * centroids in those cells' `members` lists. Per-vector cost is
    * O(√k + nProbe·k/√k) instead of O(k) — the difference between
    * N^1.5 and N² when k grows ∝ N (the SemDeDup dial).
    *
    * Determinism contract: every dot is a 0.0-seeded index-order fold
    * of IEEE doubles; probe order is (coarse dot DESC, cell position
    * ASC) and the fine argmax breaks ties to the LOWEST fine index —
    * each a `row_number() OVER (ORDER BY d DESC, id ASC)` in SQL, so
    * an independent engine replays the assignment bit-for-bit. When
    * `nProbe >= #cells` the candidate set is every fine centroid and
    * the result equals the flat scan exactly.
    *
    * `cellStart(p)..cellStart(p+1)` brackets cell p's slice of
    * `members` (fine indices, ascending); only NON-EMPTY cells are
    * present, in ascending original-cell order, so position order IS
    * cell-id order for tie-breaking.
    */
  def ivfAssignScoreD(vn: ArrayData, cents: Array[Double], dim: Int,
                      coarse: Array[Double], cellStart: Array[Int],
                      members: Array[Int], nProbe: Int): ArrayData = {
    val n = vn.numElements()
    val m = math.min(n, dim)
    val nc = cellStart.length - 1
    val sc = new Array[Double](nc)
    var j = 0
    while (j < nc) {
      val off = j * dim
      var d = 0.0
      var t = 0
      while (t < m) { d += vn.getDouble(t) * coarse(off + t); t += 1 }
      sc(j) = d
      j += 1
    }
    val used = new Array[Boolean](nc)
    var best = Integer.MAX_VALUE
    var bestD = Double.NegativeInfinity
    val np = math.min(nProbe, nc)
    var p = 0
    while (p < np) {
      var bj = -1
      var bs = Double.NegativeInfinity
      var q = 0
      while (q < nc) {
        if (!used(q) && (bj < 0 || sc(q) > bs)) { bs = sc(q); bj = q }
        q += 1
      }
      used(bj) = true
      var e = cellStart(bj)
      val eEnd = cellStart(bj + 1)
      while (e < eEnd) {
        val fi = members(e)
        val off = fi * dim
        var d = 0.0
        var t = 0
        while (t < m) { d += vn.getDouble(t) * cents(off + t); t += 1 }
        if (d > bestD || (d == bestD && fi < best)) { bestD = d; best = fi }
        e += 1
      }
      p += 1
    }
    new GenericArrayData(Array[Double](best.toDouble, bestD))
  }

  /** Hashed-bag-of-features linear text score (the fastText-style
    * quality-classifier shape): unigram hashes then bigram hashes — the
    * [[minhash]] tokenizer and poly31+mix64 hash family — index a
    * bucketed weight vector via the hashing trick (unsigned mod), the
    * mean weight is squashed through the rational sigmoid
    * 0.5 + 0.5·z/(1+|z|). Every step is correctly-rounded IEEE double
    * arithmetic in a pinned fold order (all unigrams in token order,
    * then all bigrams), so an engine replaying the same order
    * reproduces the score bit-for-bit — deliberately no exp/tanh,
    * whose libm rounding varies across platforms. No terms → 0.5.
    */
  def linearTextScore(text: UTF8String, weights: Array[Double]): Double = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      }
    }
    val m = weights.length
    var z = 0.0
    var t = 0
    while (t < nTok) {
      var h = 1125899906842597L
      var j = tokStarts(t)
      while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
      z += weights(java.lang.Long.remainderUnsigned(mix64(h), m).toInt)
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      var h = 1125899906842597L
      var j = tokStarts(t)
      while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
      h = 31L * h + ' '
      j = tokStarts(t + 1)
      while (j < tokEnds(t + 1)) { h = 31L * h + s.charAt(j); j += 1 }
      z += weights(java.lang.Long.remainderUnsigned(mix64(h), m).toInt)
      t += 1
    }
    val cnt = if (nTok == 0) 0 else nTok + (nTok - 1)
    if (cnt == 0) 0.5
    else {
      val zn = z / cnt
      0.5 + 0.5 * (zn / (1.0 + math.abs(zn)))
    }
  }

  /** The [[linearTextScore]] term enumeration as DATA: hashed feature
    * buckets of every unigram then every bigram, in the kernel's exact
    * fold order (same tokenizer, same poly31+mix64 family, same
    * unsigned mod). This is the training-side view of the classifier's
    * feature map — [[graft.operators.Trainer]] folds a weight vector
    * over this array during gradient descent, and because the order
    * matches the score kernel bit-for-bit, weights trained against
    * these buckets reproduce [[linearTextScore]]'s z exactly when
    * shipped back into the scan-speed kernel. Empty text → empty array.
    */
  def termBuckets(text: UTF8String, m: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var tokStarts = new Array[Int](16)
    var tokEnds = new Array[Int](16)
    var nTok = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isRegexWs(s.charAt(i))) i += 1
      if (i > start) {
        if (nTok == tokStarts.length) {
          tokStarts = java.util.Arrays.copyOf(tokStarts, nTok * 2)
          tokEnds = java.util.Arrays.copyOf(tokEnds, nTok * 2)
        }
        tokStarts(nTok) = start; tokEnds(nTok) = i; nTok += 1
      }
    }
    val cnt = if (nTok == 0) 0 else nTok + (nTok - 1)
    val out = new Array[Int](cnt)
    var t = 0
    while (t < nTok) {
      var h = 1125899906842597L
      var j = tokStarts(t)
      while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
      out(t) = java.lang.Long.remainderUnsigned(mix64(h), m).toInt
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      var h = 1125899906842597L
      var j = tokStarts(t)
      while (j < tokEnds(t)) { h = 31L * h + s.charAt(j); j += 1 }
      h = 31L * h + ' '
      j = tokStarts(t + 1)
      while (j < tokEnds(t + 1)) { h = 31L * h + s.charAt(j); j += 1 }
      out(nTok + t) = java.lang.Long.remainderUnsigned(mix64(h), m).toInt
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Σ weights(b) over a bucket-id array — the training-loop inner
    * product against the current weight vector ([[termBuckets]]'s
    * companion). A compiled loop instead of an interpreted HOF fold:
    * identical association (left-to-right over the array), so the
    * result is bit-for-bit the fold the oracle replays.
    */
  def dotBuckets(buckets: org.apache.spark.sql.catalyst.util.ArrayData,
                 weights: Array[Double]): Double = {
    val n = buckets.numElements()
    var z = 0.0
    var i = 0
    while (i < n) { z += weights(buckets.getInt(i)); i += 1 }
    z
  }

  /** Symmetric per-vector int8 quantization audit: scale = max|x|/127,
    * code_j = floor(x_j/scale + 0.5) (round-half-up via floor — the
    * one rounding rule every engine computes identically; the
    * magnitude bound makes |code| ≤ 127 by construction, no clamp).
    * Returns [scale, mse, Σcode², Σcode·(j+1)] — the ordered-fold MSE
    * pins reconstruction error, the two integer sums pin the code
    * VALUES and their positions without shipping the codes. All-zero
    * or empty input → zero stats.
    */
  def quantizeInt8Stats(vec: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var j = 0
    while (j < n) {
      val a = math.abs(vec.getFloat(j).toDouble)
      if (a > maxAbs) maxAbs = a
      j += 1
    }
    val out = new Array[Double](4)
    if (n > 0 && maxAbs > 0.0) {
      val scale = maxAbs / 127.0
      var mse = 0.0
      var l2 = 0.0
      var chk = 0.0
      j = 0
      while (j < n) {
        val x = vec.getFloat(j).toDouble
        val c = math.floor(x / scale + 0.5)
        val e = x - c * scale
        mse += e * e
        l2 += c * c
        chk += c * (j + 1)
        j += 1
      }
      out(0) = scale; out(1) = mse / n; out(2) = l2; out(3) = chk
    }
    new GenericArrayData(out)
  }

  // ------------------------------------------- blocklist (Aho–Corasick)

  /** Multi-pattern matcher for [[blocklistHits]]: classic Aho–Corasick
    * (goto trie + BFS failure links, outputs merged through the fail
    * chain), built once per DISTINCT pattern set and cached per JVM —
    * the kernel call carries the pattern set as a codegen literal, so
    * each executor builds the automaton on first touch and every later
    * row pays O(chars + matches), independent of pattern count. The
    * single-regex alternation alternative re-scans on backtrack and
    * rebuilds per batch; a per-pattern `contains` loop is O(P·chars).
    */
  private final class AcAutomaton(val patterns: Array[String]) {
    import scala.collection.mutable
    private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val out = mutable.ArrayBuffer(List.empty[Int])
    for (pi <- patterns.indices) {
      var node = 0
      val p = patterns(pi)
      var i = 0
      while (i < p.length) {
        node = children(node).getOrElseUpdate(p.charAt(i), {
          children += mutable.HashMap.empty[Char, Int]
          out += Nil
          children.size - 1
        })
        i += 1
      }
      out(node) = pi :: out(node)
    }
    private val fail = new Array[Int](children.size)
    locally {
      val queue = mutable.Queue.empty[Int]
      for ((_, c) <- children(0)) { fail(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for ((ch, v) <- children(u)) {
          var f = fail(u)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(v) = children(f).getOrElse(ch, 0)
          // BFS order: fail(v) is strictly shallower, already merged
          out(v) = out(v) ::: out(fail(v))
          queue += v
        }
      }
    }
    def step(state: Int, ch: Char): Int = {
      var s = state
      while (s != 0 && !children(s).contains(ch)) s = fail(s)
      children(s).getOrElse(ch, 0)
    }
    def outputs(state: Int): List[Int] = out(state)
  }

  private val acCache =
    new java.util.concurrent.ConcurrentHashMap[String, AcAutomaton]()

  /** Blocklist scan over the LOWERCASED text: result is the 2-long
    * array `[n_hits, n_patterns]` — total occurrences of any pattern
    * (ALL positions, overlaps included: "aa" occurs twice in "aaa")
    * and the number of distinct patterns present. `patterns` is the
    * \\u0001-joined lowercase pattern list (a plan-constant literal —
    * the cache key).
    */
  def blocklistHits(text: UTF8String, patterns: UTF8String): ArrayData = {
    val ac = acCache.computeIfAbsent(patterns.toString,
      k => new AcAutomaton(k.split('\u0001').filter(_.nonEmpty)))
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var state = 0
    var hits = 0L
    val seen = new Array[Boolean](ac.patterns.length)
    var i = 0
    while (i < s.length) {
      state = ac.step(state, s.charAt(i))
      var o = ac.outputs(state)
      while (o.nonEmpty) { hits += 1; seen(o.head) = true; o = o.tail }
      i += 1
    }
    var np = 0L
    var j = 0
    while (j < seen.length) { if (seen(j)) np += 1; j += 1 }
    new GenericArrayData(Array(hits, np))
  }

  /** WITHIN-document repetition-span statistics — the intra-doc half
    * of the ExactSubstr family ([[graft.operators.Dedup.dupSpanStats]]
    * is the cross-doc half, and needs a shuffle; this one is pure
    * map-side): a position is a REPEAT if its L-token gram already
    * occurred earlier in the same document; consecutive repeats ≤ L
    * apart fuse into maximal spans with the same island closed form.
    * Returns `[n_tokens, n_rep_grams, n_spans, rep_tokens]` (longs as
    * doubles are avoided — ArrayData of longs).
    */
  def intraDupSpanStats(text: UTF8String, shingleK: Int): ArrayData = {
    val hs = shingleHashesPos(text, shingleK).toLongArray()
    val nTokArr = shingleHashesPos(text, 1)
    val nTok = nTokArr.numElements().toLong
    val out = new Array[Long](4)
    out(0) = nTok
    if (nTok >= shingleK && hs.length > 1) {
      val seen = new java.util.HashSet[java.lang.Long](hs.length * 2)
      var nRep = 0L
      var nSpans = 0L
      var covered = 0L
      var prev = -1
      var i = 0
      while (i < hs.length) {
        if (!seen.add(hs(i))) {
          nRep += 1
          if (prev < 0 || i - prev > shingleK) { nSpans += 1; covered += shingleK }
          else covered += math.min(i - prev, shingleK)
          prev = i
        }
        i += 1
      }
      out(1) = nRep; out(2) = nSpans; out(3) = covered
    }
    new GenericArrayData(out)
  }

  /** Blocklist REDACTION — the action to [[blocklistHits]]'s report:
    * every character covered by ANY pattern occurrence (overlaps
    * union) is masked, and each MAXIMAL covered run collapses to one
    * `<blocked>` token. Output is over the lowercased text (the same
    * normalization the match itself uses — ASCII-safe, and what lets
    * an independent engine rebuild the string byte-for-byte). Same
    * cached automaton, one O(chars + matches·patlen) pass.
    */
  def blocklistRedact(text: UTF8String, patterns: UTF8String): UTF8String = {
    val ac = acCache.computeIfAbsent(patterns.toString,
      k => new AcAutomaton(k.split('\u0001').filter(_.nonEmpty)))
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    val covered = new Array[Boolean](n)
    var state = 0
    var i = 0
    while (i < n) {
      state = ac.step(state, s.charAt(i))
      var o = ac.outputs(state)
      while (o.nonEmpty) {
        var j = i - ac.patterns(o.head).length + 1
        while (j <= i) { covered(j) = true; j += 1 }
        o = o.tail
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      if (!covered(i)) { sb.append(s.charAt(i)); i += 1 }
      else { sb.append("<blocked>"); while (i < n && covered(i)) i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
