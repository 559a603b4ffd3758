package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the APPROXIMATION BOUNDARY of [[OracleSql.caseFold]]'s
  * final-sigma rule (r19 advisor): the `(\p{L})Σ($|[^\p{L}])` regex is
  * exact on every planted corpus shape, but diverges from the JVM's
  * Unicode Final_Sigma condition in two known configurations. This
  * spec asserts the divergence EXPLICITLY — a future corpus that
  * plants these shapes must update the fold (and this pin) rather
  * than silently desync an oracle from the engine.
  *
  * The emulation below is the DuckDB side of the r19 case-matrix
  * measurement in JVM form: DuckDB's `lower()` is the simple
  * per-codepoint map (= `Character.toLowerCase(int)` on these
  * characters — pinned empirically in SCALE.md r17/r19), and `fold`
  * applies OracleSql.caseFold's two replacements verbatim (Java and
  * RE2 agree on `\p{L}` for every character involved).
  */
class CaseFoldBoundarySpec extends AnyFunSuite {

  /** DuckDB lower(): simple per-codepoint lowercase. */
  private def duckLower(s: String): String = {
    val b = new java.lang.StringBuilder
    s.codePoints().forEach(c => b.appendCodePoint(Character.toLowerCase(c)))
    b.toString
  }

  /** OracleSql.caseFold's replacements, JVM-side: İ → i+U+0307, then
    * word-final Σ (letter before, no letter after) → ς. */
  private def fold(s: String): String =
    s.replace("İ", "i̇")
      .replaceAll("(\\p{L})Σ($|[^\\p{L}])", "$1ς$2")

  private def jvm(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  test("the fold is exact on the planted case-twin shapes") {
    // the shapes tools/unicode_corpus.py `case` mode actually plants:
    // İ word-initial, Σ word-final directly after a letter, Σ medial
    for (s <- Seq("İSTANBUL ΟΔΟΣ", "ΝΕΡΟΣ ΚΑΙ", "ΣΟΦΟΣ", "Σ", "AΣB"))
      assert(jvm(s) === duckLower(fold(s)), s"planted shape: $s")
  }

  test("KNOWN DIVERGENCE: Σ after a case-ignorable char (apostrophe) inside a word") {
    // JVM Final_Sigma skips case-ignorables when looking left: the
    // apostrophe doesn't break the cased context, so Σ finalizes → ς.
    // The fold's regex requires \p{L} IMMEDIATELY before Σ — the
    // apostrophe isn't a letter, so the fold skips and DuckDB's simple
    // map yields σ. Pinned so a corpus planting this shape fails HERE,
    // loudly, instead of hash-diverging in a folded oracle.
    val s = "ΜΙΑ'Σ"
    assert(jvm(s) === "μια'ς", "JVM finalizes through the apostrophe")
    assert(duckLower(fold(s)) === "μια'σ", "the fold does not")
    assert(jvm(s) !== duckLower(fold(s)))
  }

  test("KNOWN DIVERGENCE: Σ directly preceded by İ (the fold's own inserted U+0307)") {
    // caseFold replaces İ FIRST, leaving i+U+0307 before Σ; U+0307 is
    // Mn (not \p{L}), so the sigma rule no longer matches although the
    // JVM — evaluating Final_Sigma on the ORIGINAL string, where İ is
    // a cased letter — finalizes it.
    val s = "İΣ"
    assert(jvm(s) === "i̇ς", "JVM: cased İ before Σ → final form")
    assert(duckLower(fold(s)) === "i̇σ", "fold: U+0307 blocks the rule")
    assert(jvm(s) !== duckLower(fold(s)))
  }
}
