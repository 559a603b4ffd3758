package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling + hash-family helpers for the dedup/similarity operators.
  *
  * Built-in-function compositions only (codegen'd); the heavy per-row
  * kernels (SimHash, MinHash signatures, cosine) live in
  * [[graft.plans.Kernels]] as native Catalyst expressions.
  */
object HashFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), graft.plans.Kernels.WsRun)

  /** Word k-shingles: overlapping k-grams of whitespace tokens, joined by
    * a single space. `"a b c d"`, k=2 → `["a b", "b c", "c d"]`. Texts
    * shorter than k tokens yield the whole text as one shingle.
    */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** Distinct shingle hashes (xxhash64, Spark's codegen'd 64-bit hash) —
    * the input set for the inverted-index Jaccard join. (The MinHash
    * signature itself is the single-pass [[graft.plans.Kernels.minhash]]
    * kernel — one hash family, one implementation.)
    */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(wordShingles(text, k), s => xxhash64(s)))

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    inter / (size(ad) + size(bd) - inter).cast("double")
  }
}
