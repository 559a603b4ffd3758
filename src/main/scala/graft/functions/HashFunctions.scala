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
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

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
    * the input set for MinHash.
    */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(wordShingles(text, k), s => xxhash64(s)))

  /** Multiply-shift permutation of a 64-bit hash: `a*h + b` with odd `a`,
    * wrapping arithmetic. A standard cheap MinHash permutation family.
    */
  def permute(h: Column, a: Long, b: Long): Column = h * lit(a) + lit(b)

  /** Deterministic per-permutation constants: odd multipliers derived
    * from splitmix64 of the permutation index (public-domain constant
    * mixing, same family used by java.util.SplittableRandom).
    */
  def permutationConstants(numPerms: Int): Seq[(Long, Long)] =
    (0 until numPerms).map { i =>
      (splitmix64(2L * i + 1) | 1L, splitmix64(2L * i + 2))
    }

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature as a Column composition: for each permutation,
    * the min permuted shingle hash. Fine for small signature counts;
    * [[graft.plans.Kernels.minhash]] is the single-pass kernel used by
    * the dedup operator.
    */
  def minhashSignatureCols(text: Column, shingleK: Int, numPerms: Int): Column = {
    val hs = shingleHashes(text, shingleK)
    array(permutationConstants(numPerms).map { case (a, b) =>
      array_min(transform(hs, h => permute(h, a, b)))
    }: _*)
  }

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
