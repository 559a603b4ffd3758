package graft

/** DuckDB SQL fragment generators that reproduce the engine's hash
  * kernels ([[graft.plans.Kernels]]) bit-for-bit in plain SQL.
  *
  * The kernels' hash family is deliberately arithmetic-only —
  * `mix64` (the public-domain splitmix64 finalizer) over a base-31
  * polynomial — so a second engine can re-derive every signature,
  * sketch and bucket key from first principles. DuckDB's 64-bit
  * integers error on overflow rather than wrap, so all wraparound
  * multiplies are routed through HUGEINT (128-bit) with an explicit
  * `mod 2^64`; a full 64×64 product can overflow even INT128, so
  * multiplies split the constant into 32-bit halves.
  *
  * These fragments power the cross-engine oracles of the sketch/LSH
  * catalog queries (q34/q35/q62) that would otherwise be rows-only.
  */
object OracleSql {

  /** 2^64 as a SQL literal (HUGEINT domain). */
  val M64 = "18446744073709551616"

  /** (a * c) mod 2^64 where `a` is a UBIGINT-typed SQL expression and
    * `c` a known 64-bit unsigned constant. Splits `c` into 32-bit
    * halves so neither partial product overflows INT128:
    * a·c = a·c_lo + (a·c_hi mod 2^32)·2^32  (mod 2^64).
    */
  def mulModConst(a: String, c: BigInt): String = {
    val ch = c >> 32
    val cl = c & 0xffffffffL
    s"CAST(((CAST($a AS HUGEINT) * $cl) % $M64 + " +
      s"((CAST($a AS HUGEINT) * $ch) % 4294967296) * 4294967296) % $M64 AS UBIGINT)"
  }

  /** splitmix64 finalizer of a UBIGINT-typed SQL expression — exactly
    * [[graft.plans.Kernels.mix64]]. Result is UBIGINT.
    */
  def mix64(x: String): String = {
    val s1 = s"CAST((CAST($x AS HUGEINT) + 11400714819323198485) % $M64 AS UBIGINT)"
    val t1 = s"xor($s1, $s1 >> 30)"
    val s2 = mulModConst(t1, BigInt("bf58476d1ce4e5b9", 16))
    val t2 = s"xor($s2, $s2 >> 27)"
    val s3 = mulModConst(t2, BigInt("94d049bb133111eb", 16))
    s"xor($s3, $s3 >> 31)"
  }

  /** Base-31 polynomial over a string's code points, mod 2^64 —
    * [[graft.plans.Kernels]]'s token/shingle polynomial with its
    * default seed, or the seed-0 variant of `fingerprint64` (31·h ≤
    * 2^69 stays inside HUGEINT, so no split needed). `s` is a
    * VARCHAR-typed SQL expression; result UBIGINT.
    */
  def poly31(s: String, seed: Long = 1125899906842597L): String =
    s"CAST(list_reduce(list_prepend(CAST($seed AS HUGEINT), " +
      s"list_transform(string_split($s, ''), c -> CAST(unicode(c) AS HUGEINT))), " +
      s"(h, c) -> (31*h + c) % $M64) AS UBIGINT)"

  /** Reinterpret a UBIGINT-typed SQL expression as the signed 64-bit
    * value with the same bits (JVM Long semantics). Result BIGINT.
    */
  def toSigned(u: String): String =
    s"(CASE WHEN $u >= 9223372036854775808 " +
      s"THEN CAST(CAST($u AS HUGEINT) - $M64 AS BIGINT) " +
      s"ELSE CAST($u AS BIGINT) END)"

  /** The canonical value-hash as signed BIGINT: mix64 of a non-negative
    * BIGINT SQL expression, reinterpreted signed — matches
    * `Exprs.mix64(col)` on the Spark side.
    */
  def mix64Signed(x: String): String = toSigned(mix64(s"CAST($x AS UBIGINT)"))

  /** The minhash permutation constants of [[graft.plans.Kernels.minhash]]:
    * a_p = mix64(2p+1)|1, b_p = mix64(2p+2), as unsigned BigInts.
    */
  def minhashPerms(numPerms: Int): Seq[(BigInt, BigInt)] = {
    def u(l: Long): BigInt = BigInt(java.lang.Long.toUnsignedString(l))
    (0 until numPerms).map { p =>
      (u(graft.plans.Kernels.mix64(2L * p + 1) | 1L), u(graft.plans.Kernels.mix64(2L * p + 2)))
    }
  }
}
