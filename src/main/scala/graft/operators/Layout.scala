package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys. At 100 TB the dominant cost of
  * most queries is the scan, and the dominant scan saving is file
  * skipping on min/max column statistics — which a sort on any ONE
  * column only provides for that column. A Z-order (Morton) key
  * interleaves the bits of several columns so that sorting/range-
  * partitioning files by the key keeps every interleaved dimension
  * locally clustered: each file's min/max range on EACH dimension is
  * narrow, and predicates on any of them prune files.
  *
  * The key is a pure per-row bit shuffle of the inputs — a chain of
  * shift/and/or built-ins, fully codegen'd, no UDF, no shuffle; the
  * expensive part (the global sort on the key) is the write-side
  * `repartitionByRange(zorder(...))` the caller already pays for any
  * clustered layout.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of each column in
    * `cols` (all cast to LONG; values must be non-negative — rank or
    * offset signed domains first). Bit `i` of dimension `j` lands at
    * position `i*n + (n-1-j)`, so `cols.head` owns the most
    * significant bit of every level. `bits * cols.size` must fit in a
    * signed 64-bit key.
    */
  def zorder(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "zorder needs at least two dimensions")
    require(bits >= 1 && bits * n <= 62, s"$bits bits x $n dims overflows a long key")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
      }
    }.reduce(_ + _) // bit positions are disjoint, so + is bitwise-or
  }

  /** Two-dimensional convenience: `a` interleaves to the odd bit
    * positions (MSB of each level), `b` to the even ones.
    */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    zorder(Seq(a, b), bits)

  /** Rendezvous (highest-random-weight) shard assignment — the
    * routing rule for shards/workers/cache nodes whose COUNT changes
    * over a pipeline's life (Thaler & Ravishankar 1998). Key `k` goes
    * to `argmax_s mix64(mix64(k) XOR s)`: every (key, shard) pair gets
    * an independent 64-bit score and the key follows the winner, so
    * growing `n → n+1` moves EXACTLY the keys whose new shard wins —
    * 1/(n+1) of them in expectation — and every other key stays put.
    * A `pmod(hash, n)` route reshuffles (n−1)/n of all keys on the
    * same change; at 100 TB that is the difference between warming one
    * new shard and rewriting the fleet.
    *
    * Pure per-row expression: `nShards` codegen'd mix64 evaluations,
    * no shuffle, no UDF. Scores compare as SIGNED longs (the natural
    * array_max order on both the JVM and an oracle engine re-deriving
    * the same bits); ties — a 64-bit hash collision — resolve to the
    * lowest shard id via first-position semantics. O(nShards) per row:
    * meant for routing tiers (tens of shards), not hash partitioning
    * with thousands of reducers — Spark's own exchange already handles
    * the latter.
    */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 1024,
      s"nShards=$nShards out of range — per-row cost is O(nShards)")
    import graft.plans.Exprs
    val h = Exprs.mix64(key.cast("long"))
    val scores = array((0 until nShards).map(s =>
      Exprs.mix64(h.bitwiseXOR(lit(s.toLong)))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }
}
