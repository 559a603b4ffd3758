package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.plans.Kernels

/** Deterministic multiplier bootstrap as a single-pass mergeable
  * aggregate.
  *
  * Replica weights are the same hash-derived multipliers q136's
  * original explode formulation used — row weight for replica `r` is
  * `mix64(key * reps + r) & 3` mapped {0→2, 3→0, else 1} (mean 1,
  * variance 1/2) — so the replica sums are bit-identical to the
  * exploded groupBy and to the DuckDB oracle that rebuilds them in
  * SQL.
  *
  * Scale shape: the explode version materializes `reps × n` rows
  * through a hash aggregate; at 100 TB that is a 64× row blow-up
  * BEFORE the map-side combine can absorb it. This aggregator keeps
  * the blow-up out of the row stream entirely: one pass over the
  * data, a `2 × reps`-long state per partition, and a shuffle of one
  * such buffer per map task. `reduce` is a tight `while` over
  * primitive arrays (reps mix64 finalizers per row, no boxing).
  */
object Bootstrap {

  /** One observation: the replica-weight hash key and the integer
    * measure (e.g. cents) being bootstrapped. */
  case class Obs(key: Long, cents: Long)

  /** Per-replica weighted sums: `swc(r)` = Σ w·cents, `sw(r)` = Σ w. */
  case class RepBuf(swc: Array[Long], sw: Array[Long])

  /** Mergeable replica-sum aggregator; `finish` emits the `reps`
    * replica means as exact long/long double divisions (the same IEEE
    * op sequence as the exploded form's `sum/sum` per group). */
  class ReplicaMeans(reps: Int) extends Aggregator[Obs, RepBuf, Seq[Double]] {
    def zero: RepBuf = RepBuf(new Array[Long](reps), new Array[Long](reps))

    def reduce(b: RepBuf, a: Obs): RepBuf = {
      val base = a.key * reps
      var r = 0
      while (r < reps) {
        val h = Kernels.mix64(base + r) & 3L
        if (h == 0L) { b.swc(r) += 2L * a.cents; b.sw(r) += 2L }
        else if (h != 3L) { b.swc(r) += a.cents; b.sw(r) += 1L }
        r += 1
      }
      b
    }

    def merge(x: RepBuf, y: RepBuf): RepBuf = {
      var r = 0
      while (r < reps) { x.swc(r) += y.swc(r); x.sw(r) += y.sw(r); r += 1 }
      x
    }

    def finish(b: RepBuf): Seq[Double] =
      (0 until reps).map(r => b.swc(r).toDouble / b.sw(r).toDouble)

    def bufferEncoder: Encoder[RepBuf] = Encoders.product[RepBuf]
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: aggregates to an array of `reps` replica means.
    * Explode it and take percentiles for a CI. */
  def replicaMeans(keyCol: Column, centsCol: Column, reps: Int = 64): Column = {
    val agg = udaf(new ReplicaMeans(reps), Encoders.product[Obs])
    agg(keyCol.cast("long"), centsCol.cast("long"))
  }
}
