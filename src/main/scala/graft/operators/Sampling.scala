package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Unlike
  * `df.sample()` (seeded RNG over partition iterators — results change
  * with partitioning and row order), these sample on a HASH of a stable
  * key, so the same row set is selected on every run, on any cluster
  * layout, and rows added later don't disturb prior selections —
  * the property that makes incremental corpus rebuilds reproducible.
  *
  * All are narrow transforms: a codegen'd hash + comparison per row, no
  * shuffle, fully pushdown-compatible. Selection bias: xxhash64 is
  * uniform over the key space, so per-stratum sample sizes are
  * Binomial(n, fraction) — at 100 TB the relative deviation is
  * O(1/√(n·f)), negligible for any stratum big enough to matter.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep rows where `hash(key) mod 1e6 < fraction·1e6` — a
    * deterministic `fraction`-sample keyed on `key`.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    df.filter(pmod(xxhash64(key), lit(Buckets)) < (fraction * Buckets).toLong)
  }

  /** Per-stratum fractions: `fractions(stratum)` of each stratum's rows
    * (strata absent from the map fall back to `default`). One pass, no
    * shuffle — the stratum column picks the threshold per row.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1))
    val threshold = fractions.foldLeft(lit((default * Buckets).toLong)) {
      case (acc, (s, f)) =>
        when(stratum === s, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(key), lit(Buckets)) < threshold)
  }

  /** Weighted corpus mix: unions a deterministic `fraction`-sample of
    * each source (aligned by name, missing columns null). The standard
    * "mix N datasets at given rates" step of a training-data pipeline;
    * each source keeps its own stable key so re-mixing with a new
    * source leaves previous selections unchanged.
    */
  def weightedMix(sources: Seq[(DataFrame, Column, Double)]): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (df, key, f) => hashSample(df, key, f) }
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
