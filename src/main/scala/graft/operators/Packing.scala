package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for pretraining prep: group variable-length
  * documents into fixed-token-budget training sequences ("bins") so
  * batch construction wastes as little padding as possible — the step
  * between a curated corpus and an epoch's worth of fixed-shape
  * training examples.
  *
  * Packing is inherently a sequential fold (each placement depends on
  * the bin state left by the previous one), so the scalable shape is
  * shard-parallelism: hash documents into `nShards` independent
  * shards, order each shard deterministically, and run the greedy
  * next-fit fold per shard. Packing quality is unaffected by sharding
  * (next-fit's waste bound is per-bin, not global) and parallelism is
  * `nShards` — set it to the cluster's core count at 100 TB. The
  * result is partitioning-invariant: shard assignment and in-shard
  * order depend only on the key, and the fold's state resets at every
  * shard boundary, so it does not matter which Spark partition a
  * shard lands in (or whether two shards share one).
  */
object Packing {

  /** Greedy next-fit packing: within a shard, documents are taken in
    * `keyCol` order and appended to the current bin while they fit;
    * a document that would overflow a non-empty bin closes it and
    * starts the next one. A document larger than `capacity` occupies
    * a bin alone (never split). Appends `shard`, `seq_id` (bin number
    * within the shard) and `seq_offset` (token offset of the document
    * inside its bin) to the input columns.
    *
    * `tokensCol` must be a non-negative LONG column (pre-compute it
    * with [[graft.plans.Exprs.scanTokens]] or a real tokenizer).
    */
  def packSequences(df: DataFrame, keyCol: String, tokensCol: String,
                    capacity: Long, nShards: Int): DataFrame = {
    require(capacity > 0, s"capacity $capacity must be positive")
    require(nShards > 0, s"nShards $nShards must be positive")
    val sharded = df.withColumn("shard",
      pmod(Exprs.mix64(col(keyCol).cast("long")), lit(nShards.toLong)))
    // one shuffle on the shard key; the in-shard sort happens in the
    // exchange's own stage, and the fold below is a narrow pass over it
    val arranged = sharded.repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
    val shardIdx = arranged.schema.fieldIndex("shard")
    val tokIdx = arranged.schema.fieldIndex(tokensCol)
    val outSchema = arranged.schema
      .add("seq_id", LongType, nullable = false)
      .add("seq_offset", LongType, nullable = false)
    arranged.mapPartitions { it =>
      var curShard = Long.MinValue
      var seq = 0L
      var used = 0L
      it.map { r =>
        val sh = r.getLong(shardIdx)
        val t = r.getLong(tokIdx)
        if (sh != curShard) { curShard = sh; seq = 0L; used = 0L }
        else if (used + t > capacity && used > 0) { seq += 1; used = 0L }
        val off = used
        used += t
        Row.fromSeq(r.toSeq :+ seq :+ off)
      }
    }(Encoders.row(outSchema))
  }
}
