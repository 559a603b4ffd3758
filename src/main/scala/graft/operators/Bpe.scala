package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-merge training at the TOKEN level (the word2phrase /
  * first-k-BPE-merges step of tokenizer prep): iteratively find the
  * most frequent adjacent token pair and fuse its occurrences with an
  * underscore, re-counting after each merge so later merges see fused
  * tokens (e.g. `new_york` can pair with `city` in round 2).
  *
  * Scale shape per round (the Lloyd's-loop pattern of [[KMeans]]): one
  * in-row pair-count explode + one count aggregation on the pair key;
  * only the single argmax row reaches the driver; the merge itself is
  * a narrow `replace` projection over the corpus. k rounds = k corpus
  * passes, each whole-stage-codegen.
  *
  * Determinism contract: texts are whitespace-normalized and
  * space-padded once, the argmax breaks ties on (count desc, pair
  * asc), and the fuse is plain non-overlapping left-to-right substring
  * `replace` — identical semantics in the JVM and DuckDB, so the whole
  * loop is SQL-replayable. (Consecutive overlapping occurrences
  * "a b a b" fuse only the first — the shared separator space is
  * consumed; both engines agree. Documented greedy-miss.)
  */
object Bpe {

  /** The first `k` merges: one row per round —
    * (step, pair, merged, c = the pair's count when it won).
    */
  def trainMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    var cur = df.select(concat(lit(" "),
      regexp_replace(trim(lower(col(textCol))), graft.plans.Kernels.WsRun, " "), lit(" ")).as("t"))
    // each round's corpus is persisted before its argmax action:
    // without the cache round i's scan re-applies all i−1 earlier
    // replaces from the raw input — a QUADRATIC recompute in k (and k
    // distinct growing codegen plans). Cached, every round is one
    // narrow pass over the previous round's materialized corpus.
    // ROLLING 2-deep: once round i's argmax has materialized round i's
    // cache, round i−1's is dead (round i+1 reads only round i) — so
    // at most two corpus copies are ever resident, not k.
    var prev: DataFrame = null
    val steps = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to k) {
      cur = cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = cur.select(explode(Exprs.pairCounts(col("t"))).as(Seq("pair", "c_i")))
        .groupBy(col("pair")).agg(sum(col("c_i").cast("long")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect()(0)
      if (prev != null) prev.unpersist(blocking = false)
      prev = cur
      val pair = top.getString(0)
      val merged = pair.replace(' ', '_')
      steps += ((step, pair, merged, top.getLong(1)))
      cur = cur.select(replace(col("t"),
        lit(s" $pair "), lit(s" $merged ")).as("t"))
    }
    prev.unpersist(blocking = false)
    steps.result().toDF("step", "pair", "merged", "c")
      .select(col("step").cast("long").as("step"), col("pair"),
        col("merged"), col("c"))
  }

  /** Tokenizer APPLICATION: train the first `k` merges with
    * [[trainMerges]], then encode every document by replaying the
    * merge list in rank order — per document: token count before, after,
    * and the compression the merges bought. This is the deploy half of
    * BPE (train once, encode the whole corpus).
    *
    * Scale shape: training is k bounded corpus passes (see
    * [[trainMerges]]); the ENCODE is a single narrow projection — the
    * k-deep `replace` chain and both token counts fuse into one
    * whole-stage-codegen pass over the corpus, no shuffle, no join
    * (the merge list is driver-collected: k rows by contract).
    */
  def encode(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val merges = trainMerges(df, textCol, k)
      .select(col("step"), col("pair"), col("merged"))
      .collect().sortBy(_.getLong(0))
    val norm = concat(lit(" "),
      regexp_replace(trim(lower(col(textCol))), graft.plans.Kernels.WsRun, " "), lit(" "))
    val encoded = merges.foldLeft(norm) { (t, m) =>
      replace(t, lit(" " + m.getString(1) + " "), lit(" " + m.getString(2) + " "))
    }
    df.select(col(idCol),
      graft.plans.Exprs.tokenCount(norm).cast("long").as("n_raw"),
      graft.plans.Exprs.tokenCount(encoded).cast("long").as("n_bpe"))
  }
}
