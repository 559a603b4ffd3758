package graft.operators

import graft.plans.Exprs
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale model: `queries` is the small side (a probe set) and is
  * broadcast; `corpus` is the 100 TB side and is scanned exactly once.
  * The brute-force path is a broadcast nested-loop with a codegen'd
  * cosine kernel; the per-query top-k reduction is a **bounded-heap
  * Aggregator** whose partial (map-side) state never exceeds k rows per
  * (query, partition) — the shuffle carries ≤ |queries|·|partitions|·k
  * rows, not the |corpus|·|queries| scored rows a window would move.
  */
object Similarity {

  /** One scored candidate; the Aggregator input row. */
  case class Scored(neighbor_id: Long, cosine: Double)

  /** Bounded top-k buffer (kept sorted: cosine desc, id asc). */
  case class TopKBuf(items: Seq[Scored])

  /** Partial-aggregating top-k: `reduce` keeps at most k rows per
    * partition-local buffer, `merge` combines two ≤k buffers — classic
    * bounded-heap semantics with deterministic ties (higher cosine
    * first, then lower id). ObjectHashAggregate runs this partial+final.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.cosine > b.cosine || (a.cosine == b.cosine && a.neighbor_id < b.neighbor_id)
    private def trim(s: Seq[Scored]): Seq[Scored] = s.sortWith(lt).take(k)
    def zero: TopKBuf = TopKBuf(Vector.empty)
    def reduce(b: TopKBuf, a: Scored): TopKBuf =
      if (b.items.size < k) TopKBuf(trim(b.items :+ a))
      else if (lt(a, b.items.last)) TopKBuf(trim(b.items :+ a))
      else b
    def merge(x: TopKBuf, y: TopKBuf): TopKBuf = TopKBuf(trim(x.items ++ y.items))
    def finish(b: TopKBuf): Seq[Scored] = b.items
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Returns (query_id, neighbor_id, cosine, rank).
    *
    * Plan shape: broadcast(queries) ⋈ corpus (BroadcastNestedLoopJoin,
    * corpus scanned once) → bounded top-k aggregation (partial state ≤ k
    * rows per query per partition) → posexplode to ranked rows.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame,
                 corpusId: String, corpusVec: String,
                 queryId: String, queryVec: String, k: Int): DataFrame = {
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.cosineSim(col("cv"), col("qv")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Hyperplane-LSH ANN top-k: both sides get a `bits`-bit sign
    * signature; candidates must share at least one of `bands` bit-bands.
    * Only candidates are scored — on clustered data this prunes most of
    * the corpus per query. Recall < 1.0 by construction; raise `bits` /
    * `bandBits` together for narrower buckets, add bands for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String, k: Int,
              bits: Int = 64, bandBits: Int = 16): DataFrame = {
    require(bits % bandBits == 0, "bits must divide into bandBits bands")
    val bands = bits / bandBits
    def banded(df: DataFrame, id: String, vec: String, idOut: String) =
      df.select(col(id).as(idOut), col(vec).as(s"${idOut}_v"),
          Exprs.hyperplaneSig(col(vec), bits).as("sig"))
        .select(col(idOut), col(s"${idOut}_v"),
          explode(array((0 until bands).map(i =>
            struct(lit(i).as("band"),
              shiftrightunsigned(col("sig"), i * bandBits)
                .bitwiseAND(lit((1L << bandBits) - 1)).as("bk"))): _*)).as("c"))
        .select(col(idOut), col(s"${idOut}_v"), col("c.band"), col("c.bk"))
    val c = banded(corpus, corpusId, corpusVec, "neighbor_id")
    val q = banded(queries, queryId, queryVec, "query_id")
    val scored = c.join(broadcast(q), Seq("band", "bk"))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.cosineSim(col("neighbor_id_v"), col("query_id_v")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    topKPerQuery(scored, k)
  }

  /** kNN label propagation: each query row gets the majority label of
    * its `k` nearest labeled neighbors by cosine — the standard cheap
    * classifier for extending a small labeled seed set (quality tiers,
    * topics, toxicity) over an unlabeled corpus. Ties are deterministic:
    * most votes first, then the smallest label. Returns
    * (query_id, pred_label, votes).
    *
    * Scale shape: the expensive part is [[cosineTopK]] (labeled corpus
    * scanned once, bounded-heap top-k); the vote join then BROADCASTS
    * the ≤ |queries|·k top-k rows against the corpus — the big side is
    * never shuffled — and the majority window runs over ≤ k rows per
    * query.
    */
  def knnClassify(labeled: DataFrame, queries: DataFrame,
                  corpusId: String, corpusVec: String, labelCol: String,
                  queryId: String, queryVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = cosineTopK(labeled, queries, corpusId, corpusVec, queryId, queryVec, k)
    val votes = labeled.select(col(corpusId).as("neighbor_id"), col(labelCol).as("_lbl"))
      .join(broadcast(topk.select(col("query_id"), col("neighbor_id"))), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("_lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("_lbl").asc)
    votes.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("query_id"), col("_lbl").as("pred_label"), col("votes"))
  }

  /** Per-label embedding centroids (prototype vectors / class means):
    * explode to (label, dim, component) rows and average per (label,
    * dim) — per-group aggregation state is one running (sum, count)
    * scalar, so group count = labels × dim regardless of corpus size
    * (never a per-label vector buffer). Returns (label, dim, centroid).
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(avg(col("x").cast("double")).as("centroid"))

  /** Per-query top-k reduction via [[TopKAgg]] — partial aggregation
    * bounds map-side state to k rows per query; the final explode emits
    * rank = position in the (cosine desc, id asc) order, matching the
    * row_number() formulation row-for-row.
    */
  /** Reciprocal-rank fusion of ranked retrieval lists (the standard
    * hybrid-search combiner): fused(q, doc) = Σ over lists of
    * `1/(k0 + rank)`, docs missing from a list contribute 0. Inputs
    * are (query, id, rank) frames — lexical BM25, vector ANN, anything
    * ranked. RRF needs only RANKS (integers), so the fusion is exact
    * rational arithmetic — no score normalization across incomparable
    * scales, and engine-stable by construction.
    *
    * Shape: union of the (already top-k-bounded) lists → one
    * aggregation on (query, id) → per-query top-`topK` window over
    * ≤ Σ list sizes rows. Everything downstream of the retrievers is
    * probe-scale, never corpus-scale.
    */
  def rrfFuse(lists: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lists.nonEmpty)
    val contrib = lists.map(_.select(col("query_id"), col("id"),
        (lit(1.0) / (lit(k0) + col("rank")).cast("double")).as("c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("query_id"), col("id"))
      .agg(round(sum(col("c")), 6).as("rrf"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("id"), col("rrf"), col("rank").cast("long").as("rank"))
  }

  /** Johnson–Lindenstrauss sign random projection: reduce an
    * `Array[Float]` embedding column from `inDim` to `outDim`
    * dimensions with the deterministic ±1 matrix
    * `sign(j,i) = 2·(mix64(j·inDim + i) & 1) − 1` (Achlioptas-style
    * database-friendly JL: ±1 entries preserve pairwise distances to
    * (1±ε) with outDim = O(log n / ε²), no Gaussian sampling needed).
    * The ANN/semantic-dedup preprocessing step that makes a 1024-dim
    * embedding column affordable to band, bucket, and scan at corpus
    * scale.
    *
    * Output: `(vec_id, j, comp)` exploded per output dimension, with
    * `comp` in integer MICRO-UNITS of the input (inputs are graded to
    * `round(x·1e6)` longs before the sum, so the projection is exact
    * integer arithmetic — order-free, bit-reproducible cross-engine;
    * callers wanting the conventional scaling divide by
    * `sqrt(outDim)·1e6`). Overflow bound: |comp| ≤ inDim · max|x| ·
    * 1e6 — safe for any embedding with |x| < 9.2e12/(inDim·1e6).
    *
    * Scale shape: MAP-ONLY — a narrow projection of k·d integer
    * multiply-adds per row (array HOFs over the graded vector), no
    * shuffle, no UDF, no driver state; composes with pushdown (the
    * scan reads only id + embedding).
    */
  def jlProject(df: DataFrame, idCol: String, embCol: String,
                inDim: Int, outDim: Int): DataFrame = {
    require(inDim >= 1, s"inDim must be positive, got $inDim")
    require(outDim >= 1 && outDim <= inDim,
      s"outDim must be in [1, inDim=$inDim], got $outDim")
    val graded = transform(col(embCol), x =>
      round(x.cast("double") * 1e6).cast("long"))
    val comps = (0 until outDim).map { j =>
      aggregate(sequence(lit(0), lit(inDim - 1)), lit(0L), (acc, i) =>
        acc + (Exprs.mix64((lit(j.toLong * inDim) + i).cast("long"))
          .bitwiseAND(lit(1L)) * 2 - 1) * element_at(col("_g"), i + 1))
    }
    df.select(col(idCol).cast("long").as("vec_id"), graded.as("_g"))
      .select(col("vec_id"), posexplode(array(comps: _*)).as(Seq("j", "comp")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("comp"))
  }

  /** Hard-negative mining for contrastive / retrieval training: for
    * each probe, the k most-similar corpus rows carrying a DIFFERENT
    * label — the near-miss examples a bi-encoder learns the most from
    * (random negatives are trivially separable; the hard ones sit just
    * across the decision boundary).
    *
    * Same scale contract as [[cosineTopK]]: the probe set broadcasts,
    * the corpus is scanned exactly once, and the label-mismatch filter
    * runs BEFORE the bounded top-k aggregation — same-label rows never
    * enter the heap, so the shuffle still carries ≤ |queries|·k rows
    * per partition. Ties break (cosine desc, neighbor_id asc).
    */
  def hardNegatives(labeled: DataFrame, queries: DataFrame,
                    corpusId: String, corpusVec: String, corpusLabel: String,
                    queryId: String, queryVec: String, queryLabel: String,
                    k: Int): DataFrame = {
    val scored = labeled.select(col(corpusId).as("neighbor_id"),
        col(corpusVec).as("cv"), col(corpusLabel).as("nl"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qv"), col(queryLabel).as("ql"))))
      .filter(col("nl") =!= col("ql"))
      .select(col("query_id"), col("neighbor_id"),
        Exprs.cosineSim(col("cv"), col("qv")).as("cosine"))
    topKPerQuery(scored, k)
  }

  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        round(col("col.cosine"), 6).as("cosine"),
        (col("pos") + 1).as("rank"))
  }
}
