package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("knnClassify recovers planted cluster labels and breaks ties deterministically") {
    import spark.implicits._
    // three orthogonal-ish prototypes; labeled points are tiny jitters
    // of a prototype, queries are fresh jitters of the same prototypes
    val protos = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    def jitter(p: Array[Float], s: Int): Array[Float] =
      p.zipWithIndex.map { case (x, i) => x + 0.01f * ((s * 31 + i) % 7 - 3) }
    val labeled = (0 until 60).map { i =>
      (i.toLong, jitter(protos(i % 3), i), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val queries = (100 until 112).map { i =>
      (i.toLong, jitter(protos(i % 3), i))
    }.toDF("vec_id", "embedding")
    val preds = Similarity.knnClassify(labeled, queries,
        "vec_id", "embedding", "label", "vec_id", "embedding", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(preds.size === 12)
    preds.foreach { case (qid, (lbl, votes)) =>
      assert(lbl === (qid % 3).toInt, s"query $qid")
      assert(votes === 5L, "planted clusters are unanimous")
    }
  }

  test("knnClassify ties go to the smallest label") {
    import spark.implicits._
    // two labeled points equidistant from the axis-diagonal query,
    // k=2 -> one vote each; smallest label must win
    val labeled = Seq(
      (1L, Array(1f, 0f), 7), (2L, Array(0f, 1f), 3)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((9L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(labeled, queries,
      "vec_id", "embedding", "label", "vec_id", "embedding", k = 2).head()
    assert(out.getInt(1) === 3)
    assert(out.getLong(2) === 1L)
  }

  test("hardNegatives: same-label rows never surface, ranks follow cosine") {
    import spark.implicits._
    // corpus: 6 label-0 points hugging proto0 (VERY close to the query)
    // and 8 label-1 points at varying angles. A plain top-k would return
    // the label-0 points; hard negatives must skip them all and rank the
    // label-1 points by cosine.
    val q = Array(1f, 0f, 0f)
    val sameLabel = (0 until 6).map(i =>
      (i.toLong, Array(1f, 0.001f * i, 0f), 0))
    val diffLabel = (10 until 18).map { i =>
      val ang = (i - 9) * 0.1
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0f), 1)
    }
    val corpus = (sameLabel ++ diffLabel).toDF("vec_id", "embedding", "label")
    val queries = Seq((99L, q, 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(corpus, queries,
        "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 5)
      .orderBy(col("rank")).collect()
    assert(got.length === 5)
    // increasing angle → decreasing cosine → ids 10,11,12,13,14 in order
    assert(got.map(_.getLong(1)).toSeq === Seq(10L, 11L, 12L, 13L, 14L))
    assert(got.map(_.getInt(3)).toSeq === Seq(1, 2, 3, 4, 5))
    val cosines = got.map(_.getDouble(2))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a > b })
  }

  test("rrfFuse: hand-computed fusion, missing-list docs, tie-break on id") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "id", "rank")
    val vec = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("query_id", "id", "rank")
    val got = Similarity.rrfFuse(Seq(lex, vec), topK = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toList
      .sortBy(_._3)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 11: in both lists (rank 2 lex + rank 1 vec) must lead
    assert(got.head._1 === 11L)
    assert(got.head._2 === r6(1.0 / 62 + 1.0 / 61))
    // doc 10: lex rank 1 only; doc 13: vec rank 2 only; doc 12: lex rank 3
    assert(got.map(_._1) === List(11L, 10L, 13L, 12L))
    assert(got.map(_._3) === List(1L, 2L, 3L, 4L))
  }

  test("jlProject: exact parity with a driver-side integer reference fold") {
    import spark.implicits._
    val vecs = (0 until 20).map { v =>
      (v.toLong, Array.tabulate(8)(i => ((v * 13 + i * 7) % 11 - 5) / 3.0f))
    }
    val got = Similarity.jlProject(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", inDim = 8, outDim = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // independent re-derivation with the same public constants
    def sign(j: Int, i: Int): Long =
      (graft.plans.Kernels.mix64(j.toLong * 8 + i) & 1L) * 2 - 1
    for ((id, emb) <- vecs; j <- 0 until 4) {
      val want = (0 until 8).map(i =>
        sign(j, i) * math.round(emb(i).toDouble * 1e6)).sum
      assert(got((id, j.toLong)) === want, s"vec $id component $j")
    }
    assert(got.size === 20 * 4)
  }

  test("jlProject: preserves pairwise distances to JL tolerance on planted clusters") {
    import spark.implicits._
    // two tight clusters far apart: after projection, within-cluster
    // distances must stay well below cross-cluster distances (the
    // property ANN banding over the projected space relies on)
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    val far = Array.tabulate(64)(i => if (i % 3 == 0) -2f else 2f)
    def j(p: Array[Float], s: Int) = p.zipWithIndex.map {
      case (x, i) => x + 0.001f * ((s * 17 + i) % 5 - 2) }
    val vecs = (0 until 10).map(v => (v.toLong, j(base, v))) ++
      (10 until 20).map(v => (v.toLong, j(far, v)))
    val proj = Similarity.jlProject(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", inDim = 64, outDim = 16)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2).toDouble)).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val within = for (a <- 0 until 10; b <- a + 1 until 10)
      yield d2(proj(a.toLong).toSeq, proj(b.toLong).toSeq)
    val across = for (a <- 0 until 10; b <- 10 until 20)
      yield d2(proj(a.toLong).toSeq, proj(b.toLong).toSeq)
    assert(within.max < across.min / 10,
      s"projected within-cluster max ${within.max} must sit far below " +
        s"cross-cluster min ${across.min}")
  }
}
