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
}
