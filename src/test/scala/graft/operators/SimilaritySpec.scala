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
}
