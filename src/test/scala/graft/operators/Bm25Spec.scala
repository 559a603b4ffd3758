package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  test("bm25: relevant docs rank first, term saturation, non-matching docs absent") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark shuffle join optimizer"),          // both query terms once
      (1L, "join join join join join join join"),    // term-stuffed
      (2L, "spark spark join shuffle"),               // both terms, short doc
      (3L, "completely unrelated text about cats"),
      (4L, "spark")                                   // one term
    ).toDF("doc_id", "text")
    val got = Bm25.topDocs(docs, "doc_id", "text", Seq((0L, "spark join")), topK = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byDoc = got.map(t => t._1 -> t._2).toMap
    // doc 3 shares no term: absent
    assert(!byDoc.contains(3L))
    assert(got.length === 4)
    // docs with BOTH terms outrank the single-term and stuffed docs
    val ranks = got.map(t => t._1 -> t._3).toMap
    assert(Set(ranks(0L), ranks(2L)) === Set(1L, 2L),
      s"two-term docs must lead: $ranks")
    // saturation: 7x 'join' must not beat a doc containing both terms
    assert(ranks(1L) > ranks(2L) && ranks(1L) > ranks(0L))
    // scores positive and consistent with ranks
    val sorted = got.sortBy(_._3).map(_._2)
    assert(sorted === sorted.sorted.reverse && sorted.forall(_ > 0))
  }

  test("bm25: probe join broadcasts; corpus side has no all-pairs stage") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val p = Bm25.topDocs(docs, "doc_id", "text", Seq((0L, "b")), topK = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"query probe must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs stage:\n$p")
  }
}
