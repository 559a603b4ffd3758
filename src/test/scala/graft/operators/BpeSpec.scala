package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("trainMerges: later rounds count pairs of already-fused tokens") {
    import spark.implicits._
    val docs = Seq(
      "new york city", "new york city", "new york is big",
      "a b", "the end").toDF("doc_id")
      .withColumnRenamed("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: "new york" (3) wins over "york city" (2)
    assert(got(0) === ((1L, "new york", "new_york", 3L)))
    // round 2's winner "new_york city" exists ONLY because round 1 fused:
    // the pre-merge corpus has no such token pair
    assert(got(1) === ((2L, "new_york city", "new_york_city", 2L)))
  }

  test("trainMerges: deterministic tie-break on the pair string") {
    import spark.implicits._
    // "b c" and "a b" both appear twice; lexicographically smaller wins
    val docs = Seq("a b x", "a b y", "b c x", "b c y").toDF("text")
    val got = Bpe.trainMerges(docs, "text", k = 1).head()
    assert(got.getString(1) === "a b")
    assert(got.getLong(3) === 2L)
  }
}
