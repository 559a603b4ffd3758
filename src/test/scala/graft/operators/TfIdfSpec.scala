package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {

  test("topTerms surfaces document-specific vocabulary over corpus-wide terms") {
    import spark.implicits._
    // "common" appears everywhere (idf = ln(1) = 0); each doc has its
    // own marker term repeated twice
    val docs = Seq(
      (0L, "common common alpha alpha filler"),
      (1L, "common beta beta filler common"),
      (2L, "common gamma gamma other common")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top === Map(0L -> "alpha", 1L -> "beta", 2L -> "gamma"))
  }

  test("ranking is deterministic: rounded-score ties break by term") {
    import spark.implicits._
    val docs = Seq((0L, "zz aa"), (1L, "mm")).toDF("doc_id", "text")
    // doc 0: aa and zz have identical (tf=1, df=1) → identical tfidf;
    // rank 1 must be the lexicographically smaller term
    val r = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 0L).orderBy(col("rank"))
      .collect().map(_.getString(1)).toSeq
    assert(r === Seq("aa", "zz"))
  }
}
