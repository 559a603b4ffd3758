package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    // deterministic ragged sizes 1..97, plus an oversized outlier
    (0 until n).map(i => (i.toLong, if (i == 37) 1000L else 1L + (i * 31 % 97)))
      .toDF("doc_id", "n_tokens")
  }

  test("every document lands in exactly one bin, bins respect capacity") {
    val out = Packing.packSequences(docs(500), "doc_id", "n_tokens",
      capacity = 128, nShards = 4).cache()
    assert(out.count() === 500)
    assert(out.select("doc_id").distinct().count() === 500)
    val binLoads = out.groupBy(col("shard"), col("seq_id"))
      .agg(sum(col("n_tokens")).as("load"), count(lit(1)).as("m"))
    // a bin only exceeds capacity when it holds a single oversized doc
    val over = binLoads.filter(col("load") > 128 && col("m") > 1).count()
    assert(over === 0, "multi-doc bin over capacity")
    val single = binLoads.filter(col("load") > 128).count()
    assert(single === 1, "the one oversized doc sits alone in its bin")
  }

  test("seq_offset is the running token offset inside each bin") {
    val out = Packing.packSequences(docs(200), "doc_id", "n_tokens",
      capacity = 128, nShards = 4)
      .select("shard", "seq_id", "doc_id", "n_tokens", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._3).foreach { case (_, _, _, t, off) =>
        assert(off === acc); acc += t
      }
    }
  }

  test("next-fit is tight: a new bin starts only when the doc did not fit") {
    val out = Packing.packSequences(docs(300), "doc_id", "n_tokens",
      capacity = 128, nShards = 2)
      .select("shard", "seq_id", "doc_id", "n_tokens", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    out.sliding(2).foreach {
      case Array((sh1, s1, _, t1, o1), (sh2, s2, _, t2, _)) if sh1 == sh2 && s2 == s1 + 1 =>
        assert(o1 + t1 + t2 > 128, s"bin $s1 closed although the next doc fit")
      case _ =>
    }
  }

  test("result is invariant to input partitioning") {
    val base = Packing.packSequences(docs(400), "doc_id", "n_tokens",
      capacity = 200, nShards = 8).orderBy("doc_id").collect().toSeq
    val rep = Packing.packSequences(docs(400).repartition(13), "doc_id", "n_tokens",
      capacity = 200, nShards = 8).orderBy("doc_id").collect().toSeq
    assert(base === rep)
  }
}
