package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {

  test("bigramScore: hand-computed add-one bigram model on a tiny corpus") {
    import spark.implicits._
    // corpus: unigrams a=4 b=2 solo=1 (V=3); bigrams "a b"=2, "b a"=1, "a a"=1
    val df = Seq((0L, "a b a b"), (1L, "a a"), (2L, "solo")).toDF("doc_id", "text")
    val got = LanguageModel.bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    def micro(p: Double): Long = math.round(math.log(p) * 1e6)
    // doc 0: "a b"×2 at ln(3/(4+3)), "b a"×1 at ln(2/(2+3))
    val d0 = (2 * micro(3.0 / 7) + 1 * micro(2.0 / 5)).toDouble / (3 * 1000000L)
    // doc 1: "a a"×1 at ln(2/(4+3))
    val d1 = micro(2.0 / 7).toDouble / 1000000L
    assert(got(0L) === ((3L, d0)))
    assert(got(1L) === ((1L, d1)))
    // single-token doc has no bigrams and drops out
    assert(!got.contains(2L))
  }

  test("perplexityGate: drops each group's worst-decile scores, cleans its caches") {
    import spark.implicits._
    // ten docs per group; scores vary because rare bigrams score low.
    // dropFrac=0.10 over 10 docs → cutoff interpolates in the bottom
    // bracket → exactly the per-group argmin drops (no in-group ties:
    // each doc d gets a distinct mix of common/rare bigrams)
    val docs = (0 until 20).map { i =>
      val g = if (i < 10) "g1" else "g2"
      val rare = Seq.fill(i % 10)(s"rare${g}_$i").mkString(" ")
      (i.toLong, s"common common common $rare", g)
    }
    val df = docs.toDF("doc_id", "text", "lang")
    val kept = LanguageModel.perplexityGate(df, "doc_id", "text", "lang", 0.10)
      .collect().map(_.getLong(0)).toSet
    val scores = LanguageModel.bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for (g <- Seq(0, 10)) {
      val ids = (g until g + 10).map(_.toLong)
      val worst = ids.minBy(scores)
      assert(!kept.contains(worst), s"group at $g keeps its argmin")
      assert(ids.filterNot(_ == worst).forall(kept), s"group at $g drops only it")
    }
    // self-cleaning contract: no internal cache outlives the call
    assert(spark.sharedState.cacheManager.isEmpty,
      "perplexityGate must release its scored/binned caches")
  }

  test("perplexityBuckets: terciles order strictly (head ≥ middle ≥ tail per group), caches released") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val va = Vector("aa", "bb", "cc", "dd")
    val docs = (0 until 36).map { i =>
      val grp = if (i % 2 == 0) "g1" else "g2"
      // varying length and composition spreads the LM scores
      (i.toLong, Seq.fill(4 + rnd.nextInt(12))(va(rnd.nextInt(va.size))).mkString(" "), grp)
    }
    val out = LanguageModel.perplexityBuckets(
        docs.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang")
      .collect().map(r => (r.getString(1), r.getDouble(3), r.getString(4)))
    assert(out.nonEmpty)
    for (g <- Seq("g1", "g2")) {
      val by = out.filter(_._1 == g).groupBy(_._3)
      assert(by.keySet === Set("head", "middle", "tail"),
        s"group $g must populate all three buckets")
      assert(by("head").map(_._2).min >= by("middle").map(_._2).max,
        s"group $g: every head score >= every middle score")
      assert(by("middle").map(_._2).min >= by("tail").map(_._2).max,
        s"group $g: every middle score >= every tail score")
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "perplexityBuckets must release its scored/binned caches")
  }

  test("kneserNeyScore: hand-computed interpolated KN probabilities on a tiny corpus") {
    import spark.implicits._
    // bigrams: doc0 = {a b ×2, b a ×1}, doc1 = {b c ×1}
    // bc: (a b)=2, (b a)=1, (b c)=1; T=3
    // ctx: a→(cw1=2, n1fw=1), b→(cw1=2, n1fw=2)
    // cont: a→1, b→1, c→1
    // p(b|a) = (2−.75)/2 + (.75·1/2)·(1/3) = 0.75
    // p(a|b) = (1−.75)/2 + (.75·2/2)·(1/3) = 0.375 = p(c|b)
    val df = Seq((0L, "a b a b"), (1L, "b c"), (2L, "solo")).toDF("doc_id", "text")
    def micro(p: Double) = math.rint(math.log(p) * 1e6).toLong
    val exp0 = (2 * micro(0.75) + 1 * micro(0.375)).toDouble / (3L * 1000000L)
    val exp1 = micro(0.375).toDouble / 1000000L
    val got = LanguageModel.kneserNeyScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0L) === ((3L, exp0)))
    assert(got(1L) === ((1L, exp1)))
    assert(!got.contains(2L), "single-token docs carry no bigrams")
    // KN orders quality sensibly: the frequent-context bigram scores higher
    assert(got(0L)._2 > got(1L)._2)
    assert(spark.sharedState.cacheManager.isEmpty,
      "kneserNeyScore must release its bigram-table cache")
  }

  test("pairCounts kernel: multiplicity, ordering, single/empty input") {
    import spark.implicits._
    val df = Seq((0L, "x y x y x"), (1L, "one"), (2L, " ")).toDF("id", "text")
    val got = df.select(col("id"),
        graft.plans.Exprs.pairCounts(col("text")).as("pc"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, Int](1)).toMap
    assert(got(0L) === Map("x y" -> 2, "y x" -> 2))
    assert(got(1L) === Map.empty)
    assert(got(2L) === Map.empty)
  }
}
