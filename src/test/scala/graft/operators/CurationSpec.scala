package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-by-stage oracle for the curation funnel (q186) on a fixture
  * engineered so each stage removes a KNOWN set of documents.
  */
class CurationSpec extends SparkSpec {

  test("funnel: each stage drops exactly the planted documents; counts monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val good = (0 until 8).map(i => (i.toLong, doc(60), "en", "sA"))
    val short = Seq((100L, doc(10), "en", "sA"))              // fails word count
    val numeric = Seq((101L, (1 to 60).map(_.toString).mkString(" "), "en", "sA")) // fails alpha
    val exactDup = Seq((102L, good.head._2, "en", "sB"))      // exact copy of doc 0
    // near-dup: doc 3's text plus a sentinel-fenced unique tail — most
    // tokens sit in foreign-owned spans, so the trim retention gate fails
    val nearDup = Seq((103L, good(3)._2 + " zzq " + doc(5), "en", "sB"))
    val docs = good ++ short ++ numeric ++ exactDup ++ nearDup
    val out = Curation.funnel(
        docs.toDF("doc_id", "text", "lang", "source"),
        minTokens = 50, maxTokens = 100000, minAlphaFrac = 0.8,
        spanL = 8, lmDropFrac = 0.10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // sA: 10 docs; short + numeric fail rules; the 8 good survive all
    // stages except the per-lang LM decile (which drops ≥ 0 of them)
    val (a0, a1, a2, a3, a4) = out("sA")
    assert((a0, a1, a2) === ((10L, 8L, 8L)))
    assert(a3 === 8L, "no sA doc is majority-covered by foreign spans")
    assert(a4 <= a3 && a4 >= a3 - 2, "decile gate drops at most ~10% +ties")
    // sB: exact dup dies at stage 2, near dup at the trim-retention gate
    val (b0, b1, b2, b3, _) = out("sB")
    assert((b0, b1) === ((2L, 2L)))
    assert(b2 === 1L, "exact copy of a lower id must not survive dedup")
    assert(b3 === 0L, "majority-foreign-owned doc must fail the retention gate")
    // funnel is monotone non-increasing for every source
    out.values.foreach { case (n0, n1, n2, n3, n4) =>
      assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4)
    }
  }
}
