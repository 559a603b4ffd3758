package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions
import graft.plans.Kernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unit-level oracles for the no-SQL-oracle dedup/similarity operators
  * (q34-q37): each approximate kernel is checked against an exact
  * brute-force computation on small fixtures.
  */
class DedupSpec extends SparkSpec {

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val fixture = Seq(
    base,
    base + " tonight",                                   // near-dup of 0
    "a completely different document about marine biodiversity observation networks",
    base.replace("quick", "slow"),                       // near-dup of 0
    "a completely different document about marine biodiversity observation systems", // near-dup of 2
    "short text")

  private def exactJaccard(a: String, b: String, k: Int): Double = {
    def shingles(s: String) = {
      val toks = s.toLowerCase.trim.split("\\s+").toSeq
      if (toks.length <= k) Set(toks.mkString(" "))
      else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    val (sa, sb) = (shingles(a), shingles(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  test("q36 oracle: ngramJaccardPairs equals brute-force exact Jaccard (both strategies)") {
    val df = docsDf(fixture)
    // t = 0.3 → count-inequality path; t = 0.6 → PPJoin prefix path
    Seq(0.3, 0.6).foreach { t =>
      val got = Dedup.ngramJaccardPairs(df, "text", "doc_id", shingleK = 3, minJaccard = t)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val expected = (for {
        i <- fixture.indices; j <- fixture.indices if i < j
        jac = exactJaccard(fixture(i), fixture(j), 3) if jac >= t
      } yield ((i.toLong, j.toLong), jac)).toMap
      assert(got.keySet === expected.keySet, s"threshold $t")
      got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9, s"$k at $t") }
    }
  }

  test("winnowingPairs matches a sequential brute-force winnower; planted span detected") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val planted = "p1 p2 p3 p4 p5 p6 p7 p8 p9"     // 9 tokens ≥ k+w-1 = 8
    val docs = (0 until 12).map(i => (i.toLong,
      if (i % 5 == 0) s"${doc(20)} $planted ${doc(20)}" else doc(45)))
    val df = docs.toDF("doc_id", "text")

    val (k, w) = (5, 4)
    def fps(text: String): Set[Long] = {
      val tk = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (tk.length < k + w - 1) Set.empty
      else {
        val hs = tk.sliding(k).map(_.foldLeft(0L)((a, x) =>
          (a * 31 + (x.length.toLong * 7 + x.head.toInt)) % 1000000007L)).toVector
        hs.sliding(w).map(_.min).toSet
      }
    }
    val expected = (for {
      i <- docs.indices; j <- docs.indices if i < j
      shared = (fps(docs(i)._2) & fps(docs(j)._2)).size if shared >= 1
    } yield ((i.toLong, j.toLong), shared.toLong)).toMap

    val got = Dedup.winnowingPairs(df, "text", "doc_id", k, w, minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === expected)
    // the k+w-1 guarantee: docs sharing the planted 9-token run share
    // ≥ 1 fingerprint (≥ 2 is NOT guaranteed — adjacent windows often
    // select the same minimum, that's the whole point of winnowing)
    assert(got.contains((0L, 5L)) && got.contains((0L, 10L)) && got.contains((5L, 10L)))
  }

  test("dupSpanStats matches a sequential brute-force span merger; planted run measured exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll", "mm", "nn")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val planted = (1 to 12).map(i => s"p$i").mkString(" ") // 12-token run
    val docs = Seq(
      (0L, s"${doc(15)} $planted ${doc(15)}"),  // planted once
      (1L, s"$planted ${doc(25)}"),             // planted at the start
      (2L, doc(40)),                            // random
      (3L, doc(40)),                            // random
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8"), // WITHIN-doc repeat only
      (5L, "tiny doc"))                         // shorter than L
    val df = docs.toDF("doc_id", "text")
    val L = 8

    // brute force: every stride-1 L-token-gram, hot = in >= 2 distinct
    // docs, per-doc sorted positions, island merge with gap > L split
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val occ = toks.toSeq.flatMap { case (id, tk) =>
      if (tk.length >= L)
        tk.sliding(L).zipWithIndex.map { case (g, p) => (g.mkString(" "), id, p) }.toSeq
      else Seq.empty }
    val hot = occ.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = docs.map { case (id, _) =>
      val ps = occ.filter(o => o._2 == id && hot(o._1)).map(_._3).sorted
      val nTok = toks(id).length.toLong
      if (ps.isEmpty) id -> ((nTok, 0L, 0L, 0L, 0.0))
      else {
        val diffs = ps.zip(ps.tail).map { case (a, b) => b - a }
        val spans = 1L + diffs.count(_ > L)
        val cov = L.toLong + diffs.map(d => math.min(d, L).toLong).sum
        id -> ((nTok, ps.length.toLong, spans, cov,
          math.rint(cov.toDouble / nTok * 1e6) / 1e6))
      }
    }.toMap

    val got = Dedup.dupSpanStats(df, "text", "doc_id", L = L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === expected)
    // the planted 12-token run: exactly one span of 12 duplicated
    // tokens in docs 0 and 1 (5 grams of length 8 starting there)
    assert(got(0L)._3 === 1L && got(0L)._4 === 12L)
    assert(got(1L)._3 === 1L && got(1L)._4 === 12L)
    // within-doc-only repetition is NOT cross-document duplication
    assert(got(4L)._4 === 0L)
    // sub-L docs and random docs report zero with their true n_tokens
    assert(got(5L) === ((2L, 0L, 0L, 0L, 0.0)))
  }

  test("intraDupSpanStats: within-doc repeats match a sequential scanner") {
    import org.apache.spark.unsafe.types.UTF8String
    val L = 4
    val cases = Seq(
      "a b c d a b c d a b c d",        // 3x repeat of a 4-token block
      "x1 x2 x3 x4 y1 y2 x1 x2 x3 x4",  // one repeated 4-gram at the end
      "all unique tokens here none repeat at this length",
      "t t t t t t t t",                // degenerate: every gram identical
      "a b c",                          // shorter than L
      "")
    def brute(t: String): Seq[Long] = {
      val tk = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (tk.length < L) return Seq(tk.length.toLong, 0L, 0L, 0L)
      val gs = tk.sliding(L).map(_.mkString(" ")).toVector
      val ps = gs.indices.filter(i => gs.take(i).contains(gs(i)))
      if (ps.isEmpty) Seq(tk.length.toLong, 0L, 0L, 0L)
      else {
        val diffs = ps.zip(ps.tail).map { case (a, b) => b - a }
        Seq(tk.length.toLong, ps.length.toLong,
          1L + diffs.count(_ > L),
          L.toLong + diffs.map(d => math.min(d, L).toLong).sum)
      }
    }
    cases.foreach { t =>
      val got = graft.plans.Kernels.intraDupSpanStats(
        UTF8String.fromString(t), L).toLongArray().toSeq
      assert(got === brute(t), s"text: '$t'")
    }
    // the 3x block repeat: every gram from position 4 on re-occurs
    // (the cycle makes all 5 later grams repeats), one fused span
    // covering the trailing 8 tokens
    assert(graft.plans.Kernels.intraDupSpanStats(
      UTF8String.fromString(cases.head), L).toLongArray().toSeq ===
      Seq(12L, 5L, 1L, 8L))
  }

  test("dupSpanTrim keeps exactly one copy (lowest id owns); brute-force parity") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll", "mm", "nn")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val planted = (1 to 10).map(i => s"p$i").mkString(" ")
    val pre2 = doc(12)
    // sentinels fence the planted run so boundary-crossing grams are
    // per-doc unique (a 1-in-14 boundary token coincidence would
    // otherwise legitimately extend the duplicated span)
    val docs = Seq(
      (0L, s"${doc(12)} s0a $planted s0b ${doc(12)}"), // owner: keeps everything
      (1L, s"$planted s1 ${doc(20)}"),         // loses the planted run
      (2L, s"$pre2 s2 $planted"),              // loses the planted run
      (3L, doc(30)),                           // untouched random doc
      (4L, "  spaced   out\ttokens  "))        // whitespace-normalized only
    val df = docs.toDF("doc_id", "text")
    val L = 8

    // brute force with the same ownership policy
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val occ = toks.toSeq.flatMap { case (id, tk) =>
      if (tk.length >= L)
        tk.sliding(L).zipWithIndex.map { case (g, p) => (g.mkString(" "), id, p) }.toSeq
      else Seq.empty }
    val byGram = occ.groupBy(_._1)
    val hotOwner = byGram.collect { case (g, os) if os.map(_._2).distinct.size >= 2 =>
      g -> os.map(_._2).min }
    val expected = docs.map { case (id, _) =>
      val tk = toks(id)
      val removed = occ.filter(o => o._2 == id &&
          hotOwner.get(o._1).exists(_ < id))
        .flatMap(o => o._3 until (o._3 + L)).toSet
      val kept = tk.indices.filterNot(removed).map(tk)
      id -> ((tk.length.toLong, removed.size.toLong, kept.mkString(" ")))
    }.toMap

    val got = Dedup.dupSpanTrim(df, "text", "doc_id", L = L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === expected)
    // ownership: doc 0 (lowest id) keeps its copy intact
    assert(got(0L)._2 === 0L)
    assert(got(0L)._3.contains(planted))
    // docs 1 and 2 lose exactly the 10 planted tokens
    assert(got(1L)._2 === 10L && !got(1L)._3.contains("p1"))
    assert(got(2L)._2 === 10L && !got(2L)._3.contains("p1"))
    // whitespace-only doc is token-normalized, nothing removed
    assert(got(4L) === ((3L, 0L, "spaced out tokens")))
  }

  test("dupSpanTrim: Unicode whitespace — positions and rebuild share one tokenizer") {
    import spark.implicits._
    val planted = (1 to 10).map(i => s"p$i").mkString(" ")
    // U+3000 ideographic space is whitespace to Character.isWhitespace
    // but NOT to the engine class (Kernels.isRegexWs = DuckDB RE2 \s,
    // r17 unification): it stays INSIDE a token, identically in the
    // hash stream and the rebuild stream — one shared scan makes a
    // position desync impossible, and the oracles'
    // string_split_regex('\s+') tokenizes the same way
    val docs = Seq(
      (0L, s"alpha　beta $planted gamma"),
      (1L, s"x1 x2　x3 $planted y1 y2"))
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.dupSpanTrim(df, "text", "doc_id", L = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "alpha　beta" and "x1 x2　x3" are ONE token each now
    assert(got(0L)._1 === 12L && got(1L)._1 === 13L)
    // doc 0 (lowest id) owns the planted run; doc 1 loses exactly the
    // 10 planted tokens and keeps every x/y token intact
    assert(got(0L)._2 === 0L)
    assert(got(0L)._3 === s"alpha　beta $planted gamma")
    assert(got(1L)._2 === 10L)
    // the raw U+2028 between x1/x2 and the U+3000 between x2/x3 both
    // stay inside one token — nothing is re-spaced
    assert(got(1L)._3 === "x1 x2　x3 y1 y2")
    // n_tokens agrees with dupSpanStats — same kernel on both sides
    val st = Dedup.dupSpanStats(df, "text", "doc_id", L = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st === got.view.mapValues(_._1).toMap)
  }

  test("dupSpanStats/dupSpanTrim: maxGramDf sheds over-cap boilerplate grams") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val rare = (1 to 8).map(i => s"r$i").mkString(" ")
    // the boilerplate gram occurs 4 times corpus-wide, the rare one 2
    val docs = Seq(
      (0L, s"$boiler u01 u02 $rare"),
      (1L, s"$boiler u11 u12 $rare"),
      (2L, s"$boiler u21 u22"),
      (3L, s"$boiler u31 u32"))
    val df = docs.toDF("doc_id", "text")
    // cap 3 < 4 occurrences: the boilerplate gram is shed from the hot
    // set, the rare gram (2 occurrences) still counts
    val st = Dedup.dupSpanStats(df, "text", "doc_id", L = 8, maxGramDf = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(st(0L) === ((1L, 1L, 8L)) && st(1L) === ((1L, 1L, 8L)))
    assert(st(2L) === ((0L, 0L, 0L)) && st(3L) === ((0L, 0L, 0L)))
    // uncapped: the boilerplate gram is hot too — two spans in doc 0
    val un = Dedup.dupSpanStats(df, "text", "doc_id", L = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(un(0L) === 2L)
    // trim under the cap: doc 1 loses only the rare run; docs 2/3
    // keep their boilerplate copies (the gram is shed, not owned)
    val tr = Dedup.dupSpanTrim(df, "text", "doc_id", L = 8, maxGramDf = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(tr(0L)._1 === 0L)
    assert(tr(1L) === ((8L, s"$boiler u11 u12")))
    assert(tr(2L)._1 === 0L && tr(3L)._1 === 0L)
  }

  test("sourceOverlapMatrix: hand-computed shared/containment, disjoint sources absent") {
    import spark.implicits._
    val df = Seq(
      ("A", "a b c d"),  // shingles {a b c, b c d}
      ("B", "a b c x"),  // shingles {a b c, b c x}
      ("C", "z z z")     // shingle  {z z z} — disjoint from A and B
    ).toDF("source", "text")
    val got = Dedup.sourceOverlapMatrix(df, "source", "text", shingleK = 3)
      .collect()
    assert(got.length === 1, "only the (A,B) pair shares a shingle")
    val r = got.head
    assert((r.getString(0), r.getString(1)) === (("A", "B")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 2L, 2L)))
    assert(r.getDouble(5) === 0.5)              // containment: 1 / min(2,2)
    assert(math.abs(r.getDouble(6) - 0.333333) < 1e-9) // jaccard: 1/3 @ 6dp
  }

  test("q34 oracle: minhash est_jaccard tracks exact jaccard within ±0.18 (64 perms)") {
    val df = docsDf(fixture)
    val pairs = Dedup.minhashCandidatePairs(df, "text", "doc_id",
      shingleK = 3, numPerms = 64, bands = 16, threshold = 0.2).collect()
    assert(pairs.nonEmpty, "near-dup fixtures must produce candidates")
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val est = r.getAs[Double]("est_jaccard")
      val exact = exactJaccard(fixture(a.toInt), fixture(b.toInt), 3)
      assert(math.abs(est - exact) < 0.18, s"pair ($a,$b): est $est vs exact $exact")
    }
    // the high-similarity pair (0, 1) must be found
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 1L))
  }

  test("q35 oracle: simhash banding finds ALL pairs within the Hamming bound") {
    // many shared-token docs: brute-force all-pairs hamming, then check
    // the banded operator returns exactly the pairs ≤ 3
    val texts = (0 until 24).map(i => base + " suffix" + (i % 4))
    val sigs = texts.map(t => Kernels.simhash(UTF8String.fromString(t)))
    val expected = (for {
      i <- texts.indices; j <- texts.indices if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 3
    } yield (i.toLong, j.toLong)).toSet
    val got = Dedup.simhashPairs(docsDf(texts), "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got === expected, "block-combination banding must have perfect recall at h<=3")
  }

  test("hammingPairs candidate-pair guard fails fast on giant-group corpora") {
    import spark.implicits._
    // 40 identical signatures = one giant duplicate group: every band
    // bucket holds all 40 → Σ C(40,2) per combo, a quadratic pair list
    val sig = (0L until 40L).map(i => (i, 0x5a5a5a5aL)).toDF("id", "sh")
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingPairs(sig, maxHamming = 3, maxCandidatePairs = 100L)
    }
    assert(e.getMessage.contains("hammingCanonical"),
      "the guard must point at the linear-output canonical twins")
    assert(e.getMessage.contains("maxCandidatePairs"))
    // raising the cap (or the default on a small corpus) enumerates fine
    val ok = Dedup.hammingPairs(sig, maxHamming = 3).collect()
    assert(ok.length === 40 * 39 / 2)
    // Long.MaxValue skips the gate's counting pass entirely
    val skip = Dedup.hammingPairs(sig, maxHamming = 3,
      maxCandidatePairs = Long.MaxValue).collect()
    assert(skip.length === 40 * 39 / 2)
  }

  test("minhash/ngram pair generators fail fast on giant-group corpora") {
    import spark.implicits._
    // 40 identical texts = one giant duplicate group: every band
    // bucket and every shingle posting holds all 40
    val docs = (0L until 40L).map(i => (i, base)).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.minhashCandidatePairs(docs, "text", "doc_id",
        maxCandidatePairs = 100L)
    }
    assert(e1.getMessage.contains("minhashCanonical"),
      "the guard must point at the linear-output canonical twin")
    assert(e1.getMessage.contains("maxCandidatePairs"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", minJaccard = 0.2,
        maxCandidatePairs = 100L)
    }
    assert(e2.getMessage.contains("minhashCanonical"))
    // the default cap (and Long.MaxValue, which skips the counting
    // pass) both enumerate the small corpus fine
    assert(Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .count() === 40L * 39 / 2)
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id", minJaccard = 0.2,
      maxCandidatePairs = Long.MaxValue).count() === 40L * 39 / 2)
  }

  test("ngram gate's broadcast and shuffled prune branches emit identical pairs") {
    import spark.implicits._
    // varied texts so the eligible-shingle set is non-trivial
    val docs = (0L until 30L).map { i =>
      (i, if (i % 3 == 0) base else s"$base extra${i % 5} tail${i % 7}")
    }.toDF("doc_id", "text")
    def pairs(mbs: Long) =
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", minJaccard = 0.2,
          maxBroadcastShingles = mbs)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBroadcast = pairs(1000000L) // eligible set fits → LocalRelation prune
    val viaShuffle = pairs(0L)         // forced agg-gate + shuffled semi-join
    assert(viaBroadcast === viaShuffle)
    assert(viaBroadcast.nonEmpty)
  }

  test("q37 oracle: embedding LSH finds planted near-duplicates") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val bases = (0 until 6).map(_ => unit(Array.fill(32)(rng.nextGaussian().toFloat)))
    // 3 vectors per base: the base + two tiny perturbations (cosine ≈ 0.999)
    val vecs = bases.zipWithIndex.flatMap { case (b, bi) =>
      Seq(b) ++ (1 to 2).map(_ => unit(b.map(x => x + 0.01f * rng.nextGaussian().toFloat)))
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupPairs(df, "embedding", "vec_id", minCosine = 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // brute force ground truth
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val truth = (for {
      i <- vecs.indices; j <- vecs.indices if i < j
      if cos(vecs(i), vecs(j)) >= 0.99
    } yield (i.toLong, j.toLong)).toSet
    assert(truth.nonEmpty)
    // hyperplane LSH at 64 bits / 4 bands: near-identical vectors
    // collide with prob ≈ 1 - (1 - 0.999^16)^4 ≈ 1; allow one miss
    assert((truth -- got).size <= truth.size / 10,
      s"recall too low: found ${got.size} of ${truth.size}")
    assert(got.subsetOf(truth), "cosine verify must remove false candidates")
  }

  test("lshTopK recall vs exact cosineTopK on clustered vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val bases = (0 until 4).map(_ => unit(Array.fill(32)(rng.nextGaussian().toFloat)))
    val corpus = bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 10).map(k => unit(b.map(x => x + 0.02f * rng.nextGaussian().toFloat)))
    }
    val corpusDf = corpus.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val queries = corpusDf.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.cosineTopK(corpusDf, queries, "vec_id", "embedding", "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(corpusDf, queries, "vec_id", "embedding", "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"lshTopK recall $recall below 0.8 on tightly clustered data")
  }

  test("minhash kernel: identical texts → identical signatures; est tracks containment") {
    val df = docsDf(Seq(base, base, base + " tonight"))
    val sigs = df.select(col("doc_id"),
      graft.plans.Exprs.minhashSig(col("text"), 3, 64).as("sig")).collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) === sigs(1L), "same text must hash to the same signature")
    val matches = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    val est = matches.toDouble / 64
    val exact = exactJaccard(base, base + " tonight", 3)
    assert(math.abs(est - exact) < 0.2, s"est $est vs exact $exact")
  }

  test("editDistancePairs: LSH candidates verified by exact Levenshtein") {
    // fixture pairs (0,1) and (0,3) differ by small token edits; the
    // brute-force Levenshtein on lowercased text is the ground truth
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val maxDist = 8
    val got = Dedup.editDistancePairs(docsDf(fixture), "text", "doc_id",
        maxDist = maxDist, candThreshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every reported pair must carry the exact distance and be <= max
    got.foreach { case ((a, b), d) =>
      assert(d === lev(fixture(a.toInt).toLowerCase, fixture(b.toInt).toLowerCase).toLong)
      assert(d <= maxDist)
    }
    // the two single-token edits of doc 0 must be found
    assert(got.contains((0L, 1L)), "missed planted near-dup (0,1)")
    assert(got.contains((0L, 3L)), "missed planted near-dup (0,3)")
    // the disjoint doc must not pair with anything
    assert(!got.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("editDistancePairs unit: bytes = DuckDB byte edits, codepoints = Spark native") {
    // the pair differs ONLY by é→e: 1 code-point substitution, but 2
    // byte edits ('é' is 2 UTF-8 bytes — pinned on DuckDB 1.0.0:
    // levenshtein('é','e') = 2). unit="bytes" (default) keeps oracle
    // parity; unit="codepoints" is the text-quality consumer's unit.
    val a = "the quick brown fox jumps over the lazy dog near the café door tonight"
    val b = "the quick brown fox jumps over the lazy dog near the cafe door tonight"
    val df = docsDf(Seq(a, b))
    def dists(unit: String) = Dedup.editDistancePairs(df, "text", "doc_id",
        maxDist = 8, candThreshold = 0.2, unit = unit)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dists("bytes")((0L, 1L)) === 2L, "byte unit must count UTF-8 bytes")
    assert(dists("codepoints")((0L, 1L)) === 1L, "codepoint unit must count chars")
    val e = intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df, "text", "doc_id", maxDist = 8, unit = "chars"))
    assert(e.getMessage.contains("codepoints"))
  }

  test("exactDupsAgainst flags only incoming docs whose content exists in the corpus") {
    import spark.implicits._
    val corpus = docsDf(Seq(base, "corpus only text here"))
    val incoming = Seq(
      (100L, base),                     // dup of corpus doc 0
      (101L, "brand new content"),      // fresh
      (102L, base))                     // dup again (both flagged)
      .toDF("doc_id", "text")
    val flagged = Dedup.exactDupsAgainst(corpus, incoming, "text", "doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged === Seq(100L, 102L))
  }

  test("shingleDupRate: exact copies score 1, fresh text 0, empty docs 0") {
    val df = docsDf(Seq(base, base, "completely different words entirely novel here", ""))
    val rates = Dedup.shingleDupRate(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rates(0L) === 1.0 && rates(1L) === 1.0)
    assert(rates(2L) === 0.0)
    assert(rates(3L) === 0.0)
  }

  test("contaminationRate: benchmark copies score 1, disjoint docs 0, partial in between") {
    import spark.implicits._
    val bench = docsDf(Seq(base))
    val corpus = Seq(
      (10L, base),                                        // full overlap
      (11L, "totally unrelated fresh content with new words"), // none
      (12L, base + " extra trailing words here"))         // partial
      .toDF("doc_id", "text")
    val rates = Dedup.contaminationRate(corpus, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rates(10L) === 1.0)
    assert(rates(11L) === 0.0)
    assert(rates(12L) > 0.5 && rates(12L) < 1.0)
  }

  test("minhashCanonical: star components refine pair components; " +
      "signature-tight groups collapse identically") {
    import spark.implicits._
    // 5 exact-duplicate groups of 10 (identical text → identical
    // signatures → est 1.0 on every star edge) + 10 unique docs; ids
    // interleaved across groups so bucket minima are non-trivial
    val templates = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten eleven twelve",
      "spark catalyst tungsten codegen shuffle exchange partition broadcast join agg",
      "marine biodiversity observation network survey station sampling protocol depth record",
      "training corpus curation dedup quality language model token shard mixture")
    val uniques = (0 until 10).map(i =>
      s"unique document number $i with its own words w${i}a w${i}b w${i}c w${i}d w${i}e")
    val docs = (0 until 60).map { id =>
      (id.toLong, if (id < 50) templates(id % 5) else uniques(id - 50))
    }.toDF("doc_id", "text").repartition(5)
    val lab = Dedup.minhashCanonical(docs, "text", "doc_id",
        shingleK = 3, numPerms = 64, bands = 16, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // one row per doc; canonical obeys the min-id rule
    assert(lab.size === 60)
    lab.foreach { case (id, (canon, _)) => assert(canon <= id) }
    // n_members consistent within components and summing to the corpus
    val byCanon = lab.values.groupBy(_._1)
    byCanon.foreach { case (_, ms) =>
      assert(ms.map(_._2).toSet.size === 1)
      assert(ms.head._2 === ms.size.toLong)
    }
    assert(byCanon.values.map(_.size).sum === 60)
    // identity with the quadratic path on this signature-tight fixture:
    // pairs → CC → labels (singletons coalesce to themselves)
    val pairCC = Dedup.connectedComponents(
        Dedup.minhashCandidatePairs(docs, "text", "doc_id",
          shingleK = 3, numPerms = 64, bands = 16, threshold = 0.5)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairCanon = (0 until 60).map(id =>
      id.toLong -> pairCC.getOrElse(id.toLong, id.toLong)).toMap
    assert(lab.view.mapValues(_._1).toMap === pairCanon,
      "signature-tight groups must collapse identically to pairs+CC")
    // and the expected shape: 5 groups anchored at ids 0..4, 10 singletons
    assert(byCanon.keySet === ((0L until 5L) ++ (50L until 60L)).toSet)
  }

  test("connectedComponents: chains, triangles, and isolated pairs get min-id labels") {
    import spark.implicits._
    // components: {1,2,3,4} chain, {10,11,12} triangle, {20,21} pair
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents matches a driver union-find on a random graph") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val edges = (0 until 300).map(_ => (rng.nextInt(120).toLong, rng.nextInt(120).toLong))
    // driver-side union-find ground truth
    val parent = Array.tabulate(120)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> {
        // min vertex in the component = root after path-min union
        var r = v.toInt; while (parent(r) != r) r = parent(r); r.toLong
      }).toMap
    val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // the DISTRIBUTED min-label path (forced past the union-find
    // short-circuit) must produce identical labels
    val distributed = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b",
        driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed === expected)
  }

  test("lineDedup matches a sequential brute force on random multi-line docs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val lineAlphabet = Vector("aa", "bb", "cc", "dd", "ee", "")
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(rng.nextInt(6) + 1)(
        lineAlphabet(rng.nextInt(lineAlphabet.size))).mkString("\n"))
    }
    // sequential ground truth over (doc_id, pos) order
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.map { case (id, text) =>
      val kept = text.split(java.util.regex.Pattern.quote("\n"), -1)
        .filter(l => seen.add(l))
      (id, kept.length.toLong, kept.mkString("\n"))
    }.toSet
    val got = Dedup.lineDedup(docs.toDF("doc_id", "text").repartition(7),
        "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === expected)
  }

  test("boilerplateLines matches a brute force; removal is per-group and everywhere") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val lineAlphabet = Vector("ftr", "aa", "bb", "cc", "dd", "ee", "")
    // two groups; "hdr" planted in most docs of g0 only — it must be
    // removed from every g0 doc yet SURVIVE in g1 (per-group scoping)
    val docs = (0L until 60L).map { i =>
      val g = if (i < 30) "g0" else "g1"
      val body = Seq.fill(rng.nextInt(5) + 1)(
        lineAlphabet(rng.nextInt(lineAlphabet.size)))
      val lines = if (g == "g0" && i % 3 != 0) "hdr" +: body else body
      (i, g, lines.mkString("\n"))
    }
    val minDf = 3
    // brute force: per (group, line) distinct-doc counts, then filter
    val df = docs.flatMap { case (id, g, t) =>
      t.split(java.util.regex.Pattern.quote("\n"), -1).distinct.map(l => (g, l, id))
    }.groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).distinct.size).toMap
    val expected = docs.map { case (id, g, t) =>
      val all = t.split(java.util.regex.Pattern.quote("\n"), -1)
      val kept = all.filter(l => df((g, l)) < minDf)
      (id, all.length.toLong, (all.length - kept.length).toLong, kept.mkString("\n"))
    }.toSet
    val got = Dedup.boilerplateLines(
        docs.toDF("doc_id", "source", "text").repartition(7),
        "text", "doc_id", "source", minDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === expected)
    // the planted header really was hot in g0 and cold in g1
    assert(df(("g0", "hdr")) >= minDf)
    assert(!df.contains(("g1", "hdr")) || df(("g1", "hdr")) < minDf)
    // scoping assertion: no surviving g0 text contains the header line
    got.filter(x => docs(x._1.toInt)._2 == "g0").foreach { case (_, _, _, t) =>
      assert(!t.split("\n").contains("hdr"))
    }
    // the COUNTED broadcast gate: the default limit chooses broadcast
    // on this tiny hot set; limit 0 forces the shuffled fallback — and
    // BOTH branches produce the identical result set
    val (bPlan, bUsed) = Dedup.boilerplateLinesPlan(
      docs.toDF("doc_id", "source", "text").repartition(7),
      "text", "doc_id", "source", minDf, "\n", broadcastHotLimit = 1L << 20)
    assert(bUsed, "tiny hot set must take the broadcast branch")
    val (sPlan, sUsed) = Dedup.boilerplateLinesPlan(
      docs.toDF("doc_id", "source", "text").repartition(7),
      "text", "doc_id", "source", minDf, "\n", broadcastHotLimit = 0L)
    assert(!sUsed, "limit 0 must force the shuffled fallback")
    val asSet = (f: org.apache.spark.sql.DataFrame) =>
      f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(asSet(bPlan) === expected)
    assert(asSet(sPlan) === expected)
  }

  test("selectCanonical picks the argmax-score member per cluster (random graph)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val edges = (0 until 150).map(_ => (rng.nextInt(80).toLong, rng.nextInt(80).toLong))
    // deterministic scores with deliberate ties: score = id % 7
    val attrs = (0L until 80L).map(i => (i, i % 7)).toDF("id", "score")
    // driver ground truth: union-find → per-component argmax
    val parent = Array.tabulate(80)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(v => find(v.toInt).toLong)
    val expected = members.map { case (cluster, vs) =>
      // highest score, ties to the LOWEST id
      val canonical = vs.minBy(v => (-(v % 7), v))
      (cluster, canonical, vs.size.toLong, vs.map(_ % 7).max)
    }.toSet
    val got = Dedup.selectCanonical(edges.toDF("a", "b"), "a", "b",
        attrs, "id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("connectedComponents on an empty edge list is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").count() === 0L)
  }

  test("lineDedup keeps only global first occurrences and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta\ncommon line\ngamma"),
      (2L, "common line\ndelta"),           // loses line 0 to doc 1
      (3L, "common line"),                  // loses its ONLY line
      (4L, "alpha beta\nalpha beta")        // intra-doc dup: keeps first only
    ).toDF("doc_id", "text")
    val byId = Dedup.lineDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byId(1L) === ((3L, "alpha beta\ncommon line\ngamma")))
    assert(byId(2L) === ((1L, "delta")))
    assert(byId(3L) === ((0L, "")))
    assert(byId(4L) === ((0L, "")), "both lines lost to doc 1's first line")
  }

  test("substringSpans reconstructs a planted verbatim span exactly") {
    import spark.implicits._
    val spanToks = (0 until 20).map(i => s"s$i").mkString(" ")   // 20 shared tokens
    val shortToks = (0 until 10).map(i => s"u$i").mkString(" ")  // 10 shared: below min
    val docs = Seq(
      (1L, (0 until 5).map(i => s"a$i").mkString(" ") + " " + spanToks +
        " " + (0 until 5).map(i => s"z$i").mkString(" ")),
      (2L, "x0 x1 x2 " + spanToks + " y0"),
      (3L, shortToks + " p0 p1 p2 p3 p4 p5 p6 p7"),
      (4L, "q0 q1 " + shortToks)
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, "text", "doc_id",
        shingleK = 8, minSpanTokens = 16, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
          r.getAs[Number](4).longValue)).toMap
    // the 20-token span: one maximal run, length 20, starting at doc 1
    // token position 6 (1-based; after 5 prefix tokens)
    assert(out.keySet === Set((1L, 2L)))
    assert(out((1L, 2L)) === ((1L, 20L, 6L)))
  }

  test("substringSpans maxMatchRows gate: repeated-token docs refuse with an exact estimate") {
    import spark.implicits._
    // two documents of ONE repeated token: every 8-gram in each doc is
    // the same hash, so the self-join would emit occ_a*occ_b rows —
    // the quadratic-in-length axis dfCap cannot see (distinct docs per
    // shingle is just 2). occ = 2000-8+1 = 1993 each; cross-doc match
    // rows = (tot^2 - sum occ^2)/2 = 1993^2 = 3,972,049.
    val rep = Seq.fill(2000)("tok").mkString(" ")
    val docs = Seq((1L, rep), (2L, rep), (3L, "a b c d e f g h i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dedup.substringSpans(docs, "text", "doc_id", maxMatchRows = 1000000L))
    assert(e.getMessage.contains("3972049 match rows"))
    assert(e.getMessage.contains("maxMatchRows=1000000"))
    // Long.MaxValue disables the gate; below-bound corpora are
    // unchanged by the gate's two-level eligible rewrite
    val spanToks = (0 until 20).map(i => s"s$i").mkString(" ")
    val normal = Seq((1L, "p0 p1 " + spanToks), (2L, spanToks + " q0")).toDF("doc_id", "text")
    val a = Dedup.substringSpans(normal, "text", "doc_id").collect().toSeq
    val b = Dedup.substringSpans(normal, "text", "doc_id",
      maxMatchRows = Long.MaxValue).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("substringSpans gate estimate cannot wrap 64-bit (r19 advisor: tot > ~3.04e9)") {
    import spark.implicits._
    // synthetic per-hash stats frame: one hash shared by two docs with
    // 3.5e9 occurrences EACH. The true pair volume occ_a*occ_b =
    // 1.225e19 exceeds Long.MaxValue outright — the old Long `div 2`
    // path (tot*tot wrapping mod 2^64, then the wrapped `div 2`)
    // produced 3.02e18, a 4x UNDERSTATEMENT, so the gate ADMITTED
    // exactly the degenerate repeated-token regime it exists to refuse.
    val occ = BigInt(3500000000L)
    val tot = occ * 2
    val s2 = occ * occ * 2
    val hstats = Seq((1L, 2L, BigDecimal(tot), BigDecimal(s2)))
      .toDF("h", "_nd", "_tot", "_s2")
      .select(col("h"), col("_nd"),
        col("_tot").cast("decimal(38,0)").as("_tot"),
        col("_s2").cast("decimal(38,0)").as("_s2"))
    val est = Dedup.matchRowsEstimate(hstats)
    assert(est === occ * occ, "exact (tot^2 - sum occ^2)/2 = occ_a*occ_b")
    assert(est > BigInt(Long.MaxValue),
      "the true estimate is not even Long-representable here")
    // replay the pre-fix arithmetic: every step truncated to 64 bits
    val longPath = ((tot * tot).toLong - s2.toLong) / 2L
    assert(BigInt(longPath) < est, "the old path understated (wrap)")
    // and the empty frame folds to zero, not null
    assert(Dedup.matchRowsEstimate(hstats.filter(col("h") < 0L)) === BigInt(0))
  }

  test("substringSpans residue-sharded mode: sharded == unsharded, exact union (r19 verdict #4)") {
    import spark.implicits._
    // the 1993^2-refusal fixture: the default gate refuses it at
    // maxMatchRows=1e6, but 8 shards bound each shard at ~496k rows —
    // ADMITTED, and the union must equal the gate-off unsharded result.
    // NB sharding is on (pair, OFFSET): this fixture's volume is ONE
    // degenerate pair, which pair-keyed sharding cannot split (measured
    // on the fabricated harness corpus — the whole pair landed in one
    // shard); its ~3985 distinct offsets split ~evenly instead
    val rep = Seq.fill(2000)("tok").mkString(" ")
    val spanToks = (0 until 20).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, rep), (2L, rep),
      (3L, "p0 p1 " + spanToks), (4L, spanToks + " q0")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.substringSpans(docs, "text", "doc_id", maxMatchRows = 1000000L))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
          r.getAs[Number](4).longValue)
    val sharded = Dedup.substringSpans(docs, "text", "doc_id",
      maxMatchRows = 1000000L, nShards = 8).collect().map(key).toMap
    val full = Dedup.substringSpans(docs, "text", "doc_id",
      maxMatchRows = Long.MaxValue).collect().map(key).toMap
    assert(sharded === full)
    assert(sharded.contains((1L, 2L)) && sharded.contains((3L, 4L)),
      "both the degenerate pair and the planted span survive the shard union")
  }

  test("dupSpanStats/dupSpanTrim maxDocChars gate: a giant document refuses, books pass") {
    import spark.implicits._
    // a fabricated multi-MB document trips an explicit 1M bound with
    // the in-row-state guidance; the same doc passes the 20M default
    // (a 3MB book is a legitimate training document)
    val big = ("lorem ipsum dolor sit amet " * 120000).trim // ~3.1 MB
    val docs = Seq((1L, big), (2L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dedup.dupSpanStats(docs, "text", "doc_id", maxDocChars = 1000000L))
    assert(e.getMessage.contains("maxDocChars=1000000"))
    assert(e.getMessage.contains("dupSpanStats"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.dupSpanTrim(docs, "text", "doc_id", maxDocChars = 1000000L))
    assert(e2.getMessage.contains("dupSpanTrim"))
    // the default admits it (and the operator completes on a 3MB doc)
    assert(Dedup.dupSpanStats(docs, "text", "doc_id").count() === 2L)
  }

  test("benchmarkContainment: a planted verbatim eval item is flagged at ~1.0") {
    import spark.implicits._
    val evalItem = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (100L, s"prefix words here $evalItem and a long suffix follows"), // full leak
      (101L, "the quick brown fox appears briefly"),                    // partial, < 1/2
      (102L, "completely unrelated content with many different tokens")
    ).toDF("doc_id", "text")
    val bench = Seq((1L, evalItem)).toDF("doc_id", "text")
    val out = Dedup.benchmarkContainment(corpus, bench, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out.contains((100L, 1L)), s"full leak must be flagged: $out")
    assert(out((100L, 1L)) == 1.0, s"every benchmark shingle is in doc 100: $out")
    assert(!out.keySet.exists(_._1 == 101L), "sub-threshold overlap must not flag")
    assert(!out.keySet.exists(_._1 == 102L))
  }

  test("HashFunctions.jaccard matches the scala brute force") {
    val df = docsDf(Seq(base, base + " tonight"))
    val j = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.doc_id") === 0 && col("b.doc_id") === 1)
      .select(HashFunctions.jaccard(
        HashFunctions.wordShingles(col("a.text"), 3),
        HashFunctions.wordShingles(col("b.text"), 3)).as("j"))
      .head().getDouble(0)
    assert(math.abs(j - exactJaccard(base, base + " tonight", 3)) < 1e-9)
  }

  test("sumPairCombinations: exact past the 2^53 and Long-wrap regimes; " +
      "cross-row decimal overflow returns the refuse sentinel") {
    import spark.implicits._
    // single count whose C(m,2) exceeds Long.MaxValue — a LongType sum
    // would wrap silently in non-ANSI mode and a double is approximate
    // past 2^53; the decimal fold must be exact
    val m1 = 1L << 33
    assert(Dedup.sumPairCombinations(Seq(m1).toDF("m"), "m") ===
      BigInt(m1) * (BigInt(m1) - 1) / 2)
    // even/odd/zero/one mix vs a BigInt brute force (exercises both
    // halve-the-even-factor branches of the CASE)
    val ms = Seq(0L, 1L, 2L, 3L, 1000003L, (1L << 62) + 5L)
    assert(Dedup.sumPairCombinations(ms.toDF("m"), "m") ===
      ms.map(m => BigInt(m) * (BigInt(m) - 1) / 2).sum)
    // empty counts frame: null sum with ZERO rows means "no buckets",
    // not overflow — must be 0, not the sentinel
    assert(Dedup.sumPairCombinations(Seq.empty[Long].toDF("m"), "m") ===
      BigInt(0))
    // cross-row decimal(38,0) overflow (the r14-advisor refuse branch,
    // unreachable from real buckets because count(*) is bounded by the
    // row count): 11 rows of C(4.5e18, 2) ≈ 1.01e37 sum past 10^38−1,
    // so the decimal sum nulls in non-ANSI mode and the fold must
    // return the sentinel every `<=` cap refuses
    val over = Seq.fill(11)(4500000000000000000L).toDF("m")
    assert(Dedup.sumPairCombinations(over, "m") === Dedup.PairCountOverflow)
  }
}
