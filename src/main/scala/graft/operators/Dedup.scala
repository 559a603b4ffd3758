package graft.operators

import graft.functions.HashFunctions
import graft.plans.Exprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Every operator is expressed as a shuffle-minimal DataFrame transform:
  *   - exact dedup: one shuffle on the content hash;
  *   - MinHash/SimHash/embedding LSH: signatures computed in a single
  *     codegen'd scan ([[graft.plans.Exprs]] kernels), then ONE shuffle
  *     on the band/bucket key, then per-bucket pair generation. No
  *     all-pairs cross join anywhere — at 100 TB the bucket join is the
  *     only quadratic-risk point and it is bounded by bucket size.
  */
object Dedup {

  /** Exact duplicates by content: keeps the lowest `idCol` per distinct
    * `textCol` value. Hashes first (xxhash64) so the shuffle carries an
    * 8-byte key instead of full documents; a same-hash group is then
    * resolved on the exact text to be collision-proof.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol)), col(textCol))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact-duplicate groups report: (canonical_id, dup_id) pairs, one row
    * per NON-canonical member. SQL-oracle-friendly shape.
    */
  def exactDupPairs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol))
    df.select(col(idCol), col(textCol))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .filter(col(idCol) =!= col("canonical_id"))
      .select(col("canonical_id"), col(idCol).as("dup_id"))
  }

  /** MinHash+LSH candidate pairs: signature (numPerms minhashes over
    * word-`shingleK`-grams) → `bands` bands of `numPerms/bands` rows →
    * explode to (band_id, band_hash) keys → self-join within buckets →
    * distinct pairs with estimated Jaccard (fraction of matching
    * signature positions).
    *
    * Scale shape: |docs|×bands exploded rows, one shuffle on the band
    * key; a skewed bucket (boilerplate docs) is the known hot spot —
    * callers can pre-filter near-empty docs. Returns
    * (id_a < id_b, est_jaccard ≥ threshold).
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleK: Int = 3, numPerms: Int = 64,
                            bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(numPerms % bands == 0, "numPerms must divide into bands")
    val rows = numPerms / bands
    val sig = df.select(col(idCol).as("id"),
      Exprs.minhashSig(col(textCol), shingleK, numPerms).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
        explode(array((0 until bands).map(bi =>
          struct(lit(bi).as("band"),
            xxhash64(slice(col("sig"), bi * rows + 1, rows)).as("bh"))): _*))
          .as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numPerms).cast("double"))
      .drop("siga", "sigb")
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit fingerprint per doc, banded into 4
    * 16-bit chunks (any chunk equal → candidate, catches all pairs with
    * Hamming distance ≤ 3 by pigeonhole), verified with exact Hamming ≤
    * `maxHamming`. One codegen'd scan + one shuffle on the chunk key.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      Exprs.simhash64(col(textCol)).as("sh"))
    val chunked = sig.select(col("id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftrightunsigned(col("sh"), i * 16)
            .bitwiseAND(lit(0xFFFFL)).as("ck"))): _*)).as("c"))
      .select(col("id"), col("sh"), col("c.chunk"), col("c.ck"))
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        HashFunctions.hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs via inverted index — the scalable exact
    * formulation: explode distinct shingles, self-join on shingle (ONE
    * shuffle on the shingle hash), count common shingles per pair, then
    * jaccard = common / (|A| + |B| - common). `minJaccard` filters the
    * result; prefilterHashes caps index fan-out by dropping
    * ultra-common shingles (stopword-shingles), the standard
    * positional-filter trick's cheap cousin.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, minJaccard: Double = 0.8,
                        maxShingleDf: Long = 1000000L): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        array_distinct(HashFunctions.wordShingles(col(textCol), shingleK)).as("shingles"))
      .withColumn("n", size(col("shingles")))
    val inv = sh.select(col("id"), col("n"), explode(col("shingles")).as("s"))
      .withColumn("sh", xxhash64(col("s"))).drop("s")
    // drop shingles that appear in more than maxShingleDf docs (they
    // generate quadratic pairs and carry no signal)
    val filtered = inv.withColumn("_df",
        count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("_df") <= maxShingleDf).drop("_df")
    val a = filtered.as("a"); val b = filtered.as("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-duplicate pairs: hyperplane-LSH bucket join (one
    * shuffle on (band, bucket)), exact cosine verification inside
    * buckets. `bits`=16 with 4-bit bands keeps buckets small on uniform
    * data; skewed clusters fall back to AQE skew handling.
    */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            minCosine: Double = 0.95,
                            bits: Int = 16, bandBits: Int = 4): DataFrame = {
    val bands = bits / bandBits
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Exprs.hyperplaneSig(col(vecCol), bits).as("sig"))
    val banded = sig.select(col("id"), col("v"),
      explode(array((0 until bands).map(i =>
        struct(lit(i).as("band"),
          shiftrightunsigned(col("sig"), i * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bk"))): _*)).as("c"))
      .select(col("id"), col("v"), col("c.band"), col("c.bk"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Exprs.cosineSim(col("a.v"), col("b.v")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= minCosine)
  }
}
