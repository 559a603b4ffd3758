package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook: a session built with
  * `withExtensions(new GraftExtensions)` can call every kernel from
  * SQL, matching the programmatic expressions exactly.
  *
  * Needs its own SparkSession: `getOrCreate` reuses any active session
  * (skipping extension injection), so the active/default sessions are
  * cleared first — the underlying SparkContext is still shared — and
  * restored afterward for the other suites.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val previous = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    previous.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
    s
  }

  test("all six kernels are callable from SQL with correct results") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq(("hello world near duplicate text", Array(1f, 0f, 2f), Array(2f, 0f, 4f)))
      .toDF("t", "a", "b").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      """SELECT simhash64(t) AS sh,
        |       cosine_sim(a, b) AS cos,
        |       dot_product(a, b) AS dot,
        |       size(minhash_sig(t, 3, 16)) AS mh_n,
        |       size(shingle_hashes(t, 3)) AS sh_n,
        |       hyperplane_sig(a, 16) AS hp
        |FROM ext_t""".stripMargin).head()
    assert(r.getLong(0) === Kernels.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world near duplicate text")))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9) // parallel vectors
    assert(r.getDouble(2) === 10.0)
    assert(r.getInt(3) === 16)
    assert(r.getInt(4) === 3) // 5 tokens → 3 trigram shingles
    assert(r.getLong(5) === (r.getLong(5) & 0xFFFFL), "16-bit signature range")
  }

  test("text-metric kernels are callable from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT token_count('the quick fox!') AS tc,
        |       subword_count('the quick fox!') AS sw,
        |       round(stopword_ratio('the quick fox'), 4) AS sr,
        |       round(punct_ratio('ab, cd!'), 4) AS pr,
        |       round(mean_token_len('ab abcd'), 4) AS mtl,
        |       fingerprint64('ab') AS fp,
        |       prefix_tokens('The Quick  Brown fox', 3) AS pt""".stripMargin).head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 4) // the, quick, fox, '!'
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-4)
    assert(math.abs(r.getDouble(3) - 2.0 / 7) < 1e-4)
    assert(math.abs(r.getDouble(4) - 3.0) < 1e-9)
    assert(r.getLong(5) === 'a'.toLong * 31 + 'b'.toLong)
    assert(r.getString(6) === "the quick brown")
  }

  test("non-literal arity/params are rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig('x', 3)").collect()
    }
    assert(e.getMessage.contains("3 arguments") || e.getMessage.contains("expects"))
  }
}
