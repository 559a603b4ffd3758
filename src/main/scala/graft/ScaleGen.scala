package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve dataset generator: writes a `factor`× replica of a
  * testdata directory that preserves each table's DISTRIBUTIONAL shape,
  * so wall-time ratios between the source and the replica measure the
  * operators' scaling behavior rather than a changed workload
  * (SCALE.md's measurement harness).
  *
  * Replication rules:
  *  - `lineitem` / `orders`: `factor` copies with the order key offset
  *    by replica × 1e9 — join consistency with each other is preserved,
  *    dimension keys (part/supplier/customer/nation) are untouched, so
  *    per-order baskets, value histograms, and the key-space-bounded
  *    trade graphs replicate exactly.
  *  - `documents`: doc_id offset the same way; the TEXT of replica i
  *    goes through a per-replica alphanumeric substitution cipher
  *    (`translate` with a rotated alphabet). A cipher is a bijection on
  *    token space: every within-replica shingle-set relation (n-gram
  *    Jaccard, minhash bands, containment) is preserved EXACTLY, while
  *    cross-replica token overlap vanishes — so near-dup structure
  *    replicates as `factor` disjoint copies instead of artificial
  *    cross-replica cliques (which would quadratically inflate pair
  *    volume and measure a different problem).
  *  - `embeddings`: vec_id offset the same way; replica i > 0 applies
  *    a per-replica signed coordinate permutation (orthogonal, exact)
  *    so within-replica similarity structure is preserved bit-for-bit
  *    while cross-replica neighbors decorrelate.
  *  - dimensions (`region nation customer supplier part`): byte-copied.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <dstDir> <factor>
  */
object ScaleGen {
  private val lowerDigits = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  /** Per-replica SEEDED Fisher–Yates permutation of an alphabet — the
    * round-12 fix for the rotation cipher's period: `rotated(s, i)`
    * repeats at i ≡ j (mod |s|), so at factor > 36 replicas {i, i+36,
    * i+72} shared one lowercase cipher and the corpus silently grew
    * cross-replica near-dup CLIQUES — exactly the densified workload
    * the cipher exists to avoid (measured: q36's reported pairs jumped
    * 7.7k → 533k between 30× and 100×, all hash-verified real but an
    * artifact of the harness, not of scale). A mix64-seeded
    * permutation has effective period 36! — every replica pair gets
    * distinct vocabularies at any realistic factor, while staying a
    * bijection on token space (within-replica shingle relations still
    * replicate exactly).
    */
  private def permuted(s: String, seed: Long): String = {
    val a = s.toCharArray
    var j = a.length - 1
    while (j > 0) {
      val r = ((graft.plans.Kernels.mix64(seed * 64007L + j) >>> 1) % (j + 1)).toInt
      val t = a(j); a(j) = a(r); a(r) = t
      j -= 1
    }
    new String(a)
  }

  def main(args: Array[String]): Unit = {
    // pin the JVM default locale: Spark's non-ASCII lowercase path
    // reads it while the kernels use Locale.ROOT explicitly — a
    // non-ROOT default (tr-TR 'I'→'ı') would desync the two (r16
    // advisor); ROOT is what every committed hash was captured under
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val offset = 1000000000L
    def replicate(t: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => per(t, i)).reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write(replicate(li)((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * offset))), "lineitem")

    val ord = spark.read.parquet(s"$src/orders.parquet")
    write(replicate(ord)((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * offset))), "orders")

    // events replicate by offsetting user_id/event_id: every event-time
    // operator in the catalog partitions by user (sessions, funnels,
    // retention cohorts, as-of grids) or aggregates across users with
    // integer-graded sums, so `factor` disjoint user populations over
    // the SAME time range replicate the workload's window structure
    // exactly. `ts` is read under nanosAsLong and written back as the
    // raw ns long — tools/check.py rebuilds the DuckDB view with
    // make_timestamp(ts // 1000), the same exact truncation Spark's
    // loader applies (`ts div 1000`).
    val ev = spark.read.parquet(s"$src/events.parquet")
    write(replicate(ev)((d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * offset))
        .withColumn("user_id", col("user_id") + lit(i * offset))), "events")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    write(replicate(docs) { (d, i) =>
      val from = lowerDigits + upper
      // replica 0 is the base corpus verbatim; each other replica gets
      // its own seeded permutation pair (distinct seeds per case class)
      val to =
        if (i == 0) from
        else permuted(lowerDigits, i.toLong) + permuted(upper, i.toLong + 500000L)
      d.withColumn("doc_id", col("doc_id") + lit(i * offset))
        .withColumn("text", translate(col("text"), from, to))
    }, "documents")

    // embeddings replicate under a per-replica SIGNED PERMUTATION of
    // the coordinates (rotate by i, deterministic mix64 sign flips) —
    // an orthogonal transform, so every within-replica norm / inner
    // product / cosine is preserved EXACTLY (permuting and negating
    // floats involves no FP arithmetic: ±1·x is exact), while
    // cross-replica neighbor structure decorrelates. The ANN/semantic-
    // dedup workload therefore replicates as `factor` disjoint vector
    // populations — the embedding-space mirror of the documents cipher,
    // and for the same reason: cross-replica cliques would measure a
    // densified problem, not "same workload, more data".
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    write(replicate(emb) { (d, i) =>
      val base = d.withColumn("vec_id", col("vec_id") + lit(i * offset))
      if (i == 0) base
      else {
        val signs = (0 until 64).map(j =>
          if ((graft.plans.Kernels.mix64(i.toLong * 1000003L + j) & 1L) == 0L) 1.0f
          else -1.0f).toArray
        base.withColumn("embedding",
          transform(col("embedding"), (_, jj) =>
            element_at(col("embedding"),
              (pmod(jj + lit(i), size(col("embedding"))) + 1).cast("int")) *
              element_at(typedLit(signs), ((jj % 64) + 1).cast("int"))))
      }
    }, "embeddings")

    // unchanged tables are BYTE-copied, not rewritten through Spark: a
    // read/write round-trip rewrites the parquet logical types (the
    // driver's nanosecond timestamps, read as longs under
    // `nanosAsLong`, come back out as plain BIGINT) and the DuckDB
    // oracle side then sees a different schema than at the source SF
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      if (java.nio.file.Files.exists(from))
        java.nio.file.Files.copy(from,
          java.nio.file.Paths.get(s"$dst/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"""{"scaled":"$dst","factor":$factor}""")
    spark.stop()
  }
}
