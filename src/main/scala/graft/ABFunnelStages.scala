package graft

import graft.operators.{Curation, Dedup, LanguageModel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q186 ambient-swing forensics (r17 verdict #6): the funnel's wall
  * time swung 8–15 s across r17 captures while its slice oracle stayed
  * stable — this harness re-runs the funnel `SPARK_GRAFT_RUNS` times
  * (default 6) with the four stage boundaries materialized and timed
  * SEPARATELY, so the swing attributes to a stage instead of to "the
  * query". Stage bodies mirror Curation.funnel line-for-line (same
  * defaults); a final full `Curation.funnel` run per rep confirms the
  * decomposition's total tracks the real query.
  *
  *   s2  rule gate → exact dedup     (persist + count)
  *   s3  dupSpanTrim + join + filter (persist + count)
  *   s4  LM decile gate + join       (count)
  *   asm anchor agg + 3 left joins   (collect — the funnel result)
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ABFunnelStages /root/testdata/sf0.1"
  * Prints one JSON line per rep + a min/median/max summary per stage.
  */
object ABFunnelStages {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_RUNS", "6").toInt.max(1)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val names = Seq("s2_dedup", "s3_trim", "s4_lmgate", "assembly", "full_funnel")
    val acc = names.map(_ => scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache(); System.gc()
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val tk = filter(split(trim(col("text")), graft.plans.Kernels.WsRun),
        (x: Column) => x =!= "")
      val n = size(tk)
      val alphaFrac = size(filter(tk, (t: Column) => t.rlike("[A-Za-z]")))
        .cast("double") / greatest(n, lit(1)).cast("double")
      val rulePass = n >= 50 && n <= 100000 && alphaFrac >= 0.8
      val s1 = base.filter(rulePass)
      val s2 = Dedup.exactDedup(s1, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (t2, _) = timed(s2.count())
      val s3 = Dedup.dupSpanTrim(s2, "text", "doc_id", L = 8)
        .withColumnRenamed("id", "doc_id")
        .join(s2.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .filter(col("n_removed") * 2 <= col("n_tokens"))
        .select(col("doc_id"), col("trimmed_text"), col("lang"), col("source"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (t3, _) = timed(s3.count())
      val s4 = LanguageModel.perplexityGate(s3, "doc_id", "trimmed_text",
          "lang", dropFrac = 0.10)
        .join(s3.select(col("doc_id"), col("source")), "doc_id")
      val (t4, _) = timed(s4.count())
      def cnt(x: DataFrame, name: String) =
        x.groupBy(col("source")).agg(count(lit(1)).cast("long").as(name))
      val anchor = base.groupBy(col("source")).agg(
        count(lit(1)).cast("long").as("n_docs"),
        count(when(rulePass, 1)).cast("long").as("n_rules"))
      val (tA, _) = timed(anchor
        .join(cnt(s2, "n2"), Seq("source"), "left")
        .join(cnt(s3, "n3"), Seq("source"), "left")
        .join(cnt(s4, "n4"), Seq("source"), "left")
        .collect())
      s3.unpersist(blocking = false); s2.unpersist(blocking = false)
      spark.catalog.clearCache(); System.gc()
      // un-decomposed control: the catalog query as shipped
      val (tF, _) = timed(
        Curation.funnel(Tables.documents(spark, sfDir))
          .write.format("noop").mode("overwrite").save())
      Seq(t2, t3, t4, tA, tF).zip(acc).foreach { case (t, b) => b += t }
      println(s"""{"rep":$rep,${names.zip(Seq(t2, t3, t4, tA, tF))
        .map { case (k, v) => "\"" + k + "\":" + math.rint(v * 1000) / 1000 }
        .mkString(",")}}""")
    }
    val summary = names.zip(acc).map { case (k, b) =>
      val s = b.sorted
      s""""$k":{"min":${math.rint(s.head * 1000) / 1000},"med":${math.rint(s(s.size / 2) * 1000) / 1000},"max":${math.rint(s.last * 1000) / 1000}}"""
    }.mkString(",")
    println(s"""{"sf":"$sfDir","reps":$reps,$summary}""")
    spark.stop()
  }
}
