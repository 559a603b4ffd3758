package graft.jobs

import org.apache.spark.sql.SparkSession

/** E1 entry point: runs the whole LoadPortal pipeline against a data
  * directory and writes every artifact the reference produces —
  * per-identifier geometry files, the Django fixtures, and the
  * duplicate/missing reports (as CSV).
  *
  * Usage: `runMain graft.jobs.LoadPortalMain <dataDir> <outDir>`
  * (defaults: /root/reference/data → /tmp/graft_e1).
  */
object LoadPortalMain {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/reference/data")
    val outDir = args.lift(1).getOrElse("/tmp/graft_e1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val job = new LoadPortal(spark, dataDir)
    val combined = job.withIdentifiers
    val spatial = SpatialExport.run(spark, combined, dataDir, s"$outDir/output")

    // K2/K3 Django fixtures (index.Rmd:648-656, 680-688)
    Fixtures.writeEovs(spark, s"$outDir/output")
    Fixtures.writeUsers(job.users, s"$outDir/output")

    val dupCount = job.duplicates.count()
    val missingCount = spatial.missingSpatial.count()
    val userCount = job.users.count()

    // reports (the reference prints these as notebook tables)
    job.duplicates.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/reports/duplicates")
    spatial.missingSpatial.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/reports/missing_spatial")

    println(s"[e1] initial=${job.initial.count()} eurosea=${job.eurosea.count()} " +
      s"combined=${combined.count()} users=$userCount duplicates=$dupCount " +
      s"missing_spatial=$missingCount out=$outDir")
    spark.stop()
  }
}
