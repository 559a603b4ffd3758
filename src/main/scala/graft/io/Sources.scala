package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File sources with the reference's exact read semantics (SURVEY §2.1).
  * All are `spark.read` scans — distributed, filter/projection pushdown
  * applies — with options matching R's `read.csv`/`read_tsv` behavior.
  */
object Sources {

  /** Survey-export CSV (S1/S2, notebooks/index.Rmd:56,69): header row,
    * quoted multiline fields (survey 4 is 36,181 physical lines for 371
    * records), `"`-escaped quotes, and R `read.csv`/type.convert null
    * semantics: both the empty string and the literal "NA" read as null.
    */
  def surveyCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "NA")
      .csv(path)
      .transform(blankToNull)

  /** Per-network site CSV (S5, notebooks/index.Rmd:433): permissive mode
    * (Movebank.csv has ragged rows — R's read.csv fills short rows).
    */
  def siteCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("nullValue", "NA")
      .csv(path)
      .transform(blankToNull)

  /** TSV (S6, notebooks/index.Rmd:531). */
  def tsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", "\t")
      .option("nullValue", "NA")
      .csv(path)
      .transform(blankToNull)

  /** Plain CSV for DB backups (S12, data/layers_layer_eovs.csv). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("nullValue", "NA").csv(path)

  /** R `type.convert` treats "" as NA in every column; Spark leaves
    * quoted empty strings as "". Normalize once at the source.
    * Backtick-quoted so dotted headers ("Site.Name") resolve literally.
    */
  private def blankToNull(df: DataFrame): DataFrame =
    df.select(df.columns.map { c =>
      val q = col(s"`$c`")
      when(q === "", lit(null)).otherwise(q).as(c)
    }: _*)
}
