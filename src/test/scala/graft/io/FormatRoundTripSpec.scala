package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Format breadth of the built-in sources/sinks the library leans on:
  * every interchange format a pipeline stage might hand off through
  * (parquet, ORC, JSON-lines, CSV) round-trips rows and — where the
  * format carries one — the schema. Complements the custom readers
  * (XLSX/SHP/TSV/REST) tested in their own specs.
  */
class FormatRoundTripSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha, with comma", 3.5, true),
    (2L, "line\nbreak and \"quotes\"", -0.25, false),
    (3L, null.asInstanceOf[String], 0.0, true)
  ).toDF("id", "s", "x", "flag")

  /** name/type pairs — file readers legitimately relax nullability. */
  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_fmt_$name")
    d.toFile.deleteOnExit()
    s"$d/out"
  }

  test("parquet round-trip preserves schema and values") {
    val p = tmp("parquet")
    fixture.write.parquet(p)
    val back = spark.read.parquet(p)
    assert(shape(back) === shape(fixture))
    assert(back.sort("id").collect().toSeq === fixture.sort("id").collect().toSeq)
  }

  test("orc round-trip preserves schema and values") {
    val p = tmp("orc")
    fixture.write.orc(p)
    val back = spark.read.orc(p)
    assert(shape(back) === shape(fixture))
    assert(back.sort("id").collect().toSeq === fixture.sort("id").collect().toSeq)
  }

  test("json-lines round-trip preserves values under an explicit schema") {
    val p = tmp("json")
    fixture.write.json(p)
    // JSON carries no schema; read back under the writer's
    val back = spark.read.schema(fixture.schema).json(p)
    assert(back.sort("id").collect().toSeq === fixture.sort("id").collect().toSeq)
  }

  test("csv round-trip survives embedded commas, quotes, and newlines") {
    val p = tmp("csv")
    // escape = '"' on BOTH sides: the doubled-quote convention the
    // reference's survey exports use (writer's default is backslash)
    fixture.write.option("header", true).option("escape", "\"").csv(p)
    val back = spark.read.option("header", true).option("multiLine", true)
      .option("escape", "\"").schema(fixture.schema).csv(p)
    assert(back.sort("id").collect().toSeq === fixture.sort("id").collect().toSeq)
  }
}
