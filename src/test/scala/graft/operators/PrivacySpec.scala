package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  test("kAnonymityAudit: group sizes, sensitive diversity, and verdicts") {
    import spark.implicits._
    // QI (city, age): one large diverse group, one large homogeneous
    // group (k passes, l fails), one tiny group (k fails)
    val rows =
      (1 to 6).map(i => ("berlin", 30, s"disease$i")) ++
      (1 to 5).map(_ => ("paris", 40, "flu")) ++
      Seq(("oslo", 50, "flu"), ("oslo", 50, "cold"))
    val df = rows.toDF("city", "age", "diagnosis")
    val got = Privacy.kAnonymityAudit(df, Seq(col("city"), col("age")),
      col("diagnosis"), k = 5, l = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq === Seq(
      ("berlin", 30, 6L, 6L, 1L, 1L),
      ("oslo", 50, 2L, 2L, 0L, 0L),
      ("paris", 40, 5L, 1L, 1L, 0L)))
  }

  test("kAnonymityAudit: null QI values form their own group; null sensitive not counted") {
    import spark.implicits._
    val df = Seq((Some("a"), Some("x")), (Some("a"), None),
      (None, Some("y")), (None, Some("y"))).toDF("qi", "sens")
    val got = Privacy.kAnonymityAudit(df, Seq(col("qi")), col("sens"), k = 2, l = 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .sortBy(_._1.getOrElse(""))
    // count_distinct skips nulls (SQL semantics): group 'a' has 1
    // distinct sensitive value, the null-QI group has 1
    assert(got.toSeq === Seq((None, 2L, 1L), (Some("a"), 2L, 1L)))
  }
}
