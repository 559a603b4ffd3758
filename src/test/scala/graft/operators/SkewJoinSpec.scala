package graft.operators

import graft.SparkSpec
import graft.io.GeoJsonSink
import org.apache.spark.sql.functions._

/** Salted skew join correctness + the distributed per-identifier
  * GeoJSON sink (the 100-TB write path).
  */
class SkewJoinSpec extends SparkSpec {

  test("saltedEquiJoin equals the plain join, including a pathological hot key") {
    import spark.implicits._
    // 10k rows where 60% share one hot key
    val left = (0 until 10000).map(i =>
      (if (i % 5 < 3) "HOT" else s"k${i % 97}", i.toLong)).toDF("k", "v")
    val right = (0 until 97).map(i => (s"k$i", i * 10L)).toDF("k", "w")
      .union(Seq(("HOT", -1L)).toDF("k", "w"))
    val plain = left.join(right, Seq("k")).select(col("k"), col("v"), col("w"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", buckets = 8)
      .select(col("k"), col("v"), col("w"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 10000)
  }

  test("saltedEquiJoin left-outer keeps unmatched left rows exactly once") {
    import spark.implicits._
    val left = Seq(("a", 1L), ("b", 2L), ("nomatch", 3L)).toDF("k", "v")
    val right = Seq(("a", 10L), ("b", 20L)).toDF("k", "w")
    val out = SkewJoin.saltedEquiJoin(left, right, "k", buckets = 4, joinType = "left")
      .select(col("k"), col("v"), col("w")).collect()
    assert(out.length === 3)
    assert(out.count(_.isNullAt(2)) === 1)
  }

  test("GeoJsonSink.writePartitioned: one directory per identifier, parseable features") {
    import spark.implicits._
    val df = Seq(
      ("net_a", "POINT (1 2)", "s1"),
      ("net_a", "POINT (3 4)", "s2"),
      ("net_b", "LINESTRING (0 0, 1 1)", "s3")).toDF("identifier", "wkt", "site")
    val out = java.nio.file.Files.createTempDirectory("graft_pw").toString
    GeoJsonSink.writePartitioned(df, "identifier", "wkt", out)
    val aDir = new java.io.File(s"$out/identifier=net_a")
    val bDir = new java.io.File(s"$out/identifier=net_b")
    assert(aDir.exists() && bDir.exists())
    val aLines = aDir.listFiles().filter(_.getName.endsWith(".txt"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(aLines.length === 2)
    aLines.foreach { l =>
      assert(l.contains("\"type\":\"Feature\""))
      assert(l.contains("\"Point\""))
      assert(l.contains("\"site\":"))
    }
  }
}
