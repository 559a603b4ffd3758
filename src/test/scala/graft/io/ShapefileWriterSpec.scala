package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip: ShapefileWriter.write → Shapefile.read must reproduce
  * WKT and attributes exactly (the writer normalizes ring orientation
  * to spec, which the reader's hole-grouping relies on).
  */
class ShapefileWriterSpec extends AnyFunSuite {

  private def roundTrip(fields: Seq[String], feats: Seq[(String, Seq[String])])
      : (Seq[String], Seq[Shapefile.Feature]) = {
    val dir = Files.createTempDirectory("shpw").toString
    ShapefileWriter.write(dir, "layer", fields, feats)
    Shapefile.read(s"$dir/layer.shp")
  }

  test("points round-trip with attributes") {
    val (names, feats) = roundTrip(Seq("id", "name"),
      Seq(("POINT (1 2)", Seq("1", "alpha")),
        ("POINT (-3.25 4.5)", Seq("2", "beta")),
        ("POINT (180 -90)", Seq("3", null))))
    assert(names === Seq("id", "name"))
    assert(feats.map(_.wkt) === Seq("POINT (1 2)", "POINT (-3.25 4.5)", "POINT (180 -90)"))
    // the reader keeps empty DBF cells as explicit null values
    assert(feats.map(_.attrs.get("name")) === Seq(Some("alpha"), Some("beta"), Some(null)))
  }

  test("multipoint, linestring, and multilinestring round-trip") {
    val (_, mp) = roundTrip(Nil, Seq(("MULTIPOINT ((1 2), (3 4))", Nil)))
    assert(mp.head.wkt === "MULTIPOINT ((1 2), (3 4))")
    val (_, ls) = roundTrip(Nil, Seq(("LINESTRING (0 0, 1 1, 2 0)", Nil)))
    assert(ls.head.wkt === "LINESTRING (0 0, 1 1, 2 0)")
    val (_, mls) = roundTrip(Nil,
      Seq(("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))", Nil)))
    assert(mls.head.wkt === "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))")
  }

  test("polygon with hole and multipolygon round-trip; CCW outer ring is re-oriented") {
    // outer given CCW (wrong per spec) with a CW hole (also wrong):
    // writer must flip both so the reader's orientation-based hole
    // grouping reconstructs one polygon with one hole
    val wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"
    val (_, got) = roundTrip(Nil, Seq((wkt, Nil)))
    assert(got.head.geomType === "POLYGON")
    assert(got.head.wkt ===
      "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val multi = "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))"
    val (_, gm) = roundTrip(Nil, Seq((multi, Nil)))
    assert(gm.head.geomType === "MULTIPOLYGON")
    assert(gm.head.wkt ===
      "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))")
  }

  test("null geometries and empty layers round-trip (IMMA / G9 shapes)") {
    val (names, feats) = roundTrip(Seq("Title"),
      Seq((null, Seq("a")), (null, Seq("b"))))
    assert(names === Seq("Title"))
    assert(feats.map(_.wkt) === Seq(null, null))
    assert(feats.map(_.attrs("Title")) === Seq("a", "b"))
    val (_, empty) = roundTrip(Nil, Nil)
    assert(empty.isEmpty)
  }

  test("reference windfarm polygon layers: read → write → read is geometry-stable") {
    val src = "/root/reference/data/eurosea_spatial/Ecological impact monitoring offshore windfarms"
    import scala.jdk.CollectionConverters._
    val shp = Files.walk(java.nio.file.Paths.get(src)).iterator().asScala
      .map(_.toFile).filter(f => f.isFile && f.getName.endsWith(".shp"))
      .toArray.sortBy(_.getName)
    assert(shp.length === 4)
    shp.foreach { f =>
      val (fields, feats) = Shapefile.read(f.getPath)
      val (fields2, feats2) = roundTrip(fields,
        feats.map(ft => (ft.wkt, fields.map(ft.attrs.get(_).orNull))))
      assert(fields2 === fields, f.getName)
      // some source files carry CCW outer rings (spec violation the
      // reader tolerates); the writer normalizes orientation, so compare
      // through the writer's own canonicalizing parser rather than raw
      // WKT text
      assert(feats2.map(ft => ShapefileWriter.wktToParts(ft.wkt)) ===
        feats.map(ft => ShapefileWriter.wktToParts(ft.wkt)), f.getName)
      assert(feats2.map(_.attrs) === feats.map(_.attrs), f.getName)
    }
  }

  test("mixed geometry types in one layer are rejected") {
    intercept[IllegalArgumentException] {
      roundTrip(Nil, Seq(("POINT (1 2)", Nil), ("LINESTRING (0 0, 1 1)", Nil)))
    }
  }
}
