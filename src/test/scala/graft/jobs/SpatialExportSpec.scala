package graft.jobs

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.io.Shapefile
import org.apache.spark.sql.functions._

/** E1 stage 4 (spatial export): file-level assertions against the
  * reference data (`notebooks/index.Rmd:396-587`) and the rendered
  * missing-spatial table (~100 rows, docs/index.html).
  */
class SpatialExportSpec extends SparkSpec {

  private val dataDir = "/root/reference/data"

  private lazy val result: SpatialExport.Result = {
    val job = new LoadPortal(spark, dataDir)
    val out = Files.createTempDirectory("graft_spatial").toString
    SpatialExportSpec.lastOutDir = out
    SpatialExport.run(spark, job.withIdentifiers, dataDir, out)
  }

  test("every one of the 627 identifiers gets a geometry file (incl. empty ones, G9)") {
    result.withShapefileFlag.count() // force run
    val outDirs = new java.io.File(SpatialExportSpec.lastOutDir).listFiles()
    assert(outDirs.length === 627)
    outDirs.foreach { d =>
      assert(new java.io.File(d, s"${d.getName}.geojson").exists(), s"missing file in $d")
      // the reference's actual artifact: the shapefile bundle (K1)
      Seq("shp", "shx", "dbf", "prj").foreach(ext =>
        assert(new java.io.File(d, s"${d.getName}.$ext").exists(), s"missing .$ext in $d"))
    }
  }

  test("written shapefiles read back with the reader (IMMA attrs, windfarm polygons)") {
    result.withShapefileFlag.count() // force run
    val flagged = result.withShapefileFlag
    val imma = flagged.filter(col("name") === "IUCN Marine Mammal Protected Areas Task Force")
      .select(col("identifier")).collect().map(_.getString(0))
    assert(imma.nonEmpty)
    val (immaFields, immaFeats) = Shapefile.read(
      Paths.get(SpatialExportSpec.lastOutDir, imma.head, s"${imma.head}.shp").toString)
    assert(immaFeats.length === 159) // attrs preserved even without geometry
    assert(immaFields.contains("Title"))
    val wind = flagged.filter(col("name") === SpatialExport.windfarmName)
      .select(col("identifier")).collect().map(_.getString(0))
    val (_, windFeats) = Shapefile.read(
      Paths.get(SpatialExportSpec.lastOutDir, wind.head, s"${wind.head}.shp").toString)
    assert(windFeats.length === 3)
    assert(windFeats.forall(f => f.geomType == "POLYGON" || f.geomType == "MULTIPOLYGON"))
  }

  test("missing-spatial report = 372 rows (derived from the data itself)") {
    // the rendered html caps its tables at 100 rows (paged df_print), so
    // the golden here is data-derived: 627 total − flagged, where
    // flagged = 124 single-geometry-type FeatureCollection rows (5 mixed
    // ones skipped, index.Rmd:409) + 96 EuroSea groups with ≥1 point +
    // the spatial-manifest identifiers not already covered
    val n = result.missingSpatial.count()
    assert(n === 372L, s"missing_spatial = $n, expected 372")
  }

  test("has_shapefile true for geojson-column, site-CSV, and copy sources") {
    val flagged = result.withShapefileFlag.filter(col("has_shapefile"))
      .select(col("identifier")).collect().map(_.getString(0)).toSet
    Seq("ocean_tracking_network", "reef_life_survey",
      "iucn_marine_mammal_protected_areas_task_force").foreach(i =>
      assert(flagged.contains(i), s"$i should have spatial data"))
  }

  test("IMMA copy carries 159 features (BASELINE; .shp absent → null geometry)") {
    val (_, feats) = Shapefile.read(
      s"$dataDir/eurosea_spatial/iucn-imma-layer-shapefile_v2.4/iucn-imma-fixed/iucn-imma_oct20-fixed.shp")
    assert(feats.length === 159)
    assert(feats.head.attrs.contains("Title"))
  }

  test("windfarm gather keeps only polygon layers (3 of 4 shapefiles)") {
    val idents = result.withShapefileFlag
      .filter(col("name") === SpatialExport.windfarmName)
      .select(col("identifier")).collect().map(_.getString(0))
    assert(idents.nonEmpty)
    val f = Paths.get(SpatialExportSpec.lastOutDir, idents.head, s"${idents.head}.geojson")
    val json = Files.readString(f)
    assert(json.contains("\"Polygon\""))
    assert(!json.contains("\"Point\""), "point layer must be filtered out")
    // 3 polygon shapefiles × 1 feature each
    assert("\\{\"type\":\"Feature\"".r.findAllIn(json).length === 3)
  }

  test("WESPAS output is a single LINESTRING of 116 points (G8)") {
    val idents = result.withShapefileFlag
      .filter(col("name") === SpatialExport.wespasName)
      .select(col("identifier")).collect().map(_.getString(0))
    assert(idents.length === 1)
    val json = Files.readString(
      Paths.get(SpatialExportSpec.lastOutDir, idents.head, s"${idents.head}.geojson"))
    assert(json.contains("\"LineString\""))
    assert("\\[-?\\d".r.findAllIn(json).length === 116)
  }

  test("Spain TSV reprojects UTM 30N → plausible Basque-coast WGS84 (G7)") {
    val idents = result.withShapefileFlag
      .filter(col("name") === SpatialExport.spainName)
      .select(col("identifier")).collect().map(_.getString(0))
    assert(idents.nonEmpty)
    val json = Files.readString(
      Paths.get(SpatialExportSpec.lastOutDir, idents.head, s"${idents.head}.geojson"))
    // Basque coast: lon ≈ -3.5..-1.5, lat ≈ 43..44
    val coords = "\\[(-?\\d+\\.\\d+),(\\d+\\.\\d+)\\]".r
      .findAllMatchIn(json).map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    assert(coords.nonEmpty)
    coords.foreach { case (lon, lat) =>
      assert(lon > -4 && lon < -1, s"lon $lon out of Basque range")
      assert(lat > 42.5 && lat < 44.5, s"lat $lat out of Basque range")
    }
  }
}

object SpatialExportSpec {
  @volatile var lastOutDir: String = _
}
