package graft.jobs

import graft.functions.GeoFunctions
import graft.io.{GeoJsonSink, Shapefile, Sources, Xlsx}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** E1 stage 4 — the reference's spatial-export section
  * (`notebooks/index.Rmd:396-587`): one geometry file per dataset
  * identifier, sourced from (in the reference's order)
  *
  *  1. the `geometry_geojson` column (single-geometry-type rows only);
  *  2. twenty per-network point CSVs (S5, skipped when step 1 already
  *     produced the file);
  *  3. the windfarm shapefile folder (polygon layers only, gathered);
  *  4. shapefile copies (IUCN IMMA + 8 Finland layers);
  *  5. the Basque TSV (EPSG:32630 → WGS84 inverse transform);
  *  6. the WESPAS cruise track (points → LINESTRING);
  *  7. empty files for everything still without spatial data (G9).
  *
  * Output is the reference's shapefile bundle per identifier
  * ([[graft.io.ShapefileWriter]], K1) plus a GeoJSON FeatureCollection
  * mirror. `run` returns the combined frame with `has_shapefile` set
  * exactly as the reference's mutable flags would leave it, plus the
  * missing-spatial report.
  */
object SpatialExport {

  case class SiteCsv(name: String, file: String, lonCol: String, latCol: String)

  /** The 20 per-network CSV registrations (index.Rmd:443-462). */
  val siteCsvs: Seq[SiteCsv] = Seq(
    SiteCsv("Aleutian Islands Benthic Habitat Survey", "Aleutian Islands Benthic Habitat Survey.csv", "Longitude", "Latitude"),
    SiteCsv("Australian continuous plankton recorder survey (AusCPR)", "Australian continuous plankton recorder survey (AusCPR).csv", "MID_LONGITUDE", "MID_LATITUDE"),
    SiteCsv("Cetacean Research Program", "Cetacean Research Program.csv", "Longitude", "Latitude"),
    SiteCsv("Diversity of the Indo-Pacific Network", "Diversity of the Indo-Pacific Network.csv", "Longitude", "Latitude"),
    SiteCsv("eOceans", "eOceans.csv", "Longitude", "Latitude"),
    SiteCsv("Estacion Costera de Investigaciones Marinas", "Estacion Costera de Investigaciones Marinas.csv", "Longitude", "Latitude"),
    SiteCsv("Estación de Fotobiologia Playa Unión", "Estacion de Fotobiologia Playa Union.csv", "Longitude", "Latitude"),
    SiteCsv("Global ARMS Program", "Global ARMS Program.csv", "Longitude", "Latitude"),
    SiteCsv("IMOS ships of opportunity bioacoustics", "IMOS ships of opportunity bioacoustics.csv", "Longitude", "Latitude"),
    SiteCsv("Marine Biodiversity and Climate Change", "Marine Biodiversity and Climate Change.csv", "Longitude", "Latitude"),
    SiteCsv("Movebank", "Movebank.csv", "Longitude", "Latitude"),
    SiteCsv("National Observatory System: Mammals as Ocean Samplers", "National Observatory System- Mammals as Ocean Samplers.csv", "Longitude", "Latitude"),
    SiteCsv("Ocean Tracking Network", "Ocean Tracking Network.csv", "Longitude", "Latitude"),
    SiteCsv("Reef Life Survey", "Reef Life Survey.csv", "Longitude", "Latitude"),
    SiteCsv("SCAR Southern Ocean Continuous Plankton Recorder Survey", "SCAR Southern Ocean Continuous Plankton Recorder Survey.csv", "Longitude", "Latitude"),
    SiteCsv("Service National d'Observation CORAIL", "Service National d_Observation CORAIL.csv", "Longitude", "Latitude"),
    SiteCsv("Synoptic Intertidal Benthic Survey", "Synoptic Intertidal Benthic Survey.csv", "Longitude", "Latitude"),
    SiteCsv("Tohoku National Fisheries Institute", "Tohoku National Fisheries Institute.csv", "Longitude", "Latitude"),
    SiteCsv("Waddenmozaiek program", "Waddenmozaiek program.csv", "Longitude", "Latitude"),
    SiteCsv("Zooplankton Sample Collectionof Fisheries Research Agency", "Zooplankton Sample Collectionof Fisheries Research Agency.csv", "Longitude", "Latitude"))

  /** Shapefile copies: IMMA (index.Rmd:505) + Finland (index.Rmd:513-520). */
  val shapefileCopies: Seq[(String, String)] = Seq(
    "IUCN Marine Mammal Protected Areas Task Force" ->
      "eurosea_spatial/iucn-imma-layer-shapefile_v2.4/iucn-imma-fixed/iucn-imma_oct20-fixed.shp",
    "Marine breeding birds" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Breeding_seabirds.shp",
    "Coastal waters soft bottom fauna" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Coastal_benthic_invertebrates.shp",
    "Abundance and distribution of harbour porpoises" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Harbour_porpoise_detectors.shp",
    "Coastal hard bottom macroalgae and blue mussel communities" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Macroalgae.shp",
    "Offshore soft bottom macrozoobenthos" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Offshore_benthic_invertebrates.shp",
    "Phytoplankton species composition and abundance" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Phytoplankton.shp",
    "Sea trout" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Seatrout_rivers.shp",
    "Zooplankton species composition and abundance" ->
      "eurosea_spatial/Finland/Finland biological monitoring stations/Zooplankton.shp")

  val windfarmName = "Ecological impact monitoring offshore windfarms"
  val windfarmFolder = "eurosea_spatial/Ecological impact monitoring offshore windfarms"
  val spainName = "Basque monitoring network for the ecological status assessment"
  val spainTsv = "eurosea_spatial/Spain/Basque monitoring network for the ecological status assessment.tsv"
  val wespasName = "Western European Shelf Pelagic Acoustic Survey (WESPAS)"
  val wespasXlsx = "eurosea_spatial/WESPAS 2020_Positions.xlsx"

  case class Result(withShapefileFlag: DataFrame, missingSpatial: DataFrame,
                    geojsonIdentifiers: Seq[String])

  /** Runs the whole export. `combined` is [[LoadPortal.withIdentifiers]].
    * File writes are per-identifier FeatureCollections (driver-side —
    * the layers are config-scale; [[GeoJsonSink.writePartitioned]] is
    * the distributed path for big layers).
    */
  def run(spark: SparkSession, combined: DataFrame, dataDir: String,
          outDir: String): Result = {
    // ---- 1. geometry_geojson column (index.Rmd:400-416)
    val geoRows = combined
      .filter(col("geometry_geojson").isNotNull && col("geometry_geojson") =!= "null")
      .select(col("identifier"), col("geometry_geojson"))
      .collect()
    val geojsonWritten = geoRows.flatMap { r =>
      val identifier = r.getString(0)
      val feats = geojsonFeatures(r.getString(1))
      val types = feats.map(_._2).distinct
      if (feats.nonEmpty && types.length == 1) {
        writeFeatures(outDir, identifier, feats.map(_._1).map(w => (w, Seq.empty[(String, String)])))
        Some(identifier)
      } else None
    }.toSet

    // name → identifiers mapping (duplicate names → multiple outputs, J6)
    val nameIdents: Map[String, Seq[String]] = combined
      .select(col("name"), col("identifier")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap

    // ---- 2. site CSVs (index.Rmd:423-463) — distributed read + filter.
    // The reference flags has_shapefile BEFORE any file I/O
    // (index.Rmd:427); this data snapshot prunes two of the twenty CSVs
    // (IMOS, SCAR), so a missing input skips the write but keeps the
    // registration — reproducing the reference's flag state exactly.
    val csvIdentifiers = siteCsvs.flatMap { sc =>
      val idents = nameIdents.getOrElse(sc.name, Seq.empty)
      val toWrite = idents.filterNot(geojsonWritten.contains)
      val inputExists = new java.io.File(s"$dataDir/largeCSVsites_final/${sc.file}").exists()
      if (toWrite.nonEmpty && inputExists) {
        val df = Sources.siteCsv(spark, s"$dataDir/largeCSVsites_final/${sc.file}")
        // the reference filters the literal `Latitude` column (F2)
        val latName = if (df.columns.contains("Latitude")) "Latitude" else sc.latCol
        val rows = df
          .filter(col(s"`$latName`").cast("double") <= 90)
          .withColumn("_wkt", GeoFunctions.wktPoint(
            col(s"`${sc.lonCol}`").cast("double"), col(s"`${sc.latCol}`").cast("double")))
          .collect()
        val feats = rows.map(r => (r.getAs[String]("_wkt"),
          r.schema.fieldNames.filterNot(_ == "_wkt").toSeq
            .map(f => f -> Option(r.getAs[Any](f)).map(_.toString).orNull)))
        toWrite.foreach(writeFeatures(outDir, _, feats.toSeq))
      } else if (toWrite.nonEmpty) {
        // pruned input: emit the empty collection so every registered
        // identifier still has its per-dataset output file
        toWrite.foreach(writeFeatures(outDir, _, Seq.empty))
      }
      idents
    }

    // ---- 3. windfarm gather (index.Rmd:470-487): polygon layers only
    val windfarmIdents = nameIdents.getOrElse(windfarmName, Seq.empty)
    if (windfarmIdents.nonEmpty) {
      val shpFiles = listShapefiles(new java.io.File(s"$dataDir/$windfarmFolder"))
      val polygonFeats = shpFiles
        .map(f => Shapefile.read(f.getPath))
        .filter { case (_, feats) =>
          feats.headOption.exists(_.geomType == "POLYGON") } // first-feature type gate (index.Rmd:475)
        .flatMap { case (_, feats) =>
          feats.map(f => (f.wkt, f.attrs.toSeq)) }
      windfarmIdents.foreach(writeFeatures(outDir, _, polygonFeats))
    }

    // ---- 4. shapefile copies (index.Rmd:493-521)
    val copyIdents = shapefileCopies.flatMap { case (name, rel) =>
      val idents = nameIdents.getOrElse(name, Seq.empty)
      if (idents.nonEmpty) {
        val (_, feats) = Shapefile.read(s"$dataDir/$rel")
        val out = feats.map(f => (f.wkt, f.attrs.toSeq))
        idents.foreach(writeFeatures(outDir, _, out))
      }
      idents
    }

    // ---- 5. Spain TSV, EPSG:32630 → 4326 (index.Rmd:525-537, G7)
    val spainIdents = nameIdents.getOrElse(spainName, Seq.empty)
    if (spainIdents.nonEmpty) {
      val rows = Sources.tsv(spark, s"$dataDir/$spainTsv")
        .select(col("x").cast("double"), col("y").cast("double"))
        .select(col("x"), col("y"),
          GeoFunctions.utm30nLon(col("x"), col("y")).as("lon"),
          GeoFunctions.utm30nLat(col("x"), col("y")).as("lat"))
        .collect()
      val feats = rows.map(r => (
        s"POINT (${r.getAs[Double]("lon")} ${r.getAs[Double]("lat")})",
        Seq("x" -> r.getAs[Double]("x").toString, "y" -> r.getAs[Double]("y").toString)))
      spainIdents.foreach(writeFeatures(outDir, _, feats.toSeq))
    }

    // ---- 6. WESPAS track (index.Rmd:541-556, G8): one LINESTRING
    val wespasIdents = nameIdents.getOrElse(wespasName, Seq.empty)
    if (wespasIdents.nonEmpty) {
      val (_, rows) = Xlsx.readSheet(s"$dataDir/$wespasXlsx", 1)
      val pts = rows.collect { case Seq(lonS, latS, _*) if lonS != null && latS != null =>
        s"$lonS $latS" }
      val wkt = s"LINESTRING (${pts.mkString(", ")})"
      wespasIdents.foreach(writeFeatures(outDir, _, Seq((wkt, Seq.empty))))
    }

    // ---- has_shapefile (the reference's mutable flag, set-based)
    val flagged = (geojsonWritten ++ csvIdentifiers ++ windfarmIdents ++
      copyIdents ++ spainIdents ++ wespasIdents).toSeq.distinct
    val out = combined.withColumn("has_shapefile",
      col("identifier").isin(flagged: _*))

    // ---- 7. missing report + empty files (index.Rmd:566-587, F3 + G9)
    val missing = out.filter(!col("has_shapefile"))
      .select(col("name"), col("identifier"), col("url"))
      .orderBy(col("identifier"))
    missing.select(col("identifier")).collect().foreach(r =>
      writeFeatures(outDir, r.getString(0), Seq.empty))

    Result(out, missing, geojsonWritten.toSeq.sorted)
  }

  /** GeoJSON document → per-feature (wkt, type); FeatureCollections
    * yield every feature (reference `geojson_sf`, index.Rmd:407-408).
    */
  def geojsonFeatures(geojson: String): Seq[(String, String)] = {
    import GeoFunctions.ujsonLite._
    if (geojson == null || geojson.trim.isEmpty || geojson.trim == "null") return Nil
    try {
      val v = GeoFunctions.ujsonLite.parse(geojson)
      val geoms: Seq[Value] = v match {
        case Obj(m) if m.get("type").contains(Str("FeatureCollection")) =>
          m.get("features") match {
            case Some(Arr(fs)) => fs.collect { case Obj(fm) if fm.contains("geometry") => fm("geometry") }
            case _ => Nil
          }
        case Obj(m) if m.get("type").contains(Str("Feature")) => Seq(m("geometry"))
        case o => Seq(o)
      }
      geoms.flatMap {
        case Obj(m) => (m.get("type"), m.get("coordinates")) match {
          case (Some(Str(t)), Some(_)) =>
            val json = renderGeom(m)
            Option(GeoFunctions.geojsonToWktStr(json)).map(w => (w, t))
          case _ => None
        }
        case _ => None
      }
    } catch { case _: Exception => Nil }
  }

  /** Re-serialize a parsed geometry object minimally for WKT conversion. */
  private def renderGeom(m: Map[String, GeoFunctions.ujsonLite.Value]): String = {
    import GeoFunctions.ujsonLite._
    def render(v: Value): String = v match {
      case Num(d) => if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
      case Str(s) => "\"" + s + "\""
      case Arr(xs) => xs.map(render).mkString("[", ",", "]")
      case Obj(o) => o.map { case (k, x) => "\"" + k + "\":" + render(x) }.mkString("{", ",", "}")
      case NullV => "null"
    }
    val t = m("type") match { case Str(s) => s; case _ => "" }
    s"""{"type":"$t","coordinates":${render(m("coordinates"))}}"""
  }

  /** Per-dataset sink: the reference's actual artifact is the shapefile
    * bundle `{identifier}/{identifier}.shp` (index.Rmd:410-411 etc.);
    * the GeoJSON FeatureCollection is written alongside as the
    * open-standard mirror (both driver-side — config-scale layers).
    */
  private def writeFeatures(outDir: String, identifier: String,
                            feats: Seq[(String, Seq[(String, String)])]): Unit = {
    GeoJsonSink.writeFeatureCollection(outDir, identifier, feats)
    val fields = feats.flatMap(_._2.map(_._1)).distinct
    val rows = feats.map { case (w, props) =>
      val m = props.toMap
      (w, fields.map(f => m.get(f).orNull))
    }
    graft.io.ShapefileWriter.write(s"$outDir/$identifier", identifier, fields, rows)
  }

  private def listShapefiles(dir: java.io.File): Seq[java.io.File] = {
    if (!dir.exists()) return Nil
    val (dirs, files) = dir.listFiles().toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".shp")).sortBy(_.getName) ++
      dirs.sortBy(_.getName).flatMap(listShapefiles)
  }
}
