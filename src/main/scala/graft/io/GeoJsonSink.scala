package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Geometry sink (K1 substitute, SURVEY §2.2): the reference writes one
  * shapefile directory per dataset (`write_sf(output/{identifier}/
  * {identifier}.shp)`, notebooks/index.Rmd:410-411 and six more call
  * sites); offline we emit the open-standard equivalent — one GeoJSON
  * FeatureCollection per identifier at
  * `outDir/{identifier}/{identifier}.geojson`.
  *
  * Two write paths:
  *  - [[writeFeatureCollection]]: driver-side, for the reference's
  *    config-scale layers (hundreds to tens of thousands of points);
  *  - [[writePartitioned]]: the 100-TB shape — a distributed
  *    `partitionBy(identifier)` JSONL write of Feature documents, one
  *    directory per identifier, no driver materialization.
  */
object GeoJsonSink {

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** One GeoJSON Feature document from a WKT geometry + properties. */
  def feature(wkt: String, props: Seq[(String, String)]): String = {
    val geom = Option(wkt).map(GeoFunctions.wktToGeoJsonStr).orNull
    val propsJson = props.map { case (k, v) =>
      s""""${escape(k)}":${if (v == null) "null" else s""""${escape(v)}""""}"""
    }.mkString("{", ",", "}")
    s"""{"type":"Feature","geometry":${if (geom == null) "null" else geom},"properties":$propsJson}"""
  }

  /** Driver-side FeatureCollection write: one
    * `outDir/{identifier}/{identifier}.geojson` document from
    * (wkt, properties) pairs. Empty `feats` → an empty FeatureCollection
    * (reference G9, notebooks/index.Rmd:584-585).
    */
  def writeFeatureCollection(outDir: String, identifier: String,
                             feats: Seq[(String, Seq[(String, String)])]): Unit = {
    val dir = Paths.get(outDir, identifier)
    Files.createDirectories(dir)
    val json = s"""{"type":"FeatureCollection","features":[${
      feats.map { case (w, props) => feature(w, props) }.mkString(",")}]}"""
    Files.writeString(dir.resolve(s"$identifier.geojson"), json)
  }

  /** Distributed per-identifier write: Feature JSONL partitioned by
    * identifier — the scale path for billions of features.
    */
  def writePartitioned(df: DataFrame, idCol: String, wktCol: String,
                       outDir: String): Unit = {
    val props = df.columns.filterNot(c => c == idCol || c == wktCol)
    val propPairs = props.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(col(idCol),
        concat(lit("""{"type":"Feature","geometry":"""),
          coalesce(GeoFunctions.wktToGeoJson(col(wktCol)), lit("null")),
          lit(""","properties":"""),
          to_json(map(propPairs.toIndexedSeq: _*)),
          lit("}")).as("feature"))
      .write.mode("overwrite").partitionBy(idCol).text(outDir)
  }
}
