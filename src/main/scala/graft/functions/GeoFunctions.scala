package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial functions (SURVEY §2.9). Offline constraint: no Sedona jar, so
  * geometries travel as WKT/GeoJSON `StringType` columns (SURVEY §1) and
  * these functions implement the minimal conversions the reference
  * exercises: GeoJSON↔WKT for Point/MultiPoint/LineString/Polygon/
  * MultiPolygon (+FeatureCollection unwrap), WKT point construction,
  * geometry-type sniffing, and the UTM zone 30N → WGS84 inverse
  * transform (reference `st_transform(32630, 4326)`,
  * notebooks/index.Rmd:533).
  */
object GeoFunctions {

  /** WKT POINT from lon/lat columns; either null → "POINT EMPTY"
    * (reference notebooks/index.Rmd:285). */
  def wktPoint(lon: Column, lat: Column): Column =
    when(lon.isNull || lat.isNull, lit("POINT EMPTY"))
      .otherwise(concat(lit("POINT ("), lon.cast("string"), lit(" "),
        lat.cast("string"), lit(")")))

  /** Geometry type of a GeoJSON document (reference `st_geometry_type`
    * gate, notebooks/index.Rmd:409): the top-level `type`, or for a
    * FeatureCollection the type of the first feature's geometry. */
  def geojsonType(c: Column): Column = {
    val top = get_json_object(c, "$.type")
    when(top === "FeatureCollection",
      get_json_object(c, "$.features[0].geometry.type")).otherwise(top)
  }

  // ------------------------------------------------------------------
  // GeoJSON → WKT (minimal, reference-exercised geometry types only)

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def posWkt(coords: Seq[Double]): String = coords.map(fmt).mkString(" ")

  private def parseGeom(typ: String, coords: ujsonLite.Value): String = typ match {
    case "Point" =>
      s"POINT (${posWkt(coords.asPositions)})"
    case "MultiPoint" =>
      s"MULTIPOINT (${coords.asPosList.map(p => s"(${posWkt(p)})").mkString(", ")})"
    case "LineString" =>
      s"LINESTRING (${coords.asPosList.map(posWkt).mkString(", ")})"
    case "Polygon" =>
      s"POLYGON (${coords.asRings.map(r => s"(${r.map(posWkt).mkString(", ")})").mkString(", ")})"
    case "MultiPolygon" =>
      s"MULTIPOLYGON (${coords.asPolys.map(p =>
        s"(${p.map(r => s"(${r.map(posWkt).mkString(", ")})").mkString(", ")})").mkString(", ")})"
    case other => s"GEOMETRYCOLLECTION EMPTY"
  }

  /** Tiny recursive-descent JSON reader for the GeoJSON subset — arrays,
    * objects, numbers, strings. Zero dependencies by design (offline
    * build); not a general JSON parser.
    */
  private[graft] object ujsonLite {
    sealed trait Value {
      def asPositions: Seq[Double] = this match {
        case Arr(xs) => xs.collect { case Num(d) => d }
        case _ => Nil
      }
      def asPosList: Seq[Seq[Double]] = this match {
        case Arr(xs) => xs.map(_.asPositions)
        case _ => Nil
      }
      def asRings: Seq[Seq[Seq[Double]]] = this match {
        case Arr(xs) => xs.map(_.asPosList)
        case _ => Nil
      }
      def asPolys: Seq[Seq[Seq[Seq[Double]]]] = this match {
        case Arr(xs) => xs.map(_.asRings)
        case _ => Nil
      }
    }
    case class Num(v: Double) extends Value
    case class Str(v: String) extends Value
    case class Arr(v: List[Value]) extends Value
    case class Obj(v: Map[String, Value]) extends Value
    case object NullV extends Value

    def parse(s: String): Value = new P(s).value()

    private class P(s: String) {
      private var i = 0
      private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def value(): Value = {
        ws()
        s.charAt(i) match {
          case '{' => obj()
          case '[' => arr()
          case '"' => Str(str())
          case 't' => i += 4; Num(1)
          case 'f' => i += 5; Num(0)
          case 'n' => i += 4; NullV
          case _ => num()
        }
      }
      private def obj(): Obj = {
        i += 1; ws()
        val b = Map.newBuilder[String, Value]
        if (s.charAt(i) == '}') { i += 1; return Obj(b.result()) }
        while (true) {
          ws(); val k = str(); ws(); i += 1 // ':'
          b += (k -> value()); ws()
          if (s.charAt(i) == ',') { i += 1 }
          else { i += 1; return Obj(b.result()) } // '}'
        }
        Obj(b.result())
      }
      private def arr(): Arr = {
        i += 1; ws()
        val b = List.newBuilder[Value]
        if (s.charAt(i) == ']') { i += 1; return Arr(b.result()) }
        while (true) {
          b += value(); ws()
          if (s.charAt(i) == ',') { i += 1 }
          else { i += 1; return Arr(b.result()) } // ']'
        }
        Arr(b.result())
      }
      private def str(): String = {
        i += 1
        val sb = new StringBuilder
        while (s.charAt(i) != '"') {
          if (s.charAt(i) == '\\') {
            i += 1
            s.charAt(i) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
              case c => sb.append(c)
            }
          } else sb.append(s.charAt(i))
          i += 1
        }
        i += 1
        sb.toString
      }
      private def num(): Num = {
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
        Num(s.substring(start, i).toDouble)
      }
    }
  }

  /** GeoJSON → WKT (reference `geojson_sf`, notebooks/index.Rmd:408).
    * FeatureCollections take the first feature's geometry (the
    * reference's single-type gate G6 has already filtered mixed ones).
    */
  def geojsonToWktStr(geojson: String): String = {
    if (geojson == null || geojson.trim.isEmpty || geojson.trim == "null") return null
    try {
      val v = ujsonLite.parse(geojson) match {
        case o @ ujsonLite.Obj(m) if m.get("type").contains(ujsonLite.Str("FeatureCollection")) =>
          m("features") match {
            case ujsonLite.Arr(f :: _) => f match {
              case ujsonLite.Obj(fm) => fm("geometry")
              case _ => return null
            }
            case _ => return null
          }
        case o @ ujsonLite.Obj(m) if m.get("type").contains(ujsonLite.Str("Feature")) =>
          m("geometry")
        case o => o
      }
      v match {
        case ujsonLite.Obj(m) =>
          (m.get("type"), m.get("coordinates")) match {
            case (Some(ujsonLite.Str(t)), Some(c)) => parseGeom(t, c)
            case _ => null
          }
        case _ => null
      }
    } catch { case _: Exception => null }
  }

  private val geojsonToWktUdf = udf(geojsonToWktStr _)
  def geojsonToWkt(c: Column): Column = geojsonToWktUdf(c)

  // ------------------------------------------------------------------
  // WKT → GeoJSON (reference `sfc_geojson`, notebooks/index.Rmd:332, and
  // the geometry sink's serialization). Handles every type the pipeline
  // produces: POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON,
  // MULTIPOLYGON, plus EMPTY variants. Coordinate lexemes are carried
  // through verbatim (no parse→print float churn).

  private sealed trait W
  private case class WPair(json: String) extends W
  private case class WList(items: Seq[W]) extends W

  // FORMAT whitespace (WKT/JSON grammar separators), deliberately NOT
  // Kernels.isRegexWs: the r17 tokenizer contract governs document-text
  // tokenization against string_split_regex oracles; no oracle ever
  // tokenizes WKT/GeoJSON text, whose inputs are this engine's own
  // writers plus the reference's ASCII files. isWhitespace is the
  // lenient superset parse.
  private def parseWkt(s: String, start: Int): (W, Int) = {
    var i = start
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (s.charAt(i) == '(') {
      i += 1
      val items = Seq.newBuilder[W]
      var done = false
      while (!done) {
        val (item, next) = parseWkt(s, i)
        items += item
        i = next
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { if (i < s.length && s.charAt(i) == ')') i += 1; done = true }
      }
      (WList(items.result()), i)
    } else {
      val from = i
      while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != ')') i += 1
      // WKT-grammar whitespace (our writers emit single spaces) — not
      // the text-tokenizer contract (graft.plans.Kernels.isRegexWs)
      val nums = s.substring(from, i).trim.split("\\s+")
      (WPair(s"[${nums.mkString(",")}]"), i)
    }
  }

  private def renderPairs(w: W): String = w match {
    case WPair(j) => j
    case WList(Seq(p: WPair)) => p.json // "((x y))" nesting
    case WList(items) => items.map(renderPairs).mkString("[", ",", "]")
  }

  /** General WKT → GeoJSON; null/unparseable → null. */
  def wktToGeoJsonStr(wkt: String): String = {
    if (wkt == null) return null
    val t = wkt.trim
    if (t.isEmpty) return null
    try {
      val sp = t.indexWhere(c => c == '(' || c.isWhitespace)
      val typ = (if (sp < 0) t else t.substring(0, sp)).toUpperCase(java.util.Locale.ROOT)
      val rest = if (sp < 0) "" else t.substring(sp).trim
      val gjType = typ match {
        case "POINT" => "Point"
        case "MULTIPOINT" => "MultiPoint"
        case "LINESTRING" => "LineString"
        case "MULTILINESTRING" => "MultiLineString"
        case "POLYGON" => "Polygon"
        case "MULTIPOLYGON" => "MultiPolygon"
        case "GEOMETRYCOLLECTION" =>
          return if (rest == "EMPTY" || rest.isEmpty)
            """{"type":"GeometryCollection","geometries":[]}"""
          else null // nested collections: out of the reference's scope
        case _ => return null
      }
      if (rest == "EMPTY" || rest.isEmpty)
        return s"""{"type":"$gjType","coordinates":[]}"""
      val (tree, _) = parseWkt(rest, 0)
      val coords = (gjType, tree) match {
        case ("Point", WList(Seq(p: WPair))) => p.json
        case ("MultiPoint", WList(items)) =>
          // both "MULTIPOINT ((1 2), (3 4))" and "MULTIPOINT (1 2, 3 4)"
          items.map(renderPairs).mkString("[", ",", "]")
        case ("LineString", WList(items)) =>
          items.map(renderPairs).mkString("[", ",", "]")
        case (_, w) => renderPairs(w)
      }
      s"""{"type":"$gjType","coordinates":$coords}"""
    } catch { case _: Exception => null }
  }

  private val wktToGeoJsonUdf = udf(wktToGeoJsonStr _)
  def wktToGeoJson(c: Column): Column = wktToGeoJsonUdf(c)

  // ------------------------------------------------------------------
  // UTM zone 30N (EPSG:32630) → WGS84 lon/lat — closed-form inverse
  // Transverse Mercator (Karney-style series, WGS84 ellipsoid). Public
  // formulae; accurate to << 1 cm over the zone.

  private val A = 6378137.0 // semi-major
  private val F = 1.0 / 298.257223563
  private val K0 = 0.9996
  private val E2 = F * (2 - F)
  private val Ep = E2 / (1 - E2)
  private val Lon0 = math.toRadians(-3.0) // zone 30N central meridian

  /** Inverse UTM 30N: (easting, northing) → (lon, lat) degrees.
    * Standard USGS/Snyder series expansion (public domain formulae).
    */
  def utm30nToLonLat(easting: Double, northing: Double): (Double, Double) = {
    val x = easting - 500000.0
    val y = northing
    val m = y / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = sin1 / cos1
    val c1 = Ep * cos1 * cos1
    val t1 = tan1 * tan1
    val n1 = A / math.sqrt(1 - E2 * sin1 * sin1)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sin1 * sin1, 1.5)
    val d = x / (n1 * K0)
    val lat = phi1 - (n1 * tan1 / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lon = Lon0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep + 24 * t1 * t1) * math.pow(d, 5) / 120) / cos1
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  private val utmLonUdf = udf((e: Double, n: Double) => utm30nToLonLat(e, n)._1)
  private val utmLatUdf = udf((e: Double, n: Double) => utm30nToLonLat(e, n)._2)
  def utm30nLon(e: Column, n: Column): Column = utmLonUdf(e, n)
  def utm30nLat(e: Column, n: Column): Column = utmLatUdf(e, n)
}
