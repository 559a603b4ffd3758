package graft.io

import java.io.{DataInputStream, EOFException, FileInputStream, File}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal ESRI Shapefile (.shp + .dbf) reader (reference `read_sf`,
  * notebooks/index.Rmd:473-474,499). Offline constraint: no GDAL/Sedona
  * jars, so this parses the two binary formats directly and emits WKT
  * strings — exactly the geometry types the reference data contains:
  * Point (1), PolyLine (3), Polygon (5), MultiPoint (8), Null (0).
  *
  * Polygon ring grouping follows the shapefile spec: outer rings are
  * clockwise (negative shoelace area), holes counter-clockwise; holes
  * attach to the preceding outer ring. Multiple outers → MULTIPOLYGON.
  *
  * Driver-side source (spatial layers are config-scale); the DataFrame
  * it produces joins distributed plans as a broadcast side. If the .shp
  * is absent but the .dbf exists (the IMMA bundle in the reference data
  * ships without its .shp), attribute rows are returned with null
  * geometry so feature counts remain testable.
  */
object Shapefile {

  case class Feature(attrs: Map[String, String], wkt: String, geomType: String)

  /** (DBF field names in file order, features). */
  def read(shpPath: String): (Seq[String], Seq[Feature]) = {
    val dbfPath = shpPath.replaceAll("\\.shp$", ".dbf")
    val (fieldNames, attrs): (Seq[String], Seq[Map[String, String]]) =
      if (new File(dbfPath).exists()) readDbf(dbfPath) else (Seq.empty, Seq.empty)
    val geoms: Seq[(String, String)] =
      if (new File(shpPath).exists()) readShp(shpPath) else Seq.empty
    val n = math.max(attrs.length, geoms.length)
    val feats = (0 until n).map { i =>
      val (wkt, gt) = if (i < geoms.length) geoms(i) else (null, null)
      Feature(if (i < attrs.length) attrs(i) else Map.empty, wkt, gt)
    }
    (fieldNames, feats)
  }

  /** One row per feature: DBF columns (as strings) + `wkt` + `geom_type`. */
  def toDataFrame(spark: SparkSession, shpPath: String): DataFrame = {
    val (fieldNames, feats) = read(shpPath)
    val schema = StructType(
      fieldNames.map(f => StructField(f, StringType, nullable = true)) ++
        Seq(StructField("wkt", StringType, nullable = true),
          StructField("geom_type", StringType, nullable = true)))
    val rows = feats.map(f => Row.fromSeq(fieldNames.map(f.attrs.get(_).orNull) ++ Seq(f.wkt, f.geomType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  // ------------------------------------------------------------- .shp

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def readShp(path: String): Seq[(String, String)] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val out = Seq.newBuilder[(String, String)]
    var off = 100 // past the 100-byte header
    while (off + 8 <= bytes.length) {
      val contentLen = ByteBuffer.wrap(bytes, off + 4, 4).order(ByteOrder.BIG_ENDIAN).getInt * 2
      val rec = ByteBuffer.wrap(bytes, off + 8, contentLen).order(ByteOrder.LITTLE_ENDIAN)
      out += parseRecord(rec)
      off += 8 + contentLen
    }
    out.result()
  }

  private def parseRecord(b: ByteBuffer): (String, String) = {
    val shapeType = b.getInt
    shapeType match {
      case 0 => (null, null)
      case 1 =>
        val x = b.getDouble; val y = b.getDouble
        (s"POINT (${fmt(x)} ${fmt(y)})", "POINT")
      case 8 =>
        b.position(b.position() + 32) // bbox
        val n = b.getInt
        val pts = (0 until n).map(_ => { val x = b.getDouble; val y = b.getDouble; s"(${fmt(x)} ${fmt(y)})" })
        (s"MULTIPOINT (${pts.mkString(", ")})", "MULTIPOINT")
      case 3 | 5 =>
        b.position(b.position() + 32) // bbox
        val numParts = b.getInt
        val numPoints = b.getInt
        val parts = (0 until numParts).map(_ => b.getInt)
        val pts = (0 until numPoints).map(_ => { val x = b.getDouble; val y = b.getDouble; (x, y) })
        val rings = parts.zipWithIndex.map { case (start, i) =>
          val end = if (i + 1 < numParts) parts(i + 1) else numPoints
          pts.slice(start, end)
        }
        if (shapeType == 3) {
          val ls = rings.map(r => r.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }.mkString(", "))
          if (ls.length == 1) (s"LINESTRING (${ls.head})", "LINESTRING")
          else (s"MULTILINESTRING (${ls.map(l => s"($l)").mkString(", ")})", "MULTILINESTRING")
        } else polygonWkt(rings)
      case other =>
        (null, s"UNSUPPORTED_$other")
    }
  }

  /** Shoelace signed area: > 0 = counter-clockwise (hole per spec). */
  private def signedArea(ring: Seq[(Double, Double)]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      a += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
      i += 1
    }
    a / 2
  }

  private def polygonWkt(rings: Seq[Seq[(Double, Double)]]): (String, String) = {
    def ringStr(r: Seq[(Double, Double)]) =
      "(" + r.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }.mkString(", ") + ")"
    // group: outer (CW, area<=0) starts a polygon; holes attach to it
    val polys = Seq.newBuilder[Seq[Seq[(Double, Double)]]]
    var current: List[Seq[(Double, Double)]] = Nil
    rings.foreach { r =>
      val isHole = signedArea(r) > 0
      if (!isHole) {
        if (current.nonEmpty) polys += current.reverse
        current = List(r)
      } else if (current.nonEmpty) current = r :: current
      else current = List(r) // malformed: hole first — treat as outer
    }
    if (current.nonEmpty) polys += current.reverse
    val ps = polys.result()
    if (ps.length == 1)
      (s"POLYGON (${ps.head.map(ringStr).mkString(", ")})", "POLYGON")
    else
      (s"MULTIPOLYGON (${ps.map(p => s"(${p.map(ringStr).mkString(", ")})").mkString(", ")})", "MULTIPOLYGON")
  }

  // ------------------------------------------------------------- .dbf

  private def readDbf(path: String): (Seq[String], Seq[Map[String, String]]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = b.getInt(4)
    val headerSize = b.getShort(8) & 0xFFFF
    val recSize = b.getShort(10) & 0xFFFF
    val nFields = (headerSize - 33) / 32
    val fields = (0 until nFields).map { i =>
      val off = 32 + i * 32
      val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
      val name = new String(nameBytes, "ISO-8859-1")
      val len = bytes(off + 16) & 0xFF
      (name, len)
    }
    val rows = (0 until nRec).map { r =>
      val recOff = headerSize + r * recSize
      var fieldOff = recOff + 1 // skip deletion flag
      fields.map { case (name, len) =>
        val raw = new String(bytes.slice(fieldOff, fieldOff + len), "UTF-8").trim
        fieldOff += len
        name -> (if (raw.isEmpty) null else raw)
      }.toMap
    }
    (fields.map(_._1), rows)
  }
}
