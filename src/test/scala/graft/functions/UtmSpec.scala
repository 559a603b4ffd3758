package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** G7 — the hand-rolled UTM zone 30N inverse (GeoFunctions.utm30nToLonLat)
  * verified two independent ways, no projection library needed:
  *
  *  1. exact anchors: (500000, 0) is the central meridian at the
  *     equator → (-3°, 0°) by definition of the projection;
  *  2. round-trip against an INDEPENDENT forward Transverse Mercator
  *     implemented here from Snyder's "Map Projections — A Working
  *     Manual" (USGS PP 1395, eq. 8-9..8-15, public domain). A
  *     transposed series coefficient in the inverse cannot cancel
  *     against a separately-derived forward, so <1e-7° agreement over
  *     the zone pins both.
  */
class UtmSpec extends AnyFunSuite {

  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val K0 = 0.9996
  private val E2 = F * (2 - F)
  private val Ep2 = E2 / (1 - E2)
  private val Lon0 = math.toRadians(-3.0)

  /** Snyder forward TM: (lon, lat) degrees → (easting, northing). */
  private def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = math.tan(lat)
    val n = A / math.sqrt(1 - E2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = Ep2 * cosLat * cosLat
    val a = cosLat * (lon - Lon0)
    // meridian arc (Snyder 3-21)
    val m = A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * math.pow(E2, 3) / 256) * lat -
      (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * math.pow(E2, 3) / 1024) * math.sin(2 * lat) +
      (15 * E2 * E2 / 256 + 45 * math.pow(E2, 3) / 1024) * math.sin(4 * lat) -
      (35 * math.pow(E2, 3) / 3072) * math.sin(6 * lat))
    val easting = K0 * n * (a + (1 - t + c) * math.pow(a, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * math.pow(a, 5) / 120) + 500000.0
    val northing = K0 * (m + n * tanLat * (a * a / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(a, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * math.pow(a, 6) / 720))
    (easting, northing)
  }

  test("exact anchor: central meridian at the equator → (-3, 0)") {
    val (lon, lat) = GeoFunctions.utm30nToLonLat(500000.0, 0.0)
    assert(math.abs(lon - (-3.0)) < 1e-9, s"lon $lon")
    assert(math.abs(lat) < 1e-9, s"lat $lat")
  }

  test("central meridian: easting 500000 → lon exactly -3 at any northing") {
    Seq(1000000.0, 3000000.0, 5000000.0, 7000000.0).foreach { n =>
      val (lon, _) = GeoFunctions.utm30nToLonLat(500000.0, n)
      assert(math.abs(lon - (-3.0)) < 1e-9, s"northing $n → lon $lon")
    }
  }

  test("round-trip vs independent Snyder forward: <1e-7 deg inside zone 30N") {
    // inside the zone's nominal ±3° of the central meridian the
    // truncated series agree to ~1 mm; the fringe test below covers
    // out-of-zone usage
    for (lonDeg <- Seq(-6.0, -5.0, -4.0, -3.0, -2.0, -1.0, 0.0);
         latDeg <- Seq(0.5, 10.0, 25.0, 36.0, 43.3, 55.0, 66.0, 72.0)) {
      val (e, n) = forward(lonDeg, latDeg)
      val (lonBack, latBack) = GeoFunctions.utm30nToLonLat(e, n)
      assert(math.abs(lonBack - lonDeg) < 1e-7,
        s"($lonDeg,$latDeg): lon back $lonBack")
      assert(math.abs(latBack - latDeg) < 1e-7,
        s"($lonDeg,$latDeg): lat back $latBack")
    }
  }

  test("round-trip stays <5e-7 deg (≈5 cm) out to ±5° from the meridian") {
    for (lonDeg <- Seq(-8.0, 2.0); latDeg <- Seq(10.0, 36.0, 55.0)) {
      val (e, n) = forward(lonDeg, latDeg)
      val (lonBack, latBack) = GeoFunctions.utm30nToLonLat(e, n)
      assert(math.abs(lonBack - lonDeg) < 5e-7, s"($lonDeg,$latDeg): $lonBack")
      assert(math.abs(latBack - latDeg) < 5e-7, s"($lonDeg,$latDeg): $latBack")
    }
  }

  test("Basque TSV sample point lands on the Gipuzkoa coast") {
    // (597007, 4805570) is the first station of the Spain TSV
    val (lon, lat) = GeoFunctions.utm30nToLonLat(597007.0, 4805570.0)
    assert(lon > -1.9 && lon < -1.7, s"lon $lon")
    assert(lat > 43.3 && lat < 43.5, s"lat $lat")
  }
}
