package graft.functions

/** Closed-form coordinate reprojection for the three CRSs the reference's
  * inference can ever emit — EPSG:4326 (WGS84), EPSG:3857 (Web Mercator),
  * EPSG:27700 (British National Grid) — mirroring the
  * `ST_Transform(..., always_xy := true)` calls it generates
  * (reference: geo_strategy.rs:283-291, 326-340; CRS set: :228-253).
  *
  * No PROJ available offline, so the math is implemented from published
  * public formulas:
  *  - Web Mercator: the spherical-Mercator equations from the EPSG:3857
  *    definition (EPSG guidance note 7-2).
  *  - OSGB36/BNG: Ordnance Survey "A guide to coordinate systems in Great
  *    Britain" (Annexe C): transverse-Mercator forward/inverse on the Airy
  *    1830 ellipsoid plus the published 7-parameter Helmert shift between
  *    WGS84 and OSGB36 (±5 m accuracy, like any single-Helmert solution).
  *
  * Everything here is pure scalar math — safe inside codegen'd expressions
  * and executor-parallel UDFs; no shared state, no allocation beyond the
  * result tuple.
  */
object CrsTransform {

  /** Axis order is always (x=lon/easting, y=lat/northing) — the reference
    * forces `always_xy := true` on every transform. */
  def transform(x: Double, y: Double, srcEpsg: Int, dstEpsg: Int): (Double, Double) = {
    if (srcEpsg == dstEpsg) return (x, y)
    // Route through 4326 — with 3 CRSs this is at most 2 closed-form hops.
    val (lon, lat) = srcEpsg match {
      case 4326  => (x, y)
      case 3857  => webMercatorToLonLat(x, y)
      case 27700 => osgbToLonLat(x, y)
      case other => throw new IllegalArgumentException(s"unsupported source EPSG:$other")
    }
    dstEpsg match {
      case 4326  => (lon, lat)
      case 3857  => lonLatToWebMercator(lon, lat)
      case 27700 => lonLatToOsgb(lon, lat)
      case other => throw new IllegalArgumentException(s"unsupported target EPSG:$other")
    }
  }

  val SupportedEpsg: Set[Int] = Set(4326, 3857, 27700)

  // ---------------------------------------------------------------- 3857

  private val R3857 = 6378137.0 // WGS84 semi-major, spherical Mercator radius

  // per-axis scalar forms — the single source of truth shared by the
  // tuple API below and the codegen'd GeoKernelExpressions (same double
  // operation sequence ⇒ bit-identical results on every path)
  def mercX(lon: Double): Double = R3857 * math.toRadians(lon)
  def mercY(lat: Double): Double =
    R3857 * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0))
  def invMercLon(x: Double): Double = math.toDegrees(x / R3857)
  def invMercLat(y: Double): Double =
    math.toDegrees(2.0 * math.atan(math.exp(y / R3857)) - math.Pi / 2.0)

  def lonLatToWebMercator(lon: Double, lat: Double): (Double, Double) =
    (mercX(lon), mercY(lat))

  def webMercatorToLonLat(x: Double, y: Double): (Double, Double) =
    (invMercLon(x), invMercLat(y))

  // --------------------------------------------------------------- 27700

  // Airy 1830 ellipsoid + National Grid projection constants (OS guide C.1)
  private val AiryA = 6377563.396
  private val AiryB = 6356256.909
  private val F0 = 0.9996012717        // central-meridian scale
  private val Lat0 = math.toRadians(49.0)
  private val Lon0 = math.toRadians(-2.0)
  private val N0 = -100000.0           // northing of true origin
  private val E0 = 400000.0            // easting of true origin

  // WGS84 ellipsoid
  private val WgsA = 6378137.000
  private val WgsB = 6356752.3142

  // Helmert WGS84 → OSGB36 (OS guide, table 3; arc-seconds and ppm)
  private val Tx = -446.448; private val Ty = 125.157; private val Tz = -542.060
  private val RxS = -0.1502; private val RyS = -0.2470; private val RzS = -0.8421
  private val SPpm = 20.4894

  /** Meridian arc M (OS guide C.2, equation C3). */
  private def meridianArc(phi: Double): Double = {
    val n = (AiryA - AiryB) / (AiryA + AiryB)
    val n2 = n * n; val n3 = n2 * n
    val dPhi = phi - Lat0; val sPhi = phi + Lat0
    AiryB * F0 * (
      (1.0 + n + 1.25 * n2 + 1.25 * n3) * dPhi
        - (3.0 * n + 3.0 * n2 + (21.0 / 8.0) * n3) * math.sin(dPhi) * math.cos(sPhi)
        + ((15.0 / 8.0) * (n2 + n3)) * math.sin(2.0 * dPhi) * math.cos(2.0 * sPhi)
        - ((35.0 / 24.0) * n3) * math.sin(3.0 * dPhi) * math.cos(3.0 * sPhi))
  }

  /** Transverse-Mercator forward on Airy 1830 (OS guide C.1/C.2), from
    * OSGB36 geodetic lon/lat (degrees) to easting/northing (meters). */
  private def tmForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val e2 = 1.0 - (AiryB * AiryB) / (AiryA * AiryA)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val nu = AiryA * F0 / math.sqrt(1.0 - e2 * sinP * sinP)
    val rho = AiryA * F0 * (1.0 - e2) * math.pow(1.0 - e2 * sinP * sinP, -1.5)
    val eta2 = nu / rho - 1.0
    val m = meridianArc(phi)
    val I = m + N0
    val II = (nu / 2.0) * sinP * cosP
    val III = (nu / 24.0) * sinP * math.pow(cosP, 3) * (5.0 - tanP * tanP + 9.0 * eta2)
    val IIIA = (nu / 720.0) * sinP * math.pow(cosP, 5) *
      (61.0 - 58.0 * tanP * tanP + math.pow(tanP, 4))
    val IV = nu * cosP
    val V = (nu / 6.0) * math.pow(cosP, 3) * (nu / rho - tanP * tanP)
    val VI = (nu / 120.0) * math.pow(cosP, 5) *
      (5.0 - 18.0 * tanP * tanP + math.pow(tanP, 4) + 14.0 * eta2 - 58.0 * tanP * tanP * eta2)
    val dL = lam - Lon0
    val north = I + II * dL * dL + III * math.pow(dL, 4) + IIIA * math.pow(dL, 6)
    val east = E0 + IV * dL + V * math.pow(dL, 3) + VI * math.pow(dL, 5)
    (east, north)
  }

  /** Transverse-Mercator inverse (OS guide C.2): easting/northing →
    * OSGB36 lon/lat degrees. */
  private def tmInverse(east: Double, north: Double): (Double, Double) = {
    val e2 = 1.0 - (AiryB * AiryB) / (AiryA * AiryA)
    var phi = (north - N0) / (AiryA * F0) + Lat0
    var m = meridianArc(phi)
    var iter = 0
    while (math.abs(north - N0 - m) >= 1e-5 && iter < 20) {
      phi += (north - N0 - m) / (AiryA * F0)
      m = meridianArc(phi)
      iter += 1
    }
    val sinP = math.sin(phi); val tanP = math.tan(phi); val secP = 1.0 / math.cos(phi)
    val nu = AiryA * F0 / math.sqrt(1.0 - e2 * sinP * sinP)
    val rho = AiryA * F0 * (1.0 - e2) * math.pow(1.0 - e2 * sinP * sinP, -1.5)
    val eta2 = nu / rho - 1.0
    val VII = tanP / (2.0 * rho * nu)
    val VIII = tanP / (24.0 * rho * math.pow(nu, 3)) *
      (5.0 + 3.0 * tanP * tanP + eta2 - 9.0 * tanP * tanP * eta2)
    val IX = tanP / (720.0 * rho * math.pow(nu, 5)) *
      (61.0 + 90.0 * tanP * tanP + 45.0 * math.pow(tanP, 4))
    val X = secP / nu
    val XI = secP / (6.0 * math.pow(nu, 3)) * (nu / rho + 2.0 * tanP * tanP)
    val XII = secP / (120.0 * math.pow(nu, 5)) * (5.0 + 28.0 * tanP * tanP + 24.0 * math.pow(tanP, 4))
    val XIIA = secP / (5040.0 * math.pow(nu, 7)) *
      (61.0 + 662.0 * tanP * tanP + 1320.0 * math.pow(tanP, 4) + 720.0 * math.pow(tanP, 6))
    val dE = east - E0
    val latR = phi - VII * dE * dE + VIII * math.pow(dE, 4) - IX * math.pow(dE, 6)
    val lonR = Lon0 + X * dE - XI * math.pow(dE, 3) + XII * math.pow(dE, 5) - XIIA * math.pow(dE, 7)
    (math.toDegrees(lonR), math.toDegrees(latR))
  }

  /** Geodetic → geocentric cartesian (OS guide B.1). */
  private def toCartesian(lonDeg: Double, latDeg: Double, a: Double, b: Double): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val e2 = 1.0 - (b * b) / (a * a)
    val sinP = math.sin(phi)
    val nu = a / math.sqrt(1.0 - e2 * sinP * sinP)
    (nu * math.cos(phi) * math.cos(lam), nu * math.cos(phi) * math.sin(lam), nu * (1.0 - e2) * sinP)
  }

  /** Geocentric cartesian → geodetic (OS guide B.2, iterative). */
  private def toGeodetic(x: Double, y: Double, z: Double, a: Double, b: Double): (Double, Double) = {
    val e2 = 1.0 - (b * b) / (a * a)
    val lam = math.atan2(y, x)
    val p = math.sqrt(x * x + y * y)
    var phi = math.atan2(z, p * (1.0 - e2))
    var iter = 0
    while (iter < 10) {
      val sinP = math.sin(phi)
      val nu = a / math.sqrt(1.0 - e2 * sinP * sinP)
      val next = math.atan2(z + e2 * nu * sinP, p)
      if (math.abs(next - phi) < 1e-12) { phi = next; iter = 10 } else { phi = next; iter += 1 }
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** 7-parameter Helmert (OS guide B.3); `invert` applies the reverse shift. */
  private def helmert(x: Double, y: Double, z: Double, invert: Boolean): (Double, Double, Double) = {
    val sgn = if (invert) -1.0 else 1.0
    val s = sgn * SPpm * 1e-6
    val rx = sgn * math.toRadians(RxS / 3600.0)
    val ry = sgn * math.toRadians(RyS / 3600.0)
    val rz = sgn * math.toRadians(RzS / 3600.0)
    val tx = sgn * Tx; val ty = sgn * Ty; val tz = sgn * Tz
    (tx + (1.0 + s) * x - rz * y + ry * z,
      ty + rz * x + (1.0 + s) * y - rx * z,
      tz - ry * x + rx * y + (1.0 + s) * z)
  }

  /** WGS84 lon/lat (deg) → BNG easting/northing (m). */
  def lonLatToOsgb(lon: Double, lat: Double): (Double, Double) = {
    val (x, y, z) = toCartesian(lon, lat, WgsA, WgsB)
    val (x2, y2, z2) = helmert(x, y, z, invert = false)
    val (lonO, latO) = toGeodetic(x2, y2, z2, AiryA, AiryB)
    tmForward(lonO, latO)
  }

  /** BNG easting/northing (m) → WGS84 lon/lat (deg). */
  def osgbToLonLat(east: Double, north: Double): (Double, Double) = {
    val (lonO, latO) = tmInverse(east, north)
    val (x, y, z) = toCartesian(lonO, latO, AiryA, AiryB)
    val (x2, y2, z2) = helmert(x, y, z, invert = true)
    toGeodetic(x2, y2, z2, WgsA, WgsB)
  }
}
