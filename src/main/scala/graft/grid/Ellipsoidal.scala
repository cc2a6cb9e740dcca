package graft.grid

/** Ellipsoidal projection support — the reference reprojects real-world
  * shapefiles through PROJ with per-layer ellipsoids (catalog column
  * `"+a=…,+b=…"`, mims_spatl_proj.c:109-360; the docs list ~40 ellipsoids,
  * SA_ch03_vector.md:466-582). GRIDDESC grids stay spherical (the I/O API
  * assumes a sphere), so the ellipsoidal forms matter on the INPUT side:
  * NAD83/GRS80 state-plane LCC and WGS84/Clarke-1866 UTM layers.
  *
  * Forms are Snyder 1987 closed series: LCC eq. 15-1..15-11, Transverse
  * Mercator eq. 8-9..8-25 (the standard UTM series). Correctness gates
  * (no PROJ exists in this environment to diff against): forward∘inverse
  * roundtrips at 1e-9°, sphere-limit equivalence with the exact spherical
  * forms, conformality of LCC (equal meridian/parallel scale), and the
  * meridian-arc series checked against direct numerical integration.
  */
final case class Ellipsoid(a: Double, b: Double) {
  val f: Double = (a - b) / a
  val e2: Double = f * (2.0 - f)
  val e: Double = math.sqrt(e2)
  def isSphere: Boolean = a == b
}

object Ellipsoid {
  val Sphere = Ellipsoid(6370997.0, 6370997.0) // the reference default
  val GRS80 = Ellipsoid(6378137.0, 6378137.0 * (1.0 - 1.0 / 298.257222101))
  val WGS84 = Ellipsoid(6378137.0, 6378137.0 * (1.0 - 1.0 / 298.257223563))
  val Clarke1866 = Ellipsoid(6378206.4, 6356583.8)

  val byName: Map[String, Ellipsoid] = Map(
    "sphere" -> Sphere, "GRS80" -> GRS80, "WGS84" -> WGS84,
    "clrk66" -> Clarke1866)
}

object Ellipsoidal {

  /** Lambert conformal conic, 2SP, ellipsoidal (Snyder 15-1..15-11). */
  final case class LccE(lat1: Double, lat2: Double, lat0: Double, lon0: Double,
                        ell: Ellipsoid, x0: Double = 0.0, y0: Double = 0.0)
      extends Proj {
    private val E = ell.e
    private def m(phi: Double): Double =
      math.cos(phi) / math.sqrt(1.0 - ell.e2 * math.sin(phi) * math.sin(phi))
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1.0 - E * math.sin(phi)) / (1.0 + E * math.sin(phi)), E / 2)
    private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val n =
      if (lat1 == lat2) math.sin(p1)
      else math.log(m(p1) / m(p2)) / math.log(tOf(p1) / tOf(p2))
    private val F = m(p1) / (n * math.pow(tOf(p1), n))
    private def rho(phi: Double): Double = ell.a * F * math.pow(tOf(phi), n)
    private val rho0 = rho(p0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val r = rho(math.toRadians(lat))
      val th = n * (math.toRadians(lon) - l0)
      (r * math.sin(th) + x0, rho0 - r * math.cos(th) + y0)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = x - x0; val yn = y - y0
      val r = math.signum(n) * math.sqrt(xn * xn + (rho0 - yn) * (rho0 - yn))
      val th = math.atan2(xn * math.signum(n), (rho0 - yn) * math.signum(n))
      val t = math.pow(r / (ell.a * F), 1.0 / n)
      // iterate phi = pi/2 - 2 atan(t * ((1-e sin phi)/(1+e sin phi))^(e/2))
      var phi = math.Pi / 2 - 2.0 * math.atan(t)
      var i = 0
      while (i < 15) {
        val es = E * math.sin(phi)
        phi = math.Pi / 2 - 2.0 * math.atan(
          t * math.pow((1.0 - es) / (1.0 + es), E / 2))
        i += 1
      }
      (Proj.normLon(math.toDegrees(l0 + th / n)), math.toDegrees(phi))
    }
    val name = "lcc_e"
  }

  /** Meridian arc length from the equator (Snyder 3-21). */
  def meridianArc(phi: Double, ell: Ellipsoid): Double = {
    val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2
    ell.a * ((1.0 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
      (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
      (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
      (35 * e6 / 3072) * math.sin(6 * phi))
  }

  /** Transverse Mercator, ellipsoidal (Snyder 8-9..8-25 — the UTM series;
    * valid within ~±10° of the central meridian like UTM itself). */
  final case class TmercE(lon0: Double, ell: Ellipsoid, k0: Double = 0.9996,
                          x0: Double = 500000.0, y0: Double = 0.0,
                          lat0: Double = 0.0) extends Proj {
    private val l0 = math.toRadians(lon0)
    private val ep2 = ell.e2 / (1.0 - ell.e2)
    private val m0 = meridianArc(math.toRadians(lat0), ell)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val nN = ell.a / math.sqrt(1.0 - ell.e2 * sinP * sinP)
      val tT = tanP * tanP
      val cC = ep2 * cosP * cosP
      val aA = (math.toRadians(lon) - l0) * cosP
      val a2 = aA * aA; val a3 = a2 * aA; val a4 = a2 * a2
      val a5 = a4 * aA; val a6 = a4 * a2
      val x = k0 * nN * (aA + (1 - tT + cC) * a3 / 6 +
        (5 - 18 * tT + tT * tT + 72 * cC - 58 * ep2) * a5 / 120) + x0
      val y = k0 * (meridianArc(phi, ell) - m0 + nN * tanP * (a2 / 2 +
        (5 - tT + 9 * cC + 4 * cC * cC) * a4 / 24 +
        (61 - 58 * tT + tT * tT + 600 * cC - 330 * ep2) * a6 / 720)) + y0
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val mM = m0 + (y - y0) / k0
      val e2 = ell.e2
      val mu = mM / (ell.a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val e12 = e1 * e1; val e13 = e12 * e1; val e14 = e12 * e12
      val phi1 = mu + (3 * e1 / 2 - 27 * e13 / 32) * math.sin(2 * mu) +
        (21 * e12 / 16 - 55 * e14 / 32) * math.sin(4 * mu) +
        (151 * e13 / 96) * math.sin(6 * mu) +
        (1097 * e14 / 512) * math.sin(8 * mu)
      val sin1 = math.sin(phi1); val cos1 = math.cos(phi1); val tan1 = math.tan(phi1)
      val c1 = ep2 * cos1 * cos1
      val t1 = tan1 * tan1
      val n1 = ell.a / math.sqrt(1 - e2 * sin1 * sin1)
      val r1 = ell.a * (1 - e2) / math.pow(1 - e2 * sin1 * sin1, 1.5)
      val d = (x - x0) / (n1 * k0)
      val d2 = d * d; val d3 = d2 * d; val d4 = d2 * d2
      val d5 = d4 * d; val d6 = d4 * d2
      val phi = phi1 - (n1 * tan1 / r1) * (d2 / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d6 / 720)
      val lam = l0 + (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d5 / 120) / cos1
      (Proj.normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }
    val name = "tmerc_e"
  }

  def utmZoneE(zone: Int, ell: Ellipsoid): TmercE =
    TmercE(-183.0 + 6.0 * zone, ell)
}
