package graft.grid

/** Map projections — pure closed-form math, the subset of the reference's
  * PROJ4-backed families (mims_spatl_proj.c:109-570; family table
  * SA_ch03_vector.md:406-582) that the pipelines exercise: geographic
  * (lat-lon), Lambert conformal conic (the CMAQ workhorse), Mercator and
  * UTM/transverse Mercator. Spherical forms (radius 6370997 m, the
  * reference's default sphere ellipsoid) — adequate because surrogate ratios
  * are invariant to the ellipsoid as long as both layers use the same CRS.
  */
sealed trait Proj {
  /** lon/lat degrees → projected x/y meters */
  def forward(lon: Double, lat: Double): (Double, Double)
  /** projected x/y meters → lon/lat degrees */
  def inverse(x: Double, y: Double): (Double, Double)
  def name: String
}

object Proj {
  val R = 6370997.0 // reference default sphere

  case object LatLon extends Proj {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
    val name = "latlon"
  }

  /** Lambert conformal conic, 2 standard parallels, spherical
    * (Snyder 1987 eq. 15-1..15-5; matches PROJ +proj=lcc +R=6370997). */
  final case class Lcc(lat1: Double, lat2: Double, lat0: Double, lon0: Double)
      extends Proj {
    private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val n =
      if (lat1 == lat2) math.sin(p1)
      else math.log(math.cos(p1) / math.cos(p2)) /
           math.log(math.tan(math.Pi / 4 + p2 / 2) / math.tan(math.Pi / 4 + p1 / 2))
    private val F = math.cos(p1) * math.pow(math.tan(math.Pi / 4 + p1 / 2), n) / n
    private val rho0 = R * F / math.pow(math.tan(math.Pi / 4 + p0 / 2), n)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val rho = R * F / math.pow(math.tan(math.Pi / 4 + phi / 2), n)
      val th = n * (math.toRadians(lon) - l0)
      (rho * math.sin(th), rho0 - rho * math.cos(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val rho = math.signum(n) * math.sqrt(x * x + (rho0 - y) * (rho0 - y))
      val th = math.atan2(x, rho0 - y)
      val phi = 2 * math.atan(math.pow(R * F / rho, 1 / n)) - math.Pi / 2
      (math.toDegrees(l0 + th / n), math.toDegrees(phi))
    }
    val name = "lcc"
  }

  /** Spherical Mercator about lon0. */
  final case class Mercator(lon0: Double) extends Proj {
    private val l0 = math.toRadians(lon0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val x = R * (math.toRadians(lon) - l0)
      val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(l0 + x / R)
      val lat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
      (lon, lat)
    }
    val name = "merc"
  }

  /** Spherical transverse Mercator (UTM when lon0 = zone central meridian,
    * k0=0.9996, x offset 500000). */
  final case class Tmerc(lon0: Double, k0: Double = 0.9996,
                         x0: Double = 500000.0, y0: Double = 0.0) extends Proj {
    private val l0 = math.toRadians(lon0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon) - l0
      val b = math.cos(phi) * math.sin(dl)
      val x = R * k0 / 2 * math.log((1 + b) / (1 - b)) + x0
      val y = R * k0 * (math.atan2(math.tan(phi), math.cos(dl)) - 0.0) + y0
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = (x - x0) / (R * k0)
      val yn = (y - y0) / (R * k0)
      val lat = math.asin(math.sin(yn) / math.cosh(xn))
      val lon = l0 + math.atan2(math.sinh(xn), math.cos(yn))
      (math.toDegrees(lon), math.toDegrees(lat))
    }
    val name = "tmerc"
  }

  def utmZone(zone: Int): Tmerc = Tmerc(-183.0 + 6.0 * zone)

  /** CONVERT_SHAPE semantics: reproject every vertex (mims_spatl_proj.c:363,570). */
  def reprojectRing(ring: Array[Double], from: Proj, to: Proj): Array[Double] = {
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < ring.length - 1) {
      val (lon, lat) = from.inverse(ring(i), ring(i + 1))
      val (x, y) = to.forward(lon, lat)
      out(i) = x; out(i + 1) = y
      i += 2
    }
    out
  }

  /** MAX_LINE_SEG densification before reprojection (SA_ch03_vector.md:244,
    * 877-883): split segments longer than maxSeg so curvature is captured. */
  def densify(line: Array[Double], maxSeg: Double): Array[Double] = {
    if (line.length < 4) return line
    val out = new scala.collection.mutable.ArrayBuilder.ofDouble
    var i = 0
    while (i < line.length - 3) {
      val x1 = line(i); val y1 = line(i + 1)
      val x2 = line(i + 2); val y2 = line(i + 3)
      out += x1; out += y1
      val len = math.hypot(x2 - x1, y2 - y1)
      if (len > maxSeg) {
        val k = math.ceil(len / maxSeg).toInt
        var j = 1
        while (j < k) {
          out += x1 + (x2 - x1) * j / k
          out += y1 + (y2 - y1) * j / k
          j += 1
        }
      }
      i += 2
    }
    out += line(line.length - 2); out += line(line.length - 1)
    out.result()
  }
}
