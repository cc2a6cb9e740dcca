package graft.grid

/** Map projections — pure closed-form math covering ALL 11 of the
  * reference's GRIDDESC families (mims_spatl_proj.c:109-570; family table
  * SA_ch03_vector.md:406-582): geographic (1), Lambert conformal conic (2),
  * Mercator 1SP (3) and 2SP (4), oblique stereographic (5), UTM (6), polar
  * stereographic (7), transverse Mercator (8), Lambert azimuthal equal-area
  * (9), Albers equal-area conic (10), sinusoidal (11). Spherical forms
  * (radius 6370997 m, the I/O API sphere — "the I/O API assumes that the
  * earth's ellipsoid is a sphere", SA_ch03_vector.md:384), Snyder 1987
  * closed forms — adequate because surrogate ratios are invariant to the
  * ellipsoid as long as both layers use the same CRS.
  */
trait Proj { // extended by grid.Ellipsoidal's forms too
  /** lon/lat degrees → projected x/y meters */
  def forward(lon: Double, lat: Double): (Double, Double)
  /** projected x/y meters → lon/lat degrees */
  def inverse(x: Double, y: Double): (Double, Double)
  def name: String
}

object Proj {
  val R = 6370997.0 // reference default sphere

  /** Normalize a longitude into the reference's (-180, 180] convention
    * (SA_ch03_vector.md Table 1: "-180.0 < X,Y <= 180.0"). */
  def normLon(deg: Double): Double = {
    var x = deg % 360.0
    if (x <= -180.0) x += 360.0
    if (x > 180.0) x -= 360.0
    x
  }

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

  /** Spherical Mercator 1SP about lon0 (GRIDDESC type 3: lon_0, k_0, false
    * origin). */
  final case class Mercator(lon0: Double, k0: Double = 1.0,
                            x0: Double = 0.0, y0: Double = 0.0) extends Proj {
    private val l0 = math.toRadians(lon0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val x = R * k0 * (math.toRadians(lon) - l0) + x0
      val y = R * k0 * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)) + y0
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(l0 + (x - x0) / (R * k0))
      val lat = math.toDegrees(2 * math.atan(math.exp((y - y0) / (R * k0))) - math.Pi / 2)
      (lon, lat)
    }
    val name = "merc"
  }

  /** Spherical Mercator 2SP (GRIDDESC type 4): true scale at lat_ts —
    * equivalent to 1SP with k0 = cos(lat_ts) on a sphere (Snyder eq. 7-1). */
  final case class Merc2SP(latTs: Double, lon0: Double,
                           x0: Double = 0.0, y0: Double = 0.0) extends Proj {
    private val inner = Mercator(lon0, math.cos(math.toRadians(latTs)), x0, y0)
    def forward(lon: Double, lat: Double): (Double, Double) = inner.forward(lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = inner.inverse(x, y)
    val name = "merc2sp"
  }

  /** Oblique/equatorial stereographic, spherical (Snyder eq. 21-2..21-4,
    * inverse 20-14..20-15; GRIDDESC type 5: lat_0, lon_0, false origin). */
  final case class Stere(lat0: Double, lon0: Double, k0: Double = 1.0,
                         x0: Double = 0.0, y0: Double = 0.0) extends Proj {
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val sinP0 = math.sin(p0)
    private val cosP0 = math.cos(p0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon) - l0
      val k = 2.0 * k0 / (1.0 + sinP0 * math.sin(phi) + cosP0 * math.cos(phi) * math.cos(dl))
      (R * k * math.cos(phi) * math.sin(dl) + x0,
       R * k * (cosP0 * math.sin(phi) - sinP0 * math.cos(phi) * math.cos(dl)) + y0)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = x - x0; val yn = y - y0
      val rho = math.sqrt(xn * xn + yn * yn)
      if (rho == 0.0) return (math.toDegrees(l0), math.toDegrees(p0))
      val c = 2.0 * math.atan(rho / (2.0 * R * k0))
      val phi = math.asin(math.cos(c) * sinP0 + yn * math.sin(c) * cosP0 / rho)
      val lam = l0 + math.atan2(xn * math.sin(c),
        rho * cosP0 * math.cos(c) - yn * sinP0 * math.sin(c))
      (normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }
    val name = "stere"
  }

  /** Polar stereographic with standard parallel lat_ts, spherical (Snyder
    * eq. 21-7/21-8 with 21-33; GRIDDESC type 7: lat_ts, lon_0, k_0, false
    * origin). lat_ts < 0 selects the south-polar aspect. */
  final case class PolarStere(latTs: Double, lon0: Double, k0: Double = 1.0,
                              x0: Double = 0.0, y0: Double = 0.0) extends Proj {
    private val south = latTs < 0
    private val l0 = math.toRadians(lon0)
    private val pts = math.toRadians(math.abs(latTs))
    // scale at the pole implied by true scale at lat_ts (Snyder 21-33)
    private val kPole = k0 * (1.0 + math.sin(pts)) / 2.0
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(if (south) -lat else lat)
      val dl = math.toRadians(lon) - l0
      val rho = 2.0 * R * kPole * math.tan(math.Pi / 4 - phi / 2)
      val xs = rho * math.sin(dl)
      val ys = -rho * math.cos(dl)
      (xs + x0, (if (south) -ys else ys) + y0)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = x - x0
      val yn = { val v = y - y0; if (south) -v else v }
      val rho = math.sqrt(xn * xn + yn * yn)
      val phi = math.Pi / 2 - 2.0 * math.atan(rho / (2.0 * R * kPole))
      val lam = l0 + math.atan2(xn, -yn)
      (normLon(math.toDegrees(lam)), math.toDegrees(if (south) -phi else phi))
    }
    val name = "polar_stere"
  }

  /** Lambert azimuthal equal-area, oblique spherical (Snyder eq. 24-2..24-4,
    * inverse 20-14..20-15 with 24-16; GRIDDESC type 9: lat_0, lon_0, false
    * origin). */
  final case class Laea(lat0: Double, lon0: Double,
                        x0: Double = 0.0, y0: Double = 0.0) extends Proj {
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val sinP0 = math.sin(p0)
    private val cosP0 = math.cos(p0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon) - l0
      val kp = math.sqrt(2.0 / (1.0 + sinP0 * math.sin(phi) + cosP0 * math.cos(phi) * math.cos(dl)))
      (R * kp * math.cos(phi) * math.sin(dl) + x0,
       R * kp * (cosP0 * math.sin(phi) - sinP0 * math.cos(phi) * math.cos(dl)) + y0)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = x - x0; val yn = y - y0
      val rho = math.sqrt(xn * xn + yn * yn)
      if (rho == 0.0) return (math.toDegrees(l0), math.toDegrees(p0))
      val c = 2.0 * math.asin(rho / (2.0 * R))
      val phi = math.asin(math.cos(c) * sinP0 + yn * math.sin(c) * cosP0 / rho)
      val lam = l0 + math.atan2(xn * math.sin(c),
        rho * cosP0 * math.cos(c) - yn * sinP0 * math.sin(c))
      (normLon(math.toDegrees(lam)), math.toDegrees(phi))
    }
    val name = "laea"
  }

  /** Albers equal-area conic, 2 standard parallels, spherical (Snyder
    * eq. 14-1..14-11; GRIDDESC type 10: lat_1, lat_2, lon_0, lat_0). */
  final case class Aea(lat1: Double, lat2: Double, lat0: Double, lon0: Double)
      extends Proj {
    private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    private val p0 = math.toRadians(lat0)
    private val l0 = math.toRadians(lon0)
    private val n = (math.sin(p1) + math.sin(p2)) / 2.0
    private val C = math.cos(p1) * math.cos(p1) + 2.0 * n * math.sin(p1)
    private val rho0 = R * math.sqrt(C - 2.0 * n * math.sin(p0)) / n
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val rho = R * math.sqrt(C - 2.0 * n * math.sin(phi)) / n
      val th = n * (math.toRadians(lon) - l0)
      (rho * math.sin(th), rho0 - rho * math.cos(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val rho = math.sqrt(x * x + (rho0 - y) * (rho0 - y)) * math.signum(n)
      val th = math.atan2(x * math.signum(n), (rho0 - y) * math.signum(n))
      val phi = math.asin((C - (rho * n / R) * (rho * n / R)) / (2.0 * n))
      (normLon(math.toDegrees(l0 + th / n)), math.toDegrees(phi))
    }
    val name = "aea"
  }

  /** Sinusoidal, spherical (Snyder eq. 30-1/30-2; GRIDDESC type 11: lon_0,
    * false origin). */
  final case class Sinu(lon0: Double, x0: Double = 0.0, y0: Double = 0.0)
      extends Proj {
    private val l0 = math.toRadians(lon0)
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      (R * (math.toRadians(lon) - l0) * math.cos(phi) + x0, R * phi + y0)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = (y - y0) / R
      (math.toDegrees(l0 + (x - x0) / (R * math.cos(phi))), math.toDegrees(phi))
    }
    val name = "sinu"
  }

  /** Spherical transverse Mercator (UTM when lon0 = zone central meridian,
    * k0=0.9996, x offset 500000; GRIDDESC type 8 adds lat_0, the latitude
    * of natural origin). */
  final case class Tmerc(lon0: Double, k0: Double = 0.9996,
                         x0: Double = 500000.0, y0: Double = 0.0,
                         lat0: Double = 0.0) extends Proj {
    private val l0 = math.toRadians(lon0)
    private val m0 = math.toRadians(lat0) // spherical meridian distance = R·phi
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(lon) - l0
      val b = math.cos(phi) * math.sin(dl)
      val x = R * k0 / 2 * math.log((1 + b) / (1 - b)) + x0
      val y = R * k0 * (math.atan2(math.tan(phi), math.cos(dl)) - m0) + y0
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val xn = (x - x0) / (R * k0)
      val yn = (y - y0) / (R * k0) + m0
      val lat = math.asin(math.sin(yn) / math.cosh(xn))
      val lon = l0 + math.atan2(math.sinh(xn), math.cos(yn))
      (math.toDegrees(lon), math.toDegrees(lat))
    }
    val name = "tmerc"
  }

  def utmZone(zone: Int): Tmerc = Tmerc(-183.0 + 6.0 * zone)

  /** GRIDDESC ctype dispatch (SA_ch03_vector.md Table 1, types 1-11; the
    * reference's mimsSetProjection builds the same PROJ args,
    * mims_spatl_proj.c:109-360). */
  def fromGriddesc(c: graft.sources.GridDesc.CoordSys): Proj = c.ctype match {
    case 1  => LatLon
    case 2  => Lcc(c.alpha, c.beta, c.ycent, c.xcent)
    case 3  => Mercator(c.alpha, if (c.beta == 0.0) 1.0 else c.beta, c.gamma, c.xcent)
    case 4  => Merc2SP(c.alpha, c.beta, c.gamma, c.xcent)
    case 5  => Stere(c.alpha, c.beta, 1.0, c.gamma, c.xcent)
    case 6  => Tmerc(-183.0 + 6.0 * c.alpha, 0.9996, c.beta, c.gamma)
    case 7  => PolarStere(c.alpha, c.beta, if (c.gamma == 0.0) 1.0 else c.gamma,
                          c.xcent, c.ycent)
    case 8  => Tmerc(c.beta, if (c.gamma == 0.0) 1.0 else c.gamma,
                     c.xcent, c.ycent, c.alpha)
    case 9  => Laea(c.alpha, c.beta, c.gamma, c.xcent)
    case 10 => Aea(c.alpha, c.beta, c.ycent, c.xcent)
    case 11 => Sinu(c.alpha, c.beta, c.gamma)
    case t  => throw new IllegalArgumentException(s"GRIDDESC ctype $t not supported (1-11)")
  }

  /** GRIDDESC dispatch with an explicit ellipsoid (the CLI's
    * OUTPUT_FILE_ELLIPSOID / catalog ELLIPSOID column): non-spherical
    * ellipsoids select the Snyder ellipsoidal forms for every family that
    * has one; the sphere stays on the exact spherical closed forms. */
  def fromGriddesc(c: graft.sources.GridDesc.CoordSys, ell: Ellipsoid): Proj =
    if (ell.isSphere) fromGriddesc(c)
    else c.ctype match {
      case 1  => LatLon
      case 2  => Ellipsoidal.LccE(c.alpha, c.beta, c.ycent, c.xcent, ell)
      case 3  => Ellipsoidal.MercE(c.alpha, ell,
                   if (c.beta == 0.0) 1.0 else c.beta, c.gamma, c.xcent)
      case 4  => Ellipsoidal.MercE.atTs(c.alpha, c.beta, ell, c.gamma, c.xcent)
      case 5  => Ellipsoidal.StereE(c.alpha, c.beta, ell, 1.0, c.gamma, c.xcent)
      case 6  => Ellipsoidal.TmercE(-183.0 + 6.0 * c.alpha, ell, 0.9996,
                   c.beta, c.gamma)
      case 7  => Ellipsoidal.PolarStereE(c.alpha, c.beta, ell,
                   if (c.gamma == 0.0) 1.0 else c.gamma, c.xcent, c.ycent)
      case 8  => Ellipsoidal.TmercE(c.beta, ell,
                   if (c.gamma == 0.0) 1.0 else c.gamma, c.xcent, c.ycent, c.alpha)
      case 9  => Ellipsoidal.LaeaE(c.alpha, c.beta, ell, c.gamma, c.xcent)
      case 10 => Ellipsoidal.AeaE(c.alpha, c.beta, c.ycent, c.xcent, ell)
      case 11 => Ellipsoidal.SinuE(c.alpha, ell, c.beta, c.gamma)
      case t  => throw new IllegalArgumentException(s"GRIDDESC ctype $t not supported (1-11)")
    }

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
