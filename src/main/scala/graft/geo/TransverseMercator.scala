package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions

/** Ellipsoidal Transverse Mercator (UTM zones, EPSG:326xx north /
  * EPSG:327xx south) via the order-n^6 Krüger series (public formulas:
  * Karney 2011, "Transverse Mercator with an accuracy of a few
  * nanometers"; the same series Wikipedia's UTM article lists). Extends
  * the engine's CRS surface beyond the reference's only exercised pair
  * (4326<->3857, `scripts/usgs_lidar.py:441-463`) to the UTM zones real
  * USGS/LIDAR data ships in.
  *
  * Accuracy: the n^6 series is sub-micrometer within a zone (|lon -
  * lon0| <= 3 deg) and stays millimeter-level several degrees beyond —
  * far inside the 6-dp rounding every oracle-checked output applies.
  *
  * The SAME formula must run in Spark (Columns) and in the DuckDB oracle
  * (SQL text). Both are therefore generated from one structural builder
  * ([[Alg]]): each engine evaluates an expression tree of identical shape
  * and operation order, built only from primitives both engines share
  * (sin/cos/tan/atan/asin/exp/ln/sqrt and arithmetic — sinh/cosh/atanh
  * are DERIVED from exp/ln in the algebra, so no engine-intrinsic
  * hyperbolic implementations can drift). Doubles then agree to the last
  * few ULPs and 6-dp rounding is engine-independent.
  */
object TransverseMercator {

  /** WGS84 semi-major axis (m) / flattening. */
  val A0: Double = 6378137.0
  val F: Double = 1.0 / 298.257223563

  /** UTM scale at the central meridian / false easting / south false
    * northing.
    */
  val K0: Double = 0.9996
  val FalseE: Double = 500000.0
  val FalseNSouth: Double = 10000000.0

  /** Third flattening n and the rectifying radius A. */
  val N3: Double = F / (2.0 - F)
  val RectA: Double = {
    val n2 = N3 * N3
    A0 / (1.0 + N3) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0 + n2 * n2 * n2 / 256.0)
  }

  /** Krüger forward coefficients alpha_1..6 (order n^6). */
  val Alpha: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0 - 127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
      13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0 + 281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
      61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0 + 167603.0 * n6 / 181440.0,
      49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0 + 6601661.0 * n6 / 7257600.0,
      34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
      212378941.0 * n6 / 319334400.0)
  }

  /** Krüger inverse coefficients beta_1..6. */
  val Beta: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0 - 81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
      n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0 - 1118711.0 * n6 / 3870720.0,
      17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0 + 5569.0 * n6 / 90720.0,
      4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0 - 830251.0 * n6 / 7257600.0,
      4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
      20648693.0 * n6 / 638668800.0)
  }

  /** Conformal -> geographic latitude series delta_1..6. */
  val Delta: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3 + 116.0 * n4 / 45.0 + 26.0 * n5 / 45.0 - 2854.0 * n6 / 675.0,
      7.0 * n2 / 3.0 - 8.0 * n3 / 5.0 - 227.0 * n4 / 45.0 + 2704.0 * n5 / 315.0 + 2323.0 * n6 / 945.0,
      56.0 * n3 / 15.0 - 136.0 * n4 / 35.0 - 1262.0 * n5 / 105.0 + 73814.0 * n6 / 2835.0,
      4279.0 * n4 / 630.0 - 332.0 * n5 / 35.0 - 399572.0 * n6 / 14175.0,
      4174.0 * n5 / 315.0 - 144838.0 * n6 / 6237.0,
      601676.0 * n6 / 22275.0)
  }

  /** 2*sqrt(n)/(1+n) — the conformal-latitude constant. */
  val CChi: Double = 2.0 * math.sqrt(N3) / (1.0 + N3)

  /** UTM zone central meridian (deg): zone 1 = 177W .. zone 60 = 177E. */
  def centralMeridianDeg(zone: Int): Double = -183.0 + 6.0 * zone

  /** (zone, south) from a UTM EPSG code; None if not a UTM code. */
  def zoneOf(epsg: Int): Option[(Int, Boolean)] =
    if (epsg >= 32601 && epsg <= 32660) Some((epsg - 32600, false))
    else if (epsg >= 32701 && epsg <= 32760) Some((epsg - 32700, true))
    else None

  /** Structural expression builder: one formula definition instantiated
    * for Spark Columns, SQL text, and plain doubles. Only primitives both
    * engines implement identically-enough for 6-dp rounding; hyperbolics
    * are derived below the trait so neither engine's intrinsic is used.
    */
  trait Alg[T] {
    def lit(d: Double): T
    def add(a: T, b: T): T
    def sub(a: T, b: T): T
    def mul(a: T, b: T): T
    def div(a: T, b: T): T
    def neg(a: T): T
    def sin(a: T): T
    def cos(a: T): T
    def atan(a: T): T
    def asin(a: T): T
    def exp(a: T): T
    def ln(a: T): T
    def sqrt(a: T): T

    // Derived hyperbolics — identical derivation in every engine.
    final def sinh(a: T): T = div(sub(exp(a), exp(neg(a))), lit(2.0))
    final def cosh(a: T): T = div(add(exp(a), exp(neg(a))), lit(2.0))
    final def atanh(a: T): T = mul(lit(0.5), ln(div(add(lit(1.0), a), sub(lit(1.0), a))))
  }

  object DoubleAlg extends Alg[Double] {
    def lit(d: Double): Double = d
    def add(a: Double, b: Double): Double = a + b
    def sub(a: Double, b: Double): Double = a - b
    def mul(a: Double, b: Double): Double = a * b
    def div(a: Double, b: Double): Double = a / b
    def neg(a: Double): Double = -a
    def sin(a: Double): Double = math.sin(a)
    def cos(a: Double): Double = math.cos(a)
    def atan(a: Double): Double = math.atan(a)
    def asin(a: Double): Double = math.asin(a)
    def exp(a: Double): Double = math.exp(a)
    def ln(a: Double): Double = math.log(a)
    def sqrt(a: Double): Double = math.sqrt(a)
  }

  object ColumnAlg extends Alg[Column] {
    def lit(d: Double): Column = functions.lit(d)
    def add(a: Column, b: Column): Column = a + b
    def sub(a: Column, b: Column): Column = a - b
    def mul(a: Column, b: Column): Column = a * b
    def div(a: Column, b: Column): Column = a / b
    def neg(a: Column): Column = -a
    def sin(a: Column): Column = functions.sin(a)
    def cos(a: Column): Column = functions.cos(a)
    def atan(a: Column): Column = functions.atan(a)
    def asin(a: Column): Column = functions.asin(a)
    def exp(a: Column): Column = functions.exp(a)
    def ln(a: Column): Column = functions.log(a)
    def sqrt(a: Column): Column = functions.sqrt(a)
  }

  /** Catalyst Expression algebra — for SQL function registration, where
    * composed Columns can't round-trip through the FunctionRegistry
    * (they wrap into unresolvable ColumnNode exprs; see
    * [[graft.Graft.MercatorExprs]]'s note). Same builder, so the SQL
    * functions agree bit-for-bit with the Column path.
    */
  object ExprAlg extends Alg[org.apache.spark.sql.catalyst.expressions.Expression] {
    import org.apache.spark.sql.catalyst.expressions._
    type E = Expression
    def lit(d: Double): E = Literal(d)
    def add(a: E, b: E): E = Add(a, b)
    def sub(a: E, b: E): E = Subtract(a, b)
    def mul(a: E, b: E): E = Multiply(a, b)
    def div(a: E, b: E): E = Divide(a, b)
    def neg(a: E): E = UnaryMinus(a)
    def sin(a: E): E = Sin(a)
    def cos(a: E): E = Cos(a)
    def atan(a: E): E = Atan(a)
    def asin(a: E): E = Asin(a)
    def exp(a: E): E = Exp(a)
    def ln(a: E): E = Log(a)
    def sqrt(a: E): E = Sqrt(a)
  }

  /** SQL-text algebra. Literals print via Double.toString (round-trips
    * exactly); every composite is parenthesized so precedence cannot
    * reassociate anything.
    */
  object SqlAlg extends Alg[String] {
    def lit(d: Double): String = {
      val s = d.toString
      if (s.contains("E") || s.contains("e")) s"CAST('$s' AS DOUBLE)" else s
    }
    def add(a: String, b: String): String = s"($a + $b)"
    def sub(a: String, b: String): String = s"($a - $b)"
    def mul(a: String, b: String): String = s"($a * $b)"
    def div(a: String, b: String): String = s"($a / $b)"
    def neg(a: String): String = s"(- $a)"
    def sin(a: String): String = s"sin($a)"
    def cos(a: String): String = s"cos($a)"
    def atan(a: String): String = s"atan($a)"
    def asin(a: String): String = s"asin($a)"
    def exp(a: String): String = s"exp($a)"
    def ln(a: String): String = s"ln($a)"
    def sqrt(a: String): String = s"sqrt($a)"
  }

  private val D2R = math.Pi / 180.0

  /** Forward: geographic (lat, lon in degrees) -> (easting, northing) in
    * the UTM zone with central meridian `lon0Deg` and the given false
    * northing. Caller handles zone selection; inputs are assumed within a
    * usable distance of the central meridian.
    */
  def forward[T](alg: Alg[T], latDeg: T, lonDeg: T, lon0Deg: Double, south: Boolean): (T, T) = {
    import alg._
    val phi = mul(latDeg, lit(D2R))
    val dLam = mul(sub(lonDeg, lit(lon0Deg)), lit(D2R))
    val sinPhi = sin(phi)
    // conformal latitude via t = sinh(atanh(sin phi) - c*atanh(c*sin phi))
    val t = sinh(sub(atanh(sinPhi), mul(lit(CChi), atanh(mul(lit(CChi), sinPhi)))))
    val xiP = atan(div(t, cos(dLam)))
    val etaP = atanh(div(sin(dLam), sqrt(add(lit(1.0), mul(t, t)))))
    var xi = xiP
    var eta = etaP
    for (j <- 1 to 6) {
      val a = lit(Alpha(j - 1))
      xi = add(xi, mul(a, mul(sin(mul(lit(2.0 * j), xiP)), cosh(mul(lit(2.0 * j), etaP)))))
      eta = add(eta, mul(a, mul(cos(mul(lit(2.0 * j), xiP)), sinh(mul(lit(2.0 * j), etaP)))))
    }
    val e = add(lit(FalseE), mul(lit(K0 * RectA), eta))
    val n0 = if (south) FalseNSouth else 0.0
    val n = add(lit(n0), mul(lit(K0 * RectA), xi))
    (e, n)
  }

  /** Inverse: (easting, northing) -> geographic (lat, lon in degrees). */
  def inverse[T](alg: Alg[T], easting: T, northing: T, lon0Deg: Double, south: Boolean): (T, T) = {
    import alg._
    val n0 = if (south) FalseNSouth else 0.0
    val xi = div(sub(northing, lit(n0)), lit(K0 * RectA))
    val eta = div(sub(easting, lit(FalseE)), lit(K0 * RectA))
    var xiP = xi
    var etaP = eta
    for (j <- 1 to 6) {
      val b = lit(Beta(j - 1))
      xiP = sub(xiP, mul(b, mul(sin(mul(lit(2.0 * j), xi)), cosh(mul(lit(2.0 * j), eta)))))
      etaP = sub(etaP, mul(b, mul(cos(mul(lit(2.0 * j), xi)), sinh(mul(lit(2.0 * j), eta)))))
    }
    val chi = asin(div(sin(xiP), cosh(etaP)))
    var phi = chi
    for (j <- 1 to 6) {
      phi = add(phi, mul(lit(Delta(j - 1)), sin(mul(lit(2.0 * j), chi))))
    }
    val lam = atan(div(sinh(etaP), cos(xiP)))
    val latDeg = div(phi, lit(D2R))
    val lonDeg = add(lit(lon0Deg), div(lam, lit(D2R)))
    (latDeg, lonDeg)
  }

  /** Column forward for a UTM EPSG code: (lat, lon) degrees -> (E, N). */
  def utmForward(lat: Column, lon: Column, epsg: Int): (Column, Column) = {
    val (zone, south) = zoneOf(epsg).getOrElse(
      throw new IllegalArgumentException(s"not a UTM EPSG code: $epsg"))
    forward(ColumnAlg, lat, lon, centralMeridianDeg(zone), south)
  }

  /** Column inverse for a UTM EPSG code: (E, N) -> (lat, lon) degrees. */
  def utmInverse(e: Column, n: Column, epsg: Int): (Column, Column) = {
    val (zone, south) = zoneOf(epsg).getOrElse(
      throw new IllegalArgumentException(s"not a UTM EPSG code: $epsg"))
    inverse(ColumnAlg, e, n, centralMeridianDeg(zone), south)
  }

  /** SQL-text twins for oracle generation (same builder, same tree). */
  def utmForwardSql(lat: String, lon: String, epsg: Int): (String, String) = {
    val (zone, south) = zoneOf(epsg).get
    forward(SqlAlg, lat, lon, centralMeridianDeg(zone), south)
  }
  def utmInverseSql(e: String, n: String, epsg: Int): (String, String) = {
    val (zone, south) = zoneOf(epsg).get
    inverse(SqlAlg, e, n, centralMeridianDeg(zone), south)
  }

  /** Scalar twins (driver-side prep / specs). */
  def utmForward(lat: Double, lon: Double, epsg: Int): (Double, Double) = {
    val (zone, south) = zoneOf(epsg).get
    forward(DoubleAlg, lat, lon, centralMeridianDeg(zone), south)
  }
  def utmInverse(e: Double, n: Double, epsg: Int): (Double, Double) = {
    val (zone, south) = zoneOf(epsg).get
    inverse(DoubleAlg, e, n, centralMeridianDeg(zone), south)
  }
}
