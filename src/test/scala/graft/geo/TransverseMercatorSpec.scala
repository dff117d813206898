package graft.geo

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** UTM / Transverse Mercator (Krüger n^6 series): calibration against
  * published geodetic constants, an INDEPENDENT implementation (Snyder
  * 1987's e^2-series formulas — a different expansion family), round-trip
  * properties, and Column/scalar agreement.
  */
class TransverseMercatorSpec extends AnyFunSuite with Matchers with SparkTest {
  import TransverseMercator._

  test("rectifying radius reproduces the published WGS84 quarter meridian") {
    // Quarter meridian = A * pi/2 for the Krüger rectifying radius;
    // published WGS84 value 10001965.729 m (pole-to-equator arc).
    (RectA * math.Pi / 2.0) shouldBe 10001965.729 +- 0.01
  }

  test("central meridian and equator map to the UTM origin constants") {
    val (e0, n0) = utmForward(0.0, centralMeridianDeg(18), 32618)
    e0 shouldBe FalseE +- 1e-6
    n0 shouldBe 0.0 +- 1e-6
    val (eS, nS) = utmForward(0.0, centralMeridianDeg(33), 32733)
    eS shouldBe FalseE +- 1e-6
    nS shouldBe FalseNSouth +- 1e-6
  }

  /** Snyder 1987 (Map Projections — A Working Manual, p.61) forward TM:
    * an e^2-power-series formulation independent of the Krüger n-series.
    * Agreement of two different expansions to centimeter level over the
    * zone validates both coefficient sets.
    */
  private def snyderForward(latDeg: Double, lonDeg: Double, lon0Deg: Double): (Double, Double) = {
    val a = A0
    val e2 = F * (2.0 - F)
    val ep2 = e2 / (1.0 - e2)
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - lon0Deg)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val nu = a / math.sqrt(1.0 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val bigA = lam * cosP
    val m = a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
      - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
      + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
      - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    val east = FalseE + K0 * nu * (bigA + (1 - t + c) * math.pow(bigA, 3) / 6.0
      + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120.0)
    val north = K0 * (m + nu * tanP * (bigA * bigA / 2.0
      + (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24.0
      + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720.0))
    (east, north)
  }

  test("Krüger n^6 forward agrees with the independent Snyder e-series to < 2 cm in-zone") {
    val lon0 = centralMeridianDeg(18) // -75
    for (lat <- Seq(-70.0, -40.0, -10.0, 0.0, 10.0, 33.3, 45.0, 60.0, 75.0);
         dLon <- Seq(-2.9, -1.5, 0.0, 0.7, 2.9)) {
      val (e1, n1) = forward(DoubleAlg, lat, lon0 + dLon, lon0, south = false)
      val (e2, n2) = snyderForward(lat, lon0 + dLon, lon0)
      withClue(s"lat=$lat dLon=$dLon: ") {
        e1 shouldBe e2 +- 0.02
        n1 shouldBe n2 +- 0.02
      }
    }
  }

  test("forward/inverse round-trip recovers lat/lon to < 1e-9 degrees across zones") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val zone = 1 + rnd.nextInt(60)
      val south = rnd.nextBoolean()
      val epsg = (if (south) 32700 else 32600) + zone
      val lat = (if (south) -1 else 1) * (rnd.nextDouble() * 80.0)
      val lon = centralMeridianDeg(zone) + (rnd.nextDouble() * 6.0 - 3.0)
      val (e, n) = utmForward(lat, lon, epsg)
      val (lat2, lon2) = utmInverse(e, n, epsg)
      withClue(s"epsg=$epsg lat=$lat lon=$lon: ") {
        lat2 shouldBe lat +- 1e-9
        lon2 shouldBe lon +- 1e-9
      }
    }
  }

  test("Column expressions equal the scalar algebra and survive transformXY composition") {
    import spark.implicits._
    val pts = Seq((1L, 40.7, -74.2), (2L, -33.9, -70.9), (3L, 0.001, -75.0))
      .toDF("id", "lat", "lon")
    // 4326 -> UTM 18N via transformXY(x=lon, y=lat)
    val (ex, ny) = WebMercator.transformXY(col("lon"), col("lat"), 4326, 32618)
    val rows = pts.select(col("id"), col("lat"), col("lon"), ex.as("e"), ny.as("n"))
      .orderBy(col("id")).collect()
    rows.foreach { r =>
      val (es, ns) = utmForward(r.getDouble(1), r.getDouble(2), 32618)
      r.getDouble(3) shouldBe es +- 1e-9
      r.getDouble(4) shouldBe ns +- 1e-9
    }
    // UTM -> 3857 composes through 4326: equals scalar inverse + Mercator.
    val (mx, my) = WebMercator.transformXY(col("e"), col("n"), 32618, 3857)
    val m = pts.select(col("id"), ex.as("e"), ny.as("n"))
      .select(col("id"), col("e"), col("n"), mx.as("mx"), my.as("my"))
      .orderBy(col("id")).collect()
    m.foreach { r =>
      val (latS, lonS) = utmInverse(r.getDouble(1), r.getDouble(2), 32618)
      r.getDouble(3) shouldBe WebMercator.lonToX(lonS) +- 1e-6
      r.getDouble(4) shouldBe WebMercator.latToY(latS) +- 1e-6
    }
  }

  test("convertEpsg handles a UTM pair without contaminating y with transformed x") {
    import spark.implicits._
    val df = Seq((40.0, -74.5)).toDF("y", "x") // y=lat, x=lon
    val engine = new graft.LidarEngine(spark, spark.emptyDataFrame, spark.emptyDataFrame)
    val out = engine.convertEpsg(df, "x", "y", 4326, 32618).collect().head
    val (e, n) = utmForward(40.0, -74.5, 32618)
    out.getAs[Double]("x") shouldBe e +- 1e-9
    out.getAs[Double]("y") shouldBe n +- 1e-9
    out.getAs[Int]("srid") shouldBe 32618
  }

  test("SQL algebra renders the identical tree (spot: literal round-trip + structure)") {
    val (eSql, _) = utmForwardSql("lat", "lon", 32618)
    eSql should include("atan") // xi' path present
    eSql should include("500000.0") // false easting literal
    // E-notation literals are CAST('..E..' AS DOUBLE) so SQL parses them
    SqlAlg.lit(1.23e-7) shouldBe "CAST('1.23E-7' AS DOUBLE)"
    SqlAlg.lit(0.5) shouldBe "0.5"
  }
}
