package graft.geo

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** F1/F2/F3 — closed-form Web-Mercator (SURVEY.md §2.7, FIXTURES.md A6).
  * Round-trip property per SURVEY.md §5.3: |4326->3857->4326 - id| < 1e-9 deg.
  */
class WebMercatorSpec extends AnyFunSuite with Matchers with SparkTest {

  test("scalar round-trip 4326 -> 3857 -> 4326 is identity within 1e-9 deg") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val lat = rnd.nextDouble() * 170.0 - 85.0
      WebMercator.xToLon(WebMercator.lonToX(lon)) shouldBe lon +- 1e-9
      WebMercator.yToLat(WebMercator.latToY(lat)) shouldBe lat +- 1e-9
    }
  }

  test("known anchors: world edge and equator") {
    // World square edge: x(180 deg) = pi * R = 20037508.342789244
    WebMercator.lonToX(180.0) shouldBe 2.0037508342789244e7 +- 1e-6
    WebMercator.lonToX(0.0) shouldBe 0.0 +- 1e-12
    WebMercator.latToY(0.0) shouldBe 0.0 +- 1e-6
    // The Mercator square: y(85.05112878) == x(180); the 8-dp MaxLat constant
    // is itself rounded, so the match is only good to ~0.5 m.
    WebMercator.latToY(WebMercator.MaxLat) shouldBe 2.0037508342789244e7 +- 0.5
  }

  test("latitudes beyond the valid band clamp instead of diverging") {
    WebMercator.latToY(90.0) shouldBe WebMercator.latToY(WebMercator.MaxLat)
    WebMercator.latToY(-90.0) shouldBe WebMercator.latToY(-WebMercator.MaxLat)
    assert(!WebMercator.latToY(90.0).isInfinite)
  }

  test("demo polygon corner (reference scripts/usgs_lidar.py:467) transforms consistently") {
    // Column path must agree with the scalar path bit-for-bit.
    val (lon, lat) = (-93.759055, 41.925015)
    import spark.implicits._
    val row = Seq((lon, lat)).toDF("lon", "lat")
      .select(
        WebMercator.lonToX(col("lon")).as("x"),
        WebMercator.latToY(col("lat")).as("y"))
      .head()
    row.getDouble(0) shouldBe WebMercator.lonToX(lon)
    row.getDouble(1) shouldBe WebMercator.latToY(lat)
    // Sanity: Iowa is mid-northern hemisphere, x west of Greenwich.
    assert(row.getDouble(0) < 0 && row.getDouble(1) > 0)
  }

  test("transform() dispatches both directions and rejects unknown pairs") {
    import spark.implicits._
    val df = Seq((-93.759055, 41.925015)).toDF("lon", "lat")
    val fwd = df.select(
      WebMercator.transform(col("lon"), "x", 4326, 3857).as("x"),
      WebMercator.transform(col("lat"), "y", 4326, 3857).as("y"))
    val back = fwd.select(
      WebMercator.transform(col("x"), "x", 3857, 4326).as("lon"),
      WebMercator.transform(col("y"), "y", 3857, 4326).as("lat")).head()
    back.getDouble(0) shouldBe -93.759055 +- 1e-9
    back.getDouble(1) shouldBe 41.925015 +- 1e-9
    an[IllegalArgumentException] should be thrownBy
      WebMercator.transform(col("lon"), "x", 4326, 32615)
  }
}
