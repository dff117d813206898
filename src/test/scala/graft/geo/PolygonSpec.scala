package graft.geo

import graft.{LidarEngine, SparkTest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Exact point-in-polygon crop — the reference's `filters.crop` polygon
  * semantics (`/root/reference/pipeline.json:6`).
  */
class PolygonSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  // L-shape: the (5..10) x (5..10) notch is inside the bbox but OUTSIDE the
  // polygon — distinguishes exact crop from bbox crop.
  private val lRing = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0), (5.0, 10.0), (0.0, 10.0))

  test("parseWkt inverts wktPolygon (F4 round trip)") {
    Polygon.parseWkt(LidarEngine.wktPolygon(lRing)) shouldBe (lRing :+ lRing.head)
  }

  test("even-odd ray cast: inside, outside, non-convex notch") {
    val pts = Seq(
      (1, 2.0, 2.0), // interior of the fat part
      (2, 7.0, 2.0), // interior of the foot
      (3, 2.0, 8.0), // interior of the leg
      (4, 7.0, 7.0), // NOTCH: inside bbox, outside polygon
      (5, 11.0, 2.0), // right of everything
      (6, -1.0, 5.0), // left of everything
      (7, 2.0, -3.0) // below
    ).toDF("id", "x", "y")
    val in = pts.filter(Polygon.contains(col("x"), col("y"), lRing))
      .select("id").as[Int].collect().toSet
    in shouldBe Set(1, 2, 3)
    // bbox alone would wrongly keep the notch point
    val inBbox = pts.filter(Polygon.bbox(col("x"), col("y"), lRing))
      .select("id").as[Int].collect().toSet
    inBbox shouldBe Set(1, 2, 3, 4)
  }

  test("predicateSql is the same predicate (Spark SQL executes the oracle string)") {
    val pts = (0 until 400).map { i =>
      (i, (i % 20) * 0.6 - 1.0, (i / 20) * 0.6 - 1.0)
    }.toDF("id", "x", "y")
    pts.createOrReplaceTempView("poly_pts")
    val viaColumn = pts.filter(Polygon.contains(col("x"), col("y"), lRing))
      .select("id").as[Int].collect().toSet
    val viaSql = spark.sql(
      s"SELECT id FROM poly_pts WHERE ${Polygon.predicateSql("x", "y", lRing)}")
      .as[Int].collect().toSet
    viaSql shouldBe viaColumn
    viaColumn.nonEmpty shouldBe true
  }

  test("degenerate all-horizontal ring: zero area, nothing inside, no crash") {
    val flat = Seq((0.0, 5.0), (10.0, 5.0), (20.0, 5.0))
    val pts = Seq((1, 5.0, 5.0), (2, 5.0, 6.0)).toDF("id", "x", "y")
    pts.filter(Polygon.contains(col("x"), col("y"), flat)).count() shouldBe 0L
    Polygon.predicateSql("x", "y", flat) shouldBe "1 = 0"
  }

  test("unclosed ring and closed ring agree; horizontal edges are skipped safely") {
    val closed = lRing :+ lRing.head
    val pts = Seq((1, 2.0, 2.0), (2, 7.0, 7.0)).toDF("id", "x", "y")
    val a = pts.filter(Polygon.contains(col("x"), col("y"), lRing)).count()
    val b = pts.filter(Polygon.contains(col("x"), col("y"), closed)).count()
    a shouldBe b
  }
}
