package graft

import java.nio.file.Files

import graft.geo.WebMercator
import graft.io.{Readers, Writers}
import graft.model.Bbox
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** End-to-end facade test mirroring the reference's demo notebook flow
  * (`notebooks/demo.ipynb` cells 7-23 / `__main__`,
  * `scripts/usgs_lidar.py:465-474`): polygon -> regions -> fetch -> noise
  * filter -> reproject -> subsample -> CSV sink.
  */
class LidarEngineSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  // Demo polygon (scripts/usgs_lidar.py:467), EPSG:4326.
  private val demoPolygon = Seq(
    (-93.759055, 41.925015), (-93.766155, 41.925015),
    (-93.766155, 41.921818), (-93.759055, 41.921818))

  private lazy val demoBbox3857: Bbox = {
    val v = demoPolygon.map { case (lon, lat) => (WebMercator.lonToX(lon), WebMercator.latToY(lat)) }
    Bbox.ofVertices(v)
  }

  // Catalog: IA region contains the demo box; a distant region does not;
  // a no-year region also contains it.
  private lazy val catalog = Seq(
    ("IA_Demo_2009", "IA_Demo", Some(2009),
      demoBbox3857.minx - 1000, demoBbox3857.maxx + 1000,
      demoBbox3857.miny - 1000, demoBbox3857.maxy + 1000, 1000L),
    ("IA_FullState", "IA_FullState", None,
      demoBbox3857.minx - 1e6, demoBbox3857.maxx + 1e6,
      demoBbox3857.miny - 1e6, demoBbox3857.maxy + 1e6, 2000L),
    ("WA_Far_2015", "WA_Far", Some(2015), -1.4e7, -1.3e7, 5.9e6, 6.0e6, 3000L)
  ).toDF("filename", "region", "year", "xmin", "xmax", "ymin", "ymax", "points")

  // Points in EPSG:3857 covering the demo box, tagged per region, ~4% noise.
  private lazy val points = {
    val rnd = new scala.util.Random(3)
    val b = demoBbox3857
    val inBox = Seq.fill(800) {
      val x = b.minx + rnd.nextDouble() * (b.maxx - b.minx)
      val y = b.miny + rnd.nextDouble() * (b.maxy - b.miny)
      val cls = if (rnd.nextInt(25) == 0) 7 else 1
      (x, y, 250.0 + rnd.nextDouble() * 50, cls, if (rnd.nextBoolean()) "IA_Demo_2009" else "IA_FullState")
    }
    val outside = Seq.fill(200) {
      (b.minx - 1e5 - rnd.nextDouble() * 1e5, b.miny - 1e5, 100.0, 1, "IA_Demo_2009")
    }
    (inBox ++ outside).toDF("x", "y", "z", "classification", "region")
  }

  private lazy val engine = new LidarEngine(spark, catalog, points)

  test("fetchRegions: containment + year sort, demo polygon (notebook cell 9)") {
    engine.fetchRegions(demoPolygon).select("filename").as[String].collect().toSeq shouldBe
      Seq("IA_Demo_2009", "IA_FullState")
  }

  test("fetchPolygonBoundaries emits 3857 WKT + bounds (F4/F5)") {
    val (wkt, bbox) = engine.fetchPolygonBoundaries(demoPolygon)
    wkt should startWith("POLYGON((")
    wkt.count(_ == ',') shouldBe 4 // ring closed: 5 vertices
    bbox.minx should be < bbox.maxx
    LidarEngine.boundsString(bbox) should fullyMatch regex """\(\[.+, .+\], \[.+, .+\]\)"""
  }

  test("fetchData crops to the exact polygon, not just its bbox (filters.crop parity)") {
    // Triangle = upper-left half of the demo rectangle: same bbox, half the
    // area. A bbox-only crop would return identical counts for both — the
    // strict inequality proves the ray-cast crop actually cuts.
    val triangle = Seq(
      (-93.759055, 41.925015), (-93.766155, 41.925015), (-93.766155, 41.921818))
    val rectCount = engine.fetchData(demoPolygon).count()
    val triCount = engine.fetchData(triangle).count()
    triCount should be > 0L
    triCount should be < rectCount
    // Uniform points: the triangle holds roughly half the rectangle's points.
    triCount.toDouble / rectCount.toDouble shouldBe 0.5 +- 0.1
  }

  test("fetchData: crop + noise filter + reproject + year keys (flagship §3.1)") {
    val out = engine.fetchData(demoPolygon).cache()
    // Noise (class 7) excluded, outside-box points excluded; every in-box
    // clean point appears once per matching region (both IA regions match).
    out.filter(col("matched_region") === "WA_Far_2015").count() shouldBe 0L
    val keys = out.select("year_key").distinct().as[String].collect().toSet
    keys shouldBe Set("2009.0", "Year: not_specified")
    // Reprojection lands back in the demo lon/lat window.
    val r = out.agg(min("lon"), max("lon"), min("lat"), max("lat")).head()
    r.getDouble(0) should be >= -93.766155 - 1e-6
    r.getDouble(1) should be <= -93.759055 + 1e-6
    r.getDouble(2) should be >= 41.921818 - 1e-6
    r.getDouble(3) should be <= 41.925015 + 1e-6
    // Region plumbing fix (§7.5): restricting the region restricts the scan.
    val one = engine.fetchData(demoPolygon, Some("IA_Demo_2009"))
    one.select("matched_region").distinct().as[String].collect().toSeq shouldBe Seq("IA_Demo_2009")
    // dict-of-years shape
    val m = engine.toYearMap(out)
    m.keySet shouldBe keys
    m("2009.0").count() should be > 0L
  }

  test("subsample + CSV sink round-trip (notebook cells 19-23 + K1)") {
    val fetched = engine.fetchData(demoPolygon, Some("IA_Demo_2009"))
      .select(col("lon").as("x"), col("lat").as("y"), col("elevation").as("z"))
    val sub = engine.subsample(engine.convertEpsg(fetched, "x", "y", 4326, 3857), 100.0)
    sub.count() should be > 0L
    sub.agg(sum("n")).head().getLong(0) shouldBe fetched.count()
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    Writers.csv(sub, dir)
    val back = Readers.csvWithNulls(spark, dir)
    back.count() shouldBe sub.count()
  }

  test("csvWithNulls normalizes all reference null tokens (S2/P6)") {
    val dir = Files.createTempDirectory("graft-nulls").toString
    val f = new java.io.File(dir, "nulls.csv")
    val w = new java.io.PrintWriter(f)
    w.write("a,b,c\n1,n/a,x\nna,2,undefined\n,3,y\n")
    w.close()
    val df = Readers.csvWithNulls(spark, f.getAbsolutePath)
    df.filter(col("a").isNull).count() shouldBe 2L // "na" and empty
    df.filter(col("b").isNull).count() shouldBe 1L // "n/a"
    df.filter(col("c").isNull).count() shouldBe 1L // "undefined"
  }
}
