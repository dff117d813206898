package graft.io

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PNG raster sinks (K3/K4 presentation half): heatmap grid rendering,
  * colormap endpoints, orientation, transparency of absent cells, and
  * scatter placement — verified by decoding the written PNGs.
  */
class RasterSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def readPng(path: String) = javax.imageio.ImageIO.read(new java.io.File(path))

  test("terrain colormap hits its published stops and clamps") {
    Raster.terrainArgb(0.0) shouldBe 0xff333399 // (0.2, 0.2, 0.6)
    Raster.terrainArgb(1.0) shouldBe 0xffffffff
    Raster.terrainArgb(-5.0) shouldBe Raster.terrainArgb(0.0)
    Raster.terrainArgb(9.0) shouldBe Raster.terrainArgb(1.0)
    // 0.5 stop: (1.0, 1.0, 0.6)
    Raster.terrainArgb(0.5) shouldBe 0xffffff99
  }

  test("saveHeatmapPng: north-up orientation, min/max colors, absent cell transparent") {
    val tmp = java.nio.file.Files.createTempDirectory("raster").toString
    // 2x2 grid with cell (1,0) MISSING; values 0 (min) .. 10 (max)
    val grid = Seq(
      (0L, 0L, 0.0),   // bottom-left  -> min color
      (0L, 1L, 10.0),  // top-left     -> max color (white)
      (1L, 1L, 5.0))   // top-right    -> mid color
      .toDF("gx", "gy", "avg_elevation")
    val (w, h) = Raster.saveHeatmapPng(grid, s"$tmp/hm.png", cellPx = 2)
    (w, h) shouldBe (4, 4)
    val img = readPng(s"$tmp/hm.png")
    // top-left block = gy max at gx 0 -> white
    img.getRGB(0, 0) shouldBe 0xffffffff
    // bottom-left block = value 0 -> first terrain stop
    img.getRGB(0, 3) shouldBe Raster.terrainArgb(0.0)
    // top-right block = value 5/10 -> mid stop
    img.getRGB(3, 0) shouldBe Raster.terrainArgb(0.5)
    // bottom-right block: absent cell -> fully transparent
    (img.getRGB(3, 3) >>> 24) shouldBe 0
  }

  test("saveHeatmapPng refuses an unrenderably large grid") {
    val grid = Seq((0L, 0L, 1.0), (100000L, 0L, 2.0)).toDF("gx", "gy", "avg_elevation")
    val e = intercept[IllegalArgumentException](
      Raster.saveHeatmapPng(grid, "/tmp/too-big.png", cellPx = 1, maxPx = 1024))
    e.getMessage should include("coarsen")
  }

  test("saveScatterPng places extreme points at opposite corners, colored by value") {
    val tmp = java.nio.file.Files.createTempDirectory("raster2").toString
    val pts = Seq((0.0, 0.0, 0.0), (100.0, 50.0, 10.0)).toDF("x", "y", "z")
    Raster.saveScatterPng(pts, s"$tmp/sc.png", width = 100, height = 60, dotPx = 1)
    val img = readPng(s"$tmp/sc.png")
    // y up: min (0,0) lands bottom-left; max (100,50) top-right
    img.getRGB(0, 59) shouldBe Raster.terrainArgb(0.0)
    img.getRGB(99, 0) shouldBe 0xffffffff
    (img.getRGB(50, 30) >>> 24) shouldBe 0 // empty background transparent
  }

  test("LidarEngine.saveHeatmap renders a distributed grid end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("raster3").toString
    val engine = new graft.LidarEngine(spark, spark.emptyDataFrame, spark.emptyDataFrame)
    val pts = (0 until 1000).map(i => ((i % 20).toDouble, (i / 50).toDouble, (i % 7).toDouble))
      .toDF("x", "y", "z")
    val (w, h) = engine.saveHeatmap(pts, s"$tmp/eng.png", cellX = 1.0, cellY = 1.0)
    w should be > 0
    h should be > 0
    val img = readPng(s"$tmp/eng.png")
    img.getWidth shouldBe w
    img.getHeight shouldBe h
  }
}
