package graft.io

import java.nio.file.Files

import graft.SparkTest
import graft.ops.PointCloudOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** S4/K1/K2/K4/S6 — declarative pipeline config + remaining sinks/sources. */
class PipelineConfigSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-pipe").toString

  private lazy val pointsPath: String = {
    val rnd = new scala.util.Random(21)
    val d = s"$root/points"
    Seq.fill(5000)(
      (rnd.nextDouble() * 2e6 - 1e6, rnd.nextDouble() * 2e6 + 4e6,
        rnd.nextDouble() * 300, if (rnd.nextInt(20) == 0) 7 else 1))
      .toDF("x", "y", "z", "classification")
      .write.parquet(d)
    d
  }

  test("the reference's 4-stage pipeline JSON runs as a DataFrame pipeline") {
    val outCsv = s"$root/out_csv"
    // Mirror of pipeline.json:2-27 with the parquet EPT surrogate.
    val json =
      s"""{"pipeline": [
         |  {"type": "readers.ept", "filename": "$pointsPath",
         |   "bounds": [-500000.0, 4500000.0, 500000.0, 5500000.0]},
         |  {"type": "filters.range", "limits": "Classification![7:7]"},
         |  {"type": "filters.reprojection", "in_srs": "EPSG:3857", "out_srs": "EPSG:4326"},
         |  {"type": "writers.text", "filename": "$outCsv"}
         |]}""".stripMargin
    val out = PipelineConfig.run(spark, json).cache()
    // noise removed
    out.filter(col("classification") === 7).count() shouldBe 0L
    // reprojected into lon/lat range
    val r = out.agg(min("x"), max("x"), min("y"), max("y")).head()
    r.getDouble(0) should be >= -180.0
    r.getDouble(1) should be <= 180.0
    r.getDouble(2) should be >= -90.0
    r.getDouble(3) should be <= 90.0
    // K1 side-effect CSV written
    Readers.csvWithNulls(spark, outCsv).count() shouldBe out.count()
    // matches the directly-composed pipeline
    val direct = PointCloudOps.noiseFilter(
      PointCloudOps.cropBbox(spark.read.parquet(pointsPath), graft.model.Bbox(-500000, 4500000, 500000, 5500000)))
    out.count() shouldBe direct.count()
  }

  test("parse rejects unsupported stages and malformed range limits") {
    an[IllegalArgumentException] should be thrownBy
      PipelineConfig.parse("""[{"type": "filters.voxelgrid"}]""")
    an[IllegalArgumentException] should be thrownBy
      PipelineConfig.parse("""[{"type": "filters.range", "limits": "Intensity![0:0]"}]""")
  }

  test("catalogCsv writes a single-file catalog (K2 fix) and binaryFiles reads it back (S6)") {
    val cat = Seq(("A_2010", "A", 2010, 0.0, 1.0, 0.0, 1.0, 10L))
      .toDF("filename", "region", "year", "xmin", "xmax", "ymin", "ymax", "points")
    val dir = s"$root/catalog_csv"
    Writers.catalogCsv(cat, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    files.length shouldBe 1 // one write, one file — not a per-row rewrite
    val bin = Readers.binaryFiles(spark, dir, glob = "*.csv")
    bin.count() shouldBe 1L
    new String(bin.select("content").head().getAs[Array[Byte]](0), "UTF-8") should include("A_2010")
  }

  test("renderSample is deterministic and bounded (K4)") {
    val pts = spark.read.parquet(pointsPath)
    val s1 = PointCloudOps.renderSample(pts, 100).collect().map(_.toString).sorted
    val s2 = PointCloudOps.renderSample(pts, 100).collect().map(_.toString).sorted
    s1.length shouldBe 100
    s1 shouldBe s2
    val plan = PointCloudOps.renderSample(pts, 100).queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }
}
