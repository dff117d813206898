package graft.geo

import java.nio.file.Files

import graft.SparkTest
import graft.sources.PointsScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Z-order layout: interleaved-key sorting gives tiles tight ranges in BOTH
  * dimensions, measured through the DSv2 connector's footer-stat pruning.
  */
class ZOrderSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("interleave is monotone in locality: neighbors share prefixes, corners differ") {
    val df = Seq(
      (0.0, 0.0), (1.0, 0.0), (0.0, 1.0), // a tight cluster near origin
      (1000.0, 1000.0) // far corner
    ).toDF("x", "y")
    val keys = df.select(ZOrder.interleave(col("x"), col("y"), 0, 1000, 0, 1000).as("z"))
      .as[Long].collect()
    // cluster keys are all far smaller than the far corner's key
    keys.take(3).max should be < keys(3)
    // exact corner: all bits set in both axes
    keys(3) shouldBe (0 until 32).map(1L << _).sum
  }

  /** 16 tiles over uniform 2-D points, written x-range-sorted vs z-order
    * sorted; a y-band query through the connector must prune most z-tiles
    * and none of the x-tiles (x-sorting leaves every tile's y range full).
    */
  test("z-ordered tiles prune on y where x-range tiles cannot") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(40000)((rnd.nextDouble() * 1000, rnd.nextDouble() * 1000))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("pid", "x", "y")
    val root = Files.createTempDirectory("graft-zorder").toString

    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$root/bx")
    val z = ZOrder.interleave(col("x"), col("y"), 0, 1000, 0, 1000)
    pts.repartitionByRange(16, z).sortWithinPartitions(z)
      .write.parquet(s"$root/bz")

    val schema = spark.read.parquet(s"$root/bx").schema
    val yBand = Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("y", 100.0), LessThanOrEqual("y", 150.0))
    val xSurvivors = new PointsScan(s"$root/bx", schema, yBand).planInputPartitions().length
    val zSurvivors = new PointsScan(s"$root/bz", schema, yBand).planInputPartitions().length
    xSurvivors shouldBe 16 // x-sorted tiles: every tile spans all of y
    zSurvivors should be <= 8 // z-sorted tiles: most tiles' y ranges miss the band

    // Same rows come back either way.
    def rows(dir: String): Long =
      spark.read.format("graft.sources.PointsSource").option("path", dir).load()
        .filter(col("y") >= 100.0 && col("y") <= 150.0).count()
    rows(s"$root/bx") shouldBe rows(s"$root/bz")
  }
}
