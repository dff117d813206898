package graft

import java.nio.file.Files

import graft.model.Bbox
import graft.ops.PointCloudOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The 100 TB layout story for the point-cloud scan (S1): a region-
  * partitioned, x-sorted parquet dataset gives the same pruning the
  * reference gets from the EPT octree (`pipeline.json:4-6`) — directory
  * pruning on region, row-group min/max skipping on the bbox. This spec
  * pins the plan shape on a real written dataset.
  */
class PartitionedLayoutSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-layout").toString + "/points"
    val rnd = new scala.util.Random(42)
    val rows = (0 until 30000).map { i =>
      val region = s"R${i % 3}"
      val x = (i % 3) * 10000.0 + rnd.nextDouble() * 5000.0
      val y = rnd.nextDouble() * 5000.0
      (x, y, rnd.nextDouble() * 100, if (rnd.nextInt(25) == 0) 7 else 1, region)
    }
    rows.toDF("x", "y", "z", "classification", "region")
      .repartition(col("region"))
      .sortWithinPartitions(col("region"), col("x"))
      .write.partitionBy("region").parquet(d)
    d
  }

  test("region filter becomes a partition (directory) filter, bbox reaches PushedFilters") {
    val pts = spark.read.parquet(dir)
    val q = PointCloudOps.cropBbox(
      pts.filter(col("region") === "R1"), Bbox(10000, 0, 12000, 5000))
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(region")
    plan should include("= R1)") // directory-pruning predicate in PartitionFilters (attr ids vary)
    plan should include("PushedFilters: [IsNotNull(x)")
    q.count() should be > 0L
  }

  test("pruned read returns exactly the full-scan answer") {
    val pts = spark.read.parquet(dir)
    val b = Bbox(10000, 1000, 13000, 4000)
    val pruned = PointCloudOps.cropBbox(pts.filter(col("region") === "R1"), b).count()
    val full = pts.collect().count { r =>
      val x = r.getAs[Double]("x"); val y = r.getAs[Double]("y")
      r.getAs[String]("region") == "R1" && x >= b.minx && x <= b.maxx && y >= b.miny && y <= b.maxy
    }
    pruned shouldBe full.toLong
  }

  test("noise filter + voxel subsample run unchanged on the partitioned layout") {
    val pts = spark.read.parquet(dir)
    val out = PointCloudOps.voxelSubsample(
      PointCloudOps.noiseFilter(pts.filter(col("region") === "R2")), 1000.0)
    out.count() should be > 0L
    out.agg(sum("n")).head().getLong(0) shouldBe
      PointCloudOps.noiseFilter(pts.filter(col("region") === "R2")).count()
  }
}
