package graft.ops

import graft.SparkTest
import graft.model.Bbox
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Point-cloud operators (P1/P2, A1 voxel subsample, A4 grid) against an
  * in-test reference implementation mirroring the numpy semantics of
  * `subsample` (`scripts/usgs_lidar.py:400-439`): voxel key =
  * floor((p - min(p))/res) per axis, barycenter = mean of raw member points.
  */
class PointCloudOpsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def referenceSubsample(
      pts: Seq[(Double, Double, Double)], res: Double): Map[(Long, Long, Long), (Double, Double, Double, Long)] = {
    val mx = pts.map(_._1).min; val my = pts.map(_._2).min; val mz = pts.map(_._3).min
    pts.groupBy { case (x, y, z) =>
      (math.floor((x - mx) / res).toLong, math.floor((y - my) / res).toLong, math.floor((z - mz) / res).toLong)
    }.map { case (k, vs) =>
      k -> (vs.map(_._1).sum / vs.size, vs.map(_._2).sum / vs.size, vs.map(_._3).sum / vs.size, vs.size.toLong)
    }
  }

  // 10-point micro-cloud (FIXTURES.md A6 golden), res = 3 as in the demo
  // notebook cell 21.
  private val micro: Seq[(Double, Double, Double)] = Seq(
    (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (2.0, 2.0, 2.0), (2.9, 2.9, 2.9),
    (3.0, 0.0, 0.0), (4.5, 0.5, 0.5), (0.0, 4.0, 0.0), (0.0, 0.0, 5.0),
    (5.0, 5.0, 5.0), (-1.0, -1.0, -1.0))

  test("voxelSubsample matches the reference barycenter math on the micro-cloud") {
    val df = micro.toDF("x", "y", "z")
    val got = PointCloudOps.voxelSubsample(df, 3.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    val want = referenceSubsample(micro, 3.0)
    got.keySet shouldBe want.keySet
    want.foreach { case (k, (bx, by, bz, n)) =>
      val (gx, gy, gz, gn) = got(k)
      gx shouldBe bx +- 1e-4 // engine output is rounded to 4 dp (Exact.davg)
      gy shouldBe by +- 1e-4
      gz shouldBe bz +- 1e-4
      gn shouldBe n
    }
  }

  test("voxelSubsample invariants: counts preserved, barycenter inside voxel") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 10))
    val res = 4.0
    val out = PointCloudOps.voxelSubsample(pts.toDF("x", "y", "z"), res).collect()
    out.map(_.getLong(6)).sum shouldBe 500L
    val mx = pts.map(_._1).min; val my = pts.map(_._2).min; val mz = pts.map(_._3).min
    out.foreach { r =>
      val (vx, vy, vz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      r.getDouble(3) should (be >= mx + vx * res - 1e-3 and be <= mx + (vx + 1) * res + 1e-3)
      r.getDouble(4) should (be >= my + vy * res - 1e-3 and be <= my + (vy + 1) * res + 1e-3)
      r.getDouble(5) should (be >= mz + vz * res - 1e-3 and be <= mz + (vz + 1) * res + 1e-3)
    }
  }

  test("noiseFilter drops class 7, keeps others and nulls (P2, pipeline.json:11-14)") {
    val df = Seq(
      (0.0, 0.0, 1.0, Some(2)), (1.0, 1.0, 2.0, Some(7)),
      (2.0, 2.0, 3.0, None), (3.0, 3.0, 4.0, Some(7)), (4.0, 4.0, 5.0, Some(0)))
      .toDF("x", "y", "z", "classification")
    val kept = PointCloudOps.noiseFilter(df).select("z").as[Double].collect().toSeq
    kept should contain theSameElementsAs Seq(1.0, 3.0, 5.0)
  }

  test("loadPoints projects x/y/elevation by name (P1 fix of [-3:] selection)") {
    val df = Seq((1.0, 2.0, 3.0, 1, "r")).toDF("x", "y", "z", "classification", "region")
    val out = PointCloudOps.loadPoints(df)
    out.columns.toSeq shouldBe Seq("x", "y", "elevation", "classification")
    out.head().getDouble(2) shouldBe 3.0
  }

  test("cropBbox keeps only points inside the box (EPT bounds pushdown analog)") {
    val df = (for (x <- -5 to 5; y <- -5 to 5) yield (x.toDouble, y.toDouble, 0.0)).toDF("x", "y", "z")
    PointCloudOps.cropBbox(df, Bbox(-1, -1, 2, 2)).count() shouldBe 16L
  }

  test("grid2d bins and averages (A4)") {
    val df = Seq(
      (0.5, 0.5, 10.0), (1.5, 0.5, 20.0), // same 2x1 cell at cell=2.0 -> avg 15
      (2.5, 0.5, 99.0))
      .toDF("x", "y", "z")
    val out = PointCloudOps.grid2d(df, 2.0, 2.0).orderBy("gx").collect()
    out.length shouldBe 2
    out(0).getDouble(2) shouldBe 15.0 +- 1e-9
    out(0).getLong(3) shouldBe 2L
    out(1).getDouble(2) shouldBe 99.0 +- 1e-9
  }

  test("full reference flow: crop -> noise filter -> project -> subsample (e2e §3.1)") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(2000)(
      (rnd.nextDouble() * 100, rnd.nextDouble() * 100, rnd.nextDouble() * 30,
        if (rnd.nextInt(20) == 0) 7 else 1))
      .toDF("x", "y", "z", "classification")
    val cropped = PointCloudOps.cropBbox(PointCloudOps.noiseFilter(pts), Bbox(10, 10, 90, 90))
    val out = PointCloudOps.voxelSubsample(cropped, 10.0)
    val n = out.agg(sum("n")).head().getLong(0)
    n shouldBe cropped.count()
    out.count() should be > 0L
  }
}
