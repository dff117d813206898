package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Interval join: leveled-grid equi-join == brute-force theta join. */
class IntervalsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("intervalJoin equals the theta join across wildly varying interval lengths") {
    // 200 intervals, lengths 0.1 .. 10000 (some negative coordinates);
    // 300 points over the same range.
    val intervals = (0 until 200).map { i =>
      val start = (i % 40) * 400.0 - 5000.0
      val len = math.pow(10.0, (i % 6) - 1)
      (i, start, start + len)
    }.toDF("iid", "start", "end")
    val points = (0 until 300).map(p => (p, p * 40.0 - 5500.0)).toDF("pid", "t")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
      df.select("pid", "iid").as[(Int, Int)].collect().toSet

    val viaGrid = pairs(Intervals.intervalJoin(points, intervals))
    val viaLoop = pairs(points.join(intervals, col("t") >= col("start") && col("t") <= col("end")))
    viaGrid shouldBe viaLoop
    viaLoop.nonEmpty shouldBe true

    // Candidates must come from a hash equi-join on (lvl, cell).
    val plan = Intervals.intervalJoin(points, intervals).queryExecution.executedPlan.toString
    plan should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[__lvl"""
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => l should not include "start")
  }

  test("huge-magnitude bounds don't overflow the cell cast (ANSI-safe clamp)") {
    // |bound| / 2^lvl past Long.MaxValue used to throw a cast-overflow
    // ArithmeticException under ANSI mode (Spark 4 default); the clamp is
    // monotone and applied on both join sides, so results still equal the
    // theta join exactly.
    val intervals = Seq(
      (1, 1.0e300, 1.0e300 + 1.0), (2, -1.0e300, -1.0e300 + 1.0), (3, 10.0, 20.0))
      .toDF("iid", "start", "end")
    val points = Seq((10, 1.0e300), (11, -1.0e300), (12, 15.0), (13, 30.0)).toDF("pid", "t")
    val viaGrid = Intervals.intervalJoin(points, intervals)
      .select("pid", "iid").as[(Int, Int)].collect().toSet
    val viaLoop = points.join(intervals, col("t") >= col("start") && col("t") <= col("end"))
      .select("pid", "iid").as[(Int, Int)].collect().toSet
    viaGrid shouldBe viaLoop
    viaGrid should contain allOf ((10, 1), (11, 2), (12, 3))
  }

  test("zero-length and point-sized intervals still match exactly their point") {
    val intervals = Seq((1, 5.0, 5.0), (2, -3.0, -3.0)).toDF("iid", "start", "end")
    val points = Seq((10, 5.0), (11, -3.0), (12, 4.999)).toDF("pid", "t")
    val out = Intervals.intervalJoin(points, intervals)
      .select("pid", "iid").as[(Int, Int)].collect().toSet
    out shouldBe Set((10, 1), (11, 2))
  }
}
