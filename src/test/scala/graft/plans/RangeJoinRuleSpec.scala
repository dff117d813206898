package graft.plans

import graft.SparkTest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RewriteRangeJoin: BETWEEN theta joins silently become the leveled-grid
  * equi-join — identical results, no data-sized nested loop.
  */
class RangeJoinRuleSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private lazy val points = (0 until 500).map(p => (p, p * 23.0 - 3000.0)).toDF("pid", "t")
  private lazy val intervals = (0 until 60).map { i =>
    val start = (i % 20) * 350.0 - 3500.0
    (i, start, start + math.pow(10.0, i % 5))
  }.toDF("iid", "lo", "hi")

  private def pairs(df: DataFrame): Set[(Int, Int)] =
    df.select("pid", "iid").as[(Int, Int)].collect().toSet

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteRangeJoin
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RewriteRangeJoin)
    }
  }

  /** The interval bounds may appear in a nested-loop join ONLY if that loop
    * is the tiny broadcast-levels cross join (which never references them);
    * a data-sized BNLJ would carry lo/hi in its condition line.
    */
  private def assertGridPlan(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    plan should include regex """(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \[__lvl"""
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => { l should not include "lo"; l should not include "hi" })
  }

  test("inclusive BETWEEN join rewrites losslessly; baseline is a nested loop") {
    val q = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
    val baseline = pairs(q)
    baseline.nonEmpty shouldBe true
    q.queryExecution.executedPlan.toString should include("BroadcastNestedLoopJoin")
    withRule {
      val rq = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      pairs(rq) shouldBe baseline
      assertGridPlan(rq)
    }
  }

  test("strict and mixed bounds keep exact semantics through the residual filter") {
    // boundary-sitting points exist by construction (t and lo share values)
    val strict = pairs(points.join(intervals, $"t" > $"lo" && $"t" < $"hi"))
    val mixed = pairs(points.join(intervals, $"t" >= $"lo" && $"t" < $"hi"))
    withRule {
      pairs(points.join(intervals, $"t" > $"lo" && $"t" < $"hi")) shouldBe strict
      pairs(points.join(intervals, $"t" >= $"lo" && $"t" < $"hi")) shouldBe mixed
    }
    strict should not be mixed // the fixture actually exercises the boundary
  }

  test("sides reversed (intervals JOIN points) and flipped comparisons rewrite too") {
    val q = intervals.join(points, $"lo" <= $"t" && $"hi" >= $"t")
    val baseline = pairs(q)
    withRule {
      val rq = intervals.join(points, $"lo" <= $"t" && $"hi" >= $"t")
      pairs(rq) shouldBe baseline
      assertGridPlan(rq)
    }
  }

  test("joins with a cross-side equi key are left alone") {
    val p2 = points.withColumn("k", $"pid" % 7)
    val i2 = intervals.withColumn("k", $"iid" % 7)
    withRule {
      val rq = p2.join(i2, p2("k") === i2("k") && $"t" >= $"lo" && $"t" <= $"hi")
      val plan = rq.queryExecution.executedPlan.toString
      plan should not include "__lvl" // planner's own hash join on k suffices
      rq.count() should be > 0L
    }
  }

  test("an explicit user join hint disables the rewrite (hint honored, not dropped)") {
    val baseline = pairs(points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi"))
    withRule {
      val hinted = points.join(intervals.hint("broadcast"), $"t" >= $"lo" && $"t" <= $"hi")
      val plan = hinted.queryExecution.executedPlan.toString
      // The user asked for broadcast: the rule must leave the join alone
      // (the spliced grid subplan would silently discard the hint).
      plan should not include "__lvl"
      plan should include("BroadcastNestedLoopJoin")
      pairs(hinted) shouldBe baseline
    }
  }

  test("spark.graft.rangeJoin.enabled=false disables the rewrite") {
    withRule {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
          .queryExecution.executedPlan.toString should include("BroadcastNestedLoopJoin")
      } finally spark.conf.unset("spark.graft.rangeJoin.enabled")
    }
  }

  test("extensions-injected session rewrites SQL BETWEEN joins") {
    spark.sparkContext // ensure the shared context exists first
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      (0 until 500).map(p => (p, p * 23.0 - 3000.0)).toDF("pid", "t")
        .createOrReplaceTempView("rr_pts")
      (0 until 60).map { i =>
        val start = (i % 20) * 350.0 - 3500.0
        (i, start, start + math.pow(10.0, i % 5))
      }.toDF("iid", "lo", "hi").createOrReplaceTempView("rr_ivs")
      val q = s2.sql("SELECT pid, iid FROM rr_pts JOIN rr_ivs ON t BETWEEN lo AND hi")
      assertGridPlan(q.toDF())
      q.as[(Int, Int)].collect().toSet shouldBe pairs(
        points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi"))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
