package graft.plans

import java.sql.Timestamp

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Native as-of join: merge semantics against a brute-force baseline, null
  * handling, left-outer behavior, and the SMJ-style plan contract.
  */
class AsOfJoinSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left time, per key") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2024-01-01 10:00:20"), 101.0),
      (3L, "B", ts("2024-01-01 10:00:10"), 50.0),
      (4L, "C", ts("2024-01-01 10:00:10"), 7.0)) // no quotes for C
      .toDF("trade_id", "sym", "t", "px")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 99.5),
      ("A", ts("2024-01-01 10:00:05"), 99.9), // tie with trade 1: inclusive
      ("A", ts("2024-01-01 10:00:15"), 100.5),
      ("B", ts("2024-01-01 10:00:12"), 49.0)) // after trade 3: no match
      .toDF("qsym", "qt", "bid")
    val out = AsOf.join(trades, quotes, Seq("sym" -> "qsym"), "t" -> "qt")
      .select($"trade_id", $"bid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    out(1L) shouldBe Some(99.9)  // inclusive >= takes the 10:00:05 quote
    out(2L) shouldBe Some(100.5) // latest at or before 10:00:20
    out(3L) shouldBe None        // only quote for B is later
    out(4L) shouldBe None        // left outer: key with no right rows survives
  }

  test("matches a brute-force window baseline on random data (many keys, dup times)") {
    val rnd = new scala.util.Random(11)
    val lefts = (0 until 2000).map(i =>
      (i.toLong, (rnd.nextInt(40)).toLong, rnd.nextInt(1000).toLong)).toDF("lid", "k", "t")
    val rights = (0 until 600).map(i =>
      ((rnd.nextInt(40)).toLong, rnd.nextInt(1000).toLong, i.toLong)).toDF("rk", "rt", "rid")
      .groupBy("rk", "rt").agg(max("rid").as("rid")) // unique (key, time); tie rule = any consistent pick
    val viaOp = AsOf.join(lefts, rights, Seq("k" -> "rk"), "t" -> "rt")
      .select($"lid", $"rt", $"rid")
    val brute = lefts.join(rights, $"k" === $"rk" && $"t" >= $"rt", "left_outer")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lid").orderBy($"rt".desc_nulls_last, $"rid".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"lid", $"rt", $"rid")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    m(viaOp) shouldBe m(brute)
  }

  test("null keys and null times never match but rows survive (left outer)") {
    val l = Seq(
      (1L, Option(1L), Option(10L)),
      (2L, None: Option[Long], Option(10L)),  // null key
      (3L, Option(1L), None: Option[Long]))   // null time
      .toDF("lid", "k", "t")
    val r = Seq(
      (Option(1L), Option(5L), "x"),
      (None: Option[Long], Option(1L), "nullkey"),
      (Option(1L), None: Option[Long], "nulltime"))
      .toDF("rk", "rt", "tag")
    val out = AsOf.join(l, r, Seq("k" -> "rk"), "t" -> "rt")
      .select($"lid", $"tag").collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    out(1L) shouldBe Some("x")
    out(2L) shouldBe None
    out(3L) shouldBe None
  }

  test("plan: one exchange + sort per side feeding AsOfJoinExec (the SMJ contract)") {
    val lefts = (0 until 100).map(i => (i.toLong, (i % 5).toLong, i.toLong)).toDF("lid", "k", "t")
    val rights = (0 until 50).map(i => ((i % 5).toLong, i.toLong, i.toLong)).toDF("rk", "rt", "rid")
    val df = AsOf.join(lefts, rights, Seq("k" -> "rk"), "t" -> "rt")
    df.collect() // force final adaptive plan
    // (nodeName strips the Exec suffix; count only the Final Plan section —
    // the adaptive string repeats the tree under "== Initial Plan ==")
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    plan should include("AsOfJoin [k")
    plan should include("Sort [k")
    plan should include("Sort [rk")
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 2
  }

  test("mismatched input partitionings reconcile (EnsureRequirements co-partitions both sides)") {
    // left pre-shuffled on an unrelated column into an odd partition count,
    // right a skinny local frame: the planner must still co-partition both
    // sides on the keys before the zip-merge.
    val lefts = (0 until 500).map(i => (i.toLong, (i % 9).toLong, i.toLong))
      .toDF("lid", "k", "t").repartition(7, $"lid")
    val rights = (0 until 90).map(i => ((i % 9).toLong, (i * 7 % 500).toLong, i.toLong))
      .toDF("rk", "rt", "rid").repartition(3, $"rt")
    val out = AsOf.join(lefts, rights, Seq("k" -> "rk"), "t" -> "rt")
    out.count() shouldBe 500L // left outer: every left row exactly once
    // spot-check one value against the definition
    val row = out.filter($"lid" === 499).select($"rt").head()
    val expect = (0 until 90).map(i => ((i % 9).toLong, (i * 7 % 500).toLong))
      .filter { case (rk, rt) => rk == 499 % 9 && rt <= 499 }
      .map(_._2).sorted.lastOption
    Option(row.get(0)).map(_.asInstanceOf[Long]) shouldBe expect
  }

  test("mismatched key or time types fail fast instead of corrupting the merge") {
    // The logical node is built from already-analyzed children, so Catalyst
    // coercion never runs: an int-vs-long key would compare UnsafeRows of
    // different physical layouts and silently return wrong rows.
    val l = Seq((1, 10L)).toDF("k", "t")
    val rKeyMismatch = Seq((1L, 5L)).toDF("k2", "t2")
    (the[IllegalArgumentException] thrownBy
      AsOf.join(l, rKeyMismatch, Seq("k" -> "k2"), "t" -> "t2")).getMessage should
      include("key type mismatch")
    val rTimeMismatch = Seq((1, 5)).toDF("k2", "t2")
    (the[IllegalArgumentException] thrownBy
      AsOf.join(l, rTimeMismatch, Seq("k" -> "k2"), "t" -> "t2")).getMessage should
      include("time type mismatch")
  }

  test("q28 equals q12 (emulated vs native as-of) on the real events fixture") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("q12_asof_join")(spark, dir).collect().toSeq
    val b = graft.SparkEntry.queries("q28_asof_native")(spark, dir).collect().toSeq
    b shouldBe a
  }
}
