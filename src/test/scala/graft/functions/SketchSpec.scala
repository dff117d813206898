package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** KMV sketch aggregate semantics: bounded distinct-min-k, merge
  * correctness across partitions, dedup of repeated hashes, SQL surface.
  */
class SketchSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  test("kMinValues keeps the k smallest DISTINCT values, ascending") {
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L, 8L).toDF("v")
    val out = df.agg(SketchExprs.kMinValues(col("v"), 4).as("m"))
      .collect().head.getSeq[Long](0)
    out shouldBe Seq(1L, 3L, 5L, 7L)
  }

  test("kMinValues with fewer than k distinct inputs returns them all") {
    val df = Seq(2L, 2L, 4L).toDF("v")
    val out = df.agg(SketchExprs.kMinValues(col("v"), 8).as("m"))
      .collect().head.getSeq[Long](0)
    out shouldBe Seq(2L, 4L)
  }

  test("kMinValues is partition-order independent (merge path)") {
    val vals = (0L until 1000L).map(i => (i * 7919L) % 104729L)
    val expected = vals.distinct.sorted.take(16)
    Seq(1, 4, 16).foreach { parts =>
      val out = vals.toDF("v").repartition(parts)
        .agg(SketchExprs.kMinValues(col("v"), 16).as("m"))
        .collect().head.getSeq[Long](0)
      out shouldBe expected
    }
  }

  test("kMinValues ignores nulls and grouped aggregation works") {
    val df = Seq(
      (Some(10L), "a"), (None, "a"), (Some(2L), "a"),
      (Some(5L), "b"), (Some(1L), "b")).toDF("v", "g")
    val out = df.groupBy(col("g"))
      .agg(SketchExprs.kMinValues(col("v"), 2).as("m"))
      .orderBy("g").collect()
    out(0).getSeq[Long](1) shouldBe Seq(2L, 10L)
    out(1).getSeq[Long](1) shouldBe Seq(1L, 5L)
  }

  test("kmin_values is reachable from SQL after registration") {
    graft.Graft.registerFunctions(spark)
    Seq(9L, 1L, 5L, 1L).toDF("v").createOrReplaceTempView("kmv_in")
    val out = spark.sql("SELECT kmin_values(v, 2) AS m FROM kmv_in")
      .collect().head.getSeq[Long](0)
    out shouldBe Seq(1L, 5L)
  }

  // --- Misra-Gries heavy hitters -------------------------------------------

  /** (key, lo, hi) rows out of the sketch. */
  private def hh(df: org.apache.spark.sql.DataFrame, m: Int, parts: Int): Seq[(Long, Long, Long)] =
    df.repartition(parts)
      .agg(SketchExprs.heavyHitters(col("v"), m).as("h"))
      .select(explode(col("h")).as("e"))
      .select(col("e.key"), col("e.lo"), col("e.hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("heavyHitters in the exact regime (m >= distinct) equals GROUP BY counts, any partitioning") {
    val vals = (0L until 2000L).map(i => i % 37L)
    val expected = vals.groupBy(identity).map { case (k, v) => (k, v.size.toLong, v.size.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1))
    Seq(1, 4, 32).foreach { parts =>
      hh(vals.toDF("v"), m = 64, parts) shouldBe expected
    }
  }

  test("heavyHitters lossy regime: bounds bracket true counts and frequent keys survive") {
    // one heavy key (40% of the stream) among 50 uniform light keys
    val heavy = Seq.fill(2000)(999L)
    val light = (0 until 3000).map(i => (i % 50).toLong)
    val vals = new scala.util.Random(42).shuffle(heavy ++ light) // MG bounds hold for ANY order
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = vals.size.toLong
    val m = 8
    Seq(1, 8).foreach { parts =>
      val out = hh(vals.toDF("v"), m, parts)
      out.size should be <= m
      out.foreach { case (k, lo, hi) =>
        lo should be <= truth(k)
        hi should be >= truth(k)
      }
      // guarantee: any key with frequency > n/(m+1) is emitted
      out.map(_._1) should contain(999L)
      withClue("heavy key bound width: ") {
        val (_, lo, hi) = out.find(_._1 == 999L).get
        (hi - lo) should be <= n / (m + 1) + 1
      }
    }
  }

  test("heavy_hitters is reachable from SQL after registration") {
    graft.Graft.registerFunctions(spark)
    Seq(7L, 7L, 7L, 2L).toDF("v").createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT e.key, e.lo FROM (SELECT explode(heavy_hitters(v, 4)) AS e FROM hh_in)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.toSeq shouldBe Seq((7L, 3L), (2L, 1L))
  }
}
