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
}
