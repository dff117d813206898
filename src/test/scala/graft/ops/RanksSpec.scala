package graft.ops

import graft.SparkTest
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Ranks.groupPercentRank (ops/Ranks.scala): the bucket-decomposed
  * per-group percent_rank must be BIT-IDENTICAL to the naive
  * single-partition window form on every input shape — random values,
  * heavy ties, skewed groups, single-row groups, all-equal groups —
  * because x64's oracle IS the naive form.
  */
class RanksSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  /** The naive form the operator replaces (and the oracle computes). */
  private def naive(rows: Seq[(Long, String, Double)]): Map[Long, Double] = {
    val df = rows.toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    df.withColumn("pct", percent_rank().over(w))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct")).toMap
  }

  private def bucketed(rows: Seq[(Long, String, Double)]): Map[Long, Double] =
    Ranks.groupPercentRank(rows.toDF("id", "g", "v"), "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap

  private def check(rows: Seq[(Long, String, Double)], clue: String): Unit = {
    val expect = naive(rows)
    val got = bucketed(rows)
    withClue(s"$clue: ") {
      got.keySet shouldBe expect.keySet
      // exact equality on purpose: both sides are integer/integer double
      // divisions of the same integers
      for ((id, p) <- expect) got(id) shouldBe p
    }
  }

  test("randomized sweep: matches the naive window exactly, incl. ties") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val rows = (1L to 400L).map { id =>
        val g = s"g${rnd.nextInt(4)}"
        // coarse quantization => plenty of cross-row ties within a group
        val v = math.rint(rnd.nextDouble() * 50) / 50.0
        (id, g, v)
      }
      check(rows, s"trial $trial")
    }
  }

  test("degenerate groups: single row -> 0.0, all-equal values -> all 0.0") {
    val rows = Seq(
      (1L, "solo", 3.14),
      (2L, "flat", 7.0), (3L, "flat", 7.0), (4L, "flat", 7.0),
      (5L, "pair", 1.0), (6L, "pair", 2.0))
    check(rows, "degenerate")
    val got = bucketed(rows)
    got(1L) shouldBe 0.0
    got(2L) shouldBe 0.0
    got(6L) shouldBe 1.0
  }

  test("extreme skew: one giant group among tiny ones") {
    val rnd = new Random(7)
    val giant = (1L to 1200L).map(id => (id, "giant", rnd.nextDouble()))
    val tiny = Seq((2001L, "t1", 0.5), (2002L, "t1", 0.6), (2003L, "t2", 0.9))
    check(giant ++ tiny, "skew")
  }

  test("groupRowNumber matches the naive window exactly, incl. value collisions") {
    val rnd = new Random(11)
    val rows = (1L to 500L).map { id =>
      // coarse values => collisions the doc_id tie-break must resolve
      (id, s"g${rnd.nextInt(3)}", (rnd.nextInt(40) * 1.0))
    }
    val df = rows.toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expect = df.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    val got = Ranks.groupRowNumber(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("row_num")).toMap
    got shouldBe expect
  }

  test("values spanning negative ranges and repeated min/max") {
    val rows = Seq(
      (1L, "g", -5.0), (2L, "g", -5.0), (3L, "g", 0.0),
      (4L, "g", 2.5), (5L, "g", 2.5), (6L, "g", 2.5))
    // ranks: -5,-5 -> 1; 0 -> 3; 2.5 x3 -> 4; pct = (rank-1)/5
    val got = bucketed(rows)
    got(1L) shouldBe 0.0
    got(2L) shouldBe 0.0
    got(3L) shouldBe 0.4
    got(4L) shouldBe 0.6
    got(6L) shouldBe 0.6
    check(rows, "negatives")
  }
}
