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

  test("poisoned input (null/NaN value) fails loudly instead of emitting wrong ranks") {
    val poisonNaN = Seq((1L, "g", 1.0), (2L, "g", Double.NaN), (3L, "g", 2.0))
    val poisonNull = Seq((1L, "g", Some(1.0)), (2L, "g", None), (3L, "g", Some(2.0)))
    val eNaN = intercept[Exception] {
      Ranks.groupPercentRank(poisonNaN.toDF("id", "g", "v"), "g", "v").collect()
    }
    eNaN.getMessage should include("Ranks: null/NaN in value column 'v'")
    val eNull = intercept[Exception] {
      Ranks.groupPercentRank(poisonNull.toDF("id", "g", "v"), "g", "v").collect()
    }
    eNull.getMessage should include("Ranks: null/NaN in value column 'v'")
    val eRn = intercept[Exception] {
      Ranks.groupRowNumber(poisonNaN.toDF("id", "g", "v"), "g", "v", "id").collect()
    }
    eRn.getMessage should include("Ranks: null/NaN in value column 'v'")
    // tie poisoning is caught too (the tie drives the sub-bucket math)
    val poisonTie = Seq((1.0, "g", 1.0), (Double.NaN, "g", 2.0))
    val eTie = intercept[Exception] {
      Ranks.groupRowNumber(poisonTie.toDF("id", "g", "v"), "g", "v", "id").collect()
    }
    eTie.getMessage should include("Ranks: null/NaN in tie column 'id'")
  }

  test("99%-tie group: exact row numbers with NO group-sized window partition") {
    // 5,000 rows, 99% one tied value — the round-10 skew scenario: the
    // old within-bucket window put the whole tie cluster (= the whole
    // group) in one sort partition; the tie sub-bucket decomposition
    // must (a) still be exact and (b) partition the final window on the
    // (group, bucket, value, tie-bucket) key.
    val rows = (1L to 5000L).map(id => (id, "g", if (id % 100 == 0) id * 1.0 else 7.0))
    val df = rows.toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expect = df.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    val ranked = Ranks.groupRowNumber(df, "g", "v", "id")
    val got = ranked.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("row_num")).toMap
    got shouldBe expect
    // the only data-sized window partitions on the tie sub-bucket key
    val plan = ranked.queryExecution.executedPlan.toString
    plan should include("_tbkt")
    // percent_rank side: the tie cluster is ONE histogram row — no
    // data-sized window at all (every Window's partition spec carries
    // the bucket and/or value refinement, never bare [g])
    val pct = Ranks.groupPercentRank(df, "g", "v")
    val naiveW = Window.partitionBy(col("g")).orderBy(col("v"))
    val expPct = df.withColumn("p", percent_rank().over(naiveW))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("p")).toMap
    val gotPct = pct.collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    gotPct shouldBe expPct
    pct.queryExecution.executedPlan.toString should not include "rank("
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
