package graft.ops

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Gap-fill semantics (ops/TimeSeries.scala): hand-computed dense grids,
  * forward-fill carry, observed flags, and the per-key span contract
  * (no extrapolation outside [min, max], no cross-key leakage).
  */
class TimeSeriesSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double)]): Seq[(Long, Long, Long, Int, Double)] =
    TimeSeries.gapFillForward(rows.toDF("key", "bucket", "cnt", "metric"))
      .orderBy("key", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSeq

  test("gaps fill with zero counts and the last observed metric") {
    run(Seq((1L, 10L, 2L, 5.0), (1L, 13L, 1L, 7.0), (2L, 4L, 3L, 1.5))) shouldBe Seq(
      (1L, 10L, 2L, 1, 5.0),
      (1L, 11L, 0L, 0, 5.0),   // silent hour: cnt 0, metric carried from 10
      (1L, 12L, 0L, 0, 5.0),
      (1L, 13L, 1L, 1, 7.0),   // new observation replaces the carry
      (2L, 4L, 3L, 1, 1.5))    // single-bucket key: span is one row
  }

  test("fill restarts at each observation, not just the first") {
    run(Seq((7L, 0L, 1L, 1.0), (7L, 2L, 1L, 2.0), (7L, 5L, 1L, 3.0)))
      .map { case (_, b, _, _, f) => b -> f } shouldBe
      Seq(0L -> 1.0, 1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 2.0, 5L -> 3.0)
  }

  test("no extrapolation outside a key's own [min, max] span") {
    val got = run(Seq((1L, 5L, 1L, 9.0), (2L, 100L, 1L, 4.0), (2L, 101L, 1L, 6.0)))
    got.filter(_._1 == 1L).map(_._2) shouldBe Seq(5L)
    got.filter(_._1 == 2L).map(_._2) shouldBe Seq(100L, 101L)
  }

  test("first grid row is always observed, so filled is never null") {
    val df = TimeSeries.gapFillForward(
      Seq((3L, 1L, 1L, 2.5), (3L, 4L, 2L, 0.5)).toDF("key", "bucket", "cnt", "metric"))
    df.filter("filled IS NULL").count() shouldBe 0L
    df.count() shouldBe 4L
  }

  test("epochHour buckets micros timestamps by exact integer division") {
    val got = Seq("2024-01-01 00:59:59.999999", "2024-01-01 01:00:00.000000")
      .toDF("s")
      .select(TimeSeries.epochHour("CAST(s AS TIMESTAMP)").as("hr"))
      .collect().map(_.getLong(0)).toSeq
    got.distinct.size shouldBe 2      // the micros boundary splits the hours
    got(1) - got(0) shouldBe 1L
  }

  test("epochHour FLOORS pre-1970 timestamps like the oracle's //, not div's truncation") {
    // 1969-12-31 23:30 UTC = -1.8e9 micros; floor(-0.5 h) = hour -1, while
    // a truncating div would bucket it at 0 — one hour apart from DuckDB.
    val got = Seq("1969-12-31 23:30:00", "1970-01-01 00:30:00", "1969-12-31 22:59:59.999999")
      .toDF("s")
      .select(TimeSeries.epochHour("CAST(s AS TIMESTAMP)").as("hr"))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(-1L, 0L, -2L)
  }

  test("maxSpan unset and within-cap keys reproduce the unguarded output exactly") {
    val rows = Seq((1L, 10L, 2L, 5.0), (1L, 13L, 1L, 7.0), (2L, 4L, 3L, 1.5))
    val unguarded = run(rows)
    TimeSeries.gapFillForward(rows.toDF("key", "bucket", "cnt", "metric"), maxSpan = Some(10L))
      .orderBy("key", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSeq shouldBe unguarded
  }

  test("maxSpan fails loudly on a pathological key instead of silently inflating") {
    // One stray bucket-0 row gives key 9 a 1,000,001-bucket span — the
    // silent 10x-output case the guard exists for.
    val df = Seq((9L, 0L, 1L, 1.0), (9L, 1000000L, 1L, 2.0), (2L, 5L, 1L, 3.0))
      .toDF("key", "bucket", "cnt", "metric")
    val e = intercept[Exception] {
      TimeSeries.gapFillForward(df, maxSpan = Some(1000L)).count()
    }
    e.getMessage should include("maxSpan")
    e.getMessage should include("9")  // the offending key is named
  }

  test("clipToMaxSpan keeps only each oversized key's most recent buckets") {
    val df = Seq((9L, 0L, 1L, 1.0), (9L, 1000000L, 1L, 2.0), (2L, 5L, 1L, 3.0))
      .toDF("key", "bucket", "cnt", "metric")
    val got = TimeSeries.gapFillForward(df, maxSpan = Some(3L), clipToMaxSpan = true)
      .orderBy("key", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    // key 9 clips to [999998, 1000000]; its pre-clip observation is gone
    // and the clipped grid's leading rows are unobserved (filled is null
    // there by construction — the clip is loud in the output shape).
    got shouldBe Seq(
      (2L, 5L, 1L, 1),
      (9L, 999998L, 0L, 0), (9L, 999999L, 0L, 0), (9L, 1000000L, 1L, 1))
  }
}
