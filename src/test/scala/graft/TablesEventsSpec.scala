package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins Tables.events' timestamp normalization against ALL THREE fixture
  * encodings the driver has shipped (or could ship) for `events.ts`:
  *
  *   1. nanos-as-long  — the original TIMESTAMP(NANOS) fixture, which the
  *      `spark.sql.legacy.parquet.nanosAsLong` sessions read as LongType;
  *   2. NTZ micros     — the round-7 regeneration:
  *      TIMESTAMP(isAdjustedToUTC=false, MICROS) → Spark TIMESTAMP_NTZ.
  *      This encoding broke q23/q27/q31/x42 in round 7 (DATATYPE_MISMATCH
  *      on unix_seconds/millis/micros) because Tables.events had no NTZ arm;
  *   3. LTZ micros     — plain TimestampType, the vanilla Spark encoding.
  *
  * Every event-time query that round 7 lost (q23 sessionize, q27 session
  * window, q31 attribution, x42 burst dedup) must produce IDENTICAL rows on
  * all three encodings under the UTC session timezone. Fixture regeneration
  * is driver-controlled and has already drifted once — this spec is the
  * tripwire for the next drift.
  */
class TablesEventsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  // Engineered stream (ts in epoch micros), exercising every code path:
  //  - user 1: two sessions (40-min gap > 30-min sessionize gap), a burst
  //    (<300 s apart, same event_type) for x42 to collapse, and a
  //    view→purchase pair 30 min apart (inside q31's 1-hour horizon);
  //  - user 2: a view→purchase pair 90 min apart (OUTSIDE the horizon —
  //    q31 must drop it) and an exact-gap boundary event (300 s exactly,
  //    which x42's strict `>` must also drop).
  private val H = 3600L * 1000000L // one hour in micros
  private val base = 1700000000L * 1000000L
  private val rows: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    // (event_id, ts_us, user_id, event_type, value, props)
    (1L, base, 1L, "view", 1.0, "{}"),
    (2L, base + 100L * 1000000L, 1L, "click", 2.0, "{}"), // burst w/ #4? no: diff type
    (3L, base + 200L * 1000000L, 1L, "click", 3.0, "{}"), // 100 s after #2 → dropped by x42
    (4L, base + 30L * 60L * 1000000L, 1L, "purchase", 9.99, "{}"), // 30 min after view #1 → attributed
    (5L, base + 70L * 60L * 1000000L, 1L, "view", 4.0, "{}"), // 40-min gap → new session
    (6L, base + 2L * H, 2L, "view", 5.0, "{}"),
    (7L, base + 2L * H + 90L * 60L * 1000000L, 2L, "purchase", 19.99, "{}"), // 90 min → NOT attributed
    (8L, base + 2L * H + 90L * 60L * 1000000L + 300L * 1000000L, 2L, "purchase", 29.99, "{}") // exactly 300 s → x42 drops
  )

  private def baseDf: DataFrame =
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")

  private def writeFixture(encode: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("events-encoding").toString
    encode(baseDf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // The three encodings. The nanos fixture itself can't be produced by
  // Spark (it never writes TIMESTAMP(NANOS)), but what Tables.events
  // OBSERVES under nanosAsLong is a LongType nanos column — written here
  // directly, same observable input, same normalization arm.
  private lazy val dirLong = writeFixture(df =>
    df.withColumn("ts", (col("ts_us") * 1000L).cast("long")))
  private lazy val dirNtz = writeFixture(df =>
    df.withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType)))
  private lazy val dirLtz = writeFixture(df =>
    df.withColumn("ts", timestamp_micros(col("ts_us"))))

  private val encodings = Seq("nanos-as-long" -> (() => dirLong),
    "ntz-micros" -> (() => dirNtz), "ltz-micros" -> (() => dirLtz))

  test("Tables.events normalizes every encoding to TimestampType micros") {
    encodings.foreach { case (label, dir) =>
      val df = Tables.events(spark, dir())
      withClue(s"[$label] ") {
        df.schema("ts").dataType shouldBe TimestampType
        df.select(unix_micros(col("ts"))).as[Long].collect().sorted shouldBe
          rows.map(_._2).sorted
      }
    }
  }

  // The four queries round 7 lost to the NTZ drift: identical results on
  // every encoding, and the expected row shapes on the engineered stream.
  test("q23/q27/q31/x42 agree across all three ts encodings") {
    Seq("q23_sessionize_batch", "q27_session_window", "q31_attribution",
      "x42_burst_dedup").foreach { q =>
      val results = encodings.map { case (label, dir) =>
        label -> SparkEntry.queries(q)(spark, dir()).collect().map(_.toString).toSeq
      }
      val (refLabel, ref) = results.head
      ref should not be empty
      results.tail.foreach { case (label, got) =>
        withClue(s"[$q: $label vs $refLabel] ") { got shouldBe ref }
      }
    }
  }

  test("engineered semantics hold: session split, horizon cut, burst drop") {
    // q23: user 1 → sessions {1,2,3,4} + {5} (40-min gap before #5);
    //      user 2 → sessions {6} + {7,8} (90-min gap before #7).
    val q23 = SparkEntry.queries("q23_sessionize_batch")(spark, dirNtz)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    q23 shouldBe Seq((1L, 2L, 4L, 2L), (2L, 2L, 2L, 2L))
    // q31: only user 1's purchase is inside the 1-hour horizon.
    val q31 = SparkEntry.queries("q31_attribution")(spark, dirNtz).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    q31 shouldBe Seq((1L, 4L, 1L))
    // x42: burst follower #3 (100 s gap) and exact-boundary #8 (300 s) drop.
    val x42 = SparkEntry.queries("x42_burst_dedup")(spark, dirNtz)
      .select("event_id").as[Long].collect().toSet
    x42 shouldBe Set(1L, 2L, 4L, 5L, 6L, 7L)
  }
}
