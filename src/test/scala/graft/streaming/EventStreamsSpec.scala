package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structured Streaming slice: watermarked tumbling windows (late-data
  * drop) and gap sessionization with custom state.
  */
class EventStreamsSpec extends AnyFunSuite with Matchers with SparkTest {
  import EventStreams.Event
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts: tumbling windows aggregate; late data beyond the watermark is dropped") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.windowedCounts(in.toDF(), window = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update()).start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:30:00"), 1, "view", 2.0))
      q.processAllAvailable()
      // Advance the watermark to 11:00 (13:00 - 2h).
      in.addData(Event(3, ts("2024-01-01 13:00:00"), 2, "view", 4.0))
      q.processAllAvailable()
      // 08:00 is before the 11:00 watermark -> its window is closed, row dropped.
      in.addData(Event(4, ts("2024-01-01 08:00:00"), 3, "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .groupBy($"window_start", $"event_type").agg(org.apache.spark.sql.functions.max($"n").as("n"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
      rows("2024-01-01 10:00:00.0") shouldBe 2L
      rows.get("2024-01-01 08:00:00.0") shouldBe None
    } finally q.stop()
  }

  test("windowedDistinctUsers: custom KMV aggregate holds O(k) streaming state, exact below k") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.windowedDistinctUsers(in.toDF(), windowDur = "1 hour", k = 64)
      .writeStream.format("memory").queryName("wdu").outputMode(OutputMode.Update()).start()
    try {
      // window 10:00: users 1,2,3 (user 1 twice); window 11:00: users 7,8 —
      // delivered across TWO micro-batches so the sketch buffer round-trips
      // the state store and merges.
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 2, "view", 1.0))
      q.processAllAvailable()
      in.addData(
        Event(3, ts("2024-01-01 10:20:00"), 1, "view", 1.0),
        Event(4, ts("2024-01-01 10:30:00"), 3, "view", 1.0),
        Event(5, ts("2024-01-01 11:05:00"), 7, "view", 1.0),
        Event(6, ts("2024-01-01 11:10:00"), 8, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wdu")
        .groupBy($"window_start")
        .agg(
          org.apache.spark.sql.functions.max($"approx_users").as("u"),
          org.apache.spark.sql.functions.max($"n_events").as("n"))
        .collect().map(r => r.getTimestamp(0).toString -> (r.getDouble(1), r.getLong(2))).toMap
      rows("2024-01-01 10:00:00.0") shouldBe ((3.0, 4L)) // 3 distinct users, 4 events
      rows("2024-01-01 11:00:00.0") shouldBe ((2.0, 2L))
    } finally q.stop()
  }

  test("sessionize: gap splits sessions; closed sessions emit on the next event") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0))
      q.processAllAvailable()
      // 3 hours later: previous session (2 events) closes and is emitted.
      in.addData(Event(3, ts("2024-01-01 13:00:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[EventStreams.Session].collect()
      sessions.length shouldBe 1
      val s = sessions.head
      s.user_id shouldBe 1L
      s.n_events shouldBe 2L
      s.total_value shouldBe 3.0 +- 1e-9
      s.session_start shouldBe ts("2024-01-01 10:00:00")
      s.session_end shouldBe ts("2024-01-01 10:10:00")
    } finally q.stop()
  }

  test("attributionJoin: stream-stream interval join attributes purchases to in-window views") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventStreams.attributionJoin(views.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("attr").outputMode(OutputMode.Append()).start()
    try {
      views.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        Event(2, ts("2024-01-01 10:00:00"), 2, "view", 0.0))
      buys.addData(
        Event(10, ts("2024-01-01 10:30:00"), 1, "purchase", 9.99), // in window for view 1
        Event(11, ts("2024-01-01 12:30:00"), 2, "purchase", 5.00)) // outside the 1 h window
      q.processAllAvailable()
      val rows = spark.table("attr")
        .select("user_id", "purchase_id", "view_id")
        .as[(Long, Long, Long)].collect().toSet
      rows shouldBe Set((1L, 10L, 1L))
    } finally q.stop()
  }

  test("attributionJoin: batch twin (q31 shape) agrees with the stream on the fixture") {
    // The repo's stream/batch pattern: withWatermark on a batch frame is a
    // legal no-op, so the SAME attributionJoin code runs bounded — q31
    // oracle-checks that form; this pins that both forms agree.
    implicit val sq = spark.sqlContext
    val vData = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Event(2, ts("2024-01-01 10:00:00"), 2, "view", 0.0),
      Event(3, ts("2024-01-01 10:50:00"), 1, "view", 0.0))
    val pData = Seq(
      Event(10, ts("2024-01-01 10:30:00"), 1, "purchase", 9.99), // in window of view 1 only
      Event(11, ts("2024-01-01 12:30:00"), 2, "purchase", 5.00), // outside every window
      Event(12, ts("2024-01-01 11:20:00"), 1, "purchase", 7.50)) // in window of view 3 only
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventStreams.attributionJoin(views.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("attr_twin").outputMode(OutputMode.Append()).start()
    val streamed =
      try {
        views.addData(vData: _*)
        buys.addData(pData: _*)
        q.processAllAvailable()
        spark.table("attr_twin").select("user_id", "purchase_id", "view_id", "amount")
          .as[(Long, Long, Long, Double)].collect().toSet
      } finally q.stop()
    val batch = EventStreams.attributionJoin(vData.toDF(), pData.toDF())
      .select("user_id", "purchase_id", "view_id", "amount")
      .as[(Long, Long, Long, Double)].collect().toSet
    batch shouldBe streamed
    batch.map(t => (t._1, t._2, t._3)) shouldBe Set((1L, 10L, 1L), (1L, 12L, 3L))
  }

  test("CatalogStream: streaming catalog build appends each micro-batch (fetch_metadata upgrade)") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-catstream").toString
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(String, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/$name")
      rows.foreach { case (p, b) => w.println(s"""{"prefix": "$p", "body": "${b.replace("\"", "\\\"")}"}""") }
      w.close()
    }
    writeBatch("b1.json", Seq(
      ("AK_One_2010/", """{"bounds":[1.0,2.0,0.0,11.0,12.0,9.0],"points":5}"""),
      ("Bad_Row/", "not json")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("prefix", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("body", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).json(srcDir)
    val q1 = CatalogStream.build(stream, s"$root/sink", s"$root/chk")
    q1.awaitTermination(60000)
    spark.read.parquet(s"$root/sink").count() shouldBe 1L // bad row dropped
    // second batch arrives; AvailableNow restart picks up only the new file
    writeBatch("b2.json", Seq(("IA_Two_2011/", """{"bounds":[0.0,0.0,0.0,5.0,5.0,5.0],"points":9}""")))
    val q2 = CatalogStream.build(spark.readStream.schema(schema).json(srcDir), s"$root/sink", s"$root/chk")
    q2.awaitTermination(60000)
    val cat = spark.read.parquet(s"$root/sink").orderBy("filename").collect()
    cat.map(_.getString(0)).toSeq shouldBe Seq("AK_One_2010", "IA_Two_2011")
    cat.head.getAs[Long]("points") shouldBe 5L

    // Exactly-once on replay: drop batch 1's commit marker so the engine
    // re-executes that micro-batch on restart (foreachBatch is at-least-once
    // per batchId); the batch_id=1 overwrite must not duplicate rows.
    // (the commit file plus its Hadoop .crc checksum sidecar — an orphan
    // sidecar trips Spark 4.1's concurrent-modification guard on rewrite)
    new java.io.File(s"$root/chk/commits").listFiles()
      .filter(f => f.getName == "1" || f.getName.startsWith(".1."))
      .foreach(f => f.delete() shouldBe true)
    val q3 = CatalogStream.build(spark.readStream.schema(schema).json(srcDir), s"$root/sink", s"$root/chk")
    q3.awaitTermination(60000)
    val replayed = spark.read.parquet(s"$root/sink").orderBy("filename").collect()
    replayed.map(_.getString(0)).toSeq shouldBe Seq("AK_One_2010", "IA_Two_2011")
  }

  test("windowedTopUsers: MG sketch rides streaming state; final ranks agree with the batch twin") {
    implicit val sq = spark.sqlContext
    // window A (10:00): user 1 x3, user 2 x1 — one micro-batch, one emission.
    // window B (11:00): user 7 arrives in batch 1, then 2 more 7s and an 8
    // in batch 2, so B's sketch round-trips the state store and its final
    // counts strictly exceed the interim ones.
    val batch1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 1, "view", 1.0),
      Event(3, ts("2024-01-01 10:20:00"), 1, "view", 1.0),
      Event(4, ts("2024-01-01 10:30:00"), 2, "view", 1.0),
      Event(5, ts("2024-01-01 11:05:00"), 7, "view", 1.0))
    val batch2 = Seq(
      Event(6, ts("2024-01-01 11:10:00"), 7, "view", 1.0),
      Event(7, ts("2024-01-01 11:15:00"), 7, "view", 1.0),
      Event(8, ts("2024-01-01 11:20:00"), 8, "view", 1.0))
    val in = MemoryStream[Event]
    val q = EventStreams.windowedTopUsers(in.toDF(), m = 16, topK = 3)
      .writeStream.format("memory").queryName("wtu").outputMode(OutputMode.Update()).start()
    val streamed =
      try {
        in.addData(batch1: _*); q.processAllAvailable()
        in.addData(batch2: _*); q.processAllAvailable()
        // Update mode re-emits a window on each batch; counts per rank only
        // grow, so max(cnt_lo) per (window, rnk) selects the final emission
        spark.table("wtu")
          .groupBy($"window_start", $"rnk")
          .agg(org.apache.spark.sql.functions.max($"cnt_lo").as("cnt"))
          .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
      } finally q.stop()
    val batch = EventStreams.windowedTopUsers((batch1 ++ batch2).toDF(), m = 16, topK = 3)
      .select($"window_start", $"rnk", $"cnt_lo")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
    streamed shouldBe batch
    batch should contain(("2024-01-01 10:00:00.0", 1L, 3L)) // user 1 dominates A
    batch should contain(("2024-01-01 11:00:00.0", 1L, 3L)) // user 7 dominates B
  }

  test("anomalyIngest: streaming prequential z-scores agree with the batch window twin across micro-batches") {
    implicit val sq = spark.sqlContext
    // user 1: six calm events, then a spike, then calm again; user 2 stays
    // calm throughout (no anomaly). minPrior=5 keeps the fixture small.
    def e(id: Long, u: Long, min: Int, v: Double) =
      Event(id, ts(f"2024-01-01 10:$min%02d:00"), u, "m", v)
    val calm1 = (1 to 6).map(i => e(i, 1, i, 10.0 + 0.01 * i))
    val spike = Seq(e(7, 1, 7, 95.5))
    val after = Seq(e(8, 1, 8, 10.04), e(9, 1, 9, 10.02))
    val calm2 = (11 to 18).map(i => e(100 + i, 2, i, 5.0 + 0.01 * (i % 3)))
    val all = calm1 ++ spike ++ after ++ calm2

    val in = MemoryStream[Event]
    val q = EventStreams.anomalyIngest(in.toDS(), minPrior = 5)
      .writeStream.format("memory").queryName("anom").outputMode(OutputMode.Append()).start()
    val streamed =
      try {
        // split mid-history so state crosses a micro-batch boundary
        in.addData(calm1 ++ calm2.take(4): _*)
        q.processAllAvailable()
        in.addData(spike ++ after ++ calm2.drop(4): _*)
        q.processAllAvailable()
        spark.table("anom").as[(Long, Long, Double)].collect().toSet
      } finally q.stop()

    val batch = EventStreams.anomalyBatch(all.toDF(), minPrior = 5)
      .as[(Long, Long, Double)].collect().toSet
    streamed shouldBe batch
    // the spike is flagged, with the identical rounded z on both paths
    streamed.map(_._2) should contain(7L)
    streamed.map(_._1) should not contain 2L
  }

  test("scd2: status changes close versions across micro-batches; same-status events extend them") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.scd2(in.toDS())
      .writeStream.format("memory").queryName("scd2_s").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 views twice, then clicks — closes (view, 10:00-10:20, 2)
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "view", 0.0),
        Event(3, ts("2024-01-01 10:20:00"), 1, "click", 0.0))
      q.processAllAvailable()
      // batch 2: the open click version survives the batch boundary, extends
      // once, then a purchase closes it — (click, 10:20-10:40, 2, version 2)
      in.addData(
        Event(4, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
        Event(5, ts("2024-01-01 10:40:00"), 1, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("scd2_s")
        .as[EventStreams.Scd2Row].collect().sortBy(r => (r.user_id, r.version))
      rows.map(r => (r.version, r.status, r.valid_from.toString, r.valid_to.toString, r.n_events)).toSeq shouldBe Seq(
        (1L, "view", "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0", 2L),
        (2L, "click", "2024-01-01 10:20:00.0", "2024-01-01 10:40:00.0", 2L))
    } finally q.stop()
  }

  test("scd2: streamed closed versions equal batch x54's is_current=0 rows on the fixture") {
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // Per-user time order is the stream's delivery contract; a global
    // (ts, event_id) sort satisfies it for every user at once.
    val feed = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .as[Event].collect()
    val in = MemoryStream[Event]
    val q = EventStreams.scd2(in.toDS())
      .writeStream.format("memory").queryName("scd2_twin").outputMode(OutputMode.Append()).start()
    val streamed =
      try {
        // three arbitrary micro-batch splits — version state must carry over
        feed.grouped((feed.length / 3).max(1)).foreach { b =>
          in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
        }
        spark.table("scd2_twin").as[EventStreams.Scd2Row].collect()
          .map(r => (r.user_id, r.version, r.status, r.valid_from, r.valid_to, r.n_events)).toSet
      } finally q.stop()
    val batch = graft.SparkEntry.queries("x54_scd2_history")(spark, dir)
      .filter("is_current = 0")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3), r.getTimestamp(4), r.getLong(5)))
      .toSet
    streamed shouldBe batch
    streamed.size should be > 100
  }

  test("windowedCounts is the streaming form of batch q10 (same results on a bounded frame)") {
    val batch = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 10:30:00"), 1, "view", 2.0),
      Event(3, ts("2024-01-01 11:05:00"), 2, "click", 4.0)).toDF()
    // The same plan runs in batch mode (watermark is a no-op there).
    val out = EventStreams.windowedCounts(batch)
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    out.toSeq shouldBe Seq(
      ("2024-01-01 10:00:00.0", "view", 2L),
      ("2024-01-01 11:00:00.0", "click", 1L))
  }
}
