package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice (SURVEY.md §2.8).
  *
  * The reference has no streaming; its closest analog is the incremental
  * catalog-build loop (`scripts/usgs_lidar.py:257-273`). These operators are
  * the streaming upgrade path: the same event-table transformations as the
  * batch queries (q10), expressed over `readStream` with watermarked event
  * time so they run identically on an unbounded feed.
  *
  * Scale posture: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped and state evicted); sessionization state
  * is per-user and times out via GroupStateTimeout — both survive
  * 1000-executor deployments because state is keyed and checkpointed, never
  * driver-resident.
  */
object EventStreams {

  /** Tumbling-window counts + value sums per event type. Batch q10's
    * streaming form: watermark bounds state and admits bounded lateness.
    */
  def windowedCounts(events: DataFrame, window: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Windowed approximate distinct users via the custom [[graft.functions
    * .KMinValues]] sketch — custom TypedImperativeAggregates ride
    * Structured Streaming's partial/merge/state protocol exactly like
    * built-ins, so the one-pass sketch that replaces exact distincts in
    * batch (q21) bounds STREAMING state too: per window the state store
    * holds the k smallest hashes (k longs), never the user-id set — the
    * difference between O(k) and O(users) state per window on an unbounded
    * feed. Exact below k distinct keys; the (k-1)*P/kth_min estimator
    * above.
    */
  def windowedDistinctUsers(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "2 hours",
      k: Int = 64): DataFrame = {
    val P = 2147483647L
    val A = 506952114L
    val B = 12345L
    val h = (lit(A) * col("user_id").cast("long") + lit(B)) % lit(P)
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), windowDur))
      .agg(
        graft.functions.SketchExprs.kMinValues(h, k).as("kmv"),
        count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
          .otherwise(lit((k - 1).toDouble * P.toDouble) / element_at(col("kmv"), k).cast("double"))
          .as("approx_users"),
        col("n_events"))
  }

  /** Windowed top-K users via the Misra-Gries sketch
    * ([[graft.functions.HeavyHitters]]) in streaming state — the
    * heavy-hitters analog of [[windowedDistinctUsers]]: per window the
    * state store holds at most m (key, count) pairs, never the full user
    * set, so "who dominates each hour" costs O(m) state on an unbounded
    * feed. In the exact regime (m >= distinct users per window) the
    * output is deterministic — the batch twin is oracle-checked as x40;
    * on real feeds size m for the n/(m+1) error bound instead.
    */
  def windowedTopUsers(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "2 hours",
      m: Int = 1024,
      topK: Int = 3): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), windowDur))
      .agg(graft.functions.SketchExprs.heavyHitters(col("user_id").cast("long"), m).as("hh"))
      .select(
        col("window.start").as("window_start"),
        posexplode(slice(col("hh"), 1, topK)).as(Seq("p", "e")))
      .select(
        col("window_start"), (col("p") + 1).cast("long").as("rnk"),
        col("e.key").as("user_id"), col("e.lo").as("cnt_lo"), col("e.hi").as("cnt_hi"))

  /** Stream-stream attribution join: each purchase joins the view(s) by the
    * same user within the preceding `windowSpec` — the watermarked
    * stream-stream interval join (state on BOTH sides, evicted once the
    * watermark passes the join window, so state stays bounded on unbounded
    * feeds). The time-bound condition is what makes eviction possible:
    * without it Spark must keep every row forever.
    */
  def attributionJoin(
      views: DataFrame,
      purchases: DataFrame,
      watermark: String = "2 hours",
      windowSpec: String = "1 hour"): DataFrame = {
    val v = views.select(
      col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val p = purchases.select(
      col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"), col("value").as("amount"))
      .withWatermark("p_ts", watermark)
    v.join(
      p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowSpec"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"), col("amount"),
        col("v_ts"), col("p_ts"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class MomentState(n: Long, sp: Long, spp: Long)
  case class Anomaly(user_id: Long, event_id: Long, az: Double)

  /** Batch twin of [[anomalyIngest]] (oracle-checked as query x37): the
    * same prequential scoring as per-user prefix-sum windows — integer
    * centi-unit moments over ROWS UNBOUNDED PRECEDING .. 1 PRECEDING, then
    * the identical double mean/variance/z expression. Partitioned by
    * user_id, so the window parallelizes by user; no global sort.
    */
  def anomalyBatch(
      events: DataFrame,
      minPrior: Int = 10,
      threshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events.select(
      col("user_id"), col("event_id"), col("ts"),
      round(col("value") * 100).cast("long").as("cv"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.select(
      col("user_id"), col("event_id"), col("cv"),
      count(lit(1)).over(w).as("np"),
      sum(col("cv")).over(w).as("sp"),
      sum(col("cv") * col("cv")).over(w).as("spp"))
      .filter(col("np") >= minPrior && col("spp") * col("np") - col("sp") * col("sp") > 0)
      .select(col("user_id"), col("event_id"),
        round(abs(
          (col("cv").cast("double") - col("sp").cast("double") / col("np")) /
            sqrt((col("spp").cast("double") - col("sp").cast("double") * col("sp").cast("double") / col("np")) /
              (col("np") - 1))), 6).as("az"))
      .filter(col("az") > threshold)
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Prequential anomaly scoring (batch twin: query x37): each event is
    * z-scored against the running moments of the user's PRIOR events, then
    * folded into them. State per user is three longs — count, sum, and
    * sum-of-squares in exact centi-units (values are cents-precision), so
    * for feeds arriving in (ts, event_id) event-time order the streaming
    * fold and the batch prefix-sum window produce bit-identical integers
    * regardless of where the micro-batch boundaries fall; only the final
    * mean/variance/z arithmetic is double, in the same operation order as
    * the batch expression. Events are sorted within each micro-batch, but
    * a LATE event (older ts arriving in a later batch) is folded after
    * newer ones — out-of-order feeds break the stream/batch twin property
    * and need upstream buffering/watermarking before this fold. O(1) state
    * per user, no watermark needed for the moments themselves (they never
    * expire).
    */
  def anomalyIngest(
      events: Dataset[Event],
      minPrior: Int = 10,
      threshold: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MomentState, Anomaly](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[Anomaly]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val cv = math.round(e.value * 100) // exact for cents-precision positives
            // integer-exact variance positivity test (spp*n > sp^2), then
            // the same double expression the batch window evaluates
            if (st.n >= minPrior && st.spp * st.n - st.sp * st.sp > 0) {
              val mean = st.sp.toDouble / st.n
              val varr = (st.spp.toDouble - st.sp.toDouble * st.sp.toDouble / st.n) / (st.n - 1)
              val z = (cv.toDouble - mean) / math.sqrt(varr)
              // same rounding path as Spark's round(): BigDecimal.valueOf HALF_UP
              val az = BigDecimal(math.abs(z)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (az > threshold) out += Anomaly(userId, e.event_id, az)
            }
            st = MomentState(st.n + 1, st.sp + cv, st.spp + cv * cv)
          }
          state.update(st)
          out.iterator
      }
  }
  case class SessionState(start: Long, lastTs: Long, nEvents: Long, totalValue: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long, total_value: Double)

  // state carries epoch MICROS, not Timestamp.getTime millis — the fixture
  // timestamps are microsecond-grained and a millis round-trip would emit
  // valid_from values that hash-mismatch the batch build
  private def tsMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  case class Scd2State(status: String, validFrom: Long, nEvents: Long, version: Long)
  case class Scd2Row(
      user_id: Long, version: Long, status: String,
      valid_from: Timestamp, valid_to: Timestamp, n_events: Long)

  /** Streaming SCD type-2 history build — the incremental form of batch
    * x54: per-user custom state carries the OPEN version (current status,
    * its start, its event count, the version counter); an arriving event
    * with a different status closes it, emitting the finished
    * `[valid_from, valid_to)` row in Append mode. Emitted rows are exactly
    * batch x54's closed versions (is_current = 0) when the per-user feed
    * is time-ordered — pinned against the fixture in EventStreamsSpec.
    *
    * Scale posture: state is one row per user (status + three longs),
    * keyed, checkpointed, evicted with the population — the dimension
    * table maintains itself as events arrive instead of being rebuilt by
    * nightly batch. Within a micro-batch events sort per user by
    * (ts, event_id), the batch twin's exact tie order.
    */
  def scd2(events: Dataset[Event]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          var closed = List.empty[Scd2Row]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if s.status == e.event_type =>
                cur = Some(s.copy(nEvents = s.nEvents + 1))
              case Some(s) =>
                closed ::= Scd2Row(userId, s.version, s.status,
                  microsTs(s.validFrom), e.ts, s.nEvents)
                cur = Some(Scd2State(e.event_type, tsMicros(e.ts), 1, s.version + 1))
              case None =>
                cur = Some(Scd2State(e.event_type, tsMicros(e.ts), 1, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  /** Gap-based sessionization via flatMapGroupsWithState: a user's session
    * closes after `gapMs` of inactivity. Custom per-key state — the operator
    * shape the reference's engine cannot express at all.
    *
    * `timeout` controls idle-session flushing: ProcessingTimeTimeout in
    * production (emit sessions whose users went quiet); NoTimeout closes
    * sessions only when a later event arrives — fully deterministic, used in
    * tests (processing-time timeouts trigger continuous empty micro-batches,
    * which also tickles a Spark 4.1 checksum-checkpoint deadlock under
    * MemoryStream).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()): Dataset[Session] = {
    import events.sparkSession.implicits._
    val hasTimeout = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.lastTs), s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1, totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.lastTs), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (hasTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
