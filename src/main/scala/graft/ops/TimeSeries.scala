package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a dense
  * per-key bucket grid and gap-fill the holes (zero counts, forward-filled
  * last observation) — the step that turns irregular raw telemetry into
  * the fixed-step series every downstream window model (anomaly scores,
  * rate baselines, training-curriculum schedules) assumes.
  *
  * Scale shape: the dense grid is generated per key from that key's own
  * [min, max] bucket span via `sequence` + `explode` — output-sized, never
  * a global calendar cross-join. Every stage keys on the series id or the
  * (id, bucket) pair: one hash aggregate builds the observed buckets, one
  * per-key aggregate finds the span, one left join aligns grid to
  * observations, and the forward fill is a per-key ordered window — at
  * 100 TB each key's series stays together under one partitioning family
  * and the per-key window is bounded by the series span (a key's bucket
  * count), not by the corpus. No stage materializes on the driver.
  */
object TimeSeries {

  /** Dense forward-filled series from a sparse per-(key, bucket) frame.
    *
    * @param observed frame with integral `key`, integral `bucket`, long
    *                 `cnt` (observations in the bucket) and double `metric`
    *                 (the bucket's metric value) columns
    * @return one row per (key, every bucket in [min, max] of that key):
    *         `key, bucket, cnt` (0 on gaps), `is_observed` (int 0/1) and
    *         `filled` — the metric carried forward from the most recent
    *         observed bucket (never null: the grid starts at an observed
    *         bucket — EXCEPT under `clipToMaxSpan`, where a clipped key's
    *         grid may start unobserved and its leading `filled` rows are
    *         null, making the clip visible in the output shape).
    * @param maxSpan       optional per-key bucket-span cap; a key whose
    *                      [min, max] span exceeds it fails the query
    *                      loudly, naming the key
    * @param clipToMaxSpan with `maxSpan`, clip oversized keys to their
    *                      most recent `maxSpan` buckets instead of failing
    */
  def gapFillForward(observed0: DataFrame, maxSpan: Option[Long] = None,
      clipToMaxSpan: Boolean = false): DataFrame = {
    // Cut (round-20): `observed` feeds BOTH the span aggregate and the
    // grid join — without the cut the caller's upstream chain (x57: the
    // full events scan + hourly aggregate) re-ran once per branch
    // (profiled: two ~0.6-0.8 s single-task jobs per run). The cut frame
    // is the hourly aggregate — output-sized at any scale. LAZY: both
    // consumers are full passes (a groupBy and a join probe side), so the
    // first action materializes every partition; an eager cut would run
    // the aggregate at DataFrame-construction time, charging plan-only
    // consumers (explain, plan pins) the whole chain.
    val observed = Checkpoints.cutLazy(observed0)
    val spans = observed.groupBy(col("key"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
    // Dense-grid inflation guard: Σ per-key spans is the OUTPUT size, and a
    // single pathological key (one stray 1970 timestamp in a 2026 stream)
    // silently multiplies it. With `maxSpan` set, a key whose [mn, mx]
    // bucket span exceeds it either fails the query loudly (default) or —
    // `clipToMaxSpan = true` — keeps only the key's most recent `maxSpan`
    // buckets. With `maxSpan` unset, behavior (and output hashes) are
    // exactly the unguarded original.
    val bounded = maxSpan match {
      case None => spans
      case Some(cap) =>
        require(cap > 0, s"maxSpan must be positive, got $cap")
        if (clipToMaxSpan)
          spans.select(col("key"),
            greatest(col("mn"), col("mx") - lit(cap - 1)).as("mn"), col("mx"))
        else {
          val w = when(col("mx") - col("mn") + 1 > cap,
            raise_error(concat(
              lit(s"gapFillForward: key "), col("key").cast("string"),
              lit(s" spans "), (col("mx") - col("mn") + 1).cast("string"),
              lit(s" buckets, exceeding maxSpan=$cap — clip upstream or pass clipToMaxSpan=true"))))
          spans.select(col("key"), coalesce(w.cast("long"), col("mn")).as("mn"), col("mx"))
        }
    }
    val grid = bounded
      .select(col("key"), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val byBucket = Window.partitionBy(col("key")).orderBy(col("bucket"))
    grid.join(observed, Seq("key", "bucket"), "left")
      .select(
        col("key"), col("bucket"),
        coalesce(col("cnt"), lit(0L)).cast("long").as("cnt"),
        col("cnt").isNotNull.cast("int").as("is_observed"),
        col("metric").as("m"))
      .withColumn("filled", last(col("m"), ignoreNulls = true).over(byBucket))
      .drop("m")
  }

  /** Epoch-hour bucket of a microsecond-precision timestamp column —
    * exact long FLOOR division (subtract the nonnegative `pmod` remainder,
    * then the division is exact), mirrored by the oracle's flooring
    * `epoch_us(ts) // 3600000000`. A bare `div` truncates toward zero, so
    * pre-1970 timestamps (negative micros) would bucket one hour later
    * than the oracle; for nonnegative micros the two agree. Takes the
    * column NAME because Spark's Column API has no integral-division
    * operator (`/` is always double).
    */
  def epochHour(tsCol: String): Column = expr(
    s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), 3600000000)) div 3600000000")
}
