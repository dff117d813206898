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
    *         bucket).
    */
  def gapFillForward(observed: DataFrame): DataFrame = {
    val grid = observed.groupBy(col("key"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
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
    * exact long arithmetic (micros `div` 3.6e9), mirrored by the oracle's
    * `epoch_us(ts) // 3600000000`. Takes the column NAME because Spark's
    * Column API has no integral-division operator (`/` is always double).
    */
  def epochHour(tsCol: String): Column = expr(s"unix_micros($tsCol) div 3600000000")
}
