package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking operators.
  *
  * The naive form of a per-group rank — `percent_rank() OVER (PARTITION
  * BY g ORDER BY v)` — puts every group in ONE window partition and
  * sorts it there. At 100 TB a large group (a dominant source, a hot
  * tenant) becomes a single straggler task that must hold and sort the
  * whole group; the plan does not scale with the cluster. The operators
  * here compute the IDENTICAL values through a two-level bucket
  * decomposition (the same histogram-refine shape as the token-budget
  * cut in ExtensionQueries.x35 / the q20 percentile family), so the
  * biggest shuffle key is (group, bucket) — 1000x finer than the group
  * — and no task ever sorts more than one bucket of one group.
  */
object Ranks {

  /** Bucket count for the rank decomposition: fine enough that a
    * bucket is ~1/1000 of its group (the residual within-bucket sort is
    * tiny), coarse enough that the per-group bucket histogram stays a
    * broadcastable dimension frame (groups x 1001 rows).
    */
  val RankBuckets = 1000

  /** Exact SQL `percent_rank() OVER (PARTITION BY group ORDER BY value)`
    * without a per-group global sort.
    *
    * Returns the input columns plus `pct_rank: double` =
    * (rank - 1) / (n_group - 1), where rank is 1 + the count of rows in
    * the group with STRICTLY smaller value (SQL rank() tie semantics);
    * single-row groups get 0.0 (DuckDB/Spark both define the 0/0 case
    * as 0). The ratio is an exact integer-over-integer double division,
    * so the value is bit-identical to the sorting engines' — no
    * rounding needed, no tie hazard.
    *
    * Decomposition (exact for ANY bucket boundaries because bucket
    * assignment is monotone in `value`: a strictly smaller value lands
    * in a lower-or-equal bucket, an equal value in the same bucket):
    *   1. per-group (n, min, max) — one map-side-combined aggregate;
    *   2. bucket = floor((v - mn) / (mx - mn) * B) clamped to B-1
    *      (floor knife-edges are harmless: they move rows between
    *      buckets, never change the reassembled rank);
    *   3. per-(group, bucket) counts, then rows-strictly-below-bucket
    *      via a cumulative window over the <= B+1-row per-group frame;
    *   4. rank WITHIN the (group, bucket) — the only sort, over ~n/B
    *      rows per partition;
    *   5. rank = below-bucket + within-bucket rank.
    *
    * Scale shape: two corpus-sized shuffles (the (g, b) count aggregate
    * and the (g, b) window), both on keys 1000x finer than the group;
    * the stats and histogram frames are dimension-sized broadcasts.
    * `value` must be non-null and the group's values must be finite
    * doubles (NaN never compares smaller, so it would corrupt min/max).
    */
  def groupPercentRank(
      df: DataFrame, group: String, value: String): DataFrame = {
    val b = lit(RankBuckets)
    val stats = df.groupBy(col(group)).agg(
      count(lit(1)).as("_n"),
      min(col(value)).as("_mn"),
      max(col(value)).as("_mx"))
    val bucketed = df.join(broadcast(stats), group)
      .withColumn("_bkt",
        when(col("_mx") > col("_mn"),
          least(floor((col(value) - col("_mn")) / (col("_mx") - col("_mn")) * b),
            lit((RankBuckets - 1).toLong)))
          .otherwise(lit(0L)).cast("long"))
    val hist = bucketed.groupBy(col(group), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
    // rows strictly below this bucket, within the group: cumulative over
    // the bounded (<= RankBuckets+1 rows per group) histogram frame
    val wLower = Window.partitionBy(col(group)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = hist
      .withColumn("_below", coalesce(sum(col("_bc")).over(wLower), lit(0L)))
      .select(col(group), col("_bkt"), col("_below"))
    // the only sort: rank over one bucket of one group (~n/1000 rows)
    val wIn = Window.partitionBy(col(group), col("_bkt")).orderBy(col(value))
    bucketed
      .withColumn("_rkin", rank().over(wIn).cast("long"))
      .join(broadcast(below), Seq(group, "_bkt"))
      .withColumn("pct_rank",
        when(col("_n") > 1,
          (col("_below") + col("_rkin") - 1).cast("double") /
            (col("_n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .drop("_n", "_mn", "_mx", "_bkt", "_bc", "_rkin", "_below")
  }

  /** Exact per-group ntile-style quantile cut point membership is served
    * by comparing [[groupPercentRank]]'s output against thresholds —
    * deliberately no separate operator: the rank IS the primitive.
    */
  private[ops] def keepAbove(pct: Column, cut: Double): Column =
    (pct >= cut).cast("int")

  /** Exact SQL `row_number() OVER (PARTITION BY group ORDER BY value,
    * tie)` without a per-group global sort — the selection primitive
    * behind "take exactly K rows per group" cuts.
    *
    * Same bucket decomposition as [[groupPercentRank]], but the
    * within-bucket window is a row_number over (value, tie), so the
    * returned `row_num: long` is UNIQUE within the group as long as
    * (value, tie) is unique per row (the caller's contract — pass a
    * per-row key as `tie`). `value` must be non-null finite doubles.
    */
  def groupRowNumber(
      df: DataFrame, group: String, value: String, tie: String): DataFrame = {
    val b = lit(RankBuckets)
    val stats = df.groupBy(col(group)).agg(
      min(col(value)).as("_mn"),
      max(col(value)).as("_mx"))
    val bucketed = df.join(broadcast(stats), group)
      .withColumn("_bkt",
        when(col("_mx") > col("_mn"),
          least(floor((col(value) - col("_mn")) / (col("_mx") - col("_mn")) * b),
            lit((RankBuckets - 1).toLong)))
          .otherwise(lit(0L)).cast("long"))
    val hist = bucketed.groupBy(col(group), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
    val wLower = Window.partitionBy(col(group)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = hist
      .withColumn("_below", coalesce(sum(col("_bc")).over(wLower), lit(0L)))
      .select(col(group), col("_bkt"), col("_below"))
    val wIn = Window.partitionBy(col(group), col("_bkt"))
      .orderBy(col(value), col(tie))
    bucketed
      .withColumn("_rkin", row_number().over(wIn).cast("long"))
      .join(broadcast(below), Seq(group, "_bkt"))
      .withColumn("row_num", col("_below") + col("_rkin"))
      .drop("_mn", "_mx", "_bkt", "_bc", "_rkin", "_below")
  }
}
