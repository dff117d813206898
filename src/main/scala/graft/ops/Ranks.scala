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
  * — and no task ever sorts more than one bucket of one group, EVEN
  * when the group is 99% one tied value (the tie cluster decomposes
  * again on the caller's tie key).
  *
  * Input contract, enforced loudly: `value` (and `tie`, for
  * [[groupRowNumber]]) must be non-null and non-NaN. NaN never compares
  * smaller in Spark orderings, so it would corrupt the min/max stats
  * and bucket assignment and emit silently wrong ranks; these are
  * library primitives (x64/x67/x69 build on them), so a poisoned input
  * raises immediately instead.
  */
object Ranks {

  /** Bucket count for the rank decomposition: fine enough that a
    * bucket is ~1/1000 of its group (the residual within-bucket sort is
    * tiny), coarse enough that the per-group bucket histogram stays a
    * broadcastable dimension frame (groups x 1001 rows).
    */
  val RankBuckets = 1000

  /** Fail-fast: null/NaN in a rank input would silently corrupt bucket
    * assignment; raise with the column name instead of emitting wrong
    * ranks. Returns the value cast to double (the bucket arithmetic
    * type — callers pass ids/hashes < 2^53, exactly representable).
    */
  private def checked(name: String, what: String): Column = {
    val c = col(name).cast("double")
    when(c.isNull.or(isnan(c)),
      raise_error(concat(
        lit(s"Ranks: null/NaN in $what column '$name' (value="),
        coalesce(col(name).cast("string"), lit("null")), lit(")"))))
      .otherwise(c)
  }

  /** Equi-width bucket of `v` within [mn, mx] mapped to [0, B-1]; the
    * degenerate mn = mx range collapses to bucket 0. Exact for the rank
    * decompositions because assignment is monotone in `v`: a strictly
    * smaller value lands in a lower-or-equal bucket, an equal value in
    * the same bucket (floor knife-edges move rows between buckets, never
    * change the reassembled rank).
    */
  private def bucketOf(v: Column, mn: Column, mx: Column): Column =
    when(mx > mn,
      least(floor((v - mn) / (mx - mn) * lit(RankBuckets)),
        lit((RankBuckets - 1).toLong)))
      .otherwise(lit(0L)).cast("long")

  /** Exclusive prefix sum of `cnt` over `ord` within `part` — "rows in
    * strictly lower buckets". Partitions are histogram frames (at most
    * RankBuckets+1 rows each), never data-sized.
    */
  private def belowCol(part: Seq[String], ord: String, cnt: Column): Column =
    coalesce(
      sum(cnt).over(
        Window.partitionBy(part.map(col): _*).orderBy(col(ord))
          .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))

  /** Exact SQL `percent_rank() OVER (PARTITION BY group ORDER BY value)`
    * without a per-group global sort — and without ANY data-sized window:
    *
    * rank(v) = 1 + #(rows in strictly lower value-buckets)        [below]
    *             + #(rows in the same bucket with smaller value)  [below_v]
    *
    * so the decomposition is (1) per-group (n, min, max) stats, (2) the
    * (group, bucket) histogram + its cumulative, (3) the (group, bucket,
    * value) DISTINCT-VALUE histogram + its cumulative — the only
    * non-histogram shuffle joins rows back on the (group, bucket, value)
    * key. Window partitions are the bucket histogram (<= B+1 rows per
    * group) and the within-bucket distinct-value frame (tie-heavy groups
    * collapse to a handful of rows; all-distinct groups bound it by the
    * bucket, ~n/B). A group that is 99% one tied value produces NO
    * oversized partition anywhere: the tie cluster is ONE histogram row.
    *
    * Returns the input columns plus `pct_rank: double` =
    * (rank - 1) / (n_group - 1) (SQL rank() tie semantics); single-row
    * groups get 0.0 (DuckDB/Spark both define the 0/0 case as 0). The
    * ratio is an exact integer-over-integer double division, so the
    * value is bit-identical to the sorting engines' — no rounding
    * needed, no tie hazard. `value` must be non-null finite (raises
    * otherwise).
    */
  /** Materialize-input knob shared by both rank ops (round-21, guide
    * §2.4): the decomposition reads its input from 4-5 separate plan
    * branches (group stats, histograms, the final join), and broadcast
    * builds cannot share exchanges, so the caller's value-column
    * expression work re-runs per branch. `materialize = true` cuts the
    * input once (widened to core width when the scan is single-split)
    * and every branch reads blocks. OPT-IN per call site because the
    * A/B split cleanly by input cost: expensive inputs win big (x64's
    * quality(text) 1.19x, x89's assignment chain 1.45x, x113 1.17x),
    * while cheap scan+hash inputs LOSE — their branch recomputes ran
    * concurrently across AQE stages (wall cost ~1 branch, not 4), and
    * the eager cut serializes two extra jobs ahead of them (x69 0.75x,
    * x97 0.73x, x67 0.81x measured WITH an unconditional cut).
    */
  private def matIn(df: DataFrame, materialize: Boolean): DataFrame =
    if (materialize) Checkpoints.cut(graft.util.Width.atLeastCores(df)) else df

  def groupPercentRank(
      df0: DataFrame, group: String, value: String,
      materialize: Boolean = false): DataFrame = {
    val df = matIn(df0, materialize)
    val stats = df.groupBy(col(group)).agg(
      count(lit(1)).as("_n"),
      min(checked(value, "value")).as("_mn"),
      max(checked(value, "value")).as("_mx"))
    val bucketed = df.join(broadcast(stats), group)
      .withColumn("_bkt", bucketOf(checked(value, "value"), col("_mn"), col("_mx")))
    val hist = bucketed.groupBy(col(group), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
    val below = hist
      .withColumn("_below", belowCol(Seq(group), "_bkt", col("_bc")))
      .select(col(group), col("_bkt"), col("_below"))
    // rows in the SAME bucket with strictly smaller value: cumulative
    // over the within-bucket distinct-value histogram — replaces the old
    // within-bucket rank() window (whose partition was the whole bucket,
    // i.e. the whole group when 99% of values tie)
    val vbelow = bucketed.groupBy(col(group), col("_bkt"), col(value))
      .agg(count(lit(1)).as("_vc"))
      .withColumn("_vbelow", belowCol(Seq(group, "_bkt"), value, col("_vc")))
      .select(col(group), col("_bkt"), col(value), col("_vbelow"))
    bucketed
      .join(broadcast(below), Seq(group, "_bkt"))
      .join(vbelow, Seq(group, "_bkt", value))
      .withColumn("pct_rank",
        when(col("_n") > 1,
          (col("_below") + col("_vbelow")).cast("double") /
            (col("_n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .drop("_n", "_mn", "_mx", "_bkt", "_bc", "_vc", "_below", "_vbelow")
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
    * row_num(v, t) = #(rows in strictly lower value-buckets)      [below]
    *               + #(same bucket, strictly smaller value)       [below_v]
    *               + #(same value, strictly lower TIE-buckets)    [below_t]
    *               + row_number within the (value, tie-bucket)    [residual]
    *
    * The first three terms reuse [[groupPercentRank]]'s histogram
    * machinery; the fourth decomposes each EXACT-VALUE tie cluster again
    * on the caller's tie key — so a group that is 99% one tied value
    * sorts in ~cluster/B-row partitions, never as one straggler (the
    * round-10 tie-skew guard). Exact because within an equal-value
    * cluster the order is by `tie` alone, and tie-bucket assignment is
    * monotone in tie.
    *
    * Returned `row_num: long` is UNIQUE within the group as long as
    * (value, tie) is unique per row (the caller's contract — pass a
    * per-row key as `tie`). `value` and `tie` must be non-null finite
    * NUMERIC columns, exactly representable as doubles (ids and hashes
    * < 2^53 — every caller's case); null/NaN raises.
    */
  def groupRowNumber(
      df0: DataFrame, group: String, value: String, tie: String,
      materialize: Boolean = false): DataFrame = {
    val df = matIn(df0, materialize)
    val stats = df.groupBy(col(group)).agg(
      min(checked(value, "value")).as("_mn"),
      max(checked(value, "value")).as("_mx"))
    val bucketed = df.join(broadcast(stats), group)
      .withColumn("_bkt", bucketOf(checked(value, "value"), col("_mn"), col("_mx")))
    val hist = bucketed.groupBy(col(group), col("_bkt"))
      .agg(count(lit(1)).as("_bc"))
    val below = hist
      .withColumn("_below", belowCol(Seq(group), "_bkt", col("_bc")))
      .select(col(group), col("_bkt"), col("_below"))
    // same-bucket smaller-value rows + per-value tie-range stats, from
    // ONE distinct-value histogram pass
    val vhist = bucketed.groupBy(col(group), col("_bkt"), col(value))
      .agg(
        count(lit(1)).as("_vc"),
        min(checked(tie, "tie")).as("_tmn"),
        max(checked(tie, "tie")).as("_tmx"))
      .withColumn("_vbelow", belowCol(Seq(group, "_bkt"), value, col("_vc")))
      .select(col(group), col("_bkt"), col(value),
        col("_vbelow"), col("_tmn"), col("_tmx"))
    // tie sub-bucket within the exact-value cluster (monotone in tie)
    val tbucketed = bucketed
      .join(vhist, Seq(group, "_bkt", value))
      .withColumn("_tbkt", bucketOf(checked(tie, "tie"), col("_tmn"), col("_tmx")))
    val tbelow = tbucketed.groupBy(col(group), col("_bkt"), col(value), col("_tbkt"))
      .agg(count(lit(1)).as("_tc"))
      .withColumn("_tbelow", belowCol(Seq(group, "_bkt", value), "_tbkt", col("_tc")))
      .select(col(group), col("_bkt"), col(value), col("_tbkt"), col("_tbelow"))
    // the only data-sized sort: one tie-bucket of one value cluster
    val wIn = Window.partitionBy(col(group), col("_bkt"), col(value), col("_tbkt"))
      .orderBy(col(tie))
    tbucketed
      .join(broadcast(below), Seq(group, "_bkt"))
      .join(tbelow, Seq(group, "_bkt", value, "_tbkt"))
      .withColumn("_rkin", row_number().over(wIn).cast("long"))
      .withColumn("row_num",
        col("_below") + col("_vbelow") + col("_tbelow") + col("_rkin"))
      .drop("_mn", "_mx", "_bkt", "_bc", "_vc", "_vbelow", "_tmn", "_tmx",
        "_tbkt", "_tc", "_tbelow", "_below", "_rkin")
  }
}
