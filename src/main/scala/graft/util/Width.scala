package graft.util

import org.apache.spark.sql.DataFrame

/** Conditional stage widening for compute-dense map stages over NARROW
  * inputs (round-20). The local fixture parquet files hold a single row
  * group each, so their scans are one split no matter the byte knobs
  * (a parquet split below row-group granularity reads nothing), and
  * AQE's bytes-first coalescing keeps small shuffles narrow — both
  * starve per-row-expensive stages (tokenizer + winnowing selection,
  * gap-fill grid explodes, vector scoring) of cores, a cost the bytes
  * model cannot see.
  *
  * [[atLeastCores]] widens ONLY when the input's planned partition
  * count is below the deploy's core count, so it can never COALESCE a
  * real-scale input: a corpus whose scan already has hundreds of splits
  * passes through untouched, and `defaultParallelism` tracks the
  * deploy's width, not a local constant.
  *
  * CALLER CONTRACT: only pass frames whose physical plan is
  * exchange-free (scans, filters, projections, unions of those).
  * `df.rdd` on a plan that contains exchanges would materialize the
  * upstream query stages at planning time under AQE — early, duplicated
  * execution. Every current caller passes scan-derived map-only frames.
  * Streaming frames return unchanged (`df.rdd` throws on them), so the
  * widened public operators stay streaming-composable.
  */
object Width {
  def atLeastCores(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Widening target for frames that are about to be REPARTITIONED
    * unconditionally anyway (exchange-bearing inputs where probing
    * `df.rdd` would force early query-stage execution — see the caller
    * contract above). `repartition(defaultParallelism)` can NARROW a
    * frame on a deploy whose shuffle width exceeds its core count
    * (shuffle.partitions > cores, the recommended cluster posture),
    * re-serializing the very fan-out it widens locally; the max with
    * the session's shuffle width never can. Locally both terms equal
    * the core count, so plans are unchanged.
    */
  def coresOrShuffleWidth(df: DataFrame): Int = {
    val s = df.sparkSession
    val shuffle = scala.util.Try(
      s.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(0)
    math.max(s.sparkContext.defaultParallelism, shuffle)
  }
}
