package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

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
  * SAFETY (round-21, hardened from the round-20 caller contract): the
  * probe `df.rdd` is only safe on frames whose physical plan is
  * exchange-free — on a plan that contains exchanges it would
  * materialize the upstream query stages at planning time under AQE
  * (early, duplicated execution). Widening sits INSIDE shared operators
  * now (the ANN family's corpus side), whose inputs are caller-supplied,
  * so the guard is structural instead of documentation: the frame is
  * probed and widened only when its optimized logical plan is map-only
  * (leaves, projections, filters, generators, unions of those — the
  * shapes that plan no exchange). Anything else — aggregates, joins,
  * windows, repartitions — returns unchanged; those frames either carry
  * their own width or need [[coresOrShuffleWidth]]-style handling at the
  * call site. Streaming frames return unchanged (`df.rdd` throws on
  * them), so the widened public operators stay streaming-composable.
  */
object Width {
  private def mapOnly(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case p: Project => mapOnly(p.child)
    case f: Filter => mapOnly(f.child)
    case g: Generate => mapOnly(g.child)
    case u: Union => u.children.forall(mapOnly)
    case a: SubqueryAlias => mapOnly(a.child)
    case _ => false
  }

  def atLeastCores(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    if (!mapOnly(df.queryExecution.optimizedPlan)) return df
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
