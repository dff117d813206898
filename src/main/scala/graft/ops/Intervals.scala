package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) join — point-in-interval as an EQUI-join,
  * the 1-D sibling of [[CatalogOps.matchRegionsIndexed]].
  *
  * Spark plans a raw `pt BETWEEN start AND end` join as a nested loop
  * (O(points x intervals)). Here each interval is assigned the power-of-two
  * level `l` with `2^l >= length`, so it covers at most TWO cells at its
  * own level — constant fan-out per interval regardless of length. A point
  * lands in exactly one cell per distinct level (the distinct-level frame
  * is broadcast; <= ~60 rows ever), candidates equi-join on (level, cell),
  * and the exact between-filter removes false positives. Lossless — results
  * are identical to the nested-loop form, so oracles stay plain theta SQL.
  *
  * 100 TB posture: both sides shuffle-partition on (level, cell); nothing
  * data-sized is broadcast; skew is bounded because a cell at level l only
  * collects intervals of length ~2^l that overlap it.
  */
object Intervals {

  /** Clamp bound for cell ids: 2^62, exactly representable as a double and
    * safely inside Long range. Under ANSI mode (Spark 4 default) a bare
    * `floor(x / 2^lvl).cast(long)` throws a cast-overflow
    * ArithmeticException when |x|/2^lvl exceeds Long.MaxValue (huge
    * magnitudes with small spans) — and [[graft.plans.RewriteRangeJoin]]
    * applies this computation to arbitrary user theta joins that would have
    * worked as nested loops. Clamping is lossless: the clamp is monotone
    * and applied identically on the interval and probe sides, so a point's
    * clamped cell always falls inside its interval's clamped [lo, hi] cell
    * range (the residual filter still removes any extra collisions), and
    * since unclamped cellHi - cellLo <= 2 by the level construction, the
    * contraction keeps `sequence` spans <= 3 cells.
    */
  private val CellClamp = 4.611686018427387904e18

  private def cellId(x: Column, lvl: Column): Column =
    least(greatest(floor(x / pow(lit(2.0), lvl)), lit(-CellClamp)), lit(CellClamp))
      .cast("long")

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String = "t",
      startCol: String = "start",
      endCol: String = "end"): DataFrame =
    intervalJoinOn(
      points, intervals,
      col(ptCol), col(startCol), col(endCol),
      col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))

  /** Expression-based variant used by the [[graft.plans.RewriteRangeJoin]]
    * optimizer rule: point/start/end arrive as arbitrary Columns over the
    * two frames and the EXACT original predicate is re-applied as the
    * residual filter (so strict/inclusive bound mixes stay lossless).
    * The interval side is the LEFT of the final equi-join on purpose: the
    * levels subtree inside the probe side duplicates the interval subtree,
    * and analysis deduplicates attribute ids on the RIGHT side of a
    * conflicting join — keeping the interval branch's original ids, which
    * the caller's output projection needs. Intervals with end < start (or
    * null bounds) match nothing in the theta form and are pre-filtered so
    * the cell `sequence` never sees descending bounds.
    */
  def intervalJoinOn(
      points: DataFrame,
      intervals: DataFrame,
      pt: Column,
      lo: Column,
      hi: Column,
      residual: Column): DataFrame = {
    val loD = lo.cast("double")
    val hiD = hi.cast("double")
    val span = greatest(hiD - loD, lit(1.0))
    val iv = intervals
      .filter(loD <= hiD)
      .withColumn("__lvl", ceil(log(2.0, span)).cast("int"))
      .withColumn("__cell", explode(sequence(
        cellId(loD, col("__lvl")),
        cellId(hiD, col("__lvl")))))
    // distinct levels via groupBy/count (never a Deduplicate node: this
    // plan can be spliced in AFTER the optimizer batch that would rewrite
    // one, so only nodes with direct physical strategies may appear)
    val levels = iv.groupBy(col("__lvl")).count().select(col("__lvl"))
    val probes = points.crossJoin(broadcast(levels))
      .withColumn("__cell", cellId(pt.cast("double"), col("__lvl")))
    // Dimension-sized interval sides broadcast EAGERLY: AQE would convert
    // this equi-join to broadcast at runtime, but only after BOTH input
    // stages materialize — i.e. after the (possibly multi-billion-row)
    // probe side has already paid its full shuffle write. That shuffle
    // was q24's 1000x-probe bottleneck: 600M probe rows spilled ~26x
    // super-linearly; with the hint the probe side never shuffles at all
    // (map-side BHJ straight into the partial aggregate). The static
    // stats check costs no job; the <= 3-cell explode fan-out is covered
    // by the conservative 8 MB pre-explode threshold. Big interval sides
    // keep the symmetric (level, cell) shuffle — the fact-fact posture.
    // Size from the ANALYZED plan's stats visitor, not optimizedPlan:
    // this method is reachable from inside RewriteRangeJoin, and touching
    // queryExecution.optimizedPlan there re-runs a nested optimization
    // pass per rewrite (the analyzed plan is already cached by the time
    // any rule can see the frame, so this is a pure estimate lookup).
    // NonFatal only — an OOM mid-estimate must propagate, not silently
    // disable the broadcast.
    val ivBytes =
      try intervals.queryExecution.analyzed.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    val ivSide = if (ivBytes <= 8L * 1024 * 1024) broadcast(iv) else iv
    ivSide.join(probes, Seq("__lvl", "__cell"))
      .filter(residual)
      .drop("__lvl", "__cell")
  }
}
