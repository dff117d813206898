package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Auto-rewrite of point-in-interval theta joins to the leveled-grid
  * equi-join ([[graft.ops.Intervals.intervalJoinOn]]).
  *
  * Spark plans `SELECT ... FROM p JOIN i ON p.t BETWEEN i.lo AND i.hi` as a
  * BroadcastNestedLoopJoin — O(points x intervals) comparisons, and a
  * data-sized broadcast when neither side is small. This rule recognizes
  * the shape (an inner join whose condition contains a lower AND an upper
  * bound of ONE numeric point expression from one side against bound
  * expressions from the other, and no cross-side equality the planner
  * could already hash on) and splices in the lossless grid rewrite: each
  * interval covers <= 2 cells at its own power-of-two level, candidates
  * come from an equi-join on (level, cell), and the ORIGINAL full
  * condition re-filters them — results are identical, strict or inclusive
  * bounds alike, so q24-style queries can be written as plain theta SQL
  * yet execute scale-safe.
  *
  * Mechanics: the replacement subplan is rebuilt through the DataFrame API
  * over the already-optimized children ([[DatasetBridge.ofRows]]) — the
  * analyzer then owns attribute dedup for the levels branch (which embeds
  * the interval subtree a second time). Because this rule runs in the
  * user-rule batch AFTER the main optimizer, the spliced plan may only
  * contain nodes with direct physical strategies: distinct-levels is a
  * groupBy/count (never a Deduplicate) and the broadcast hint is folded
  * into its join node by applying [[EliminateResolvedHint]] locally. A
  * final Project restores the join's original output attributes (both
  * children's attribute ids survive the rebuild by construction — the
  * interval branch sits LEFT of the spliced join precisely so analysis
  * dedup re-ids the duplicated subtree inside the probe side instead).
  *
  * The rule cannot match its own output (the spliced join's condition is
  * (__lvl, __cell) equality, and frames already carrying __lvl/__cell
  * names are skipped), so it is stable under the fixed-point user batch.
  * Disable with `spark.graft.rangeJoin.enabled=false` (e.g. when one side
  * is known tiny and the nested loop is genuinely cheaper).
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.rangeJoin.enabled"

  /** (point, lo, hi, pointsOnLeft) when the conjuncts contain a lower and
    * an upper bound of the same point expression and no cross-side
    * equality.
    */
  private def extract(
      left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(Expression, Expression, Expression, Boolean)] = {

    def numeric(e: Expression): Boolean = e.dataType match {
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    def fromLeft(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)

    if (!cond.deterministic) return None
    val conjuncts = splitConjunctivePredicates(cond)
    // A cross-side equality means the planner already has a hash-join key;
    // the nested-loop problem this rule solves does not arise.
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case EqualNullSafe(a, b) => (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (hasEquiKey) return None

    // normalize comparisons to "x >= y" orientation
    val bounds: Seq[(Expression, Expression)] = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (b, a)
      case LessThan(a, b) => (b, a)
    }
    // lower bound: point >= lo -> (p, lo); upper bound: hi >= point -> (hi, p)
    (for {
      (p1, lo) <- bounds.iterator
      (hi, p2) <- bounds.iterator
      if (p1 ne hi) || (lo ne p2) // not the same conjunct
      if p1.semanticEquals(p2) && numeric(p1) && numeric(lo) && numeric(hi)
      pLeft = fromLeft(p1)
      if pLeft || fromRight(p1)
      if (pLeft && fromRight(lo) && fromRight(hi)) || (!pLeft && fromLeft(lo) && fromLeft(hi))
    } yield (p1, lo, hi, pLeft)).nextOption()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val sparkOpt = SparkSession.getActiveSession
    if (sparkOpt.isEmpty) return plan
    val spark = sparkOpt.get
    plan.transformUp {
      // An explicit user join hint (broadcast/merge/...) is a stronger
      // signal than this heuristic — rewriting would silently discard it
      // (the spliced subplan carries its own join keys and hints), so such
      // joins are left for the planner to honor as written.
      case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE)
        if !j.outputSet.exists(a => a.name == "__lvl" || a.name == "__cell") =>
        extract(left, right, cond) match {
          case Some((p, lo, hi, pointsOnLeft)) =>
            val (ptsPlan, ivsPlan) = if (pointsOnLeft) (left, right) else (right, left)
            val joined = graft.ops.Intervals.intervalJoinOn(
              DatasetBridge.ofRows(spark, ptsPlan),
              DatasetBridge.ofRows(spark, ivsPlan),
              ColumnBridge.column(p),
              ColumnBridge.column(lo),
              ColumnBridge.column(hi),
              ColumnBridge.column(cond))
            val spliced = EliminateResolvedHint(joined.queryExecution.analyzed)
            Project(j.output, spliced)
          case None => j
        }
    }
  }
}
