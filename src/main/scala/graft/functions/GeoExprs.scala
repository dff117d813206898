package graft.functions

import graft.geo.Polygon
import org.apache.spark.sql.catalyst.expressions.{And, BinaryExpression, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Native point-in-polygon containment — the Catalyst-expression form of
  * [[Polygon.contains]] for the SQL surface (`st_point_in_poly`). The ring
  * is a plan-time constant; evaluation is one primitive loop over the
  * precomputed edge table (identical per-edge IEEE arithmetic to the
  * unrolled Column form, so both paths select identical rows), with
  * `doGenCode` so the predicate rides whole-stage codegen.
  *
  * `bboxInjected` marks that [[PushPolygonBbox]] has already added the
  * ring's bbox conjuncts next to this predicate — the flag keeps the rule
  * idempotent across optimizer passes.
  */
case class PointInPolygon(
    left: Expression,
    right: Expression,
    ring: Seq[(Double, Double)],
    bboxInjected: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"st_point_in_poly requires double x/y, got ${left.dataType} / ${right.dataType}")

  @transient private lazy val table: Array[Array[Double]] = Polygon.edgeTable(ring)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val px = l.asInstanceOf[Double]
    val py = r.asInstanceOf[Double]
    val Array(yi, yj, dx, dy, xi) = table
    var crossings = 0
    var k = 0
    while (k < yi.length) {
      if ((yi(k) > py) != (yj(k) > py) && px < dx(k) * (py - yi(k)) / dy(k) + xi(k)) crossings += 1
      k += 1
    }
    java.lang.Boolean.valueOf(crossings % 2 == 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("polyEdges", table, "double[][]")
    nullSafeCodeGen(ctx, ev, (px, py) => {
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      s"""
         |int $c = 0;
         |for (int $k = 0; $k < ${table(0).length}; $k++) {
         |  if (($t[0][$k] > $py) != ($t[1][$k] > $py)
         |      && $px < $t[2][$k] * ($py - $t[0][$k]) / $t[3][$k] + $t[4][$k]) $c++;
         |}
         |${ev.value} = ($c % 2) == 1;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: any Filter containing a [[PointInPolygon]] gets the
  * ring's bounding-box conjuncts AND-ed in next to it. The bbox comparisons
  * are ordinary range predicates on the x/y children, so Spark's normal
  * filter pushdown carries them into the parquet scan (row-group pruning) —
  * a user filtering by the bare `st_point_in_poly(...)` from SQL gets the
  * same scan pruning the DataFrame path gets from an explicit
  * [[Polygon.bbox]] pre-filter. Lossless: bbox(ring) is implied by
  * containment, so admitted rows are unchanged.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`) and via
  * `spark.experimental.extraOptimizations` in `Graft.registerFunctions`.
  * User-provided rules run after the main optimizer batches, which still
  * precedes physical planning — where the DSv1 file-source pushdown that
  * benefits from these conjuncts happens.
  */
object PushPolygonBbox extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if cond.exists {
          case p: PointInPolygon => !p.bboxInjected
          case _ => false
        } =>
      f.copy(condition = cond.transform {
        case p: PointInPolygon if !p.bboxInjected =>
          val xs = p.ring.map(_._1); val ys = p.ring.map(_._2)
          And(
            And(
              And(GreaterThanOrEqual(p.left, Literal(xs.min)), LessThanOrEqual(p.left, Literal(xs.max))),
              And(GreaterThanOrEqual(p.right, Literal(ys.min)), LessThanOrEqual(p.right, Literal(ys.max)))),
            p.copy(bboxInjected = true))
      })
  }
}
