package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector dot product over Array[Float] / Array[Double] columns.
  *
  * Why a custom Expression: the composed alternatives are orders of
  * magnitude slower on similarity joins. `aggregate(zip_with(...))` is
  * interpreted (HOFs have no codegen), and a statically-unrolled 64-term
  * `element_at` sum grows the expression tree past what whole-stage codegen
  * will compile above a BroadcastNestedLoopJoin, so it also falls back to
  * interpreted eval (~35 us/pair measured — 100+ s for a 2.9M-pair join).
  * This expression is one virtual call per row with a primitive loop, plus
  * `doGenCode` so it rides whole-stage codegen where available: the same
  * join drops to ~2 s.
  *
  * Semantics: left-to-right fold of widen(a_i) * widen(b_i), identical to
  * the interpreted forms (and to the DuckDB oracle's DOUBLE[] cosine), so
  * results are bit-for-bit unchanged. Null elements inside vectors are not
  * supported (embedding columns are dense); null arrays propagate null.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_dot requires numeric array inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { s += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    }
    java.lang.Double.valueOf(s)
  }

  private def getter(dt: DataType, arr: String, idx: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($idx)"
    case DoubleType => s"$arr.getDouble($idx)"
    case other => throw new IllegalStateException(s"unchecked element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API for the native dot product (Spark 4 Column<->Expression
    * conversion goes through the graftbridge shim).
    */
  def vectorDot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
