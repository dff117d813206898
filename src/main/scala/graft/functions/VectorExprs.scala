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

/** Greedy maximal-marginal-relevance selection over a PACKED candidate
  * array: input is `array<struct<id: long, rel: double, v: array<double>>>`
  * (one row per query group via `collect_list`), output is the k selected
  * candidates as `array<struct<vec_id, rel, rnd, mmr>>` in selection order.
  *
  * Why an expression and not an iterative DataFrame loop: MMR's greedy
  * rounds are sequential math over a BOUNDED top-N candidate set (tens of
  * rows per query by construction), but as k DataFrame rounds they cost
  * k stages of scheduling per query — measured 4.8 s for one 20-candidate
  * query. As an expression the whole selection is one imperative pass
  * inside a single aggregate stage, and batch re-ranking parallelizes the
  * natural way: `groupBy(qid).agg(collect_list(...))` then one MmrSelect
  * per group. Interpreted eval only (CodegenFallback) — it runs once per
  * QUERY, not per corpus row, so codegen buys nothing.
  *
  * Determinism contract (identical to the unrolled DuckDB oracle):
  * candidates are processed in id order, relevance and pairwise cosines
  * are 6-dp quantized INPUTS (scores stay raw doubles — identical across
  * engines because the inputs and operation order are), score ties take
  * the lower id, and cosines are the same left-to-right
  * widen-multiply-add as [[VectorDot]] divided by the norm product.
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rel", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("rnd", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("mmr", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: org.apache.spark.sql.types.StructType, _) if s.length == 3 &&
        s(0).dataType == org.apache.spark.sql.types.LongType &&
        s(1).dataType == DoubleType &&
        (s(2).dataType match { case ArrayType(DoubleType, _) => true; case _ => false }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr_select requires array<struct<id bigint, rel double, v array<double>>>, got $other")
    }

  /** Spark round(x, 6) semantics: BigDecimal.valueOf, HALF_UP. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // materialize and order by id: collect_list order is nondeterministic,
    // the selection must not depend on it
    val items = Array.tabulate(n) { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getDouble(1), r.getArray(2).toDoubleArray())
    }.sortBy(_._1)
    val norms = items.map(it => math.sqrt(dot(it._3, it._3)))
    val taken = new Array[Boolean](n)
    // cosines can be negative: a zero floor would silently clip the true
    // max-sim of anti-correlated candidates (caught by the oracle)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val rounds = math.min(k, n)
    val out = new Array[Any](rounds)
    var r = 1
    while (r <= rounds) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          // deliberately NOT rounded: rel and maxSim are already 6-dp
          // quantized, so the score doubles are bit-identical across
          // engines — while rounding them is the Exact.davg hazard
          // (lambda * a 6-dp decimal lands on exact .5 ties at digit 6,
          // where HALF_UP and scaled-double rounding disagree; caught by
          // the oracle on the fixture)
          val score =
            if (r == 1) lambda * items(i)._2
            else lambda * items(i)._2 - (1 - lambda) * maxSim(i)
          if (score > bestScore) { best = i; bestScore = score } // strict >: ties keep the lower id
        }
        i += 1
      }
      // every remaining score NaN (degenerate inputs) -> nothing comparable
      // left to select; return the rounds completed so far
      if (best < 0) {
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(out.take(r - 1))
      }
      taken(best) = true
      out(r - 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](items(best)._1, items(best)._2, r.toLong, bestScore))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          // zero-norm candidates make the quotient 0/0 = NaN; treat their
          // similarity as 0 so they stay selectable instead of poisoning
          // round6 (BigDecimal(NaN) throws)
          val den = norms(j) * norms(best)
          val sim = if (den == 0.0) 0.0 else round6(dot(items(j)._3, items(best)._3) / den)
          if (sim > maxSim(j)) maxSim(j) = sim
        }
        j += 1
      }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
  override def prettyName: String = "mmr_select"
}

object VectorExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API for the native dot product (Spark 4 Column<->Expression
    * conversion goes through the graftbridge shim).
    */
  def vectorDot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for the packed greedy MMR selection. */
  def mmrSelect(packed: Column, k: Int, lambda: Double): Column =
    ColumnBridge.column(MmrSelect(ColumnBridge.expression(packed), k, lambda))

  /** Foldable literal -> Double for SQL registration: SQL decimal literals
    * (e.g. `0.5`) eval to Spark Decimal, which is not a java.lang.Number.
    */
  def litDouble(e: Expression): Double = e.eval(null) match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(s"expected a numeric literal, got $other")
  }
}
