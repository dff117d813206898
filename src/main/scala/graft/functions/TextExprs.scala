package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup/fingerprint hot paths.
  *
  * The composed forms (nested transform/sequence/aggregate higher-order
  * functions) are interpreted per row at ~20 ms/document — fine for one
  * query, but they amplify linearly under CPU contention and are evaluated
  * once per DAG branch. These expressions do the same work in one
  * imperative pass per row. Semantics are pinned to the HOF versions (and
  * to the DuckDB oracle lambdas) for ASCII text: same tokenization
  * (trim -> lower -> split on \s+ -> drop empties), same first-occurrence
  * shingle dedup, same fold(acc*31 + codepoint) mod 1e9+7 hash.
  */

/** Distinct word n-gram shingles of the lower-cased text
  * (imperative twin of Dedup.shingles).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
}

/** Polynomial rolling hash fold(acc*31 + codepoint) mod 1e9+7 — the
  * imperative twin of TextOps.polyHash (identical for ASCII; the HOF/oracle
  * forms iterate per character which equals per-UTF-16-unit here).
  */
case class PolyHash(child: Expression) extends UnaryExpression with CodegenFallback {
  private val P = 1000000007L

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31 + s.charAt(i).toLong) % P; i += 1 }
    java.lang.Long.valueOf(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash = copy(child = newChild)
}

object TextExprs {
  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
