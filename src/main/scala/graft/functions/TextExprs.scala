package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup/fingerprint hot paths.
  *
  * The composed forms (nested transform/sequence/aggregate higher-order
  * functions) are interpreted per row at ~20 ms/document — fine for one
  * query, but they amplify linearly under CPU contention and are evaluated
  * once per DAG branch. These expressions do the same work in one
  * imperative pass per row, and implement `doGenCode` so the ENCLOSING
  * stage keeps whole-stage codegen (a CodegenFallback expression would
  * de-codegen every x01/x04-x07/x16-shaped pipeline stage it appears in).
  * Semantics are pinned to the HOF versions (and to the DuckDB oracle
  * lambdas) for ASCII text: same tokenization (trim -> lower -> split on
  * \s+ -> drop empties), same first-occurrence shingle dedup, same
  * fold(acc*31 + codepoint) mod 1e9+7 hash.
  */

/** ONE implementation per kernel, shared by interpreted eval and generated
  * code: `doGenCode` emits a static call into this object (the same shape
  * Spark's own `StaticInvoke` uses), so the char/token loops are never
  * duplicated as Java source strings and cannot drift from the interpreted
  * path. Scala top-level objects compile with static forwarders, so the
  * generated Java calls these directly.
  */
object TextExprCode {
  private val P = 1000000007L

  /** fold(acc*31 + codepoint) mod 1e9+7 over the string's UTF-16 units. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 31 + str.charAt(i).toLong) % P; i += 1 }
    acc
  }

  private def tokenize(s: UTF8String): Array[String] =
    s.toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Distinct word n-gram shingles in first-occurrence order. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(s)
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

  /** 64-bit salted-composition SimHash — see [[SimHash64]] for the scheme. */
  def simHash64(s: UTF8String): Long = {
    val toks = tokenize(s)
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      var j = 0
      while (j < 4) {
        var acc = ('a' + j).toLong // == fold of the one-char salt prefix
        var ci = 0
        while (ci < t.length) { acc = (acc * 31 + t.charAt(ci).toLong) % P; ci += 1 }
        var b = 0
        while (b < 16) {
          val idx = j * 16 + b
          if (((acc >> b) & 1L) == 1L) votes(idx) += 1 else votes(idx) -= 1
          b += 1
        }
        j += 1
      }
      ti += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}

/** Distinct word n-gram shingles of the lower-cased text
  * (imperative twin of Dedup.shingles).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextExprCode.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprCode.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
}

/** Polynomial rolling hash fold(acc*31 + codepoint) mod 1e9+7 — the
  * imperative twin of TextOps.polyHash (identical for ASCII; the HOF/oracle
  * forms iterate per character which equals per-UTF-16-unit here).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextExprCode.polyHash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprCode.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash = copy(child = newChild)
}

/** 64-bit SimHash in ONE pass over the text — the scale form of
  * Dedup.simhash. The 16-bit HOF version re-scans the token-hash array once
  * per bit (16 interpreted `aggregate` calls — HOFs have no codegen and are
  * re-evaluated per DAG branch); 64 bits that way would be 64 re-scans.
  * Here: tokenize once, per token fold FOUR salted polynomial hashes
  * ('a'|'b'|'c'|'d' prefix — the salt is the fold seed, so one pass per
  * hash), vote 16 bits from each into a 64-slot tally, assemble the sign
  * vector. 16 bits of a mod-1e9+7 hash are honest entropy; 64 would not be
  * (the modulus is < 2^30), hence the salted composition.
  *
  * The DuckDB oracle mirrors this exactly with four salted list_transform
  * hash lists (same fold, same prefixes), so the 64-bit fingerprints
  * hash-match cross-engine.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextExprCode.simHash64(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprCode.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
}

object TextExprs {
  def simHash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
