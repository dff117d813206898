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
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  private val P = 1000000007L

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
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
    java.lang.Long.valueOf(out)
  }

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
