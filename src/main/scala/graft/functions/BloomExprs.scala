package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Engine-native Bloom filter for join pruning at ingest scale.
  *
  * The 100 TB pattern this enables (see ExtensionQueries x52): membership
  * of an incoming batch against a massive historical corpus without ever
  * shuffling the corpus for the join. The corpus side folds its keys into
  * fixed-size bitset partials (one per partition, merged by bitwise OR — a
  * classic mergeable sketch, so the map-side combine does almost all the
  * work), the driver collects ONE bitset of a few hundred KB, and the
  * batch side probes it map-only. Only bloom-positive candidates — true
  * members plus the small false-positive tail — participate in the exact
  * confirm join, and the candidate side is by construction small enough to
  * broadcast. The final answer is EXACT regardless of filter sizing: a
  * Bloom filter has no false negatives, so bloom-negative rows are
  * definitely new, and the confirm join removes the false positives.
  *
  * Probe positions use the Kirsch–Mitzenmacher double-hashing scheme
  * (h1 + i*h2 over two splitmix64-finalized halves of the key), which
  * preserves the asymptotic false-positive rate of k independent hashes
  * with two multiplies per key. Everything is integer arithmetic on a
  * fixed seed — bit-identical across partitionings and runs.
  */
object BloomExprCode {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits for `key` in `words` (numBits = words.length*64). */
  def add(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong * 64L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  /** Probe: true iff every probe bit for `key` is set. Static so codegen
    * calls the same kernel as interpreted eval (the TextExprCode pattern).
    */
  def mightContain(words: Array[Long], key: Long, numHashes: Int): Boolean = {
    val numBits = words.length.toLong * 64L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Aggregate building the corpus-side bitset: each partition folds its keys
  * into a local long[] and partials merge by bitwise OR, so the shuffle
  * carries one fixed-size buffer per partition regardless of corpus size.
  */
case class BloomAgg(
    child: Expression,
    numWords: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numWords > 0 && Integer.bitCount(numWords) == 1, "numWords must be a power of two")
  require(numHashes >= 1 && numHashes <= 16, "numHashes in [1,16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bloom_agg needs BIGINT input, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomExprCode.add(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** Map-only probe against a driver-collected bitset. The bitset rides along
  * as a reference object (ctx.addReferenceObj), not a giant literal, so the
  * generated code stays small and the enclosing stage keeps whole-stage
  * codegen.
  */
case class BloomMightContain(child: Expression, words: Array[Long], numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      BloomExprCode.mightContain(words, input.asInstanceOf[Long], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomExprCode.mightContain($ref, $c, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {

  /** Column API for the bitset-building aggregate. */
  def bloomAgg(c: Column, numWords: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(c), numWords, numHashes).toAggregateExpression())

  /** Column API for the probe. */
  def mightContain(c: Column, words: Array[Long], numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), words, numHashes))
}
