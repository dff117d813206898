package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch: keeps the k smallest
  * DISTINCT hash values seen per group. One pass, mergeable partials,
  * constant memory (k longs per group) — the 100 TB substitute for an
  * exact-distinct shuffle, like `approx_count_distinct`'s HLL, but fully
  * deterministic: the result depends only on the SET of inputs, never on
  * partitioning or merge order, so an external engine (the DuckDB oracle)
  * reproduces it bit-for-bit with sort+slice. Estimator: with hashes
  * uniform on [0, H), distinct-count ~= (k-1) * H / kth_min (Bar-Yossef et
  * al., "Counting distinct elements in a data stream", RANDOM 2002).
  *
  * Implemented as a [[TypedImperativeAggregate]] (the engine-native
  * aggregation path used by Spark's own collect_set/percentile — runs
  * inside ObjectHashAggregateExec, partials merge executor-side). Input
  * must be LongType (hash upstream however you like); nulls are ignored.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmin_values requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmin_values requires a BIGINT input (hash first), got $other")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Bounded distinct-min-k insert: O(log k), no-op once v >= current kth. */
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) {
      buf.add(v); ()
    } else if (v < buf.last()) {
      if (buf.add(v) && buf.size > k) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  /** Ascending array of the (<= k) minimum distinct hashes. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
  override def prettyName: String = "kmin_values"
}

object SketchExprs {

  /** Column API for the KMV sketch aggregate. */
  def kMinValues(c: Column, k: Int): Column =
    ColumnBridge.column(KMinValues(ColumnBridge.expression(c), k).toAggregateExpression())
}
