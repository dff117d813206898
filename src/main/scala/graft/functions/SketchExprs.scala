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
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

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

/** Misra-Gries summary: a bounded key -> counter map plus the total
  * decrement applied so far (the error term).
  */
final class MGSummary {
  val counts = new java.util.HashMap[Long, java.lang.Long]()
  var dec: Long = 0L
}

/** Misra-Gries / frequent-items heavy-hitters sketch over BIGINT keys:
  * one pass, at most `m` counters per group, mergeable partials (Agarwal
  * et al., "Mergeable summaries", PODS 2012). For every emitted key,
  * `lo <= true_count <= hi` where `hi - lo` is the total decrement; any
  * key with true frequency > n/(m+1) is guaranteed to be emitted. The
  * 100 TB path for "top sources / top hosts / hottest keys" over a
  * trillion rows: partials are m-sized regardless of input size, so the
  * final merge moves O(partitions * m) longs, never the key space.
  *
  * Determinism contract (what makes it oracle-checkable, same argument as
  * [[KMinValues]]): when `m` >= the number of distinct keys the sketch
  * never decrements and the counters are EXACT counts — independent of
  * row order and partitioning. In the lossy regime (m < distinct) the
  * counters depend on merge order like every MG implementation; only the
  * (lo, hi) bounds are guaranteed. Size m for the exact regime when you
  * need reproducibility, for the error bound n/(m+1) when you need scale.
  */
case class HeavyHitters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary]
  with UnaryLike[Expression] {

  require(m > 0, s"heavy_hitters requires capacity > 0, got $m")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a BIGINT key, got $other")
  }

  override def createAggregationBuffer(): MGSummary = new MGSummary

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      val cur = buf.counts.get(k)
      if (cur != null) {
        buf.counts.put(k, cur + 1L); ()
      } else if (buf.counts.size < m) {
        buf.counts.put(k, 1L); ()
      } else {
        // classic MG step: the new item and one unit of every counter
        // annihilate; counters that hit zero free their slot
        val it = buf.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
        buf.dec += 1L
      }
    }
    buf
  }

  override def merge(b1: MGSummary, b2: MGSummary): MGSummary = {
    val it = b2.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.counts.get(e.getKey)
      b1.counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    b1.dec += b2.dec
    if (b1.counts.size > m) {
      // subtract the (m+1)-th largest counter from everything and drop
      // non-positive counters — restores |counters| <= m and folds the
      // subtracted mass into the error term
      val vals = new Array[Long](b1.counts.size)
      val vi = b1.counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - m - 1) // (m+1)-th largest
      val ei = b1.counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= t) ei.remove() else e.setValue(e.getValue - t)
      }
      b1.dec += t
    }
    b1
  }

  /** Array of (key, lo, hi) sorted by lo desc then key — lo = counter
    * (never over-counts), hi = counter + total decrement (never under).
    */
  override def eval(buf: MGSummary): Any = {
    val n = buf.counts.size
    val keys = new Array[Long](n)
    val cnts = new Array[Long](n)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey; cnts(i) = e.getValue; i += 1
    }
    val order = (0 until n).sortBy(j => (-cnts(j), keys(j)))
    val rows: Array[Any] = order.map { j =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](keys(j), cnts(j), cnts(j) + buf.dec))
    }.toArray
    new GenericArrayData(rows)
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 16 * buf.counts.size)
    bb.putLong(buf.dec)
    bb.putInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    buf.dec = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.counts.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("lo", LongType, nullable = false),
      StructField("hi", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
  override def prettyName: String = "heavy_hitters"
}

object SketchExprs {

  /** Column API for the KMV sketch aggregate. */
  def kMinValues(c: Column, k: Int): Column =
    ColumnBridge.column(KMinValues(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API for the Misra-Gries heavy-hitters aggregate. */
  def heavyHitters(c: Column, m: Int): Column =
    ColumnBridge.column(HeavyHitters(ColumnBridge.expression(c), m).toAggregateExpression())
}
