package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Native AS-OF join — the whole-operator tier of the custom-operator
  * ladder (logical node + strategy + physical exec), for the one join shape
  * Spark's built-ins genuinely cannot express as a single operator: for
  * each left row, the LATEST right row with `rightTime <= leftTime` within
  * the same key (left-outer: unmatched lefts keep null right columns).
  *
  * q12 emulates this with a union + running-`last` window — correct, but it
  * materializes both sides into one sorted stream and carries tag/padding
  * columns. This operator IS the textbook merge: both children arrive
  * hash-clustered on the key and sorted by (key, time) — the SAME
  * distribution+ordering contract SortMergeJoin uses, so Catalyst inserts
  * exactly one exchange + sort per side (spillable, AQE-coalesced) — and
  * each partition pair merges in one forward pass holding ONE buffered
  * right row. No window state, no union, no per-group memory.
  *
  * Semantics notes: null keys never match (SQL equality), a null left time
  * matches nothing, null right times are discarded; ties on rightTime take
  * the last row in sort order. Inclusive bound (>=), matching DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`, which is the oracle
  * for q28.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoin -> AsOfJoinExec. Registered by
  * [[graft.GraftExtensions]] and lazily by the [[AsOf]] facade.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** SMJ's contract: both sides clustered on the key... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** ...and sorted by (key, time) — which also makes the merge a single
    * forward pass.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = TypeUtils.getInterpretedOrdering(lTimeExpr.dataType)
        .asInstanceOf[Ordering[Any]]
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeEval = BindReferences.bindReference(lTimeExpr, leftOut)
      val rTimeEval = BindReferences.bindReference(rTimeExpr, rightOut)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against NULLABLE right attrs: unmatched lefts feed an all-null
      // right row, and a non-nullable BoundReference would skip the null
      // check and read garbage zeros
      val proj = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // one-row lookahead on the right; key copied because the
        // projection buffer is reused
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
          } else { rHead = null; rHeadKey = null }
        advanceRight()

        // latest matching right row seen for the current left key
        private var lastMatch: InternalRow = _
        private var lastMatchKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (lastMatch != null && keyOrd.compare(lastMatchKey, lk) != 0) {
            lastMatch = null; lastMatchKey = null
          }
          val lt = lTimeEval.eval(l)
          if (lk.anyNull || lt == null) {
            // SQL equality: null keys match nothing; null time precedes
            // every right time, so no match either — and the cursor stays.
            joined(l, nullRight)
          } else {
            var advancing = true
            while (advancing && rHead != null) {
              val c = keyOrd.compare(rHeadKey, lk)
              if (c < 0) {
                // right key already passed by the left stream — discard
                lastMatch = null; lastMatchKey = null
                advanceRight()
              } else if (c == 0) {
                val rt = rTimeEval.eval(rHead)
                if (rt == null) {
                  advanceRight() // null right time can never match; don't block the key
                } else if (timeOrd.compare(rt, lt) <= 0) {
                  lastMatch = rHead.copy()
                  lastMatchKey = rHeadKey // already a copy
                  advanceRight()
                } else advancing = false
              } else advancing = false
            }
            joined(l, if (lastMatch != null) lastMatch else nullRight)
          }
          proj(joined)
        }
      }
    }
  }
}

/** DataFrame facade: `AsOf.join(purchases, signups, Seq("user_id" -> "uid"),
  * "ts" -> "sts")`. Registers [[AsOfJoinStrategy]] in the session's
  * experimental strategies on first use, so the operator works in ANY
  * session, not only extensions-built ones.
  */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      time: (String, String)): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column pair")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of $side column '$n' not found in ${p.output.map(_.name)}"))
    val lKeys = keys.map(k => attr(lp, k._1, "left key"))
    val rKeys = keys.map(k => attr(rp, k._2, "right key"))
    val lTime = attr(lp, time._1, "left time")
    val rTime = attr(rp, time._2, "right time")
    // The logical node is built from already-ANALYZED children, so
    // Catalyst's implicit type coercion never runs over it: an IntegerType
    // left key against a LongType right key would compare UnsafeRows of
    // different physical layouts using the left side's ordering and
    // silently return wrong rows (mismatched time types at best throw a
    // ClassCastException in the interpreted ordering). Fail fast instead.
    def sameType(l: Attribute, r: Attribute, what: String): Unit =
      require(
        org.apache.spark.sql.types.DataType.equalsStructurally(
          l.dataType, r.dataType, ignoreNullability = true),
        s"as-of $what type mismatch: left '${l.name}' is ${l.dataType.sql} but " +
          s"right '${r.name}' is ${r.dataType.sql} — cast one side before joining")
    lKeys.lazyZip(rKeys).foreach((l, r) => sameType(l, r, "key"))
    sameType(lTime, rTime, "time")
    DatasetBridge.ofRows(spark, AsOfJoin(lp, rp, lKeys, rKeys, lTime, rTime))
  }
}
