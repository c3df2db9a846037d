package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join — the whole-operator Catalyst extension tier
  * (logical node → strategy → physical merge-scan), for the ONE join
  * shape Spark's relational algebra cannot express as a join: "for each
  * left row, the LATEST right row of the same key at-or-before the left
  * row's time".
  *
  * Why a custom operator instead of composition: the inequality-join
  * encoding explodes to per-key cross products before the argmax, and
  * the union+window encoding (graft's `q_join_asof`) requires both
  * sides to be null-padded into ONE schema and carries window-buffer
  * state per row. This operator instead CO-PARTITIONS the two tables on
  * the key (one exchange each — exactly a sort-merge join's movement
  * cost) and streams both sorted sides through a two-pointer merge per
  * partition: O(|L| + |R|) work, O(1) state (the single held payload),
  * no padded union, no window buffers. At 100 TB that is the plan you
  * want: the only data movement is the same pair of hash exchanges any
  * equi-join pays.
  *
  * Semantics: right rows with `rightTime <= leftTime` match; among
  * matches the LAST in the right side's (key, time, tiebreak…) sort
  * order wins — i.e. the max-time row, with ties broken by the
  * OPTIONAL `rightTiebreak` columns (max under ascending order). With
  * no tiebreak, the winner among equal-(key, time) right rows is
  * whichever the shuffle delivered last — callers needing determinism
  * pass a tiebreak or aggregate upstream. Unmatched left rows emit
  * null payload (left-outer shape). Time attributes must be LongType
  * or TimestampType (both are 8-byte values in InternalRow).
  *
  * Null contract (enforced in the exec, null-UNSAFE like an ordinary
  * equi-join): a right row with any null key or a null time can never
  * be the held match; a left row with any null key or a null time is
  * emitted unmatched (null payload). Null rows still merge in their
  * sorted (nulls-first) positions, so the two-pointer movement is
  * unaffected.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    rightTiebreak: Seq[Attribute] = Nil) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  require(Seq(leftTime, rightTime).forall(a =>
    a.dataType == LongType || a.dataType == TimestampType),
    "as-of time columns must be LongType or TimestampType")
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]. Registered either through
  * `spark.experimental.extraStrategies` (runtime, what
  * [[graft.ops.AsOf]] does) or `GraftExtensions`' planner injection
  * (deployment).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, p, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, p, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join: requires both children clustered on their
  * keys and sorted by (keys, time) — EnsureRequirements inserts the
  * exchanges/sorts exactly as it does for a sort-merge join — then
  * two-pointer-merges each co-partition pair. Right rows are consumed
  * at most once across the whole left side (the pointer never rewinds,
  * because the left side is ALSO time-sorted within each key), so the
  * per-partition cost is one pass over each side and the only buffered
  * state is the single held (key, payload) pair.
  *
  * AQE interplay, stated honestly: shuffle coalescing applies (both
  * inputs are ordinary exchanges and AQE keeps the pair consistent —
  * exercised by the randomized equivalence property), but AQE's
  * skew-JOIN splitting recognizes only the built-in join execs, so a
  * pathologically hot key lands in one task here. The mitigation is
  * the same one a skewed sort-merge join needs: pre-aggregate or salt
  * the hot key upstream (ops/Skew).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    rightTiebreak: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" ->
      SQLMetrics.createMetric(sparkContext, "left rows with an as-of match"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // the right side additionally sorts by the caller's tiebreak columns,
  // so "last consumed wins" is deterministic among equal-(key, time)
  // right rows whenever a tiebreak is supplied
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  // the merge preserves the left side's arrival order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val pay = payload
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind the payload side of the projection as NULLABLE: the
      // unmatched-left path feeds a null row, and a non-nullable
      // BoundReference would skip the null check and read garbage zeros
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ pay.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(pay.size)
      val rBuf = rIter.buffered
      // The single piece of merge state: the most recent right row whose
      // key matched some left key — validity is re-checked against the
      // CURRENT left key at emit time, so stale holds from earlier key
      // groups are inert.
      var heldKey: UnsafeRow = null
      var heldPayload: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l)
        val ltNull = ltRow.isNullAt(0)
        val lt = if (ltNull) 0L else ltRow.getLong(0)
        var scanning = true
        while (scanning && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          val c = keyOrd.compare(rk, lk)
          // null times sort first (ascending nulls-first), so null-time
          // right rows of the current key are consumable at any left
          // row; a null-time LEFT row (also sorted first within its
          // key) consumes nothing non-null of its own key
          val rtRow = if (c == 0) rTimeProj(r) else null
          val rtNull = rtRow != null && rtRow.isNullAt(0)
          if (c < 0 ||
              (c == 0 && (rtNull || (!ltNull && rtRow.getLong(0) <= lt)))) {
            // null-unsafe hold: rows with a null key or null time are
            // consumed in merge order but can never become the match
            if (c == 0 && !rtNull && !rk.anyNull) {
              heldKey = rk.copy()
              heldPayload = payProj(r).copy()
            }
            rBuf.next()
          } else scanning = false
        }
        val matched = !ltNull && !lk.anyNull &&
          heldKey != null && keyOrd.compare(heldKey, lk) == 0
        numOutputRows += 1
        if (matched) numMatched += 1
        resultProj(joined(l, if (matched) heldPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
