package graft.functions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches as NATIVE Catalyst aggregates — the
  * quantile analogue of the HLL/theta sketch surface: land one sketch
  * per fine partition, answer any coarser grain by MERGING sketches
  * with no rescan of the raw rows (`percentile`/`approx_percentile`
  * results do not re-aggregate; sketches do). Implemented as
  * [[TypedImperativeAggregate]] — the object-buffer aggregate Spark's
  * own percentile_approx uses — so the sketch lives as a heap object
  * through partial aggregation and is serialized ONLY at shuffle
  * boundaries, not per row (a UDAF over a binary Dataset column would
  * pay heapify/toByteArray per input row).
  *
  * Exactness threshold, the DataSketches oracle discipline: a KLL
  * sketch retains every item until its first compaction, so with
  * n ≤ k items `getQuantile(q, INCLUSIVE)` is EXACTLY the order
  * statistic at 1-based position ceil(q·n) — q_kll_quantiles sizes k
  * ABOVE its corpus's largest group (642 customers/nation at sf0.1) so
  * the whole surface is oracled by an explicit order-statistic query;
  * past k the sketch degrades to bounded normalized rank error (~1.65%
  * at k=200, smaller for larger k).
  */
object KllSketch {
  /** Default sketch size: exact below 200 items/group, ~1.65% rank
    * error above.
    */
  val DefaultK = 200

  private[functions] def heapify(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  /** Shared registration-time parsing of the optional k argument (one
    * definition for the four registry sites in Udfs/GraftExtensions).
    * k must be a foldable literal — the sketch size is a plan-time
    * property, not a per-row value.
    */
  def kArg(exprs: Seq[Expression]): Int =
    if (exprs.size > 1) {
      require(exprs(1).foldable, "KLL sketch size k must be a literal")
      exprs(1).eval().asInstanceOf[Number].intValue()
    } else DefaultK
}

/** `kll_sketch_agg(value BIGINT, k INT) -> BINARY` — sketch a column. */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  // AbstractDataType (the ImplicitCastInputTypes vocabulary) is
  // private[sql] in Spark 4, so coercion is done manually: any
  // integral column is accepted (checked at analysis below) and
  // widened per row in update() — no ClassCastException on INT input.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires an integral column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: KllLongsSketch, other: KllLongsSketch): KllLongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** `kll_merge_agg(sk BINARY, k INT) -> BINARY` — union stored sketches:
  * the re-aggregation path (daily sketches → weekly/any-grain answer,
  * zero raw-data rescan).
  */
case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires a BINARY sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllLongsSketch, other: KllLongsSketch): KllLongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `kll_sketch_quantile(sk BINARY, q DOUBLE) -> BIGINT` — the INCLUSIVE
  * quantile: smallest retained item whose inclusive rank ≥ q (for an
  * exact-regime sketch of n items, the order statistic at 1-based
  * position ceil(q·n)). Null for an empty sketch. Scalar extraction
  * runs on post-aggregate rows (one per group), so interpreted eval is
  * off the hot path — CodegenFallback by design.
  */
case class KllSketchQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_sketch_quantile"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  // a bare `0.5` literal parses as DECIMAL(1,1) — accept any numeric
  // rank and widen in eval (AbstractDataType is private[sql] in Spark
  // 4, so the ImplicitCastInputTypes route is unavailable here)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_quantile requires (BINARY, numeric rank), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val sketch = KllSketch.heapify(sk.asInstanceOf[Array[Byte]])
    val rank = q match {
      case d: Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
    if (sketch.isEmpty) null
    else sketch.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllSketchQuantile = copy(left = l, right = r)
}
