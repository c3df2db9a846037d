package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch as a NATIVE Catalyst aggregate — the one-pass
  * production form of `q_countmin`'s declarative 4×-explode build: the
  * d×w counter plane lives as a heap long-array through partial
  * aggregation ([[TypedImperativeAggregate]], the object-buffer shape
  * Spark's percentile_approx uses) and crosses the shuffle ONCE as 8 KB
  * of counters, never as exploded (row, bucket) tuples. Counters are
  * plain sums, so partial/final merging is EXACT under any partitioning
  * — the mergeability that lets per-shard sketches land as columns and
  * answer any coarser grain later via [[CountMinMergeAgg]] with zero
  * raw-token rescan (the KLL/HLL/theta discipline).
  *
  * Hash parity is the load-bearing choice: row r's bucket is the r-th
  * disjoint 8-hex-char window of ONE lowercase `md5(token)` digest,
  * parsed base-16 mod width — bit-identical to the SQL expression
  * `pmod(conv(substring(md5(tok), r*8+1, 8), 16, 10), 256)` used by the
  * declarative build AND by the DuckDB oracle, so the native aggregate
  * is provable against both: q_countmin_native's output must
  * hash-match q_countmin's oracle exactly, not just approximately.
  */
object CountMin {
  val Depth = 4
  val Width = 256

  /** Lowercase-hex md5 of the UTF-8 token bytes — what Spark's and
    * DuckDB's `md5(...)` both return.
    */
  def md5Hex(s: UTF8String): String = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < dig.length) {
      sb.append(Character.forDigit((dig(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(dig(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Row r's bucket: window r of the digest, base-16, mod width. The
    * 8-hex-char value is ≤ 0xFFFFFFFF, so the Long parse never
    * overflows and `%` equals `pmod` (non-negative operand).
    */
  def bucket(md5hex: String, r: Int): Int =
    (java.lang.Long.parseLong(md5hex.substring(r * 8, r * 8 + 8), 16) % Width).toInt

  private[functions] def serializeCells(cells: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cells.length * 8)
    cells.foreach(bb.putLong)
    bb.array()
  }

  private[functions] def deserializeCells(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** `countmin_agg(tok STRING) -> ARRAY<BIGINT>` — build the d×w counter
  * plane (flattened row-major: cell (r, b) at index r·w + b).
  */
case class CountMinAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  import CountMin._

  override def prettyName: String = "countmin_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"countmin_agg requires a STRING column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = md5Hex(v.asInstanceOf[UTF8String])
      var r = 0
      while (r < Depth) { buf(r * Width + bucket(hex, r)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = serializeCells(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    deserializeCells(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

/** `countmin_merge_agg(cells ARRAY<BIGINT>) -> ARRAY<BIGINT>` — union
  * stored sketches by elementwise sum: the re-aggregation path
  * (per-shard sketches → corpus answer, zero raw-token rescan). Exact,
  * because counters are plain sums.
  */
case class CountMinMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  import CountMin._

  override def prettyName: String = "countmin_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"countmin_merge_agg requires ARRAY<BIGINT> cells, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == buf.length,
        s"countmin_merge_agg: sketch has ${arr.numElements()} cells, " +
          s"expected ${buf.length}")
      var i = 0
      while (i < buf.length) {
        // getLong on a null cell silently reads garbage (typically 0) —
        // a null inside a sketch means the column was built wrong, so
        // corrupt counters must fail loud, not skew the merge
        require(!arr.isNullAt(i),
          s"countmin_merge_agg: null counter at cell $i — not a valid sketch")
        buf(i) += arr.getLong(i); i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = serializeCells(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    deserializeCells(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinMergeAgg =
    copy(child = c)
}
