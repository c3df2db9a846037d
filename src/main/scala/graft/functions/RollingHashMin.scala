package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum Karp-Rabin rolling hash over all `k`-byte windows of a string
  * — the winnowing-style document fingerprint: two documents sharing
  * their minimal window hash very likely share a k-byte substring. The
  * rolling update makes the whole scan O(n) (each window hash derived
  * from the previous in O(1)); an equivalent per-window polynomial sum
  * (what the DuckDB oracle computes) is O(n·k) but lands on the same
  * residues, since (Σ cᵢ·B^i) mod M is congruent however accumulated.
  * Returns null for strings shorter than k.
  */
// CodegenFallback: this evaluates once per document (no per-pair hot
// path), and the O(n) scan dominates dispatch overhead anyway.
case class RollingHashMin(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_min expects STRING, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val r = RollingHashMin.minHash(v.asInstanceOf[UTF8String], k)
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_min"
}

object RollingHashMin {
  val Base = 31L
  val Mod = 2147483647L // 2^31 - 1

  /** O(n) rolling scan; returns -1 when the string has < k bytes. */
  def minHash(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return -1L
    // B^(k-1) mod M, the drop-term multiplier
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    var min = h
    i = k
    while (i < n) {
      val out = (bytes(i - k) & 0xff) * pow % Mod
      h = ((h - out + Mod) % Mod * Base + (bytes(i) & 0xff)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }
}
