package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalizer — the first step of
  * every text-curation pipeline: a decomposed "é" (e + U+0301) and the
  * precomposed "é" (U+00E9) must hash, dedup, shingle, and join as THE
  * SAME string, or near-dup detection silently fragments by encoding
  * accident. Spark ships no normalization built-in, so this is a native
  * codegen Expression over `java.text.Normalizer` (one static call —
  * no UDF serialization, no row boxing); already-normalized input
  * (ASCII fast path, `Normalizer.isNormalized`) returns the original
  * UTF8String without re-encoding, which is the overwhelmingly common
  * case in large corpora. DuckDB's `nfc_normalize` implements the same
  * Unicode algorithm, making normalization pipelines cross-engine
  * oracled; the combining-mark cases are additionally spec-pinned
  * (CurateOpsSpec) since ASCII corpora exercise only the fast path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Shared by interpreted and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
