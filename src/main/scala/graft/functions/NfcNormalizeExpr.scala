package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd scalar expression —
  * SURVEY.md §4 escape-hatch tier (b): Spark 4 ships no `normalize`
  * SQL function, and a pretraining corpus pass MUST canonicalize
  * combining sequences before any hash-keyed stage (exact dedup,
  * MinHash shingles, winnowing) or visually-identical texts land in
  * different buckets ("é" composed vs "e"+U+0301 hash differently).
  *
  * Delegates to `java.text.Normalizer` (ICU-grade, in the JDK — no
  * dependency) on both the interpreted and codegen paths, so the
  * expression stays inside whole-stage codegen: the normalize call is
  * a static one-liner in the generated Java, exactly like
  * [[SimHashExpr]]'s digest helper. Fast paths, in order: pure-ASCII
  * input (numBytes == numChars — every code point one UTF-8 byte) is
  * NFC-invariant and returns the INPUT UTF8String after one byte
  * scan, zero allocation — at 100 TB virtually every document takes
  * this path; non-ASCII-but-already-NFC text pays ONE String
  * materialization for Normalizer.isNormalized and then returns the
  * input; only genuinely denormalized text pays the normalize copy.
  *
  * The DuckDB oracle mirrors it as `nfc_normalize(text)`; both
  * implement Unicode TR-15 NFC so outputs agree byte-for-byte.
  */
object NfcNormalize {
  import java.text.Normalizer

  def normalize(text: UTF8String): UTF8String = {
    if (text == null) return null
    // pure-ASCII short-circuit BEFORE any String materialization:
    // numChars is a byte scan, and numBytes == numChars iff every code
    // point is a single UTF-8 byte (ASCII) — ASCII is NFC-invariant
    if (text.numBytes == text.numChars) return text
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects STRING text, got $other")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(text: Any): Any =
    NfcNormalize.normalize(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))
}
