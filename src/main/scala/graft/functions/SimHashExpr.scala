package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 64-bit SimHash as ONE narrow codegen'd pass —
  * SURVEY.md §4 escape-hatch tier (b) applied to the third dedup
  * family's fingerprint stage, the [[MinHashSigExpr]] pattern.
  *
  * Semantically identical (oracle- and spec-enforced) to the composed
  * form in [[graft.analytics.Dedup.simhashComposed]]: tokens are
  * `lower(text)` split on `[^a-z0-9]+` with empties dropped
  * (TextAnalysis.bpeishTokens); each token's md5 contributes ±1 votes
  * per bit position (term frequency = vote multiplicity) in two 32-bit
  * halves — `hi` from hex chars [0,8), `lo` from [8,16), i.e. the
  * digest's first/second 4 bytes as unsigned ints; fingerprint bit =
  * vote sum > 0. NULL when the document has zero tokens (the composed
  * form's explode drops those docs).
  *
  * The composed form explodes every token and shuffles 64 partial-sum
  * vote columns per doc through a groupBy; this expression folds the
  * votes inside the projection — same md5 work, zero shuffle, and the
  * fingerprint stage runs at scan speed. */
object SimHash {
  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val sepPattern = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** (hi, lo) fingerprint struct, or null for token-less text.
    * Lowercasing is UTF8String.toLowerCase — the engine's `lower`,
    * not locale-sensitive java.lang.String.toLowerCase. */
  def compute(text: UTF8String): InternalRow = {
    if (text == null) return null
    val lowered = text.toLowerCase.toString
    val tokens = sepPattern.split(lowered, -1)
    val votes = new Array[Int](64)
    var any = false
    val d = digestPool.get()
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
        any = true
        d.reset()
        val h = d.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // unsigned 32-bit halves = hex slices [0,8) and [8,16) of the
        // digest (what conv(substring(md5, ...), 16, 10) yields)
        val hi = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        val lo = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (((hi >> b) & 1L).toInt << 1) - 1
          votes(32 + b) += (((lo >> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      t += 1
    }
    if (!any) return null
    var hiFp = 0L
    var loFp = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) hiFp |= 1L << b
      if (votes(32 + b) > 0) loFp |= 1L << b
      b += 1
    }
    val row = new GenericInternalRow(2)
    row.setLong(0, hiFp)
    row.setLong(1, loFp)
    row
  }
}

case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects STRING text, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("simhash_hi", LongType, nullable = false),
    StructField("simhash_lo", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(text: Any): Any =
    SimHash.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.SimHash.compute(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))
}
