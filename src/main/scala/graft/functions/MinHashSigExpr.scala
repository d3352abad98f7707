package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE narrow codegen'd pass —
  * SURVEY.md §4 escape-hatch tier (b) applied to the dedup pipeline's
  * hashing stage.
  *
  * Semantically identical (oracle-enforced) to the composed-operator
  * form: word k-shingles of `trim(text)` split on `\s+`; hash j is the
  * 8-hex-char slice (j mod 4) of `md5("⌊j/4⌋:" || shingle)`; signature
  * slot j = lexicographic minimum over shingles; NULL when the document
  * has fewer than k words. The composed form costs explode → shuffle →
  * 8-slot partial agg → join-back per document; this expression loops
  * over the shingles inside the projection — same md5 work, zero
  * shuffle machinery, and the dedup pipeline's signature stage becomes
  * scan-speed. */
object MinHashSig {
  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private[functions] def md5Hex(s: String): String = {
    val d = digestPool.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private val wsPattern = java.util.regex.Pattern.compile("[ \\t\\n\\x0B\\f\\r]+")

  /** null when < k words (matching the composed form's left-join nulls).
    * Tokenization replicates the SQL pipeline exactly: `trim` is
    * UTF8String.trim (SQL space-only trim, NOT Java's ≤0x20 trim) and
    * the split keeps trailing empty tokens (Spark `split` limit −1,
    * NOT Java's default drop). */
  def compute(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    if (text == null) return null
    val trimmed = text.trim().toString
    val words = wsPattern.split(trimmed, -1)
    if (words.length < k) return null
    val nGroups = (numHashes + 3) / 4
    val mins = new Array[String](numHashes)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val nShingles = words.length - (k - 1)
    while (i < nShingles) {
      sb.setLength(0)
      var w = 0
      while (w < k) {
        if (w > 0) sb.append(' ')
        sb.append(words(i + w))
        w += 1
      }
      val shingle = sb.toString
      var g = 0
      while (g < nGroups) {
        val hex = md5Hex(g + ":" + shingle)
        var r = 0
        while (r < 4 && g * 4 + r < numHashes) {
          val j = g * 4 + r
          val slice = hex.substring(8 * r, 8 * r + 8)
          if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
          r += 1
        }
        g += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }
}

case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && numHashes >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects STRING text (got $other) and positive k/numHashes")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(text: Any): Any =
    MinHashSig.compute(text.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.MinHashSig.compute(${childGen.value}, $k, $numHashes);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), k, numHashes))
}
