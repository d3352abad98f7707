package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucket key as one codegen'd pass over the
  * vector — replacing nBits interpreted `aggregate(zip_with(...))`
  * folds (CodegenFallback) that each re-derive the md5 hyperplane signs
  * PER ROW. Here the deterministic ±1 sign matrix is computed once per
  * (nBits, dim) and cached; each row pays one tight loop.
  *
  * Bit-identical to the composed form (spec-enforced, oracle-mirrored):
  * plane p's component sign for index i is bit 0 of the first 8 md5 hex
  * chars of "p:i"; projections accumulate left-to-right; bucket bit p
  * is set iff projection ≥ 0 (so a NaN projection clears the bit, as
  * `when(proj >= 0, …)` does). Degenerate inputs keep the composed
  * form's null-poisoning semantics: a null element, or a vector shorter
  * than `dim` (zip_with null padding), nulls every projection → bucket
  * 0; elements beyond `dim` contribute −x (the padded-index branch). */
object SrpBucket {
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Boolean]]]()

  private def signs(nBits: Int, dim: Int): Array[Array[Boolean]] =
    signCache.computeIfAbsent((nBits, dim),
      new java.util.function.Function[(Int, Int), Array[Array[Boolean]]] {
        override def apply(key: (Int, Int)): Array[Array[Boolean]] = {
          val (bits, d) = key
          Array.tabulate(bits, d) { (p, i) =>
            (java.lang.Long.parseLong(
              MinHashSig.md5Hex(s"$p:$i").substring(0, 8), 16) & 1L) == 1L
          }
        }
      })

  def compute(vec: ArrayData, dim: Int, nBits: Int): Long = {
    val n = vec.numElements()
    var i = 0
    while (i < n) { // a null element poisons every projection → bucket 0
      if (vec.isNullAt(i)) return 0L
      i += 1
    }
    if (n < dim) return 0L // zip_with null padding poisons all planes
    val sg = signs(nBits, dim)
    val proj = new Array[Double](nBits)
    i = 0
    while (i < n) {
      val x = vec.getDouble(i)
      var p = 0
      while (p < nBits) {
        proj(p) += (if (i < dim && sg(p)(i)) x else -x)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      if (proj(p) >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

case class SrpBucketExpr(child: Expression, dim: Int, nBits: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if dim >= 1 && nBits >= 1 && nBits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bucket expects array<double> (got $other), dim/nBits positive, nBits <= 63")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_bucket"

  override def nullSafeEval(vec: Any): Any =
    SrpBucket.compute(vec.asInstanceOf[ArrayData], dim, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpBucket.compute($c, $dim, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)
}

object SrpBucketExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, dim: Int, nBits: Int): Column =
    ColumnBridge.column(SrpBucketExpr(ColumnBridge.expression(vec), dim, nBits))
}
