package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two `array<double>` columns as one codegen'd
  * pass — replacing the interpreted `aggregate(zip_with(a,b,*))`
  * higher-order chain (HOFs are CodegenFallback in Spark 4), which
  * walks both arrays THREE times through per-element lambda boxing.
  *
  * Bit-identical to the composed form
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with left-to-right
  * fold accumulation (spec-enforced, and the DuckDB oracles mirror the
  * same sequential double summation):
  *  - the three accumulators each add terms in index order, exactly as
  *    three separate folds would;
  *  - mismatched lengths or a null element → null (zip_with pads with
  *    null and `acc + null` poisons the fold);
  *  - empty arrays → 0/0 = NaN, as the fold's 0.0 seeds produce.
  */
object CosineSim {
  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dotAB = 0.0d; var dotAA = 0.0d; var dotBB = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dotAB += x * y; dotAA += x * x; dotBB += y * y
      i += 1
    }
    dotAB / (math.sqrt(dotAA) * math.sqrt(dotBB))
  }
}

case class CosineExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two array<double>, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val boxed = ctx.freshName("cosBoxed")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          Object $boxed = graft.functions.CosineSim.compute(${leftGen.value}, ${rightGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((Double) $boxed).doubleValue();
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object CosineExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
