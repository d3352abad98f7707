package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment (argmax cosine over a fixed centroid
  * set) as ONE codegen'd expression whose generated code is O(1) in
  * k × dim: the centroid matrix rides in the codegen `references`
  * array and the argmax is a plain Java loop.
  *
  * The composed form this replaces — `greatest` over k
  * (cosine, cell) structs ([[graft.analytics.Similarity.nearestCellComposed]])
  * — generates k inlined cosine blocks: at real quantizer sizes
  * (k=256, dim=1024+) that is hundreds of thousands of IR nodes and a
  * generated method far past Janino's 64KB/constant-pool limits, i.e.
  * a silent CodegenFallback cliff exactly where the corpus scan is
  * hottest. Spec-pinned compiled at k=256 × dim=1024 under
  * CODEGEN_ONLY factory mode (AnalyticsSpec).
  *
  * Semantics match the composed form for non-null vectors
  * (spec-asserted equal, including ties and NaN):
  *  - argmax of cosine(vec, centroid); Spark total order on double
  *    (NaN greatest), ties resolve to the HIGHER cell id;
  *  - a null score (dim mismatch / null element) loses to any real
  *    score; if every score is null the highest cell id wins — the
  *    `greatest`-struct null-ordering artifact, reproduced exactly;
  *  - one deliberate divergence: a NULL input vector returns null
  *    (the composed form assigns it to the max cell id — an artifact
  *    worth diverging from; callers drop or pre-filter null vectors).
  */
object NearestCellImpl {
  /** centDots(i) = sequential self-dot of centroid i — precomputed
    * once; same fold order as [[CosineSim.compute]], so the quotient
    * is bit-identical to the per-row composed evaluation. */
  def selfDots(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var d = 0.0d; var i = 0
      while (i < c.length) { d += c(i) * c(i); i += 1 }
      d
    }

  def compute(v: ArrayData, cents: Array[Array[Double]], cellIds: Array[Int],
              centDots: Array[Double]): Int = {
    var bestCell = cellIds(cellIds.length - 1) // all-null-score default: max cell
    var bestScore = 0.0d
    var haveScore = false
    var ci = 0
    while (ci < cents.length) { // ascending cell id: ties land on the higher id
      val c = cents(ci)
      val n = v.numElements()
      var score: java.lang.Double = null
      if (n == c.length) {
        var dotVC = 0.0d; var dotVV = 0.0d
        var i = 0
        var ok = true
        while (ok && i < n) {
          if (v.isNullAt(i)) ok = false
          else {
            val x = v.getDouble(i)
            dotVC += x * c(i); dotVV += x * x
            i += 1
          }
        }
        if (ok) score = dotVC / (math.sqrt(dotVV) * math.sqrt(centDots(ci)))
      }
      if (score != null) {
        val sv = score.doubleValue()
        // Double.compare: NaN greatest, matching Spark's double order
        if (!haveScore || java.lang.Double.compare(sv, bestScore) >= 0) {
          haveScore = true; bestScore = sv; bestCell = cellIds(ci)
        }
      } else if (!haveScore) bestCell = cellIds(ci)
      ci += 1
    }
    bestCell
  }
}

case class NearestCellExpr(child: Expression, centroids: Seq[(Int, Seq[Double])])
  extends UnaryExpression {

  require(centroids.size >= 2, s"nearest-cell needs >= 2 centroids, got ${centroids.size}")
  require(centroids.map(_._1).distinct.size == centroids.size,
    "nearest-cell centroid ids must be distinct")
  require(centroids.map(_._2.length).distinct.size == 1,
    "nearest-cell centroids must share one dimensionality")

  // sorted ascending by cell id: the tie-break contract is positional
  @transient private lazy val sorted = centroids.sortBy(_._1)
  @transient private lazy val cellIds: Array[Int] = sorted.map(_._1).toArray
  @transient private lazy val matrix: Array[Array[Double]] =
    sorted.map(_._2.toArray).toArray
  @transient private lazy val centDots: Array[Double] = NearestCellImpl.selfDots(matrix)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects array<double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(v: Any): Any =
    NearestCellImpl.compute(v.asInstanceOf[ArrayData], matrix, cellIds, centDots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the centroid matrix is a runtime reference, NOT inlined source —
    // generated code size is constant in k × dim
    val centsRef = ctx.addReferenceObj("nearestCellCents", matrix, "double[][]")
    val idsRef = ctx.addReferenceObj("nearestCellIds", cellIds, "int[]")
    val dotsRef = ctx.addReferenceObj("nearestCellDots", centDots, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.NearestCellImpl.compute($v, $centsRef, $idsRef, $dotsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)
}

object NearestCellExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    ColumnBridge.column(NearestCellExpr(ColumnBridge.expression(vec), centroids))
}
