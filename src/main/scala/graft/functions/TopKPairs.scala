package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded top-k buffer: a min-heap of (score, id) pairs where the
  * "max" under the eviction ordering is the WORST element (lowest
  * score; ties broken keeping the smaller id). */
final class TopKBuffer(val k: Int) {
  // dequeue order = element to evict: lower score first, then larger id
  private val evictFirst: Ordering[(Double, Long)] = (a, b) => {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictFirst)

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (evictFirst.compare((score, id), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((score, id))
    }
  }

  /** Descending score, ascending id — the window-rank order. */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortWith { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }
}

/** `graft_topk(score, id, k)` — per-group top-k as a custom Catalyst
  * [[TypedImperativeAggregate]] (SURVEY.md §4's escape-hatch tier (b)).
  *
  * Why a custom aggregate: Spark's built-in per-group top-k idiom is a
  * ranking window, which must shuffle EVERY row to its group's
  * partition and sort it. This aggregate keeps a k-bounded heap per
  * group, so partial aggregation reduces each map partition to ≤k rows
  * per group before the shuffle — at 100 TB that's the difference
  * between shuffling the fact table and shuffling #groups × k rows.
  * Returns `array<struct<score,id>>` sorted by (score desc, id asc),
  * identical to `row_number() OVER (ORDER BY score DESC, id)` ≤ k.
  */
case class TopKPairs(
    scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  // (ImplicitCastInputTypes' AbstractDataType is private[sql] in Spark 4
  // — validate explicitly instead of declaring coercions)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"graft_topk score must be DOUBLE, got ${scoreExpr.dataType}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"graft_topk id must be BIGINT, got ${idExpr.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckFailure("graft_topk k must be a constant INT")
    else TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { buf.add(in.readDouble(), in.readLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = c(0), idExpr = c(1), kExpr = c(2))
}

/** Registration: via [[GraftExtensions]] for
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * [[GraftFunctions.register]] on an existing session. */
object GraftFunctions {
  import org.apache.spark.sql.SparkSession

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKPairs(exprs(0), exprs(1), exprs(2)), "built-in")
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (exprs: Seq[Expression]) => TopKPairs(exprs(0), exprs(1), exprs(2))))
}
