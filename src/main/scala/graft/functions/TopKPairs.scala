package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

// (the single bounded-heap buffer lives below as TopKTagBuffer —
// TopKPairs uses it with a null tag, so eviction/ordering/serialization
// semantics exist exactly once)

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
  extends TypedImperativeAggregate[TopKTagBuffer] {

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

  override def createAggregationBuffer(): TopKTagBuffer = new TopKTagBuffer(k)

  override def update(buf: TopKTagBuffer, input: InternalRow): TopKTagBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long], null)
    buf
  }

  override def merge(buf: TopKTagBuffer, other: TopKTagBuffer): TopKTagBuffer = {
    other.heap.foreach { case (s, i, _) => buf.add(s, i, null) }
    buf
  }

  override def eval(buf: TopKTagBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i, _) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: TopKTagBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (s, i, _) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKTagBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKTagBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { buf.add(in.readDouble(), in.readLong(), null); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = c(0), idExpr = c(1), kExpr = c(2))
}

/** THE bounded top-k buffer (shared by [[TopKPairs]], which passes a
  * null tag, and [[TopKTagged]]): a min-heap of (score, id, tag)
  * triples where the "max" under the eviction ordering is the WORST
  * element (lowest score; ties broken keeping the smaller id). The tag
  * is an opaque payload the ordering ignores — it rides along so
  * downstream projections (e.g. a corpus attribute like `label`) don't
  * need a second scan/join to recover it. Payloads are JVM-normalized
  * values (String/Int/Long/Double or null).
  *
  * Ordering uses `java.lang.Double.compare` everywhere — a TOTAL order
  * (a naive `!=`/`>` comparator is intransitive under NaN, which a
  * zero-vector cosine produces, and would make the output order
  * nondeterministic or crash TimSort). Scores are zero-normalized on
  * add (−0.0 → +0.0) so the total order agrees with Spark SQL's
  * double ordering, where the two zeros are equal. */
final class TopKTagBuffer(val k: Int) {
  private val evictFirst: Ordering[(Double, Long, Any)] = (a, b) => {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }
  val heap: mutable.PriorityQueue[(Double, Long, Any)] =
    mutable.PriorityQueue.empty(evictFirst)

  def add(score: Double, id: Long, tag: Any): Unit = {
    val s = if (score == 0.0d) 0.0d else score // merge −0.0 into +0.0
    if (heap.size < k) heap.enqueue((s, id, tag))
    else if (evictFirst.compare((s, id, tag), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((s, id, tag))
    }
  }

  /** Descending score, ascending id — the window-rank order. */
  def sorted: Seq[(Double, Long, Any)] =
    heap.toSeq.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c > 0 else a._2 < b._2
    }
}

/** `graft_topk_tag(score, id, tag, k)` — [[TopKPairs]] with a payload
  * column (STRING/INT/BIGINT/DOUBLE) carried through the heap; the
  * output struct's `tag` field keeps the input type. Same
  * map-side-combine contract (≤k rows per group per partition
  * pre-shuffle); returns `array<struct<score,id,tag>>` in
  * (score desc, id asc) order. */
case class TopKTagged(
    scoreExpr: Expression, idExpr: Expression, tagExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTagBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private val supportedTagTypes: Set[DataType] =
    Set(StringType, IntegerType, LongType, DoubleType)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, tagExpr, kExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"graft_topk_tag score must be DOUBLE, got ${scoreExpr.dataType}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"graft_topk_tag id must be BIGINT, got ${idExpr.dataType}")
    else if (!supportedTagTypes.contains(tagExpr.dataType))
      TypeCheckFailure(
        s"graft_topk_tag tag must be STRING/INT/BIGINT/DOUBLE, got ${tagExpr.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckFailure("graft_topk_tag k must be a constant INT")
    else TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType),
    StructField("tag", tagExpr.dataType))))
  override def prettyName: String = "graft_topk_tag"

  override def createAggregationBuffer(): TopKTagBuffer = new TopKTagBuffer(k)

  override def update(buf: TopKTagBuffer, input: InternalRow): TopKTagBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      // normalize the Catalyst value (UTF8String is mutable/reused) to a
      // stable JVM value for buffering
      val t = tagExpr.eval(input) match {
        case null => null
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => other
      }
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long], t)
    }
    buf
  }

  override def merge(buf: TopKTagBuffer, other: TopKTagBuffer): TopKTagBuffer = {
    other.heap.foreach { case (s, i, t) => buf.add(s, i, t) }
    buf
  }

  override def eval(buf: TopKTagBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i, t) =>
      InternalRow(s, i, t match {
        case str: String => org.apache.spark.unsafe.types.UTF8String.fromString(str)
        case other => other
      })
    }.toArray[Any])

  override def serialize(buf: TopKTagBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (s, i, t) =>
      out.writeDouble(s); out.writeLong(i)
      out.writeBoolean(t != null)
      if (t != null) t match {
        // int length + raw UTF-8, not writeUTF: modified-UTF-8 caps at
        // 65535 bytes and would crash the aggregation at shuffle/spill
        // time on a long tag value
        case str: String =>
          val b = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.writeInt(b.length); out.write(b)
        case n: java.lang.Integer => out.writeInt(n)
        case n: java.lang.Long => out.writeLong(n)
        case n: java.lang.Double => out.writeDouble(n)
        case other => throw new IllegalStateException(
          s"graft_topk_tag: unserializable tag ${other.getClass}")
      }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKTagBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKTagBuffer(in.readInt())
    var n = in.readInt()
    val readTag: DataInputStream => Any = tagExpr.dataType match {
      case StringType => in =>
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case IntegerType => in => Int.box(in.readInt())
      case LongType => in => Long.box(in.readLong())
      case DoubleType => in => Double.box(in.readDouble())
      case other => throw new IllegalStateException(s"graft_topk_tag: bad tag type $other")
    }
    while (n > 0) {
      val s = in.readDouble(); val i = in.readLong()
      val t = if (in.readBoolean()) readTag(in) else null
      buf.add(s, i, t); n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKTagged =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKTagged =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKTagged =
    copy(scoreExpr = c(0), idExpr = c(1), tagExpr = c(2), kExpr = c(3))
}

/** Registration: via [[GraftExtensions]] for
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * [[GraftFunctions.register]] on an existing session. */
object GraftFunctions {
  import org.apache.spark.sql.SparkSession

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKPairs(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_topk_tag", exprs => TopKTagged(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_section_values", exprs => SectionValuesExpr(exprs(0),
        exprs(1).eval().toString), "built-in")
    reg.createOrReplaceTempFunction(
      "udm_packet_parse", exprs => UdmPacketParseExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_to_json", exprs => StructToJsonExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSigExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_srp_bucket", exprs => SrpBucketExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashExpr(exprs(0)), "built-in")
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_], b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), b))
    inject("graft_topk", classOf[TopKPairs],
      exprs => TopKPairs(exprs(0), exprs(1), exprs(2)))
    inject("graft_topk_tag", classOf[TopKTagged],
      exprs => TopKTagged(exprs(0), exprs(1), exprs(2), exprs(3)))
    inject("graft_section_values", classOf[SectionValuesExpr],
      exprs => SectionValuesExpr(exprs(0), exprs(1).eval().toString))
    inject("udm_packet_parse", classOf[UdmPacketParseExpr],
      exprs => UdmPacketParseExpr(exprs(0)))
    inject("graft_to_json", classOf[StructToJsonExpr],
      exprs => StructToJsonExpr(exprs(0)))
    inject("graft_minhash", classOf[MinHashSigExpr],
      exprs => MinHashSigExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("graft_cosine", classOf[CosineExpr],
      exprs => CosineExpr(exprs(0), exprs(1)))
    inject("graft_srp_bucket", classOf[SrpBucketExpr],
      exprs => SrpBucketExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
    inject("graft_simhash", classOf[SimHashExpr],
      exprs => SimHashExpr(exprs(0)))
  }
}
