package graft.functions

import com.fasterxml.jackson.core.{JsonEncoding, JsonFactory, JsonGenerator}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, SpecializedGetters, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-driven struct→JSON serializer, byte-identical to
  * `to_json(col, Map("ignoreNullFields" -> "true"))` for the supported
  * type lattice (string/int/bigint/double/boolean/struct/array) — the
  * symmetric counterpart of [[UdmPacketParseExpr]].
  *
  * Why not `to_json`: `StructsToJson` is CodegenFallback in Spark 4, so
  * the JSONL-sink projection of the UDM pipeline (every event
  * serialized on the hot path) both runs interpreted and ends the
  * fused whole-stage-codegen span. This serializer walks the struct
  * with a streaming Jackson generator (same escaping engine, so bytes
  * match), omits null fields like the reference's null-section dropping
  * (json2udm_cloud.py:267–291), and generates a real reference-object
  * call in `doGenCode` — no fallback, span stays fused.
  */
final class JsonStructSerializer(schema: StructType) extends Serializable {
  @transient private lazy val factory = new JsonFactory()
  // serialize() runs once per row on the sink hot path — reuse the
  // output buffer per thread instead of allocating per row (the
  // generator itself is cheap to create; Jackson pools its internals
  // via the factory's BufferRecycler)
  @transient private lazy val bufPool = new ThreadLocal[java.io.ByteArrayOutputStream] {
    override def initialValue(): java.io.ByteArrayOutputStream =
      new java.io.ByteArrayOutputStream(512)
  }

  def serialize(row: InternalRow): UTF8String = {
    val baos = bufPool.get()
    baos.reset()
    val g = factory.createGenerator(baos, JsonEncoding.UTF8)
    writeStruct(g, row, schema)
    g.close()
    UTF8String.fromBytes(baos.toByteArray)
  }

  private def writeStruct(g: JsonGenerator, row: InternalRow, st: StructType): Unit = {
    g.writeStartObject()
    val fields = st.fields
    var i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) {
        g.writeFieldName(fields(i).name)
        writeValue(g, fields(i).dataType, row, i)
      }
      i += 1
    }
    g.writeEndObject()
  }

  private def writeValue(g: JsonGenerator, dt: DataType,
                         c: SpecializedGetters, ordinal: Int): Unit = dt match {
    case StringType => g.writeString(c.getUTF8String(ordinal).toString)
    case IntegerType => g.writeNumber(c.getInt(ordinal))
    case LongType => g.writeNumber(c.getLong(ordinal))
    case DoubleType => g.writeNumber(c.getDouble(ordinal))
    case BooleanType => g.writeBoolean(c.getBoolean(ordinal))
    case st: StructType => writeStruct(g, c.getStruct(ordinal, st.length), st)
    case ArrayType(et, _) =>
      val arr = c.getArray(ordinal)
      g.writeStartArray()
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        // ignoreNullFields applies to struct FIELDS; null array elements
        // are emitted as JSON null, matching StructsToJson
        if (arr.isNullAt(j)) g.writeNull() else writeValue(g, et, arr, j)
        j += 1
      }
      g.writeEndArray()
    case other =>
      throw new IllegalStateException(s"graft_to_json: unsupported type $other")
  }
}

object JsonStructSerializer {
  def supported(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | DoubleType | BooleanType => true
    case st: StructType => st.fields.forall(f => supported(f.dataType))
    case ArrayType(et, _) => supported(et)
    case _ => false
  }
}

case class StructToJsonExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if JsonStructSerializer.supported(st) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_to_json expects a struct of string/int/bigint/double/boolean/struct/array, got $other")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_to_json"

  @transient private lazy val serializer =
    new JsonStructSerializer(child.dataType.asInstanceOf[StructType])

  override def nullSafeEval(row: Any): Any =
    serializer.serialize(row.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ser = ctx.addReferenceObj("graftJsonSer", serializer,
      classOf[JsonStructSerializer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ser.serialize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StructToJsonExpr =
    copy(child = newChild)
}

object StructToJsonExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(struct: Column): Column =
    ColumnBridge.column(StructToJsonExpr(ColumnBridge.expression(struct)))
}
