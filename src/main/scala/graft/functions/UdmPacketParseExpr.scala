package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Jackson parse of one tshark packet JSON string into
  * [[graft.udm.PacketSchemas.parsedPacketSchema]] — SURVEY.md §4
  * escape-hatch tier (b), the `doGenCode` expression SCALE.md names for
  * the UDM hot path.
  *
  * Why not `from_json`: `JsonToStructs` is CodegenFallback in Spark 4,
  * so the parse projection is excluded from whole-stage codegen and the
  * pipeline pays a fused-stage break plus an extra raw-capture +
  * second `from_json` round trip for the object-or-array `tls.record`
  * (reference json2udm_cloud.py:229–236). This expression
  *  - parses with a streaming Jackson reader straight into Catalyst
  *    rows (no intermediate tree, unknown subtrees skipped),
  *  - normalizes `tls.record` to `array<record>` IN the parse (P10),
  *  - generates a real static call in `doGenCode`, so the surrounding
  *    projection stays inside whole-stage codegen.
  *
  * Semantics match `from_json` PERMISSIVE where the pipeline can
  * observe them (spec-enforced, see UdmPacketParseSpec): malformed
  * input / non-object root → null; a field whose JSON type mismatches
  * the schema → null field; scalar leaves accept any JSON scalar as
  * its text; a string-typed field holding an object/array captures the
  * raw subtree text; duplicate keys: last wins.
  */
object UdmPacketJackson {
  private val factory = new JsonFactory()

  // ordinal lookup per struct of the FIXED schema. ConcurrentHashMap:
  // executor task threads race on first use, and an unsynchronized
  // read of a plain HashMap under concurrent put could observe a
  // partially-published table and silently miss present keys (fields
  // would fall into the skip branch → null layers, no error).
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[StructType, java.util.HashMap[String, Integer]]()

  private val buildIndex =
    new java.util.function.Function[StructType, java.util.HashMap[String, Integer]] {
      override def apply(st: StructType): java.util.HashMap[String, Integer] = {
        val m = new java.util.HashMap[String, Integer](st.length * 2)
        st.fields.zipWithIndex.foreach { case (f, i) => m.put(f.name, Integer.valueOf(i)) }
        m
      }
    }

  private def indexFor(st: StructType): java.util.HashMap[String, Integer] =
    indexCache.computeIfAbsent(st, buildIndex)

  def parse(raw: UTF8String): InternalRow = {
    if (raw == null) return null
    val parser = factory.createParser(raw.getBytes)
    try {
      if (parser.nextToken() != JsonToken.START_OBJECT) null
      else convertStruct(parser, graft.udm.PacketSchemas.parsedPacketSchema)
    } catch {
      // malformed input → null (the Malformed branch). IOException
      // covers Jackson's JsonProcessingException; anything else (e.g.
      // the IllegalStateException schema guard) is a BUG and must
      // propagate, not be misclassified as malformed data.
      case _: java.io.IOException => null
    } finally parser.close()
  }

  /** current token must be START_OBJECT */
  private def convertStruct(p: JsonParser, st: StructType): InternalRow = {
    val row = new GenericInternalRow(st.length)
    val idx = indexFor(st)
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      p.nextToken()
      val ord = idx.get(name)
      if (ord != null) row.update(ord.intValue(), convertValue(p, st.fields(ord.intValue()).dataType))
      else p.skipChildren() // no-op for scalars, skips object/array subtrees
    }
    row
  }

  private def convertValue(p: JsonParser, dt: DataType): Any = dt match {
    case StringType => p.currentToken() match {
      case JsonToken.VALUE_NULL => null
      case JsonToken.VALUE_STRING => UTF8String.fromString(p.getText)
      case JsonToken.START_OBJECT | JsonToken.START_ARRAY => captureRaw(p)
      case _ => UTF8String.fromString(p.getText) // number/bool as text
    }
    case st: StructType => p.currentToken() match {
      case JsonToken.START_OBJECT => convertStruct(p, st)
      case JsonToken.VALUE_NULL => null
      case _ => p.skipChildren(); null
    }
    case MapType(StringType, vt: StructType, _) => p.currentToken() match {
      case JsonToken.START_OBJECT =>
        val keys = new java.util.ArrayList[AnyRef]()
        val vals = new java.util.ArrayList[AnyRef]()
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val k = p.currentName()
          p.nextToken()
          keys.add(UTF8String.fromString(k))
          vals.add(convertValue(p, vt).asInstanceOf[AnyRef])
        }
        ArrayBasedMapData(keys.toArray, vals.toArray)
      case JsonToken.VALUE_NULL => null
      case _ => p.skipChildren(); null
    }
    // the object-or-array normalization (P10): one record object becomes
    // a 1-element array
    case ArrayType(et: StructType, _) => p.currentToken() match {
      case JsonToken.START_ARRAY =>
        val buf = new java.util.ArrayList[AnyRef]()
        while (p.nextToken() != JsonToken.END_ARRAY) {
          buf.add(convertValue(p, et).asInstanceOf[AnyRef])
        }
        new GenericArrayData(buf.toArray)
      case JsonToken.START_OBJECT =>
        new GenericArrayData(Array[Any](convertStruct(p, et)))
      case JsonToken.VALUE_NULL => null
      case _ => p.skipChildren(); null
    }
    case other =>
      throw new IllegalStateException(s"udm_packet_parse: unsupported type $other")
  }

  /** Capture the current object/array subtree as compact JSON text
    * (the `from_json` raw-string-capture behavior for string-typed
    * fields holding structured values). */
  private def captureRaw(p: JsonParser): UTF8String = {
    val sw = new java.io.StringWriter()
    val g = factory.createGenerator(sw)
    try g.copyCurrentStructure(p) finally g.close()
    UTF8String.fromString(sw.toString)
  }
}

case class UdmPacketParseExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"udm_packet_parse expects a STRING packet JSON column, got $other")
  }

  override def dataType: DataType = graft.udm.PacketSchemas.parsedPacketSchema
  override def nullable: Boolean = true
  override def prettyName: String = "udm_packet_parse"

  override def nullSafeEval(raw: Any): Any =
    UdmPacketJackson.parse(raw.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.UdmPacketJackson.parse(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): UdmPacketParseExpr =
    copy(child = newChild)
}

object UdmPacketParseExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(raw: Column): Column =
    ColumnBridge.column(UdmPacketParseExpr(ColumnBridge.expression(raw)))
}
