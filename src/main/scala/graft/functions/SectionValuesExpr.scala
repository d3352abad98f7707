package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** P8 as a native Catalyst expression WITH code generation —
  * SURVEY.md §4 escape-hatch tier (b), replacing the interpreted
  * `filter(transform(map_values(section), …))` higher-order chain.
  *
  * Extracts field `field` from every value of a dynamic-key tshark
  * section map (reference json2udm_cloud.py:74–88), dropping nulls;
  * null when nothing found. Higher-order functions are CodegenFallback
  * in Spark 4 (interpreted, per-element InternalRow boxing); this
  * expression emits a tight generated loop instead, and unlike a Scala
  * UDF it is null-aware, serialization-free, and visible to Catalyst.
  */
case class SectionValuesExpr(child: Expression, field: String)
  extends UnaryExpression {

  private lazy val valueStruct: StructType =
    child.dataType.asInstanceOf[MapType].valueType.asInstanceOf[StructType]
  private lazy val ordinal: Int = valueStruct.fieldIndex(field)
  private lazy val numFields: Int = valueStruct.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, s: StructType, _)
      if s.fieldNames.contains(field) && s(field).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"section_values expects map<string,struct<... $field: string ...>>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "section_values"

  override def nullSafeEval(map: Any): Any = {
    val values = map.asInstanceOf[MapData].valueArray()
    val n = values.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!values.isNullAt(i)) {
        val row = values.getStruct(i, numFields)
        if (!row.isNullAt(ordinal)) out.add(row.getUTF8String(ordinal))
      }
      i += 1
    }
    if (out.isEmpty) null else new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val values = ctx.freshName("values")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val buf = ctx.freshName("buf")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $values = $c.valueArray();
         |int $n = $values.numElements();
         |java.util.ArrayList<org.apache.spark.unsafe.types.UTF8String> $buf =
         |  new java.util.ArrayList<org.apache.spark.unsafe.types.UTF8String>($n);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$values.isNullAt($i)) {
         |    InternalRow $row = $values.getStruct($i, $numFields);
         |    if (!$row.isNullAt($ordinal)) { $buf.add($row.getUTF8String($ordinal)); }
         |  }
         |}
         |if ($buf.isEmpty()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buf.toArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SectionValuesExpr =
    copy(child = newChild)
}

object SectionValuesExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column wrapper (classic API). */
  def apply(section: Column, field: String): Column =
    ColumnBridge.column(SectionValuesExpr(ColumnBridge.expression(section), field))
}
