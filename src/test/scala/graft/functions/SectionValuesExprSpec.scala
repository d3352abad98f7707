package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The codegen'd section extractor must agree with the higher-order
  * formulation it replaced, in both eval modes. */
class SectionValuesExprSpec extends SparkSpec {
  import spark.implicits._

  private val mapSchema = MapType(StringType, StructType(Seq(
    StructField("dns.qry.name", StringType), StructField("dns.qry.type", StringType))))

  private def parse(j: String) = from_json(lit(j), mapSchema)

  private def hof(section: org.apache.spark.sql.Column, field: String) = {
    val vals = filter(transform(map_values(section), v => v.getField(field)),
      v => v.isNotNull)
    when(section.isNotNull && size(vals) > 0, vals)
  }

  test("matches the higher-order formulation on all shapes") {
    val cases = Seq(
      """{"a: type A": {"dns.qry.name": "a.com", "dns.qry.type": "1"},
         |"b: type A": {"dns.qry.name": "b.com", "dns.qry.type": "28"}}""".stripMargin,
      """{"x": {"dns.qry.type": "1"}}""", // field absent in all values → null
      """{}""",                            // empty map → null
      """null""")                          // null map → null
    for (j <- cases) {
      val row = spark.range(1).select(
        SectionValuesExpr(parse(j), "dns.qry.name").as("fast"),
        hof(parse(j), "dns.qry.name").as("ref")).head()
      assert(row.isNullAt(0) == row.isNullAt(1), s"null mismatch for $j")
      if (!row.isNullAt(0))
        assert(row.getSeq[String](0) == row.getSeq[String](1), s"value mismatch for $j")
    }
  }

  test("works in both codegen and interpreted evaluation") {
    // repartition defeats ConvertToLocalRelation/ConstantFolding so the
    // expression actually executes on executors in the requested mode
    val df = Seq(
      """{"q1": {"dns.qry.name": "one.com", "dns.qry.type": "1"}}""",
      """{"q2": {"dns.qry.type": "1"}}""").toDF("j")
      .repartition(2)
      .select(col("j"),
        SectionValuesExpr(from_json(col("j"), mapSchema), "dns.qry.name").as("v"))
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = df.orderBy("j").collect()
        assert(got(0).getSeq[String](1) == Seq("one.com"), s"mode=$mode")
        assert(got(1).isNullAt(1), s"mode=$mode")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("rejects wrong input types at analysis") {
    val e = intercept[Exception] {
      spark.range(1).select(SectionValuesExpr(lit("not a map"), "f")).collect()
    }
    assert(e.getMessage.contains("section_values") || e.getMessage.contains("DATATYPE"))
  }
}
