package graft.functions

import graft.SparkSpec
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.functions._

/** Byte-equivalence of the native codegen'd serializer with Spark's
  * `to_json(..., ignoreNullFields=true)` — the contract that lets the
  * pipeline swap serializers without changing a single output byte. */
class StructToJsonSpec extends SparkSpec {
  import spark.implicits._

  private def assertIdentical(df: org.apache.spark.sql.DataFrame, structCol: String): Unit = {
    val rows = df.select(
      to_json(col(structCol), Map("ignoreNullFields" -> "true")).as("legacy"),
      StructToJsonExpr(col(structCol)).as("native")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"legacy=${r.getString(0)}\nnative=${r.getString(1)}")
    }
  }

  test("identical on full UDM events across all packet shapes") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-03-05 01:02:03.123456"), 7L, "click"),
      (2L, t("2024-03-05 02:02:03.5"), 8L, "view"),
      (3L, t("2024-03-05 03:02:03.0"), 9L, "purchase"),
      (4L, t("2024-03-05 04:02:03.75"), 10L, "signup"),
      (5L, t("2024-03-05 05:02:03.0"), 11L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val udm = UdmTransform.transform(SynthPackets.fromEvents(ev), "raw", lit("2024-01-01T00:00:00.000000Z"))
    assertIdentical(udm, "event_struct")
  }

  test("identical on malformed input (Malformed event shape)") {
    val df = Seq("not json at all", """{"_source": 42}""").toDF("raw")
    val udm = UdmTransform.transform(df, "raw", lit("2024-01-01T00:00:00.000000Z"))
    assertIdentical(udm, "event_struct")
  }

  test("identical on tricky scalars: escapes, unicode, null array elements, numbers") {
    val df = spark.range(1).select(struct(
      lit("""quote " backslash \ newline
tab	done""").as("esc"),
      lit("héllo — ünïcode ☃").as("uni"),
      array(lit(1), lit(null).cast("int"), lit(3)).as("ints"),
      array(struct(lit("x").as("a")), lit(null).cast("struct<a:string>")).as("objs"),
      lit(null).cast("string").as("gone"),
      struct(lit(null).cast("string").as("inner")).as("emptyish"),
      lit(3.5d).as("dbl"),
      lit(true).as("flag"),
      lit(42L).as("big")).as("s"))
    assertIdentical(df, "s")
  }
}
