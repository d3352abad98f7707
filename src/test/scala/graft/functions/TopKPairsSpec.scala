package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom top-k aggregate must (a) produce exactly the window-rank
  * result, (b) partial-aggregate before the shuffle (its reason to
  * exist), (c) survive serialize/merge across partitions. */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  test("heap aggregate matches window row_number semantics incl. ties") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0), (2L, 21L, 3.0), (2L, 22L, 3.0), (2L, 23L, 3.0),
      (3L, 30L, 7.0))
      .toDF("grp", "id", "score")
      .repartition(4) // force multi-partition partial+merge path
    val heap = rows.groupBy("grp")
      .agg(expr("graft_topk(score, id, 3)").as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id"), col("col.score"), (col("pos") + 1).as("rk"))
      .orderBy("grp", "rk").collect()
    val win = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("grp").orderBy(desc("score"), asc("id"))
      rows.select(col("grp"), col("id"), col("score"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3).orderBy("grp", "rk").collect()
    }
    assert(heap.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      win.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("partial aggregation happens before the shuffle") {
    GraftFunctions.register(spark)
    val df = spark.range(1000).select(
      (col("id") % 7).as("grp"), col("id"), rand(42).as("score"))
    val agg = df.groupBy("grp").agg(expr("graft_topk(score, id, 5)"))
    val plan = agg.queryExecution.executedPlan.toString
    // ObjectHashAggregate with partial_graft_topk below the exchange
    assert(plan.contains("partial_graft_topk"))
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("buffer serialize/deserialize roundtrip") {
    val b = new TopKTagBuffer(2)
    b.add(1.0, 1L, null); b.add(5.0, 2L, null); b.add(3.0, 3L, null)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKPairs(Literal(0.0), Literal(0L), Literal(2))
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.sorted.map(t => (t._1, t._2)) == Seq((5.0, 2L), (3.0, 3L)))
  }

  test("tagged buffer roundtrips string tags longer than 65535 UTF-8 bytes") {
    // writeUTF would throw UTFDataFormatException here (modified-UTF-8
    // 64 KiB cap) — the length-prefixed raw encoding must not
    val longTag = "x" * 100000 + "€" // multi-byte char past the cap
    val b = new TopKTagBuffer(2)
    b.add(5.0, 1L, longTag); b.add(3.0, 2L, "short")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKTagged(Literal(0.0), Literal(0L), Literal(""), Literal(2))
    val rt = agg.deserialize(agg.serialize(b))
    assert(rt.sorted.map(t => (t._1, t._2, t._3)) ==
      Seq((5.0, 1L, longTag), (3.0, 2L, "short")))
  }

  test("ordering is total under NaN and merges the two zeros") {
    val b = new TopKTagBuffer(4)
    b.add(Double.NaN, 1L, null); b.add(-0.0, 2L, null)
    b.add(0.0, 3L, null); b.add(1.0, 4L, null)
    // Spark SQL double order: NaN greatest; -0.0 == 0.0 (id tiebreak)
    assert(b.sorted.map(_._2) == Seq(1L, 4L, 2L, 3L))
  }
}
