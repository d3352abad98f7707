package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout scale proof (SCALE.md): bucketing both sides of a
  * fact⋈fact join on the join key makes the join shuffle-free — the
  * physical plan must contain no Exchange. At 100 TB this is the
  * difference between re-shuffling the fact tables on every join and
  * paying the layout cost once at write time. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // disable broadcast so the join must co-locate (the 100 TB case)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_extendedprice")).as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(joinSection.contains("SortMergeJoin"))
      // no shuffle between the scans and the join: bucketing co-locates
      assert(!joinSection.contains("Exchange hashpartitioning"))
      // and it computes the right thing (tolerance: the two plans sum
      // doubles in different orders)
      val direct = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_extendedprice")).as("rev"))
        .orderBy("o_orderpriority").collect()
      val bucketed = joined.orderBy("o_orderpriority").collect()
      assert(direct.map(_.getString(0)).toSeq == bucketed.map(_.getString(0)).toSeq)
      direct.zip(bucketed).foreach { case (a, b) =>
        assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-4)
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
