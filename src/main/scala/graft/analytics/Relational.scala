package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics layer over UDM-shaped events and dimension
  * tables — the "analytics on processed events" capability the
  * reference delegates to Chronicle SecOps (reference readme.md:66,
  * docs/Report.tex:635), built Spark-first per SURVEY.md §7.7.
  *
  * Scale notes (100 TB design point):
  *  - dimension joins take `broadcast()` hints — region/nation/supplier
  *    class dims are KBs–MBs even at SF100k, so the fact side never
  *    shuffles for enrichment;
  *  - fact–fact joins (orders⋈lineitem) shuffle on the join key; AQE
  *    handles skew at runtime (enabled in session conf);
  *  - top-k never global-sorts: aggregate → `orderBy.limit` runs
  *    TakeOrderedAndProject (per-partition heap + driver merge of k);
  *  - per-group top-k uses a window rank, shuffling once on the
  *    partition key with no global sort.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: the canonical partial-agg check —
    * map-side combine reduces each partition to ≤ |flag×status| rows
    * before the 32-partition shuffle. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: fact⋈fact⋈dim, aggregated revenue, top 10 without
    * a global sort. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style local-supplier revenue: snowflake of broadcast dims
    * around the orders⋈lineitem fact join. */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                          regionName: String): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Revenue per nation per order-year — broadcast star enrichment of a
    * fact aggregate. */
  def revenueByNationYear(nation: DataFrame, customer: DataFrame, orders: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name", "order_year")

  /** Global top-k (TakeOrderedAndProject — no full sort at any scale). */
  def topCustomersByRevenue(orders: DataFrame, k: Int): DataFrame =
    orders.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue"), asc("o_custkey"))
      .limit(k)

  /** Per-group top-k via ranking window — one shuffle on the group key. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= k)
      .orderBy("o_custkey", "rk")
  }

  /** ROLLUP aggregation (grouping-set hierarchy in one pass). */
  def lineitemRollup(lineitem: DataFrame): DataFrame =
    lineitem.rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")

  /** Distinct aggregation (expands to two-phase agg under the hood). */
  def distinctSuppliersPerFlag(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").as("n_suppliers"),
        countDistinct("l_partkey").as("n_parts"))
      .orderBy("l_returnflag")

  /** Semi join: customers with ≥1 qualifying order (no fact columns
    * materialized — Spark plans LeftSemi). */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** F4 — anti join: the reference's processed-set exclusion
    * (sniffer_entrypoint.sh:174–177) generalized: members with no
    * matching fact row. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Set operations: customers ordering in both order-status classes. */
  def intersectCustomers(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(orders.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")

  /** PIVOT / crosstab — per-user event-type count matrix via Spark's
    * `.pivot()` with an EXPLICIT value list (the open-ended form runs
    * a distinct-values job first and can explode the schema on dirty
    * data — at 100 TB always pin the columns). Plans as one combinable
    * groupBy with conditional-count partials — no join, no second
    * scan; absent combinations are 0, not null (count semantics).
    * Output: (user_id, one BIGINT column per pinned type), ordered. */
  def userEventMatrix(events: DataFrame, types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.distinct.size == types.size,
      s"need a non-empty, duplicate-free type list: $types")
    events.groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        types.map(t => coalesce(col(s"`$t`"), lit(0L)).cast("long").as(t)): _*)
      .orderBy("user_id")
  }
}
