package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `relational` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryRelational {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary",
      (s, d) => Relational.pricingSummary(t(s, d, "lineitem")),
      Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(avg(l_quantity), 2) AS avg_qty,
        round(avg(l_discount), 4) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""), bench = true),

    QueryDef("q3_shipping_priority",
      (s, d) => Relational.shippingPriority(t(s, d, "customer"), t(s, d, "orders"), t(s, d, "lineitem")),
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""), bench = true),

    QueryDef("q5_local_supplier",
      (s, d) => Relational.localSupplierVolume(t(s, d, "region"), t(s, d, "nation"),
        t(s, d, "customer"), t(s, d, "supplier"), t(s, d, "orders"), t(s, d, "lineitem"), "EUROPE"),
      Some("""SELECT n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""), bench = true),

    QueryDef("join_nation_year_revenue",
      (s, d) => Relational.revenueByNationYear(t(s, d, "nation"), t(s, d, "customer"), t(s, d, "orders")),
      Some("""SELECT n_name, year(o_orderdate) AS order_year,
        round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate) ORDER BY n_name, order_year""")),

    QueryDef("topk_customers",
      (s, d) => Relational.topCustomersByRevenue(t(s, d, "orders"), 10),
      Some("""SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue,
        count(*) AS n_orders FROM orders GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey LIMIT 10""")),

    QueryDef("window_top_orders_per_customer",
      (s, d) => Relational.topOrdersPerCustomer(t(s, d, "orders"), 3),
      Some("""SELECT o_custkey, o_orderkey, totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
        WHERE rk <= 3 ORDER BY o_custkey, rk"""), bench = true),

    QueryDef("topk_heap_per_customer",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        t(s, d, "orders").groupBy("o_custkey")
          .agg(expr("graft_topk(o_totalprice, o_orderkey, 3)").as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(col("o_custkey"), col("col.id").as("o_orderkey"),
            round(col("col.score"), 2).as("totalprice"),
            (col("pos") + 1).cast("long").as("rk"))
          .orderBy("o_custkey", "rk")
      },
      // identical semantics to the window formulation — same oracle
      Some("""SELECT o_custkey, o_orderkey, totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
        WHERE rk <= 3 ORDER BY o_custkey, rk"""), bench = true),

    QueryDef("rollup_lineitem",
      (s, d) => Relational.lineitemRollup(t(s, d, "lineitem")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        coalesce(l_linestatus, 'ALL') AS linestatus,
        round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    QueryDef("cube_orders",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    QueryDef("window_moving_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // DATE bucket on both sides: DuckDB date_trunc('day') returns
        // DATE while Spark's returns TIMESTAMP — to_date/CAST(AS DATE)
        // pins one output type across engines and testdata vintages
        // (o_orderdate has shipped as both DATE and TIMESTAMP_NTZ)
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum("o_totalprice").as("rev"))
        val w = Window.orderBy("day").rowsBetween(-6, 0)
        daily.select(col("day"), round(col("rev"), 2).as("revenue"),
            round(avg("rev").over(w), 2).as("ma7"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          sum(o_totalprice) AS rev FROM orders GROUP BY 1)
        SELECT day, round(rev, 2) AS revenue,
          round(avg(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
        FROM daily ORDER BY day""")),

    // fuzzy join with prefix-token blocking: candidates must share their
    // first name token (an equi-join key — never a CartesianProduct), so
    // the pair space is divided by the blocking-key cardinality and each
    // block shuffles independently. The oracle applies the same block.
    QueryDef("fuzzy_levenshtein_parts",
      (s, d) => {
        val p = t(s, d, "part").filter(col("p_partkey") % 50 === 0)
          .select(split(col("p_name"), " ").getItem(0).as("blk"),
            col("p_partkey"), col("p_name"))
        val a = p.select(col("blk"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
        val b = p.select(col("blk"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
        a.join(b, Seq("blk")).filter(col("key_a") < col("key_b"))
          .select(col("key_a"), col("key_b"),
            levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
          .filter(col("dist") <= 10)
          .orderBy("key_a", "key_b")
      },
      Some("""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        levenshtein(a.p_name, b.p_name) AS dist
        FROM (SELECT * FROM part WHERE p_partkey % 50 = 0) a
        JOIN (SELECT * FROM part WHERE p_partkey % 50 = 0) b
          ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 10
        ORDER BY key_a, key_b""")),

    QueryDef("distinct_agg_per_flag",
      (s, d) => Relational.distinctSuppliersPerFlag(t(s, d, "lineitem")),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
        count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("semi_join_big_orders",
      (s, d) => Relational.customersWithBigOrders(t(s, d, "customer"), t(s, d, "orders"), 400000),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey""")),

    QueryDef("anti_join_processed_set",
      (s, d) => Relational.customersWithoutOrders(t(s, d, "customer"), t(s, d, "orders")),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    QueryDef("setop_intersect_customers",
      (s, d) => Relational.intersectCustomers(t(s, d, "orders")),
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey""")),

    // Bloom-prefiltered big–big join: the sketch drops ~90% of lineitem
    // BEFORE its exchange; result provably ≡ the plain join (no false
    // negatives + the real join removes false positives) — which is
    // exactly what the oracle asserts. expectedItems = one count job
    // over the already-filtered build side (cheap, and the honest
    // sizing — a guessed constant under-sizes at bigger SFs).
    QueryDef("join_bloom_prefilter",
      (s, d) => {
        val dim = t(s, d, "orders")
          .filter(col("o_totalprice") > 450000.0)
          .withColumnRenamed("o_orderkey", "l_orderkey")
        // expectedItems derived inside from the single materialized
        // build-side count (ADVICE r9 — was a fourth build execution)
        val joined = graft.util.SparkUtil.bloomPrefilterJoin(
          t(s, d, "lineitem"), dim, "l_orderkey")
        joined.groupBy("o_orderpriority")
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o.o_orderpriority, count(*)::BIGINT AS n,
          round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 450000.0
        GROUP BY 1 ORDER BY o_orderpriority"""),
      bench = true))
}
