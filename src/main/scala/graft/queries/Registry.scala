package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared query per implemented operator (SURVEY.md §2 inventory +
  * the LLM-pipeline north-star operators), each with equivalent ANSI SQL
  * the driver runs in DuckDB over the same parquet tables.
  *
  * Oracle-matching rules (learned the hard way, keep in sync):
  *  - integer outputs are BIGINT on both sides (Spark `size`/`year`/
  *    `row_number` are cast to long; DuckDB `sum(int)` is cast from
  *    HUGEINT to BIGINT);
  *  - float aggregates are `round`ed (2–6 dp) — FP summation order is
  *    nondeterministic in both engines;
  *  - every query ORDER BYs its full output for stable row order;
  *  - hashes are md5 (identical hex in both engines), never xxhash.
  */
final case class QueryDef(
  name: String,
  build: (SparkSession, String) => DataFrame,
  oracle: Option[String],
  bench: Boolean = false)

object Registry {

  /** Table loader. The driver's `events.ts` annotation has varied across
    * testdata generations — TIMESTAMP(NANOS) (Spark 4 refuses by default;
    * read nanos as long via the legacy conf and rebuild a µs timestamp,
    * `div 1000` truncation matching DuckDB's ns→µs cast) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark reads TIMESTAMP_NTZ;
    * reinterpret as UTC instant — session timeZone is pinned to UTC, and
    * DuckDB's `CAST(ts AS TIMESTAMP)` is the same naive-µs no-op). Branch
    * on the schema actually read so both generations load identically. */
  def table(s: SparkSession, dir: String, n: String): DataFrame = t(s, dir, n)

  private def t(s: SparkSession, dir: String, n: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$n.parquet")
    if (n == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df // already a zoned timestamp
      }
    } else df
  }

  /** Per-JVM memoized IVF-PQ index dir for `sim_ivfpq_search` — train
    * once, search many. Keyed by sf dir; a fresh temp dir per JVM means
    * a regenerated testdata set can never collide with a stale index
    * (the cross-process staleness a fixed path would invite). */
  private val ivfPqDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfPqIndexDir(s: SparkSession, d: String): String =
    ivfPqDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
      Similarity.writeIvfPq(t(s, d, "embeddings"), dir,
        nCells = 8, m = 16, ksub = 32, rounds = 3)
      dir
    })

  /** Per-JVM memoized k-means centroid dir for
    * `corpus_cluster_sample_only` — train once, sample many (the
    * `sim_ivfpq_search` pattern: under min-of-N, round 1 pays Lloyd's
    * iterations, later rounds measure the pure sampling plan). Same
    * (k=8, rounds=3) as the train+sample row. */
  private val kmeansDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def kmeansCentroidDir(s: SparkSession, d: String): String =
    kmeansDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_kmeans_cents").toString
      Similarity.writeKmeansCentroids(t(s, d, "embeddings"), dir,
        k = 8, rounds = 3)
      dir
    })

  /** Clustering-independent invariant panel shared by
    * `corpus_cluster_sample` (train+sample) and
    * `corpus_cluster_sample_only` (read-back centroids): per-cell quota
    * exactness, full coverage, winner distinctness — true for ANY
    * centroid set, which is what makes the surface oracle-able. */
  private def clusterSampleSurface(s: SparkSession, emb: DataFrame,
                                   smp: DataFrame): DataFrame = {
    val perCell = smp.groupBy("cell")
      .agg(count(lit(1)).as("n_smp"), first(col("n_cell")).as("nc"))
    val pc = perCell.agg(
      sum(when(col("n_smp") === least(col("nc"), lit(25L)), 0L)
        .otherwise(1L)).as("bad"),
      sum(col("nc")).as("covered")).head()
    val n = smp.count()
    val dn = smp.select("vec_id").distinct().count()
    // null embeddings are excluded by the sampler's contract — the
    // coverage invariant counts the sampleable corpus, not raw rows
    val nCorpus = emb.filter(col("embedding").isNotNull).count()
    import s.implicits._
    Seq((nCorpus, pc.getLong(0) == 0L, pc.getLong(1) == nCorpus, dn == n))
      .toDF("n_corpus", "quota_ok", "coverage_ok", "distinct_ok")
  }

  /** The IVF-PQ selection-quality surface shared by `sim_ivfpq_topk`
    * (train+search) and `sim_ivfpq_search` (read-back index): ADC
    * top-10 at nProbe=4 vs brute-force exact — raw recall@10 on
    * unstructured random embeddings is too unstable to oracle
    * (measured 1–7 hits across SFs), so the oracled invariant is that
    * the mean TRUE cosine of the ADC-selected 10 sits within 0.15 of
    * the exact top-10's mean and clears 0.15 absolutely (random-pick
    * baseline ~0.0 ± 0.04; measured gap ≤ 0.078, floor ≥ 0.234). */
  private def ivfPqSelectionSurface(s: SparkSession, emb: DataFrame,
                                    cc: DataFrame, cb: DataFrame,
                                    codes: DataFrame): DataFrame = {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val sel = Similarity.ivfPqTopK(emb, cc, cb, codes, qids, 10, nProbe = 4)
      .select(col("query_id"), col("vec_id"))
    val exact = Similarity.bruteForceTopK(emb, qids, 10)
      .select(col("query_id"), col("vec_id"))
    val corpus = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val qv = corpus.filter(col("vec_id").isInCollection(qids))
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    def meanTrueCos(picks: DataFrame, out: String): DataFrame =
      picks.join(corpus, "vec_id").join(broadcast(qv), "query_id")
        .select(col("query_id"),
          (aggregate(zip_with(col("vec"), col("qvec"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) /
            (sqrt(aggregate(transform(col("vec"), x => x * x),
              lit(0.0), (acc, x) => acc + x)) *
             sqrt(aggregate(transform(col("qvec"), x => x * x),
               lit(0.0), (acc, x) => acc + x)))).as("cos"))
        .groupBy("query_id").agg(avg("cos").as(out))
    import s.implicits._
    emb.filter(col("vec_id").isInCollection(qids) && col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"))
      .join(meanTrueCos(sel, "sel_cos"), Seq("query_id"), "left")
      .join(meanTrueCos(exact, "exact_cos"), Seq("query_id"), "left")
      .select(col("query_id"), lit(10L).as("k"),
        (coalesce(col("sel_cos"), lit(-1.0)) >=
          coalesce(col("exact_cos"), lit(1.0)) - 0.15 &&
         coalesce(col("sel_cos"), lit(-1.0)) >= 0.15).as("sel_ok"))
      .orderBy("query_id")
  }

  private val ivfPqSelectionOracle: String =
    """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
      TRUE AS sel_ok FROM embeddings
      WHERE vec_id < 5 AND embedding IS NOT NULL
      ORDER BY query_id"""

  // deterministic heuristic inputs (mirrored literally in oracle SQL)
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("batch", "stream"), "en" -> Seq("the", "a"),
    "es" -> Seq("data", "value"), "fr" -> Seq("merge", "join"),
    "zh" -> Seq("spark", "vector"))
  val stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Pinned sentiment-ish lexicon for `txt_lexicon_score` — injected
    * verbatim into BOTH the Spark call and the oracle VALUES list. */
  val scoringLexicon: Seq[(String, Int)] = Seq(
    "fast" -> 3, "slow" -> -3, "merge" -> 2, "join" -> 1,
    "query" -> 2, "error" -> -2, "spill" -> -2, "broken" -> -3)

  /** Candidate vocab sizes for `txt_oov_curve` — one Scala value feeds
    * the Spark call and the oracle unnest list. */
  val oovVocabSizes: Seq[Long] = Seq(16L, 64L, 256L, 1024L, 4096L)

  /** Pinned BPE merge table for `txt_bpe_apply` — rank = position.
    * Hand-laid over the synthetic vocabulary to exercise multi-round
    * full-word merges (join/scan/sort/data/the), merged-symbol rules
    * ((at,a), (s,ort)), rank-priority conflicts (order: (e,r) rank 1
    * beats (o,r) rank 2) and partial fixpoints (query → q u ery).
    * Shared verbatim by the Spark expression and the generated oracle
    * CASE chain — zero literal drift. */
  val bpeMerges: Seq[(String, String)] = Seq(
    "a" -> "t", "e" -> "r", "o" -> "r", "t" -> "h", "th" -> "e",
    "j" -> "o", "jo" -> "i", "joi" -> "n", "s" -> "c", "sc" -> "a",
    "sca" -> "n", "or" -> "t", "s" -> "ort", "er" -> "y",
    "at" -> "a", "d" -> "ata")

  /** HTML scaffold for `corpus_extract_html` — documents.text is plain
    * prose, so the fixture forges markup damage in-plan, identically in
    * both engines (the corpus_fix_encoding pattern). Deliberately
    * quote-free so the literals embed in SQL unescaped; exercises every
    * [[graft.analytics.Cleaning.htmlBlockPatterns]] pass and every
    * [[graft.analytics.Cleaning.htmlEntities]] entry. */
  private def htmlFixturePre: String =
    "<html><head><script>var x = 1;</script><style>p { color: red }" +
      "</style></head><body><!-- nav --><h1>Title &amp; Summary</h1><p>"
  private def htmlFixtureSuf: String =
    "</p><br><div>footer &lt;eof&gt; &#39;q&#39;&nbsp;&quot;z&quot;" +
      "</div></body></html>"

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Sentence-terminator forge shared by `corpus_chunk_sentences` and
    * `txt_readability` — the corpus has no natural punctuation, so a
    * deterministic terminator ('.', '!', '?' or nothing, chosen by
    * (i·31 + doc_id) mod 9) is appended per token, with the IDENTICAL
    * integer arithmetic in the Spark plan and the oracle CTE. */
  private def forgeSentences(df: DataFrame): DataFrame =
    df.withColumn("text",
      when(col("text").isNotNull, concat_ws(" ",
        transform(TextAnalysis.tokens(col("text")), (tk, i) =>
          concat(tk, element_at(
            array(lit("."), lit("!"), lit("?"), lit(""), lit(""),
              lit(""), lit(""), lit(""), lit("")),
            (pmod(i.cast("long") * 31 + col("doc_id"), lit(9)) + 1)
              .cast("int")))))))

  /** The SFT-export record SQL shared by `corpus_sft_export` (verbatim,
    * + ORDER BY) and `corpus_sft_roundtrip` (as the CTE its JSON
    * re-parse reads) — both sides of every escape rule come from
    * [[CorpusOps.jsonEscapes]], zero literal drift. */
  private def sftExportSql: String = {
    def sqlLit(x: String): String = x match {
      case "\n" => "chr(10)"
      case "\r" => "chr(13)"
      case "\t" => "chr(9)"
      case other => "'" + other.replace("'", "''") + "'"
    }
    def esc(c: String): String = CorpusOps.jsonEscapes.foldLeft(c) {
      case (acc, (bad, good)) =>
        s"replace($acc, ${sqlLit(bad)}, ${sqlLit(good)})"
    }
    s"""WITH w AS (SELECT doc_id, source, $toksSql AS toks
        FROM documents WHERE text IS NOT NULL),
      f AS (SELECT doc_id, source,
        coalesce(array_to_string(toks[1:10], ' '), '') AS p,
        coalesce(array_to_string(toks[11:], ' '), '') AS r,
        least(len(toks), 10) AS np,
        greatest(len(toks) - 10, 0) AS nr FROM w)
      SELECT doc_id,
        '{"messages":[{"role":"system","content":"source: ' ||
          ${esc("source")} ||
          '"},{"role":"user","content":"Continue: ' || ${esc("p")} ||
          '"},{"role":"assistant","content":"' || ${esc("r")} ||
          '"}]}' AS record,
        np::BIGINT AS n_prompt_tokens, nr::BIGINT AS n_response_tokens
      FROM f"""
  }

  /** The oracle half of [[forgeSentences]]: a CTE named `b` yielding
    * (doc_id, text) with forged terminators. */
  private def forgedSentencesCte: String =
    s"""b AS (
        SELECT doc_id, CASE WHEN text IS NULL THEN NULL ELSE
          array_to_string(list_transform(range(1, len(toks)+1), i ->
            toks[i] || CASE ((i-1)*31 + doc_id) % 9
              WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?'
              ELSE '' END), ' ')
          END AS text
        FROM (SELECT doc_id, text, $toksSql AS toks FROM documents))"""

  // ---------------- relational (TPC-H-style analytics layer) ----------

  private val relational = Seq(
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

  // ---------------- metrics (A-series over events) --------------------

  private val metrics = Seq(
    QueryDef("a1_counts_by_type",
      (s, d) => Metrics.countsByType(t(s, d, "events")),
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    QueryDef("a2_error_share_daily",
      (s, d) => Metrics.errorShareDaily(t(s, d, "events")),
      Some("""SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        round(avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END), 4) AS error_share
        FROM events GROUP BY 1 ORDER BY day""")),

    QueryDef("a4_windowed_rates",
      (s, d) => Metrics.windowedRates(t(s, d, "events"), "hour"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
        count(*) AS n, round(count(*) / 3600.0, 6) AS rate_per_sec
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type NULLS FIRST"""), bench = true),

    QueryDef("a6_value_percentiles",
      (s, d) => Metrics.valuePercentiles(t(s, d, "events")),
      Some("""SELECT event_type,
        round(quantile_cont(value, 0.5), 4) AS p50,
        round(quantile_cont(value, 0.95), 4) AS p95,
        round(quantile_cont(value, 0.99), 4) AS p99,
        round(max(value), 2) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    QueryDef("a7_liveness_gaps",
      (s, d) => Metrics.maxGapPerUser(t(s, d, "events"), 3600),
      Some("""WITH g AS (SELECT user_id,
          epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
        FROM events)
        SELECT user_id, round(max(gap), 3) AS max_gap_secs,
        CAST(sum(CASE WHEN gap > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps_over
        FROM g GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    // A3 per-file processing latency — the reference's per-file
    // PROCESSING_DURATION_SECONDS metric (processor_app.py:174–176,
    // charted p95 in terraform/main.tf:528–548): a REAL AvailableNow
    // notifyPipeline drain over synthesized binary captures emits the
    // _latency table (publish→commit ms per source file), and the
    // tolerance-boolean oracle (the sketch pattern) pins every file
    // AND the p95 inside the reference's 600 s per-file budget —
    // wall-clock values are nondeterministic, the budget compliance
    // is not. File synthesis/drain is fixture-sized (8 × 50-packet
    // captures, one micro-batch).
    QueryDef("a3_file_latency",
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val base = Files.createTempDirectory("graft_a3")
        val (data, queue, out, ckpt) =
          (s"$base/data", s"$base/q", s"$base/out", s"$base/ckpt")
        Files.createDirectories(Paths.get(data)); Files.createDirectories(Paths.get(queue))
        val nFiles = 8
        (0 until nFiles).foreach { i =>
          Files.write(Paths.get(data, f"bin_$i%03d.pcap"),
            graft.sources.CaptureBytes.syntheticPcap(50, seed = i))
          Files.writeString(Paths.get(queue, f"msg_$i%03d"), f"bin_$i%03d.pcap")
        }
        val q = graft.streaming.StreamingPipeline.notifyPipeline(
          s, queue, data, out, ckpt,
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        require(q.awaitTermination(300000), "a3 drain timed out")
        // list the batch dirs explicitly instead of globbing
        // "_latency/*": Hadoop glob resolution through the _-prefixed
        // (hidden-by-convention) parent intermittently matches nothing
        // under load — an explicit listStatus is deterministic and
        // fails LOUD if the drain wrote no batches
        val latDir = new org.apache.hadoop.fs.Path(s"$out/_latency")
        val fs = latDir.getFileSystem(s.sparkContext.hadoopConfiguration)
        val batchDirs = fs.listStatus(latDir).filter(_.isDirectory)
          .map(_.getPath.toString)
        require(batchDirs.nonEmpty, "notifyPipeline wrote no _latency batches")
        val lat = s.read.json(batchDirs: _*)
        val p95 = lat.agg(expr("percentile(latency_ms, 0.95)")).head().getDouble(0)
        lat.select(col("source_file"),
            (col("latency_ms") >= 0 && col("latency_ms") < 600000L).as("latency_ok"),
            lit(p95 >= 0 && p95 < 600000d).as("p95_ok"))
          .orderBy("source_file")
      },
      Some("""SELECT 'bin_' || lpad(CAST(i AS VARCHAR), 3, '0') || '.pcap'
          AS source_file, TRUE AS latency_ok, TRUE AS p95_ok
        FROM range(8) t(i) ORDER BY source_file""")),

    QueryDef("asof_join_enrichment",
      (s, d) => Metrics.asOfEnrichment(t(s, d, "events")),
      Some("""WITH w AS (SELECT event_id, user_id, ts, event_type,
          last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS anchor_ts
        FROM events)
        SELECT event_id, user_id,
          round(epoch(ts) - epoch(anchor_ts), 3) AS secs_since_anchor
        FROM w WHERE event_type = 'purchase' ORDER BY event_id"""), bench = true),

    // pivot/crosstab: per-user event-type count matrix with a PINNED
    // column list (the 100 TB discipline — no distinct-values pre-job)
    QueryDef("pivot_user_events",
      (s, d) => Relational.userEventMatrix(t(s, d, "events"),
        Seq("click", "error", "purchase", "signup", "view")),
      Some("""SELECT user_id,
          sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
          sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
          sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
          sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
        FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST"""),
      bench = true),

    // binned range join: 50 synthetic maintenance windows (derived
    // in-plan from the events ts span — integer arithmetic end to end)
    // joined to events on start <= ts_us < end via SparkUtil.rangeJoin;
    // the oracle does the naive BETWEEN join — results are
    // bin-independent by construction
    QueryDef("range_join_windows",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), expr("unix_micros(ts)").as("us"))
        val st = ev.agg(min("us").as("lo"), max("us").as("hi"))
        val iv = s.range(50).toDF("interval_id")
          .crossJoin(broadcast(st))
          .select(col("interval_id"),
            (col("lo") + col("interval_id") * 2 *
              expr("(hi - lo) div 100")).as("start_us"),
            (col("lo") + col("interval_id") * 2 * expr("(hi - lo) div 100") +
              expr("(hi - lo) div 100")).as("end_us"))
        graft.util.SparkUtil.rangeJoin(ev, "us", iv,
            "start_us", "end_us", binWidth = 3600L * 1000000L)
          .groupBy("interval_id")
          .agg(count(lit(1)).cast("long").as("n_events"),
            min("event_id").as("first_event"),
            max("event_id").as("last_event"))
          .orderBy("interval_id")
      },
      Some("""WITH ev AS MATERIALIZED (SELECT event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        st AS MATERIALIZED (SELECT min(us) AS lo, max(us) AS hi FROM ev),
        iv AS (SELECT k::BIGINT AS interval_id,
            lo + k * 2 * ((hi - lo) // 100) AS start_us,
            lo + k * 2 * ((hi - lo) // 100) + ((hi - lo) // 100) AS end_us
          FROM st CROSS JOIN range(50) r(k))
        SELECT interval_id, count(*)::BIGINT AS n_events,
          min(event_id) AS first_event, max(event_id) AS last_event
        FROM iv JOIN ev ON us >= start_us AND us < end_us
        GROUP BY interval_id ORDER BY interval_id"""),
      bench = true),

    QueryDef("a6_histogram_buckets",
      (s, d) => Metrics.histogramBuckets(t(s, d, "events")),
      Some("""SELECT CASE WHEN value < 1 THEN 0
          ELSE least(CAST(floor(ln(value) / ln(1.5)) AS BIGINT) + 1, 20) END AS bucket,
        count(*) AS n, round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
        FROM events GROUP BY 1 ORDER BY bucket""")),

    QueryDef("salted_distinct_users",
      (s, d) => Metrics.saltedDistinctUsers(t(s, d, "events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    // tolerance-boolean oracle: DuckDB reproduces the exact columns and
    // asserts the within_tol flags as literal TRUE — the hash matches
    // iff the Spark sketch really lands within 5% of exact
    QueryDef("hll_approx_distinct",
      (s, d) => Metrics.approxDistinctUsers(t(s, d, "events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
        count(*) AS n, TRUE AS within_tol
        FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    QueryDef("a6_approx_percentiles",
      (s, d) => Metrics.approxPercentiles(t(s, d, "events")),
      Some("""SELECT event_type,
        round(quantile_cont(value, 0.5), 4) AS p50,
        round(quantile_cont(value, 0.95), 4) AS p95,
        round(quantile_cont(value, 0.99), 4) AS p99,
        TRUE AS p50_within_tol, TRUE AS p95_within_tol, TRUE AS p99_within_tol
        FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""")),

    QueryDef("pivot_user_type_counts",
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        // explicit value list: deterministic column order, no discovery job
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .select(col("user_id"), coalesce(col("click"), lit(0L)).as("click"),
          coalesce(col("error"), lit(0L)).as("error"),
          coalesce(col("purchase"), lit(0L)).as("purchase"),
          coalesce(col("signup"), lit(0L)).as("signup"),
          coalesce(col("view"), lit(0L)).as("view"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""")),

    QueryDef("a4_label_extraction",
      // the reference's log-based metrics extract sniffer_id/interface
      // labels with regexes (terraform/main.tf:261-264); synthesize the
      // log line and extract the label back
      (s, d) => t(s, d, "events")
        .filter(col("user_id").isNotNull)
        .select(format_string("HEARTBEAT: SNIFFER sniffer-%d INTERFACE eth0 OK",
          col("user_id")).as("log_line"))
        .select(regexp_extract(col("log_line"), "SNIFFER (sniffer-\\d+) INTERFACE (\\w+)", 1)
          .as("sniffer_id"))
        .groupBy("sniffer_id").agg(count(lit(1)).as("n"))
        .orderBy("sniffer_id"),
      Some("""SELECT regexp_extract('HEARTBEAT: SNIFFER sniffer-' || CAST(user_id AS VARCHAR)
          || ' INTERFACE eth0 OK', 'SNIFFER (sniffer-\d+) INTERFACE (\w+)', 1) AS sniffer_id,
        count(*) AS n FROM events WHERE user_id IS NOT NULL
        GROUP BY 1 ORDER BY sniffer_id""")),

    // percent_rank over a 5-value key — computed by the distributed
    // range-partition + offset implementation (Metrics.percentRankByKey)
    // instead of Window.partitionBy(event_type), which would funnel the
    // whole table through <=5 reducers at scale. Same result, oracled.
    QueryDef("window_percent_rank",
      (s, d) => {
        Metrics.percentRankByKey(t(s, d, "events"), "event_type",
            Seq("value", "event_id"))
          .select(col("event_id"), col("event_type"),
            round(col("pct_rank"), 6).as("pct_rank"))
          .filter(col("event_id") < 100)
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, round(pr, 6) AS pct_rank FROM (
        SELECT event_id, event_type,
          percent_rank() OVER (PARTITION BY event_type ORDER BY value NULLS FIRST, event_id) AS pr
        FROM events) WHERE event_id < 100 ORDER BY event_id""")),

    QueryDef("sessionize_events",
      (s, d) => Metrics.sessionStats(t(s, d, "events"), 3600),
      Some("""WITH g AS (SELECT user_id, ts,
          CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 3600
               THEN 1 ELSE 0 END AS is_new FROM events),
        s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS session_id FROM g),
        per AS (SELECT user_id, session_id, count(*) AS n_events,
          max(epoch(ts)) - min(epoch(ts)) AS dur FROM s GROUP BY user_id, session_id)
        SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
        round(max(dur), 3) AS max_session_secs
        FROM per GROUP BY user_id ORDER BY user_id NULLS FIRST"""), bench = true),

    // NATIVE session_window sessions (merging-interval semantics,
    // session_end = last event + gap); oracle = gaps-and-islands with
    // the STRICT > gap break (an event at exactly last+gap MERGES —
    // spec-pinned Spark behavior) and +gap end; null users excluded
    QueryDef("session_window_summaries",
      (s, d) => Metrics.sessionWindowSummaries(t(s, d, "events"), 1800),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE user_id IS NOT NULL),
        o AS (SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        i AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
            ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
        g AS (SELECT user_id, sid, min(ts) AS session_start,
            max(ts) AS session_end0, count(*)::BIGINT AS n_events
          FROM i GROUP BY 1, 2)
        SELECT user_id, session_start,
          session_end0 + to_seconds(1800) AS session_end, n_events,
          ((epoch_us(session_end0) + 1800000000
            - epoch_us(session_start)) // 1000000)::BIGINT AS duration_s
        FROM g ORDER BY user_id, session_start"""), bench = true),

    // earliest-anchor greedy funnel view→click→purchase, 2-day step
    // gap; epoch-micro BIGINT outputs — exact integers, no float
    // compare surface
    // BATCH TWIN of the stream–stream interval join
    // (StreamingPipeline.intervalJoinPipeline — the SAME code path the
    // streaming query runs; withWatermark is a no-op in batch): click →
    // purchase attribution, purchases within 6 h of a click by the same
    // user, aggregated per user. Exact integer lag seconds; the plan is
    // an equi-join on user_id with the range residual (SMJ — PlanLint
    // enforces no cartesian/BNLJ).
    QueryDef("interval_join_attribution",
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id").isNotNull)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.streaming.StreamingPipeline.intervalJoinPipeline(
            clicks, "ts", purchases, "ts", "user_id", 6L * 3600L)
          .groupBy("join_key")
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            countDistinct("l_event_id").cast("long").as("n_clicks"),
            countDistinct("r_event_id").cast("long").as("n_purchases"),
            min("lag_s").as("min_lag_s"),
            max("lag_s").as("max_lag_s"))
          .select(col("join_key").as("user_id"), col("n_pairs"),
            col("n_clicks"), col("n_purchases"), col("min_lag_s"),
            col("max_lag_s"))
          .orderBy("user_id")
      },
      Some("""WITH c AS MATERIALIZED (SELECT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events WHERE event_type = 'click' AND user_id IS NOT NULL),
        p AS MATERIALIZED (SELECT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL)
        SELECT c.user_id AS user_id, count(*)::BIGINT AS n_pairs,
          count(DISTINCT c.event_id)::BIGINT AS n_clicks,
          count(DISTINCT p.event_id)::BIGINT AS n_purchases,
          (min(p.us - c.us) // 1000000)::BIGINT AS min_lag_s,
          (max(p.us - c.us) // 1000000)::BIGINT AS max_lag_s
        FROM c JOIN p ON c.user_id = p.user_id
          AND p.us >= c.us AND p.us <= c.us + 21600000000
        GROUP BY c.user_id ORDER BY user_id"""),
      bench = true),

    // LEFT-OUTER twin of the interval join (same function, joinType
    // switched): clicks that never saw a purchase inside the horizon —
    // streaming, this is the timeout detector (unmatched rows emit
    // null-padded once the watermark proves no partner can arrive).
    // Disjointness invariant: a click is matched XOR unmatched, so
    // n_matched + n_unmatched = n_clicks.
    QueryDef("interval_join_unmatched",
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id").isNotNull)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.streaming.StreamingPipeline.intervalJoinPipeline(
            clicks, "ts", purchases, "ts", "user_id", 6L * 3600L,
            joinType = "left_outer")
          .groupBy("join_key")
          .agg(countDistinct("l_event_id").cast("long").as("n_clicks"),
            countDistinct(when(col("r_ts").isNotNull, col("l_event_id")))
              .cast("long").as("n_matched"),
            countDistinct(when(col("r_ts").isNull, col("l_event_id")))
              .cast("long").as("n_unmatched"))
          .select(col("join_key").as("user_id"), col("n_clicks"),
            col("n_matched"), col("n_unmatched"))
          .orderBy("user_id")
      },
      Some("""WITH c AS MATERIALIZED (SELECT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events WHERE event_type = 'click' AND user_id IS NOT NULL),
        p AS MATERIALIZED (SELECT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL)
        SELECT c.user_id AS user_id,
          count(DISTINCT c.event_id)::BIGINT AS n_clicks,
          count(DISTINCT CASE WHEN p.us IS NOT NULL THEN c.event_id END)::BIGINT
            AS n_matched,
          count(DISTINCT CASE WHEN p.us IS NULL THEN c.event_id END)::BIGINT
            AS n_unmatched
        FROM c LEFT JOIN p ON c.user_id = p.user_id
          AND p.us >= c.us AND p.us <= c.us + 21600000000
        GROUP BY c.user_id ORDER BY user_id""")),

    QueryDef("funnel_steps",
      (s, d) => Metrics.funnelSteps(t(s, d, "events"),
        Seq("view", "click", "purchase"), 2L * 86400L),
      Some("""WITH ev AS MATERIALIZED (SELECT user_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        s1 AS (SELECT user_id, min(us) AS t1_us FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT ev.user_id, min(us) AS t2_us FROM ev JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND us > t1_us
            AND us <= t1_us + 172800000000 GROUP BY ev.user_id),
        s3 AS (SELECT ev.user_id, min(us) AS t3_us FROM ev JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND us > t2_us
            AND us <= t2_us + 172800000000 GROUP BY ev.user_id)
        SELECT s1.user_id, t1_us, t2_us, t3_us,
          (1 + CASE WHEN t2_us IS NULL THEN 0 ELSE 1 END
             + CASE WHEN t3_us IS NULL THEN 0 ELSE 1 END)::BIGINT
            AS steps_completed
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        ORDER BY user_id NULLS FIRST"""),
      bench = true),

    // weekly cohort retention triangle on integer epoch-weeks
    // (days-since-1970 div 7 — no engine week-anchor convention)
    QueryDef("cohort_retention",
      (s, d) => Metrics.cohortRetention(t(s, d, "events")),
      Some("""WITH ev AS MATERIALIZED (SELECT user_id,
            (CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01') AS day
          FROM events),
        f AS (SELECT user_id, min(day) // 7 AS w0 FROM ev GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, day // 7 AS w FROM ev)
        SELECT w0::BIGINT AS cohort_week, (w - w0)::BIGINT AS week_offset,
          count(*)::BIGINT AS n_users
        FROM a JOIN f USING (user_id) GROUP BY 1, 2
        ORDER BY cohort_week, week_offset"""),
      bench = true),

    // EWMA-baseline volume anomaly: weights generated ONCE in Scala and
    // injected into both engines (exact dyadics at alpha = 0.5); the
    // anomaly compare runs on the ROUNDED ratio — no float boundary
    QueryDef("metrics_anomaly_ewma",
      (s, d) => Metrics.ewmaDailyAnomalies(t(s, d, "events")),
      Some {
        val ws = Metrics.ewmaWeights(0.5, 7)
        val terms = ws.zipWithIndex
          .map { case (w, i) => s"lag(n, ${i + 1}) OVER w * $w" }
          .mkString(" + ")
        s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*) AS n FROM events GROUP BY 1, 2),
          e AS MATERIALIZED (SELECT event_type, day, n,
              row_number() OVER w AS rn,
              ($terms) / ${ws.sum} AS ewma
            FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
          SELECT event_type, day, n::BIGINT AS n, round(ewma, 4) AS ewma,
            round(n / ewma, 4) AS ratio,
            (round(n / ewma, 4) >= 1.5 OR round(n / ewma, 4) <= 0.6667)
              AS is_anomaly
          FROM e WHERE rn > 7 ORDER BY event_type NULLS FIRST, day"""
      }, bench = true),

    // winsorized robust mean: exact integer-permille rank cutoffs (the
    // quantilesByKey arithmetic) + clip + combinable aggregate
    QueryDef("metrics_winsorized",
      (s, d) => Metrics.winsorizedStats(t(s, d, "events"), "event_type", "value"),
      Some("""WITH v AS MATERIALIZED (SELECT event_type, event_id, value FROM events
          WHERE value IS NOT NULL AND event_type IS NOT NULL),
        r AS (SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type
              ORDER BY value, event_id) AS rk,
            count(*) OVER (PARTITION BY event_type) AS nk
          FROM v),
        c AS MATERIALIZED (SELECT event_type,
            max(CASE WHEN rk <= (50 * nk + 999) // 1000 THEN value END) AS lo,
            max(CASE WHEN rk <= (950 * nk + 999) // 1000 THEN value END) AS hi
          FROM r GROUP BY event_type)
        SELECT v.event_type, count(*)::BIGINT AS n,
          round(c.lo, 2) AS lo, round(c.hi, 2) AS hi,
          round(avg(least(greatest(v.value, c.lo), c.hi)), 4) AS mean_winsorized,
          sum(CASE WHEN v.value < c.lo THEN 1 ELSE 0 END)::BIGINT AS n_clipped_lo,
          sum(CASE WHEN v.value > c.hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped_hi
        FROM v JOIN c USING (event_type)
        GROUP BY v.event_type, c.lo, c.hi ORDER BY event_type"""),
      bench = true),

    // ROLLUP subtotal grid in one Expand pass; rollup-null keys pinned
    // to sentinels (engine null ORDERING differs) + grouping() flags
    QueryDef("metrics_rollup_daily",
      (s, d) => Metrics.rollupDailyCounts(t(s, d, "events")),
      Some("""WITH e AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS day, value
          FROM events)
        SELECT coalesce(event_type, '(all)') AS event_type,
          coalesce(day, DATE '1970-01-01') AS day,
          grouping(event_type)::BIGINT AS g_type,
          grouping(day)::BIGINT AS g_day,
          count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
        FROM e GROUP BY ROLLUP(event_type, day)
        ORDER BY g_type, g_day, event_type, day"""), bench = true),

    // z-order vs single-column layout: per-"file" min/max skipping
    // panel; the z encoding SQL is GENERATED from the same Scala term
    // list as the Catalyst column — zero drift
    QueryDef("zorder_skip_stats",
      // null user_id excluded: a null z-order key has no defined rank
      // placement (engine null ordering differs) — both sides drop it
      (s, d) => Metrics.zorderSkipStats(
        t(s, d, "events").filter(col("user_id").isNotNull)),
      Some {
        val z = graft.util.ZOrder.zValueSql("x", "y", 8)
        s"""WITH e AS MATERIALIZED (SELECT user_id % 256 AS x, event_id % 256 AS y,
            event_id FROM events WHERE user_id IS NOT NULL),
          ez AS (SELECT x, y, event_id, $z AS z FROM e),
          rb AS (SELECT x, y,
              row_number() OVER (ORDER BY x, event_id) AS rk,
              count(*) OVER () AS n FROM ez),
          rz AS (SELECT x, y,
              row_number() OVER (ORDER BY z, event_id) AS rk,
              count(*) OVER () AS n FROM ez),
          u AS (SELECT 'bycol' AS layout, ((rk - 1) * 16) // n AS bucket,
              x, y FROM rb
            UNION ALL
            SELECT 'zorder' AS layout, ((rk - 1) * 16) // n AS bucket,
              x, y FROM rz)
          SELECT layout, bucket::BIGINT AS bucket, count(*)::BIGINT AS n,
            min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
            min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
          FROM u GROUP BY layout, bucket ORDER BY layout, bucket"""
      }, bench = true),

    // rollup-level distinct users: exact count pinned by the oracle,
    // mergeable HLL verified via the tolerance-boolean pattern
    QueryDef("metrics_rollup_distinct",
      (s, d) => Metrics.rollupDistinctUsers(t(s, d, "events")),
      Some("""SELECT coalesce(event_type, '(all)') AS event_type,
          grouping(event_type)::BIGINT AS g_type,
          count(*)::BIGINT AS n,
          count(DISTINCT user_id)::BIGINT AS n_users_exact,
          TRUE AS hll_within_tol
        FROM events GROUP BY ROLLUP(event_type)
        ORDER BY g_type, event_type"""), bench = true),

    // deterministic per-(label, hour) rate-limit sampling on the md5
    // coin — reproducible log-volume control; HOUR buckets so the cap
    // actually bites at this fixture's density (~13 events/label/hour
    // vs < 1/sec — a per-second cap would be a vacuous no-op query)
    QueryDef("metrics_rate_limit_sample",
      (s, d) => Metrics.rateLimitSample(t(s, d, "events"), 3, 3600L),
      Some("""WITH e AS MATERIALIZED (SELECT event_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS sec,
            ('0x' || substr(md5('rate:' || CAST(event_id AS VARCHAR)),
              1, 8))::BIGINT AS coin
          FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type, sec
            ORDER BY coin, event_id) AS rk FROM e)
        SELECT event_id, event_type, sec::BIGINT AS sec
        FROM r WHERE rk <= 3 ORDER BY event_id"""),
      bench = true),

    // deterministic HARD quota — first `cap` events per (type, DAY
    // window) in exact (ts, id) order (rateLimitSample's exact
    // complement; streaming twin quotaLimitPipeline runs the same rule
    // under transformWithState). Daily windows so the cap bites
    // (~67 events/type/day at sf0.01 vs cap 2); all-BIGINT outputs.
    QueryDef("metrics_quota_enforce",
      (s, d) => Metrics.quotaEnforce(t(s, d, "events"), cap = 2,
          windowSeconds = 86400L)
        .orderBy("event_type", "window_start_s", "admit_seq"),
      Some("""WITH e AS (SELECT event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events
          WHERE event_type IS NOT NULL AND event_id IS NOT NULL
            AND ts IS NOT NULL),
        r AS (SELECT event_type,
            (us // 86400000000) * 86400 AS window_start_s, event_id,
            row_number() OVER (PARTITION BY event_type, us // 86400000000
              ORDER BY us, event_id) AS seq
          FROM e)
        SELECT event_type, window_start_s::BIGINT AS window_start_s,
          event_id::BIGINT AS event_id, seq::BIGINT AS admit_seq
        FROM r WHERE seq <= 2
        ORDER BY event_type, window_start_s, admit_seq"""),
      bench = true),

    // Theil-Sen robust trend: median of all pairwise daily-count
    // slopes (rounded before ranking), exact integer median rank
    QueryDef("metrics_trend_theil_sen",
      (s, d) => Metrics.theilSenTrend(t(s, d, "events")),
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*) AS n FROM events GROUP BY 1, 2),
        dd AS (SELECT event_type, (day - DATE '1970-01-01') AS d, n
          FROM daily),
        p AS (SELECT a.event_type,
            round((b.n - a.n)::DOUBLE / (b.d - a.d), 4) AS slope
          FROM dd a JOIN dd b
            ON a.event_type = b.event_type AND a.d < b.d),
        r AS (SELECT event_type, slope,
            row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
            count(*) OVER (PARTITION BY event_type) AS nk FROM p),
        m AS (SELECT event_type, count(*)::BIGINT AS n_pairs,
            max(CASE WHEN rk * 2 <= nk + 1 THEN slope END) AS slope_per_day
          FROM r GROUP BY event_type),
        sd AS (SELECT event_type, count(*)::BIGINT AS n_days FROM daily
          GROUP BY event_type)
        SELECT m.event_type, sd.n_days, m.n_pairs, m.slope_per_day
        FROM m JOIN sd USING (event_type) ORDER BY event_type"""),
      bench = true),

    // lag-k autocorrelation of daily counts (row semantics, like the
    // EWMA op); constant-series NULL corr dropped in both engines
    QueryDef("metrics_autocorrelation",
      (s, d) => Metrics.autocorrelation(t(s, d, "events"), Seq(1, 7)),
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*) AS n FROM events GROUP BY 1, 2),
        l AS (SELECT event_type, n, 1 AS lag,
            lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS p
          FROM daily
          UNION ALL
          SELECT event_type, n, 7,
            lag(n, 7) OVER (PARTITION BY event_type ORDER BY day)
          FROM daily),
        c AS MATERIALIZED (SELECT event_type, lag, count(*)::BIGINT AS n_pairs,
            round(corr(n::DOUBLE, p::DOUBLE), 4) AS autocorr
          FROM l WHERE p IS NOT NULL GROUP BY 1, 2)
        SELECT event_type, lag::BIGINT AS lag, n_pairs, autocorr
        FROM c WHERE n_pairs >= 3 AND autocorr IS NOT NULL
        ORDER BY event_type, lag"""), bench = true),

    // top-k common event paths: per-user lead-window trigrams, heap cut
    QueryDef("metrics_common_paths",
      (s, d) => Metrics.commonPaths(t(s, d, "events"), 3, 20),
      Some("""WITH p AS (SELECT event_type || '>' ||
            lead(event_type, 1) OVER w || '>' ||
            lead(event_type, 2) OVER w AS path,
            lead(event_type, 2) OVER w AS l2
          FROM events WHERE event_type IS NOT NULL
          WINDOW w AS (PARTITION BY user_id
            ORDER BY ts, event_id))
        SELECT path, count(*)::BIGINT AS n FROM p WHERE l2 IS NOT NULL
        GROUP BY path ORDER BY n DESC, path LIMIT 20"""), bench = true),

    // Benford first-digit audit: exact integer cents -> leading digit
    // (never log10 on doubles); expected shares injected from Scala
    QueryDef("metrics_benford",
      (s, d) => Metrics.benfordAudit(t(s, d, "events")),
      Some {
        val exp = Metrics.benfordExpected
        val cases = (1 to 9)
          .map(dg => s"WHEN $dg THEN ${exp(dg - 1)}").mkString(" ")
        s"""WITH v AS MATERIALIZED (SELECT round(value * 100, 0)::BIGINT AS cents
            FROM events WHERE value IS NOT NULL AND value > 0),
          d AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1)::BIGINT
              AS digit FROM v),
          c AS MATERIALIZED (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
          e AS MATERIALIZED (SELECT digit, n,
              round(n::DOUBLE / sum(n) OVER (), 4) AS share,
              round((CASE digit $cases END)::DOUBLE, 4) AS expected
            FROM c)
          SELECT digit, n, share, expected,
            round(abs(share - expected), 4) AS dev
          FROM e ORDER BY digit"""
      }, bench = true),

    // day-of-week seasonality index: exact integer-product ratio, ONE
    // IEEE division (readability discipline); Spark weekday ≡ DuckDB
    // isodow-1 (both 0=Monday); null labels kept as a group
    QueryDef("metrics_seasonality_dow",
      (s, d) => Metrics.seasonalityDow(t(s, d, "events")),
      Some("""WITH daily AS MATERIALIZED (SELECT event_type,
            CAST(ts AS DATE) AS day, count(*) AS n
          FROM events GROUP BY 1, 2),
        dw AS (SELECT event_type, isodow(day) - 1 AS dow,
            count(*)::BIGINT AS n_days, sum(n)::BIGINT AS n_events
          FROM daily GROUP BY 1, 2),
        tot AS (SELECT event_type, count(*)::BIGINT AS days_total,
            sum(n)::BIGINT AS events_total FROM daily GROUP BY 1)
        SELECT dw.event_type, dow::BIGINT AS dow, n_days, n_events,
          round((n_events * days_total)::DOUBLE
            / (n_days * events_total)::DOUBLE, 4) AS season_idx
        FROM dw JOIN tot
          ON dw.event_type IS NOT DISTINCT FROM tot.event_type
        ORDER BY dw.event_type NULLS FIRST, dow"""), bench = true),

    // CUSUM changepoint: EXACT integer statistic end to end (zero float
    // surface); earliest-day tie-break pins the argmax
    QueryDef("metrics_cusum_changepoint",
      (s, d) => Metrics.cusumChangepoint(t(s, d, "events")),
      Some("""WITH daily AS MATERIALIZED (SELECT event_type,
            CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, day, n,
            sum(n) OVER w AS cum,
            row_number() OVER w AS t,
            sum(n) OVER (PARTITION BY event_type) AS total,
            count(*) OVER (PARTITION BY event_type) AS days
          FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        sc AS (SELECT event_type, day, days, total,
            abs(days * cum - t * total) AS sabs FROM s),
        pk AS (SELECT event_type, days, total, day, sabs,
            row_number() OVER (PARTITION BY event_type
              ORDER BY sabs DESC, day) AS rk
          FROM sc)
        SELECT event_type, days::BIGINT AS n_days, total::BIGINT AS total,
          day AS cp_day, sabs::BIGINT AS cusum_abs,
          ((1000 * sabs) // (days * total))::BIGINT AS mean_shift_permille
        FROM pk WHERE rk = 1 ORDER BY event_type NULLS FIRST"""),
      bench = true),

    // pairwise Pearson of daily count series: exact integer sums, an
    // exactly-representable numerator over a correctly-rounded sqrt;
    // manual-Pearson variance guard (ANSI corr() DIVIDE_BY_ZERO class);
    // null labels excluded by contract
    QueryDef("metrics_cross_correlation",
      (s, d) => Metrics.crossCorrelation(t(s, d, "events")),
      Some("""WITH daily AS MATERIALIZED (SELECT event_type,
            CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
          FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            a.n AS x, b.n AS y
          FROM daily a JOIN daily b
            ON a.day = b.day AND a.event_type < b.event_type),
        g AS (SELECT type_a, type_b, count(*)::BIGINT AS n_days,
            sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
            sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
            sum(x * y)::BIGINT AS sxy
          FROM p GROUP BY 1, 2),
        v AS (SELECT *, n_days * sxx - sx * sx AS vx,
            n_days * syy - sy * sy AS vy FROM g)
        SELECT type_a, type_b, n_days,
          round((n_days * sxy - sx * sy)::DOUBLE
            / sqrt((vx * vy)::DOUBLE), 4) AS corr
        FROM v WHERE n_days >= 3 AND vx > 0 AND vy > 0
        ORDER BY type_a, type_b"""), bench = true),

    // EXACT 7-day rolling distinct users: contribution-interval
    // transform (each (label,user,day) appearance covers end days
    // [day, min(day+6, next-1)] — bounded explode, combinable count);
    // the oracle is the naive day×window self-join at panel scale
    QueryDef("metrics_rolling_distinct",
      (s, d) => Metrics.rollingDistinctUsers(t(s, d, "events"), 7),
      Some("""WITH t AS MATERIALIZED (SELECT DISTINCT event_type, user_id,
            CAST(ts AS DATE) AS day
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        d AS MATERIALIZED (SELECT DISTINCT event_type, day FROM t)
        SELECT d.event_type, d.day AS end_day,
          count(DISTINCT t.user_id)::BIGINT AS n_distinct_users
        FROM d JOIN t ON t.event_type IS NOT DISTINCT FROM d.event_type
          AND t.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1, 2 ORDER BY d.event_type NULLS FIRST, end_day"""),
      bench = true),

    // batch twin of the THREE-stateful-operator streaming plan
    // (rollingDistinctPipeline — sliding-window expand + dedup-by-agg
    // + count, the SAME function): every sliding window, not just
    // observed traffic days; oracle enumerates each user-day's 7
    // covered end days and counts distinct (label, user, end) triples
    QueryDef("rolling_distinct_windows",
      (s, d) => graft.streaming.StreamingPipeline
        .rollingDistinctPipeline(t(s, d, "events"), 7)
        .orderBy(col("event_type"), col("end_day")),
      Some("""WITH t AS MATERIALIZED (SELECT DISTINCT event_type, user_id,
            CAST(ts AS DATE) AS day
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        c AS (SELECT DISTINCT event_type, user_id,
            day + i.o::INTEGER AS end_day
          FROM t CROSS JOIN (SELECT unnest(range(0, 7)) AS o) i)
        SELECT end_day, event_type,
          count(*)::BIGINT AS n_distinct_users
        FROM c GROUP BY 1, 2
        ORDER BY event_type NULLS FIRST, end_day"""),
      bench = true),

    // label × weekday mutual information: exact integer counts, one
    // division + one ln per cell; marginals are window sums over the
    // ≤|labels|·7 panel
    QueryDef("metrics_mutual_info",
      (s, d) => Metrics.mutualInfoPanel(t(s, d, "events")),
      Some("""WITH c AS MATERIALIZED (SELECT event_type,
            isodow(CAST(ts AS DATE)) - 1 AS dow, count(*)::BIGINT AS n
          FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        m AS (SELECT event_type, dow, n,
            sum(n) OVER (PARTITION BY event_type) AS rt,
            sum(n) OVER (PARTITION BY dow) AS ct,
            sum(n) OVER () AS nn
          FROM c)
        SELECT event_type, dow::BIGINT AS dow, n,
          round(ln((n * nn)::DOUBLE / (rt * ct)::DOUBLE), 4) AS pmi,
          round(n::DOUBLE / nn::DOUBLE
            * ln((n * nn)::DOUBLE / (rt * ct)::DOUBLE), 4) AS mi_contrib
        FROM m ORDER BY event_type NULLS FIRST, dow"""), bench = true),

    // SCD2 interval build: gaps-and-islands over per-user type runs →
    // (valid_from, valid_to, version) dimension rows; run order is
    // (ts, event_id), null-type runs merge null-safely
    QueryDef("scd2_intervals",
      (s, d) => Metrics.scd2Intervals(t(s, d, "events")),
      Some("""WITH e AS (SELECT user_id, event_type,
            CAST(ts AS TIMESTAMP) AS ts, event_id
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        m AS (SELECT user_id, event_type, ts,
            CASE WHEN row_number() OVER w > 1
                AND lag(event_type) OVER w IS NOT DISTINCT FROM event_type
              THEN 0 ELSE 1 END AS chg,
            event_id
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (SELECT user_id, event_type, ts,
            sum(chg) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS grp
          FROM m),
        runs AS MATERIALIZED (SELECT user_id, grp,
            min(event_type) AS event_type, min(ts) AS valid_from,
            count(*)::BIGINT AS n_events
          FROM g GROUP BY 1, 2)
        SELECT user_id, grp::BIGINT AS version, event_type, valid_from,
          lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp)
            AS valid_to,
          n_events
        FROM runs ORDER BY user_id, version"""), bench = true),

    // two-proportion z-test per label over the deterministic
    // user_id%2 arm split: exact integer counts in, three IEEE ops out
    QueryDef("metrics_ab_ztest",
      (s, d) => Metrics.abProportionTest(t(s, d, "events")),
      Some("""WITH c AS MATERIALIZED (SELECT event_type,
            sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS x_a,
            sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS x_b
          FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        w AS (SELECT event_type, x_a, x_b,
            sum(x_a) OVER ()::BIGINT AS n_a,
            sum(x_b) OVER ()::BIGINT AS n_b FROM c),
        j AS (SELECT * FROM w WHERE n_a > 0 AND n_b > 0),
        p AS (SELECT *,
            (x_a + x_b)::DOUBLE / (n_a + n_b)::DOUBLE AS pooled FROM j),
        z AS (SELECT event_type, n_a, x_a, n_b, x_b,
            x_a::DOUBLE / n_a::DOUBLE AS pa,
            x_b::DOUBLE / n_b::DOUBLE AS pb,
            (x_a::DOUBLE / n_a::DOUBLE - x_b::DOUBLE / n_b::DOUBLE)
              / sqrt(pooled * (1 - pooled)
                * (1.0::DOUBLE / n_a::DOUBLE + 1.0::DOUBLE / n_b::DOUBLE)) AS zv
          FROM p WHERE pooled > 0 AND pooled < 1)
        SELECT event_type, n_a, x_a, n_b, x_b, round(pa, 4) AS p_a,
          round(pb, 4) AS p_b, round(zv, 4) AS z,
          abs(zv) > 1.96 AS significant
        FROM z ORDER BY event_type NULLS FIRST"""), bench = true),

    // Kaplan-Meier time-to-conversion with right censoring (no
    // purchase by corpus end = censored at the horizon): exp(Σ ln)
    // product with the explicit all-convert guard (Spark ANSI log(0)
    // is NULL, DuckDB's is -inf — never let either engine evaluate it)
    QueryDef("metrics_survival_km",
      (s, d) => Metrics.survivalKm(t(s, d, "events"), "purchase"),
      Some("""WITH spans AS MATERIALIZED (SELECT user_id,
            min(CAST(ts AS DATE)) AS f,
            min(CASE WHEN event_type = 'purchase'
              THEN CAST(ts AS DATE) END) AS c
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
          GROUP BY 1),
        h AS (SELECT max(CAST(ts AS DATE)) AS hend FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        lt AS (SELECT (CASE WHEN c IS NOT NULL THEN c - f
              ELSE hend - f END)::BIGINT AS dur,
            c IS NULL AS censored FROM spans, h),
        panel AS MATERIALIZED (SELECT dur, count(*)::BIGINT AS total,
            sum(CASE WHEN censored THEN 0 ELSE 1 END)::BIGINT AS n_deaths
          FROM lt GROUP BY 1),
        r AS (SELECT *, sum(total) OVER (ORDER BY dur DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS at_risk
          FROM panel),
        s AS (SELECT *, CASE WHEN n_deaths < at_risk
              THEN ln((at_risk - n_deaths)::DOUBLE / at_risk::DOUBLE)
              ELSE 0 END AS term,
            CASE WHEN n_deaths >= at_risk THEN 1 ELSE 0 END AS deadflag
          FROM r),
        acc AS (SELECT *, sum(term) OVER w AS lnsum,
            max(deadflag) OVER w AS dead
          FROM s WINDOW w AS (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT dur AS duration_days, at_risk AS n_at_risk, n_deaths,
          (total - n_deaths)::BIGINT AS n_censored_at,
          CASE WHEN dead = 1 THEN 0.0::DOUBLE
            ELSE round(exp(lnsum), 4) END AS survival
        FROM acc WHERE n_deaths > 0 ORDER BY duration_days"""),
      bench = true),

    // Holt level+trend forecast: closed-form weight vectors generated
    // ONCE in Scala (exact dyadics at alpha = beta = 0.5) and injected
    // as CAST('w' AS DOUBLE) literals — string->double parse is
    // correctly rounded in both engines, zero drift; calendar window
    // pivoted to y1..yL so the dot product is a fixed expression tree
    QueryDef("metrics_forecast_holt",
      (s, d) => Metrics.holtForecast(t(s, d, "events")),
      Some {
        val (lw, tw) = Metrics.holtWeights(0.5, 0.5, 14)
        def dot(ws: Seq[Double]) = ws.zipWithIndex
          .map { case (w, i) => s"CAST('$w' AS DOUBLE) * y${i + 1}" }
          .mkString(" + ")
        val ys = (1 to 14)
          .map(j => s"coalesce(max(CASE WHEN i = $j THEN n END), 0)::DOUBLE AS y$j")
          .mkString(", ")
        s"""WITH lastd AS (SELECT max(CAST(ts AS DATE)) AS ld FROM events
            WHERE ts IS NOT NULL),
          daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
          win AS (SELECT event_type, 14 - (ld - day) AS i, n
            FROM daily, lastd WHERE 14 - (ld - day) BETWEEN 1 AND 14),
          piv AS MATERIALIZED (SELECT event_type, $ys
            FROM win GROUP BY event_type),
          lt AS (SELECT event_type, (${dot(lw)}) AS lev, (${dot(tw)}) AS tr
            FROM piv)
          SELECT event_type, (SELECT ld FROM lastd) AS base_day,
            h::BIGINT AS horizon, round(lev, 4) AS level,
            round(tr, 4) AS trend, round(lev + h * tr, 4) AS forecast
          FROM lt CROSS JOIN (SELECT unnest([1, 2, 3]) AS h)
          ORDER BY event_type NULLS FIRST, horizon"""
      }, bench = true),

    // deterministic first touch per (user, label): the canonical-dedup
    // batch twin of the streaming dropDuplicatesWithinWatermark
    // pipeline — survivor = min (ts, event_id), a function of the data
    QueryDef("events_first_touch",
      (s, d) => Metrics.firstTouch(t(s, d, "events")),
      Some("""SELECT user_id, event_type, first_ts, event_id FROM (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS first_ts,
            event_id,
            row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        WHERE rn = 1 ORDER BY user_id, event_type NULLS FIRST"""),
      bench = true),

    // hourly novelty rate: NEW (user, label) combinations per hour —
    // the oracled batch twin of the CHAINED streaming plan
    // (dedup-within-watermark -> windowed count); hour buckets stay
    // TIMESTAMP on both engines (only DAY demotes to DATE)
    QueryDef("events_novelty_hourly",
      (s, d) => Metrics.noveltyHourly(t(s, d, "events")),
      Some("""WITH f AS (SELECT user_id, event_type,
            CAST(ts AS TIMESTAMP) AS first_ts,
            row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        SELECT date_trunc('hour', first_ts) AS hour, event_type,
          count(*)::BIGINT AS n_new
        FROM f WHERE rn = 1 GROUP BY 1, 2
        ORDER BY hour, event_type NULLS FIRST"""), bench = true),

    // per-user inter-arrival power-of-2 histogram: whole-second gaps,
    // bucket = bit-length (never float log); user-grain lag windows
    QueryDef("metrics_interarrival_hist",
      (s, d) => Metrics.interarrivalHist(t(s, d, "events")),
      Some("""WITH g AS (SELECT event_type,
            (epoch_us(CAST(ts AS TIMESTAMP))
              - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id)) // 1000000 AS gap_s
          FROM events WHERE user_id IS NOT NULL),
        b AS (SELECT event_type,
            CASE WHEN gap_s < 1 THEN -1
              ELSE length(bin(gap_s)) - 1 END AS bucket, gap_s
          FROM g WHERE gap_s IS NOT NULL)
        SELECT event_type, bucket::BIGINT AS bucket,
          count(*)::BIGINT AS n_gaps, min(gap_s)::BIGINT AS min_gap_s,
          max(gap_s)::BIGINT AS max_gap_s
        FROM b GROUP BY 1, 2
        ORDER BY event_type NULLS FIRST, bucket"""), bench = true),

    // day-over-day top movers: exact integer deltas, global top-k as a
    // TakeOrdered with a total tie-break
    QueryDef("metrics_top_movers",
      (s, d) => Metrics.topMovers(t(s, d, "events"), 10),
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            count(*)::BIGINT AS n
          FROM events GROUP BY 1, 2),
        l AS (SELECT event_type, day, n,
            lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
          FROM daily),
        m AS (SELECT event_type, day, n, prev_n, n - prev_n AS delta
          FROM l WHERE prev_n IS NOT NULL)
        SELECT event_type, day, n, prev_n, delta
        FROM m
        ORDER BY abs(delta) DESC, event_type NULLS FIRST, day
        LIMIT 10"""), bench = true),

    // same-day co-occurrence lift matrix: distinct user-day-label
    // triples, exact integer permille; 1000 = independence
    QueryDef("metrics_affinity_matrix",
      (s, d) => Metrics.affinityMatrix(t(s, d, "events")),
      Some("""WITH ud AS MATERIALIZED (SELECT DISTINCT user_id,
            CAST(ts AS DATE) AS day, event_type
          FROM events
          WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        n AS (SELECT count(*)::BIGINT AS n_total
          FROM (SELECT DISTINCT user_id, day FROM ud)),
        t AS (SELECT event_type, count(*)::BIGINT AS n_t
          FROM ud GROUP BY 1),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            count(*)::BIGINT AS n_ab
          FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.day = b.day
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, n_ab,
          ((1000 * n_ab * n_total) // (ta.n_t * tb.n_t))::BIGINT
            AS lift_permille
        FROM p JOIN t ta ON ta.event_type = p.type_a
          JOIN t tb ON tb.event_type = p.type_b
          CROSS JOIN n
        ORDER BY type_a, type_b"""), bench = true),

    // source-concentration Gini: exact BIGINT rank-weighted sum, one
    // double expression at the end
    QueryDef("corpus_source_gini",
      (s, d) => CorpusOps.sourceGini(t(s, d, "documents")),
      Some(s"""WITH per AS (SELECT source,
          coalesce(sum(len($toksSql)), 0)::BIGINT AS n_tokens
          FROM documents GROUP BY source),
        r AS (SELECT *, row_number() OVER (ORDER BY n_tokens, source)
            AS i FROM per),
        a AS (SELECT count(*)::BIGINT AS ns, sum(n_tokens)::BIGINT AS tot,
            sum(i * n_tokens)::BIGINT AS s FROM r)
        SELECT ns AS n_sources, tot AS total_tokens,
          CASE WHEN tot > 0 THEN
            round((2.0 * s - (ns + 1)::DOUBLE * tot) / (ns::DOUBLE * tot), 6)
          ELSE 0.0 END AS gini
        FROM a"""), bench = true),

    // Markov transition matrix: user-grain lead window -> |types|^2
    // combinable matrix + tiny row normalization
    QueryDef("metrics_transition_matrix",
      (s, d) => Metrics.transitionMatrix(t(s, d, "events")),
      Some("""WITH o AS (SELECT user_id, event_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS next_type
          FROM events WHERE event_type IS NOT NULL),
        m AS (SELECT event_type AS from_type, next_type AS to_type,
            count(*) AS n
          FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n::BIGINT AS n,
          round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 4) AS p
        FROM m ORDER BY from_type, to_type"""),
      bench = true),

    // trailing-window counts via the KEYED bin range join (never a
    // label-partitioned RANGE frame — the K-reducer funnel); oracle is
    // the naive keyed BETWEEN self-join
    QueryDef("metrics_trailing_window",
      (s, d) => Metrics.trailingWindowCounts(t(s, d, "events"), 3600),
      Some("""SELECT a.event_id, a.event_type, count(*)::BIGINT AS n_trailing
        FROM events a JOIN events b ON b.event_type = a.event_type
          AND epoch_us(CAST(b.ts AS TIMESTAMP)) >
            epoch_us(CAST(a.ts AS TIMESTAMP)) - 3600000000
          AND epoch_us(CAST(b.ts AS TIMESTAMP)) <=
            epoch_us(CAST(a.ts AS TIMESTAMP))
        GROUP BY 1, 2 ORDER BY a.event_id"""),
      bench = true),

    // median/MAD robust outliers: two exact rank-quantile passes; the
    // cutoff factor is ONE Scala double quoted into both engines and
    // compared on raw doubles through the identical expression tree
    QueryDef("metrics_mad_outliers",
      (s, d) => Metrics.madOutliers(t(s, d, "events"), "event_type", "value"),
      Some {
        val cut = Metrics.madCutoff(3.0)
        s"""WITH v AS MATERIALIZED (SELECT event_type, event_id, value FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL),
          r1 AS (SELECT event_type, value,
              row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
              count(*) OVER (PARTITION BY event_type) AS nk FROM v),
          m AS (SELECT event_type,
              max(CASE WHEN rk <= (500 * nk + 999) // 1000 THEN value END)
                AS med FROM r1 GROUP BY event_type),
          dv AS (SELECT v.event_type, abs(v.value - m.med) AS dev, m.med
            FROM v JOIN m USING (event_type)),
          r2 AS (SELECT event_type, dev,
              row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
              count(*) OVER (PARTITION BY event_type) AS nk FROM dv),
          md AS (SELECT event_type,
              max(CASE WHEN rk <= (500 * nk + 999) // 1000 THEN dev END)
                AS mad FROM r2 GROUP BY event_type)
          SELECT dv.event_type, count(*)::BIGINT AS n,
            round(dv.med, 4) AS median, round(md.mad, 4) AS mad,
            sum(CASE WHEN dv.dev > md.mad * $cut THEN 1 ELSE 0 END)::BIGINT
              AS n_outliers
          FROM dv JOIN md USING (event_type)
          GROUP BY dv.event_type, dv.med, md.mad ORDER BY event_type"""
      }, bench = true),

    // per-column ingest-QA profile: one scan, exact distincts (the
    // oracle-pinnable form; swap HLL in at 100 TB — scaladoc)
    QueryDef("metrics_column_profile",
      (s, d) => Metrics.columnProfile(t(s, d, "events")),
      Some("""SELECT 'event_id' AS col_name,
          sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
          count(DISTINCT event_id)::BIGINT AS n_distinct,
          round(min(event_id)::DOUBLE, 4) AS min_num,
          round(max(event_id)::DOUBLE, 4) AS max_num,
          NULL AS min_str, NULL AS max_str FROM events
        UNION ALL SELECT 'ts',
          sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT,
          count(DISTINCT ts)::BIGINT,
          round(min(epoch_us(CAST(ts AS TIMESTAMP)))::DOUBLE, 4),
          round(max(epoch_us(CAST(ts AS TIMESTAMP)))::DOUBLE, 4),
          NULL, NULL FROM events
        UNION ALL SELECT 'user_id',
          sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT,
          count(DISTINCT user_id)::BIGINT,
          round(min(user_id)::DOUBLE, 4), round(max(user_id)::DOUBLE, 4),
          NULL, NULL FROM events
        UNION ALL SELECT 'event_type',
          sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT,
          count(DISTINCT event_type)::BIGINT,
          NULL, NULL, min(event_type), max(event_type) FROM events
        UNION ALL SELECT 'value',
          sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
          count(DISTINCT value)::BIGINT,
          round(min(value), 4), round(max(value), 4), NULL, NULL FROM events
        UNION ALL SELECT 'props',
          sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT,
          count(DISTINCT props)::BIGINT,
          NULL, NULL, min(props), max(props) FROM events
        ORDER BY col_name"""), bench = true))

  // ---------------- P-series scalar ops over events/documents ---------

  private val scalars = Seq(
    QueryDef("p1_json_extract",
      (s, d) => t(s, d, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id""")),

    QueryDef("p3_timestamp_repair",
      (s, d) => t(s, d, "events").select(col("event_id"),
        unix_timestamp(graft.udm.UdmExpressions.robustTimestamp(
          concat(date_format(col("ts"), "MMM dd, yyyy HH:mm:ss"), lit(" UTC"))))
          .as("epoch_s"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s
        FROM events ORDER BY event_id""")),

    QueryDef("p4_classify_severity",
      (s, d) => t(s, d, "events").select(
          when(col("event_type") === "error", "high")
            .when(col("event_type").isin("purchase", "signup"), "medium")
            .otherwise("low").as("severity"))
        .groupBy("severity").agg(count(lit(1)).as("n")).orderBy("severity"),
      Some("""SELECT CASE WHEN event_type = 'error' THEN 'high'
          WHEN event_type IN ('purchase', 'signup') THEN 'medium'
          ELSE 'low' END AS severity, count(*) AS n
        FROM events GROUP BY 1 ORDER BY severity""")),

    QueryDef("p14_error_containment",
      (s, d) => t(s, d, "events").filter(col("event_type") === "error")
        .select(col("event_id"),
          lit("event processing failed").as("error_msg"),
          substring(col("props"), 1, 1000).as("snippet"))
        .orderBy("event_id"),
      Some("""SELECT event_id, 'event processing failed' AS error_msg,
        substr(props, 1, 1000) AS snippet
        FROM events WHERE event_type = 'error' ORDER BY event_id""")),

    QueryDef("p15_base64_roundtrip",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          base64(encode(col("source"), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(col("source"), "UTF-8"))), "UTF-8").as("roundtrip"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, to_base64(encode(source)) AS b64,
        decode(from_base64(to_base64(encode(source)))) AS roundtrip
        FROM documents ORDER BY doc_id""")),

    QueryDef("p16_filename_derivation",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          regexp_replace(concat(col("source"), lit(".pcapng")), "\\.pcap(ng)?$", ".udm.json")
            .as("udm_name"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        regexp_replace(source || '.pcapng', '\.pcap(ng)?$', '.udm.json') AS udm_name
        FROM documents ORDER BY doc_id""")),

    QueryDef("f1_filename_validation",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 50 === 0, concat(col("source"), lit("/evil")))
            .otherwise(col("source")).as("fname"))
        .select(col("doc_id"), col("fname"),
          graft.etl.BatchPipeline.isValidFilename(col("fname")).as("is_valid"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, fname,
        (length(fname) > 0 AND position('/' IN fname) = 0) AS is_valid
        FROM (SELECT doc_id, CASE WHEN doc_id % 50 = 0 THEN source || '/evil'
          ELSE source END AS fname FROM documents) ORDER BY doc_id""")))

  // ---------------- UDM pipeline (synth packets → full transform) -----

  private val udm = Seq(
    QueryDef("udm_classify_pipeline",
      (s, d) => {
        // sort-before-transform: the global range sort runs on the cheap
        // 4-column scan (its sampling pass re-executes only that scan,
        // not the pipeline), and the narrow synth→parse→classify chain
        // preserves both intra-partition order and partition numbering —
        // so the output is globally ordered by event_id without a
        // post-transform sort that would double-execute the transform.
        // Explicit partition count: an orderBy exchange would be
        // AQE-coalesced to ~1 partition at this data size, serializing
        // the downstream CPU-dense transform.
        val sorted = t(s, d, "events")
          .repartitionByRange(s.sparkContext.defaultParallelism, col("event_id"))
          .sortWithinPartitions("event_id")
        val packets = SynthPackets.fromEvents(sorted, widen = false)
        val out = UdmTransform.transform(packets, "raw")
          .select(col("event_id"), col("event_struct.event").as("event"))
        out.select(col("event_id"),
            col("event.metadata.event_type").as("udm_type"),
            col("event.principal.port").cast("long").as("src_port"),
            try_element_at(col("event.about"), lit(1)).getField("hostname").as("about_host"))
        // deliberately NO trailing .orderBy: EliminateSorts would drop
        // the input-side local sort and keep a top-level global Sort
        // that buffers the whole transformed output (measured 2×). The
        // ordering contract is carried by construction — range
        // partitions + sorted input + narrow stages — and the driver's
        // order-sensitive compare (green at sf0.001/0.01/0.1) is the
        // enforcement. See CLAUDE.md invariant note.
      },
      // a NULL user_id renders as the string "null" in format_string,
      // so tcp/udp packets get srcport="null" → the int-cast error path
      // (P14 containment, UdmExpressions intCastError) → ERROR; signup
      // (ARP) has no tcp/udp layer, so it still classifies as ARP with
      // null port/host — the oracle mirrors both branches
      Some("""SELECT event_id,
        CASE WHEN user_id IS NULL AND event_type = 'signup' THEN 'NETWORK_ARP'
          WHEN user_id IS NULL THEN 'NETWORK_EVENT_ERROR'
          WHEN event_type = 'purchase' THEN 'NETWORK_SSL'
          WHEN event_type = 'view' THEN 'NETWORK_DNS'
          WHEN event_type = 'click' THEN 'NETWORK_HTTP'
          WHEN event_type = 'signup' THEN 'NETWORK_ARP'
          ELSE 'NETWORK_EVENT_ERROR' END AS udm_type,
        CASE WHEN event_type IN ('click', 'purchase') THEN 10000 + user_id
          WHEN event_type = 'view' THEN 20000 + user_id END AS src_port,
        CASE WHEN event_type = 'click' THEN 'host' || CAST(user_id AS VARCHAR) || '.example.com'
          WHEN event_type = 'view' THEN 'q' || CAST(user_id AS VARCHAR) || '.example.org'
          WHEN event_type = 'purchase' THEN 'sni' || CAST(user_id AS VARCHAR) || '.example.net'
          END AS about_host
        FROM events ORDER BY event_id"""), bench = true),

    QueryDef("udm_event_type_counts",
      (s, d) => {
        val packets = SynthPackets.fromEvents(t(s, d, "events"))
        UdmTransform.transform(packets, "raw")
          .select(col("event_struct.event").as("event"))
          .groupBy(col("event.metadata.event_type").as("udm_type"))
          .agg(count(lit(1)).as("n")).orderBy("udm_type")
      },
      Some("""SELECT CASE WHEN user_id IS NULL AND event_type = 'signup' THEN 'NETWORK_ARP'
          WHEN user_id IS NULL THEN 'NETWORK_EVENT_ERROR'
          WHEN event_type = 'purchase' THEN 'NETWORK_SSL'
          WHEN event_type = 'view' THEN 'NETWORK_DNS'
          WHEN event_type = 'click' THEN 'NETWORK_HTTP'
          WHEN event_type = 'signup' THEN 'NETWORK_ARP'
          ELSE 'NETWORK_EVENT_ERROR' END AS udm_type,
        count(*) AS n FROM events GROUP BY 1 ORDER BY udm_type""")))

  // ---------------- text analysis -------------------------------------

  private val bm25Terms = Seq("spark", "vector", "merge", "customer", "window")

  private def toksSql = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""

  private val text = Seq(
    QueryDef("txt_token_stats",
      (s, d) => TextAnalysis.tokenStats(t(s, d, "documents")),
      Some(s"""SELECT doc_id,
        len($toksSql) AS n_tokens,
        len(list_distinct($toksSql)) AS n_uniq_tokens,
        len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_subwords,
        n_chars,
        round(CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql), 4) AS type_token_ratio
        FROM documents ORDER BY doc_id"""), bench = true),

    QueryDef("txt_quality_scores",
      (s, d) => TextAnalysis.qualityScores(t(s, d, "documents"), stopwords),
      Some(s"""SELECT doc_id, len($toksSql) AS n_tokens,
        round(CAST(length(text) AS DOUBLE) / len($toksSql), 4) AS mean_token_len,
        round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
          / length(text), 6) AS punct_density,
        round(CAST(len(list_filter($toksSql, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)
          / len($toksSql), 4) AS stopword_ratio,
        (len($toksSql) >= 10 AND
         round(CAST(len(list_filter($toksSql, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)
          / len($toksSql), 4) >= 0.05) AS is_quality
        FROM documents ORDER BY doc_id""")),

    // Gopher-style repetition signals: duplicate bigram/trigram
    // fractions (boilerplate and generation loops score high)
    QueryDef("txt_repetition",
      (s, d) => TextAnalysis.repetitionScores(t(s, d, "documents")),
      Some {
        def gramSql(k: Int): String = {
          val parts = (0 until k).map(j => s"w[i${if (j == 0) "" else s"+$j"}]")
            .mkString(" || ' ' || ")
          s"""CASE WHEN len(w) >= $k
              THEN list_transform(range(1, len(w) - ${k - 2}), i -> $parts)
              ELSE [] END"""
        }
        def dupSql(g: String): String =
          s"""round((CASE WHEN len($g) > 0
              THEN 1.0 - CAST(len(list_distinct($g)) AS DOUBLE) / len($g)
              ELSE 0.0 END)::DOUBLE, 4)"""
        s"""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            ${dupSql("bi")} AS dup_bigram_ratio,
            ${dupSql("tri")} AS dup_trigram_ratio
          FROM (SELECT doc_id, w, ${gramSql(2)} AS bi, ${gramSql(3)} AS tri
            FROM (SELECT doc_id, $toksSql AS w FROM documents))
          ORDER BY doc_id"""
      }),

    QueryDef("txt_language_id",
      (s, d) => TextAnalysis.languageId(t(s, d, "documents"), langMarkers),
      Some {
        val lt = """regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')"""
        val score = (ws: Seq[String]) =>
          s"len(list_filter($lt, t -> list_contains(${sqlList(ws)}, t)))"
        val langs = langMarkers.toSeq.sortBy(_._1)
        val greatest = langs.map(l => score(l._2)).mkString("greatest(", ", ", ")")
        val cases = langs.map { case (lang, ws) =>
          s"WHEN ${score(ws)} = $greatest THEN '$lang'" }.mkString(" ")
        s"""SELECT doc_id, lang AS actual_lang,
          CASE $cases END AS predicted_lang,
          $greatest AS marker_hits
          FROM documents ORDER BY doc_id"""
      }),

    QueryDef("txt_top_tokens",
      (s, d) => graft.util.SparkUtil.widen(t(s, d, "documents"))
        .select(explode(TextAnalysis.bpeishTokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok")).limit(20),
      Some("""SELECT tok, count(*) AS n FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
          t -> t <> '')) AS tok FROM documents)
        GROUP BY tok ORDER BY n DESC, tok LIMIT 20""")),

    QueryDef("txt_winnowing_fingerprints",
      (s, d) => TextAnalysis.winnowingFingerprints(t(s, d, "documents")),
      Some("""WITH g AS (SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 0) + 1),
            i -> substr(md5(substr(text, i, 8)), 1, 8)) AS grams
          FROM documents),
        wfp AS (SELECT doc_id,
          CASE WHEN len(grams) >= 16 THEN
            list_distinct(list_transform(range(1, len(grams) - 15 + 1),
              j -> list_min(grams[j:j+15])))
          WHEN len(grams) > 0 THEN [list_min(grams)] ELSE NULL END AS wins
          FROM g)
        SELECT doc_id, CAST(len(wins) AS BIGINT) AS n_fingerprints,
          list_min(wins) AS min_fp, list_max(wins) AS max_fp
        FROM wfp ORDER BY doc_id""")),

    // per-source duplication rate: the fixture unions a copy of every
    // doc_id % 10 == 0 document (new ids) so the rate is non-trivial
    QueryDef("dedup_rate_by_source",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.dedupRateBySource(docs.unionByName(
          docs.filter(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L)))
      },
      Some("""WITH corpus AS (
          SELECT source, text FROM documents
          UNION ALL
          SELECT source, text FROM documents WHERE doc_id % 10 = 0)
        SELECT source, count(*)::BIGINT AS n_docs,
          count(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::BIGINT AS n_unique,
          round(1.0 - count(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::DOUBLE
            / count(*), 4) AS dup_rate
        FROM corpus GROUP BY source ORDER BY source""")),

    // winnowing pair generation: substring-evidence near-dup pairs
    // (MOSS family) — docs sharing >= 2 winnow fingerprints after the
    // stop-fingerprint df cap; complements the MinHash bag-of-shingles
    // pairs with position-robust copied-substring evidence
    QueryDef("dedup_winnow_pairs",
      (s, d) => Dedup.winnowPairs(t(s, d, "documents"),
        k = 8, w = 16, minShared = 3, maxFpDf = 16),
      Some("""WITH g AS (SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 0) + 1),
            i -> substr(md5(substr(text, i, 8)), 1, 8)) AS grams
          FROM documents),
        wfp AS (SELECT doc_id,
          CASE WHEN len(grams) >= 16 THEN
            list_distinct(list_transform(range(1, len(grams) - 15 + 1),
              j -> list_min(grams[j:j+15])))
          WHEN len(grams) > 0 THEN [list_min(grams)] ELSE [] END AS wins
          FROM g),
        fp AS MATERIALIZED (SELECT doc_id, unnest(wins) AS fp FROM wfp),
        rare AS (SELECT fp FROM fp GROUP BY fp
          HAVING count(DISTINCT doc_id) <= 16),
        kept AS (SELECT fp.doc_id, fp.fp FROM fp JOIN rare USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*)::BIGINT AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3
        ORDER BY doc_a, doc_b"""),
      bench = true),

    // winnow containment: the ASYMMETRIC near-dup case (short doc
    // quoted inside a long one — low Jaccard, high containment vs the
    // short side); score = shared post-cap fingerprints / the smaller
    // doc's FULL winnow-set size, filter on the ROUNDED value
    QueryDef("dedup_containment_pairs",
      (s, d) => Dedup.containmentPairs(t(s, d, "documents"),
        k = 8, w = 16, minContainment = 0.2, maxFpDf = 16),
      Some("""WITH g AS (SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 0) + 1),
            i -> substr(md5(substr(text, i, 8)), 1, 8)) AS grams
          FROM documents),
        wfp AS (SELECT doc_id,
          CASE WHEN len(grams) >= 16 THEN
            list_distinct(list_transform(range(1, len(grams) - 15 + 1),
              j -> list_min(grams[j:j+15])))
          WHEN len(grams) > 0 THEN [list_min(grams)] ELSE [] END AS wins
          FROM g),
        fp AS MATERIALIZED (SELECT doc_id, unnest(wins) AS fp FROM wfp),
        sizes AS (SELECT doc_id, len(wins)::BIGINT AS n_fp FROM wfp
          WHERE len(wins) > 0),
        rare AS (SELECT fp FROM fp GROUP BY fp
          HAVING count(DISTINCT doc_id) <= 16),
        kept AS (SELECT fp.doc_id, fp.fp FROM fp JOIN rare USING (fp)),
        sh AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*)::BIGINT AS n_shared
          FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, n_shared,
          round(CAST(n_shared AS DOUBLE) / least(na.n_fp, nb.n_fp), 4)
            AS containment
        FROM sh JOIN sizes na ON na.doc_id = sh.doc_a
          JOIN sizes nb ON nb.doc_id = sh.doc_b
        WHERE round(CAST(n_shared AS DOUBLE) / least(na.n_fp, nb.n_fp), 4)
          >= 0.2
        ORDER BY doc_a, doc_b"""),
      bench = true),

    QueryDef("txt_fingerprints",
      (s, d) => TextAnalysis.fingerprints(t(s, d, "documents")),
      Some("""SELECT doc_id,
        md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        md5(text) AS raw_md5 FROM documents ORDER BY doc_id""")),

    // unigram-LM cross-entropy (the CCNet/Gopher perplexity-filter
    // shape, unigram so both engines express it): add-one-smoothed
    // −log2 p averaged per doc, model fit on the corpus itself
    QueryDef("txt_unigram_lm",
      (s, d) => TextAnalysis.unigramLogProb(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          freq AS (SELECT token, count(*)::BIGINT AS tf FROM toks GROUP BY token),
          tot AS MATERIALIZED (SELECT sum(tf)::BIGINT AS n_total, count(*)::BIGINT AS n_vocab FROM freq),
          perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
            avg(ln(tf + 1)) AS avg_ln_tf1
          FROM toks JOIN freq USING (token) GROUP BY doc_id)
          SELECT doc_id, n_tokens,
            round((ln(n_total + n_vocab) - avg_ln_tf1) / ln(2.0), 4) AS bits_per_token
          FROM perdoc CROSS JOIN tot ORDER BY doc_id"""
      }, bench = true),

    // Heaps-law vocabulary growth: distinct vs total n-grams, n = 1..4,
    // one tagged explode + two-level combinable count
    QueryDef("txt_vocab_growth",
      (s, d) => TextAnalysis.vocabGrowth(t(s, d, "documents"), 4),
      Some("""WITH w AS (SELECT regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS w
          FROM documents WHERE text IS NOT NULL),
        g AS (
          SELECT 1 AS n, unnest(w) AS gram FROM w
          UNION ALL SELECT 2, unnest([array_to_string(w[i:i+1], ' ')
            FOR i IN range(1, len(w))]) FROM w WHERE len(w) >= 2
          UNION ALL SELECT 3, unnest([array_to_string(w[i:i+2], ' ')
            FOR i IN range(1, len(w) - 1)]) FROM w WHERE len(w) >= 3
          UNION ALL SELECT 4, unnest([array_to_string(w[i:i+3], ' ')
            FOR i IN range(1, len(w) - 2)]) FROM w WHERE len(w) >= 4)
        SELECT n::BIGINT AS n, count(*)::BIGINT AS n_total,
          count(DISTINCT gram)::BIGINT AS n_distinct,
          round(count(DISTINCT gram)::DOUBLE / count(*), 6) AS ttr
        FROM g GROUP BY n ORDER BY n"""),
      bench = true),

    // tokenizer fertility / compression per language: one combinable
    // lang groupBy, bpeish subwords as the deterministic proxy
    QueryDef("txt_fertility",
      (s, d) => TextAnalysis.tokenizerFertility(t(s, d, "documents")),
      Some {
        val w = s"coalesce(len($toksSql), 0)"
        val b = "coalesce(len(list_filter(regexp_split_to_array(lower(text), " +
          "'[^a-z0-9]+'), t -> t <> '')), 0)"
        val c = "coalesce(length(text), 0)"
        s"""SELECT lang, count(*)::BIGINT AS n_docs,
          sum($w)::BIGINT AS n_words, sum($b)::BIGINT AS n_subwords,
          CASE WHEN sum($w) > 0
            THEN round(sum($b)::DOUBLE / sum($w), 4) END AS fertility,
          CASE WHEN sum($b) > 0
            THEN round(sum($c)::DOUBLE / sum($b), 4) END AS chars_per_subword
        FROM documents GROUP BY lang ORDER BY lang NULLS FIRST"""
      }, bench = true),

    // two-pass Misra-Gries heavy hitters: output = EXACTLY the tokens
    // with cnt*(k+1) > N at k=40 — the oracle derives that set from
    // full counts, so a hash match proves the MG survival guarantee
    QueryDef("txt_frequent_tokens",
      (s, d) => TextAnalysis.frequentTokens(t(s, d, "documents"), 40),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT unnest($toksSql) AS token FROM documents),
          tc AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
          tot AS MATERIALIZED (SELECT sum(cnt)::BIGINT AS n FROM tc)
          SELECT token, cnt, round(cnt::DOUBLE / n, 6) AS share
          FROM tc CROSS JOIN tot WHERE cnt * 41 > n
          ORDER BY cnt DESC, token"""
      }, bench = true),

    // CCNet head/middle/tail perplexity bucketing per source: rank the
    // ROUNDED unigram-LM score within each source (doc_id tie-break),
    // bucket = ((rank-1)*3) div n — integer math, exact in both engines
    QueryDef("txt_perplexity_buckets",
      (s, d) => TextAnalysis.perplexityBuckets(t(s, d, "documents"), 3),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          freq AS (SELECT token, count(*)::BIGINT AS tf FROM toks GROUP BY token),
          tot AS MATERIALIZED (SELECT sum(tf)::BIGINT AS n_total, count(*)::BIGINT AS n_vocab FROM freq),
          perdoc AS (SELECT doc_id, avg(ln(tf + 1)) AS avg_ln_tf1
            FROM toks JOIN freq USING (token) GROUP BY doc_id),
          sc AS (SELECT p.doc_id, d.source,
              round((ln(t.n_total + t.n_vocab) - p.avg_ln_tf1) / ln(2.0), 4)
                AS bits_per_token
            FROM perdoc p CROSS JOIN tot t JOIN documents d ON d.doc_id = p.doc_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY bits_per_token, doc_id) AS rk,
            count(*) OVER (PARTITION BY source) AS n FROM sc)
          SELECT doc_id, source, bits_per_token,
            (((rk - 1) * 3) // n)::BIGINT AS bucket
          FROM r ORDER BY doc_id"""
      }, bench = true),

    // Okapi BM25 against a fixed query term set (retrieval-based
    // filtering). Float constants are injected from the SAME Scala
    // doubles the operator uses, cast from their round-trip string
    // form — both engines then compute with bit-identical constants
    QueryDef("txt_bm25_scores",
      (s, d) => TextAnalysis.bm25Scores(t(s, d, "documents"), bm25Terms),
      Some {
        import TextAnalysis.{Bm25K1, Bm25B}
        val c1 = s"CAST('${Bm25K1 + 1}' AS DOUBLE)" // k1 + 1
        val ck = s"CAST('$Bm25K1' AS DOUBLE)"       // k1
        val c2 = s"CAST('${1 - Bm25B}' AS DOUBLE)"  // 1 − b
        val cb = s"CAST('$Bm25B' AS DOUBLE)"        // b
        val inList = bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          dl AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
          stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
          matched AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks
            WHERE token IN $inList GROUP BY doc_id, token),
          dfs AS (SELECT token, count(*)::BIGINT AS df FROM matched GROUP BY token)
          SELECT doc_id, count(*)::BIGINT AS n_matched_terms,
            round(sum(ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
              * tf * $c1 / (tf + $ck * ($c2 + $cb * dl / avgdl))), 4) AS bm25
          FROM matched JOIN dfs USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY doc_id ORDER BY doc_id"""
      }),

    // DSIR importance weights (hashed-unigram target-vs-raw LLR; the
    // data-selection scorer). Target slice = lang='en'. The oracle
    // mirrors the exact arithmetic order: avg of per-token
    // ln(cnt_tgt+1)−ln(cnt_raw+1), smoothing scalar applied above the
    // per-doc aggregate
    QueryDef("txt_importance_weights",
      (s, d) => TextAnalysis.importanceWeights(
        t(s, d, "documents"), col("lang") === "en", 256),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_target,
            unnest($toksSql) AS token FROM documents),
          tb AS (SELECT doc_id, is_target,
            (('0x' || substr(md5(token), 1, 8))::BIGINT % 256) AS bucket FROM toks),
          counts AS (SELECT bucket, count(*)::BIGINT AS cnt_raw,
            sum(is_target)::BIGINT AS cnt_tgt FROM tb GROUP BY bucket),
          totals AS (SELECT sum(cnt_raw)::BIGINT AS n_raw,
            sum(cnt_tgt)::BIGINT AS n_tgt FROM counts),
          perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
            avg(ln(cnt_tgt + 1) - ln(cnt_raw + 1)) AS avg_w
            FROM tb JOIN counts USING (bucket) GROUP BY doc_id)
          SELECT doc_id, n_tokens,
            round(avg_w + ln(n_raw + 256) - ln(n_tgt + 256), 4) + 0 AS log_ratio
          FROM perdoc CROSS JOIN totals ORDER BY doc_id"""
      }, bench = true),

    // hashing-trick linear classifier (fastText shape): bucket →
    // formulaic weight, logit = mean weight, sigmoid. Entirely narrow —
    // the scan-speed ceiling for a classifier pass
    QueryDef("txt_hash_classifier",
      (s, d) => TextAnalysis.hashClassifierScore(t(s, d, "documents"), 256),
      Some {
        s"""SELECT doc_id, n_tokens,
            round(1.0 / (1.0 + exp(-logit)), 4) AS p_keep,
            logit >= 0 AS is_kept
          FROM (SELECT doc_id, len(w)::BIGINT AS n_tokens,
            list_sum(list_transform(w, t ->
              ((('0x' || substr(md5(t), 1, 8))::BIGINT % 256) * 2654435761 % 1001)
                / 500.0 - 1.0)) / len(w) AS logit
            FROM (SELECT doc_id, $toksSql AS w FROM documents))
          ORDER BY doc_id"""
      }),

    // conditional bigram LM (add-one smoothed p(w2|w1), V = distinct
    // continuations): the two-token deepening of txt_unigram_lm —
    // word salads score high even when every word is common
    QueryDef("txt_bigram_lm",
      (s, d) => TextAnalysis.bigramLogProb(t(s, d, "documents")),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
            FROM w WHERE len(w) >= 2),
          c12 AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
          c1 AS MATERIALIZED (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1),
          v AS MATERIALIZED (SELECT count(DISTINCT w2)::BIGINT AS v FROM c12)
          SELECT doc_id, count(*)::BIGINT AS n_bigrams,
            round(avg(ln(c1 + v) - ln(c12 + 1)) / ln(2.0), 4) AS bits_per_bigram
          FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
          GROUP BY doc_id ORDER BY doc_id"""
      }, bench = true),

    // vocabulary coverage vs the corpus top-16 tokens (count DESC,
    // token ASC tie-break — the k-th seat is deterministic both
    // engines): the tokenizer-fit / OOV-rate check. k=16 < the
    // synthetic corpus's 31-token vocabulary so the OOV path is
    // genuinely exercised (k=100 would cover everything → all-zero)
    QueryDef("txt_vocab_coverage",
      (s, d) => TextAnalysis.vocabCoverage(t(s, d, "documents"), 16),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          vocab AS (SELECT token FROM (SELECT token, count(*) AS cnt FROM toks
            GROUP BY token ORDER BY cnt DESC, token LIMIT 16)),
          perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
            sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
            FROM toks LEFT JOIN vocab v ON toks.token = v.token GROUP BY doc_id)
          SELECT doc_id, n_tokens, n_oov,
            round(CAST(n_oov AS DOUBLE) / n_tokens, 4) AS oov_rate
          FROM perdoc ORDER BY doc_id"""
      }),

    // per-source characteristic terms (TF-IDF top-5). Ranking key is
    // the ROUNDED score + token tie-break so both engines rank
    // identical values; Spark side ranks via the skew-safe rankByKey
    // (no per-source window funnel), oracle via the plain window
    QueryDef("txt_tfidf_terms",
      (s, d) => TextAnalysis.tfidfTopTerms(t(s, d, "documents"), 5),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token FROM documents),
          tf AS MATERIALIZED (SELECT source, token, count(*)::BIGINT AS tf FROM toks
            GROUP BY source, token),
          dfs AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
          ns AS (SELECT count(DISTINCT source)::BIGINT AS n_sources FROM tf),
          scored AS (SELECT source, token, tf, df,
            round(tf * ln((CAST(n_sources AS DOUBLE) + 1) / (df + 1)), 4) AS tfidf
            FROM tf JOIN dfs USING (token) CROSS JOIN ns),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY tfidf DESC, token) AS rk FROM scored)
          SELECT source, token, tf, df, tfidf, rk::BIGINT AS rk
          FROM ranked WHERE rk <= 5 ORDER BY source, rk"""
      }),

    // Zipf fit: per-source OLS slope of ln(freq) on ln(rank) — the
    // corpus-health panel (natural language ≈ −1); the tie-broken
    // row_number rank matches rankByKey's total order
    QueryDef("txt_zipf_slope",
      (s, d) => TextAnalysis.zipfSlope(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token FROM documents),
          tf AS MATERIALIZED (SELECT source, token, count(*) AS cnt FROM toks
            GROUP BY source, token),
          r AS (SELECT source, cnt, row_number() OVER (PARTITION BY source
            ORDER BY cnt DESC, token) AS rk FROM tf)
          SELECT source, count(*)::BIGINT AS vocab,
            round(covar_pop(ln(rk), ln(cnt)) / var_pop(ln(rk)), 4) + 0.0
              AS zipf_slope
          FROM r GROUP BY source HAVING count(*) >= 2 ORDER BY source"""
      }),

    // boilerplate 3-gram mining: top-20 word shingles by DOCUMENT
    // frequency (per-doc distinct BEFORE the explode), df >= 2; the
    // global cut is a TakeOrderedAndProject heap on the total order
    // (df DESC, gram) both engines share
    QueryDef("txt_boilerplate_ngrams",
      (s, d) => TextAnalysis.boilerplateNgrams(t(s, d, "documents"), 2, 20),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(${shinglesSql("w")}))
            AS gram FROM w),
          d AS (SELECT gram, count(*)::BIGINT AS df FROM sh GROUP BY gram)
          SELECT gram, df FROM d WHERE df >= 2
          ORDER BY df DESC, gram LIMIT 20"""
      }, bench = true),

    // per-doc n-gram novelty: share of a doc's distinct 3-shingles
    // with corpus df = 1 (templated-content detector; the doc-grain
    // complement of the boilerplate miner); shingle-less docs emit no
    // row, matching the shingle convention
    QueryDef("txt_ngram_novelty",
      (s, d) => TextAnalysis.ngramNovelty(t(s, d, "documents")),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(${shinglesSql("w")}))
            AS gram FROM w),
          d AS (SELECT gram, count(*)::BIGINT AS df FROM sh GROUP BY gram)
          SELECT sh.doc_id, count(*)::BIGINT AS n_grams,
            sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
            round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE /
              count(*), 4) AS novelty
          FROM sh JOIN d USING (gram)
          GROUP BY sh.doc_id ORDER BY doc_id"""
      }, bench = true),

    // PMI collocations, hardened (VERDICT r9 §1): the hashed output is
    // the exactly-representable LIFT ratio (integer-count products +
    // one division — IEEE-correctly-rounded, bit-identical on any
    // engine build), never ln (libm last-ulp drift); ordering only on
    // the ROUNDED score (same ranking — ln is monotone)
    QueryDef("txt_collocations_pmi",
      (s, d) => TextAnalysis.collocationsPmi(t(s, d, "documents")),
      Some {
        s"""WITH d AS (SELECT $toksSql AS t FROM documents
            WHERE text IS NOT NULL AND len($toksSql) >= 2),
          tok AS (SELECT unnest(t) AS w FROM d),
          uni AS MATERIALIZED (SELECT w, count(*) AS cu FROM tok GROUP BY w),
          tu AS (SELECT sum(cu)::DOUBLE AS tot_u FROM uni),
          bx AS (SELECT t, unnest(range(1, len(t))) AS i FROM d),
          big AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM bx),
          bc AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
          tb AS (SELECT sum(cb)::DOUBLE AS tot_b FROM bc)
          SELECT bc.w1, bc.w2, bc.cb::BIGINT AS n,
            round((bc.cb::DOUBLE * tot_u * tot_u) /
              (tot_b * u1.cu * u2.cu), 4) AS lift
          FROM bc CROSS JOIN tu CROSS JOIN tb
          JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w
          WHERE bc.cb >= 5
          ORDER BY lift DESC, w1, w2"""
      }, bench = true),

    // Burrows' Delta stylometric source distance: z-scores of the
    // top-10 function-word frequencies across the dense word x source
    // grid (absent word = freq 0; zero-variance word = z 0)
    QueryDef("txt_stylometry_delta",
      (s, d) => TextAnalysis.stylometryDelta(t(s, d, "documents")),
      Some {
        s"""WITH tok AS (SELECT source, unnest($toksSql) AS w
            FROM documents WHERE text IS NOT NULL),
          sw AS MATERIALIZED (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
          tot AS MATERIALIZED (SELECT source, sum(c) AS tot FROM sw GROUP BY source),
          gl AS (SELECT w, sum(c) AS gc FROM sw GROUP BY w),
          fw AS (SELECT w FROM gl ORDER BY gc DESC, w LIMIT 10),
          grid AS (SELECT fw.w, t.source,
              coalesce(sw.c, 0)::DOUBLE / t.tot AS f
            FROM fw CROSS JOIN tot t
            LEFT JOIN sw ON sw.w = fw.w AND sw.source = t.source),
          st AS MATERIALIZED (SELECT w, avg(f) AS mu, stddev_pop(f) AS sd
            FROM grid GROUP BY w),
          z AS MATERIALIZED (SELECT g.source, g.w,
              CASE WHEN st.sd > 0 THEN (g.f - st.mu) / st.sd
                ELSE 0.0 END AS z
            FROM grid g JOIN st USING (w))
          SELECT a.source AS source_a, b.source AS source_b,
            round(avg(abs(a.z - b.z)), 4) AS delta,
            count(*)::BIGINT AS n_words
          FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2 ORDER BY source_a, source_b"""
      }, bench = true),

    // char-trigram language ID (CLD-style self-trained profiles):
    // integer occurrence scoring, argmax with lang tiebreak, confusion
    // matrix output; DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all default
    QueryDef("txt_langid_trigram",
      (s, d) => TextAnalysis.trigramLangId(t(s, d, "documents")),
      Some("""WITH d AS (SELECT doc_id, lang,
            regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', '_', 'g') AS s
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        dd AS (SELECT doc_id, lang, s FROM d WHERE length(s) >= 3),
        tg AS MATERIALIZED (SELECT doc_id, lang,
            unnest(list_transform(range(1, length(s) - 1),
              i -> substr(s, i, 3))) AS tg
          FROM dd),
        cnt AS (SELECT lang, tg, count(*) AS c FROM tg GROUP BY 1, 2),
        prof AS (SELECT lang AS plang, tg FROM
          (SELECT *, row_number() OVER (PARTITION BY lang
              ORDER BY c DESC, tg) AS rk FROM cnt)
          WHERE rk <= 50),
        sc AS (SELECT t.doc_id, t.lang, p.plang, count(*) AS score
          FROM tg t JOIN prof p USING (tg) GROUP BY 1, 2, 3),
        pick AS (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, plang) AS rk FROM sc)
        SELECT lang AS actual_lang, plang AS predicted_lang,
          count(*)::BIGINT AS n_docs
        FROM pick WHERE rk = 1
        GROUP BY 1, 2 ORDER BY actual_lang, predicted_lang"""),
      bench = true),

    // Flesch readability over forged sentence terminators (the shared
    // corpus_chunk_sentences scaffold); exact integer counts, one
    // fixed per-row double formula
    QueryDef("txt_readability",
      (s, d) => TextAnalysis.readability(forgeSentences(t(s, d, "documents"))),
      Some {
        s"""WITH $forgedSentencesCte,
          s1 AS (SELECT doc_id,
              list_filter(list_transform(
                regexp_split_to_array(trim(text), '[.!?][ \\t\\n\\x0B\\f\\r]+'),
                x -> regexp_replace(x, '[.!?]+$$', '')), x -> x <> '') AS ss,
              regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tk
            FROM b WHERE text IS NOT NULL),
          m AS (SELECT doc_id, len(ss) AS n_sentences, len(tk) AS n_words,
              list_sum(list_transform(tk, w -> greatest(1,
                len(regexp_extract_all(lower(w), '[aeiou]+')))))::BIGINT
                AS n_syllables
            FROM s1 WHERE len(ss) > 0)
          , m2 AS (SELECT doc_id, n_sentences, n_words, n_syllables,
              206835::BIGINT * n_sentences * n_words
                - 1015::BIGINT * n_words * n_words
                - 84600::BIGINT * n_syllables * n_sentences AS rnum,
              1000::BIGINT * n_sentences * n_words AS rden
            FROM m)
          SELECT doc_id, n_sentences::BIGINT AS n_sentences,
            n_words::BIGINT AS n_words, n_syllables,
            (CASE WHEN rnum >= 0 THEN (200 * rnum + rden) // (2 * rden)
              ELSE -((200 * -rnum + rden) // (2 * rden)) END)::DOUBLE
              / 100.0::DOUBLE AS flesch
          FROM m2 ORDER BY doc_id"""
      }, bench = true),

    // OOV-vs-vocab-size curve: skew-safe constant-key global type rank,
    // one conditional-sum pass for all candidates, exact permille
    QueryDef("txt_oov_curve",
      (s, d) => TextAnalysis.oovCurve(t(s, d, "documents"), oovVocabSizes),
      Some {
        val vs = oovVocabSizes.mkString("[", ", ", "]")
        s"""WITH toks AS MATERIALIZED (SELECT unnest($toksSql) AS token
            FROM documents WHERE text IS NOT NULL),
          c AS (SELECT token, count(*)::BIGINT AS cnt
            FROM toks GROUP BY token),
          r AS MATERIALIZED (SELECT token, cnt,
              row_number() OVER (ORDER BY cnt DESC, token) AS rk FROM c),
          t AS (SELECT count(*)::BIGINT AS n_types,
              sum(cnt)::BIGINT AS total FROM r),
          v AS (SELECT unnest($vs) AS vocab_size),
          cov AS (SELECT v.vocab_size,
              coalesce(sum(CASE WHEN r.rk <= v.vocab_size
                THEN r.cnt END), 0)::BIGINT AS covered
            FROM v CROSS JOIN r GROUP BY 1)
          SELECT vocab_size::BIGINT AS vocab_size, n_types,
            total AS total_tokens, covered AS covered_tokens,
            ((1000 * (total - covered)) // total)::BIGINT AS oov_permille
          FROM cov CROSS JOIN t WHERE total > 0 ORDER BY vocab_size"""
      }, bench = true),

    // sentence-length burstiness (index of dispersion): exact integer
    // permille over the readability sentence scaffold
    QueryDef("txt_burstiness",
      (s, d) => TextAnalysis.burstiness(forgeSentences(t(s, d, "documents"))),
      Some {
        s"""WITH $forgedSentencesCte,
          s1 AS (SELECT doc_id,
              list_filter(list_transform(
                regexp_split_to_array(trim(text), '[.!?][ \\t\\n\\x0B\\f\\r]+'),
                x -> regexp_replace(x, '[.!?]+$$', '')), x -> x <> '') AS ss
            FROM b WHERE text IS NOT NULL),
          xs AS (SELECT doc_id,
              len(regexp_split_to_array(trim(unnest(ss)),
                '[ \\t\\n\\x0B\\f\\r]+'))::BIGINT AS x
            FROM s1 WHERE len(ss) > 0),
          g AS (SELECT doc_id, count(*)::BIGINT AS n_sentences,
              sum(x)::BIGINT AS n_words, sum(x * x)::BIGINT AS q
            FROM xs GROUP BY doc_id)
          SELECT doc_id, n_sentences, n_words,
            ((1000 * (n_sentences * q - n_words * n_words))
              // (n_sentences * n_words))::BIGINT AS vmr_permille
          FROM g ORDER BY doc_id"""
      }, bench = true),

    // weighted-lexicon scoring: broadcast LEFT join over exploded
    // tokens, exact integer-permille normalization; lexicon injected
    // from ONE Scala value on both sides
    QueryDef("txt_lexicon_score",
      (s, d) => TextAnalysis.lexiconScore(t(s, d, "documents"),
        scoringLexicon),
      Some {
        val rows = scoringLexicon
          .map { case (tk, w) => s"('$tk', $w)" }.mkString(", ")
        s"""WITH toks AS MATERIALIZED (SELECT doc_id,
              unnest($toksSql) AS token
            FROM documents WHERE text IS NOT NULL),
          lex AS (SELECT * FROM (VALUES $rows) v(token, weight)),
          j AS (SELECT t.doc_id, l.weight
            FROM toks t LEFT JOIN lex l ON t.token = l.token),
          g AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
              sum(CASE WHEN weight IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                AS lex_hits,
              coalesce(sum(weight), 0)::BIGINT AS wsum
            FROM j GROUP BY doc_id)
          SELECT doc_id, n_tokens, lex_hits, wsum,
            (CASE WHEN wsum >= 0
              THEN (2000 * wsum + n_tokens) // (2 * n_tokens)
              ELSE -((2000 * -wsum + n_tokens) // (2 * n_tokens))
              END)::BIGINT AS score_permille
          FROM g ORDER BY doc_id"""
      }, bench = true))

  // ---------------- dedup ---------------------------------------------

  private def shinglesSql(w: String) =
    s"""CASE WHEN len($w) >= 3
        THEN list_transform(range(1, len($w) - 1), i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])
        ELSE [] END"""

  /** Shared CTE prefix for the repeated-span family (ExactSubstr):
    * tokens → positioned 3-gram hashes → df > 2 frequent set → hits →
    * gaps-and-islands → maximal `spans(doc_id, span_start, span_end,
    * n_grams)`. Mirrors [[Dedup.repeatedSpans]](n=3, maxDocFreq=2). */
  private def repeatedSpansCte =
    s"""toksw AS (SELECT doc_id, $toksSql AS w FROM documents),
      grams AS (SELECT doc_id,
        unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(0, len(w) - 3 + 1),
          i -> md5(array_to_string(w[i+1:i+3], ' '))) ELSE [] END) AS gh,
        unnest(CASE WHEN len(w) >= 3 THEN range(0, len(w) - 3 + 1) ELSE [] END) AS pos
      FROM toksw),
      freq AS (SELECT gh FROM grams GROUP BY gh HAVING count(DISTINCT doc_id) > 2),
      hits AS (SELECT doc_id, pos::BIGINT AS pos, (pos + 3)::BIGINT AS epos
        FROM grams WHERE gh IN (SELECT gh FROM freq)),
      flagged AS (SELECT doc_id, pos, epos,
        CASE WHEN max(epos) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
          OR pos > max(epos) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          THEN 1 ELSE 0 END AS new_span FROM hits),
      islands AS (SELECT *, sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
        ROWS UNBOUNDED PRECEDING) AS island FROM flagged),
      spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
        max(epos)::BIGINT AS span_end, count(*)::BIGINT AS n_grams
        FROM islands GROUP BY doc_id, island)"""

  /** Hash j = 8-hex slice (j%4) of md5 of seed group (j/4) || shingle —
    * the single source of truth for the slice scheme, mirroring
    * [[Dedup.minhashSignatures]]. */
  private def minhashSliceSql(j: Int, shingleVar: String = "sh") =
    s"list_min(list_transform($shingleVar, x -> substr(md5('${j / 4}:' || x), ${1 + 8 * (j % 4)}, 8)))"

  /** Shared CTE prefix for the MinHash-LSH SQL mirrors (k=3 shingles,
    * 8 hashes, 2 bands of 4): words → shingles → signature slots →
    * banded keys. Used by dedup_minhash_pairs and the jaccard verifier
    * it feeds. */
  private def minhashBandsCtes: String = minhashBandsCtesFor("", "")

  /** Parameterized variant: `where` restricts the document subset,
    * `p` prefixes every CTE name so two instantiations (e.g. corpus
    * vs incoming) can coexist in one WITH clause, `src` swaps the
    * source relation (a remapping CTE for cross-corpus fixtures). */
  private def minhashBandsCtesFor(where: String, p: String,
                                  src: String = "documents"): String = {
    val hs = (0 until 8).map(j => s"${minhashSliceSql(j)} AS h$j").mkString(", ")
    val sigList = (0 until 8).map(j => s"h$j").mkString("[", ", ", "]")
    val bandKeys = (0 until 2).map { b =>
      val slots = (0 until 4).map(r => s"sig[${b * 4 + r + 1}]").mkString(" || '|' || ")
      s"SELECT doc_id, sig, $b AS band, md5($slots) AS key FROM ${p}sig"
    }.mkString(" UNION ALL ")
    s"""${p}words AS (SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS w FROM $src $where),
      ${p}sh AS MATERIALIZED (SELECT doc_id, ${shinglesSql("w")} AS sh FROM ${p}words),
      ${p}sigs AS (SELECT doc_id, $hs FROM ${p}sh),
      ${p}sig AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM ${p}sigs),
      ${p}bands AS ($bandKeys)"""
  }

  /** SRP-LSH bucket mirror (over a `vec` DOUBLE list column): plane p's
    * ±1 components from bit 0 of md5("p:i"); same left-to-right double
    * summation as the Spark side. Shared by sim_lsh_topk and the
    * embedding near-dup verifier. */
  private def srpBucketSql(nBits: Int): String = (0 until nBits).map { p =>
    val elem = s"CASE WHEN (('0x' || substr(md5('$p:' || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT & 1) = 1 THEN vec[i] ELSE -vec[i] END"
    s"CASE WHEN list_sum(list_transform(range(1, len(vec) + 1), i -> $elem)) >= 0 THEN ${1 << p} ELSE 0 END"
  }.mkString(" + ")

  /** SimHash fingerprint CTEs (toks → per-bit votes → 64-bit fp as two
    * 32-bit halves `hi`/`lo`), mirroring [[Dedup.simhash]]'s math —
    * shared by the fingerprint query and the Hamming pair query. */
  private val simhashFpCtes: String = {
    def votes(half: String, off: Int) = (0 until 32).map(b =>
      s"CAST(sum(CASE WHEN ((('0x' || substr(md5(tok), $off, 8))::BIGINT >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS ${half}$b").mkString(", ")
    def fp(half: String) = (0 until 32).map(b =>
      s"CASE WHEN ${half}$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
      .mkString(" | ")
    s"""toks AS MATERIALIZED (SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
        FROM documents),
      v AS MATERIALIZED (SELECT doc_id, ${votes("hi", 1)}, ${votes("lo", 9)} FROM toks GROUP BY doc_id),
      fp AS MATERIALIZED (SELECT doc_id, ${fp("hi")} AS hi, ${fp("lo")} AS lo FROM v)"""
  }

  private val dedup = Seq(
    QueryDef("dedup_exact",
      (s, d) => Dedup.exactDuplicates(t(s, d, "documents")),
      Some("""SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        min(doc_id) AS keep_doc_id, count(*) AS group_size,
        coalesce(string_agg(DISTINCT lang, ',' ORDER BY lang), '') AS langs
        FROM documents GROUP BY 1 ORDER BY keep_doc_id"""), bench = true),

    QueryDef("dedup_minhash_signatures",
      (s, d) => {
        val sig = Dedup.minhashSignatures(t(s, d, "documents"), 3, 8)
        sig.select(col("doc_id"),
          concat_ws("-", (0 until 8).map(i => coalesce(col(s"h$i"), lit(""))): _*).as("sig"))
          .orderBy("doc_id")
      },
      Some {
        val hs = (0 until 8).map(j => s"coalesce(${minhashSliceSql(j)}, '')")
        s"""WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS w
            FROM documents),
          sh AS MATERIALIZED (SELECT doc_id, ${shinglesSql("w")} AS sh FROM words)
          SELECT doc_id, ${hs.mkString(" || '-' || ")} AS sig
          FROM sh ORDER BY doc_id"""
      }, bench = true),

    QueryDef("dedup_simhash",
      (s, d) => Dedup.simhash(t(s, d, "documents")),
      Some {
        s"""WITH $simhashFpCtes
          SELECT doc_id, hi AS simhash_hi, lo AS simhash_lo
          FROM fp ORDER BY doc_id"""
      }),

    // Hamming-banded near-dup — the SimHash family's verify stage: four
    // 16-bit bands of the 64-bit fingerprint (pigeonhole: distance <= 3
    // pairs share a band exactly), equi-join on (band, key), then
    // popcount(xor) <= 3 verify. Oracle mirrors fingerprints AND the
    // band join with portable bit ops (bit_count / xor / shifts).
    QueryDef("dedup_simhash_pairs",
      (s, d) => Dedup.simhashNearDupPairs(t(s, d, "documents"), 3),
      Some {
        s"""WITH $simhashFpCtes,
          bands AS (
            SELECT doc_id, hi, lo, 0 AS band, (hi >> 16) & 65535 AS key FROM fp
            UNION ALL SELECT doc_id, hi, lo, 1, hi & 65535 FROM fp
            UNION ALL SELECT doc_id, hi, lo, 2, (lo >> 16) & 65535 FROM fp
            UNION ALL SELECT doc_id, hi, lo, 3, lo & 65535 FROM fp),
          pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
            CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
          FROM pairs
          WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 3
          ORDER BY doc_a, doc_b"""
      }, bench = true),

    // Incremental corpus admission — dedup an incoming batch against
    // the EXISTING corpus via its signature bands (computed once,
    // writeSignatures-persistable), without re-scanning the corpus:
    // semi-join marks band collisions, anti-join admits the rest.
    // Even doc_ids play the corpus, odd ones the incoming batch.
    QueryDef("corpus_admit_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpusSig = Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 2 === 0), 3, 8)
        Dedup.admitNewDocuments(docs.filter(col("doc_id") % 2 === 1),
            corpusSig, 3, 8, 4)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
      },
      Some {
        s"""WITH ${minhashBandsCtesFor("WHERE doc_id % 2 = 0", "c")},
          ${minhashBandsCtesFor("WHERE doc_id % 2 = 1", "n")},
          dup AS (SELECT DISTINCT n.doc_id FROM nbands n JOIN cbands c
            ON n.band = c.band AND n.key = c.key)
          SELECT doc_id, lang, source FROM documents
          WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)
          ORDER BY doc_id"""
      }, bench = true),

    // Cluster formation — the stage AFTER pairs: connected components
    // of the candidate graph (pairs alone under-merge: A~B, B~C means
    // {A,B,C} is ONE group). Spark side is iterative min-label
    // propagation; the oracle computes the same components with a
    // recursive transitive-closure CTE. cluster_id = min doc_id of the
    // component; singletons are their own cluster.
    QueryDef("dedup_clusters",
      (s, d) => Dedup.duplicateClusters(t(s, d, "documents"), 3, 8, 4),
      Some {
        s"""WITH RECURSIVE $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
          SELECT d.doc_id, least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
          FROM documents d LEFT JOIN
            (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
            ON m.src = d.doc_id
          ORDER BY doc_id"""
      }, bench = true),

    // quality-aware survivors: keep the LONGEST doc per near-dup
    // cluster (argmax n_chars, min-id ties) — combinable struct-max,
    // recursive-CTE clusters + row_number argmax in the oracle
    QueryDef("dedup_keep_best",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.keepBestPerCluster(
          Dedup.duplicateClusters(docs, 3, 8, 4),
          docs.select(col("doc_id"), col("n_chars").cast("double").as("score")))
      },
      Some {
        s"""WITH RECURSIVE $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
          cl AS (SELECT d.doc_id,
              least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN
              (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
              ON m.src = d.doc_id),
          sc AS (SELECT cl.doc_id, cl.cluster_id, dd.n_chars::DOUBLE AS score
            FROM cl JOIN documents dd ON dd.doc_id = cl.doc_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY coalesce(score, '-infinity'::DOUBLE) DESC, doc_id) AS rk,
            count(*) OVER (PARTITION BY cluster_id) AS n FROM sc)
          SELECT cluster_id, doc_id AS keep_doc_id, n::BIGINT AS n_docs,
            score AS keep_score
          FROM r WHERE rk = 1 ORDER BY cluster_id"""
      }),

    // PageRank over the MinHash candidate graph (template-hub triage):
    // 10 synchronous rounds unrolled as chained CTEs — the exact
    // recurrence both engines compute; 6 dp absorbs FP sum order
    QueryDef("dedup_pagerank",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.pagerankFromPairs(docs,
          Dedup.minhashCandidatePairs(docs, 3, 8, 4)
            .select(col("doc_a"), col("doc_b")))
      },
      Some {
        val iters = (1 to 10).map { i =>
          s"""pr$i AS (SELECT d.doc_id,
              0.15 / nn.n + 0.85 * coalesce(
                (SELECT sum(p.r / dg.deg) FROM sym e
                  JOIN pr${i - 1} p ON p.doc_id = e.src
                  JOIN deg dg ON dg.doc_id = e.src
                  WHERE e.dst = d.doc_id), 0) AS r
            FROM documents d CROSS JOIN nn)"""
        }.mkString(",\n")
        s"""WITH $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION ALL SELECT doc_b, doc_a FROM cand),
          deg AS MATERIALIZED (SELECT src AS doc_id, count(*)::BIGINT AS deg FROM sym
            GROUP BY src),
          nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM documents),
          pr0 AS (SELECT doc_id, 1.0 / nn.n AS r FROM documents
            CROSS JOIN nn),
          $iters
          SELECT p.doc_id, round(p.r * nn.n, 6) AS rank_norm
          FROM pr10 p CROSS JOIN nn ORDER BY p.doc_id"""
      }, bench = true),

    // near-dup decontamination (removal form): MinHash band collision
    // vs the eval slice at agreement >= 4/8, anti-joined away — the
    // rewritten-leak complement of exact k-gram decontaminate
    QueryDef("corpus_decontaminate_neardup",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.decontaminateNearDup(docs.filter(col("doc_id") % 41 =!= 0),
          docs.filter(col("doc_id") % 41 === 0), 3, 8, 4, 0.5)
      },
      Some {
        s"""WITH adocs AS (SELECT * FROM documents WHERE doc_id % 41 <> 0),
          bdocs AS (SELECT * FROM documents WHERE doc_id % 41 = 0),
          ${minhashBandsCtesFor("", "a", "adocs")},
          ${minhashBandsCtesFor("", "b", "bdocs")},
          bad AS (SELECT DISTINCT a.doc_id FROM abands a JOIN bbands b
              ON a.key = b.key AND a.band = b.band
            WHERE a.key IS NOT NULL
              AND list_sum(list_transform(list_zip(a.sig, b.sig),
                p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) >= 4)
          SELECT doc_id, lang, source FROM adocs
          WHERE doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id"""
      }, bench = true),

    // LSH banding S-curve advisor: pure model arithmetic, identical
    // literals in both engines (round-trip doubles), rounded pow
    QueryDef("dedup_lsh_tuning",
      (s, d) => Dedup.lshTuningTable(s, 8,
        Seq(0.3, 0.5, 0.7, 0.8, 0.9)),
      Some("""WITH rb AS (
          SELECT 1::BIGINT AS rows_per_band, 8::BIGINT AS n_bands
          UNION ALL SELECT 2, 4 UNION ALL SELECT 4, 2 UNION ALL SELECT 8, 1),
        js AS (SELECT unnest([0.3, 0.5, 0.7, 0.8, 0.9]::DOUBLE[]) AS jaccard)
        SELECT rows_per_band, n_bands,
          round(power(1.0 / n_bands, 1.0 / rows_per_band), 4) AS threshold_est,
          jaccard,
          round(1.0 - power(1.0 - power(jaccard, rows_per_band), n_bands), 6)
            AS p_candidate
        FROM rb CROSS JOIN js
        ORDER BY rows_per_band, jaccard"""),
      bench = false),

    // cluster-size histogram over the near-dup labeling: the dedup
    // yield report (keep-one removal volume) — same recursive CTE as
    // dedup_clusters, then two groupBys
    QueryDef("dedup_cluster_sizes",
      (s, d) => Dedup.clusterSizeReport(
        Dedup.duplicateClusters(t(s, d, "documents"), 3, 8, 4)),
      Some {
        s"""WITH RECURSIVE $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
          cl AS (SELECT d.doc_id,
              least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN
              (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
              ON m.src = d.doc_id),
          sz AS (SELECT cluster_id, count(*)::BIGINT AS s FROM cl
            GROUP BY cluster_id)
          SELECT s AS cluster_size, count(*)::BIGINT AS n_clusters,
            (s * count(*))::BIGINT AS n_docs,
            ((s - 1) * count(*))::BIGINT AS n_removable
          FROM sz GROUP BY s ORDER BY cluster_size"""
      }),

    // soft dedup: 1/cluster_size weights over the same recursive-CTE
    // cluster labeling — keep-all-with-weights instead of removal
    QueryDef("dedup_soft_weights",
      (s, d) => Dedup.softDedupWeights(
        Dedup.duplicateClusters(t(s, d, "documents"), 3, 8, 4)),
      Some {
        s"""WITH RECURSIVE $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
          cl AS (SELECT d.doc_id,
              least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN
              (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
              ON m.src = d.doc_id),
          sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
            FROM cl GROUP BY cluster_id)
          SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
            round(1.0 / sz.cluster_size, 6) AS weight
          FROM cl JOIN sz USING (cluster_id) ORDER BY doc_id"""
      }, bench = true),

    // LSH-then-verify: MinHash band candidates → exact Jaccard ≥ 0.8.
    // The oracle mirrors the full pipeline including the band join, so
    // the bucketed (100 TB-shape) path is exactly what gets verified.
    QueryDef("dedup_jaccard_pairs",
      (s, d) => Dedup.jaccardPairs(t(s, d, "documents"), 3, 8, 4, 0.8),
      Some {
        s"""WITH $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          toks AS MATERIALIZED (SELECT doc_id,
            list_distinct(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS toks FROM documents),
          j AS (SELECT doc_a, doc_b,
            CAST(len(list_filter(ta.toks, t -> list_contains(tb.toks, t))) AS DOUBLE) /
              (len(ta.toks) + len(tb.toks) -
               len(list_filter(ta.toks, t -> list_contains(tb.toks, t)))) AS jac
            FROM cand JOIN toks ta ON ta.doc_id = doc_a JOIN toks tb ON tb.doc_id = doc_b)
          SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
          WHERE jac >= 0.8 ORDER BY doc_a, doc_b"""
      }, bench = true),

    // prefix-filter EXACT Jaccard join (AllPairs/PPJoin family): the
    // oracle brute-forces ALL pairs — a match proves the prefix
    // filter's no-false-negative guarantee, not just plan agreement
    QueryDef("dedup_prefix_jaccard",
      (s, d) => Dedup.prefixJaccardPairs(t(s, d, "documents"), 3, 0.5),
      Some("""WITH w AS (SELECT doc_id,
            regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS w
          FROM documents WHERE text IS NOT NULL),
        sh AS MATERIALIZED (SELECT doc_id,
            list_distinct([array_to_string(w[i:i+2], ' ')
              FOR i IN range(1, len(w) - 1)]) AS ts
          FROM w WHERE len(w) >= 3),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_filter(a.ts, x -> list_contains(b.ts, x)))::BIGINT AS inter,
            len(a.ts)::BIGINT AS na, len(b.ts)::BIGINT AS nb
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, inter AS n_shared,
          round(inter::DOUBLE / (na + nb - inter), 4) AS jaccard
        FROM p WHERE inter::DOUBLE / (na + nb - inter) >= 0.5
        ORDER BY doc_a, doc_b"""),
      bench = true),

    // ExactSubstr-family repeated spans: 3-gram hits with df > 2 merged
    // gaps-and-islands into maximal per-doc spans (token offsets)
    QueryDef("dedup_repeated_spans",
      (s, d) => Dedup.repeatedSpans(t(s, d, "documents"), 3, 2),
      Some {
        s"""WITH $repeatedSpansCte
          SELECT doc_id, span_start, span_end, n_grams
          FROM spans ORDER BY doc_id, span_start"""
      }, bench = true),

    // the removal half: token-rebuilt text with every spanned range cut
    // (the oracle rebuilds via explode + range anti-join; the engine
    // side is a narrow higher-order filter — same semantics)
    QueryDef("dedup_cut_spans",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.cutRepeatedSpans(docs, Dedup.repeatedSpans(docs, 3, 2))
      },
      Some {
        s"""WITH $repeatedSpansCte,
          toks2 AS (SELECT doc_id, unnest(w) AS tok,
            unnest(range(0, len(w))) AS pos FROM toksw),
          keep AS (SELECT t.doc_id, t.tok, t.pos FROM toks2 t
            WHERE NOT EXISTS (SELECT 1 FROM spans s
              WHERE s.doc_id = t.doc_id
                AND t.pos >= s.span_start AND t.pos < s.span_end)),
          agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_cut,
            count(*)::BIGINT AS n_kept FROM keep GROUP BY doc_id)
          SELECT d.doc_id, coalesce(a.text_cut, '') AS text_cut,
            (len($toksSql) - coalesce(a.n_kept, 0))::BIGINT AS n_tokens_removed
          FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
          ORDER BY d.doc_id"""
      }),

    // SRP-bucketed near-dup: pairs only within a shared LSH bucket, then
    // exact cosine ≥ threshold; oracle mirrors the bucket assignment.
    QueryDef("dedup_embedding_cosine",
      (s, d) => Dedup.embeddingNearDupPairs(t(s, d, "embeddings"), 4, 0.35),
      Some {
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
          b AS (SELECT vec_id, vec, ${srpBucketSql(4)} AS bucket FROM v)
          SELECT id_a, id_b, round(cos, 4) AS cosine FROM (
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
              list_sum(list_transform(list_zip(a.vec, b2.vec), p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(a.vec, x -> x * x))) *
               sqrt(list_sum(list_transform(b2.vec, x -> x * x)))) AS cos
            FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
          WHERE cos >= 0.35 ORDER BY id_a, id_b"""
      }, bench = true),

    // hard-negative mining: top-k most-similar DIFFERENT-label
    // neighbors per query (contrastive-training negatives) — the label
    // exclusion lives in the broadcast-join predicate, top-k in the
    // graft_topk_tag heap
    QueryDef("sim_hard_negatives",
      (s, d) => Similarity.hardNegatives(t(s, d, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10),
      Some("""WITH v AS MATERIALIZED (SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
        q AS MATERIALIZED (SELECT vec_id AS qid, vec AS qvec, label AS qlabel FROM v WHERE vec_id < 5),
        sc AS (SELECT q.qid, v.vec_id, v.label,
          list_sum(list_transform(list_zip(q.qvec, v.vec), p -> p[1] * p[2])) /
          (sqrt(list_sum(list_transform(q.qvec, x -> x * x))) *
           sqrt(list_sum(list_transform(v.vec, x -> x * x)))) AS cos
          FROM q, v WHERE v.vec_id <> q.qid AND v.label <> q.qlabel)
        SELECT qid AS query_id, vec_id, label, cosine, rk FROM (
          SELECT qid, vec_id, label, round(cos, 4) AS cosine,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM sc)
        WHERE rk <= 10 ORDER BY query_id, rk""")),

    // SemDeDup: within-cluster (label cell) exact-cosine pruning with
    // the deterministic earlier-id keeper. Exact pairs inside cells
    // only — the oracle self-joins on label and precomputes norms once
    QueryDef("dedup_semantic",
      (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), 0.3),
      Some {
        s"""WITH v AS MATERIALIZED (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
          n AS MATERIALIZED (SELECT vec_id, label, vec,
            sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm FROM v),
          dups AS (SELECT b.vec_id, count(*)::BIGINT AS n_earlier_dups
            FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]))
              / (a.nrm * b.nrm) >= 0.3
            GROUP BY b.vec_id)
          SELECT v.vec_id, v.label::BIGINT AS label,
            coalesce(d.n_earlier_dups, 0)::BIGINT AS n_earlier_dups,
            coalesce(d.n_earlier_dups, 0) = 0 AS is_kept
          FROM v LEFT JOIN dups d USING (vec_id) ORDER BY vec_id"""
      }, bench = true),

    QueryDef("dedup_minhash_pairs",
      (s, d) => Dedup.minhashCandidatePairs(t(s, d, "documents"), 3, 8, 4),
      Some {
        // full LSH pipeline mirrored in SQL: signatures → 2 bands of 4
        // slots → band-key self-join → distinct pairs w/ agreement
        s"""WITH $minhashBandsCtes
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 8 AS sig_agreement
          FROM bands a JOIN bands b
            ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
          WHERE a.key IS NOT NULL
          ORDER BY doc_a, doc_b"""
      }, bench = true),

    // triangle enumeration on the near-dup graph (degree-ordered wedge
    // join — see Dedup.triangles): the minhash pair graph is sparse at
    // these SFs, so a deterministic ring fixture (i,i+1)+(i,i+2) over
    // the first 30 ids is unioned in (the forged-fixture pattern) to
    // exercise the operator on known dense structure; the oracle's
    // naive a<b<c 3-way join is plan-free of the degree ordering —
    // orientation changes the JOIN SHAPE, never the triangle set
    QueryDef("dedup_triangles",
      (s, d) => {
        val pairs = Dedup.minhashCandidatePairs(t(s, d, "documents"), 3, 8, 4)
          .select(col("doc_a"), col("doc_b"))
        val ring = s.range(29)
            .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
          .unionAll(s.range(28)
            .select(col("id").as("doc_a"), (col("id") + 2).as("doc_b")))
        Dedup.triangles(pairs.unionAll(ring))
      },
      Some {
        s"""WITH $minhashBandsCtes,
          mh AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          ring AS (SELECT i AS doc_a, i + 1 AS doc_b FROM range(29) t(i)
            UNION ALL SELECT i, i + 2 FROM range(28) t(i)),
          e AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM
            (SELECT * FROM mh UNION ALL SELECT * FROM ring))
          SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b, e2.doc_b AS doc_c
          FROM e e1 JOIN e e2 ON e1.doc_b = e2.doc_a
            JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
          ORDER BY doc_a, doc_b, doc_c"""
      }, bench = true),

    // k-core extraction (iterative peel, 24 pinned rounds — the
    // dedup_pagerank fixed-round pattern; fixture fixpoint is 16, spec
    // asserts convergence): minhash pairs + the ring (which cascades
    // away entirely at k=3 — every peel exposes the next node) + a
    // forged K5 at ids 40–44 (the dense family that SURVIVES)
    QueryDef("dedup_kcore",
      (s, d) => {
        val pairs = Dedup.minhashCandidatePairs(t(s, d, "documents"), 3, 8, 4)
          .select(col("doc_a"), col("doc_b"))
        val ring = s.range(29)
            .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
          .unionAll(s.range(28)
            .select(col("id").as("doc_a"), (col("id") + 2).as("doc_b")))
        import s.implicits._
        val k5 = (for { a <- 40L to 44L; b <- (a + 1) to 44L } yield (a, b))
          .toDF("doc_a", "doc_b")
        Dedup.kCore(pairs.unionAll(ring).unionAll(k5), k = 3, rounds = 24)
      },
      Some {
        // every e_r is referenced THREE times by round r+1 — without
        // MATERIALIZED, DuckDB's CTE inlining expands the chain ~3^24
        // (observed as a file-handle explosion on the parquet scan)
        val rounds = 24
        val iters = (1 to rounds).map { r =>
          s"""deg$r AS MATERIALIZED (SELECT v, count(*) AS d FROM
              (SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
              GROUP BY v),
            keep$r AS (SELECT v FROM deg$r WHERE d >= 3),
            e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
              JOIN keep$r ka ON ka.v = e.a JOIN keep$r kb ON kb.v = e.b)"""
        }.mkString(",\n")
        s"""WITH $minhashBandsCtes,
          mh AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          ring AS (SELECT i AS doc_a, i + 1 AS doc_b FROM range(29) t(i)
            UNION ALL SELECT i, i + 2 FROM range(28) t(i)),
          k5 AS (SELECT a.i AS doc_a, b.i AS doc_b
            FROM range(40, 45) a(i), range(40, 45) b(i) WHERE a.i < b.i),
          e0 AS MATERIALIZED (SELECT DISTINCT doc_a AS a, doc_b AS b FROM
            (SELECT * FROM mh UNION ALL SELECT * FROM ring
             UNION ALL SELECT * FROM k5)),
          $iters
          SELECT v AS doc_id, count(*)::BIGINT AS core_degree FROM
            (SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds)
          GROUP BY v ORDER BY doc_id"""
      }, bench = true),

    // cross-corpus near-dup audit: corpus A = documents, corpus B =
    // every 5th doc re-keyed +1,000,000 with UNCHANGED text — each B
    // doc must band-collide with its A original (plus any A near-dups
    // of it); the oracle instantiates the full MinHash CTE stack twice
    QueryDef("corpus_cross_pairs",
      (s, d) => {
        val docs = t(s, d, "documents")
        val b = docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        Dedup.crossCorpusPairs(docs, b, 3, 8, 4)
      },
      Some {
        s"""WITH bdocs AS (SELECT doc_id + 1000000 AS doc_id, text
            FROM documents WHERE doc_id % 5 = 0),
          ${minhashBandsCtesFor("", "a")},
          ${minhashBandsCtesFor("", "b", "bdocs")}
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 8 AS sig_agreement
          FROM abands a JOIN bbands b
            ON a.key = b.key AND a.band = b.band
          WHERE a.key IS NOT NULL
          ORDER BY doc_a, doc_b"""
      }, bench = true))

  // ---------------- similarity search ---------------------------------

  private val similarity = Seq(
    QueryDef("sim_cosine_topk",
      (s, d) => Similarity.bruteForceTopK(t(s, d, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10),
      Some("""WITH v AS MATERIALIZED (SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
        q AS MATERIALIZED (SELECT vec_id AS qid, vec AS qvec FROM v WHERE vec_id < 5),
        sc AS (SELECT q.qid, v.vec_id, v.label,
          list_sum(list_transform(list_zip(q.qvec, v.vec), p -> p[1] * p[2])) /
          (sqrt(list_sum(list_transform(q.qvec, x -> x * x))) *
           sqrt(list_sum(list_transform(v.vec, x -> x * x)))) AS cos
          FROM q, v WHERE v.vec_id <> q.qid)
        SELECT qid AS query_id, vec_id, label, cosine, rk FROM (
          SELECT qid, vec_id, label, round(cos, 4) AS cosine,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM sc)
        WHERE rk <= 10 ORDER BY query_id, rk"""), bench = true),

    // Matryoshka-style prefix truncation: exact cosine top-k over the
    // first 32 of 64 dims — half the scan IO; ranking over the
    // truncated vectors oracled exactly (the synthetic embeddings are
    // unstructured, so recall-vs-full is not the contract here)
    QueryDef("sim_truncated_topk",
      (s, d) => Similarity.truncatedTopK(
        Similarity.truncateEmbeddings(t(s, d, "embeddings"), 32),
        Seq(0L, 1L, 2L, 3L, 4L), 10),
      Some("""WITH v AS MATERIALIZED (SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE))[1:32] AS vec FROM embeddings WHERE embedding IS NOT NULL),
        q AS MATERIALIZED (SELECT vec_id AS qid, vec AS qvec FROM v WHERE vec_id < 5),
        sc AS (SELECT q.qid, v.vec_id, v.label,
          list_sum(list_transform(list_zip(q.qvec, v.vec), p -> p[1] * p[2])) /
          (sqrt(list_sum(list_transform(q.qvec, x -> x * x))) *
           sqrt(list_sum(list_transform(v.vec, x -> x * x)))) AS cos
          FROM q, v WHERE v.vec_id <> q.qid)
        SELECT qid AS query_id, vec_id, label, cosine, rk FROM (
          SELECT qid, vec_id, label, round(cos, 4) AS cosine,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM sc)
        WHERE rk <= 10 ORDER BY query_id, rk""")),

    QueryDef("sim_lsh_topk",
      (s, d) => Similarity.lshTopK(t(s, d, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10, 4),
      Some {
        // mirror srpBucket (see srpBucketSql): dimension derived from
        // the row (len(vec)), matching the Scala side's dim discovery
        s"""WITH v AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings WHERE embedding IS NOT NULL),
          b AS (SELECT vec_id, vec, ${srpBucketSql(4)} AS bucket FROM v),
          q AS MATERIALIZED (SELECT vec_id AS query_id, vec AS qvec, bucket FROM b WHERE vec_id < 5),
          sc AS (SELECT q.query_id, b.vec_id,
            list_sum(list_transform(list_zip(q.qvec, b.vec), p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform(q.qvec, x -> x * x))) *
             sqrt(list_sum(list_transform(b.vec, x -> x * x)))) AS cos
            FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.query_id)
          SELECT query_id, vec_id, cosine, rk FROM (
            SELECT query_id, vec_id, round(cos, 4) AS cosine,
              row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM sc)
          WHERE rk <= 10 ORDER BY query_id, rk"""
      }, bench = true),

    QueryDef("sim_ivf_topk",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        // the oracle's centroid SQL is generated for dim=64; fail loudly
        // if the dataset ever changes shape instead of mismatching
        // subtly (one dim-discovery job, reused by the query)
        val dim = Similarity.embeddingDim(emb)
        require(dim == 64, s"sim_ivf_topk oracle assumes dim=64, data has $dim")
        Similarity.ivfTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 10, 3, Some(dim))
      },
      Some {
        val dim = 64
        val centroid = (1 to dim).map(i => s"sum(vec[$i]) / count(*)").mkString("[", ", ", "]")
        def cosList(a: String, b: String) =
          s"""list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
             (sqrt(list_sum(list_transform($a, x -> x * x))) *
              sqrt(list_sum(list_transform($b, x -> x * x))))"""
        s"""WITH v AS MATERIALIZED (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
          cent AS (SELECT label, $centroid AS c FROM v GROUP BY label),
          q AS MATERIALIZED (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < 5),
          cells AS (SELECT query_id, qvec, label FROM (
            SELECT q.query_id, q.qvec, cent.label,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY ${cosList("q.qvec", "cent.c")} DESC, cent.label) AS cr
            FROM q, cent) WHERE cr <= 3),
          sc AS (SELECT cells.query_id, v.vec_id, v.label,
            ${cosList("cells.qvec", "v.vec")} AS cos
            FROM cells JOIN v ON v.label = cells.label AND v.vec_id <> cells.query_id)
          SELECT query_id, vec_id, label, cosine, rk FROM (
            SELECT query_id, vec_id, label, round(cos, 4) AS cosine,
              row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
            FROM sc)
          WHERE rk <= 10 ORDER BY query_id, rk"""
      }, bench = true),

    QueryDef("sim_label_centroids",
      (s, d) => Similarity.labelCentroidNorms(t(s, d, "embeddings")),
      Some {
        val dim = 64
        val sums = (1 to dim).map(i => s"sum(vec[$i]) AS s$i").mkString(", ")
        val sq = (1 to dim).map(i => s"(s$i / n) * (s$i / n)").mkString(" + ")
        s"""WITH v AS MATERIALIZED (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings
            WHERE embedding IS NOT NULL AND label IS NOT NULL),
          agg AS (SELECT label, count(*) AS n, $sums FROM v GROUP BY label)
          SELECT label, n, round(sqrt($sq), 4) AS centroid_norm
          FROM agg ORDER BY label"""
      }),

    // Unlabeled IVF: Lloyd's k-means quantizer (deterministic md5-order
    // seeds, 4 rounds) + nearest-centroid cell assignment in-plan.
    // Tolerance-boolean oracle (the sketch pattern): Spark computes
    // recall@10 of the kmeans-IVF search (4 of 8 cells probed) against
    // brute force and asserts >= 0.4 per query (measured min across
    // sf0.001/0.01/0.1 is 0.5 — the slack absorbs float-sum ordering
    // in the distributed centroid aggregate); DuckDB reproduces the
    // query list and the TRUE flags — a recall regression
    // hash-mismatches.
    QueryDef("sim_kmeans_recall",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val qids = Seq(0L, 1L, 2L, 3L, 4L)
        val cells = Similarity.kmeansCentroids(emb, 8, 4)
        val ivf = Similarity.ivfTopKByCells(emb, cells, qids, 10, 4)
          .select(col("query_id"), col("vec_id"))
        val exact = Similarity.bruteForceTopK(emb, qids, 10)
          .select(col("query_id"), col("vec_id"))
        val overlap = exact.join(ivf, Seq("query_id", "vec_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        import s.implicits._
        // query universe = the qids that EXIST with a non-null
        // embedding (the sim null-contract): a null-embedding query is
        // not searchable and appears on neither side
        emb.filter(col("vec_id").isInCollection(qids) && col("embedding").isNotNull)
          .select(col("vec_id").as("query_id"))
          .join(overlap, Seq("query_id"), "left")
          .select(col("query_id"), lit(10L).as("k"),
            (coalesce(col("hits"), lit(0L)) >= 4).as("recall_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
        TRUE AS recall_ok FROM embeddings
        WHERE vec_id < 5 AND embedding IS NOT NULL
        ORDER BY query_id"""), bench = true),

    // int8 scalar quantization: exact search over the 4×-smaller
    // quantized corpus must preserve the full-precision top-10 almost
    // perfectly — recall@10 >= 0.8 per query (measured min 0.9 across
    // the three SFs; the slack absorbs rank flips between near-tied
    // neighbors).
    // Tolerance-boolean oracle like the sketches.
    QueryDef("sim_quantized_recall",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val qids = Seq(0L, 1L, 2L, 3L, 4L)
        val quant = Similarity.quantizedTopK(
          Similarity.quantizeEmbeddings(emb), qids, 10)
          .select(col("query_id"), col("vec_id"))
        val exact = Similarity.bruteForceTopK(emb, qids, 10)
          .select(col("query_id"), col("vec_id"))
        val overlap = exact.join(quant, Seq("query_id", "vec_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        import s.implicits._
        // query universe = the qids that EXIST with a non-null
        // embedding (the sim null-contract): a null-embedding query is
        // not searchable and appears on neither side
        emb.filter(col("vec_id").isInCollection(qids) && col("embedding").isNotNull)
          .select(col("vec_id").as("query_id"))
          .join(overlap, Seq("query_id"), "left")
          .select(col("query_id"), lit(10L).as("k"),
            (coalesce(col("hits"), lit(0L)) >= 8).as("recall_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
        TRUE AS recall_ok FROM embeddings
        WHERE vec_id < 5 AND embedding IS NOT NULL
        ORDER BY query_id""")),

    // PCA at k=32 of 64 dims: ONE covariance scan (mapPartitions
    // partials, driver Jacobi eigensolve), then narrow projection.
    // Tolerance surface (the sketch pattern): per-label mean/min
    // cosine(vec, reconstruction) over the ACTUAL projections
    // (measured ≥ 0.75 / ≥ 0.49 across SFs; thresholds 0.7 / 0.4) and
    // the PCA-optimality floor var_explained ≥ k/dim (measured
    // 0.57–0.65); exactness is spec-pinned on rank-3 synthetic data
    QueryDef("sim_pca_recon",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dim = Similarity.embeddingDim(emb)
        val full = Similarity.pcaTrain(emb, dim)
        val ev = full.filter(col("component") >= 0)
          .agg(sum("eigenvalue").as("tr"),
            sum(when(col("component") < 32, col("eigenvalue"))
              .otherwise(0.0)).as("top")).head()
        val varOk = ev.getDouble(1) / ev.getDouble(0) >= 32.0 / dim
        Similarity.pcaReconstructionStats(emb,
            full.filter(col("component") < 32))
          .select(col("label"), col("n").cast("long").as("n"),
            (col("mean_cos") >= 0.7 && col("min_cos") >= 0.4 &&
              lit(varOk)).as("pca_ok"))
          .orderBy("label")
      },
      Some("""SELECT label, count(*)::BIGINT AS n, TRUE AS pca_ok
        FROM embeddings WHERE embedding IS NOT NULL
        GROUP BY label ORDER BY label NULLS FIRST"""),
      bench = true),

    // 1-bit (sign) quantization + Hamming top-10: the 32×-smaller
    // extreme of the quantization ladder. Unlike the lossy-recall
    // tolerance surfaces, this admits a FULL exact oracle: both
    // engines apply the same strict `> 0` sign test — Spark to packed
    // longs (XOR+popcount), DuckDB to the raw floats (sign-disagree
    // count) — and the distance is an integer with a deterministic
    // vec_id tiebreak, so the ranked rows hash-match exactly
    QueryDef("sim_binary_hamming_topk",
      (s, d) => Similarity.hammingTopK(t(s, d, "embeddings"),
        Seq(0L, 1L, 2L, 3L, 4L), 10),
      Some("""WITH q AS MATERIALIZED (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL),
        dist AS (SELECT q.query_id, e.vec_id,
            CAST(list_sum(list_transform(list_zip(e.embedding, q.qv),
              p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END))
              AS BIGINT) AS hamming
          FROM embeddings e, q
          WHERE e.vec_id <> q.query_id AND e.embedding IS NOT NULL)
        SELECT query_id, vec_id, hamming, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY hamming, vec_id) AS BIGINT) AS rk
          FROM dist) WHERE rk <= 10
        ORDER BY query_id, rk"""),
      bench = true),

    // product quantization: 16 one-byte codes per 64-dim vector (16×
    // smaller corpus scan). Top-k recall over UNSTRUCTURED random
    // embeddings is poor by construction (the truncated_topk caveat),
    // so the oracled surface is the stable invariant: per-label mean
    // cosine(vec, reconstruction) >= 0.8 AND min >= 0.7 (measured
    // ~0.86/~0.78 across the three SFs; exact-recovery search
    // semantics are spec-pinned on structured vectors)
    QueryDef("sim_pq_recon",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cb = Similarity.pqTrain(emb, m = 16, ksub = 32, rounds = 3)
        Similarity.pqReconstructionStats(emb, Similarity.pqEncode(emb, cb), cb)
          .select(col("label"), col("n").cast("long").as("n"),
            (col("mean_cos") >= 0.8 && col("min_cos") >= 0.7).as("recon_ok"))
          .orderBy("label")
      },
      Some("""SELECT label, count(*)::BIGINT AS n, TRUE AS recon_ok
        FROM embeddings WHERE embedding IS NOT NULL
        GROUP BY label ORDER BY label NULLS FIRST""")),

    // IVF-PQ (coarse cells + residual PQ): same tolerance surface as
    // sim_pq_recon; the residual-beats-plain-PQ margin is spec-pinned
    QueryDef("sim_ivfpq_recon",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val (cc, cb, codes) =
          Similarity.ivfPqIndex(emb, nCells = 8, m = 16, ksub = 32, rounds = 3)
        Similarity.ivfPqReconstructionStats(emb, cc, cb, codes)
          .select(col("label"), col("n").cast("long").as("n"),
            (col("mean_cos") >= 0.8 && col("min_cos") >= 0.7).as("recon_ok"))
          .orderBy("label")
      },
      Some("""SELECT label, count(*)::BIGINT AS n, TRUE AS recon_ok
        FROM embeddings WHERE embedding IS NOT NULL
        GROUP BY label ORDER BY label NULLS FIRST""")),

    // IVF-PQ SEARCH (the round-6 probe-first plan fix in one benched
    // query): index + ADC top-10 at nProbe=4 vs brute-force exact.
    // Raw recall@10 on unstructured random embeddings is too unstable
    // to oracle (measured 1–7 hits across SFs), so the oracled surface
    // is the selection-quality invariant that IS stable: the mean TRUE
    // cosine of the ADC-selected 10 must sit within 0.15 of the exact
    // top-10's mean and clear 0.15 absolutely (random-pick baseline is
    // ~0.0 ± 0.04; measured gap ≤ 0.078, floor ≥ 0.234 across SFs)
    QueryDef("sim_ivfpq_topk",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val (cc, cb, codes) =
          Similarity.ivfPqIndex(emb, nCells = 8, m = 16, ksub = 32, rounds = 3)
        ivfPqSelectionSurface(s, emb, cc, cb, codes)
      },
      Some(ivfPqSelectionOracle),
      bench = true),

    // IVF-PQ SEARCH ONLY — the serve path, measured without training:
    // the index is persisted ONCE per JVM (writeIvfPq to a temp dir,
    // memoized; ivfPqIndex is deterministic so any build is THE build)
    // and the query reads the three tables back — under the bench's
    // min-of-N protocol round 1 pays the build, later rounds measure
    // the pure probe-first ADC search. Same selection-quality surface
    // and oracle as sim_ivfpq_topk (which stays benched as the
    // train+search row, keeping train cost visible).
    QueryDef("sim_ivfpq_search",
      (s, d) => {
        val dir = ivfPqIndexDir(s, d)
        ivfPqSelectionSurface(s, t(s, d, "embeddings"),
          s.read.parquet(s"$dir/cells"), s.read.parquet(s"$dir/codebook"),
          s.read.parquet(s"$dir/codes"))
      },
      Some(ivfPqSelectionOracle),
      bench = true),

    // MMR diversified re-ranking: k=3 from a 10-candidate pool at
    // lambda=0.7 — the oracle hand-unrolls the three sequential argmax
    // steps (recursion-free); (1 - 0.7) is written as the SUBTRACTION
    // in both engines so the IEEE constant is bit-identical
    // k-center greedy diversity sampling: deterministic md5-coin pool,
    // hand-unrolled 3 greedy steps + seed (the mmr oracle pattern);
    // argmin over the UNROUNDED max-cos (proven IEEE-identical by the
    // mmr cos form); zero vectors excluded from the pool on both sides
    QueryDef("sim_kcenter_sample",
      (s, d) => Similarity.kcenterSample(t(s, d, "embeddings"), 4, 12),
      Some {
        def cos(a: String, b: String) =
          s"""(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform($a, x -> x * x))) *
             sqrt(list_sum(list_transform($b, x -> x * x)))))"""
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings WHERE embedding IS NOT NULL
              AND list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * x)) > 0),
          pool AS MATERIALIZED (SELECT vec_id, vec FROM (SELECT vec_id, vec,
              row_number() OVER (ORDER BY ('0x' || substr(
                md5('kc:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                vec_id) AS rk
            FROM v) WHERE rk <= 12),
          p1 AS MATERIALIZED (SELECT vec_id, vec FROM pool
            ORDER BY vec_id LIMIT 1),
          s2 AS (SELECT c.vec_id, c.vec, ${cos("c.vec", "p1.vec")} AS m
            FROM pool c JOIN p1 ON c.vec_id <> p1.vec_id),
          p2 AS MATERIALIZED (SELECT vec_id, vec, m FROM (SELECT *,
              row_number() OVER (ORDER BY m, vec_id) AS r FROM s2)
            WHERE r = 1),
          s3 AS (SELECT c.vec_id, c.vec,
              greatest(${cos("c.vec", "p1.vec")},
                ${cos("c.vec", "p2.vec")}) AS m
            FROM pool c JOIN p1 ON true JOIN p2 ON true
            WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id),
          p3 AS MATERIALIZED (SELECT vec_id, vec, m FROM (SELECT *,
              row_number() OVER (ORDER BY m, vec_id) AS r FROM s3)
            WHERE r = 1),
          s4 AS (SELECT c.vec_id,
              greatest(${cos("c.vec", "p1.vec")}, ${cos("c.vec", "p2.vec")},
                ${cos("c.vec", "p3.vec")}) AS m
            FROM pool c JOIN p1 ON true JOIN p2 ON true JOIN p3 ON true
            WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id
              AND c.vec_id <> p3.vec_id),
          p4 AS (SELECT vec_id, m FROM (SELECT *,
              row_number() OVER (ORDER BY m, vec_id) AS r FROM s4)
            WHERE r = 1)
          SELECT CAST(1 AS BIGINT) AS rank, vec_id,
            CAST(NULL AS DOUBLE) AS max_cos FROM p1
          UNION ALL SELECT 2, vec_id, round(m, 4) FROM p2
          UNION ALL SELECT 3, vec_id, round(m, 4) FROM p3
          UNION ALL SELECT 4, vec_id, round(m, 4) FROM p4
          ORDER BY rank"""
      }, bench = true),

    QueryDef("sim_mmr_rerank",
      (s, d) => Similarity.mmrRerank(t(s, d, "embeddings"),
        Seq(0L, 1L, 2L, 3L, 4L), 3, 10, 0.7),
      Some {
        def cos(a: String, b: String) =
          s"""(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform($a, x -> x * x))) *
             sqrt(list_sum(list_transform($b, x -> x * x)))))"""
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings WHERE embedding IS NOT NULL),
          q AS MATERIALIZED (SELECT vec_id AS qid, vec AS qvec FROM v WHERE vec_id < 5),
          sc AS (SELECT q.qid, v.vec_id, v.vec, ${cos("q.qvec", "v.vec")} AS rel
            FROM q, v WHERE v.vec_id <> q.qid),
          cand AS MATERIALIZED (SELECT qid, vec_id, vec, rel FROM (SELECT *,
              row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rk
            FROM sc) WHERE rk <= 10),
          p1 AS MATERIALIZED (SELECT qid, vec_id, vec, rel FROM (SELECT *,
              row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS r
            FROM cand) WHERE r = 1),
          s2 AS (SELECT c.qid, c.vec_id, c.vec, c.rel,
              0.7 * c.rel - (1 - 0.7) * ${cos("c.vec", "p1.vec")} AS mmr
            FROM cand c JOIN p1 ON c.qid = p1.qid AND c.vec_id <> p1.vec_id),
          p2 AS (SELECT qid, vec_id, vec, mmr FROM (SELECT *,
              row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS r
            FROM s2) WHERE r = 1),
          s3 AS (SELECT c.qid, c.vec_id,
              0.7 * c.rel - (1 - 0.7) * greatest(${cos("c.vec", "p1.vec")},
                ${cos("c.vec", "p2.vec")}) AS mmr
            FROM cand c JOIN p1 ON c.qid = p1.qid JOIN p2 ON c.qid = p2.qid
            WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id),
          p3 AS (SELECT qid, vec_id, mmr FROM (SELECT *,
              row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, vec_id) AS r
            FROM s3) WHERE r = 1)
          SELECT qid AS query_id, 1::BIGINT AS rank, vec_id,
            round(rel, 4) AS mmr_score FROM p1
          UNION ALL SELECT qid, 2::BIGINT, vec_id, round(mmr, 4) FROM p2
          UNION ALL SELECT qid, 3::BIGINT, vec_id, round(mmr, 4) FROM p3
          ORDER BY query_id, rank"""
      }, bench = true),

    // centroid-distance outlier audit: bottom 5% per label by ROUNDED
    // cosine to the label centroid (rank over the rounded score +
    // vec_id tiebreak; the cutoff is the exact integer test
    // rank*1000 <= n*50 — no float threshold anywhere)
    QueryDef("sim_centroid_outliers",
      (s, d) => Similarity.centroidOutliers(t(s, d, "embeddings"), 50),
      Some {
        def cos(a: String, b: String) =
          s"""(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform($a, x -> x * x))) *
             sqrt(list_sum(list_transform($b, x -> x * x)))))"""
        s"""WITH e AS MATERIALIZED (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
            FROM embeddings
            WHERE embedding IS NOT NULL AND label IS NOT NULL),
          u AS (SELECT label, unnest(vec) AS val,
            unnest(range(1, len(vec) + 1)) AS dim FROM e),
          c AS MATERIALIZED (SELECT label, dim, avg(val) AS cv FROM u GROUP BY label, dim),
          cent AS (SELECT label, list(cv ORDER BY dim) AS cvec FROM c GROUP BY label),
          sc AS (SELECT e.vec_id, e.label,
            round(${cos("e.vec", "cent.cvec")}, 4) AS cos_centroid
            FROM e JOIN cent USING (label)),
          r AS (SELECT *, row_number() OVER (PARTITION BY label
              ORDER BY cos_centroid, vec_id) AS rk,
            count(*) OVER (PARTITION BY label) AS n FROM sc)
          SELECT vec_id, label, cos_centroid,
            (rk * 1000 <= n * 50) AS outlier
          FROM r ORDER BY vec_id"""
      }),

    // centroid drift across id-parity halves: per-dim means rounded
    // 6 dp (sum-order ulps collapsed) then the proven cosine mirror
    QueryDef("sim_centroid_drift",
      (s, d) => Similarity.centroidDrift(t(s, d, "embeddings"))
        .withColumn("label", col("label").cast("long")),
      Some("""WITH e AS MATERIALIZED (SELECT label, vec_id % 2 AS half,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE embedding IS NOT NULL
            AND len(embedding) = (SELECT max(len(embedding))
              FROM embeddings WHERE embedding IS NOT NULL)),
        x AS MATERIALIZED (SELECT label, half, v,
            unnest(range(1, len(v) + 1)) AS i FROM e),
        s AS (SELECT label, half, i, sum(v[i]) AS sm, count(*) AS n
          FROM x GROUP BY 1, 2, 3),
        c AS MATERIALIZED (SELECT label, half, max(n) AS n,
            list(round(sm / n, 6) ORDER BY i) AS cv
          FROM s GROUP BY label, half)
        SELECT a.label::BIGINT AS label, a.n::BIGINT AS n_a,
          b.n::BIGINT AS n_b,
          round(list_sum(list_transform(list_zip(a.cv, b.cv),
              p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform(a.cv, x -> x * x))) *
             sqrt(list_sum(list_transform(b.cv, x -> x * x)))), 4)
            AS centroid_cosine
        FROM c a JOIN c b ON a.label = b.label AND a.half = 0 AND b.half = 1
        ORDER BY label"""), bench = true),

    // embedding-table ingest health: null embeddings (every 37th id)
    // and zero vectors (every 53rd ≡ 1) forged in-plan identically in
    // both engines; one combinable per-label scan
    QueryDef("sim_embedding_health",
      (s, d) => {
        val emb = t(s, d, "embeddings").withColumn("embedding",
          when(pmod(col("vec_id"), lit(37)) === 0,
            lit(null).cast("array<float>"))
            .when(pmod(col("vec_id"), lit(53)) === 1,
              transform(col("embedding"), _ => lit(0.0f)))
            .otherwise(col("embedding")))
        Similarity.embeddingHealth(emb)
      },
      Some("""WITH e AS MATERIALIZED (SELECT vec_id, label,
            CASE WHEN vec_id % 37 = 0 THEN NULL
              WHEN vec_id % 53 = 1 THEN
                list_transform(embedding, x -> CAST(0.0 AS REAL))
              ELSE embedding END AS embedding
          FROM embeddings),
        s AS (SELECT label, embedding,
            CASE WHEN embedding IS NOT NULL THEN
              sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END AS nrm,
            CASE WHEN embedding IS NOT NULL THEN len(embedding) END AS dim
          FROM e)
        SELECT label::BIGINT AS label, count(*)::BIGINT AS n,
          sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
          count(DISTINCT dim)::BIGINT AS n_dims_distinct,
          sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
          round(avg(nrm), 4) AS mean_norm,
          round(stddev_pop(nrm), 4) AS sd_norm
        FROM s GROUP BY label ORDER BY label NULLS FIRST"""),
      bench = true))

  // ---------------- multimodal ----------------------------------------

  private val multimodal = Seq(
    // REAL decode oracle: payloads are synthesized PNG/JPEG binaries
    // (even/odd doc_id) whose IHDR/SOF dimensions follow a doc_id
    // formula; Spark parses the BYTES (MediaDecode), DuckDB mirrors
    // the formula — a parser regression (wrong offset, endianness,
    // segment walk) hash-mismatches. content_hash (md5 over the
    // CRC-bearing binary) is not SQL-reconstructible and stays on the
    // decodeBatched surface, spec-covered.
    QueryDef("mm_media_features",
      (s, d) => Multimodal.mediaFeatures(t(s, d, "documents")),
      Some("""SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
          CAST((doc_id * 7) % 1920 + 1 AS INTEGER) AS width,
          CAST((doc_id * 13) % 1080 + 1 AS INTEGER) AS height,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 45 ELSE 33 END
            + coalesce(octet_length(encode(text)), 0) AS BIGINT) AS payload_bytes,
          round(CAST((doc_id * 7) % 1920 + 1 AS DOUBLE)
            / ((doc_id * 13) % 1080 + 1), 4) AS aspect
        FROM documents ORDER BY doc_id"""), bench = true),

    // LAION-style image gate on PARSED header dims: the oracle derives
    // width/height from the same synthesis formulas mm_media_features
    // proves the real parser reproduces; raw-division aspect compare
    QueryDef("mm_image_filter",
      (s, d) => Multimodal.imageFilter(t(s, d, "documents"), 64, 3.0),
      Some {
        val inv = s"CAST('${1.0 / 3.0}' AS DOUBLE)"
        s"""WITH m AS (SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
            CAST((doc_id * 7) % 1920 + 1 AS INTEGER) AS width,
            CAST((doc_id * 13) % 1080 + 1 AS INTEGER) AS height
          FROM documents)
          SELECT doc_id, format, width, height,
            round(width::DOUBLE / height, 4) AS aspect,
            (format IN ('png', 'jpeg') AND width >= 64 AND height >= 64
              AND width::DOUBLE / height <= 3.0
              AND width::DOUBLE / height >= $inv) AS keep
          FROM m ORDER BY doc_id"""
      }, bench = true),

    // SDXL-style aspect-ratio bucketing on parsed dims: EXACT integer
    // cross-product argmin (common-h drop + lcm(q) scaling), panel and
    // lcm injected from the same Scala values — zero literal drift
    QueryDef("mm_aspect_buckets",
      (s, d) => Multimodal.aspectBuckets(t(s, d, "documents")),
      Some {
        val rows = Multimodal.aspectBucketPanel.zipWithIndex.map {
          case ((p, q, name), i) => s"($i, $p, $q, '$name')"
        }.mkString(", ")
        val lcm = Multimodal.aspectBucketLcm
        s"""WITH m AS (SELECT doc_id,
            CAST((doc_id * 7) % 1920 + 1 AS INTEGER) AS width,
            CAST((doc_id * 13) % 1080 + 1 AS INTEGER) AS height
          FROM documents),
          e AS (SELECT doc_id, width, height, b.bucket,
              abs(width::BIGINT * b.q - b.p * height::BIGINT)
                * ($lcm // b.q) AS err, b.i
            FROM m CROSS JOIN
              (SELECT * FROM (VALUES $rows) v(i, p, q, bucket)) b),
          r AS (SELECT doc_id, width, height, bucket, err,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY err, i) AS rk
            FROM e)
          SELECT doc_id, width, height, bucket, err::BIGINT AS err_scaled
          FROM r WHERE rk = 1 ORDER BY doc_id"""
      }, bench = true),

    // byte-level near-dup over the binary modality: hex 8-byte grams
    // at 4-byte stride through the standard MinHash+LSH stack (gram =
    // k=1 shingle). Payload bound to utf8(text) so BOTH engines build
    // identical bytes (the mm fixtures' CRC-bearing PNGs cannot be
    // rebuilt in SQL — mm_payload_dedup's documented limit); forged
    // trailer-append copies at doc_id % 13 must band-collide with
    // their originals
    QueryDef("mm_payload_neardup",
      (s, d) => {
        val base = t(s, d, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val copies = base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("payload"),
              encode(lit(" tail tail tail"), "UTF-8")).as("payload"))
        Multimodal.payloadNearDupPairs(base.unionAll(copies))
      },
      Some {
        val hs = (0 until 8).map(j => s"${minhashSliceSql(j)} AS h$j")
          .mkString(", ")
        val sigList = (0 until 8).map(j => s"h$j").mkString("[", ", ", "]")
        val bandKeys = (0 until 2).map { b =>
          val slots = (0 until 4).map(r => s"sig[${b * 4 + r + 1}]")
            .mkString(" || '|' || ")
          s"SELECT doc_id, sig, $b AS band, md5($slots) AS key FROM psig"
        }.mkString(" UNION ALL ")
        s"""WITH pbase AS (SELECT doc_id, encode(text) AS payload
            FROM documents WHERE text IS NOT NULL),
          pcp AS (SELECT doc_id + 1000000 AS doc_id,
              payload || encode(' tail tail tail') AS payload
            FROM pbase WHERE doc_id % 13 = 0),
          pu AS (SELECT * FROM pbase UNION ALL SELECT * FROM pcp),
          ph AS (SELECT doc_id, hex(payload) AS h FROM pu),
          pg AS (SELECT doc_id,
              list_transform(range(0, (length(h) - 16) // 8 + 1),
                k -> substr(h, 1 + 8 * k, 16)) AS sh
            FROM ph WHERE length(h) >= 16),
          psigs AS (SELECT doc_id, $hs FROM pg),
          psig AS (SELECT doc_id, $sigList AS sig FROM psigs),
          pbands AS ($bandKeys)
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 8
              AS sig_agreement
          FROM pbands a JOIN pbands b
            ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
          WHERE a.key IS NOT NULL
          ORDER BY doc_a, doc_b"""
      }, bench = true),

    // binary-modality exact dedup: the fixture forges REAL payload
    // collisions by synthesizing every doc's image from its doc_id
    // mod 50 base (same dims + same trailing text bytes ⇒ identical
    // binaries), so the md5 groups are exactly the mod-50 classes —
    // which the oracle derives from the SAME arithmetic without
    // rebuilding a CRC-bearing PNG in SQL
    QueryDef("mm_payload_dedup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val base = docs.filter(col("doc_id") < 50)
          .select(col("doc_id").as("bid"), col("text").as("btext"))
        val remapped = docs.select(col("doc_id").as("real_id"),
            (col("doc_id") % 50).as("bid"))
          .join(base, Seq("bid"))
          .select(col("real_id"), col("bid").as("doc_id"),
            col("btext").as("text"))
        Multimodal.payloadDedup(
          Multimodal.withPayload(remapped), idCol = "real_id")
      },
      Some("""SELECT min(doc_id)::BIGINT AS keep_doc_id,
          count(*)::BIGINT AS group_size
        FROM documents GROUP BY doc_id % 50 ORDER BY keep_doc_id"""), bench = true),

    // audio WAV header decode: duration is derived from the PARSED
    // data-chunk length and byte rate — the oracle reconstructs both
    // from the synthesis formulas, so a match proves the RIFF walk
    // read real little-endian bytes, not a formula
    QueryDef("mm_audio_features",
      (s, d) => Multimodal.audioFeatures(t(s, d, "documents")),
      Some("""WITH a AS (SELECT doc_id,
            CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
              ELSE 44100 END AS sr,
            doc_id % 2 + 1 AS ch,
            CASE WHEN (doc_id // 2) % 2 = 0 THEN 8 ELSE 16 END AS bits,
            coalesce(octet_length(encode(text)), 0) AS data_len
          FROM documents)
        SELECT doc_id, 'wav' AS format,
          ch::BIGINT AS channels,
          sr::BIGINT AS sample_rate_hz,
          bits::BIGINT AS bits_per_sample,
          (data_len * 1000 // (sr * ch * (bits // 8)))::BIGINT AS duration_ms,
          (44 + data_len)::BIGINT AS payload_bytes
        FROM a ORDER BY doc_id""")),

    // video frame sampling: every 2nd frame of each synthetic container
    // (doc_id % 7 + 1 frames); the oracle reconstructs the SAME frame
    // bytes from the deterministic formula, so the md5 compare proves
    // the container walk read real bytes, not a formula
    QueryDef("mm_frame_sample",
      (s, d) => Multimodal.frameSample(t(s, d, "documents"), 2),
      Some("""WITH f AS (SELECT doc_id, coalesce(substr(text, 1, 16), '') AS p,
            unnest(range(0, doc_id % 7 + 1)) AS frame_idx
          FROM documents)
        SELECT doc_id, frame_idx::BIGINT AS frame_idx,
          md5('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p) AS frame_md5,
          octet_length(encode('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p))::BIGINT AS frame_bytes
        FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx"""),
      bench = true))

  // ---------------- corpus assembly (selection / mixing / budgeting) --

  private val corpusLangs = Seq("de", "en", "fr")
  // 0.3 is deliberately non-dyadic: it exercises the shared-floor
  // threshold (an engine-local float rate*2^32 would diverge here)
  private val sampleRates = Seq("en" -> 0.3, "zh" -> 0.25) // others: 1.0

  private val corpus = Seq(
    // dedup survivors ∩ quality gate ∩ language allowlist — the final
    // keep set of a corpus build, composed from the already-oracled
    // fingerprint and quality heuristics
    QueryDef("corpus_select",
      (s, d) => CorpusOps.corpusSelect(t(s, d, "documents"),
        stopwords, corpusLangs),
      Some {
        s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))),
          q AS MATERIALIZED (SELECT doc_id, lang, source, len($toksSql) AS n_tokens,
            round(CAST(len(list_filter($toksSql, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)
              / len($toksSql), 4) AS stopword_ratio
            FROM documents)
          SELECT doc_id, lang, source, n_tokens FROM q
          WHERE doc_id IN (SELECT doc_id FROM keep)
            AND n_tokens >= 10 AND stopword_ratio >= 0.05
            AND lang IN ${sqlList(corpusLangs).replace("[", "(").replace("]", ")")}
          ORDER BY doc_id"""
      }, bench = true),

    // deterministic hash sampling per language (domain mixing): keep iff
    // u32(md5(salt:doc_id)) < rate * 2^32 — no rand(), engine-portable
    QueryDef("corpus_stratified_sample",
      (s, d) => CorpusOps.stratifiedSample(t(s, d, "documents"),
        sampleRates.toMap, "mix1"),
      Some {
        // thresholds precomputed by the SAME Scala floor as the Spark
        // side — an independently-evaluated float rate*2^32 diverges on
        // non-dyadic rates (truncate vs round-to-nearest)
        val thrCase = "CASE lang " + sampleRates.map { case (l, r) =>
          s"WHEN '$l' THEN ${CorpusOps.sampleThreshold(r)}" }.mkString(" ") +
          s" ELSE ${CorpusOps.sampleThreshold(1.0)} END"
        s"""SELECT doc_id, lang, source FROM documents
          WHERE ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            < $thrCase
          ORDER BY doc_id"""
      }),

    // per-source token budget: running total in doc_id order, cut at B
    QueryDef("corpus_token_budget",
      (s, d) => CorpusOps.tokenBudget(t(s, d, "documents"), 800L),
      Some {
        s"""SELECT doc_id, source, n_tokens, cum_tokens FROM (
            SELECT doc_id, source, len($toksSql) AS n_tokens,
              CAST(sum(len($toksSql)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE cum_tokens <= 800 ORDER BY doc_id"""
      }, bench = true),

    // benchmark decontamination: docs sharing any 3-shingle with the
    // eval split (doc_id % 50 = 0) are dropped from the training split
    QueryDef("corpus_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        CorpusOps.decontaminate(docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), 3)
      },
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
          eg AS (SELECT DISTINCT unnest(${shinglesSql("w")}) AS gram
            FROM toks WHERE doc_id % 50 = 0),
          dg AS (SELECT doc_id, unnest(${shinglesSql("w")}) AS gram
            FROM toks WHERE doc_id % 50 <> 0),
          bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN eg USING (gram))
          SELECT doc_id, lang, source FROM documents
          WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id"""
      }, bench = true),

    // contamination scoring: per-doc fraction of DISTINCT 3-shingles
    // present in the eval split (the audit report behind the
    // decontaminate threshold choice); zero-shingle docs score 0.0
    QueryDef("corpus_contamination_score",
      (s, d) => {
        val docs = t(s, d, "documents")
        CorpusOps.contaminationScore(docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), 3)
      },
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
          eg AS (SELECT DISTINCT unnest(${shinglesSql("w")}) AS gram
            FROM toks WHERE doc_id % 50 = 0),
          dg AS (SELECT doc_id, unnest(list_distinct(${shinglesSql("w")})) AS gram
            FROM toks WHERE doc_id % 50 <> 0),
          hits AS (SELECT dg.doc_id, count(*) AS n_grams,
              count(eg.gram) AS n_hit
            FROM dg LEFT JOIN eg ON dg.gram = eg.gram GROUP BY dg.doc_id)
          SELECT t.doc_id,
            coalesce(n_grams, 0)::BIGINT AS n_grams,
            coalesce(n_hit, 0)::BIGINT AS n_hit,
            round(CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
              ELSE n_hit::DOUBLE / n_grams END, 4) AS contamination
          FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) t
          LEFT JOIN hits USING (doc_id)
          ORDER BY doc_id"""
      }),

    // snapshot diff: the old snapshot is `documents`; the new one
    // deterministically removes doc_id % 13 == 0, rewrites the text of
    // doc_id % 17 == 0, and adds doc_id + 1000000 for doc_id % 11 == 0
    QueryDef("corpus_snapshot_diff",
      (s, d) => {
        val docs = t(s, d, "documents")
        val newer = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text", when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") % 11 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        CorpusOps.snapshotDiff(docs, newer)
      },
      Some("""WITH newdocs AS (
          SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
            ELSE text END AS text
          FROM documents WHERE doc_id % 13 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0),
        o AS (SELECT doc_id, md5(text) AS old_md5, TRUE AS in_old
          FROM documents),
        n AS MATERIALIZED (SELECT doc_id, md5(text) AS new_md5, TRUE AS in_new
          FROM newdocs),
        j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
            old_md5, new_md5, in_old, in_new
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        SELECT doc_id,
          CASE WHEN in_old IS NULL THEN 'added'
            WHEN in_new IS NULL THEN 'removed'
            WHEN old_md5 IS DISTINCT FROM new_md5 THEN 'changed'
            ELSE 'unchanged' END AS status,
          old_md5, new_md5
        FROM j
        WHERE in_old IS NULL OR in_new IS NULL
          OR old_md5 IS DISTINCT FROM new_md5
        ORDER BY doc_id"""),
      bench = true),

    // char-bigram entropy: statistical-junk detector; the oracle
    // mirrors the exact scalar-applied-once arithmetic
    QueryDef("txt_char_entropy",
      (s, d) => TextAnalysis.charEntropy(t(s, d, "documents")),
      Some("""WITH b AS (SELECT doc_id,
          unnest(list_transform(range(1, length(text)),
            i -> substr(text, i, 2))) AS g
          FROM documents WHERE length(text) >= 2),
        c AS MATERIALIZED (SELECT doc_id, g, count(*) AS c FROM b GROUP BY doc_id, g),
        e AS MATERIALIZED (SELECT doc_id, sum(c)::BIGINT AS nb,
          round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(2), 4) + 0.0 AS h
          FROM c GROUP BY doc_id)
        SELECT d.doc_id, coalesce(nb, 0)::BIGINT AS n_bigrams,
          coalesce(h, 0.0) AS entropy_bits
        FROM documents d LEFT JOIN e USING (doc_id)
        ORDER BY doc_id"""),
      bench = true),

    // BPE first-merge statistics: top-20 within-word adjacent char
    // pairs (the corpus-scan step the merge loop repeats)
    QueryDef("txt_bpe_pairs",
      (s, d) => TextAnalysis.bpePairCounts(t(s, d, "documents"), 20),
      Some("""WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS w
          FROM documents),
        p AS (SELECT unnest(list_transform(range(1, length(w)),
          i -> substr(w, i, 2))) AS pair FROM w WHERE length(w) >= 2)
        SELECT pair, count(*)::BIGINT AS n FROM p
        GROUP BY pair ORDER BY n DESC, pair LIMIT 20"""),
      bench = true),

    // BPE merge APPLICATION — encode every doc with the pinned merge
    // table (8 bounded rounds = fixpoint at this corpus's max word
    // length 8; ONE merge per round, exactly unrolled as chained CTE
    // pairs below — the dedup_pagerank pattern). The rank CASE chain
    // is generated from the same Scala Seq the Spark expression gets:
    // zero literal drift.
    QueryDef("txt_bpe_apply",
      (s, d) => TextAnalysis.bpeApply(t(s, d, "documents"), bpeMerges, 8),
      Some {
        val rankCase = bpeMerges.zipWithIndex.map { case ((l, r), k) =>
          s"WHEN toks[i] = '$l' AND toks[i+1] = '$r' THEN $k*10000 + i"
        }.mkString("CASE ", " ", " ELSE NULL END")
        val best =
          s"list_min(list_transform(range(1, len(toks)), i -> $rankCase))"
        val rounds = (1 to 8).map { k =>
          s"""s$k AS (SELECT doc_id, wl,
              list_transform(wl, toks -> $best) AS b FROM r${k - 1}),
            r$k AS (SELECT doc_id, list_transform(range(1, len(wl)+1), wi ->
              CASE WHEN b[wi] IS NULL THEN wl[wi]
              ELSE list_concat(list_concat(wl[wi][1:(b[wi]%10000)-1],
                [wl[wi][b[wi]%10000] || wl[wi][b[wi]%10000+1]]),
                wl[wi][(b[wi]%10000)+2:]) END) AS wl FROM s$k)"""
        }.mkString(",\n")
        s"""WITH r0 AS (SELECT doc_id,
            list_transform(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
              w -> list_transform(range(1, length(w)+1), i -> w[i:i])) AS wl
            FROM documents WHERE text IS NOT NULL),
          $rounds
          SELECT doc_id,
            coalesce(array_to_string(flatten(wl), ' '), '') AS bpe_text,
            len(flatten(wl))::BIGINT AS n_pieces, len(wl)::BIGINT AS n_words
          FROM r8 ORDER BY doc_id"""
      }, bench = true),

    // pairwise source vocabulary Jaccard (membership complement of
    // the frequency-shape sourceDrift panel)
    QueryDef("txt_vocab_overlap",
      (s, d) => TextAnalysis.sourceVocabOverlap(t(s, d, "documents")),
      Some("""WITH sv AS MATERIALIZED (SELECT DISTINCT source,
            unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
              t -> t <> '')) AS token
          FROM documents),
        sizes AS (SELECT source, count(*)::BIGINT AS n_vocab
          FROM sv GROUP BY source),
        common AS (SELECT a.source AS source_a, b.source AS source_b,
            count(*)::BIGINT AS n_common
          FROM sv a JOIN sv b ON a.token = b.token AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT sa.source AS source_a, sb.source AS source_b,
          coalesce(n_common, 0)::BIGINT AS n_common,
          round(CAST(coalesce(n_common, 0) AS DOUBLE) /
            (sa.n_vocab + sb.n_vocab - coalesce(n_common, 0)), 4) AS jaccard
        FROM sizes sa JOIN sizes sb ON sa.source < sb.source
        LEFT JOIN common ON source_a = sa.source AND source_b = sb.source
        ORDER BY source_a, source_b"""), bench = true),

    // Bloom-filter admission: the sketch's Murmur3 probes are not
    // DuckDB-expressible, so the oracled surface is the guarantee set
    // computed against the EXACT membership join: no true duplicate
    // admitted (bloom has no false negatives), and the false-positive
    // rejection rate among novel docs within 5× the configured 1 %
    QueryDef("corpus_bloom_admit",
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 2 === 0)
        val admitted = Dedup.bloomAdmit(docs, corpus,
          expectedItems = math.max(1L, corpus.count()), fpp = 0.01)
        val corpusFps = corpus
          .select(md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
            .as("f")).distinct()
        val incomingF = docs.select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("f"))
        val dupIds = incomingF.join(corpusFps, Seq("f"), "left_semi")
          .select("doc_id")
        val admittedIds = admitted.select("doc_id")
        val falseNeg = admittedIds.join(dupIds, Seq("doc_id"), "left_semi").count()
        val nNovel = docs.count() - dupIds.count()
        val nAdmitted = admittedIds.count()
        val fpRejected = nNovel - nAdmitted // novel docs the bloom rejected
        import s.implicits._
        Seq((docs.count(), falseNeg == 0L,
            nNovel == 0L || fpRejected.toDouble / nNovel <= 0.05))
          .toDF("n_incoming", "no_false_negatives", "fp_ok")
      },
      Some("""SELECT count(*)::BIGINT AS n_incoming,
        TRUE AS no_false_negatives, TRUE AS fp_ok FROM documents""")),

    // per-source health panel: volume + dup rate + empty share in one
    // combinable source groupBy (the ingest-round dashboard row)
    QueryDef("corpus_health_report",
      (s, d) => CorpusOps.sourceHealthReport(t(s, d, "documents")),
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
          sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')))::BIGINT AS n_tokens,
          round(avg(n_chars), 2) AS mean_chars,
          round(1.0 - count(DISTINCT
              md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::DOUBLE
            / count(*), 4) AS dup_rate,
          round(avg(CASE WHEN text IS NULL OR length(trim(text)) = 0
            THEN 1.0 ELSE 0.0 END), 4) AS empty_share
        FROM documents GROUP BY source ORDER BY source"""), bench = true),

    // cluster-balanced diversity sampling: k-means cells are not
    // DuckDB-reproducible, so the oracled surface is the invariant set
    // that pins the semantics given ANY clustering (the kmeans-recall
    // pattern): every sampled cell holds exactly min(quota, cell size)
    // rows, the sampled cells' sizes sum to the whole corpus (no cell
    // dropped), and no vector repeats; n_corpus anchors real data
    QueryDef("corpus_cluster_sample",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        clusterSampleSurface(s, emb,
          CorpusOps.clusterBalancedSample(emb, k = 8, quota = 25))
      },
      Some("""SELECT count(*)::BIGINT AS n_corpus, TRUE AS quota_ok,
        TRUE AS coverage_ok, TRUE AS distinct_ok
        FROM embeddings WHERE embedding IS NOT NULL"""), bench = true),

    // SAMPLE ONLY — the serve path, measured without Lloyd's training:
    // centroids persisted once per JVM (memoized writeKmeansCentroids),
    // read back each run — under min-of-N round 1 pays the build, later
    // rounds measure the pure quota-sampling plan (heap + broadcast
    // argmax). Same invariant surface and oracle; corpus_cluster_sample
    // stays benched as the train+sample row so train cost is visible.
    QueryDef("corpus_cluster_sample_only",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cents = s.read.parquet(kmeansCentroidDir(s, d))
        clusterSampleSurface(s, emb,
          CorpusOps.clusterBalancedSampleFromCentroids(emb, cents, quota = 25))
      },
      Some("""SELECT count(*)::BIGINT AS n_corpus, TRUE AS quota_ok,
        TRUE AS coverage_ok, TRUE AS distinct_ok
        FROM embeddings WHERE embedding IS NOT NULL"""), bench = true),

    // RAKE keyword extraction: stopword-delimited candidate phrases,
    // deg/freq word scoring, top-3 per doc. Rank compares the ROUNDED
    // score (tfidf discipline) with (phrase, position) tie-break;
    // engine position bases differ by 1 but order is monotonic
    QueryDef("txt_rake_keywords",
      (s, d) => TextAnalysis.rakeKeywords(t(s, d, "documents"), stopwords, 3),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
              t -> t <> '') AS tk FROM documents),
          segs AS (SELECT doc_id, str_split(array_to_string(
              list_transform(tk, t -> CASE WHEN list_contains(${sqlList(stopwords)}, t)
                THEN '|' ELSE t END), ' '), '|') AS sg FROM toks),
          phr AS (SELECT doc_id, trim(unnest(sg)) AS phrase,
              unnest(generate_series(1, len(sg))) AS ppos FROM segs),
          pw AS (SELECT doc_id, ppos, phrase, str_split(phrase, ' ') AS ws
            FROM phr WHERE phrase <> ''),
          wx AS (SELECT doc_id, ppos, phrase, len(ws) AS plen, unnest(ws) AS w
            FROM pw),
          stats AS (SELECT doc_id, w, count(*) AS freq,
              sum(plen)::BIGINT AS deg
            FROM wx GROUP BY doc_id, w),
          sc AS (SELECT wx.doc_id, ppos, phrase,
              round(sum(CAST(deg AS DOUBLE) / freq), 4) AS score
            FROM wx JOIN stats ON wx.doc_id = stats.doc_id AND wx.w = stats.w
            GROUP BY wx.doc_id, ppos, phrase)
          SELECT doc_id, rk, phrase, score FROM (
            SELECT doc_id, phrase, score,
              CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, phrase, ppos) AS BIGINT) AS rk
            FROM sc) WHERE rk <= 3
          ORDER BY doc_id, rk"""
      }, bench = true),

    // k-anonymity release audit over the (lang, source) quasi-identifier
    QueryDef("corpus_k_anonymity",
      (s, d) => CorpusOps.kAnonymityAudit(t(s, d, "documents"),
        Seq("lang", "source"), 10),
      Some("""SELECT lang, source, count(*)::BIGINT AS n,
          count(*) < 10 AS at_risk
        FROM documents GROUP BY lang, source
        ORDER BY lang NULLS FIRST, source""")),

    // l-diversity: the homogeneity-attack screen k-anonymity misses —
    // distinct sensitive values per quasi group
    QueryDef("corpus_l_diversity",
      (s, d) => CorpusOps.lDiversityAudit(t(s, d, "documents"),
        Seq("lang", "source"), "n_chars", 5),
      Some("""SELECT lang, source, count(*)::BIGINT AS n,
          count(DISTINCT n_chars)::BIGINT AS n_sensitive,
          count(DISTINCT n_chars) < 5 AS at_risk
        FROM documents GROUP BY lang, source
        ORDER BY lang NULLS FIRST, source"""), bench = true),

    // t-closeness: the skewness-attack screen completing the privacy
    // trio — per-source total-variation distance of the lang
    // distribution vs the corpus, all mass arithmetic on exact
    // integers over the common denominator n_group*N (one float
    // division at the end); uncovered global mass in closed form
    QueryDef("corpus_t_closeness",
      (s, d) => CorpusOps.tClosenessAudit(t(s, d, "documents"),
        Seq("source"), "lang", 0.2),
      Some("""WITH b AS MATERIALIZED (SELECT source, lang FROM documents
            WHERE lang IS NOT NULL),
          cells AS MATERIALIZED (SELECT source, lang, count(*)::BIGINT AS c
            FROM b GROUP BY 1, 2),
          gl AS (SELECT lang, count(*)::BIGINT AS g FROM b GROUP BY 1),
          nn AS (SELECT count(*)::BIGINT AS nt FROM b),
          grp AS (SELECT source, sum(c)::BIGINT AS ng FROM cells GROUP BY 1),
          agg AS (SELECT cells.source,
              sum(abs(c * nt - g * ng))::BIGINT AS num,
              sum(g)::BIGINT AS cov
            FROM cells JOIN gl USING (lang) CROSS JOIN nn
              JOIN grp ON cells.source IS NOT DISTINCT FROM grp.source
            GROUP BY 1)
        SELECT agg.source, grp.ng AS n,
          round((num + (nt - cov) * ng)::DOUBLE
            / (2.0::DOUBLE * ng::DOUBLE * nt::DOUBLE), 4) AS tv,
          round((num + (nt - cov) * ng)::DOUBLE
            / (2.0::DOUBLE * ng::DOUBLE * nt::DOUBLE), 4) > 0.2 AS at_risk
        FROM agg JOIN grp ON agg.source IS NOT DISTINCT FROM grp.source
          CROSS JOIN nn
        ORDER BY agg.source NULLS FIRST"""), bench = true),

    // exact-k-per-source sampling: fixed quota of 5 docs per source by
    // ascending u32(md5) order, via the graft_topk heap (never a
    // corpus-wide ranking window)
    QueryDef("corpus_exact_sample",
      (s, d) => CorpusOps.exactSamplePerSource(t(s, d, "documents"), 5, "smp"),
      Some("""SELECT doc_id, source FROM (
          SELECT doc_id, source, row_number() OVER (PARTITION BY source
            ORDER BY ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
              doc_id) AS rk
          FROM documents)
        WHERE rk <= 5 ORDER BY doc_id""")),

    // domain-mixture sampling: integer-only thresholds (see
    // CorpusOps.mixtureSample) — 40/30/20/10% of a 60-doc mix from
    // four sources, everything else weight 0
    QueryDef("corpus_mixture_sample",
      (s, d) => CorpusOps.mixtureSample(t(s, d, "documents"),
        Map("src0" -> 400L, "src1" -> 300L, "src2" -> 200L, "src3" -> 100L),
        60L, "mix1"),
      Some("""WITH tgt(source, permille) AS (VALUES
          ('src0', 400), ('src1', 300), ('src2', 200), ('src3', 100)),
        thr AS MATERIALIZED (SELECT d.source,
            least(4294967296, ((permille * 60) // 1000) * 4294967296 // count(*)) AS thr
          FROM documents d JOIN tgt USING (source) GROUP BY d.source, permille)
        SELECT doc_id, lang, source FROM documents JOIN thr USING (source)
        WHERE ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr
        ORDER BY doc_id""")),

    // C4/MassiveText line-level boilerplate removal over a lined corpus
    // synthesized identically on both sides (the raw synthetic docs are
    // single-line): body + a per-source legal footer (corpus-frequent),
    // a javascript banner or a unique section line, and a short "ok" or
    // a 40-char body prefix — exercising the pattern rule, the
    // min-words rule, and the corpus-frequency rule at once
    QueryDef("corpus_remove_boilerplate",
      (s, d) => {
        val lined = t(s, d, "documents").withColumn("text",
          concat(col("text"),
            lit("\ncopyright "), col("source"), lit(" all rights reserved\n"),
            when(col("doc_id") % 3 === 0,
              lit("please enable javascript and cookies to continue"))
              .otherwise(concat(lit("section "), col("doc_id").cast("string"),
                lit(" of the archive collection"))),
            lit("\n"),
            when(col("doc_id") % 7 === 0, lit("ok"))
              .otherwise(substring(col("text"), 1, 40))))
        Cleaning.removeBoilerplate(lined)
      },
      Some {
        s"""WITH lined AS (SELECT doc_id,
            text || chr(10) || 'copyright ' || source || ' all rights reserved' || chr(10) ||
            CASE WHEN doc_id % 3 = 0 THEN 'please enable javascript and cookies to continue'
                 ELSE 'section ' || CAST(doc_id AS VARCHAR) || ' of the archive collection' END || chr(10) ||
            CASE WHEN doc_id % 7 = 0 THEN 'ok' ELSE substr(text, 1, 40) END AS t
          FROM documents),
          lines AS (SELECT doc_id, unnest(str_split(t, chr(10))) AS line,
            unnest(generate_series(1, len(str_split(t, chr(10))))) AS pos FROM lined),
          norm AS (SELECT doc_id, pos, line,
            md5(regexp_replace(lower(trim(line)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS lh,
            len(list_filter(regexp_split_to_array(trim(line), '[ \\t\\n\\x0B\\f\\r]+'), w -> w <> '')) AS nw
          FROM lines),
          freq AS (SELECT lh FROM norm GROUP BY lh HAVING count(DISTINCT doc_id) > 2),
          kept AS (SELECT * FROM norm WHERE nw >= 3
            AND NOT regexp_matches(lower(line), '${Cleaning.defaultBoilerplatePatterns}')
            AND lh NOT IN (SELECT lh FROM freq)),
          agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
            count(*)::BIGINT AS n_lines_kept FROM kept GROUP BY doc_id)
          SELECT a.doc_id, text_clean, n_lines_kept,
            (len(str_split(l.t, chr(10))) - n_lines_kept)::BIGINT AS n_lines_dropped
          FROM agg a JOIN lined l ON a.doc_id = l.doc_id ORDER BY a.doc_id"""
      }, bench = true),

    // within-doc repeated-line removal: the fixture interleaves the
    // doc's own body and an "add to cart" chrome line twice each —
    // in-page repetition that corpus-frequency boilerplate rules
    // cannot see. The oracle reproduces first-occurrence-wins with a
    // min-position group-by (DuckDB's list_distinct does NOT preserve
    // order — never use it where the rejoined text is hashed)
    QueryDef("corpus_dedup_lines",
      (s, d) => {
        // null text coalesced to '' on BOTH sides: Spark's
        // concat/split null-propagate (the doc would emit a null row)
        // while DuckDB's unnest of a null split drops it entirely —
        // the same null-text vintage hazard the mm_* oracles guard
        val lined = t(s, d, "documents").withColumn("text",
          concat(coalesce(col("text"), lit("")),
            lit("\nadd to cart\n"), coalesce(col("text"), lit("")),
            lit("\nadd to cart")))
        Cleaning.dedupLinesInDoc(lined)
          .select(col("doc_id"), md5(col("text_dedup")).as("dedup_md5"),
            col("n_lines"), col("n_unique_lines"))
          .orderBy("doc_id")
      },
      Some("""WITH lined AS (SELECT doc_id,
            coalesce(text, '') || chr(10) || 'add to cart' || chr(10) ||
              coalesce(text, '') || chr(10) || 'add to cart' AS t
          FROM documents),
        lines AS (SELECT doc_id, unnest(str_split(t, chr(10))) AS line,
          unnest(generate_series(1, len(str_split(t, chr(10))))) AS pos
          FROM lined),
        firsts AS (SELECT doc_id, line, min(pos) AS fp
          FROM lines GROUP BY doc_id, line),
        agg AS (SELECT doc_id,
            string_agg(line, chr(10) ORDER BY fp) AS text_dedup,
            count(*)::BIGINT AS n_unique_lines
          FROM firsts GROUP BY doc_id)
        SELECT a.doc_id, md5(text_dedup) AS dedup_md5,
          len(str_split(l.t, chr(10)))::BIGINT AS n_lines, n_unique_lines
        FROM agg a JOIN lined l ON a.doc_id = l.doc_id
        ORDER BY a.doc_id""")),

    // PII redaction over synthetic PII injected identically on both
    // sides (emails/IPs always, SSN on doc_id%3=0, phone on doc_id%2=0)
    QueryDef("corpus_redact_pii",
      (s, d) => {
        val injected = t(s, d, "documents").withColumn("text",
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com ip 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 100).cast("string"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" ssn 123-45-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 2 === 0,
              concat(lit(" call 555-867-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))))
        Cleaning.redactPii(injected)
      },
      Some {
        // Scala's "\\b" is the two chars \b — embeds verbatim into the
        // single-quoted RE2 literal (patterns are dialect-shared)
        val Seq(em, ip, ssn, ph) = Cleaning.piiPatterns.map(_._2)
        s"""WITH injected AS (SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.' ||
            CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ||
            CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
            CASE WHEN doc_id % 2 = 0 THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
          FROM documents),
          s1 AS (SELECT doc_id, t, regexp_replace(t, '$em', '<EMAIL>', 'g') AS t1 FROM injected),
          s2 AS (SELECT *, regexp_replace(t1, '$ip', '<IP>', 'g') AS t2 FROM s1),
          s3 AS (SELECT *, regexp_replace(t2, '$ssn', '<SSN>', 'g') AS t3 FROM s2)
          SELECT doc_id,
            regexp_replace(t3, '$ph', '<PHONE>', 'g') AS text_redacted,
            len(regexp_extract_all(t, '$em'))::BIGINT AS n_emails,
            len(regexp_extract_all(t1, '$ip'))::BIGINT AS n_ips,
            len(regexp_extract_all(t2, '$ssn'))::BIGINT AS n_ssns,
            len(regexp_extract_all(t3, '$ph'))::BIGINT AS n_phones
          FROM s3 ORDER BY doc_id"""
      }),

    // sequence packing (chunked concatenation): each doc's span across
    // fixed-256-token training sequences, per source in doc_id order
    QueryDef("corpus_pack_sequences",
      (s, d) => CorpusOps.packSequences(t(s, d, "documents"), 256L),
      Some {
        s"""SELECT doc_id, source, n_tokens,
            (cum_tokens - n_tokens) // 256 AS first_seq,
            (cum_tokens - 1) // 256 AS last_seq,
            (cum_tokens - n_tokens) % 256 AS seq_offset
          FROM (SELECT doc_id, source,
              CAST(len($toksSql) AS BIGINT) AS n_tokens,
              CAST(sum(len($toksSql)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE n_tokens > 0 ORDER BY doc_id"""
      }),

    // packing-efficiency audit over the same 256-token layout:
    // per-source fill rate (tail padding only) + doc fragmentation
    QueryDef("corpus_packing_stats",
      (s, d) => CorpusOps.packingStats(t(s, d, "documents"), 256L),
      Some {
        s"""WITH p AS (SELECT doc_id, source, n_tokens,
            (cum_tokens - n_tokens) // 256 AS first_seq,
            (cum_tokens - 1) // 256 AS last_seq
          FROM (SELECT doc_id, source,
              CAST(len($toksSql) AS BIGINT) AS n_tokens,
              CAST(sum(len($toksSql)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE n_tokens > 0)
          SELECT source, count(*)::BIGINT AS n_docs,
            sum(n_tokens)::BIGINT AS n_tokens,
            (max(last_seq) + 1)::BIGINT AS n_seqs,
            round(sum(n_tokens)::DOUBLE / ((max(last_seq) + 1) * 256), 4)
              AS fill_rate,
            sum(CASE WHEN first_seq <> last_seq THEN 1 ELSE 0 END)::BIGINT
              AS n_split_docs,
            round(sum(CASE WHEN first_seq <> last_seq THEN 1 ELSE 0 END)::DOUBLE
              / count(*), 4) AS split_rate
          FROM p GROUP BY source ORDER BY source"""
      }),

    // shard-assignment audit for the training export: deterministic
    // md5(doc_id) sharding, per-shard count/bytes/id-range. The writer
    // itself ([[CorpusOps.writeShards]]) is spec-tested; this query is
    // the balance check over the same mapping
    QueryDef("corpus_shard_stats",
      (s, d) => CorpusOps.shardStats(t(s, d, "documents"), 16),
      Some {
        """SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16) AS shard,
            count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_bytes,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc
          FROM documents GROUP BY 1 ORDER BY shard"""
      }),

    // curriculum staging: global (n_chars, doc_id) order cut into 8
    // equal stages — Spark side is the constant-key skew-safe rankByKey
    // (no single-reducer global window), oracle is the plain window
    QueryDef("corpus_curriculum",
      (s, d) => CorpusOps.curriculumStages(t(s, d, "documents"), col("n_chars"), 8),
      Some("""WITH r AS (SELECT doc_id, n_chars,
            row_number() OVER (ORDER BY n_chars NULLS FIRST, doc_id) AS rk,
            count(*) OVER () AS n FROM documents)
        SELECT doc_id, n_chars AS score,
          CAST(floor((rk - 1) * 8 / n) AS BIGINT) AS stage
        FROM r ORDER BY doc_id""")),

    // round-robin source interleaving: the deterministic training
    // order (turn 1 of every source, then turn 2, …). Spark side is
    // the skew-safe rankByKey, oracle is the plain window — identical
    // results, different physical plans
    QueryDef("corpus_interleave",
      (s, d) => CorpusOps.interleave(t(s, d, "documents")),
      Some("""SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS turn
        FROM documents ORDER BY turn, source, doc_id""")),

    // per-language length-percentile trim (drop shortest/longest 5%):
    // rank-based boundary — an exact rational both engines compute
    // identically, immune to interpolated-quantile ulp drift
    QueryDef("corpus_length_filter",
      (s, d) => Cleaning.lengthFilter(t(s, d, "documents"), 0.05, 0.95),
      Some("""WITH r AS (SELECT doc_id, lang, n_chars,
            count(*) OVER (PARTITION BY lang) AS nk,
            CASE WHEN count(*) OVER (PARTITION BY lang) > 1
              THEN CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars NULLS FIRST, doc_id) - 1 AS DOUBLE)
                / (count(*) OVER (PARTITION BY lang) - 1)
              ELSE 0.0 END AS pr
          FROM documents)
        SELECT doc_id, lang, n_chars, round(pr, 6) AS len_pct
        FROM r WHERE nk = 1 OR (pr >= 0.05 AND pr <= 0.95) ORDER BY doc_id""")),

    // Unicode canonicalization (NFC + control strip + whitespace
    // collapse) — the pre-hash normalize pass. The synthetic suffix
    // appends a combining acute (composes under NFC) and a BEL control
    // (strips) so the corpus genuinely exercises both rules; the
    // control class is explicit hex ranges on BOTH dialects (RE2
    // silently matches nothing for \p{Cntrl} — see
    // Cleaning.normalizeText)
    QueryDef("corpus_normalize_text",
      (s, d) => Cleaning.normalizeText(
          t(s, d, "documents").withColumn("text",
            // DECOMPOSED "e"+U+0301 then BEL: the operator must
            // compose and strip - a pre-composed suffix would let a
            // broken normalizer pass vacuously
            concat(col("text"), lit(" e\u0301\u0007x "))))
        .select(col("doc_id"), col("n_chars").as("n_chars_norm"),
          md5(col("text")).as("norm_md5"))
        .orderBy("doc_id"),
      Some {
        """SELECT doc_id, length(norm)::BIGINT AS n_chars_norm,
            md5(norm) AS norm_md5
          FROM (SELECT doc_id,
            trim(regexp_replace(regexp_replace(
              nfc_normalize(text || ' e' || chr(769) || chr(7) || 'x '),
              '[\x00-\x08\x0E-\x1F\x7F-\x9F]', '', 'g'),
              '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
            FROM documents) ORDER BY doc_id"""
      }, bench = true),

    // C4 bad-words rule: any blocklisted token drops the whole doc;
    // whole-token lowercased membership, gate-report form
    QueryDef("corpus_blocklist_filter",
      (s, d) => Cleaning.blocklistFilter(t(s, d, "documents"),
        Seq("merge", "window")),
      Some(s"""SELECT doc_id,
          len($toksSql)::BIGINT AS n_tokens,
          coalesce(len(list_filter($toksSql,
            t -> list_contains(['merge', 'window'], lower(t)))), 0)::BIGINT
            AS n_blocked,
          coalesce(len(list_filter($toksSql,
            t -> list_contains(['merge', 'window'], lower(t)))), 0) = 0
            AS keep
        FROM documents ORDER BY doc_id"""), bench = true),

    // Gopher-style quality gate: word-count / mean-word-length /
    // alpha-fraction / stopword-hit rules; keep compares the ROUNDED
    // stats so the boundary cannot drift by a float ulp cross-engine
    QueryDef("corpus_gopher_filter",
      (s, d) => Cleaning.gopherRules(t(s, d, "documents"),
        minWords = 10, maxWords = 1000, stopwords = stopwords),
      Some {
        s"""WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
              x -> x <> '') AS ws
          FROM documents),
        s AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
            round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
              list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                / len(ws) END, 4) AS mean_word_len,
            round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
              len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                / len(ws) END, 4) AS alpha_frac,
            len(list_filter(ws,
              x -> list_contains(${sqlList(stopwords)}, lower(x))))::BIGINT
              AS stop_hits
          FROM w)
        SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
          (n_words >= 10 AND n_words <= 1000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND alpha_frac >= 0.8 AND stop_hits >= 2) AS keep
        FROM s ORDER BY doc_id"""
      }, bench = true),

    // sliding-window chunking (context-window prep): 32-token windows
    // at stride 24 (8-token overlap), last window truncates; chunk
    // content compared by md5
    QueryDef("corpus_chunk_windows",
      (s, d) => CorpusOps.chunkWindows(t(s, d, "documents"), 32, 24),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          c AS MATERIALIZED (SELECT doc_id, unnest(range(0, len(w), 24)) AS st, w FROM w)
          SELECT doc_id, (st // 24)::BIGINT AS chunk_id, st::BIGINT AS chunk_start,
            len(w[st+1:st+32])::BIGINT AS chunk_tokens,
            md5(array_to_string(w[st+1:st+32], ' ')) AS chunk_md5
          FROM c ORDER BY doc_id, chunk_id"""
      }),

    // per-source KL drift from the corpus token distribution (mix
    // monitor). Scalar totals applied ABOVE the per-source aggregate —
    // the unigram-LM arithmetic-order discipline
    QueryDef("corpus_source_drift",
      (s, d) => TextAnalysis.sourceDrift(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token FROM documents),
          st AS MATERIALIZED (SELECT source, token, count(*)::BIGINT AS c_st FROM toks
            GROUP BY source, token),
          ct AS (SELECT token, sum(c_st)::BIGINT AS c_t FROM st GROUP BY token),
          ns AS (SELECT source, sum(c_st)::BIGINT AS n_s, count(*)::BIGINT AS vocab
            FROM st GROUP BY source),
          n AS MATERIALIZED (SELECT sum(c_t)::BIGINT AS n FROM ct),
          agg AS (SELECT source, sum(c_st * (ln(c_st) - ln(c_t))) AS s
            FROM st JOIN ct USING (token) GROUP BY source)
          SELECT source, n_s AS n_tokens, vocab,
            round((s / n_s + ln(n) - ln(n_s)) / ln(2.0), 4) + 0 AS kl_bits
          FROM agg JOIN ns USING (source) CROSS JOIN n ORDER BY source"""
      }),

    // symmetric bounded drift: Jensen-Shannon vs the corpus, sparse
    // form (absent-token q-mass in closed form: ln2 * (1 - q_cov))
    QueryDef("corpus_source_js",
      (s, d) => TextAnalysis.sourceJsDivergence(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token
            FROM documents),
          st AS MATERIALIZED (SELECT source, token, count(*)::BIGINT AS c_st FROM toks
            GROUP BY source, token),
          ct AS (SELECT token, sum(c_st)::BIGINT AS c_t FROM st
            GROUP BY token),
          ns AS (SELECT source, sum(c_st)::BIGINT AS n_s FROM st
            GROUP BY source),
          n AS MATERIALIZED (SELECT sum(c_t)::BIGINT AS n FROM ct),
          terms AS (SELECT st.source,
              (c_st::DOUBLE / n_s) AS p, (c_t::DOUBLE / n) AS q
            FROM st JOIN ct USING (token) JOIN ns USING (source)
            CROSS JOIN n),
          agg AS (SELECT source,
              sum(p * ln(p / ((p + q) / 2.0))) AS kl_pm,
              sum(q * ln(q / ((p + q) / 2.0))) AS kl_qm_present,
              sum(q) AS q_cov
            FROM terms GROUP BY source)
          SELECT a.source, ns.n_s AS n_tokens,
            round((0.5 * kl_pm + 0.5 * (kl_qm_present +
              ln(2.0) * (1.0 - q_cov))) / ln(2.0), 4) + 0 AS js_bits
          FROM agg a JOIN ns ON ns.source = a.source ORDER BY a.source"""
      }, bench = true),

    // leakage-safe train/test split: whole near-dup clusters land on
    // one side (md5 of the cluster id), so a test doc's near-duplicate
    // can never sit in train. Oracle = the dedup_clusters recursive
    // CTE + the same split hash
    QueryDef("corpus_split_leakage",
      (s, d) => Dedup.leakageSafeSplit(t(s, d, "documents"), 3, 8, 4, 200),
      Some {
        s"""WITH RECURSIVE $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
          cl AS (SELECT d.doc_id,
              least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN
              (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
              ON m.src = d.doc_id)
          SELECT doc_id, cluster_id,
            CASE WHEN ('0x' || substr(md5('split:' || cluster_id), 1, 8))::BIGINT
              % 1000 < 200 THEN 'test' ELSE 'train' END AS split
          FROM cl ORDER BY doc_id"""
      }),

    // temperature-scaled source mixture weights (α=0.7, 1M-token
    // budget): ONE source groupBy + a single-row broadcast normalizer;
    // weight/epochs are float surfaces → rounded 6/4 dp, identical
    // operation order in both engines
    QueryDef("corpus_mix_weights",
      (s, d) => CorpusOps.sourceMixWeights(t(s, d, "documents"), 0.7, 1000000L),
      Some("""WITH per AS (SELECT source,
          coalesce(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))), 0)::BIGINT
            AS n_tokens
          FROM documents GROUP BY source)
        SELECT source, n_tokens,
          round(power(n_tokens, 0.7) / sum(power(n_tokens, 0.7)) OVER (), 6)
            AS weight,
          CASE WHEN n_tokens > 0
            THEN round(1000000.0 * (power(n_tokens, 0.7) /
              sum(power(n_tokens, 0.7)) OVER ()) / n_tokens, 4)
            ELSE 0.0 END AS epochs
        FROM per ORDER BY source""")),

    // quantile normalization across sources: within-source permille
    // mapped onto the corpus distribution — all integer rank math,
    // normalized scores are actual data values
    QueryDef("corpus_quantile_normalize",
      (s, d) => CorpusOps.quantileNormalize(t(s, d, "documents"), stopwords),
      Some {
        val w = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""
        s"""WITH sc AS (SELECT doc_id, source,
            coalesce(round(CAST(len(list_filter($w,
              t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE) /
              len($w), 4), -1.0) AS score
          FROM documents),
          ps AS (SELECT doc_id, source, score,
              row_number() OVER (PARTITION BY source
                ORDER BY score, doc_id) AS r,
              count(*) OVER (PARTITION BY source) AS n
            FROM sc),
          g AS (SELECT score AS norm_score,
              row_number() OVER (ORDER BY score, doc_id) AS gr,
              count(*) OVER () AS nn
            FROM sc)
          SELECT ps.doc_id, ps.source, ps.score, g.norm_score
          FROM ps JOIN g
            ON g.gr = (((1000 * ps.r + ps.n - 1) // ps.n) * g.nn + 999) // 1000
          ORDER BY ps.doc_id"""
      }, bench = true),

    // largest-remainder (Hamilton) quota apportionment — the integer
    // sampling plan sourceMixWeights feeds; pure long arithmetic, the
    // quotas sum to EXACTLY the budget in both engines
    QueryDef("corpus_quota_plan",
      (s, d) => CorpusOps.quotaPlan(t(s, d, "documents"), 10000L),
      Some("""WITH per AS (SELECT source,
          coalesce(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))), 0)::BIGINT
            AS n_tokens
          FROM documents GROUP BY source),
        tot AS MATERIALIZED (SELECT sum(n_tokens)::BIGINT AS n FROM per),
        q AS MATERIALIZED (SELECT source, n_tokens,
            (10000 * n_tokens) // n AS base, (10000 * n_tokens) % n AS rem
          FROM per CROSS JOIN tot),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
          FROM q),
        x AS MATERIALIZED (SELECT 10000 - sum(base)::BIGINT AS extras FROM r)
        SELECT source, n_tokens,
          (base + CASE WHEN rk <= extras THEN 1 ELSE 0 END)::BIGINT AS quota,
          rk <= extras AS got_extra
        FROM r CROSS JOIN x ORDER BY source"""), bench = true),

    // cross-source exact-dup attribution: sparse nonzero source-pair
    // matrix over distinct (fingerprint, source) — 32-byte hashes
    // cross the shuffle, fan-out bounded by |sources|² per key. The
    // synthetic corpus's dups are all INTRA-source, so the fixture
    // forges mirror sources from a doc_id slice (the corpus_cross_pairs
    // pattern) — otherwise the oracle would only ever compare empty
    QueryDef("corpus_dup_matrix",
      (s, d) => {
        val docs = t(s, d, "documents")
        val mirror = docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L)
          .withColumn("source", concat(lit("mirror:"), col("source")))
        Dedup.dupSourceMatrix(docs.unionByName(mirror))
      },
      Some("""WITH all_docs AS (
          SELECT text, source FROM documents
          UNION ALL
          SELECT text, 'mirror:' || source AS source FROM documents
          WHERE doc_id % 7 = 0),
        f AS (SELECT DISTINCT
          md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp, source
          FROM all_docs WHERE text IS NOT NULL)
        SELECT a.source AS source_a, b.source AS source_b,
          count(*)::BIGINT AS n_shared
        FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        GROUP BY a.source, b.source ORDER BY source_a, source_b""")),

    // one-row corpus data card (datasheet headline), same dup/empty
    // formulas as the per-source health report
    QueryDef("corpus_data_card",
      (s, d) => CorpusOps.dataCard(t(s, d, "documents")),
      Some("""SELECT count(*)::BIGINT AS n_docs,
          count(DISTINCT source)::BIGINT AS n_sources,
          count(DISTINCT lang)::BIGINT AS n_langs,
          coalesce(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))), 0)::BIGINT
            AS n_tokens,
          round(avg(n_chars), 2) AS mean_chars,
          round(1.0 - count(DISTINCT
              md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::DOUBLE
            / count(*), 4) AS dup_rate,
          round(avg(CASE WHEN text IS NULL OR length(trim(text)) = 0
            THEN 1.0 ELSE 0.0 END), 4) AS empty_share
        FROM documents"""), bench = true),

    // mojibake repair: the synthetic corpus is clean ASCII, so the
    // fixture forges UTF-8-as-cp1252 damage in-plan for doc_id % 9 == 0
    // (suffix built FROM Cleaning.mojibakePatterns — one source of
    // truth, zero literal drift between engines); oracle chains the
    // same literal replace()s
    QueryDef("corpus_fix_encoding",
      (s, d) => {
        val suffix = " " + Cleaning.mojibakePatterns.map(_._1).mkString("|")
        val broken = t(s, d, "documents").withColumn("text",
          when(col("doc_id") % 9 === 0, concat(col("text"), lit(suffix)))
            .otherwise(col("text")))
        Cleaning.fixEncoding(broken)
          .select(col("doc_id"), col("text"), col("was_broken"),
            col("n_chars"))
          .orderBy("doc_id")
      },
      Some {
        val suffix = " " + Cleaning.mojibakePatterns.map(_._1).mkString("|")
        val chain = Cleaning.mojibakePatterns.foldLeft("b.text") {
          case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
        }
        s"""WITH b AS (SELECT doc_id,
            CASE WHEN doc_id % 9 = 0 THEN text || '$suffix' ELSE text END
              AS text FROM documents),
          f AS (SELECT doc_id, b.text AS orig, $chain AS fixed FROM b)
          SELECT doc_id, fixed AS text,
            coalesce(fixed <> orig, FALSE) AS was_broken,
            length(fixed)::BIGINT AS n_chars
          FROM f ORDER BY doc_id"""
      }, bench = true),

    // context-limit head truncation: first 40 tokens rejoined, exact
    // kept-count and flag; clamped slice in both engines
    QueryDef("corpus_truncate_docs",
      (s, d) => Cleaning.truncateDocs(t(s, d, "documents"), 40),
      Some {
        s"""SELECT doc_id,
            CASE WHEN text IS NULL THEN NULL
              ELSE array_to_string(($toksSql)[1:40], ' ') END AS text_trunc,
            least(coalesce(len($toksSql), 0), 40)::BIGINT AS n_tokens_kept,
            coalesce(len($toksSql) > 40, FALSE) AS was_truncated
          FROM documents ORDER BY doc_id"""
      }, bench = true),

    // sentence-aligned chunking: the corpus has no natural punctuation,
    // so the fixture forges deterministic terminators in-plan (the
    // corpus_extract_html scaffold pattern — same integer arithmetic in
    // both engines), then packs sentences greedily to <= 12 tokens; the
    // oracle replays the sequential pack as a per-doc recursive CTE
    QueryDef("corpus_chunk_sentences",
      (s, d) => CorpusOps.chunkBySentences(
        forgeSentences(t(s, d, "documents")), maxTokens = 12),
      Some {
        s"""WITH RECURSIVE $forgedSentencesCte,
          sen1 AS (SELECT doc_id,
              list_filter(list_transform(
                regexp_split_to_array(trim(text), '[.!?][ \\t\\n\\x0B\\f\\r]+'),
                x -> regexp_replace(trim(x), '[.!?]+$$', '')),
                x -> x <> '') AS ss
            FROM b WHERE text IS NOT NULL),
          senx AS (SELECT doc_id, ss,
              unnest(range(1, len(ss)+1)) AS idx FROM sen1),
          sen AS (SELECT doc_id, idx, ss[idx] AS sent,
              len(regexp_split_to_array(ss[idx], '[ \\t\\n\\x0B\\f\\r]+')) AS ntok
            FROM senx),
          walk AS (
            SELECT doc_id, idx, sent, ntok, 1 AS chunk_id, ntok AS cur
            FROM sen WHERE idx = 1
            UNION ALL
            SELECT s.doc_id, s.idx, s.sent, s.ntok,
              CASE WHEN w.cur + s.ntok <= 12 THEN w.chunk_id
                ELSE w.chunk_id + 1 END,
              CASE WHEN w.cur + s.ntok <= 12 THEN w.cur + s.ntok
                ELSE s.ntok END
            FROM walk w JOIN sen s
              ON s.doc_id = w.doc_id AND s.idx = w.idx + 1)
          SELECT doc_id, chunk_id::BIGINT AS chunk_id,
            count(*)::BIGINT AS n_sentences, sum(ntok)::BIGINT AS n_tokens,
            string_agg(sent, ' ' ORDER BY idx) AS chunk_text
          FROM walk GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id"""
      }, bench = true),

    // chat-template SFT JSONL export: literal-template render around
    // the shared escape chain (to_json key order is engine-private —
    // the hand-built concat is byte-identical by construction); both
    // sides of every escape rule come from CorpusOps.jsonEscapes
    QueryDef("corpus_sft_export",
      (s, d) => CorpusOps.sftExport(t(s, d, "documents"), 10),
      Some(s"$sftExportSql ORDER BY doc_id"), bench = true),

    // round trip: the exported records re-parsed by DuckDB's OWN JSON
    // reader vs Spark's from_json — two independent parsers agreeing
    // on every content byte proves escape -> unescape is identity
    QueryDef("corpus_sft_roundtrip",
      (s, d) => CorpusOps.sftParse(
        CorpusOps.sftExport(t(s, d, "documents"), 10)),
      Some {
        s"""WITH exp AS ($sftExportSql)
          SELECT doc_id,
            json_extract_string(record, '$$.messages[0].content')
              AS sys_content,
            json_extract_string(record, '$$.messages[1].role') AS user_role,
            json_extract_string(record, '$$.messages[1].content')
              AS user_content,
            json_extract_string(record, '$$.messages[2].content')
              AS asst_content,
            json_array_length(record, '$$.messages')::BIGINT AS n_messages
          FROM exp ORDER BY doc_id"""
      }, bench = true),

    // per-source length-vs-quality Pearson correlation (trim-policy
    // advisor); ROUNDED ratio feeds corr in both engines
    QueryDef("corpus_quality_corr",
      (s, d) => CorpusOps.qualityLengthCorrelation(
        t(s, d, "documents"), stopwords),
      Some {
        val w = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""
        s"""WITH sc AS (SELECT source, n_chars::DOUBLE AS len,
            round(len(list_filter($w,
              t -> list_contains(${sqlList(stopwords)}, t)))::DOUBLE
              / len($w), 4) AS q
          FROM documents)
        SELECT source, count(*)::BIGINT AS n,
          round(corr(len, q), 4) AS len_quality_corr
        FROM sc GROUP BY source ORDER BY source"""
      }, bench = true),

    // END-TO-END corpus build: eval split → gopher gate → exact dedup →
    // decontaminate → token volume, one stats row — the composition
    // headline; oracle chains the per-stage CTE fragments
    QueryDef("corpus_e2e_stats",
      (s, d) => CorpusOps.buildCorpusStats(t(s, d, "documents"), stopwords, 97),
      Some {
        s"""WITH train AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 97 <> 0),
          w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                x -> x <> '') AS ws
            FROM train),
          gs AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
              round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                  / len(ws) END, 4) AS mean_word_len,
              round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                  / len(ws) END, 4) AS alpha_frac,
              len(list_filter(ws,
                x -> list_contains(${sqlList(stopwords)}, lower(x))))::BIGINT
                AS stop_hits
            FROM w),
          q AS MATERIALIZED (SELECT t.* FROM train t JOIN gs ON gs.doc_id = t.doc_id
            WHERE gs.n_words >= 10 AND gs.n_words <= 1000
              AND gs.mean_word_len >= 3.0 AND gs.mean_word_len <= 10.0
              AND gs.alpha_frac >= 0.8 AND gs.stop_hits >= 2),
          u AS (SELECT min(doc_id) AS doc_id FROM q
            GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))),
          qq AS MATERIALIZED (SELECT q.* FROM q WHERE doc_id IN (SELECT doc_id FROM u)),
          etoks AS (SELECT $toksSql AS w FROM documents WHERE doc_id % 97 = 0),
          eg AS (SELECT DISTINCT unnest(${shinglesSql("w")}) AS gram FROM etoks),
          dtoks AS (SELECT doc_id, $toksSql AS w FROM qq),
          dg AS (SELECT doc_id, unnest(${shinglesSql("w")}) AS gram FROM dtoks),
          bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN eg USING (gram)),
          clean AS (SELECT qq.* FROM qq
            WHERE doc_id NOT IN (SELECT doc_id FROM bad))
          SELECT (SELECT count(*) FROM train)::BIGINT AS n_input,
            (SELECT count(*) FROM q)::BIGINT AS n_quality,
            (SELECT count(*) FROM qq)::BIGINT AS n_unique,
            (SELECT count(*) FROM clean)::BIGINT AS n_clean,
            (SELECT coalesce(sum(len($toksSql)), 0) FROM clean)::BIGINT
              AS n_tokens_final"""
      }, bench = true),

    // pre-flight join cardinality: documents self-joined on lang —
    // per-key pair counts, the quadratic-blowup detector
    QueryDef("join_cardinality_probe",
      (s, d) => {
        val docs = t(s, d, "documents")
        Metrics.joinCardinalityProbe(docs, docs, "lang")
      },
      Some("""WITH l AS (SELECT lang, count(*)::BIGINT AS left_rows
            FROM documents GROUP BY lang),
          r AS (SELECT lang, count(*)::BIGINT AS right_rows
            FROM documents GROUP BY lang)
        SELECT l.lang AS lang, left_rows, right_rows,
          (left_rows * right_rows)::BIGINT AS pairs
        FROM l JOIN r ON l.lang IS NOT DISTINCT FROM r.lang
        ORDER BY pairs DESC, l.lang"""),
      bench = true),

    // skew-safe exact quantile panel: per-source doc-length p10/50/90
    // via integer permille rank math — no per-group percentile buffer
    QueryDef("corpus_length_quantiles",
      (s, d) => Metrics.quantilesByKey(t(s, d, "documents"),
        "source", "n_chars", Seq(100, 500, 900)),
      Some("""WITH r AS (SELECT source, n_chars,
            row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
            count(*) OVER (PARTITION BY source) AS n
          FROM documents WHERE n_chars IS NOT NULL)
        SELECT source, count(*)::BIGINT AS n,
          max(CASE WHEN rk <= (100 * n + 999) // 1000 THEN n_chars END) AS p100,
          max(CASE WHEN rk <= (500 * n + 999) // 1000 THEN n_chars END) AS p500,
          max(CASE WHEN rk <= (900 * n + 999) // 1000 THEN n_chars END) AS p900
        FROM r GROUP BY source ORDER BY source"""),
      bench = true),

    // BERT-style deterministic masking export: per-position md5 coins
    // under the Scala-computed integer threshold (both engines get the
    // same literal); 0-based positions in the hash string
    QueryDef("corpus_mlm_mask",
      (s, d) => CorpusOps.mlmMask(t(s, d, "documents"), 150, "mlm"),
      Some {
        val thr = 150L * 4294967296L / 1000L
        val coin = "('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) " +
          s"|| ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT < $thr"
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents
            WHERE text IS NOT NULL)
          SELECT doc_id,
            array_to_string([CASE WHEN $coin THEN '[MASK]' ELSE w[i + 1] END
              FOR i IN range(0, len(w))], ' ') AS input_text,
            coalesce(array_to_string([w[i + 1] FOR i IN range(0, len(w))
              IF $coin], ' '), '') AS targets,
            coalesce(len([i FOR i IN range(0, len(w)) IF $coin]), 0)::BIGINT AS n_masked,
            len(w)::BIGINT AS n_tokens
          FROM w ORDER BY doc_id"""
      }, bench = true),

    // Efraimidis-Spirakis weighted sample (∝ n_chars), deterministic
    // md5 coin, ROUNDED exponential keys, graft_topk heap selection
    QueryDef("corpus_weighted_sample",
      (s, d) => CorpusOps.weightedSample(t(s, d, "documents"),
        col("n_chars"), 100, "ws"),
      Some("""WITH sc AS (SELECT doc_id, n_chars::DOUBLE AS weight,
            round(ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              + 1) / 4294967296.0) / n_chars::DOUBLE, 9) AS key
          FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        r AS (SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rk
          FROM sc)
        SELECT doc_id, weight, key FROM r WHERE rk <= 100
        ORDER BY doc_id"""),
      bench = true),

    // HTML main-text extraction: markup forged in-plan from the shared
    // scaffold literals (plain docs every 3rd id exercise passthrough);
    // the oracle chains the same RE2∩Java patterns and entity replaces
    QueryDef("corpus_extract_html",
      (s, d) => {
        val wrapped = t(s, d, "documents").withColumn("text",
          when(col("doc_id") % 3 === 0, col("text"))
            .otherwise(concat(lit(htmlFixturePre), col("text"),
              lit(htmlFixtureSuf))))
        Cleaning.extractText(wrapped)
      },
      Some {
        val tagStrip = Cleaning.htmlBlockPatterns.foldLeft("html") {
          (acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')"
        }
        val entity = Cleaning.htmlEntities.foldLeft(tagStrip) {
          case (acc, (e, c)) => s"replace($acc, '$e', '${c.replace("'", "''")}')"
        }
        s"""WITH h AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN text
              ELSE '$htmlFixturePre' || text || '$htmlFixtureSuf' END
              AS html FROM documents),
          c AS MATERIALIZED (SELECT doc_id, html,
            trim(regexp_replace($entity, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS text_clean
            FROM h)
          SELECT doc_id, text_clean,
            (length(html) - length(text_clean))::BIGINT AS n_chars_removed
          FROM c ORDER BY doc_id"""
      }, bench = true),

    // quality-stratified audit sampling: 10 docs from each of 10
    // equal-population strata of the ROUNDED stopword-ratio
    // distribution; global rank is the skew-safe rankByKey (constant
    // key), stratum = ((rank-1)*B) div n — integer arithmetic, exact
    // in both engines; winners = smallest u32(md5) per stratum via
    // the graft_topk heap. (NOT corpus_stratified_sample — that name
    // is the per-language hash sampler above.)
    QueryDef("corpus_quality_strata",
      (s, d) => CorpusOps.stratifiedQualitySample(t(s, d, "documents"),
        stopwords, 10, 10, "strat"),
      Some {
        val w = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""
        s"""WITH q AS MATERIALIZED (SELECT doc_id,
            coalesce(round(CAST(len(list_filter($w,
              t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE) /
              len($w), 4), -1.0) AS score
          FROM documents),
          r AS (SELECT doc_id, score,
            row_number() OVER (ORDER BY score, doc_id) AS rk,
            count(*) OVER () AS n FROM q),
          b AS (SELECT doc_id, score, ((rk - 1) * 10) // n AS bucket FROM r),
          s AS (SELECT *, row_number() OVER (PARTITION BY bucket
            ORDER BY ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
              doc_id) AS srk FROM b)
          SELECT doc_id, bucket::BIGINT AS bucket, score FROM s
          WHERE srk <= 10 ORDER BY doc_id"""
      }, bench = true))

  val all: Seq[QueryDef] =
    relational ++ metrics ++ scalars ++ udm ++ text ++ dedup ++ similarity ++
      multimodal ++ corpus

  // a duplicated name would silently SHADOW the earlier query in the
  // maps below (Map last-wins) — the earlier operator's oracle coverage
  // would vanish without any failure; fail loud at class init instead
  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names: " + all.groupBy(_.name).collect {
      case (n, ds) if ds.size > 1 => n }.mkString(", "))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim)).toMap

  val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
