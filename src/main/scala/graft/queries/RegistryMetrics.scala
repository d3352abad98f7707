package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `metrics` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryMetrics {

  /** Forged engine-monitoring panel for the alert-policy oracles —
    * deterministic doc_id formulas (SF-scaling, null-twin-consistent:
    * text never enters): 3 queries, per-query consecutive batch ids;
    * q0's state grows every batch (the eviction-bug shape), q1 is
    * flat, q2 saw-tooths; durations cycle 0..1980 ms. The SQL twin
    * [[forgedEnginePanelSql]] is the same formulas verbatim. */
  private def forgedEnginePanel(docs: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(docs).select(
      concat(lit("q"), (col("doc_id") % 3).cast("string")).as("query_name"),
      expr("doc_id div 3").as("batch_id"),
      (((col("doc_id") * 37) % 100) * 20).as("batch_duration_ms"),
      when(col("doc_id") % 3 === 0, expr("doc_id div 3") * 100)
        .when(col("doc_id") % 3 === 1, lit(500L))
        .otherwise((expr("doc_id div 3") % 5) * 50).as("state_bytes"))

  private val forgedEnginePanelSql: String =
    """p AS (SELECT 'q' || (doc_id % 3)::VARCHAR AS query_name,
        doc_id // 3 AS batch_id,
        ((doc_id * 37) % 100) * 20 AS batch_duration_ms,
        CASE WHEN doc_id % 3 = 0 THEN (doc_id // 3) * 100
             WHEN doc_id % 3 = 1 THEN 500
             ELSE ((doc_id // 3) % 5) * 50 END AS state_bytes
      FROM documents)"""

  val defs: Seq[QueryDef] = Seq(
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

    // Streaming ENGINE observability (the reference dashboard covers
    // DATA metrics; state size / watermark lag / late-row loss are
    // engine-side): attachMonitoring writes one JSONL row per
    // (query, micro-batch) from a StreamingQueryListener, and this
    // panel drains a 3-file fixture with two FORGED-LATE rows —
    // exact counts (3 input batches, 13 rows, 2 dropped by the
    // watermark) plus tolerance booleans for the wall-clock columns
    // (the a3_file_latency pattern). Deterministic because
    // maxFilesPerTrigger=1 + AvailableNow + spaced mtimes pin the
    // batch sequence.
    QueryDef("stream_monitoring_panel",
      (s, d) => graft.streaming.StreamingPipeline.monitoringDemoPanel(s),
      Some("""SELECT 3::BIGINT AS n_input_batches, 13::BIGINT AS rows_in,
          2::BIGINT AS rows_dropped_late, TRUE AS saw_state,
          TRUE AS saw_state_bytes, TRUE AS durations_ok,
          TRUE AS watermark_advanced"""), bench = true),

    // Watermark-skew ALERT over the monitoring sink (r14 verdict #4 —
    // operationalizing the as-of 8%-drop incident): forged-skew drain
    // where batches 2 and 3 each lose 2 of 3 rows to the watermark
    // (ratio 2/3 > 0.5, twice ≥ k=2) → the alert FIRES with exact
    // counts; the late rows sit far below EITHER candidate filter
    // watermark so the panel is one-batch-lag-robust.
    QueryDef("stream_skew_alerts",
      (s, d) => graft.streaming.StreamingPipeline.skewAlertDemoPanel(s),
      Some("""SELECT 'graft_skew_demo' AS query_name,
          4::BIGINT AS n_input_batches, 2::BIGINT AS n_breach_batches,
          16::BIGINT AS rows_in, 4::BIGINT AS rows_dropped_late,
          TRUE AS alert""")),

    // BACKLOG alert policy (batch_duration_ms vs the trigger budget —
    // the falling-behind signal): the policy arithmetic is oracled
    // over a FORGED engine panel whose duration/state formulas derive
    // from doc_id (SF-scaling, twin-consistent), so a wrong threshold
    // compare or k-of-n fold hash-mismatches; the real-drain
    // integration is spec-side (monitoringTable read-back).
    QueryDef("stream_backlog_alerts",
      (s, d) => graft.streaming.StreamingPipeline.backlogAlerts(
        forgedEnginePanel(t(s, d, "documents")), slowMs = 1500, kBatches = 2),
      Some(s"""WITH $forgedEnginePanelSql
        SELECT query_name, count(*)::BIGINT AS n_batches,
          sum(CASE WHEN batch_duration_ms > 1500 THEN 1 ELSE 0 END)::BIGINT
            AS n_slow_batches,
          max(batch_duration_ms)::BIGINT AS max_duration_ms,
          sum(CASE WHEN batch_duration_ms > 1500 THEN 1 ELSE 0 END) >= 2
            AS alert
        FROM p GROUP BY query_name ORDER BY query_name"""), bench = true),

    // STATE-GROWTH alert policy (strictly-monotone state_bytes tail =
    // eviction bug): same forged panel — q0 grows every batch (fires),
    // q1 is flat, q2 saw-tooths (fires only when the tail happens to
    // climb — both engines compute the same verdict from batch count)
    QueryDef("stream_state_growth_alerts",
      (s, d) => graft.streaming.StreamingPipeline.stateGrowthAlerts(
        forgedEnginePanel(t(s, d, "documents")), kBatches = 3),
      Some(s"""WITH $forgedEnginePanelSql,
        dd AS (SELECT query_name, batch_id, state_bytes,
            state_bytes - lag(state_bytes) OVER
              (PARTITION BY query_name ORDER BY batch_id) AS d,
            row_number() OVER
              (PARTITION BY query_name ORDER BY batch_id DESC) AS rk
          FROM p)
        SELECT query_name, count(*)::BIGINT AS n_batches,
          max(CASE WHEN rk = 1 THEN state_bytes END)::BIGINT
            AS last_state_bytes,
          sum(CASE WHEN rk <= 3 AND d > 0 THEN 1 ELSE 0 END)::BIGINT
            AS n_tail_growth,
          sum(CASE WHEN rk <= 3 AND d > 0 THEN 1 ELSE 0 END) = 3 AS alert
        FROM dd GROUP BY query_name ORDER BY query_name"""), bench = true),

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

    // pandas-style merge_asof, nearest direction with tolerance: for
    // every purchase, the user's closest view within a day — union-tag
    // + per-key window (ONE exchange, no join); oracle is the argmin
    // over the tolerance-bounded join with the IDENTICAL tie rule
    // (backward wins equal |lag|, max id wins equal ts)
    QueryDef("asof_merge_nearest",
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
        val probe = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val ref = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts")
        graft.util.SparkUtil.mergeAsOf(probe, ref, "user_id", "ts",
            "event_id", Nil, "nearest", 86400L)
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"), col("asof_lag_us"))
          .orderBy("event_id")
      },
      Some("""WITH p AS MATERIALIZED (SELECT event_id, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'purchase'
            AND user_id IS NOT NULL AND ts IS NOT NULL),
        r AS MATERIALIZED (SELECT event_id AS rid, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS rus
          FROM events WHERE event_type = 'view'
            AND user_id IS NOT NULL AND ts IS NOT NULL),
        j AS (SELECT p.event_id, r.rid, p.us - r.rus AS lag_us,
            row_number() OVER (PARTITION BY p.event_id
              ORDER BY abs(p.us - r.rus),
                CASE WHEN r.rus <= p.us THEN 0 ELSE 1 END,
                r.rid DESC) AS rk
          FROM p JOIN r ON p.user_id = r.user_id
            AND abs(p.us - r.rus) <= 86400000000)
        SELECT p.event_id, p.user_id, j.rid AS asof_event_id,
          j.lag_us AS asof_lag_us
        FROM p LEFT JOIN (SELECT * FROM j WHERE rk = 1) j
          ON p.event_id = j.event_id
        ORDER BY p.event_id"""), bench = true),

    // multi-key merge_asof (pandas by=[user_id, day] parity): for
    // every purchase, the user's nearest CLICK on the SAME calendar
    // day — the composite key is (user_id, day), so cross-day clicks
    // can never match even when closer in time; same union-tag
    // one-exchange plan, partition key widened to a struct. Oracle:
    // argmin over the two-key equi-join with the identical tie rule.
    QueryDef("asof_merge_multikey",
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
        val probe = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            to_date(col("ts")).as("day"), col("ts"))
        val ref = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            to_date(col("ts")).as("day"), col("ts"))
        graft.util.SparkUtil.mergeAsOf(probe, ref,
            Seq("user_id", "day"), "ts", "event_id",
            Nil, "nearest", -1L)
          .select(col("event_id"), col("user_id"), col("day"),
            col("asof_event_id"), col("asof_lag_us"))
          .orderBy("event_id")
      },
      Some("""WITH p AS MATERIALIZED (SELECT event_id, user_id,
            CAST(ts AS DATE) AS day, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'purchase'
            AND user_id IS NOT NULL AND ts IS NOT NULL),
        r AS MATERIALIZED (SELECT event_id AS rid, user_id,
            CAST(ts AS DATE) AS day, epoch_us(CAST(ts AS TIMESTAMP)) AS rus
          FROM events WHERE event_type = 'click'
            AND user_id IS NOT NULL AND ts IS NOT NULL),
        j AS (SELECT p.event_id, r.rid, p.us - r.rus AS lag_us,
            row_number() OVER (PARTITION BY p.event_id
              ORDER BY abs(p.us - r.rus),
                CASE WHEN r.rus <= p.us THEN 0 ELSE 1 END,
                r.rid DESC) AS rk
          FROM p JOIN r ON p.user_id = r.user_id AND p.day = r.day)
        SELECT p.event_id, p.user_id, p.day, j.rid AS asof_event_id,
          j.lag_us AS asof_lag_us
        FROM p LEFT JOIN (SELECT * FROM j WHERE rk = 1) j
          ON p.event_id = j.event_id
        ORDER BY p.event_id""")),

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
        GROUP BY c.user_id ORDER BY user_id"""), bench = true),

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

    // bounded-state rolling distinct: one 4 KiB HLL sketch per
    // (label, day) cell, any window answered by unioning w sketches
    // (union of HLLs = HLL of the union) — the 100 TB dashboard's
    // option next to the exact membership-set panel. Audit twin joins
    // approx vs exact 1:1 on the shared end-day universe; the
    // tolerance boolean is the oracled column (hll_approx_distinct
    // pattern)
    QueryDef("metrics_rolling_distinct_hll",
      (s, d) => Metrics.rollingDistinctUsersHllAudit(t(s, d, "events"), 7),
      Some("""WITH t AS MATERIALIZED (SELECT DISTINCT event_type, user_id,
            CAST(ts AS DATE) AS day
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        d AS MATERIALIZED (SELECT DISTINCT event_type, day FROM t)
        SELECT d.event_type, d.day AS end_day,
          count(DISTINCT t.user_id)::BIGINT AS n_distinct_users,
          TRUE AS within_tol
        FROM d JOIN t ON t.event_type IS NOT DISTINCT FROM d.event_type
          AND t.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1, 2 ORDER BY d.event_type NULLS FIRST, end_day""")),

    // pure sketch panel (no exact twin in-plan) — the production/bench
    // row; approx values are engine-specific, so the oracle pins the
    // key universe + positivity (the cluster_sample_only discipline)
    QueryDef("rolling_distinct_hll_only",
      (s, d) => Metrics.rollingDistinctUsersHll(t(s, d, "events"), 7)
        .select(col("event_type"), col("end_day"),
          (col("n_distinct_approx") > 0).as("n_positive")),
      Some("""WITH t AS MATERIALIZED (SELECT DISTINCT event_type,
            CAST(ts AS DATE) AS day
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        SELECT event_type, day AS end_day, TRUE AS n_positive
        FROM t ORDER BY event_type NULLS FIRST, end_day"""),
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

    // batch-mode audit of the LIVE bounded-state HLL pipeline
    // (rollingDistinctHllPipeline — ONE stateful sliding-window
    // hll_sketch_agg; no dedup stage because HLL insertion is
    // idempotent): the SAME function joined 1:1 against the exact
    // rollingDistinctPipeline on the full sliding-window universe
    // (universe agreement is itself under test — a key mismatch drops
    // rows and fails the oracle's row count); within_tol pins
    // |approx − exact| ≤ 5%·exact (≳3σ at lgConfigK=12, and the
    // sketch is sparse-mode EXACT at fixture cardinalities)
    QueryDef("rolling_distinct_hll_windows",
      (s, d) => {
        val exact = graft.streaming.StreamingPipeline
          .rollingDistinctPipeline(t(s, d, "events"), 7)
        val approx = graft.streaming.StreamingPipeline
          .rollingDistinctHllPipeline(t(s, d, "events"), 7)
          .withColumnRenamed("event_type", "__k")
          .withColumnRenamed("end_day", "__d")
        exact.join(approx,
            col("event_type") <=> col("__k") && col("end_day") === col("__d"))
          .select(col("end_day"), col("event_type"), col("n_distinct_users"),
            (abs(col("n_distinct_approx") - col("n_distinct_users"))
              .cast("double") <= lit(0.05)
                * col("n_distinct_users").cast("double")).as("within_tol"))
          .orderBy(col("event_type"), col("end_day"))
      },
      Some("""WITH t AS MATERIALIZED (SELECT DISTINCT event_type, user_id,
            CAST(ts AS DATE) AS day
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        c AS (SELECT DISTINCT event_type, user_id,
            day + i.o::INTEGER AS end_day
          FROM t CROSS JOIN (SELECT unnest(range(0, 7)) AS o) i)
        SELECT end_day, event_type,
          count(*)::BIGINT AS n_distinct_users, TRUE AS within_tol
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

    // Mann-Whitney U rank-sum per label over per-user counts: average
    // ranks via the value-group identity 2R_a = Σ t_a(2c + t + 1) —
    // exact integer in DECIMAL/HUGEINT (BIGINT t³ overflows at
    // t > 2e6), tie-corrected sigma, one fixed-order float tail
    QueryDef("metrics_mann_whitney",
      (s, d) => Metrics.mannWhitneyArms(t(s, d, "events")),
      Some("""WITH pu AS MATERIALIZED (SELECT event_type,
            user_id % 2 AS arm, count(*)::BIGINT AS v
          FROM events WHERE user_id IS NOT NULL
          GROUP BY event_type, user_id),
        g AS (SELECT event_type, v, count(*)::BIGINT AS t,
            sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS ta
          FROM pu GROUP BY 1, 2),
        w AS (SELECT event_type, t, ta,
            coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0)::BIGINT AS cum
          FROM g),
        a AS (SELECT event_type,
            sum(ta::HUGEINT * (2 * cum + t + 1)) AS r2a,
            sum(ta)::BIGINT AS n_a, sum(t - ta)::BIGINT AS n_b,
            sum(t)::BIGINT AS n,
            sum(t::HUGEINT * t * t - t) AS tie
          FROM w GROUP BY 1),
        u AS (SELECT event_type, n_a, n_b, n,
            r2a - n_a::HUGEINT * (n_a + 1) AS u2a,
            n::HUGEINT * (n - 1) * (n + 1) - tie AS innr
          FROM a WHERE n_a > 0 AND n_b > 0 AND n >= 2),
        z AS (SELECT event_type, n_a, n_b, u2a,
            (u2a - n_a::HUGEINT * n_b)::DOUBLE
              / sqrt((n_a::HUGEINT * n_b)::DOUBLE * innr::DOUBLE
                / (3.0 * (n::HUGEINT * (n - 1))::DOUBLE)) AS zv
          FROM u WHERE innr > 0)
        SELECT event_type, n_a, n_b, u2a::BIGINT AS u2_a,
          round(zv, 4) AS z, abs(round(zv, 4)) > 1.96 AS significant
        FROM z ORDER BY event_type NULLS FIRST"""), bench = true),

    // CUPED variance-reduced lift: pre/post split at the global
    // epoch-us midpoint, theta from pooled exact-integer moments in
    // DECIMAL/HUGEINT, fixed-order float tail (midpoint test inside
    // the aggregate projection — never a conditioned scalar cross)
    QueryDef("metrics_cuped",
      (s, d) => Metrics.cupedLift(t(s, d, "events")),
      Some("""WITH e AS MATERIALIZED (SELECT event_type, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
        pu AS (SELECT event_type, user_id,
            sum(CASE WHEN us < mid THEN 1 ELSE 0 END)::BIGINT AS x,
            sum(CASE WHEN us >= mid THEN 1 ELSE 0 END)::BIGINT AS y
          FROM e CROSS JOIN m GROUP BY 1, 2),
        p AS (SELECT event_type, count(*)::BIGINT AS n,
            sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
            sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx,
            sum(y::HUGEINT * y) AS syy,
            sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
            sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END)::BIGINT AS sxa,
            sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END)::BIGINT AS sya,
            sum(CASE WHEN user_id % 2 = 0 THEN x::HUGEINT * y END) AS sxya,
            sum(CASE WHEN user_id % 2 = 0 THEN x::HUGEINT * x END) AS sxxa,
            sum(CASE WHEN user_id % 2 = 0 THEN y::HUGEINT * y END) AS syya
          FROM pu GROUP BY 1),
        v AS (SELECT *, (n - n_a)::BIGINT AS n_b,
            n::HUGEINT * sxx - sx::HUGEINT * sx AS vx,
            n::HUGEINT * syy - sy::HUGEINT * sy AS vy,
            n::HUGEINT * sxy - sx::HUGEINT * sy AS cxy
          FROM p),
        tt AS (SELECT *, cxy::DOUBLE / vx::DOUBLE AS th,
            sya::DOUBLE / n_a::DOUBLE
              - (sy - sya)::DOUBLE / n_b::DOUBLE
              - cxy::DOUBLE / vx::DOUBLE
                * (sxa::DOUBLE / n_a::DOUBLE
                  - (sx - sxa)::DOUBLE / n_b::DOUBLE) AS adj
          FROM v WHERE n_a >= 2 AND n_b >= 2 AND vx > 0 AND vy > 0),
        se AS (SELECT *, sqrt(greatest(
            (n_a::DOUBLE * (syya::DOUBLE
                - 2.0::DOUBLE * th * sxya::DOUBLE
                + th * th * sxxa::DOUBLE)
              - (sya::DOUBLE - th * sxa::DOUBLE)
                * (sya::DOUBLE - th * sxa::DOUBLE))
              / (n_a::HUGEINT * n_a * (n_a - 1))::DOUBLE
            + (n_b::DOUBLE * ((syy - syya)::DOUBLE
                - 2.0::DOUBLE * th * (sxy - sxya)::DOUBLE
                + th * th * (sxx - sxxa)::DOUBLE)
              - ((sy - sya)::DOUBLE - th * (sx - sxa)::DOUBLE)
                * ((sy - sya)::DOUBLE - th * (sx - sxa)::DOUBLE))
              / (n_b::HUGEINT * n_b * (n_b - 1))::DOUBLE,
            0.0::DOUBLE)) AS sev
          FROM tt)
        SELECT event_type, n_a, n_b,
          round(th, 4) AS theta,
          round(sya::DOUBLE / n_a::DOUBLE
            - (sy - sya)::DOUBLE / n_b::DOUBLE, 4) AS diff_raw,
          round(adj, 4) AS diff_adj,
          round(sev, 4) AS se,
          round(adj - 1.96::DOUBLE * sev, 4) AS ci_lo,
          round(adj + 1.96::DOUBLE * sev, 4) AS ci_hi,
          round(cxy::DOUBLE * cxy::DOUBLE
            / (vx::DOUBLE * vy::DOUBLE), 4) AS var_reduction
        FROM se ORDER BY event_type NULLS FIRST"""), bench = true),

    // difference-in-differences over the same pre/post design as
    // metrics_cuped: exact integer arm x period sums, four fixed-order
    // divisions and three subtractions
    QueryDef("metrics_did",
      (s, d) => Metrics.didLift(t(s, d, "events")),
      Some("""WITH e AS MATERIALIZED (SELECT event_type, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
        pu AS (SELECT event_type, user_id,
            sum(CASE WHEN us < mid THEN 1 ELSE 0 END)::BIGINT AS x,
            sum(CASE WHEN us >= mid THEN 1 ELSE 0 END)::BIGINT AS y
          FROM e CROSS JOIN m GROUP BY 1, 2),
        p AS (SELECT event_type,
            sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
            sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
            sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END)::BIGINT AS xa,
            sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END)::BIGINT AS ya,
            sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END)::BIGINT AS xb,
            sum(CASE WHEN user_id % 2 = 1 THEN y ELSE 0 END)::BIGINT AS yb,
            sum(CASE WHEN user_id % 2 = 0
              THEN (y - x)::HUGEINT * (y - x) END) AS dda,
            sum(CASE WHEN user_id % 2 = 1
              THEN (y - x)::HUGEINT * (y - x) END) AS ddb
          FROM pu GROUP BY 1),
        se AS (SELECT *,
            ya::DOUBLE / n_a::DOUBLE - xa::DOUBLE / n_a::DOUBLE
              - (yb::DOUBLE / n_b::DOUBLE - xb::DOUBLE / n_b::DOUBLE)
              AS didv,
            sqrt((n_a::HUGEINT * dda
                - (ya - xa)::HUGEINT * (ya - xa))::DOUBLE
                / (n_a::HUGEINT * n_a * (n_a - 1))::DOUBLE
              + (n_b::HUGEINT * ddb
                - (yb - xb)::HUGEINT * (yb - xb))::DOUBLE
                / (n_b::HUGEINT * n_b * (n_b - 1))::DOUBLE) AS sev
          FROM p WHERE n_a >= 2 AND n_b >= 2)
        SELECT event_type, n_a, n_b,
          round(xa::DOUBLE / n_a::DOUBLE, 4) AS pre_a,
          round(ya::DOUBLE / n_a::DOUBLE, 4) AS post_a,
          round(xb::DOUBLE / n_b::DOUBLE, 4) AS pre_b,
          round(yb::DOUBLE / n_b::DOUBLE, 4) AS post_b,
          round(didv, 4) AS did,
          round(sev, 4) AS se,
          round(didv - 1.96::DOUBLE * sev, 4) AS ci_lo,
          round(didv + 1.96::DOUBLE * sev, 4) AS ci_hi
        FROM se ORDER BY event_type NULLS FIRST"""), bench = true),

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
}
