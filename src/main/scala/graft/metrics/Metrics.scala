package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's operational-metrics surface (SURVEY.md §2.4 A1–A7 —
  * log-based counter metrics, rate alignment, latency percentiles,
  * absence alerts; reference terraform/main.tf:238–548,
  * dashboards/main_operational_dashboard.json) re-expressed as windowed
  * aggregations over a timestamped event stream.
  *
  * All aggregations are keyed by (time bucket × label): partial
  * aggregation collapses each partition to bucket-cardinality before the
  * shuffle, so these scale with #buckets, not #events. For streaming use
  * the same expressions compose with `window()` + watermark (see
  * graft.streaming.StreamingPipeline).
  */
object Metrics {

  /** A1-analog — counts by label (the per-sniffer upload/heartbeat
    * counters, terraform/main.tf:238–311). */
  def countsByType(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")

  /** A2-analog — conditional error-share per day (the error-rate
    * dashboard widgets, dashboard.json:141–156). The bucket is a DATE,
    * not a midnight timestamp: a daily bucket is calendar-valued, and
    * DuckDB's `date_trunc('day', …)` returns DATE (sub-day units keep
    * TIMESTAMP) — emitting DATE keeps the cross-engine output type
    * identical instead of leaning on compare-side canonicalization. */
  def errorShareDaily(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        round(avg(when(col("event_type") === "error", 1.0).otherwise(0.0)), 4).as("error_share"))
      .orderBy("day")

  /** A4/A5 — tumbling-window counts + per-second rate by label
    * (ALIGN_RATE over 60 s periods, dashboard.json:30–43). Buckets via
    * `date_trunc` so the batch and DuckDB-oracle semantics align exactly;
    * the streaming pipeline uses `window()` with identical results. */
  def windowedRates(events: DataFrame, unit: String = "hour"): DataFrame = {
    val secs = unit match {
      case "minute" => 60d; case "hour" => 3600d; case "day" => 86400d
      case other => throw new IllegalArgumentException(
        s"windowedRates unit must be minute|hour|day, got '$other'")
    }
    events.groupBy(date_trunc(unit, col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(count(lit(1)) / lit(secs), 6).as("rate_per_sec"))
      .orderBy("bucket", "event_type")
  }

  /** A6 — exact percentiles per label (the latency-distribution p95
    * chart, terraform/main.tf:528–548). Exact `percentile` matches the
    * DuckDB oracle; at 100 TB swap in `percentile_approx` (same plan
    * shape, sketch-mergeable) — see [[approxPercentiles]]. */
  def valuePercentiles(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        round(max("value"), 2).as("max_value"))
      .orderBy("event_type")

  /** A6 at scale — mergeable sketch percentiles; ~the dashboard's
    * exponential-bucket DISTRIBUTION metric. Oracled via the
    * tolerance-boolean pattern: the output carries the EXACT percentiles
    * (DuckDB-reproducible) plus per-quantile booleans asserting the
    * sketch value lands inside the exact (p±0.01)-quantile window — the
    * oracle emits literal TRUE, so the hash matches iff the sketch holds
    * its guarantee. The window is a RANK bound, which is what the
    * KLL-style sketch actually promises (rank error ≤ 1/accuracy =
    * 1e-4 ≪ 0.01): a value-relative tolerance would flake on small or
    * heavy-tailed groups where adjacent order statistics differ by more
    * than any fixed percentage. Scalar DOUBLE/BOOLEAN columns only (an
    * array output breaks the driver's pandas sort). */
  def approxPercentiles(events: DataFrame): DataFrame = {
    // exact quantiles: the three reported + the ±0.01 rank windows
    val qs = Seq(0.5, 0.95, 0.99, 0.49, 0.51, 0.94, 0.96, 0.98, 1.0)
    def ex(q: Double): Column = element_at(col("exact"), qs.indexOf(q) + 1)
    def inWindow(approx: Column, lo: Double, hi: Double): Column =
      approx >= ex(lo) && approx <= ex(hi)
    events.groupBy("event_type")
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)),
          lit(10000)).as("pcts"),
        expr(s"percentile(value, array(${qs.mkString(", ")}))").as("exact"))
      .select(col("event_type"),
        round(ex(0.5), 4).as("p50"),
        round(ex(0.95), 4).as("p95"),
        round(ex(0.99), 4).as("p99"),
        inWindow(element_at(col("pcts"), 1), 0.49, 0.51).as("p50_within_tol"),
        inWindow(element_at(col("pcts"), 2), 0.94, 0.96).as("p95_within_tol"),
        inWindow(element_at(col("pcts"), 3), 0.98, 1.0).as("p99_within_tol"))
      .orderBy("event_type")
  }

  /** A6 — percent_rank per key WITHOUT the low-cardinality window
    * funnel. `Window.partitionBy(key)` over a ≤K-value key funnels the
    * whole table through K reducers — correct, but at 100 TB that is
    * the entire dataset through (say) 5 tasks. This operator computes
    * the identical result with every stage P-way parallel:
    *
    *  1. range-partition + local sort on (key ++ order) — each of P
    *     partitions holds a contiguous slice of the global order;
    *  2. per-(partition, key) counts — a tiny (≤ P×K rows) aggregate
    *     with map-side combine;
    *  3. per-key running offsets + totals over that TINY table (the
    *     only per-key window, over ≤ P×K rows — never the data);
    *  4. local row_number within (partition, key) — a window whose
    *     partition key has cardinality ≥ P, so its exchange spreads —
    *     plus the broadcast offset = the global rank;
    *  5. pct = (rank−1)/(n_k−1), 0 when n_k = 1 (SQL convention).
    *
    * Correctness requires the range exchange to be planned ONCE
    * (ReuseExchange — spec-asserted): ranks and offsets must see the
    * same partition boundaries. Requires a TOTAL order (include a
    * tiebreaker column): rank ties are resolved by position, like
    * `percent_rank` over a unique ordering.
    *
    * For a HIGH-cardinality key, use a plain window instead — the
    * per-key funnel doesn't exist there, and step 2's P×K aggregate
    * would not be tiny. */
  def percentRankByKey(df: DataFrame, keyCol: String,
                       orderCols: Seq[String]): DataFrame =
    rankByKey(df, keyCol, orderCols)
      .withColumn("pct_rank",
        when(col("_nk") > 1,
          (col("_rank") - 1).cast("double") / (col("_nk") - 1).cast("double"))
          .otherwise(0.0))
      .drop("_nk", "_rank")

  /** The rank-producing core of [[percentRankByKey]] (same algorithm,
    * same ReuseExchange contract, same null-key handling): returns the
    * input plus `_rank` (1-based global rank within `keyCol` under the
    * TOTAL order `orderCols` — include a tiebreaker) and `_nk` (key
    * group size). Exposed for operators that need the rank itself
    * (e.g. [[graft.analytics.CorpusOps.interleave]]'s round-robin turn)
    * without the per-key window funnel. */
  def rankByKey(df: DataFrame, keyCol: String,
                orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the correctness contract above is only guaranteed when the range
    // exchange is planned once — guard the conf at runtime instead of
    // returning silently wrong ranks under exchange.reuse=false with a
    // nondeterministic upstream
    require(df.sparkSession.sessionState.conf.exchangeReuseEnabled,
      "rankByKey requires spark.sql.exchange.reuse=true: rank and " +
        "offset stages must observe the same sampled range boundaries")
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols = (keyCol +: orderCols).map(col)
    // EAGER MATERIALIZATION — load-bearing, not an optimization.
    // ReuseExchange shares the exchange WRITE, but under AQE the
    // coalesced-READ spec is decided per consumer stage: the offsets
    // consumer and the rank consumer can legally observe DIFFERENT
    // merged partition maps of the same shuffle output (observed in
    // round 9: a downstream union + coalesce(1) shifted one consumer's
    // advisory sizes, _pid diverged, and ranks went silently wrong —
    // duplicate ranks and ranks > n). Checkpointing the pid-stamped
    // table pins ONE partition map for every consumer. Cost: one
    // cached copy of the ranked input (rankByKey inputs in this repo
    // are score/key projections, not raw corpora) — the price of an
    // exact distributed rank. The copy lives until the ContextCleaner
    // collects the unreferenced RDD (no explicit unpersist hook — the
    // consumers are lazy, so the operator cannot know when the last
    // action ran); localCheckpoint also trades fault tolerance for
    // speed — a long-running cluster job that must survive executor
    // loss should swap in reliable checkpointing (setCheckpointDir)
    // at this call site.
    val withPid = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val cnts = withPid.groupBy(col("_pid"), col(keyCol)).agg(count(lit(1)).as("_cnt"))
    val wOff = Window.partitionBy(keyCol).orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cnts
      .withColumn("_offset", coalesce(sum("_cnt").over(wOff), lit(0L)))
      .withColumn("_nk", sum("_cnt").over(Window.partitionBy(keyCol)))
      .drop("_cnt")
    val wLocal = Window.partitionBy(col("_pid"), col(keyCol))
      .orderBy(orderCols.map(col): _*)
    // null-safe join on the key: SQL window PARTITION BY groups NULL
    // keys together, so a plain equi-join (null != null) would silently
    // drop every null-key row
    val off = offsets.withColumnRenamed(keyCol, "_k")
      .withColumnRenamed("_pid", "_opid")
    withPid.join(broadcast(off),
        col("_pid") === col("_opid") && col(keyCol) <=> col("_k"))
      .drop("_opid", "_k")
      .withColumn("_rank", row_number().over(wLocal) + col("_offset"))
      .drop("_pid", "_offset")
  }

  /** A7 — liveness gap detection (the "no heartbeat for 15 min" alert,
    * terraform/main.tf:583–622) as an event-time lag window: per label,
    * the largest silent gap and the count of gaps over the threshold. */
  def maxGapPerUser(events: DataFrame, thresholdSecs: Double = 3600): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    events
      .select(col("user_id"),
        (col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double")).as("gap"))
      .groupBy("user_id")
      .agg(round(max("gap"), 3).as("max_gap_secs"),
        sum(when(col("gap") > thresholdSecs, 1L).otherwise(0L)).as("n_gaps_over"))
      .orderBy("user_id")
  }

  /** As-of join (event-time enrichment): attach to each fact row the
    * most recent prior anchor row of the same key — here, each purchase
    * gets its user's latest preceding signup. Implemented as ONE
    * shuffle (window over user) instead of a range self-join: the
    * running `last(anchor_ts ignoreNulls)` IS the as-of lookup. At
    * 100 TB this is the only as-of formulation that avoids an O(n²)
    * range join — state per key is a single timestamp. */
  def asOfEnrichment(events: DataFrame, anchorType: String = "signup",
                     factType: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("anchor_ts",
        last(when(col("event_type") === anchorType, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === factType)
      .select(col("event_id"), col("user_id"),
        round(col("ts").cast("double") - col("anchor_ts").cast("double"), 3)
          .as("secs_since_anchor"))
      .orderBy("event_id")
  }

  /** A6 (exact reference shape) — the latency-distribution metric's
    * exponential buckets: scale 1, growth 1.5, 20 finite buckets
    * (reference terraform/main.tf:528–548). Bucket 0 = underflow (<1),
    * bucket 20 = overflow. Deterministic (log boundary values don't
    * occur in 2-dp data), so fully oracle-checkable — unlike a sketch. */
  def histogramBuckets(events: DataFrame): DataFrame =
    events
      .select(col("value"),
        when(col("value") < 1, 0L)
          .otherwise(least(floor(log(col("value")) / log(lit(1.5))).cast("long") + 1, lit(20L)))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min("value"), 2).as("min_value"),
        round(max("value"), 2).as("max_value"))
      .orderBy("bucket")

  /** Approx-distinct (HLL++) per label — the sketch path for
    * count-distinct at 100 TB (mergeable, fixed memory). Sketch values
    * differ across engines, so the oracled output is the EXACT distinct
    * count plus a `within_tol` boolean (|approx/exact − 1| ≤ 5%) that the
    * DuckDB oracle asserts as literal TRUE — deterministic in both
    * engines, hash-matchable, and it actually verifies the sketch. */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("n_users_exact"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n_users_exact"), col("n"),
        (abs(col("approx_users").cast("double") / col("n_users_exact") - 1.0) <= 0.05)
          .as("within_tol"))
      .orderBy("event_type")

  /** Skew-resistant exact distinct count via domain partitioning: salt
    * by `user_id % salts` so each (label, salt) cell counts a DISJOINT
    * slice of the distinct domain, then sum the per-salt counts. A hot
    * label's distinct-state is spread across `salts` reducers instead
    * of one — the salting pattern for the aggregations AQE can't fix
    * (distinct/collect state, unlike algebraic sums, can't map-side
    * combine away). Exact, so fully oracle-checkable. */
  def saltedDistinctUsers(events: DataFrame, salts: Int = 16): DataFrame =
    events
      .groupBy(col("event_type"), pmod(col("user_id"), lit(salts)).as("salt"))
      .agg(countDistinct("user_id").as("d"))
      .groupBy("event_type")
      .agg(sum("d").as("n_users"))
      .orderBy("event_type")

  /** Sessionization — gap-based session assignment with a running-sum
    * window (the generalization of A7's absence detection). One shuffle
    * on user_id; session stats computed without a second shuffle thanks
    * to partial agg on (user, session). */
  def sessionStats(events: DataFrame, gapSecs: Double = 3600): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val gapped = events.select(col("user_id"), col("ts"),
      when(col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double") > gapSecs, 1L)
        .otherwise(0L).as("is_new"))
    val sessions = gapped.select(col("user_id"), col("ts"),
      sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("session_id"))
    sessions.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts").cast("double")) - min(col("ts").cast("double")))
          .as("duration_secs"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(max("duration_secs"), 3).as("max_session_secs"))
      .orderBy("user_id")
  }

  /** Pre-flight join cardinality probe — the quadratic-blowup detector
    * run BEFORE an expensive join: per join-key value, the row count
    * on each side and the exact inner-join output size (left_n ×
    * right_n). At 100 TB the failure mode this catches is the one key
    * owning both sides (a null-ish sentinel, a default id): its pairs
    * term dwarfs the rest and the join never finishes — cheaper to
    * learn that from two combinable groupBys over DISTINCT-KEY tables
    * than from the dead executor. Feed the hot keys to
    * [[graft.util.SparkUtil.saltedJoin]] or filter them out.
    *
    * Output: (key, left_rows, right_rows, pairs), pairs DESC (hot keys
    * first), key tie-break; keys missing from either side are absent
    * (they contribute zero pairs). Null keys ARE probed — the null
    * bucket is precisely the classic hazard — via a null-safe join.
    *
    * Scale shape: two combinable key groupBys (map-side partials) +
    * one join between KEY-CARDINALITY tables — never touches the fact
    * rows themselves. */
  def joinCardinalityProbe(left: DataFrame, right: DataFrame,
                           key: String): DataFrame = {
    val l = left.groupBy(col(key))
      .agg(count(lit(1)).cast("long").as("left_rows"))
    val r = right.groupBy(col(key).as("__rk"))
      .agg(count(lit(1)).cast("long").as("right_rows"))
    l.join(r, col(key) <=> col("__rk"))
      .select(col(key), col("left_rows"), col("right_rows"),
        (col("left_rows") * col("right_rows")).cast("long").as("pairs"))
      .orderBy(col("pairs").desc, col(key))
  }

  /** EXACT per-key quantile panel at 100 TB shape — value at rank
    * ⌈p·n⌉ per key for each requested PERMILLE (integer p avoids the
    * classic `ceil(0.1 × 100) = 11` float trap; the threshold is
    * (pm·n + 999) div 1000, exact in both engines). Built on the
    * skew-safe [[rankByKey]] (range partition + per-partition windows)
    * plus ONE combinable groupBy — `max(value WHERE rank ≤ ⌈p·n⌉)` IS
    * the rank-p value on a sorted order and is tie-insensitive, so no
    * per-group sort buffer ever materializes. Contrast
    * `percentile_disc` / exact `percentile` aggregates, which buffer
    * each group's values (corpus/|keys| rows per group — the OOM at a
    * skewed key), and interpolated `percentile_cont`, whose float
    * arithmetic is cross-engine ulp-unstable. Null values are excluded
    * (Spark sorts nulls first, DuckDB last — exclusion is the only
    * portable semantics).
    *
    * Output: (key, n, p<pm> per requested permille), ordered by key. */
  def quantilesByKey(df: DataFrame, keyCol: String, valueCol: String,
                     permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty, "need at least one permille")
    require(permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000]: $permilles")
    require(permilles.distinct.size == permilles.size,
      s"duplicate permilles: $permilles")
    val ranked = rankByKey(df.filter(col(valueCol).isNotNull),
      keyCol, Seq(valueCol))
    val aggs = permilles.map { pm =>
      max(when(col("_rank") <= expr(s"($pm * _nk + 999) div 1000"),
        col(valueCol))).as(s"p$pm")
    }
    ranked.groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("n"), aggs: _*)
      .orderBy(keyCol)
  }

  /** Ordered-sequence funnel — per user, the EARLIEST-ANCHOR greedy
    * completion of `steps` (the default semantics of the analytics
    * funnel engines): t₁ = the user's first step-1 event; tᵢ₊₁ = the
    * first step-(i+1) event strictly after tᵢ and within
    * `maxGapSeconds` of it. A user appears iff they reached step 1;
    * unreached steps are null. Greedy-earliest can miss completions a
    * later anchor would catch — documented simplification, identical
    * in the oracle.
    *
    * Output: (user_id, t1_us … tk_us epoch-micro BIGINTs — exact
    * integers, no float compare surface, steps_completed), ordered by
    * user_id.
    *
    * Scale shape (100 TB): one per-step pipeline of
    * (type-filtered scan → user groupBy min → user equi-join back) —
    * every aggregate map-side combinable on user_id
    * (corpus-cardinality key, no funnel-shaped window); k type-pruned
    * column scans beat materializing a (user, type, ts) copy of the
    * event log (parquet predicate pushdown does the per-step filter at
    * the stripe level). Per-user state is k timestamps, never an
    * event list — a heavy user costs nothing extra. */
  def funnelSteps(events: DataFrame, steps: Seq[String],
                  maxGapSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps: $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct: $steps")
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive: $maxGapSeconds")
    val gapUs = maxGapSeconds * 1000000L
    val ev = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("__us"))
    var acc = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("__us").as("t1_us"))
    for (i <- 2 to steps.size) {
      val prev = s"t${i - 1}_us"
      val si = ev.filter(col("event_type") === steps(i - 1))
        .select(col("user_id"), col("__us"))
      val next = acc.select(col("user_id"), col(prev)).join(si, "user_id")
        .filter(col("__us") > col(prev) && col("__us") <= col(prev) + gapUs)
        .groupBy("user_id").agg(min("__us").as(s"t${i}_us"))
      acc = acc.join(next, Seq("user_id"), "left")
    }
    val completed = (2 to steps.size)
      .map(i => when(col(s"t${i}_us").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    acc.select(col("user_id") +:
        (1 to steps.size).map(i => col(s"t${i}_us")) :+
        completed.cast("long").as("steps_completed"): _*)
      .orderBy("user_id")
  }

  /** Weekly cohort retention — users grouped by the week of their
    * FIRST event (integer epoch-week: days-since-1970 div 7 — no
    * engine week-anchor convention in sight), counted at each later
    * week offset they were active. `n_users` at offset 0 is the cohort
    * size; the (cohort, offset) grid is the standard retention
    * triangle.
    *
    * Output: (cohort_week, week_offset, n_users), ordered.
    *
    * Scale shape: firsts = one combinable user groupBy; activity =
    * distinct (user, week) — both shuffle on user-grain keys; the
    * final groupBy is (cohort, offset)-sized. No windows, no joins
    * bigger than user-grain. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val day = datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
    val ev = events.select(col("user_id"), (day.cast("long")).as("__day"))
    val firsts = ev.groupBy("user_id")
      .agg(expr("min(__day) div 7").as("__w0"))
    val active = ev.select(col("user_id"), expr("__day div 7").as("__w"))
      .distinct()
    active.join(firsts, "user_id")
      .groupBy(col("__w0").as("cohort_week"),
        (col("__w") - col("__w0")).as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** EWMA-baseline anomaly detection over daily label counts — the
    * volume-monitoring alert ("today's error count is 3× its trailing
    * baseline") every ingestion pipeline runs. The baseline is an
    * exponentially-weighted mean of the `lookback` PRIOR OBSERVED
    * days — ROW semantics, like the streaming twin: a day with zero
    * events produces no row, so the baseline reaches across gaps and
    * a drop-to-zero day is invisible (densify per label upstream if
    * zero-volume days must alarm; observed-day semantics is what the
    * bucket-grain pre-aggregate can express without a calendar join)
    * (weights (1−α)^(i−1), i = 1..lookback — the truncated-EWMA form:
    * a bounded, window-expressible dot product instead of the
    * unbounded recursive EWMA, whose (1−α)^(−t) rescaling trick
    * overflows on long series). A day is anomalous when
    * count / baseline, ROUNDED to 4 dp (float-boundary-safe compare,
    * both engines see the identical rounded value), leaves
    * [loRatio, hiRatio]. Only full-window days are emitted — partial
    * baselines at series start would need a null-weight convention
    * with no portable SQL form.
    *
    * Determinism: the weighted sum is a FIXED left-associated
    * expression tree over exact-dyadic weights (default α = 0.5 →
    * 1, 0.5, …, 2^-6), not an aggregation — IEEE-identical in any
    * engine evaluating literals left-to-right.
    *
    * Scale shape (100 TB): the daily pre-aggregate is map-side
    * combinable and collapses the event log to (label × day) grain
    * BEFORE any window; the per-label window then runs over
    * day-count rows — the low-cardinality-window funnel concern
    * (see [[percentRankByKey]]) does not apply because the windowed
    * table is already bucket-sized, never event-sized. */
  def ewmaDailyAnomalies(events: DataFrame, alpha: Double = 0.5,
                         lookback: Int = 7, hiRatio: Double = 1.5,
                         loRatio: Double = 0.6667): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(lookback >= 1, s"lookback must be >= 1: $lookback")
    require(loRatio < hiRatio, s"loRatio $loRatio must be < hiRatio $hiRatio")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val weights = ewmaWeights(alpha, lookback)
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      lag(col("n"), i + 1).over(w).cast("double") * lit(wt)
    }
    val ewma = terms.reduce(_ + _) / lit(weights.sum)
    daily
      .withColumn("_rn", row_number().over(w))
      .withColumn("_ewma", ewma)
      .filter(col("_rn") > lookback)
      .withColumn("ratio", round(col("n").cast("double") / col("_ewma"), 4))
      .select(col("event_type"), col("day"), col("n").cast("long").as("n"),
        round(col("_ewma"), 4).as("ewma"), col("ratio"),
        (col("ratio") >= hiRatio || col("ratio") <= loRatio).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** The (1−α)^(i−1) weight ladder shared by [[ewmaDailyAnomalies]]
    * and its oracle SQL generator — one source for both engines'
    * literals, zero drift. */
  def ewmaWeights(alpha: Double, lookback: Int): Seq[Double] =
    (1 to lookback).map(i => math.pow(1 - alpha, i - 1))

  /** Winsorized (clipped) robust statistics per key — the outlier-proof
    * mean every metrics pipeline wants when a single 10^6-valued row
    * would otherwise dominate a label's average. Cutoffs are EXACT
    * rank-based quantiles (value at rank ⌈pm·n/1000⌉, integer-permille
    * ceiling — the same arithmetic as [[quantilesByKey]], no float
    * ceil trap, no percentile buffering), computed via the skew-safe
    * [[rankByKey]] instead of a per-key window funnel; values are then
    * clipped to [lo, hi] and aggregated with a map-side-combinable
    * groupBy. Null VALUES and null KEYS are excluded throughout
    * (portable semantics — engine null ordering AND null-join
    * semantics differ; a null-key group would also need a null-safe
    * join the oracle's USING cannot express).
    *
    * Output: (key, n, lo, hi — 2 dp, mean_winsorized — 4 dp,
    * n_clipped_lo, n_clipped_hi), ordered by key. Clip-count compares
    * are against the RAW cutoff value (an actual data value), not the
    * rounded display copy.
    *
    * Scale shape (100 TB): one range exchange for the ranks, one tiny
    * per-key cutoff table broadcast back, one combinable final
    * aggregate — per-key state is two doubles, never a value buffer. */
  def winsorizedStats(df: DataFrame, keyCol: String, valueCol: String,
                      loPermille: Int = 50, hiPermille: Int = 950,
                      tieBreak: String = "event_id"): DataFrame = {
    require(loPermille >= 1 && hiPermille <= 1000 && loPermille < hiPermille,
      s"bad permilles: [$loPermille, $hiPermille]")
    val v = df.filter(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(valueCol), col(tieBreak))
    val ranked = rankByKey(v, keyCol, Seq(valueCol, tieBreak))
    val cuts = ranked.groupBy(keyCol).agg(
      max(when(col("_rank") <= expr(s"($loPermille * _nk + 999) div 1000"),
        col(valueCol))).as("__lo"),
      max(when(col("_rank") <= expr(s"($hiPermille * _nk + 999) div 1000"),
        col(valueCol))).as("__hi"))
    val cutsK = cuts.withColumnRenamed(keyCol, "__k")
    v.join(broadcast(cutsK), col(keyCol) === col("__k"))
      .groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("n"),
        round(first(col("__lo")), 2).as("lo"),
        round(first(col("__hi")), 2).as("hi"),
        round(avg(least(greatest(col(valueCol), col("__lo")), col("__hi"))), 4)
          .as("mean_winsorized"),
        sum(when(col(valueCol) < col("__lo"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col(valueCol) > col("__hi"), 1L).otherwise(0L))
          .as("n_clipped_hi"))
      .orderBy(keyCol)
  }

  /** Hierarchical ROLLUP totals — the OLAP subtotal grid
    * (label × day → label → grand total) in ONE pass instead of three
    * union'd aggregations. Rollup-null group keys are collapsed to
    * explicit sentinels and accompanied by `grouping()` flags: engine
    * null ORDERING differs (Spark nulls-first vs DuckDB nulls-last),
    * so a raw null key in an ordered oracle output is a portability
    * bug — the sentinel pins it.
    *
    * Scale shape: Spark plans rollup as a single Expand + one
    * combinable aggregate — each input row contributes to all 3
    * grouping sets map-side; the shuffle carries (set × label × day)
    * grain, never events. */
  def rollupDailyCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .rollup("event_type", "day")
      // grouping() is only resolvable INSIDE the rollup's agg clause
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"),
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("day")).cast("long").as("g_day"))
      .select(
        coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("day"), to_date(lit("1970-01-01"))).as("day"),
        col("g_type"), col("g_day"),
        col("n").cast("long").as("n"), col("total_value"))
      .orderBy("g_type", "g_day", "event_type", "day")

  /** Distinct users across ROLLUP levels — count-distinct at every
    * subtotal grain in ONE pass, with BOTH the exact count (oracle-
    * pinnable) and the mergeable-HLL estimate wearing a tolerance
    * boolean (the approxPercentiles pattern: the oracle asserts
    * literal TRUE, so the hash matches iff the sketch holds ±5%).
    * The point at 100 TB: the EXACT distinct per grouping set is an
    * Expand×sets blowup with per-group distinct state, while the HLL
    * column is a fixed-size mergeable sketch whose partials combine
    * map-side across ALL sets — drop the exact column there and keep
    * the sketch; this query keeps both precisely so the sketch is
    * verified against the exact value at every level.
    *
    * Output: (event_type sentinel-coalesced, g_type, n, n_users_exact,
    * hll_within_tol), ordered. */
  def rollupDistinctUsers(events: DataFrame): DataFrame =
    events.select(col("event_type"), col("user_id"))
      .rollup("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("__hll"),
        grouping(col("event_type")).cast("long").as("g_type"))
      .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
        col("g_type"), col("n").cast("long").as("n"),
        col("n_users_exact").cast("long").as("n_users_exact"),
        (abs(col("__hll").cast("double") / col("n_users_exact") - 1.0)
          <= 0.05).as("hll_within_tol"))
      .orderBy("g_type", "event_type")

  /** Deterministic rate-limit sampling — keep at most `perBucket`
    * events per (label, time bucket of `bucketSeconds`), chosen by
    * md5-coin order (the no-rand() discipline: reproducible, and a
    * re-run keeps the SAME sample). The log-volume control a 100 TB
    * ingest applies before expensive downstream enrichment: hot
    * buckets are capped, quiet buckets pass untouched.
    *
    * Scale shape: ONE window over (label, bucket) — a HIGH-cardinality
    * composite key (buckets × labels), so the exchange spreads; per-key
    * state is a counter. Output is the kept rows' ids, ordered. */
  def rateLimitSample(events: DataFrame, perBucket: Int = 3,
                      bucketSeconds: Long = 1L,
                      salt: String = "rate"): DataFrame = {
    require(perBucket >= 1, s"perBucket must be >= 1: $perBucket")
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1: $bucketSeconds")
    val sec = expr(s"unix_micros(ts) div ${bucketSeconds * 1000000L}L")
    val coin = conv(substring(
      md5(concat(lit(s"$salt:"), col("event_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val w = Window.partitionBy(col("event_type"), col("__sec"))
      .orderBy(col("__coin"), col("event_id"))
    events
      .select(col("event_id"), col("event_type"), sec.as("__sec"),
        coin.as("__coin"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perBucket)
      .select(col("event_id"), col("event_type"),
        col("__sec").cast("long").as("sec"))
      .orderBy("event_id")
  }

  /** Deterministic HARD per-key quota — admit the first `cap` events
    * per (event_type, event-time window of `windowSeconds`) in strict
    * (ts, event_id) order, reject the rest. The exact complement of
    * [[rateLimitSample]]'s probabilistic cap: billing/abuse limits
    * need "exactly the first N", not "about N chosen fairly".
    *
    * All window math is integer epoch-micros (floor-div — never a
    * float bucket edge); `admit_seq` is the row's 1-based admission
    * rank. Null type/id/ts rows are excluded (portable-null contract;
    * a null ts has no window position).
    * The streaming twin is
    * [[graft.streaming.StreamingPipeline.quotaLimitPipeline]] — same
    * admission rule under transformWithState state; the two agree
    * whenever micro-batches arrive in event-time order.
    *
    * Scale shape: ONE window over (event_type, window_start) — a
    * high-cardinality composite key (the [[rateLimitSample]] pattern),
    * so the exchange spreads; per-key state is a counter. */
  def quotaEnforce(events: DataFrame, cap: Int,
                   windowSeconds: Long): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    require(windowSeconds >= 1, s"windowSeconds must be >= 1: $windowSeconds")
    val winUs = windowSeconds * 1000000L
    val w = Window.partitionBy(col("event_type"), col("window_start_s"))
      .orderBy(col("__us"), col("event_id"))
    events
      // null ts has no window position — excluded here AND in the
      // streaming twin (whose mapPartitions pre-trim would NPE on
      // ts.toInstant); batch and stream stay input-for-input identical
      .filter(col("event_type").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts)").as("__us"), col("event_id"))
      .withColumn("window_start_s",
        expr(s"(__us div ${winUs}L) * ${windowSeconds}L"))
      .withColumn("admit_seq", row_number().over(w).cast("long"))
      .filter(col("admit_seq") <= cap)
      .select(col("event_type"), col("window_start_s").cast("long"),
        col("event_id").cast("long").as("event_id"), col("admit_seq"))
  }

  /** Lag-k autocorrelation of daily label counts — the seasonality /
    * self-similarity detector ([[ewmaDailyAnomalies]]'s diagnostic
    * sibling: a high lag-7 autocorrelation says the baseline should be
    * day-of-week-aware). Pearson corr between the daily series and its
    * row-lagged self (observed-day row semantics, like the EWMA op),
    * per requested lag.
    *
    * Output: (event_type, lag, n_pairs, autocorr 4 dp), ordered;
    * labels with < 3 overlapping pairs are excluded (corr is noise
    * there), and so are zero-variance series — where Pearson is
    * undefined. The Spark side computes Pearson MANUALLY
    * (covar/(sd·sd)) behind an explicit variance guard: under ANSI
    * mode `corr` itself throws DIVIDE_BY_ZERO on a constant series
    * (confirmed by execution — the null filter can never fire because
    * the aggregation explodes first), while DuckDB's corr returns the
    * NULL the filter drops.
    *
    * Scale shape: daily pre-agg collapses to bucket grain; the lag
    * window and corr run over day-count rows per label. */
  def autocorrelation(events: DataFrame, lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags: $lags")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // one pre-agg for all requested lags
    val w = Window.partitionBy("event_type").orderBy("day")
    val perLag = lags.map { k =>
      daily
        .withColumn("__prev", lag(col("n"), k).over(w))
        .filter(col("__prev").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          covar_samp(col("n").cast("double"), col("__prev").cast("double"))
            .as("__cov"),
          stddev_samp(col("n").cast("double")).as("__s1"),
          stddev_samp(col("__prev").cast("double")).as("__s2"))
        .select(col("event_type"), col("n_pairs"),
          round(when(col("__s1") > 0 && col("__s2") > 0,
            col("__cov") / (col("__s1") * col("__s2"))), 4).as("autocorr"))
        .withColumn("lag", lit(k.toLong))
    }
    perLag.reduce(_ unionByName _)
      .filter(col("n_pairs") >= 3 && col("autocorr").isNotNull)
      .select(col("event_type"), col("lag"), col("n_pairs"), col("autocorr"))
      .orderBy("event_type", "lag")
  }

  /** Theil–Sen robust trend of daily label counts — the
    * outlier-immune slope (median of all pairwise slopes) that a
    * least-squares fit gets wrong the moment one incident day spikes:
    * the volume-drift number to alarm on. Slopes are
    * (nⱼ−nᵢ)/(dayⱼ−dayᵢ) in events/day over CALENDAR day distances,
    * ROUNDED to 4 dp before ranking (float order only safe
    * post-round); the median is the exact integer-rank pick
    * (⌈n/2⌉ — the quantilesByKey ceiling discipline).
    *
    * Output: (event_type, n_days, n_pairs, slope_per_day), ordered.
    *
    * Scale shape: the pair generation is quadratic in DAYS PER LABEL
    * (bucket grain — bounded by the time horizon, never corpus size;
    * 2 years ≈ 266k pairs/label) over the checkpointed daily panel;
    * ranking runs per label on the pair table. */
  def theilSenTrend(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__d",
        datediff(col("day"), lit("1970-01-01")).cast("long"))
      .localCheckpoint(true) // both sides of the pair self-join
    val a = daily.select(col("event_type"), col("__d").as("da"),
      col("n").as("na"))
    val b = daily.select(col("event_type"), col("__d").as("db"),
      col("n").as("nb"))
    val pairs = a.join(b, "event_type").filter(col("da") < col("db"))
      .select(col("event_type"),
        round((col("nb") - col("na")).cast("double") /
          (col("db") - col("da")).cast("double"), 4).as("slope"))
    val ranked = rankByKey(pairs, "event_type", Seq("slope"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_days"))
    ranked.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        max(when(col("_rank") * 2 <= col("_nk") + 1, col("slope")))
          .as("slope_per_day"))
      .join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("slope_per_day"))
      .orderBy("event_type")
  }

  /** Data-skipping effectiveness panel for a Z-order layout vs a plain
    * single-column sort — the decision table a 100 TB table owner reads
    * before choosing a clustering key. Rows are quantized to `bits`-bit
    * codes on two predicate columns, laid out two ways (`bycol`: sorted
    * by x alone; `zorder`: sorted by the interleaved
    * [[graft.util.ZOrder.zValue]]), cut into `buckets` equal "files" by
    * GLOBAL rank, and each bucket reports its per-column min/max — the
    * parquet footer a scan would prune on. Under `bycol` the y ranges
    * span the whole domain (0 prunable files for a y predicate); under
    * `zorder` BOTH columns' ranges are narrow — that difference is the
    * entire case for z-ordering.
    *
    * Global rank goes through the skew-safe constant-key [[rankByKey]]
    * (range-partition + local ranks + tiny offset table), never a
    * single-reducer `row_number() OVER ()` — the
    * stratified-sample precedent. Bucket math is exact integer
    * ((rank−1)·B) div n. Output: (layout, bucket, n, min_x, max_x,
    * min_y, max_y), ordered. */
  def zorderSkipStats(events: DataFrame, bits: Int = 8,
                      buckets: Int = 16): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val side = 1L << bits
    val ev = events.select(
      pmod(col("user_id"), lit(side)).as("x"),
      pmod(col("event_id"), lit(side)).as("y"),
      col("event_id"))
    val withZ = ev.withColumn("z",
        graft.util.ZOrder.zValue(col("x"), col("y"), bits))
      // one scan + one z encoding for BOTH layout branches (the
      // fan-out checkpoint discipline)
      .localCheckpoint(true)
    def layoutStats(tag: String, orderCols: Seq[String]): DataFrame =
      rankByKey(withZ.withColumn("__g", lit(0)), "__g",
          orderCols :+ "event_id")
        .withColumn("bucket", expr(s"((_rank - 1) * $buckets) div _nk"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n"),
          min("x").cast("long").as("min_x"), max("x").cast("long").as("max_x"),
          min("y").cast("long").as("min_y"), max("y").cast("long").as("max_y"))
        .withColumn("layout", lit(tag))
    layoutStats("bycol", Seq("x")).unionByName(layoutStats("zorder", Seq("z")))
      .select(col("layout"), col("bucket").cast("long").as("bucket"),
        col("n"), col("min_x"), col("max_x"), col("min_y"), col("max_y"))
      .orderBy("layout", "bucket")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the path-analysis complement of [[funnelSteps]]
    * (which checks ONE ordered path; this measures ALL adjacent
    * transitions): for each (from, to) event-type pair, the count of
    * consecutive occurrences and the row-normalized transition
    * probability.
    *
    * Scale shape: one user-grain window (corpus-cardinality partition
    * key — no funnel) for the `lead`, then a combinable groupBy to the
    * |types|² matrix; the probability normalization window runs over
    * that tiny matrix. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // CONTRACT (ADVICE r9): null-typed events are excluded BEFORE
    // sequencing — a null from_type would otherwise group and ORDER
    // with engine-divergent null placement (Spark nulls-first asc,
    // DuckDB last), the nullable-ORDER-BY hazard. Matches the
    // winsorizedStats null-key contract; mirrored in the oracle.
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .filter(col("event_type").isNotNull)
      .withColumn("__next", lead(col("event_type"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")), 4))
      .orderBy("from_type", "to_type")
  }

  /** Top-k most common event paths — per-user ordered event-type
    * n-grams (the "what do users actually do" path-mining panel, the
    * exploratory complement of [[funnelSteps]]' fixed hypothesis and
    * [[transitionMatrix]]'s first-order view). One user-grain lead
    * window builds the n-gram in place (no self-joins), a combinable
    * groupBy counts paths, and the global cut is a TakeOrdered heap —
    * never a full sort.
    *
    * Output: (path "a>b>c", n), ordered by (n DESC, path), k rows. */
  def commonPaths(events: DataFrame, n: Int = 3, topK: Int = 20): DataFrame = {
    require(n >= 2, s"path length must be >= 2: $n")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = (0 until n).map(i => lead(col("event_type"), i).over(w))
    // CONTRACT (ADVICE r9): null-typed events are excluded BEFORE
    // sequencing — concat_ws silently SKIPS nulls ('a>b' for a 3-step
    // path with a null middle) while the oracle's '||' nulls the whole
    // path; dropping them first gives both engines the same sequences.
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .filter(col("event_type").isNotNull)
      .withColumn("__last", steps.last)
      .withColumn("path", concat_ws(">", steps: _*))
      .filter(col("__last").isNotNull)
      .groupBy("path").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("path")).limit(topK)
  }

  /** Benford's-law first-digit audit of a positive measure column —
    * the classic fabricated-data / unit-mixing screen: organic
    * multi-scale quantities follow P(d) = log10(1+1/d); flat or
    * spiked digit shares mean synthetic values, clipped ranges, or a
    * unit change mid-stream. First digits are extracted via EXACT
    * integer arithmetic (2-dp values scale to integer cents — the
    * leading digit is scale-invariant — then one integer→string cast,
    * portable in both engines; never log10 on doubles, whose ulp at
    * exact powers of ten flips the digit). CONTRACT: values are
    * quantized to <= 2 decimals (this repo's fixture is exactly 2-dp)
    * — a sub-cent value would round to 0 cents (excluded by the
    * cents > 0 guard, never a phantom digit-0 row) and a 3rd decimal
    * would misread e.g. 0.098 as digit 1; generalize by scaling to the
    * data's quantum. Expected shares are Scala doubles injected into
    * both engines.
    *
    * Output: (digit 1–9, n, share 4 dp, expected 4 dp, dev 4 dp),
    * ordered by digit. One combinable groupBy to 9 rows. */
  def benfordAudit(events: DataFrame, valueCol: String = "value"): DataFrame = {
    val v = events.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .withColumn("__cents", round(col(valueCol) * 100, 0).cast("long"))
      .filter(col("__cents") > 0)
      .withColumn("digit",
        substring(col("__cents").cast("string"), 1, 1).cast("long"))
    val expected = benfordExpected
    val expectedCol = (2 to 9).foldLeft(
      when(col("digit") === 1, lit(expected(0)))) {
      (acc, d) => acc.when(col("digit") === d, lit(expected(d - 1)))
    }
    v.groupBy("digit").agg(count(lit(1)).cast("long").as("n"))
      .withColumn("share",
        round(col("n").cast("double") /
          sum("n").over(Window.partitionBy()), 4))
      .withColumn("expected", round(expectedCol, 4))
      .withColumn("dev", round(abs(col("share") - round(expectedCol, 4)), 4))
      .orderBy("digit")
  }

  /** The log10(1+1/d) Benford shares, d = 1..9 — one Scala source for
    * both engines' literals. */
  def benfordExpected: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Trailing-window counts per event — "how many same-type events in
    * the hour before (and including) this one", the per-row sliding
    * aggregate behind rate-limit forensics and burst detection.
    * Expressed as a KEYED [[graft.util.SparkUtil.rangeJoin]] (anchor
    * event → interval (ts−w, ts], points → same-type events), NOT a
    * `RANGE BETWEEN` window: a range-frame window partitioned by a
    * ≤K-value label funnels the whole log through K reducers, while
    * the bin-keyed equi-join spreads on (bin × key) — the only shape
    * that survives 100 TB. Exact long epoch-micro bin math; each
    * interval spans ≤ 2 bins by construction (width = the window).
    *
    * Output: (event_id, event_type, n_trailing ≥ 1 — self included),
    * ordered by event_id. */
  def trailingWindowCounts(events: DataFrame,
                           windowSeconds: Long = 3600): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1: $windowSeconds")
    val us = windowSeconds * 1000000L
    // NOT "__p"/"__s"/"__e" — those are rangeJoin's internal scratch
    // names and get dropped
    val pts = events.select(col("event_type"),
      expr("unix_micros(ts)").as("p_us"))
    val anchors = events.select(col("event_id"), col("event_type"),
      (expr("unix_micros(ts)") - us + 1L).as("w_s"),
      (expr("unix_micros(ts)") + 1L).as("w_e"))
    graft.util.SparkUtil.rangeJoin(pts, "p_us", anchors, "w_s", "w_e",
        binWidth = us, keyCols = Seq("event_type"))
      .groupBy("event_id", "event_type")
      .agg(count(lit(1)).cast("long").as("n_trailing"))
      .orderBy("event_id")
  }

  /** Median/MAD robust outlier panel per key — the heavy-tail-proof
    * complement of [[winsorizedStats]]: median and median-absolute-
    * deviation are EXACT rank quantiles (two [[quantilesByKey]]
    * passes — the integer-permille arithmetic, no percentile buffer),
    * and a value is an outlier when |x − median| > nSigma·1.4826·MAD
    * (1.4826 = the normal-consistency constant). The cutoff factor is
    * ONE Scala double injected into both engines; the compare runs on
    * raw doubles through the identical expression tree — deterministic,
    * no rounding needed on the decision path (display columns round).
    *
    * Output: (key, n, median 4 dp, mad 4 dp, n_outliers), ordered.
    *
    * Scale shape (100 TB): two skew-safe rank passes (each one range
    * exchange over (key, value)) + two tiny per-key cutoff broadcasts
    * + one combinable final aggregate. Per-key state everywhere is a
    * constant — never a value buffer. */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
                  nSigma: Double = 3.0): DataFrame = {
    require(nSigma > 0, s"nSigma must be positive: $nSigma")
    // null VALUES and null KEYS excluded — the winsorizedStats
    // portability contract
    val v = df.filter(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(valueCol))
    val med = quantilesByKey(v, keyCol, valueCol, Seq(500))
      .select(col(keyCol).as("__k"), col("p500").as("__med"))
    val dev = v.join(broadcast(med), col(keyCol) === col("__k"))
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = quantilesByKey(dev.select(col(keyCol), col("__dev")),
        keyCol, "__dev", Seq(500))
      .select(col(keyCol).as("__k2"), col("p500").as("__mad"))
    dev.join(broadcast(mad), col(keyCol) === col("__k2"))
      .groupBy(keyCol)
      .agg(count(lit(1)).cast("long").as("n"),
        round(first("__med"), 4).as("median"),
        round(first("__mad"), 4).as("mad"),
        sum(when(col("__dev") > col("__mad") * lit(nSigma * 1.4826), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(keyCol)
  }

  /** The outlier cutoff factor [[madOutliers]] injects into both
    * engines — exposed so the oracle SQL quotes the SAME double. */
  def madCutoff(nSigma: Double): Double = nSigma * 1.4826

  /** Per-column data-profile panel over the event log — the ingest-QA
    * table (null rates, cardinalities, ranges) read before trusting a
    * new data drop. One scan: every per-column aggregate lives in a
    * single agg whose outputs fold into an array of structs and
    * explode to long format. Numeric ranges land in (min_num, max_num)
    * as 4-dp doubles (timestamps as epoch-micros — exact under 2⁵³);
    * string ranges in (min_str, max_str) (binary collation — identical
    * in both engines for this ASCII data).
    *
    * Scale note: six EXACT countDistincts in one agg plan through one
    * Expand (input ×6) — the profiler's price. At 100 TB swap
    * `approx_count_distinct` in (mergeable HLL, no Expand); the exact
    * form is kept here because exactness is what the oracle can pin. */
  def columnProfile(events: DataFrame): DataFrame = {
    def p(name: String, num: Option[Column], str: Option[Column]) =
      struct(lit(name).as("col_name"),
        sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(name)).as("n_distinct"),
        num.map(e => round(min(e), 4)).getOrElse(lit(null).cast("double"))
          .as("min_num"),
        num.map(e => round(max(e), 4)).getOrElse(lit(null).cast("double"))
          .as("max_num"),
        str.map(e => min(e)).getOrElse(lit(null).cast("string")).as("min_str"),
        str.map(e => max(e)).getOrElse(lit(null).cast("string")).as("max_str"))
    val num = (c: String) => Some(col(c).cast("double"))
    val str = (c: String) => Some(col(c))
    events.agg(array(
        p("event_id", num("event_id"), None),
        p("ts", Some(expr("unix_micros(ts)").cast("double")), None),
        p("user_id", num("user_id"), None),
        p("event_type", None, str("event_type")),
        p("value", num("value"), None),
        p("props", None, str("props"))).as("cols"))
      .select(explode(col("cols")).as("c"))
      .select(col("c.col_name").as("col_name"), col("c.n_null").as("n_null"),
        col("c.n_distinct").as("n_distinct"), col("c.min_num").as("min_num"),
        col("c.max_num").as("max_num"), col("c.min_str").as("min_str"),
        col("c.max_str").as("max_str"))
      .orderBy("col_name")
  }

  /** Day-over-day top movers — the "what changed most" triage panel:
    * per (label, observed day), the count delta vs the label's
    * PREVIOUS observed day, global top-k by |delta| (ties: label,
    * day). EXACT integers end to end; first observed day per label
    * has no baseline and is excluded. Null labels kept (count-panel
    * contract).
    *
    * Output: (event_type, day, n, prev_n, delta), ordered
    * (|delta| DESC, event_type NULLS FIRST, day), k rows.
    *
    * Scale shape: bucket-grain daily pre-agg → per-label lag at day
    * cardinality → global top-k as a TakeOrdered (never a full
    * sort). */
  def topMovers(events: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy("event_type").orderBy("day")
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull)
      .withColumn("delta", col("n") - col("prev_n"))
      .orderBy(abs(col("delta")).desc, col("event_type"), col("day"))
      .limit(k)
      .select("event_type", "day", "n", "prev_n", "delta")
  }

  /** Per-user session summaries via Spark's NATIVE `session_window` —
    * the merging-interval session operator (not a gaps-and-islands
    * window): each user's events coalesce into sessions closed by a
    * `gapSeconds` silence; session_end is last-event + gap (Spark's
    * session semantics, mirrored exactly in the oracle). The same
    * expression composes unchanged into Structured Streaming with a
    * watermark (see [[graft.streaming.StreamingPipeline
    * .sessionSummaryPipeline]]) — THE reason to use the native
    * operator over islands arithmetic: streaming state merge comes
    * free. Null users excluded (unidentified actors have no
    * sessions — the interarrival contract).
    *
    * Output: (user_id, session_start, session_end, n_events,
    * duration_s BIGINT — exact micros div), ordered.
    *
    * Scale shape: one shuffle on user_id; session merge is
    * per-partition state, no window funnel. */
  def sessionWindowSummaries(events: DataFrame,
                             gapSeconds: Long = 1800): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1: $gapSeconds")
    events
      .filter(col("user_id").isNotNull)
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"),
        col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        expr("(unix_micros(session_window.end) " +
          "- unix_micros(session_window.start)) DIV 1000000L")
          .as("duration_s"))
      .orderBy("user_id", "session_start")
  }

  /** Per-user inter-arrival histogram per label — request periodicity
    * in power-of-2 second buckets, EXACT integer end to end: gaps are
    * whole seconds (epoch-micros difference div 1e6), and the bucket
    * index floor(log2(gap)) is `length(bin(gap)) − 1` — a bit-length,
    * never a float log (the Benford never-log10 discipline). Bucket −1
    * collects sub-second gaps. Gaps are PER (user, label) — the
    * metrically meaningful periodicity, and the scale-safe one: the
    * lag window partitions on user-grain keys (corpus cardinality),
    * never on the handful of labels (a per-label event-grain window
    * funnels a dominant label through one task).
    *
    * Null users are excluded (gaps across unidentified actors are
    * noise, the winsorizedStats null-key contract); null labels kept
    * as their own group.
    *
    * Output: (event_type, bucket, n_gaps, min_gap_s, max_gap_s) — all
    * BIGINT — ordered (event_type NULLS FIRST, bucket). */
  def interarrivalHist(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        expr("unix_micros(ts)").as("__us"))
      .withColumn("__prev_us", lag(col("__us"), 1).over(w))
      .filter(col("__prev_us").isNotNull)
      .withColumn("__gap_s", expr("(__us - __prev_us) DIV 1000000L"))
      .withColumn("bucket",
        when(col("__gap_s") < 1L, lit(-1L))
          .otherwise((length(bin(col("__gap_s"))) - 1).cast("long")))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).cast("long").as("n_gaps"),
        min("__gap_s").as("min_gap_s"), max("__gap_s").as("max_gap_s"))
      .orderBy("event_type", "bucket")
  }

  /** Same-day co-occurrence affinity between labels — the
    * market-basket "users who did X that day also did Y" lift matrix
    * (dependency discovery across product events; the complement of
    * [[transitionMatrix]]'s SEQUENTIAL view). Unit of observation is
    * the distinct (user, day, label) triple; for each oriented pair
    * a < b: n_ab = user-days with both, and
    * lift = n_ab·N / (n_a·n_b) in EXACT integer permille
    * ((1000·n_ab·N) div (n_a·n_b); 1000 = independence). Null users
    * and null labels are excluded (identity/label contracts).
    *
    * Output: (type_a, type_b, n_ab, lift_permille), ordered.
    *
    * Scale shape: the distinct triple table is checkpointed once and
    * feeds totals + both join sides; the pair join is keyed on
    * (user, day) — corpus-cardinality keys — and fans out to at most
    * |labels|² rows per user-day before a combinable aggregate. N and
    * the per-label totals are broadcast-joined panels. */
  def affinityMatrix(events: DataFrame): DataFrame = {
    val ud = events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct()
      .localCheckpoint(true) // consumers: N, per-label totals, pair join ×2
    val nTotal = ud.select(col("user_id"), col("day")).distinct().count()
    val perType = ud.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("__n_t"))
    val a = ud.select(col("user_id"), col("day"),
      col("event_type").as("type_a"))
    val b = ud.select(col("user_id"), col("day"),
      col("event_type").as("type_b"))
    a.join(b, Seq("user_id", "day"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).cast("long").as("n_ab"))
      .join(broadcast(perType.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("__n_t", "__n_a")), Seq("type_a"))
      .join(broadcast(perType.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("__n_t", "__n_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        expr(s"(1000L * n_ab * ${nTotal}L) DIV (__n_a * __n_b)")
          .as("lift_permille"))
      .orderBy("type_a", "type_b")
  }

  /** Day-of-week seasonality index per label — the "is Monday always
    * like this" baseline the EWMA/changepoint alarms need as context
    * (an alert that fires every weekend is a seasonality bug, not an
    * incident). Per (event_type, ISO weekday 0=Mon..6=Sun): the number
    * of distinct days observed, the event count, and the seasonality
    * index = dow daily mean ÷ overall daily mean, computed as the
    * exactly-representable integer-product ratio
    * (n_events·n_days_total)/(n_days_dow·total_events) — ONE IEEE
    * division, bit-identical on any engine (the readability
    * discipline); 1.0 = no seasonality. Null labels are kept as their
    * own group (count panels never silently drop).
    *
    * Output: (event_type, dow, n_days, n_events, round(season_idx, 4)),
    * ordered (event_type NULLS FIRST, dow).
    *
    * Scale shape: one combinable (label × day) pre-agg — bucket-grain
    * cardinality — then a (label × 7) panel; the per-label totals join
    * is broadcast-sized by construction. */
  def seasonalityDow(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the dow panel AND the label totals
    val byDow = daily
      .groupBy(col("event_type"), weekday(col("day")).cast("long").as("dow"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum("n").cast("long").as("n_events"))
    val totals = daily.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("__days_total"),
        sum("n").cast("long").as("__events_total"))
      .withColumnRenamed("event_type", "__k")
    // null-safe key: the null-label group must survive the totals join
    byDow.join(broadcast(totals), col("event_type") <=> col("__k"))
      .select(col("event_type"), col("dow"), col("n_days"), col("n_events"),
        round((col("n_events") * col("__days_total")).cast("double")
          / (col("n_days") * col("__events_total")).cast("double"), 4)
          .as("season_idx"))
      .orderBy("event_type", "dow")
  }

  /** CUSUM changepoint scan per label — "WHEN did the level shift":
    * the classic cumulative-sum statistic over the daily count series,
    * in EXACT integer arithmetic end to end (zero float surface, so
    * the oracle compare cannot drift on any engine build). With daily
    * counts n_1..n_T (observed days, ordered) and total = Σn, the
    * scaled statistic S_t = T·(Σ_{i≤t} n_i) − t·total is T× the usual
    * Σ(n_i − mean) cusum; the reported changepoint is the earliest day
    * attaining max|S_t|, with `cusum_abs` = max|S_t| (in T·events
    * units) and `mean_shift_permille` = the exact integer
    * ⌊1000·max|S_t| / (T·total)⌋ — a 0–250 scale-free shift magnitude
    * (¼·T·total is the max attainable at a mid-series full shift).
    *
    * Output: (event_type, n_days, total, cp_day, cusum_abs,
    * mean_shift_permille), ordered by event_type NULLS FIRST.
    *
    * Scale shape: daily pre-agg (combinable, bucket grain) → per-label
    * windows at DAY cardinality — never event grain; labels partition
    * the window so no funnel. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val scored = daily
      .withColumn("__cum", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__t", row_number().over(w).cast("long"))
      .withColumn("__total", sum("n").over(wAll))
      .withColumn("__days", count(lit(1)).over(wAll).cast("long"))
      .withColumn("__s", col("__days") * col("__cum") - col("__t") * col("__total"))
      .withColumn("__abs", abs(col("__s")))
    val pick = Window.partitionBy("event_type")
      .orderBy(col("__abs").desc, col("day").asc)
    scored
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(col("event_type"), col("__days").as("n_days"),
        col("__total").as("total"), col("day").as("cp_day"),
        col("__abs").as("cusum_abs"),
        expr("(1000L * __abs) DIV (__days * __total)")
          .as("mean_shift_permille"))
      .orderBy("event_type")
  }

  /** Pairwise Pearson correlation between labels' daily count series —
    * "which metrics move together" (a co-moving error/traffic pair is
    * a dependency signal; an anti-correlated pair is a substitution
    * signal). Series are joined on shared observed days; pairs are
    * oriented type_a < type_b. Sums of integer counts are exact, so
    * r = (k·Σxy − Σx·Σy) / √((k·Σx²−(Σx)²)·(k·Σy²−(Σy)²)) has an
    * exactly-representable integer numerator and a
    * correctly-rounded-√ denominator — two IEEE ops from exact
    * integers (the manual-Pearson variance guard: ANSI corr() raises
    * DIVIDE_BY_ZERO on constant series, so zero-variance pairs are
    * excluded by construction). Null labels excluded: a null series
    * name identifies nothing to correlate (winsorizedStats contract).
    *
    * Output: (type_a, type_b, n_days, corr 4 dp) ordered; pairs with
    * < minDays shared days or zero variance dropped.
    *
    * Scale shape: daily pre-agg (bucket grain, checkpointed once for
    * both join sides) → day-keyed equi-join fanning out to
    * |labels|²/2 pairs per day → combinable pair aggregation. Day
    * cardinality × label-pairs stays panel-sized at any event count. */
  def crossCorrelation(events: DataFrame, minDays: Int = 3): DataFrame = {
    require(minDays >= 2, s"minDays must be >= 2: $minDays")
    val daily = events
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(true) // both sides of the pair join
    val a = daily.select(col("day"), col("event_type").as("type_a"),
      col("n").as("x"))
    val b = daily.select(col("day"), col("event_type").as("type_b"),
      col("n").as("y"))
    a.join(b, Seq("day"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"),
        sum(col("x") * col("y")).as("__sxy"))
      .withColumn("__vx", col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__vy", col("n_days") * col("__syy") - col("__sy") * col("__sy"))
      .filter(col("n_days") >= minDays && col("__vx") > 0 && col("__vy") > 0)
      .select(col("type_a"), col("type_b"), col("n_days"),
        round((col("n_days") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double")
          / sqrt((col("__vx") * col("__vy")).cast("double")), 4).as("corr"))
      .orderBy("type_a", "type_b")
  }

  /** EXACT sliding-window distinct users per label — "7-day active
    * users" without approximation and without recomputing a distinct
    * per window. The classic rolling-distinct trap is a per-window
    * `count(DISTINCT)` (re-scans the window for every end day — w×
    * work and a ranking funnel per label); the scalable exact form is
    * the CONTRIBUTION-INTERVAL transform: dedup to (label, user, day)
    * grain, then each appearance covers window-end days
    * [day, min(day + w−1, next_appearance − 1)] — the span where THIS
    * appearance is the user's most recent one inside the window. Each
    * user therefore counts exactly once per covered end day, the
    * explode is bounded by w (7), and the final count is a plain
    * combinable `count(*)` at (label, day) grain. End days are
    * restricted to days the label actually observed traffic (the
    * window-end universe the daily panel reports on).
    *
    * Output: (event_type, end_day DATE, n_distinct_users), ordered by
    * (event_type NULLS FIRST, end_day). Null users identify nobody and
    * are excluded (rollupDistinctUsers contract); a null label is a
    * real group and survives via the null-safe end-day join.
    *
    * Scale shape: one distinct at (label, user, day) grain (bounded by
    * users × days × labels, never event count), one per-(label, user)
    * lead window at the same grain, a ≤w-wide narrow explode, and a
    * combinable count — no window over a label-partitioned event
    * stream, no per-end-day rescan, at any corpus size. */
  def rollingDistinctUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val triples = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .localCheckpoint(true) // feeds the contribution explode AND the end-day universe
    val w = Window.partitionBy("event_type", "user_id").orderBy("day")
    val contrib = triples
      .withColumn("__next", lead("day", 1).over(w))
      .withColumn("__end", when(col("__next").isNull,
          date_add(col("day"), windowDays - 1))
        .otherwise(least(date_add(col("day"), windowDays - 1),
          date_sub(col("__next"), 1))))
      .select(col("event_type"),
        explode(sequence(col("day"), col("__end"))).as("end_day"))
    val counts = contrib.groupBy("event_type", "end_day")
      .agg(count(lit(1)).cast("long").as("n_distinct_users"))
    val observed = triples
      .select(col("event_type").as("__k"), col("day").as("__d")).distinct()
    counts.join(observed,
        col("event_type") <=> col("__k") && col("end_day") === col("__d"))
      .select(col("event_type"), col("end_day"), col("n_distinct_users"))
      .orderBy("event_type", "end_day")
  }

  /** Sliding-window distinct users via HLL SKETCH MERGE — the
    * bounded-state companion to [[rollingDistinctUsers]] for the
    * 100 TB dashboard: the exact form's state is the irreducible
    * (windows × labels × users) membership set, while this panel
    * keeps ONE ~2^lgConfigK-byte Datasketches HLL per (label, day)
    * cell and answers any window by UNIONING w daily sketches —
    * the union of HLLs is the HLL of the union, so the per-window
    * estimate carries the same ±1.04/√2^lgConfigK relative error as
    * a single sketch, independent of window width. lgConfigK = 12
    * (4 KiB/cell, RSE ≈ 1.6%).
    *
    * Output: (event_type, end_day DATE, n_distinct_approx BIGINT) on
    * the SAME end-day universe as the exact twin (days the label
    * observed traffic), ordered (event_type NULLS FIRST, end_day).
    * Null users excluded, null label a real group — the exact twin's
    * contracts.
    *
    * Scale shape: one combinable sketch-agg at (label, day) grain
    * (map-side partial sketches merge — event grain never shuffles),
    * a ≤w-wide explode of the ≤labels×days PANEL (not of events or
    * user-days), one combinable sketch-union agg. No window function,
    * no join against user-grain data at any corpus size. */
  def rollingDistinctUsersHll(events: DataFrame, windowDays: Int = 7,
                              lgConfigK: Int = 12): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val daily = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgConfigK)").as("__sk"))
      .localCheckpoint(true) // feeds the window expand AND the end-day universe
    // each day's sketch contributes to end days [day, day+w−1]; the
    // explode is panel-grain (≤ labels × days × w rows — tiny)
    val approx = daily
      .select(col("event_type"), col("__sk"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("end_day"))
      .groupBy("event_type", "end_day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))")
        .cast("long").as("n_distinct_approx"))
    val observed = daily
      .select(col("event_type").as("__k"), col("day").as("__d"))
    approx.join(observed,
        col("event_type") <=> col("__k") && col("end_day") === col("__d"))
      .select(col("event_type"), col("end_day"), col("n_distinct_approx"))
      .orderBy("event_type", "end_day")
  }

  /** Tolerance audit of [[rollingDistinctUsersHll]] against the exact
    * [[rollingDistinctUsers]] panel (the hll_approx_distinct oracle
    * pattern): both twins on the same end-day universe, row-matched
    * 1:1 via an inner null-safe join (a key mismatch would DROP rows
    * and fail the oracle's row count — universe agreement is itself
    * under test). within_tol pins |approx − exact| ≤ tol·exact; at
    * 5% that is ≳3σ for lgConfigK=12, and below the sketch's dense
    * threshold HLL is exact in sparse mode, so the flag is
    * deterministic-in-practice at every fixture SF. */
  def rollingDistinctUsersHllAudit(events: DataFrame, windowDays: Int = 7,
                                   tolerance: Double = 0.05): DataFrame = {
    val exact = rollingDistinctUsers(events, windowDays)
    val approx = rollingDistinctUsersHll(events, windowDays)
      .withColumnRenamed("event_type", "__k")
      .withColumnRenamed("end_day", "__d")
    exact.join(approx,
        col("event_type") <=> col("__k") && col("end_day") === col("__d"))
      .select(col("event_type"), col("end_day"), col("n_distinct_users"),
        (abs(col("n_distinct_approx") - col("n_distinct_users"))
          .cast("double") <= lit(tolerance)
            * col("n_distinct_users").cast("double")).as("within_tol"))
      .orderBy("event_type", "end_day")
  }

  /** Mutual-information panel between the event label and day-of-week —
    * "is traffic mix a function of weekday" as per-cell pointwise MI
    * (the association-strength read behind seasonality triage: a cell
    * with |pmi| ≫ 0 is a label whose share genuinely shifts on that
    * weekday, not just a busy day). pmi = ln(n·N / (rowtot·coltot))
    * over EXACT integer counts — the only float ops are one division
    * and one ln per cell; mi_contrib = (n/N)·pmi is the cell's share
    * of total MI (Σ over the panel = I(label; dow)).
    *
    * Output: (event_type, dow 0=Monday, n, pmi 4 dp, mi_contrib 4 dp),
    * ordered (event_type NULLS FIRST, dow). Null labels are a real
    * category (their timing structure is itself signal). Null ts rows
    * carry no weekday and are excluded.
    *
    * Scale shape: one combinable count at (label, dow) grain, then
    * window sums over the ≤|labels|·7 panel — marginals never touch
    * event grain. */
  def mutualInfoPanel(events: DataFrame): DataFrame = {
    val cells = events.filter(col("ts").isNotNull)
      .groupBy(col("event_type"),
        weekday(to_date(col("ts"))).cast("long").as("dow"))
      .agg(count(lit(1)).cast("long").as("n"))
    cells
      .withColumn("__rt", sum("n").over(Window.partitionBy("event_type")))
      .withColumn("__ct", sum("n").over(Window.partitionBy("dow")))
      .withColumn("__N", sum("n").over(Window.partitionBy()))
      .withColumn("__pmi",
        log((col("n") * col("__N")).cast("double")
          / (col("__rt") * col("__ct")).cast("double")))
      .select(col("event_type"), col("dow"), col("n"),
        round(col("__pmi"), 4).as("pmi"),
        round(col("n").cast("double") / col("__N").cast("double")
          * col("__pmi"), 4).as("mi_contrib"))
      .orderBy("event_type", "dow")
  }

  /** SCD2 interval build — collapse each user's event-type run history
    * into slowly-changing-dimension rows (valid_from, valid_to,
    * version): the gaps-and-islands transform that turns an
    * event-sourced attribute log into the dimension table an as-of
    * join consumes (see [[asOfEnrichment]] for the probe side).
    * Consecutive same-type events (null-safe: a run of null types is
    * one run) merge into one interval; valid_to = the next run's
    * valid_from, open (null) on the current run.
    *
    * Output: (user_id, version 1-based, event_type, valid_from,
    * valid_to, n_events), ordered by (user_id, version). Deterministic
    * run order: (ts, event_id) — event_id breaks timestamp ties.
    * Null users/ts excluded (no identity / no position in history).
    *
    * Scale shape: two windows at the SAME (user) partitioning — the
    * run-boundary scan at event grain and the valid_to lead at run
    * grain — plus one combinable per-run aggregate; users partition
    * the windows, so no funnel at any event count. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runs = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      // row_number guard: a user whose FIRST event has a null type must
      // still open version 1 (lag's null would null-safe-equal it)
      .withColumn("__chg",
        when(row_number().over(w) > 1
          && (lag("event_type", 1).over(w) <=> col("event_type")), 0L)
          .otherwise(1L))
      .withColumn("__grp", sum("__chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "__grp")
      .agg(min("event_type").as("event_type"),
        min("ts").as("valid_from"),
        count(lit(1)).cast("long").as("n_events"))
    val wRun = Window.partitionBy("user_id").orderBy("__grp")
    runs
      .withColumn("valid_to", lead("valid_from", 1).over(wRun))
      .select(col("user_id"), col("__grp").cast("long").as("version"),
        col("event_type"), col("valid_from"), col("valid_to"),
        col("n_events"))
      .orderBy("user_id", "version")
  }

  /** Two-proportion z-test per label — the A/B read "does arm A emit a
    * different share of label t than arm B", with the deterministic
    * arm assignment `user_id % 2` (the hash-split every experiment
    * framework uses; here the identity split keeps both engines
    * trivially in agreement). For each label: x = events of that label
    * in the arm, n = ALL events in the arm;
    * z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ the pooled
    * proportion — exact integer counts in, three IEEE ops out.
    *
    * Output: (event_type, n_a, x_a, n_b, x_b, p_a 4 dp, p_b 4 dp,
    * z 4 dp, significant = |z| > 1.96), ordered event_type NULLS
    * FIRST. Null-user rows have no arm and are excluded; degenerate
    * (p̂ ∈ {0,1}) labels are dropped (z undefined). A label whose
    * events all land in ONE arm — the strongest possible imbalance —
    * is KEPT (x = 0 on the other side is a well-defined count, z is
    * computable and maximally significant); only an arm that is empty
    * corpus-wide drops the whole panel (no denominator exists).
    *
    * Scale shape: one combinable conditional-count at label grain +
    * window sums over the ≤|labels| panel. */
  def abProportionTest(events: DataFrame): DataFrame = {
    val arm = (col("user_id") % 2).cast("long")
    val perLabel = events.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(when(arm === 0, 1L).otherwise(0L)).cast("long").as("x_a"),
        sum(when(arm === 1, 1L).otherwise(0L)).cast("long").as("x_b"))
      .withColumn("n_a", sum("x_a").over(Window.partitionBy()).cast("long"))
      .withColumn("n_b", sum("x_b").over(Window.partitionBy()).cast("long"))
    perLabel
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("__pooled",
        (col("x_a") + col("x_b")).cast("double")
          / (col("n_a") + col("n_b")).cast("double"))
      .filter(col("__pooled") > 0 && col("__pooled") < 1)
      .withColumn("__z",
        (col("x_a").cast("double") / col("n_a").cast("double")
          - col("x_b").cast("double") / col("n_b").cast("double"))
          / sqrt(col("__pooled") * (lit(1.0) - col("__pooled"))
            * (lit(1.0) / col("n_a").cast("double")
              + lit(1.0) / col("n_b").cast("double"))))
      .select(col("event_type"), col("n_a"), col("x_a"),
        col("n_b"), col("x_b"),
        round(col("x_a").cast("double") / col("n_a").cast("double"), 4).as("p_a"),
        round(col("x_b").cast("double") / col("n_b").cast("double"), 4).as("p_b"),
        round(col("__z"), 4).as("z"),
        (abs(col("__z")) > 1.96).as("significant"))
      .orderBy("event_type")
  }

  /** Mann-Whitney U rank-sum test per label — the NONPARAMETRIC A/B
    * read over per-user engagement: does arm A's distribution of
    * per-user `event_type` counts differ from arm B's (the
    * [[abProportionTest]] companion for heavy-tailed count data where
    * a proportion hides the shift; same deterministic user_id % 2 arm
    * split). Average ranks over the POOLED per-user counts, tie
    * corrected: z = (U_a − n_a·n_b/2) / σ with
    * σ² = n_a·n_b·(n(n−1)(n+1) − Σ(t³−t)) / (12·n(n−1)).
    *
    * Exactness discipline (the t-closeness DECIMAL rule): ranks never
    * materialize per user — per VALUE group (count value v, group size
    * t, arm-A members t_a, pooled count of smaller values c), the
    * doubled rank-sum 2R_a = Σ t_a·(2c + t + 1) is exact INTEGER in
    * DECIMAL(38,0) (a BIGINT t³ overflows at t > 2·10⁶ users on one
    * value), as are 2U_a and the tie term; the only floats are one
    * fixed-order product/quotient, one sqrt, one division — IEEE-
    * identical in both engines (DuckDB's HUGEINT sums match).
    *
    * Output: (event_type, n_a, n_b [users per arm], u2_a = 2·U_a
    * BIGINT, z 4 dp, significant = |ROUNDED z| > 1.96 — the flag never
    * contradicts the printed value), ordered event_type NULLS FIRST.
    * Null-user rows have no arm and are excluded; a label missing from
    * an ARM entirely is dropped (no sample to rank — unlike the
    * proportion test, where x = 0 is itself a count), as are
    * degenerate panels (n < 2 or all counts tied: σ = 0, z undefined).
    *
    * Scale shape: one combinable count at (label, user) grain, one
    * combinable group-by at (label, value) grain (≤ distinct count
    * values — tiny), a window cumsum over that panel, and a per-label
    * aggregate. Event grain is left behind at the first count. */
  def mannWhitneyArms(events: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val perUser = events.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("__v"))
      .withColumn("__arm", (col("user_id") % 2).cast("long"))
    val groups = perUser.groupBy(col("event_type"), col("__v"))
      .agg(count(lit(1)).cast("long").as("__t"),
        sum(when(col("__arm") === 0, 1L).otherwise(0L)).cast("long").as("__ta"))
    val wCum = Window.partitionBy("event_type").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val panel = groups
      .withColumn("__cum", coalesce(sum("__t").over(wCum), lit(0L)))
      .groupBy("event_type")
      .agg(
        sum(dec(col("__ta"))
          * (lit(2) * dec(col("__cum")) + dec(col("__t")) + lit(1)))
          .cast("decimal(38,0)").as("__r2a"),
        sum("__ta").cast("long").as("n_a"),
        sum(col("__t") - col("__ta")).cast("long").as("n_b"),
        sum("__t").cast("long").as("__n"),
        sum(dec(col("__t")) * dec(col("__t")) * dec(col("__t"))
          - dec(col("__t"))).cast("decimal(38,0)").as("__T"))
    val z = col("__num") / col("__den")
    panel
      .filter(col("n_a") > 0 && col("n_b") > 0 && col("__n") >= 2)
      .withColumn("__u2a",
        col("__r2a") - dec(col("n_a")) * (dec(col("n_a")) + lit(1)))
      .withColumn("__inner", dec(col("__n")) * dec(col("__n") - 1)
        * dec(col("__n") + 1) - col("__T"))
      .filter(col("__inner") > 0) // all-tied panel: sigma = 0, z undefined
      .withColumn("__num",
        (col("__u2a") - dec(col("n_a")) * dec(col("n_b"))).cast("double"))
      // fixed order: (n_a*n_b)::dbl * inner::dbl / (3.0 * (n(n-1))::dbl)
      .withColumn("__den", sqrt(
        (dec(col("n_a")) * dec(col("n_b"))).cast("double")
          * col("__inner").cast("double")
          / (lit(3.0)
            * (dec(col("__n")) * dec(col("__n") - 1)).cast("double"))))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("__u2a").cast("long").as("u2_a"),
        round(z, 4).as("z"),
        (abs(round(z, 4)) > 1.96).as("significant"))
      .orderBy("event_type")
  }

  /** CUPED variance-reduced lift per label — the experimentation
    * workhorse (Deng et al., "Improving the Sensitivity of Online
    * Controlled Experiments by Utilizing Pre-Experiment Data"): use
    * each user's PRE-period activity X as a control covariate for
    * their experiment-period metric Y, θ = cov(X,Y)/var(X) pooled
    * across arms, adjusted lift = (ȳ_a − ȳ_b) − θ(x̄_a − x̄_b), and
    * var_reduction = ρ²(X,Y) — the fraction of metric variance the
    * covariate removes. Period split: the corpus GLOBAL time midpoint
    * ((min+max) epoch-µs div 2 — deterministic from the data; the same
    * cutoff for every label keeps panels comparable); X/Y = the user's
    * event counts below/at-or-above the cutoff, arms = user_id % 2.
    *
    * Exactness: X/Y are integer counts; every moment (Σx, Σy, Σxy,
    * Σx², Σy², per-arm Σ) is an exact integer sum, and the centered
    * second moments v_x = nΣx²−(Σx)², v_y, c_xy = nΣxy−ΣxΣy run in
    * DECIMAL(38,0) (the t-closeness rule — n·Σxy overflows BIGINT
    * long before any interesting corpus). The float tail is fixed-
    * order: θ = c/v_x, ρ² = c·c/(v_x·v_y), two mean differences —
    * IEEE-identical in both engines. The midpoint comparison lives in
    * a PROJECTION over the broadcast scalar, never a join condition
    * (the conditioned-scalar-cross BNLJ trap, holtForecast pattern).
    *
    * Uncertainty: diff_adj = r̄_a − r̄_b exactly, where r = y − θx is
    * the CUPED residual, so se = √(s²_r,a/n_a + s²_r,b/n_b) over
    * per-user residuals (θ treated as fixed — its estimation error is
    * second-order, Deng et al. §4; user = cluster, so this is
    * cluster-robust by user for free). Per-arm residual moments come
    * from the SAME exact integer sums: Σr = Σy − θΣx,
    * Σr² = Σy² − 2θΣxy + θ²Σx² — three extra arm-0 DECIMAL columns in
    * the one aggregate, arm-b by exact subtraction from the totals.
    * ci_lo/ci_hi = diff_adj ∓ 1.96·se; the √ argument is clamped at 0
    * (float cancellation in n·Σr² − (Σr)² can graze −0).
    *
    * Output: (event_type, n_a, n_b [users per arm], theta 4 dp,
    * diff_raw 4 dp, diff_adj, se, ci_lo, ci_hi 4 dp,
    * var_reduction 4 dp), ordered event_type NULLS FIRST. Null
    * users/ts excluded; labels with fewer than 2 users in either arm
    * or zero var(X)/var(Y) are dropped (θ / ρ² / s² undefined —
    * no pre-period signal means CUPED has nothing to adjust with).
    *
    * Scale shape: one combinable conditional count at (label, user)
    * grain, one label-grain aggregate, one broadcast scalar cross —
    * event grain is left behind at the first aggregate. */
  def cupedLift(events: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ev = events.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("__us"))
    val mid = ev.agg(expr("(min(__us) + max(__us)) div 2")
      .cast("long").as("__mid"))
    val perUser = ev.crossJoin(broadcast(mid))
      // midpoint test INSIDE the aggregate's projection — a post-cross
      // filter would condition the scalar cross into a BNLJ
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("__us") < col("__mid"), 1L).otherwise(0L))
        .cast("long").as("__x"),
        sum(when(col("__us") >= col("__mid"), 1L).otherwise(0L))
          .cast("long").as("__y"))
      .withColumn("__arm", (col("user_id") % 2).cast("long"))
    val panel = perUser.groupBy("event_type").agg(
      count(lit(1)).cast("long").as("__n"),
      sum("__x").cast("long").as("__sx"), sum("__y").cast("long").as("__sy"),
      sum(dec(col("__x")) * dec(col("__y"))).cast("decimal(38,0)").as("__sxy"),
      sum(dec(col("__x")) * dec(col("__x"))).cast("decimal(38,0)").as("__sxx"),
      sum(dec(col("__y")) * dec(col("__y"))).cast("decimal(38,0)").as("__syy"),
      sum(when(col("__arm") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("__arm") === 0, col("__x")).otherwise(0L))
        .cast("long").as("__sxa"),
      sum(when(col("__arm") === 0, col("__y")).otherwise(0L))
        .cast("long").as("__sya"),
      sum(when(col("__arm") === 0, dec(col("__x")) * dec(col("__y"))))
        .cast("decimal(38,0)").as("__sxya"),
      sum(when(col("__arm") === 0, dec(col("__x")) * dec(col("__x"))))
        .cast("decimal(38,0)").as("__sxxa"),
      sum(when(col("__arm") === 0, dec(col("__y")) * dec(col("__y"))))
        .cast("decimal(38,0)").as("__syya"))
    val theta = col("__cxy").cast("double") / col("__vx").cast("double")
    val diffRaw = col("__sya").cast("double") / col("n_a").cast("double") -
      (col("__sy") - col("__sya")).cast("double") / col("n_b").cast("double")
    val diffX = col("__sxa").cast("double") / col("n_a").cast("double") -
      (col("__sx") - col("__sxa")).cast("double") / col("n_b").cast("double")
    // per-arm Var(r̄) from the residual moments; every input column is
    // an exact integer/DECIMAL sum, the tail is fixed-order doubles
    def varMeanR(n: org.apache.spark.sql.Column,
                 sx: org.apache.spark.sql.Column,
                 sy: org.apache.spark.sql.Column,
                 sxy: org.apache.spark.sql.Column,
                 sxx: org.apache.spark.sql.Column,
                 syy: org.apache.spark.sql.Column) = {
      val sr = sy.cast("double") - theta * sx.cast("double")
      val sr2 = syy.cast("double") -
        lit(2.0) * theta * sxy.cast("double") +
        theta * theta * sxx.cast("double")
      (n.cast("double") * sr2 - sr * sr) /
        (dec(n) * dec(n) * dec(n - 1)).cast("double")
    }
    val vmA = varMeanR(col("n_a"), col("__sxa"), col("__sya"),
      col("__sxya"), col("__sxxa"), col("__syya"))
    val vmB = varMeanR(col("n_b"),
      col("__sx") - col("__sxa"), col("__sy") - col("__sya"),
      col("__sxy") - col("__sxya"), col("__sxx") - col("__sxxa"),
      col("__syy") - col("__syya"))
    val seE = sqrt(greatest(vmA + vmB, lit(0.0)))
    val diffAdj = diffRaw - theta * diffX
    panel
      .withColumn("n_b", (col("__n") - col("n_a")).cast("long"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("__vx",
        dec(col("__n")) * col("__sxx") - dec(col("__sx")) * dec(col("__sx")))
      .withColumn("__vy",
        dec(col("__n")) * col("__syy") - dec(col("__sy")) * dec(col("__sy")))
      .withColumn("__cxy",
        dec(col("__n")) * col("__sxy") - dec(col("__sx")) * dec(col("__sy")))
      .filter(col("__vx") > 0 && col("__vy") > 0)
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(theta, 4).as("theta"),
        round(diffRaw, 4).as("diff_raw"),
        round(diffAdj, 4).as("diff_adj"),
        round(seE, 4).as("se"),
        round(diffAdj - lit(1.96) * seE, 4).as("ci_lo"),
        round(diffAdj + lit(1.96) * seE, 4).as("ci_hi"),
        round(col("__cxy").cast("double") * col("__cxy").cast("double")
          / (col("__vx").cast("double") * col("__vy").cast("double")), 4)
          .as("var_reduction"))
      .orderBy("event_type")
  }

  /** Difference-in-differences per label — the quasi-experimental
    * companion to [[cupedLift]] over the SAME pre/post design: how
    * much more did arm A's per-user activity grow than arm B's,
    * did = (ȳ_a,post − ȳ_a,pre) − (ȳ_b,post − ȳ_b,pre). Where CUPED
    * uses the pre period to DENOISE a randomized comparison, DiD uses
    * it to DIFFERENCE OUT a shared trend when assignment is not
    * random — both belong in the same experiment-readout panel.
    * Period split and arm rule are identical to [[cupedLift]] (global
    * epoch-µs midpoint, user_id % 2).
    *
    * Uncertainty (cluster-robust by USER — the honest variant for a
    * per-user panel): each user is one cluster contributing a single
    * growth observation d = y − x, so did = d̄_a − d̄_b and
    * Var(did) = s²_a/n_a + s²_b/n_b over the per-user d's — arbitrary
    * within-user event correlation is absorbed because d is summed
    * INSIDE the cluster before any variance is taken. se = √Var,
    * ci_lo/ci_hi = did ∓ 1.96·se. The centered second moment
    * n·Σd² − (Σd)² runs exact in DECIMAL(38,0) (≥ 0 by
    * Cauchy-Schwarz, so the √ argument never dips negative); the
    * float tail is fixed-order — IEEE-identical in both engines.
    *
    * Output: (event_type, n_a, n_b [users per arm], pre_a, post_a,
    * pre_b, post_b [4 dp per-user means], did, se, ci_lo, ci_hi
    * [4 dp]), ordered event_type NULLS FIRST. Null users/ts excluded;
    * labels with FEWER THAN 2 users in either arm are dropped (the
    * variance needs n−1; a 1-user arm has no interval to report).
    *
    * Scale shape: the [[cupedLift]] shape — one conditional count at
    * (label, user) grain, one label-grain aggregate, one broadcast
    * scalar cross. */
  def didLift(events: DataFrame): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ev = events.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("__us"))
    val mid = ev.agg(expr("(min(__us) + max(__us)) div 2")
      .cast("long").as("__mid"))
    val perUser = ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("__us") < col("__mid"), 1L).otherwise(0L))
        .cast("long").as("__x"),
        sum(when(col("__us") >= col("__mid"), 1L).otherwise(0L))
          .cast("long").as("__y"))
      .withColumn("__arm", (col("user_id") % 2).cast("long"))
      .withColumn("__d", col("__y") - col("__x"))
    def armSum(arm: Int, c: String) =
      sum(when(col("__arm") === arm, col(c)).otherwise(0L)).cast("long")
    def armSumD2(arm: Int) = // Σd² per arm, exact (d can be negative)
      sum(when(col("__arm") === arm, dec(col("__d")) * dec(col("__d"))))
        .cast("decimal(38,0)")
    val panel = perUser.groupBy("event_type").agg(
      sum(when(col("__arm") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(col("__arm") === 1, 1L).otherwise(0L)).cast("long").as("n_b"),
      armSum(0, "__x").as("__xa"), armSum(0, "__y").as("__ya"),
      armSum(1, "__x").as("__xb"), armSum(1, "__y").as("__yb"),
      armSumD2(0).as("__dda"), armSumD2(1).as("__ddb"))
    def mean(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    // Var(d̄) per arm = (nΣd² − (Σd)²) / (n²(n−1)), the centered moment
    // exact in DECIMAL; Σd per arm = Σy − Σx (already-summed longs)
    def varMean(dd: String, y: String, x: String, n: String) = {
      val sd = dec(col(y) - col(x))
      (dec(col(n)) * col(dd) - sd * sd).cast("double") /
        (dec(col(n)) * dec(col(n)) * dec(col(n) - 1)).cast("double")
    }
    val didE = mean("__ya", "n_a") - mean("__xa", "n_a") -
      (mean("__yb", "n_b") - mean("__xb", "n_b"))
    val seE = sqrt(varMean("__dda", "__ya", "__xa", "n_a")
      + varMean("__ddb", "__yb", "__xb", "n_b"))
    panel.filter(col("n_a") >= 2 && col("n_b") >= 2)
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(mean("__xa", "n_a"), 4).as("pre_a"),
        round(mean("__ya", "n_a"), 4).as("post_a"),
        round(mean("__xb", "n_b"), 4).as("pre_b"),
        round(mean("__yb", "n_b"), 4).as("post_b"),
        round(didE, 4).as("did"),
        round(seE, 4).as("se"),
        round(didE - lit(1.96) * seE, 4).as("ci_lo"),
        round(didE + lit(1.96) * seE, 4).as("ci_hi"))
      .orderBy("event_type")
  }

  /** Kaplan-Meier time-to-event curve — "what share of users has NOT
    * yet converted d days after first touch", with RIGHT CENSORING: a
    * user with no `eventType` event is censored at the observation end
    * (corpus max day), contributing to risk sets but never to deaths
    * (dropping them instead biases conversion optimistically — the
    * classic funnel-latency mistake). Duration = whole days from the
    * user's first event to their first `eventType` event (or to the
    * corpus end if censored); at each conversion duration d:
    * at_risk = users with duration ≥ d, S(d) = Π_{d'≤d}
    * (1 − deaths_{d'}/at_risk_{d'}), computed as exp(Σ ln) over the
    * ordered duration panel with an explicit all-convert guard
    * (Spark's ANSI `log(0)` is NULL, DuckDB's is −inf — the one
    * divergence the closed form would hit; the guard pins S = 0 on
    * both engines).
    *
    * Output: (duration_days, n_at_risk, n_deaths, n_censored_at,
    * survival 4 dp) at conversion durations only (KM step points),
    * ordered by duration. Null users/ts excluded.
    *
    * Scale shape: per-user min aggregates (combinable, user grain) →
    * a duration-grain panel (≤ observation-span days) for the
    * cumulative windows — event count never reaches a window. */
  def survivalKm(events: DataFrame, eventType: String = "purchase"): DataFrame = {
    val base = events.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val spans = base.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("__first"),
        min(when(col("event_type") === eventType, to_date(col("ts"))))
          .as("__conv"))
    // one tiny scalar (the corpus end) cross-joined above the per-user
    // aggregate — the unigramLogProb totals pattern
    val horizon = base.agg(max(to_date(col("ts"))).as("__hend"))
    val lifetimes = spans.crossJoin(broadcast(horizon))
      .select(when(col("__conv").isNotNull,
          datediff(col("__conv"), col("__first")))
        .otherwise(datediff(col("__hend"), col("__first")))
        .cast("long").as("__dur"),
        col("__conv").isNull.as("__censored"))
    val panel = lifetimes.groupBy("__dur")
      .agg(count(lit(1)).cast("long").as("__total"),
        sum(when(col("__censored"), 0L).otherwise(1L)).cast("long").as("n_deaths"))
    val wAsc = Window.orderBy("__dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.orderBy(col("__dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    panel
      .withColumn("__at_risk", sum("__total").over(wDesc))
      .withColumn("__term",
        when(col("n_deaths") < col("__at_risk"),
          log((col("__at_risk") - col("n_deaths")).cast("double")
            / col("__at_risk").cast("double"))).otherwise(lit(0.0)))
      .withColumn("__dead", max(when(col("n_deaths") >= col("__at_risk"), 1L)
        .otherwise(0L)).over(wAsc))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(round(exp(sum("__term").over(wAsc)), 4)))
      .filter(col("n_deaths") > 0)
      .select(col("__dur").as("duration_days"),
        col("__at_risk").as("n_at_risk"), col("n_deaths"),
        (col("__total") - col("n_deaths")).cast("long").as("n_censored_at"),
        col("survival"))
      .orderBy("duration_days")
  }

  /** Holt double-exponential (level + trend) weight vectors — the
    * closed form of the Holt recursion over a FIXED lookback window:
    * with l₁ = y₁, b₁ = y₂ − y₁ and
    * lₜ = α·yₜ + (1−α)(lₜ₋₁ + bₜ₋₁), bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁,
    * both states are LINEAR in the observations, so (l_L, b_L) are dot
    * products of precomputed weight vectors with (y₁..y_L). Generated
    * ONCE here and injected into both engines' literals (the
    * [[ewmaWeights]] pattern — zero drift); at the default
    * α = β = 0.5 every coefficient is an exact dyadic rational.
    * Invariants (spec-pinned): Σ level weights = 1, Σ trend weights
    * = 0 — a constant series forecasts itself with zero trend. */
  def holtWeights(alpha: Double, beta: Double,
                  lookback: Int): (Seq[Double], Seq[Double]) = {
    require(lookback >= 2, s"lookback must be >= 2: $lookback")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1): $beta")
    val l = Array.fill(lookback)(0.0)
    val b = Array.fill(lookback)(0.0)
    l(0) = 1.0
    b(0) = -1.0; b(1) = 1.0
    for (t <- 2 to lookback) {
      val lPrev = l.clone()
      for (i <- 0 until lookback)
        l(i) = (1 - alpha) * (lPrev(i) + b(i))
      l(t - 1) += alpha
      for (i <- 0 until lookback)
        b(i) = beta * (l(i) - lPrev(i)) + (1 - beta) * b(i)
    }
    (l.toSeq, b.toSeq)
  }

  /** Holt linear-trend forecast of daily label volumes — the capacity
    * question "how many events of each type tomorrow / this week" with
    * trend (which the EWMA baseline deliberately lacks). CALENDAR
    * semantics over the last `lookback` days anchored at the GLOBAL
    * corpus last day (every label forecasts the same target dates):
    * unobserved days are true zeros — and because the Holt closed form
    * is a dot product ([[holtWeights]]), zero days contribute nothing,
    * so the series is never densified: the pivot keeps only OBSERVED
    * (label, day) rows and `coalesce(…, 0)` fills the gaps at panel
    * grain.
    *
    * Determinism: level and trend are FIXED left-associated expression
    * trees over exact-dyadic literal weights and exact integer counts
    * (the [[ewmaDailyAnomalies]] rule) — IEEE-identical in any engine;
    * forecast = level + h·trend evaluated in the same literal order.
    *
    * Output: (event_type, base_day = global last day, horizon 1..h,
    * level 4 dp, trend 4 dp, forecast 4 dp), ordered (event_type NULLS
    * FIRST, horizon). Null ts rows excluded; a label with no events
    * inside the window is absent (no observed row reaches the pivot).
    *
    * Scale shape: one combinable daily pre-aggregate (label × day
    * grain), a broadcast scalar cross for the anchor day, then ONE
    * combinable pivot aggregate to a ≤|labels|-row panel — the window
    * math never touches event grain, and there is no per-label
    * ordered window at all (the closed form replaced the recursion). */
  def holtForecast(events: DataFrame, lookback: Int = 14,
                   horizons: Int = 3, alpha: Double = 0.5,
                   beta: Double = 0.5): DataFrame = {
    require(horizons >= 1, s"horizons must be >= 1: $horizons")
    val (lw, tw) = holtWeights(alpha, beta, lookback)
    val daily = events.filter(col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).cast("long").as("__n"))
    val anchor = events.filter(col("ts").isNotNull)
      .agg(max(to_date(col("ts"))).as("__ld"))
    // window membership lives INSIDE the pivot aggregate, never as a
    // post-cross filter: a filter over (__ld, __day) would be pushed
    // into the scalar cross join and condition it into a BNLJ — the
    // PlanLint-banned shape (the corpus_quantile_normalize precedent)
    val win = daily.crossJoin(broadcast(anchor))
      .withColumn("__i", lit(lookback) - datediff(col("__ld"), col("__day")))
    val ys = (1 to lookback).map(j =>
      coalesce(max(when(col("__i") === j, col("__n"))), lit(0L))
        .cast("double").as(s"__y$j"))
    val aggs = max(col("__ld")).as("base_day") +: ys :+
      max(when(col("__i") >= 1 && col("__i") <= lookback, 1L)
        .otherwise(0L)).as("__seen")
    val panel = win.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
      // a label with no observed day inside the window is ABSENT (an
      // observed day always has n >= 1, so all-zero y's ⟺ never seen)
      .filter(col("__seen") === 1)
    def dot(ws: Seq[Double]): Column =
      ws.zipWithIndex.map { case (w, i) => lit(w) * col(s"__y${i + 1}") }
        .reduce(_ + _)
    panel
      .withColumn("__lev", dot(lw))
      .withColumn("__tr", dot(tw))
      .withColumn("horizon", explode(sequence(lit(1L), lit(horizons.toLong))))
      .select(col("event_type"), col("base_day"), col("horizon"),
        round(col("__lev"), 4).as("level"),
        round(col("__tr"), 4).as("trend"),
        round(col("__lev") + col("horizon").cast("double") * col("__tr"), 4)
          .as("forecast"))
      .orderBy("event_type", "horizon")
  }

  /** First touch per (user, label) — the deterministic canonical-dedup
    * twin of the streaming
    * [[graft.streaming.StreamingPipeline.dedupStream]]: for every
    * (user_id, event_type) pair, the single earliest event by the
    * total order (ts, event_id) — event_id breaks timestamp ties, so
    * the survivor is a FUNCTION of the data, never of arrival or plan
    * order (what makes this oracle-able where a bare `dropDuplicates`
    * is not). First-touch attribution, signup funnels, and the
    * batch backfill a streaming dedup restart reconciles against.
    *
    * Output: (user_id, event_type, first_ts, event_id), ordered by
    * (user_id, event_type). Null users/ts excluded (no identity / no
    * position); a null label is a real key.
    *
    * Scale shape: one (user, label)-keyed window — high-cardinality
    * partitioning, no funnel; survivors are pair-grain. */
  def firstTouch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    events.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("ts").as("first_ts"), col("event_id"))
      .orderBy("user_id", "event_type")
  }

  /** Hourly novelty rate — NEW (user, label) combinations appearing
    * per hour (the growth/recency read behind "are we still seeing
    * new users do X, or only repeats"): [[firstTouch]] bucketed to
    * the survivor's hour. This is also the oracled batch twin of the
    * CHAINED streaming plan (dedup-within-watermark → windowed count,
    * [[graft.streaming.StreamingPipeline.noveltyPipeline]]) — fed in
    * event-time order the stream's first-arrival survivor IS the
    * (ts, event_id) minimum, so both agree exactly (spec-pinned).
    * Hour buckets are TIMESTAMP on both engines (`date_trunc('hour')`
    * keeps TIMESTAMP in DuckDB — only the DAY bucket demotes to DATE).
    *
    * Output: (hour, event_type, n_new), ordered (hour, event_type).
    *
    * Scale shape: [[firstTouch]]'s pair-grain window, then one
    * combinable (hour × label) count. */
  def noveltyHourly(events: DataFrame): DataFrame =
    firstTouch(events)
      .groupBy(date_trunc("hour", col("first_ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_new"))
      .orderBy("hour", "event_type")
}
