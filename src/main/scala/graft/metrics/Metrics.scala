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
    * dashboard widgets, dashboard.json:141–156). */
  def errorShareDaily(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("day", col("ts")).as("day"))
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

  /** A6 at scale — t-digest-style mergeable sketch percentiles; ~the
    * dashboard's exponential-bucket DISTRIBUTION metric. No oracle
    * (approximate), verified by rows-only check + spec tolerance. */
  def approxPercentiles(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)),
        lit(10000)).as("pcts"))
      .orderBy("event_type")

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
}
