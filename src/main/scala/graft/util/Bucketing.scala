package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) tables — the co-located-join scale path.
  *
  * At 100 TB the dominant cost of a repeated key-join (e.g. the per-round
  * join of a doc table against its signature/code/metrics tables) is
  * re-shuffling BOTH sides on every run. Spark's table bucketing pays the
  * shuffle ONCE at write time: rows are hash-partitioned into a fixed
  * bucket count by the join key and each bucket written sorted, so a join
  * between two tables bucketed the same way planned as a SortMergeJoin
  * needs NO exchange and NO sort on either side — every executor merges
  * its co-numbered bucket files directly off the scan.
  *
  * This is catalog-backed by design (bucketing metadata lives in the
  * table catalog, not parquet itself), so the API takes table names;
  * `path` makes the data external at a caller-chosen location.
  *
  * Scale notes:
  *  - Pick `buckets` for the TARGET corpus: each bucket is one task's
  *    merge unit per join — at 100 TB, thousands of buckets (e.g. 4096)
  *    keep buckets in the hundreds-of-MB range. The count is fixed at
  *    write time; both sides MUST match ([[joinColocated]] fails loud).
  *  - `spark.sql.sources.bucketing.enabled` (default true) must be on,
  *    and joins wider than `spark.sql.sources.bucketing.maxBuckets`
  *    fall back silently — the plan assert below catches that too.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table. The one-time
    * shuffle that every future co-located join amortizes. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    require(buckets >= 1, s"bucket count must be positive: $buckets")
    // repartition on the SAME hash the bucket spec uses, so each bucket
    // is written by exactly one task as exactly one sorted file — a
    // bucket split across several files loses its sort guarantee and
    // the join re-Sorts both sides (still exchange-free, but O(n log n)
    // per join that the single-file layout gets for free); it is also
    // the small-files-safe write shape (tasks × buckets files otherwise)
    val w = df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on `key` with the exchange-free
    * SortMergeJoin — and FAIL LOUD if the plan still contains a shuffle
    * (mismatched bucket counts, bucketing disabled, or a maxBuckets
    * fallback would otherwise silently re-shuffle 100 TB per run; a
    * silent fallback is the one failure mode worse than an error).
    * The merge hint pins SMJ so a small side never broadcast-sidesteps
    * the co-location this API exists to prove. */
  def joinColocated(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String,
                    joinType: String = "inner"): DataFrame = {
    // Spark ≥3.0 ignores bucket SORT metadata by default (a bucket split
    // across files has no global order — SPARK-28632's legacy conf);
    // [[writeBucketed]] guarantees one sorted file per bucket, so expose
    // the ordering while THIS plan is built and the merge goes sort-free
    // too. Restored after planning — the flag is unsafe for tables other
    // writers produced.
    val k = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val old = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    val (joined, plan) =
      try {
        val j = spark.table(leftTable).hint("merge")
          .join(spark.table(rightTable).hint("merge"), Seq(key), joinType)
        (j, j.queryExecution.executedPlan.toString) // force planning here
      } finally old.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
    require(!plan.contains("Exchange"),
      s"bucketed join $leftTable ⋈ $rightTable on $key still shuffles — " +
        "bucket counts differ, bucketing is disabled, or the bucket count " +
        s"exceeds spark.sql.sources.bucketing.maxBuckets:\n$plan")
    joined
  }
}
