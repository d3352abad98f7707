package graft.util

import org.apache.spark.sql.DataFrame

object SparkUtil {

  /** Ensure a compute-heavy narrow transform has at least
    * default-parallelism partitions to run on.
    *
    * CONTRACT: pass scan-rooted plans (read-from-files inputs), where
    * the file index provides real size statistics. A stats-less
    * mid-plan input (unknown-size sentinel) is returned unchanged —
    * see the sentinel branch below for why neither probing nor
    * unconditional repartitioning is safe there.
    *
    * Why: Spark sizes scan partitions by input *bytes*
    * (`files.maxPartitionBytes`), which is right for IO-bound work but
    * wrong for CPU-bound per-row operators (hashing, per-token
    * aggregation, JSON round-trips) over small-but-dense inputs — a
    * 2 MB parquet file becomes ONE task no matter how many cores exist.
    * At 100 TB inputs split naturally and this is a no-op; on small
    * inputs the round-robin shuffle costs ~nothing and buys full
    * parallelism. Row-wise results are unaffected by partitioning. */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Decide from plan STATISTICS (file-index sizes), not df.rdd — the
    // RDD accessor forces a physical-plan → RDD conversion per call.
    // Scan parallelism ≈ ceil(bytes / maxPartitionBytes), so an input
    // smaller than target × maxPartitionBytes yields fewer than target
    // scan tasks → repartition; a 100 TB input skips the shuffle.
    val maxPartitionBytes =
      spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.SQLConf.FILES_MAX_PARTITION_BYTES)
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sizeInBytes >= BigInt(spark.sessionState.conf.defaultSizeInBytes)) {
      // unknown-size sentinel (stats-less mid-plan input): leave the
      // plan UNTOUCHED. Neither probe is safe here — df.rdd under AQE
      // eagerly EXECUTES every upstream stage just to count partitions
      // (and the caller's action re-runs them), and an unconditional
      // repartition(target) could SHRINK an already-wide input into
      // giant spill-prone partitions. widen()'s contract is therefore
      // scan-rooted inputs (every in-repo caller): file-index stats are
      // always available there and this branch never fires.
      df
    } else if (sizeInBytes < BigInt(maxPartitionBytes) * target) {
      df.repartition(target)
    } else df
  }

  /** Salted join for a PATHOLOGICALLY skewed key — the explicit tool
    * for the case AQE's skew-split cannot fix: AQE only splits a
    * skewed SHUFFLE partition when the other side's matching partition
    * can be replicated cheaply post-shuffle; with a medium build side
    * or a single key holding most of the fact table, one reducer still
    * drowns. Salting rewrites the join key to (key, salt): the skewed
    * side takes salt = hash(rowKey) mod `saltBuckets` (DETERMINISTIC —
    * `rowKey` is a stable row id, never rand(); the repo's no-rand
    * discipline), the dim side replicates each row `saltBuckets`×, and
    * the hot key's rows spread over `saltBuckets` reducers.
    *
    * Cost model: dim side scans/shuffles ×saltBuckets — size salt
    * buckets to the skew factor, not higher. Join types are restricted
    * to inner/left_outer/left_semi/left_anti: an unmatched RIGHT row
    * exists `saltBuckets` times post-replication, so right/full joins
    * would duplicate it in the output. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 rowKey: org.apache.spark.sql.Column, saltBuckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2: $saltBuckets")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"salted join cannot preserve right/full semantics (an unmatched " +
        s"right row is replicated $saltBuckets times): $joinType")
    val l = skewed.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(rowKey),
        org.apache.spark.sql.functions.lit(saltBuckets)))
    val r = dim.withColumn("__salt",
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(0),
          org.apache.spark.sql.functions.lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
