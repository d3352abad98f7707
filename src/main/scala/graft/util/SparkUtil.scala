package graft.util

import org.apache.spark.sql.DataFrame

object SparkUtil {

  /** Ensure a compute-heavy narrow transform has at least
    * default-parallelism partitions to run on.
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
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
