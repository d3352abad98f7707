package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for multi-dimensional data-skipping
  * layouts — the write-side clustering trick behind Delta/Iceberg
  * OPTIMIZE ZORDER: interleave the bits of two scan-predicate columns
  * so a range-partitioned sort on the single z value keeps BOTH
  * columns' values locally clustered. Per-file min/max footers then
  * prune point/range queries on EITHER column, where a plain
  * lexicographic sort clusters only its leading column (the second
  * column's per-file range is the full domain — zero files prunable).
  *
  * Encoding is exact integer bit arithmetic on NON-NEGATIVE codes in
  * [0, 2^bits): bit i of x lands at z bit 2i, bit i of y at 2i+1.
  * Out-of-range inputs fail LOUD in-plan (raise_error) — silently
  * masking high bits would interleave garbage and destroy locality
  * with no error. Callers quantize first (pmod / width bucketing).
  *
  * [[zValue]] (the Catalyst column) and [[zValueSql]] (the portable
  * SQL form the DuckDB oracle runs) are generated from the SAME term
  * list — one source for both engines, zero drift. 2 dimensions, ≤ 31
  * bits each: past that the 2·bits product exceeds a long's mantissa-
  * safe range in engines that lower shifts through doubles.
  */
object ZOrder {

  private def checkBits(bits: Int): Unit =
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")

  /** Bit-interleaved z value of two long columns in [0, 2^bits). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    checkBits(bits)
    val max = lit(1L << bits)
    val guarded = when(
      x < 0 || x >= max || y < 0 || y >= max,
      raise_error(concat(lit(s"ZOrder: input outside [0, ${1L << bits}): x="),
        x, lit(" y="), y)))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    coalesce(guarded.cast("long"), z)
  }

  /** The identical encoding as engine-portable SQL (DuckDB/ANSI bit
    * operators) over column expressions `x`, `y` — the oracle's half
    * of the zero-drift pair. */
  def zValueSql(x: String, y: String, bits: Int): String = {
    checkBits(bits)
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` as `nFiles` z-clustered parquet files: range-partition
    * on the z value (each output file owns a contiguous, DISJOINT z
    * slice — the property file-footer pruning needs) and sort within
    * partitions so row groups inherit the clustering too. The z column
    * itself is dropped from the files — it is a layout key, not data.
    *
    * Scale shape: one range exchange (sampled boundaries — balanced
    * files even under value skew), then a narrow local sort per file;
    * identical cost to any repartitionByRange write. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    nFiles: Int, outDir: String): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1: $nFiles")
    val z = zValue(col(xCol).cast("long"), col(yCol).cast("long"), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
