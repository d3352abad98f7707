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

  /** Binned point-in-interval range join — `points` rows matched to
    * every `intervals` row with start ≤ point < end (half-open, the
    * session/window convention), WITHOUT the plan shape Spark gives a
    * raw BETWEEN predicate (BroadcastNestedLoopJoin when one side fits
    * in memory, CartesianProduct otherwise — both O(n·m) compare
    * volume; the cartesian is the stage that never finishes at 100 TB).
    *
    * The bin trick (the public interval-join design in Spark range-join
    * extensions and the genomics literature): pick `binWidth`; a point
    * has exactly ONE bin (floor(p / w)), an interval covers its bin
    * span (floor(start/w) … floor((end−1)/w)); equi-join on the bin key
    * + the residual exact predicate. Because the point side contributes
    * one bin per row, a matching pair meets in exactly one bin — no
    * post-join dedup. Compare volume drops from |points|·|intervals| to
    * Σ per-bin products; the equi-join shuffles/broadcasts like any
    * other join (AQE picks broadcast when the exploded interval side is
    * small, shuffle-hash at scale — both beat a nested loop).
    *
    * Bin arithmetic is exact long floor-division ((p − pmod(p, w)) div
    * w — pmod is non-negative, the difference is an exact multiple, and
    * `div` on exact multiples IS floor), never a double `floor(p/w)`
    * (loses ulps past 2⁵³ — epoch-micros are within a factor of 8).
    * Degenerate intervals (end ≤ start) match nothing and are dropped
    * at plan speed. An interval wider than `maxBinsPerInterval` bins
    * fails LOUD in-plan (raise_error) — the silent alternative is one
    * interval exploding into millions of rows; pick binWidth near the
    * typical interval length so the explode factor stays O(1).
    *
    * Output: points.* ++ intervals.* for each match (caller owns
    * disjoint column names); inner join — absent points/intervals
    * simply don't appear.
    *
    * `keyCols` (round 9) adds per-key semantics — the trailing-window
    * / per-entity interval-join shape ("events within the hour before
    * THIS user's event"): both sides must carry the named columns, the
    * equi-join key becomes (bin ++ keys) so only same-key rows ever
    * meet, and the output keeps the POINT side's copy. This is also
    * the skew story: a hot time bin full of DIFFERENT keys spreads
    * across reducers instead of melting one. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                binWidth: Long, maxBinsPerInterval: Long = 100000L,
                keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive: $maxBinsPerInterval")
    import org.apache.spark.sql.functions._
    val w = s"${binWidth}L"
    val p = points.withColumn("__p", col(pointCol).cast("long"))
      .withColumn("__bin", expr(s"(__p - pmod(__p, $w)) div $w"))
      .drop("__p")
    val iv = intervals
      .withColumn("__s", col(startCol).cast("long"))
      .withColumn("__e", col(endCol).cast("long"))
      .filter(col("__e") > col("__s"))
      .withColumn("__b0", expr(s"(__s - pmod(__s, $w)) div $w"))
      .withColumn("__b1", expr(s"((__e - 1) - pmod(__e - 1, $w)) div $w"))
      .withColumn("__bin",
        explode(when(col("__b1") - col("__b0") < maxBinsPerInterval,
          sequence(col("__b0"), col("__b1")))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval wider than maxBinsPerInterval=" +
              s"$maxBinsPerInterval bins at binWidth=$binWidth: ["),
            col("__s"), lit(", "), col("__e"), lit(")"))))))
      .drop("__b0", "__b1")
    val ivk = keyCols.foldLeft(iv)((df, k) =>
      df.withColumnRenamed(k, s"__k_$k"))
    val keyCond = keyCols
      .map(k => p(k) === ivk(s"__k_$k"))
      .foldLeft(p("__bin") === ivk("__bin"))(_ && _)
    keyCols.foldLeft(
        p.join(ivk,
          keyCond &&
            col(pointCol).cast("long") >= col("__s") &&
            col(pointCol).cast("long") < col("__e"))
          .drop("__bin").drop("__s").drop("__e"))(
        (df, k) => df.drop(s"__k_$k"))
  }

  /** Bloom-prefiltered equi-join — the manual form of a runtime join
    * filter for the BIG–BIG case where neither side broadcasts: build a
    * Bloom filter over the (smaller) build side's join keys, broadcast
    * the ~bytes-per-key sketch, and drop non-matching probe rows AT THE
    * SCAN, before the probe side's exchange. With a selective build
    * side the shuffle volume falls by the join selectivity — at 100 TB
    * the probe-side exchange IS the job cost, and this is the only
    * lever when the build side is too big to broadcast as rows but its
    * key SKETCH (~1.2 bytes/key at 1% fpp) still fits.
    *
    * Result is EXACTLY `probe ⋈ build` (inner equi-join): the sketch
    * has no false negatives, so no matching row is dropped; false
    * positives survive the prefilter but are removed by the real join
    * that follows. Null probe keys fail the membership probe — same
    * fate an inner equi-join gives them.
    *
    * `expectedItems` must be ≥ the build side's key cardinality: an
    * undersized sketch silently degrades the fpp (prefilter lets more
    * rows through — correctness unaffected, the perf win shrinks).
    * Pass ≤ 0 (the default) to derive it from the build side's row
    * count — always ≥ key cardinality, and free given the
    * materialization below.
    * The membership probe is a Scala UDF by necessity and justified
    * (the repo's Bloom-UDF precedent, Dedup.bloomAdmit): the sketch's
    * Murmur3 probe sequence has no Catalyst form, and the UDF holds
    * only a broadcast reference. */
  def bloomPrefilterJoin(probe: DataFrame, buildIn: DataFrame, key: String,
                         expectedItems: Long = -1L,
                         fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // fan-out checkpoint discipline (ADVICE r9): the build side has
    // THREE consumers — the emptiness/cardinality count, the sketch
    // build, and the real join — and an expensive build subplan would
    // otherwise execute three times (ReuseExchange does not cover
    // differently-shaped consumers). Materialize it ONCE.
    val build = buildIn.localCheckpoint(true)
    val nBuild = build.count()
    // an EMPTY build side NPEs stat.bloomFilter (the round-7
    // bloomAdmissionPipeline pitfall) — the correct join result is
    // empty anyway, so short-circuit with the plain (empty) join
    if (nBuild == 0) return probe.join(build, key)
    val items = if (expectedItems > 0) expectedItems else nBuild
    // key-type dispatch: the sketch probes longs for integral keys and
    // UTF-8 strings otherwise — a blanket cast("long") would THROW on
    // string keys under ANSI (or silently null-empty the prefilter
    // without it)
    val keyType = probe.schema(key).dataType
    build.schema(key).dataType match {
      case t if t != keyType =>
        throw new IllegalArgumentException(
          s"bloomPrefilterJoin: key '$key' type mismatch: probe $keyType " +
            s"vs build ${build.schema(key).dataType}")
      case _ =>
    }
    val integral = keyType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"bloomPrefilterJoin: unsupported key type $other for '$key' " +
          "(integral or string)")
    }
    if (integral) {
      val bf = build.select(col(key).cast("long").as("__k"))
        .stat.bloomFilter("__k", items, fpp)
      val bc = probe.sparkSession.sparkContext.broadcast(bf)
      val mightContain =
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      probe.filter(mightContain(col(key).cast("long"))).join(build, key)
    } else {
      val bf = build.select(col(key).as("__k"))
        .stat.bloomFilter("__k", items, fpp)
      val bc = probe.sparkSession.sparkContext.broadcast(bf)
      val mightContain =
        udf((k: String) => k != null && bc.value.mightContainString(k))
      probe.filter(mightContain(col(key))).join(build, key)
    }
  }

  /** pandas/kdb `merge_asof` — for every probe row, the single
    * reference row with the same key whose timestamp is the nearest
    * at-or-before (`backward`), at-or-after (`forward`), or closest
    * either way (`nearest`, ties to backward), optionally within
    * `toleranceSeconds`. The feature-join every training-data
    * pipeline runs against slowly-arriving reference data (prices,
    * model versions, dimension snapshots) where an equi-join on time
    * can never hit.
    *
    * Plan shape (100 TB): NO join at all — both sides union under one
    * tagged schema and a per-key ordered window carries the latest
    * (or, scanned descending, the next) reference struct onto each
    * probe row: ONE exchange on the key, per-key sorts, no pair
    * blow-up, no range-bin tuning (the [[rangeJoin]] alternative for
    * interval semantics). `nearest` runs both scans over the SAME
    * exchange (two sorts, one shuffle).
    *
    * Determinism: reference rows tie-broken by `refIdCol` — at equal
    * |Δt| backward wins, and among same-timestamp references the MAX
    * id under the column's NATURAL ordering wins (lexicographic for
    * string ids), in every direction (the oracle mirrors the rule).
    * Matches outside tolerance become nulls (the probe row survives —
    * pandas semantics). Null keys group together and match only each
    * other; null probe timestamps never match.
    *
    * Output: every probe column, then `asof_<refIdCol>`,
    * `asof_lag_us` = probe.ts − ref.ts in µs (signed; negative =
    * forward match), and `asof_<c>` for each requested `refValueCols`
    * column. */
  def mergeAsOf(probe: DataFrame, ref: DataFrame, keyCol: String,
                tsCol: String, refIdCol: String,
                refValueCols: Seq[String],
                direction: String,
                toleranceSeconds: Long): DataFrame =
    mergeAsOf(probe, ref, Seq(keyCol), tsCol, refIdCol, refValueCols,
      direction, toleranceSeconds)

  /** Single-key [[mergeAsOf]] with the usual defaults (Scala permits
    * defaults on only one overload — the multi-key core carries them). */
  def mergeAsOf(probe: DataFrame, ref: DataFrame, keyCol: String,
                tsCol: String, refIdCol: String): DataFrame =
    mergeAsOf(probe, ref, Seq(keyCol), tsCol, refIdCol)

  /** Multi-key [[mergeAsOf]] — pandas `by=[k1, k2, …]` parity
    * (device+metric, user+experiment: the first thing a real caller
    * hits). The union-tag window generalizes for free: the partition
    * key widens from one column to a STRUCT of the key columns, whose
    * grouping equality is field-wise null-safe — so composite null
    * keys group exactly like the single-key contract. Everything else
    * (one exchange, per-candidate tolerance, tie rules) is unchanged
    * and the single-key specs re-run verbatim through the overload. */
  def mergeAsOf(probe: DataFrame, ref: DataFrame, keyCols: Seq[String],
                tsCol: String, refIdCol: String,
                refValueCols: Seq[String] = Nil,
                direction: String = "backward",
                toleranceSeconds: Long = -1L): DataFrame = {
    require(keyCols.nonEmpty, "mergeAsOf: at least one key column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest: $direction")
    require(toleranceSeconds == -1L || toleranceSeconds > 0,
      s"toleranceSeconds must be positive or -1 (unbounded): $toleranceSeconds")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val tolUs =
      if (toleranceSeconds == -1L) Long.MaxValue
      else toleranceSeconds * 1000000L
    val probeCols = probe.columns.toSeq
    val refStruct = struct(col(refIdCol).as("__rid") +:
      col("__us").as("__rus") +: refValueCols.map(col): _*)
    // null-struct types built directly from the schemas — no throwaway
    // plan analysis, and nothing to keep textually in sync
    val probeType = org.apache.spark.sql.types.StructType(
      probeCols.map(c => probe.schema(c)))
    val refType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rid",
        ref.schema(refIdCol).dataType) +:
      org.apache.spark.sql.types.StructField("__rus",
        org.apache.spark.sql.types.LongType) +:
      refValueCols.map(c => ref.schema(c)))
    // composite partition key as a struct — grouping equality is
    // field-wise null-safe, preserving the null-key contract
    val keyStruct = struct(keyCols.map(col): _*)
    val rSide = ref
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .select(keyStruct.as("__k"), col("__us"), lit(0).as("__tag"),
        // tie order in the id column's NATURAL type (a long cast would
        // ANSI-throw on string ids; lexicographic for strings, noted)
        col(refIdCol).as("__oid"),
        lit(null).cast(probeType).as("__p"),
        refStruct.as("__r"))
    val pSide = probe
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .select(keyStruct.as("__k"), col("__us"), lit(1).as("__tag"),
        lit(null).cast(ref.schema(refIdCol).dataType).as("__oid"),
        struct(probeCols.map(col): _*).as("__p"),
        lit(null).cast(refType).as("__r"))
    val u = pSide.unionByName(rSide)
    // at equal ts the reference sorts BEFORE the probe (tag 0 < 1) so
    // an exactly-simultaneous reference matches; among equal-ts
    // references the scan-last (max id) wins
    val bwW = Window.partitionBy("__k")
      .orderBy(col("__us").asc, col("__tag").asc, col("__oid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwW = Window.partitionBy("__k")
      .orderBy(col("__us").desc, col("__tag").asc, col("__oid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // tolerance applies PER CANDIDATE, before nearest chooses — else a
    // just-out-of-tolerance nearer match would null out a valid
    // farther one on the other side (the oracle is argmin WITHIN
    // tolerance)
    def tolOnly(m: org.apache.spark.sql.Column,
                diff: org.apache.spark.sql.Column) =
      when(m.isNotNull && diff <= tolUs, m)
    val withMatch = direction match {
      case "backward" =>
        val bw = last("__r", ignoreNulls = true).over(bwW)
        u.withColumn("__bw", bw).withColumn("__m",
          tolOnly(col("__bw"), col("__us") - col("__bw.__rus")))
      case "forward" =>
        val fw = last("__r", ignoreNulls = true).over(fwW)
        u.withColumn("__fw", fw).withColumn("__m",
          tolOnly(col("__fw"), col("__fw.__rus") - col("__us")))
      case "nearest" =>
        val bw = last("__r", ignoreNulls = true).over(bwW)
        val fw = last("__r", ignoreNulls = true).over(fwW)
        u.withColumn("__bw", bw).withColumn("__fw", fw)
          .withColumn("__vb",
            tolOnly(col("__bw"), col("__us") - col("__bw.__rus")))
          .withColumn("__vf",
            tolOnly(col("__fw"), col("__fw.__rus") - col("__us")))
          .withColumn("__m",
            when(col("__vb").isNull, col("__vf"))
              .when(col("__vf").isNull, col("__vb"))
              // strict <: an equal-|Δ| tie goes to the backward match
              .when((col("__vf.__rus") - col("__us"))
                < (col("__us") - col("__vb.__rus")), col("__vf"))
              .otherwise(col("__vb")))
    }
    withMatch
      .filter(col("__tag") === 1)
      .select(probeCols.map(c => col(s"__p.$c").as(c)) ++ Seq(
        col("__m.__rid").as(s"asof_$refIdCol"),
        (col("__us") - col("__m.__rus")).as("asof_lag_us")) ++
        refValueCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
