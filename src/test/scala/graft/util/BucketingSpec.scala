package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: write-once shuffle, exchange-free SMJ,
  * loud failure on a bucket mismatch (the silent-reshuffle hazard). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_bucket").toString

  test("co-located join: no Exchange in the plan, result equals plain join, mismatch fails loud") {
    val docs = (0L until 500L).map(i => (i, s"doc $i", i % 7)).toDF("doc_id", "txt", "grp")
    val stats = (0L until 500L by 2L).map(i => (i, i * 10)).toDF("doc_id", "score")

    Bucketing.writeBucketed(docs, "b_docs", "doc_id", 8, Some(tmp()))
    Bucketing.writeBucketed(stats, "b_stats", "doc_id", 8, Some(tmp()))

    val joined = Bucketing.joinColocated(spark, "b_docs", "b_stats", "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // bucketed scans feed the SMJ pre-sorted: no Sort operator either
    assert(!plan.contains("Sort "), s"expected sort-free merge:\n$plan")

    val got = joined.select("doc_id", "txt", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val want = docs.join(stats, Seq("doc_id"))
      .select("doc_id", "txt", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == want && got.size == 250)

    // mismatched bucket counts would silently re-shuffle — must throw
    Bucketing.writeBucketed(stats, "b_stats16", "doc_id", 16, Some(tmp()))
    val e = intercept[IllegalArgumentException] {
      Bucketing.joinColocated(spark, "b_docs", "b_stats16", "doc_id")
    }
    assert(e.getMessage.contains("still shuffles"))

    Seq("b_docs", "b_stats", "b_stats16")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("saltedJoin: result equals plain join under 90% key skew, shuffle spreads on (key, salt), right joins rejected") {
    import graft.util.SparkUtil
    // 90% of fact rows share key 7 — the single-reducer pathology
    val fact = (0L until 2000L).map(i => (i, if (i % 10 == 0) i % 5 else 7L))
      .toDF("row_id", "k")
    val dim = (0L until 10L).map(i => (i, s"label_$i")).toDF("k", "label")
    val salted = SparkUtil.saltedJoin(fact, dim, "k", col("row_id"), 8)
    val got = salted.select("row_id", "k", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val want = fact.join(dim, Seq("k")).select("row_id", "k", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(got == want && got.size == 2000)
    // the join key in the plan is (k, __salt) — the hot key spreads
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
    // left_outer keeps unmatched left rows exactly once
    val factX = fact.union(Seq((9999L, 42L)).toDF("row_id", "k"))
    val lo = SparkUtil.saltedJoin(factX, dim, "k", col("row_id"), 8, "left_outer")
    assert(lo.count() == 2001 &&
      lo.filter(col("row_id") === 9999L && col("label").isNull).count() == 1)
    // right/full would replicate unmatched right rows — rejected
    val e = intercept[IllegalArgumentException] {
      SparkUtil.saltedJoin(fact, dim, "k", col("row_id"), 8, "full_outer")
    }
    assert(e.getMessage.contains("right/full"))
  }

  test("rangeJoin equals the naive BETWEEN join; boundaries, negatives, wide intervals, no dups") {
    // deterministic pseudo-random points incl. negative coordinates
    val pts = (0L until 400L)
      .map(i => (i, (i * 7919L % 1000L) - 300L)).toDF("pid", "p")
    // intervals: varied widths (some spanning many bins at w=16, some
    // degenerate end <= start), negative starts
    val ivs = (0L until 60L).map { k =>
      val s0 = (k * 131L % 900L) - 350L
      val e0 = if (k % 10 == 9) s0 - 5L else s0 + (k % 7) * 40L + 1L
      (k, s0, e0)
    }.toDF("iid", "s", "e")
    val got = SparkUtil.rangeJoin(pts, "p", ivs, "s", "e", binWidth = 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pts.crossJoin(ivs)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == got.distinct.length, "multi-bin intervals must not duplicate pairs")
    assert(want.nonEmpty)

    // explicit boundary semantics: start inclusive, end exclusive
    val bp = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 9L)).toDF("pid", "p")
    val bi = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val hits = SparkUtil.rangeJoin(bp, "p", bi, "s", "e", 7L)
      .select("pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(hits == Seq(1L, 2L))

    // the plan must be an equi-join on the bin key, never a nested loop
    val plan = SparkUtil.rangeJoin(pts, "p", ivs, "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")

    // keyed variant: only same-key rows meet; equals the naive keyed
    // BETWEEN join; the point side's key column survives
    val kpts = (0L until 200L)
      .map(i => (i, (i * 31L % 97L) - 20L, s"k${i % 3}")).toDF("pid", "p", "grp")
    val kivs = (0L until 30L)
      .map(k => (k, (k * 17L % 60L) - 25L, (k * 17L % 60L) - 25L + 30L, s"k${k % 3}"))
      .toDF("iid", "s", "e", "grp")
    val kGot = SparkUtil.rangeJoin(kpts, "p", kivs, "s", "e", 16L,
        keyCols = Seq("grp"))
      .select("pid", "iid", "grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val kWant = kpts.crossJoin(kivs.withColumnRenamed("grp", "g2"))
      .filter(col("grp") === col("g2") &&
        col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid", "grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(kGot == kWant && kGot.nonEmpty)
    assert(kGot.size < SparkUtil.rangeJoin(kpts, "p", kivs, "s", "e", 16L)
      .count(), "key condition must restrict matches")

    // an interval wider than maxBinsPerInterval bins fails LOUD
    val wide = Seq((1L, 0L, 10000L)).toDF("iid", "s", "e")
    val err = intercept[Exception] {
      SparkUtil.rangeJoin(bp, "p", wide, "s", "e",
        binWidth = 1L, maxBinsPerInterval = 100L).collect()
    }
    assert(err.getMessage.contains("maxBinsPerInterval") ||
      err.getCause != null &&
        err.getCause.getMessage.contains("maxBinsPerInterval"))
  }

  test("bloomPrefilterJoin: result equals plain join; prefilter sits below the probe-side exchange") {
    // selective build side: 50 of 500 probe keys survive. Parquet-
    // rooted inputs — a LocalRelation probe would be constant-folded
    // straight through the UDF filter, leaving no plan to assert on
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomj").toString
    (0L until 5000L).map(i => (i, i % 500L)).toDF("rid", "k")
      .write.parquet(s"$dir/probe")
    (0L until 500L by 10L).map(i => (i, s"d$i")).toDF("k", "tag")
      .write.parquet(s"$dir/build")
    val probe = spark.read.parquet(s"$dir/probe")
    val build = spark.read.parquet(s"$dir/build")

    val want = probe.join(build, "k").select("rid", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // force the big-big shape the operator exists for (no broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = SparkUtil.bloomPrefilterJoin(probe, build, "k",
        expectedItems = 50L)
      val got = joined.select("rid", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == want && got.size == 500,
        s"bloom prefilter changed the join result: ${got.size} vs ${want.size}")

      // the membership filter must survive optimization ON THE PROBE
      // SUBTREE (filter-before-exchange is the operator's point): in
      // the optimized logical plan the probe-side child of the join is
      // a Filter over the probe relation
      val opt = joined.queryExecution.optimizedPlan
      val join = opt.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.get
      assert(join.left.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("UDF") => f
      }.nonEmpty, s"UDF prefilter missing from probe subtree:\n$opt")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join under broadcast-off:\n$plan")

      // derived expectedItems (the ≤0 default): identical result from
      // the single internal build-side count — no caller-side count()
      // re-executing the build plan (ADVICE r9)
      val gotD = SparkUtil.bloomPrefilterJoin(probe, build, "k")
        .select("rid", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(gotD == want, "derived-expectedItems path changed the join result")

      // EMPTY build side: stat.bloomFilter NPEs on zero rows (the
      // round-7 pitfall) — the util must return the correct empty join
      assert(SparkUtil.bloomPrefilterJoin(probe,
        build.filter(col("k") < 0), "k", 10L).count() == 0)

      // STRING keys probe the sketch as strings (a blanket long cast
      // would throw under ANSI); result still ≡ the plain join
      val sp = probe.withColumn("k", concat(lit("id"), col("k")))
      val sb = build.withColumn("k", concat(lit("id"), col("k")))
      val sGot = SparkUtil.bloomPrefilterJoin(sp, sb, "k", 50L)
        .select("rid", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(sGot == want)

      // mismatched key types across sides fail loud, never silently
      intercept[IllegalArgumentException] {
        SparkUtil.bloomPrefilterJoin(sp, build, "k", 50L)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
  }

  test("mergeAsOf: directions, tolerance, equal-ts and equal-distance ties, unmatched survive") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // key 1 refs at t=10 (r1), t=10 (r2, same ts — max id must win),
    // t=40 (r3); key 2 has no refs
    val ref = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 40L, 3L))
      .map { case (k, t, id) => (k, ts(t), id) }
      .toDF("user_id", "ts", "event_id")
    // probes: p1 t=25 (nearest tie 15/15 -> backward), p2 t=39
    // (nearest -> forward r3), p3 t=5 (only forward exists),
    // p4 t=100 (backward r3; forward none), p5 key 2 (no refs at all)
    val probe = Seq((1L, 25L, 101L), (1L, 39L, 102L), (1L, 5L, 103L),
      (1L, 100L, 104L), (2L, 50L, 105L))
      .map { case (k, t, id) => (k, ts(t), id) }
      .toDF("user_id", "ts", "event_id")
    def run(dir: String, tol: Long = -1L) =
      SparkUtil.mergeAsOf(probe, ref, "user_id", "ts", "event_id",
          Nil, dir, tol)
        .collect()
        .map(r => r.getLong(2) ->
          (Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long] / 1000000L))).toMap
    val bw = run("backward")
    assert(bw == Map(
      101L -> ((Some(2L), Some(15L))), // same-ts refs: max id wins
      102L -> ((Some(2L), Some(29L))),
      103L -> ((None, None)),          // nothing at-or-before
      104L -> ((Some(3L), Some(60L))),
      105L -> ((None, None))), s"backward: $bw")
    val fw = run("forward")
    assert(fw == Map(
      101L -> ((Some(3L), Some(-15L))),
      102L -> ((Some(3L), Some(-1L))),
      103L -> ((Some(2L), Some(-5L))), // max id among same-ts, forward
      104L -> ((None, None)),
      105L -> ((None, None))), s"forward: $fw")
    val nr = run("nearest")
    assert(nr == Map(
      101L -> ((Some(2L), Some(15L))), // 15 vs 15: tie -> backward
      102L -> ((Some(3L), Some(-1L))),
      103L -> ((Some(2L), Some(-5L))),
      104L -> ((Some(3L), Some(60L))),
      105L -> ((None, None))), s"nearest: $nr")
    // tolerance: nearest within 10 s — p1's backward (15 s) AND
    // forward (15 s) both out; p4's backward (60 s) out; p2 fine
    val nt = run("nearest", tol = 10L)
    assert(nt == Map(
      101L -> ((None, None)),
      102L -> ((Some(3L), Some(-1L))),
      103L -> ((Some(2L), Some(-5L))),
      104L -> ((None, None)),
      105L -> ((None, None))), s"nearest tol: $nt")
    // per-candidate tolerance: backward 29 s out, forward 1 s in — the
    // valid farther side must win, not null out
    val nt2 = run("nearest", tol = 5L)
    assert(nt2(102L) == ((Some(3L), Some(-1L))), s"tol per side: $nt2")
  }

  test("mergeAsOf multi-key: per-composite-group semantics identical, cross-group never matches") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // the single-key fixture REPLICATED under two metric values with
    // per-metric id offsets; plus metric "n" holds a ref at the exact
    // probe timestamps of metric "m" — a key-blind (or single-key)
    // merge would prefer those 0-lag foreign refs, so every assertion
    // below doubles as a cross-group-leak detector
    val refBase = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 40L, 3L))
    val probeBase = Seq((1L, 25L, 101L), (1L, 39L, 102L), (1L, 5L, 103L),
      (1L, 100L, 104L), (2L, 50L, 105L))
    val ref = (refBase.map { case (k, t, id) => (k, "m", ts(t), id) } ++
      refBase.map { case (k, t, id) => (k, "n", ts(t), id + 1000L) } ++
      // 0-lag decoys in "n" at "m"'s probe times
      probeBase.map { case (k, t, id) => (k, "n", ts(t), id + 5000L) })
      .toDF("user_id", "metric", "ts", "event_id")
    val probe = (probeBase.map { case (k, t, id) => (k, "m", ts(t), id) } ++
      probeBase.map { case (k, t, id) => (k, "n", ts(t), id + 1000L) })
      .toDF("user_id", "metric", "ts", "event_id")
    def run(dir: String, tol: Long = -1L) =
      SparkUtil.mergeAsOf(probe, ref, Seq("user_id", "metric"), "ts",
          "event_id", Nil, dir, tol)
        .collect()
        .map(r => r.getLong(3) ->
          (Option(r.get(4)).map(_.asInstanceOf[Long]),
            Option(r.get(5)).map(_.asInstanceOf[Long] / 1000000L))).toMap
    // metric "m" reproduces the single-key nearest semantics verbatim
    // (the decoys live in "n" — any leak flips these)
    val nr = run("nearest")
    assert(nr(101L) == ((Some(2L), Some(15L))) &&
      nr(102L) == ((Some(3L), Some(-1L))) &&
      nr(103L) == ((Some(2L), Some(-5L))) &&
      nr(104L) == ((Some(3L), Some(60L))) &&
      nr(105L) == ((None, None)), s"metric m: $nr")
    // metric "n" probes sit exactly ON their decoy refs: 0-lag match
    assert(nr(1101L) == ((Some(5101L), Some(0L))) &&
      nr(1105L) == ((Some(5105L), Some(0L))), s"metric n: $nr")
    // directions + tolerance re-run over the composite key
    val bw = run("backward")
    assert(bw(101L) == ((Some(2L), Some(15L))) &&
      bw(103L) == ((None, None)), s"backward: $bw")
    val fw = run("forward")
    assert(fw(103L) == ((Some(2L), Some(-5L))) &&
      fw(104L) == ((None, None)), s"forward: $fw")
    val nt = run("nearest", tol = 10L)
    assert(nt(101L) == ((None, None)) &&
      nt(102L) == ((Some(3L), Some(-1L))), s"tolerance: $nt")
  }
}
