package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** End-of-pipeline corpus assembly operators — the selection / mixing /
  * budgeting stages a training-data pipeline runs AFTER per-doc scoring
  * and dedup (SURVEY.md §7.7 north star): which documents actually make
  * the training set, at what sampling rate, within what token budget.
  * All three are deterministic (hash-based sampling, no `rand()`), so
  * every stage is DuckDB-oracled and reruns are reproducible — the
  * property a 100 TB corpus build needs for auditability. */
object CorpusOps {

  /** Corpus selection: exact-dedup survivors ∩ quality gate ∩ language
    * allowlist — the composition of [[Dedup.exactDuplicates]] and the
    * [[TextAnalysis.qualityScores]] heuristics into one final keep set.
    *
    * Scale shape: the survivor set is one fingerprint groupBy; the
    * left-semi join shuffles on doc_id (both sides corpus-sized — no
    * broadcast); the quality columns are narrow. Nothing funnels. */
  def corpusSelect(documents: DataFrame, stopwords: Seq[String],
                   langs: Seq[String], minTokens: Int = 10,
                   minStopRatio: Double = 0.05): DataFrame = {
    val keep = documents
      .groupBy(Dedup.exactFingerprint.as("fp"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val toks = TextAnalysis.tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), col("lang"), col("source"),
        size(toks).cast(LongType).as("n_tokens"),
        round(nStop.cast("double") / size(toks), 4).as("stopword_ratio"))
      .join(keep, Seq("doc_id"), "left_semi")
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") >= minStopRatio &&
        col("lang").isInCollection(langs))
      .select("doc_id", "lang", "source", "n_tokens")
      .orderBy("doc_id")
  }

  /** Stratified deterministic sampling — per-language rates for domain
    * mixing (down-weight over-represented languages/sources). A doc is
    * kept iff the first 32 bits of md5(salt || doc_id), read as an
    * unsigned int, fall under rate × 2³². No `rand()`: the sample is a
    * pure function of (doc_id, salt) — reproducible across engines,
    * runs, and partitionings, and a different salt draws an independent
    * sample. Languages absent from `rates` keep everything (rate 1).
    * Fully narrow — a filter at scan speed. */
  /** rate → integer keep-threshold on the u32 hash. Computed ONCE in
    * Scala (floor) and injected as a literal on BOTH the Spark and the
    * oracle side — a float `rate * 2^32` evaluated independently per
    * engine diverges on non-dyadic rates (Spark's double→long cast
    * truncates, DuckDB's CAST rounds to nearest). */
  def sampleThreshold(rate: Double): Long = {
    require(rate >= 0 && rate <= 1, s"rate in [0,1]: $rate")
    math.floor(rate * 4294967296.0).toLong
  }

  def stratifiedSample(documents: DataFrame, rates: Map[String, Double],
                       salt: String): DataFrame = {
    val u32 = conv(substring(
      md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast(LongType)
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), 0L)) { case (acc, (l, r)) =>
        acc.when(col("lang") === l, sampleThreshold(r))
      }.otherwise(sampleThreshold(1.0))
    documents
      .filter(u32 < threshold)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Exact-k per-source sampling — the fixed-QUOTA counterpart to
    * [[mixtureSample]]'s expected-value rates: every source contributes
    * exactly min(k, n_source) documents. Deterministic: docs rank by
    * u32(md5(salt:doc_id)) ascending (a stable pseudo-random order, no
    * `rand()`), the k smallest win. Ranking runs through the
    * `graft_topk` heap aggregate — map-side combine sends ≤k rows per
    * source per partition across the shuffle, where a ranking window
    * would funnel the whole corpus through ≤|sources| reducers. */
  def exactSamplePerSource(documents: DataFrame, k: Int, salt: String): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val u32 = conv(substring(
      md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast(LongType)
    documents
      // negate: the heap keeps top-k by score DESC == smallest hashes
      .select(col("source"), col("doc_id"), (-u32).cast("double").as("neg"))
      .groupBy("source")
      .agg(expr(s"graft_topk(neg, doc_id, $k)").as("top"))
      .select(col("source"), explode(col("top.id")).as("doc_id"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination — drop training documents sharing any
    * word k-shingle with an evaluation set (the n-gram-overlap
    * decontamination every serious pretraining corpus runs; k=3 here
    * matches the dedup shingle scheme, real recipes use 8–13-gram).
    *
    * Scale shape: the eval side is benchmark-sized (≤ millions of
    * grams) — distinct once, then the semi-join on `gram` broadcasts
    * it; the training side is one narrow explode, never materialized
    * beyond the join. A doc with no shingles (< k words) cannot overlap
    * and passes through the anti-join untouched. */
  def decontaminate(documents: DataFrame, evalDocs: DataFrame,
                    k: Int = 3): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingles(col("text"), k)).as("gram")).distinct()
    val contaminated = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select("doc_id").distinct()
    documents.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Domain-mixture sampling — hit target per-source proportions of an
    * `outTotal`-document training mix. For each targeted source the
    * keep-threshold is `want_s × 2³² ÷ n_s` (capped at 2³²) where
    * `want_s = permille_s × outTotal ÷ 1000`; the same deterministic
    * u32(md5) coin as [[stratifiedSample]] decides membership, so the
    * realized counts are expected-value-correct (hash sampling, not
    * exact-k). ALL arithmetic is floor-division over integers — the
    * one form both engines (and any rerun) reproduce bit-exactly;
    * a float `rate` here would make the oracle flap on ulp boundaries.
    * Sources not in `targetsPermille` are dropped (weight 0). The
    * source-count aggregate is tiny (|sources| rows, broadcast back);
    * everything else is a narrow filter. */
  def mixtureSample(documents: DataFrame, targetsPermille: Map[String, Long],
                    outTotal: Long, salt: String): DataFrame = {
    require(targetsPermille.values.forall(v => v >= 0 && v <= 1000),
      s"permille weights in [0,1000]: $targetsPermille")
    val spark = documents.sparkSession
    import spark.implicits._
    val targets = targetsPermille.toSeq.sortBy(_._1).toDF("source", "permille")
    val thresholds = documents.groupBy("source").agg(count(lit(1)).as("n_src"))
      .join(targets, Seq("source"))
      .select(col("source"), least(lit(4294967296L),
        expr(s"((permille * $outTotal) div 1000) * 4294967296 div n_src")).as("thr"))
    val u32 = conv(substring(
      md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast(LongType)
    documents.join(broadcast(thresholds), Seq("source"))
      .filter(u32 < col("thr"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Sequence packing — chunked concatenation: per source, documents
    * concatenate in doc_id order and the token stream splits into
    * fixed-`seqLen` training sequences, documents spanning boundaries
    * (the GPT-style pretraining packing; no padding waste, no bin-
    * packing search). Emits each doc's span: first/last sequence index
    * and its token offset within the first sequence — exactly what a
    * downstream tokenize-and-emit stage needs to materialize sequence
    * shards in parallel. Same window shape (and scale caveat) as
    * [[tokenBudget]]: one running sum per source. */
  def packSequences(documents: DataFrame, seqLen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $seqLen").as("first_seq"),
        expr(s"(cum_tokens - 1) div $seqLen").as("last_seq"),
        expr(s"(cum_tokens - n_tokens) % $seqLen").as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Per-source token budgeting: walk each source's docs in doc_id
    * order, keep documents while the running token total stays within
    * `budget` — the "N tokens per domain" cap of a data-mixing recipe.
    *
    * The cumulative sum partitions by `source`, whose cardinality GROWS
    * with the corpus (unlike a 5-value enum) — each source's walk is an
    * independent reducer, so the window spreads. A pathological
    * single-source corpus would need the range-partition + offset
    * technique ([[graft.metrics.Metrics.percentRankByKey]]); at that
    * point the per-source order itself is the bottleneck, not Spark. */
  def tokenBudget(documents: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .orderBy("doc_id")
  }
}
