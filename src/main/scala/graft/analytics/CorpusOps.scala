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
