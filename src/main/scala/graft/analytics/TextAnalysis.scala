package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a
  * `documents(doc_id, text, lang, source, n_chars)` table: token
  * counting, quality scoring, language ID, fingerprinting. All
  * per-document (narrow, codegen'd, no shuffle) — at 100 TB these run
  * at scan speed and only downstream aggregations shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword proxy: word pieces + punctuation as separate
    * tokens (a deterministic regex stand-in for a real tokenizer). */
  def bpeishTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Token statistics per document. */
  def tokenStats(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_uniq_tokens"),
        size(bpeishTokens(col("text"))).cast("long").as("n_subwords"),
        col("n_chars"))
      .withColumn("type_token_ratio",
        round(col("n_uniq_tokens").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")

  /** Quality scoring: length, mean word length, punctuation density,
    * stopword ratio — the cheap heuristics used to filter web corpora. */
  def qualityScores(documents: DataFrame, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    graft.util.SparkUtil.widen(documents).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(length(col("text")).cast("double") / size(toks), 4).as("mean_token_len"),
        round(nPunct.cast("double") / length(col("text")), 6).as("punct_density"),
        round(nStop.cast("double") / size(toks), 4).as("stopword_ratio"))
      .withColumn("is_quality",
        col("n_tokens") >= 10 && col("stopword_ratio") >= 0.05)
      .orderBy("doc_id")
  }

  /** Repetition scoring — the Gopher-style repetitive-content signals:
    * fraction of DUPLICATE word bigrams/trigrams per document (1 −
    * distinct/total). Boilerplate, keyword stuffing and generation
    * loops score high; natural prose scores near 0. Shingle-less docs
    * (< n words) score 0. Narrow and codegen'd like every per-doc
    * scorer — scan speed. */
  def repetitionScores(documents: DataFrame): DataFrame = {
    def dupRatio(grams: Column): Column =
      round(when(size(grams) > 0,
        lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
        .otherwise(0.0), 4)
    graft.util.SparkUtil.widen(documents).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        dupRatio(Dedup.shingles(col("text"), 2)).as("dup_bigram_ratio"),
        dupRatio(Dedup.shingles(col("text"), 3)).as("dup_trigram_ratio"))
      .orderBy("doc_id")
  }

  /** N-gram language ID: score = hits of per-language marker-word sets;
    * argmax wins, ties broken by language code. Deterministic heuristic
    * (the corpus here is synthetic; the operator shape is what counts —
    * a real model would be a broadcast lookup + the same argmax). */
  def languageId(documents: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }
    val maxScore = greatest(scores.map(_._2): _*)
    // ties broken by language code order (first WHEN wins) — the oracle
    // mirrors the same CASE cascade
    val predicted = scores.foldLeft(when(lit(false), "")) { case (acc, (lang, s)) =>
      acc.when(s === maxScore, lang)
    }
    graft.util.SparkUtil.widen(documents).select(
        col("doc_id"), col("lang").as("actual_lang"),
        predicted.as("predicted_lang"),
        maxScore.cast("long").as("marker_hits"))
      .orderBy("doc_id")
  }

  /** Rolling-hash document fingerprints (winnowing, Schleimer et al.):
    * hash every k-char gram of the text, then keep the minimum hash of
    * each sliding window of w grams — the classic plagiarism/near-dup
    * fingerprint set that is robust to insertions (any shared substring
    * of length ≥ w+k-1 yields a shared fingerprint). Gram hashes are
    * md5 slices (engine-stable). Output: per doc, the fingerprint-set
    * summary (count, min, max) — the full exploded set is what a
    * dedup join would consume at scale. */
  def winnowingFingerprints(documents: DataFrame, k: Int = 8, w: Int = 16): DataFrame = {
    val n = length(col("text"))
    // guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so texts
    // shorter than k must short-circuit to an empty gram list
    val grams = when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => substring(md5(substring(col("text"), i, lit(k))), 1, 8)))
      .otherwise(array().cast("array<string>"))
    val wins = when(size(grams) >= w,
      array_distinct(transform(sequence(lit(1), size(grams) - (w - 1)),
        j => array_min(slice(grams, j, lit(w))))))
      .otherwise(when(size(grams) > 0, array(array_min(grams))))
    graft.util.SparkUtil.widen(documents)
      // lambda-bearing trees get no subexpression elimination
      // (SPARK-35410): materialize the window minima once, not 3x
      .withColumn("__wins", wins)
      .select(
        col("doc_id"),
        size(col("__wins")).cast("long").as("n_fingerprints"),
        array_min(col("__wins")).as("min_fp"),
        array_max(col("__wins")).as("max_fp"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: md5 over lowercased alphanumeric-normalized
    * text — the exact-dedup key that survives whitespace/punct noise. */
  def fingerprints(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents).select(
        col("doc_id"),
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fingerprint"),
        md5(col("text")).as("raw_md5"))
      .orderBy("doc_id")
}
