package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for a training-data pipeline over a
  * `documents(doc_id, text, lang, source, n_chars)` table: token
  * counting, quality scoring, language ID, fingerprinting. All
  * per-document (narrow, codegen'd, no shuffle) — at 100 TB these run
  * at scan speed and only downstream aggregations shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "[ \\t\\n\\x0B\\f\\r]+")

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
    graft.util.SparkUtil.widen(documents)
      // words bound once (SPARK-35410 — see Dedup.shinglesFromWords)
      .withColumn("__words", split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        dupRatio(Dedup.shinglesFromWords(col("__words"), 2)).as("dup_bigram_ratio"),
        dupRatio(Dedup.shinglesFromWords(col("__words"), 3)).as("dup_trigram_ratio"))
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
  /** The k-char-gram hash array of `text`. MUST be bound to a column
    * before [[winnowSetFromGrams]] consumes it — see that scaladoc. */
  private[analytics] def gramHashes(k: Int): Column = {
    // r18 opt round: the gram WALK is one codegen'd regexp_extract_all
    // (lookahead captures k codepoints at each position, '.' consumes
    // one — exactly the n−k+1 grams in order; (?s) so literal line
    // separators inside a doc cannot truncate the walk; a shorter text
    // yields [] — the old n >= k guard's semantics for NON-NULL text.
    // NULL text yields NULL (regexp_extract_all is null-in→null-out),
    // where the old when/otherwise form returned []: both current
    // callers converge (winnowSetFromGrams yields null either way;
    // explode and size(null) behave identically), but a future caller
    // must NOT rely on a never-null array contract. The old form's
    // per-element substring(text, i, k) re-walked the string from
    // position 0 inside an interpreted lambda (O(i) each). The md5
    // transform stays a lambda but is element-LOCAL (O(k) per
    // element). Measured 0.94 → 0.45 s at sf0.1; exceptAll 0/0 both
    // directions vs the old form.
    transform(
      regexp_extract_all(col("text"), lit(s"(?s)(?=(.{$k}))."), lit(1)),
      g => substring(md5(g), 1, 8))
  }

  /** Winnowing fingerprint SET from a BOUND gram-hash column (shared
    * by [[winnowingFingerprints]] and
    * [[graft.analytics.Dedup.winnowPairs]]): distinct minima of every
    * w-window of the gram array.
    *
    * `grams` must be an attribute (a `.withColumn` of [[gramHashes]]),
    * never the raw [[gramHashes]] expression inline: the window
    * transform's lambda references it once PER WINDOW, and
    * lambda-bearing trees get no common-subexpression elimination
    * (SPARK-35410) — inlined, every window re-hashed the whole
    * document, turning the linear fingerprint pass quadratic
    * (measured 38 s for 5,000 × 300-char docs; bound, it is ~1 s). */
  private[analytics] def winnowSetFromGrams(grams: Column, w: Int): Column =
    when(size(grams) >= w,
      array_distinct(transform(sequence(lit(1), size(grams) - (w - 1)),
        j => array_min(slice(grams, j, lit(w))))))
      .otherwise(when(size(grams) > 0, array(array_min(grams))))

  def winnowingFingerprints(documents: DataFrame, k: Int = 8, w: Int = 16): DataFrame =
    graft.util.SparkUtil.widen(documents)
      // two bound steps: grams hashed once, minima computed once
      // (SPARK-35410 — see winnowSetFromGrams)
      .withColumn("__grams", gramHashes(k))
      .withColumn("__wins", winnowSetFromGrams(col("__grams"), w))
      .select(
        col("doc_id"),
        size(col("__wins")).cast("long").as("n_fingerprints"),
        array_min(col("__wins")).as("min_fp"),
        array_max(col("__wins")).as("max_fp"))
      .orderBy("doc_id")

  /** Document fingerprint: md5 over lowercased alphanumeric-normalized
    * text — the exact-dedup key that survives whitespace/punct noise. */
  def fingerprints(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents).select(
        col("doc_id"),
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fingerprint"),
        md5(col("text")).as("raw_md5"))
      .orderBy("doc_id")

  /** Unigram language-model scoring — per-document cross-entropy under
    * a unigram model fit on the corpus itself (the CCNet/Gopher
    * "perplexity filter" shape; real recipes use a KenLM 5-gram, the
    * unigram version is the engine-expressible, oracle-checkable
    * proxy). Per doc: mean over tokens of −log2 p(token), with add-one
    * (Laplace) smoothing over the corpus vocabulary; high bits/token =
    * improbable word mix (gibberish, wrong-language), low = natural.
    * Output: (doc_id, n_tokens, bits_per_token), ordered by doc_id.
    *
    * Scale shape (100 TB): two shuffles plus one tiny broadcast. The
    * token explode is narrow; the frequency table is one map-side-
    * combinable groupBy on `token` (vocab-sized — natural-language
    * vocabulary grows sub-linearly in corpus size, but noise tokens are
    * unbounded, so the freq table joins back on the SAME token key as a
    * plain shuffle join, never a forced broadcast — Catalyst reuses the
    * exploded exchange); the (N, V) totals are a 2-value aggregate of
    * the vocab-sized table (AQE reuses the freq exchange), broadcast as
    * ONE row and cross-joined ABOVE the per-doc aggregate — mean bits =
    * log2(N+V) − mean(log2(tf+1)), so token-level rows never touch the
    * scalar join. Per-doc averaging is one doc_id shuffle with a
    * map-side-combinable avg partial. The oracle mirrors the exact
    * arithmetic shape (avg of ln(tf+1), scalar applied after) so the
    * only cross-engine divergence is libm ulp under the 4-dp round. */
  def unigramLogProb(documents: DataFrame): DataFrame = {
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val totals = freq.agg(sum("tf").as("n_total"),
      count(lit(1)).as("n_vocab"))
    val ln2 = log(lit(2.0))
    toks.join(freq, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        avg(log(col("tf") + 1)).as("avg_ln_tf1"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        round((log(col("n_total") + col("n_vocab")) - col("avg_ln_tf1")) / ln2, 4)
          .as("bits_per_token"))
      .orderBy("doc_id")
  }

  /** Vocabulary growth panel — total vs DISTINCT n-gram counts and the
    * type-token ratio for n = 1…maxN (the Heaps-law audit: natural
    * corpora grow distinct types ∝ totalᵝ, β≈0.5–0.7; a TTR near 1 at
    * n=1 is ID-like noise, a collapsing high-n TTR is templating —
    * the two failure modes boilerplate metrics see one n at a time).
    *
    * Output: (n, n_total, n_distinct, ttr 6 dp), ordered by n.
    *
    * Scale shape (100 TB): ONE scan — all n-gram orders are built from
    * the SAME bound token array (SPARK-35410) and explode once as
    * tagged structs; counting is a two-level combinable groupBy
    * ((n, gram) partial counts, then the maxN-row rollup) — the
    * distinct count never funnels through a single reducer. */
  def vocabGrowth(documents: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN in [1, 8]: $maxN")
    val tagged = (1 to maxN).map { n =>
      transform(graft.analytics.Dedup.shinglesFromWords(col("__words"), n),
        g => struct(lit(n).as("n"), g.as("gram")))
    }
    graft.util.SparkUtil.widen(documents)
      .withColumn("__words", tokens(col("text")))
      .select(explode(flatten(array(tagged: _*))).as("t"))
      .select(col("t.n").as("n"), col("t.gram").as("gram"))
      .groupBy("n", "gram").agg(count(lit(1)).as("c"))
      .groupBy("n")
      .agg(sum("c").cast("long").as("n_total"),
        count(lit(1)).cast("long").as("n_distinct"))
      .select(col("n").cast("long").as("n"), col("n_total"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_total"), 6).as("ttr"))
      .orderBy("n")
  }

  /** Tokenizer fertility per language — the tokenizer-fit panel
    * (fertility = subword tokens per whitespace word; the published
    * multilingual-tokenizer health metric: a language far above the
    * corpus norm is being shredded into char-level pieces and will
    * train poorly at the same sequence budget). Also chars per subword
    * (compression ratio — the bytes-per-token cost planners budget
    * with). Uses [[bpeishTokens]] as the deterministic subword proxy;
    * a real tokenizer changes only the token expression.
    *
    * Output: (lang, n_docs, n_words, n_subwords, fertility 4 dp,
    * chars_per_subword 4 dp), ordered by lang. Null-text docs count in
    * n_docs with zero tokens.
    *
    * Scale shape: ONE combinable lang groupBy over narrow per-row
    * token counts — map-side partials, |langs| output rows, no joins,
    * one scan. */
  def tokenizerFertility(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents)
      .select(col("lang"),
        coalesce(size(tokens(col("text"))), lit(0)).cast("long").as("__w"),
        coalesce(size(bpeishTokens(col("text"))), lit(0)).cast("long").as("__b"),
        coalesce(length(col("text")), lit(0)).cast("long").as("__c"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("__w").cast("long").as("n_words"),
        sum("__b").cast("long").as("n_subwords"),
        // null, not NaN, for an all-empty language (0/0 is an IEEE NaN
        // in both engines, but a NULL states "no tokens" honestly)
        when(sum("__w") > 0,
          round(sum("__b").cast("double") / sum("__w"), 4)).as("fertility"),
        when(sum("__b") > 0,
          round(sum("__c").cast("double") / sum("__b"), 4))
          .as("chars_per_subword"))
      .orderBy("lang")

  /** Guaranteed-support frequent tokens — the classic TWO-PASS heavy
    * hitter (Misra-Gries 1982 + exact verify; public): every token
    * whose corpus frequency exceeds N/(k+1), with its EXACT count, in
    * O(k) memory and no vocabulary-sized shuffle for candidate
    * generation. Pass 1 is one narrow shuffle-free job — per-partition
    * MG(k) sketches merged via treeAggregate (the sketch is mergeable;
    * [[CorpusOps.mgAddAll]] holds the bound proof); any token with
    * f > N/(k+1) is GUARANTEED to survive as a candidate. Pass 2
    * re-scans with a ≤k-token IN filter at scan speed and exact-counts
    * only candidates, then applies the true threshold — so the output
    * is EXACTLY {token : cnt·(k+1) > N}, independent of sketch
    * internals (the oracle computes that set from full counts; a hash
    * match proves the survival guarantee, not plan agreement).
    *
    * Contrast with [[vocabCoverage]]'s top-k (a vocabulary-sized
    * groupBy + heap — exact but pays the vocab shuffle): this is the
    * streaming-scale path when the vocabulary itself is too large to
    * shuffle (token-level 100 TB web text) and the question is
    * "which tokens exceed share s", not "the k largest".
    *
    * EAGER: pass 1 runs a Spark job at CALL time (the candidate list
    * must exist to build the pass-2 plan — same contract as
    * [[CorpusOps.cumulativeTokens]]'s dominance probe).
    *
    * Output: (token, cnt, share 6 dp), cnt DESC, token ASC. */
  def frequentTokens(documents: DataFrame, k: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val tokCol = graft.util.SparkUtil.widen(documents)
      .select(explode(tokens(col("text"))).as("token"))
    val (sketch, total) =
      CorpusOps.mgSketch(tokCol.select(col("token")), k)
    val cands = sketch.keys.toSeq
    tokCol
      .filter(col("token").isInCollection(cands))
      .groupBy("token").agg(count(lit(1)).cast("long").as("cnt"))
      .filter(col("cnt") * (k + 1) > total)
      .select(col("token"), col("cnt"),
        round(col("cnt").cast("double") / lit(total), 6).as("share"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, public):
    * split each SOURCE's documents into `nBuckets` equal-population
    * bands of the LM score — bucket 0 ("head") = most fluent (lowest
    * bits/token), last = "tail". CCNet keeps head+middle per language;
    * here the grain is `source` and the LM is [[unigramLogProb]]'s
    * oracle-expressible unigram model (the real pipeline drops a KenLM
    * in the same slot — only the score column changes). Documents with
    * no tokens have no LM score and are absent, as in CCNet.
    *
    * Output: (doc_id, source, bits_per_token, bucket), ordered by
    * doc_id. Bucket boundaries use the ROUNDED score with a doc_id
    * tie-break (the rank discipline — a raw-double rank would be
    * ulp-unstable cross-engine) and ((rank−1)·B) div n integer math
    * (no float boundary).
    *
    * Scale shape (100 TB): the LM fit and per-doc score are
    * [[unigramLogProb]]'s shape (token groupBy + same-key join back,
    * one broadcast totals row); source attachment is a doc_id shuffle
    * join; the per-source rank is the skew-safe
    * [[graft.metrics.Metrics.rankByKey]] (range partition +
    * per-partition windows) — a dominant source never funnels through
    * one reducer, the exact hazard of `Window.partitionBy(source)`. */
  def perplexityBuckets(documents: DataFrame, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val scored = unigramLogProb(documents)
      .select(col("doc_id"), col("bits_per_token"))
    val withSource = scored.join(
      documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    graft.metrics.Metrics.rankByKey(withSource, "source",
        Seq("bits_per_token", "doc_id"))
      .select(col("doc_id"), col("source"), col("bits_per_token"),
        expr(s"((_rank - 1) * $nBuckets) div _nk").cast("long").as("bucket"))
      .orderBy("doc_id")
  }

  /** Okapi BM25 relevance of every document against a fixed query term
    * set — the lexical-retrieval scorer a corpus pipeline uses for
    * retrieval-based filtering ("keep documents relevant to domain X")
    * and retrieval-style decontamination. Lucene's smoothed idf:
    * ln(1 + (N − df + ½)/(df + ½)); per-term score
    * idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)); a document's
    * score sums its matched query terms. Only matching documents are
    * returned. Output: (doc_id, n_matched_terms, bm25), ordered by
    * doc_id.
    *
    * Scale shape (100 TB): the explode is narrow and the query-term
    * filter drops non-matches at scan speed; `matched` is
    * |docs|×|query| at worst. The df table is ≤ |terms| rows
    * (broadcast — genuinely bounded by the query, unlike a vocabulary);
    * doc lengths join on doc_id (corpus-sized both sides — plain
    * shuffle join); (N, avgdl) is one broadcast row cross-joined above
    * the per-(doc, term) rows, which number ≤ |docs|×|terms|. */
  /** Okapi defaults — the single source both the operator signature
    * and the `txt_bm25_scores` oracle SQL derive from, so the two
    * cannot silently desynchronize. */
  val Bm25K1: Double = 1.2
  val Bm25B: Double = 0.75

  /** Bigram language-model scoring — the two-token deepening of
    * [[unigramLogProb]]: per-document mean −log2 of the add-one-
    * smoothed CONDITIONAL bigram probability p(w2|w1) =
    * (c(w1 w2) + 1) / (c(w1 ·) + V), fit on the corpus itself, where
    * c(w1 ·) counts w1 as a bigram head and V is the distinct-
    * continuation vocabulary. Catches what the unigram can't: scrambled
    * word salads score high even when every individual word is common.
    * Documents with < 2 tokens have no bigrams and are omitted (the
    * unigram scorer covers them). Output: (doc_id, n_bigrams,
    * bits_per_bigram), ordered by doc_id.
    *
    * Scale shape (100 TB): the paired-token projection is narrow (array
    * zip, no self-join); the bigram-count table groups on the (w1, w2)
    * key with map-side combine and joins back on the SAME key (plain
    * shuffle join — bigram vocabulary is unbounded, never broadcast);
    * head counts reduce the bigram table again (vocab-sized) and join
    * on w1; the single V scalar joins as one broadcast row BELOW the
    * per-doc aggregate — it sits inside ln(c1 + V) so it cannot be
    * lifted above the mean like the unigram scalar. */
  def bigramLogProb(documents: DataFrame): DataFrame = {
    // the >= 2-token gate tests the CHEAP source column, not size(w):
    // a pushed-down size(w) predicate inlines w = split(...) below the
    // projection and evaluates the split twice per row (the
    // dedup_prefix_jaccard defect shape, r18 opt round). Equivalence:
    // size(split(trim(text), WS+)) >= 2  ⟺  trim(text) contains ≥ 1
    // whitespace char (Spark split keeps leading/trailing empty
    // tokens, so ANY separator run yields a second element); null text
    // fails both forms.
    val base = graft.util.SparkUtil.widen(documents)
      .filter(trim(col("text")).rlike("[ \\t\\n\\x0B\\f\\r]"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
    val bi = base.select(col("doc_id"),
        explode(zip_with(slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = c12.agg(count_distinct(col("w2")).as("v"))
    val ln2 = log(lit(2.0))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        avg(log(col("c1") + col("v")) - log(col("c12") + 1)).as("avg_ln"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("avg_ln") / ln2, 4).as("bits_per_bigram"))
      .orderBy("doc_id")
  }

  /** Vocabulary coverage / OOV rate against the corpus top-`k` tokens —
    * the tokenizer-fit check a pipeline runs before training (a corpus
    * whose OOV rate against the intended vocabulary is high will
    * fragment into subwords or UNKs). Vocabulary = top-k by
    * (count DESC, token ASC) — the tie-break makes the k-th seat
    * deterministic and engine-stable. Output: (doc_id, n_tokens,
    * n_oov, oov_rate), ordered by doc_id.
    *
    * Scale shape (100 TB): one token-keyed groupBy (map-side combine),
    * then TakeOrderedAndProject for the top-k — a k-row heap per
    * partition + k-row merge, never a full sort; the k-row vocabulary
    * broadcasts (bounded by the model constant k) and the per-doc
    * aggregate is one doc_id shuffle. */
  def vocabCoverage(documents: DataFrame, k: Int = 100): DataFrame = {
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .select(col("token"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_rate"))
      .orderBy("doc_id")
  }

  /** Hashing-trick feature bucket of a token: first 8 hex chars of its
    * md5 as an unsigned 32-bit value, mod `nBuckets`. Engine-stable
    * (DuckDB mirrors it as `('0x' || substr(md5(t),1,8))::BIGINT % B`),
    * so hashed-feature models score identically under the oracle. */
  def hashBucket(token: Column, nBuckets: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % nBuckets

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the log-likelihood ratio of a hashed-unigram model fit
    * on a TARGET slice (e.g. one language or domain) vs one fit on the
    * raw corpus — documents whose word mix looks like the target get
    * positive `log_ratio`; selection keeps the top slice or samples
    * ∝ exp(weight). Both models share one `nBuckets`-cell hashed
    * feature space with add-one smoothing, so per token the weight is
    * ln((cnt_tgt+1)/(N_tgt+B)) − ln((cnt_raw+1)/(N_raw+B)); the
    * per-doc score is the mean over token occurrences. Output:
    * (doc_id, n_tokens, log_ratio), ordered by doc_id.
    *
    * Scale shape (100 TB): the explode is narrow; BOTH bucket-count
    * tables come from ONE map-side-combinable groupBy on `bucket`
    * (target counts are a conditional sum in the same aggregate, so the
    * target slice is never re-scanned); the result is ≤ `nBuckets` rows
    * — broadcast is bounded by a model constant, not the corpus. The
    * (N_raw, N_tgt) totals reduce that same tiny table and join as ONE
    * broadcast row ABOVE the per-doc aggregate (the unigramLogProb
    * trick: mean(w) + scalar, so token-level rows never see the
    * scalar). One doc_id shuffle with a combinable avg partial. */
  def importanceWeights(documents: DataFrame, targetPred: Column,
                        nBuckets: Int = 256): DataFrame = {
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), targetPred.cast("int").as("is_target"),
        explode(tokens(col("text"))).as("token"))
      .withColumn("bucket", hashBucket(col("token"), nBuckets))
    val counts = toks.groupBy("bucket").agg(
      count(lit(1)).as("cnt_raw"), sum("is_target").cast("long").as("cnt_tgt"))
    val totals = counts.agg(sum("cnt_raw").as("n_raw"), sum("cnt_tgt").as("n_tgt"))
    // per-bucket weight modulo the scalar: ln(cnt_tgt+1) − ln(cnt_raw+1);
    // the smoothing denominators are constant across tokens and applied
    // once per doc after averaging (oracle mirrors this exact order)
    val weights = counts.select(col("bucket"),
      (log(col("cnt_tgt") + 1) - log(col("cnt_raw") + 1)).as("w"))
    toks.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"), avg("w").as("avg_w"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        // + 0.0 collapses IEEE −0.0 to 0.0: a ratio this close to zero
        // rounds to −0.0 in DuckDB but 0.0 in Spark, and the driver's
        // value hash is bit-sensitive (both sides apply the same +0)
        (round(col("avg_w") + log(col("n_raw") + nBuckets) -
          log(col("n_tgt") + nBuckets), 4) + lit(0.0)).as("log_ratio"))
      .orderBy("doc_id")
  }

  /** fastText-shape linear quality classifier over hashing-trick
    * features: token → md5 bucket → fixed weight, document logit =
    * mean token weight, probability = sigmoid(logit). The weight table
    * is FORMULAIC (w(b) = ((b·2654435761) mod 1001)/500 − 1 ∈ [−1, 1],
    * a Knuth-multiplicative stand-in for trained weights) so the
    * operator exercises exactly the production plumbing — featurize,
    * look up, reduce, squash — with a model both engines can state in
    * closed form; swapping in trained weights is a broadcast join on
    * `bucket` with the same plan. Output: (doc_id, n_tokens, p_keep,
    * is_kept), ordered by doc_id.
    *
    * Scale shape (100 TB): entirely narrow — the token array never
    * explodes (higher-order `transform` + `aggregate` fold inside one
    * projection), no join, no shuffle except the final presentation
    * sort. This is the scan-speed ceiling for a classifier pass. */
  def hashClassifierScore(documents: DataFrame, nBuckets: Int = 256): DataFrame = {
    val toks = tokens(col("text"))
    val weightOf = (t: Column) =>
      (hashBucket(t, nBuckets) * lit(2654435761L) % 1001).cast("double") / 500.0 - 1.0
    val wsum = aggregate(toks, lit(0.0), (acc, t) => acc + weightOf(t))
    graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (wsum / size(toks)).as("logit"))
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("p_keep"),
        (col("logit") >= 0).as("is_kept"))
      .orderBy("doc_id")
  }

  /** TRAIN the fastText-shape quality classifier [[hashClassifierScore]]
    * applies: full-batch logistic regression over hashing-trick
    * features — the CCNet/LLaMA-pipeline "quality classifier" step
    * (seed-labeled docs → linear scorer → corpus-wide keep decision),
    * expressed for a cluster. Model: logit(doc) = bias +
    * Σ_{distinct hashed tokens b} w(b) — BINARY presence features (the
    * set-of-words bag): a marker token's gradient is then O(class
    * share) per epoch instead of O(1/doc-length) — the tf/dl
    * formulation measured ~majority-class accuracy on the forged
    * fixture because every update was diluted by document length.
    *
    * Per epoch: broadcast (w, bias), ONE `treeAggregate` over the
    * cached sparse feature set accumulates the exact full-batch
    * gradient Σ (σ(logit)−y)·x as a single dense `nBuckets`-double
    * partial per partition, merged depth-2 (the [[graft.analytics
    * .Similarity]] pcaTrain shape: driver receives O(nBuckets), never
    * O(corpus)). Features materialize ONCE (persisted) — epochs re-run
    * only the gradient pass. Docs with null text OR a null seed label
    * are excluded (a null predicate value is an undefined label, not a
    * class — unguarded it would NPE deep in an executor).
    *
    * Float-sum order inside the gradient follows partitioning, so
    * weights are deterministic only per layout — the oracled surface
    * ([[classifierTrainReport]]) asserts partition-stable BOOLEANS
    * (accuracy/separation thresholds), the sketch/recall tolerance
    * discipline. Returns (weights, bias). */
  def trainHashedLogReg(documents: DataFrame, positive: Column,
                        nBuckets: Int = 1024, epochs: Int = 30,
                        lr: Double = 5.0): (Array[Double], Double) = {
    val m = trainHashedLogRegHeldOut(documents, positive, nBuckets, epochs,
      lr, l2 = 0.0, holdoutMod = 0)
    (m.weights, m.bias)
  }

  /** Trained model + the selection evidence [[trainHashedLogRegHeldOut]]
    * reports: `bestEpoch` is the epoch whose weights were kept (the
    * FINAL epoch when no holdout drives selection), accuracies are the
    * kept weights' exact correct/total fractions over the train and
    * holdout subsets (`holdoutAcc` = `trainAcc` when the holdout is
    * empty — the selection metric's fallback). */
  final case class TrainedLogReg(weights: Array[Double], bias: Double,
                                 bestEpoch: Int, trainAcc: Double,
                                 holdoutAcc: Double, nTrain: Long,
                                 nHoldout: Long)

  /** The generalized training core behind [[trainHashedLogReg]] —
    * ridge (L2) regularization plus a DETERMINISTIC hash-split holdout
    * with best-epoch selection, the two guards the fixed-lr fixed-
    * epoch trainer lacks on real (noisy) labels:
    *
    *  - `l2`: the update becomes w ← w − lr·(∇/n + l2·w) (bias
    *    unregularized, the standard convention) — on noisy labels the
    *    penalty shrinks the memorizing weights (spec-measured);
    *  - `holdoutMod`: docs with md5(doc_id)[:8] mod `holdoutMod` == 0
    *    are HELD OUT of the gradient (the [[graft.analytics.Dedup]]
    *    md5-coin discipline: deterministic, partition-independent,
    *    and mirrorable in SQL for the oracle's exact n_holdout);
    *    every epoch's weights are scored on the holdout in the SAME
    *    treeAggregate pass that computes the gradient (one pass per
    *    epoch, epochs+1 passes total — the final weights are scored
    *    too), and the kept model is the EARLIEST epoch maximizing
    *    holdout accuracy — early stopping by selection, so a run past
    *    the overfit point returns the pre-overfit weights.
    *    `holdoutMod = 0` disables both (every doc trains, final
    *    weights returned — [[trainHashedLogReg]]'s exact behavior).
    *
    * CONTRACT: `nTrain`/`nHoldout` count docs that survive
    * tokenization (≥1 exploded token). With the whitespace [[tokens]]
    * tokenizer this is EVERY non-null-text doc — `split("", pat)`
    * yields `[""]`, one (empty-string) token, so empty/whitespace-only
    * text still produces a feature row and the oracle's
    * pre-tokenization `WHERE text IS NOT NULL` count matches exactly
    * (spec-pinned). A future tokenizer that can emit ZERO tokens would
    * silently shrink these counts below the oracle's — the trainer
    * now REQUIRES the invariant at entry (an O(1) one-row probe of
    * the tokenizer, no corpus scan), so that change fails loudly;
    * re-mirror the oracle on `len(toks) > 0` if it ever fires.
    *
    * Accuracies are exact integer correct/total fractions — but over
    * float-sum-order-dependent weights, so the oracled surface stays
    * threshold BOOLEANS ([[classifierTrainReport]]). Scale shape
    * unchanged: features persist once; each epoch is one depth-2
    * treeAggregate whose partial is a dense nBuckets-double array. */
  def trainHashedLogRegHeldOut(documents: DataFrame, positive: Column,
                               nBuckets: Int = 1024, epochs: Int = 30,
                               lr: Double = 5.0, l2: Double = 0.0,
                               holdoutMod: Int = 5): TrainedLogReg = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    require(epochs >= 1, s"epochs must be >= 1: $epochs")
    require(lr > 0, s"lr must be > 0: $lr")
    require(l2 >= 0, s"l2 must be >= 0: $l2")
    require(holdoutMod >= 0, s"holdoutMod must be >= 0: $holdoutMod")
    val spark = documents.sparkSession
    // the n_holdout CONTRACT guard (see scaladoc): the tokenizer must
    // never emit ZERO tokens, or nTrain/nHoldout silently diverge from
    // the oracle's pre-tokenization count. One local row, no Spark job
    // against the corpus.
    locally {
      import spark.implicits._
      val probe = Seq("").toDF("text")
        .select(size(tokens(col("text"))).as("n")).head.getInt(0)
      require(probe >= 1,
        "tokenizer emits zero tokens for empty text — nTrain/nHoldout " +
          "would diverge from the oracle's text IS NOT NULL count " +
          "(re-mirror the oracle on len(toks) > 0; see scaladoc CONTRACT)")
    }
    val toks = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull && positive.isNotNull)
      .select(col("doc_id"), positive.cast("double").as("__y"),
        explode(tokens(col("text"))).as("token"))
      .withColumn("__b", hashBucket(col("token"), nBuckets).cast("int"))
    val perDoc = toks.groupBy("doc_id", "__y")
      .agg(collect_set(col("__b")).as("__f"))
    val hm = holdoutMod // avoid closing over the method's this
    val data = perDoc.select(col("doc_id"), col("__y"), col("__f")).rdd.map { r =>
      val hold = hm > 0 && {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(r.getLong(0).toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % hm == 0
      }
      (r.getDouble(1), r.getSeq[Int](2).toArray, hold)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nHold = data.filter(_._3).count()
      val nTrain = data.count() - nHold
      require(nTrain > 0,
        "no trainable documents (all text null or empty, or every doc held out)")
      val w = new Array[Double](nBuckets)
      var bias = 0.0
      var best: TrainedLogReg = null
      var e = 0
      while (e <= epochs) {
        val bw = spark.sparkContext.broadcast((w.clone(), bias))
        // ONE pass: gradient over the train subset + exact correct
        // counts for BOTH subsets at the current (pre-update) weights
        val (gw, gb, cTrain, cHold) = data.treeAggregate(
          (new Array[Double](nBuckets), 0.0, 0L, 0L))(
          seqOp = { case ((gacc, gbAcc, ct, ch), (y, x, hold)) =>
            val (wc, bc) = bw.value
            var z = bc
            var i = 0
            while (i < x.length) { z += wc(x(i)); i += 1 }
            val correct = if ((z >= 0) == (y == 1.0)) 1L else 0L
            if (hold) (gacc, gbAcc, ct, ch + correct)
            else {
              val d = 1.0 / (1.0 + math.exp(-z)) - y
              i = 0
              while (i < x.length) { gacc(x(i)) += d; i += 1 }
              (gacc, gbAcc + d, ct + correct, ch)
            }
          },
          combOp = { case ((a, ab, act, ach), (b, bb, bct, bch)) =>
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            (a, ab + bb, act + bct, ach + bch)
          }, depth = 2)
        bw.destroy()
        val trainAcc = cTrain.toDouble / nTrain
        val holdAcc = if (nHold > 0) cHold.toDouble / nHold else trainAcc
        val keepFinal = hm == 0 && e == epochs
        val keepBest = hm > 0 && (best == null || holdAcc > best.holdoutAcc)
        if (keepFinal || keepBest)
          best = TrainedLogReg(w.clone(), bias, e, trainAcc, holdAcc,
            nTrain, nHold)
        if (e < epochs) {
          var j = 0
          while (j < nBuckets) {
            w(j) -= lr * (gw(j) / nTrain + l2 * w(j)); j += 1
          }
          bias -= lr * gb / nTrain
        }
        e += 1
      }
      best
    } finally { data.unpersist(); () }
  }

  /** Apply TRAINED weights with [[hashClassifierScore]]'s plan shape
    * (featurize → look up → reduce → squash, one narrow projection) —
    * the promised swap-in: the weight table rides as a literal array
    * (codegen'd `element_at`, no join, no shuffle), logit = bias +
    * Σ_{distinct hashed tokens} w(b) (the training model's binary
    * presence features — `array_distinct` before the fold), probability
    * = sigmoid. Output: (doc_id, n_tokens, p_keep 4 dp, is_kept),
    * ordered by doc_id. */
  def hashedLogRegScore(documents: DataFrame, weights: Array[Double],
                        bias: Double): DataFrame = {
    val nBuckets = weights.length
    val wLit = typedLit(weights.toSeq)
    // bucket each token ONCE in its own projected column (SPARK-35410:
    // an expression inside a HOF lambda re-evaluates per consumer),
    // then dedup buckets and fold the literal-array lookups
    val wsum = aggregate(array_distinct(col("__b")), lit(0.0),
      (acc, bkt) => acc + element_at(wLit, bkt + 1))
    graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .withColumn("__t", tokens(col("text")))
      .withColumn("__b", transform(col("__t"),
        t => hashBucket(t, nBuckets).cast("int")))
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_tokens"),
        (wsum + lit(bias)).as("logit"))
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("p_keep"),
        (col("logit") >= 0).as("is_kept"))
      .orderBy("doc_id")
  }

  /** The oracled TRAIN surface: fit [[trainHashedLogRegHeldOut]] on
    * seed-labeled docs (ridge `l2`, deterministic `holdoutMod` split
    * with best-epoch selection), score the same corpus, report exact
    * counts plus partition-stable quality booleans — whole-corpus
    * accuracy, mean-probability separation, and the kept model's
    * HOLDOUT accuracy over thresholds (trained weights themselves are
    * float-sum-order-dependent; the booleans are the engine-stable
    * contract, the recall-panel discipline). `n_holdout` is exact and
    * oracle-mirrorable (the md5 split is the same arithmetic in SQL).
    * A corpus with an EMPTY class reports every boolean FALSE —
    * one-class "accuracy" is the majority baseline and "separation"
    * has nothing to separate (the abProportionTest degenerate-label
    * discipline). One row: (n_pos, n_neg, n_holdout, acc_ok, sep_ok,
    * holdout_acc_ok). */
  def classifierTrainReport(documents: DataFrame, positive: Column,
                            nBuckets: Int = 1024, epochs: Int = 30,
                            lr: Double = 5.0, accMin: Double = 0.95,
                            sepMin: Double = 0.5, l2: Double = 0.0,
                            holdoutMod: Int = 5): DataFrame = {
    val m = trainHashedLogRegHeldOut(documents, positive, nBuckets, epochs,
      lr, l2, holdoutMod)
    val labeled = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull && positive.isNotNull)
      .select(col("doc_id"), positive.as("__pos"))
    val bothClasses = col("n_pos") > 0 && col("n_neg") > 0
    hashedLogRegScore(documents, m.weights, m.bias)
      .join(labeled, Seq("doc_id"))
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("n_neg"),
        avg(when(col("is_kept") === col("__pos"), 1.0).otherwise(0.0)).as("__acc"),
        avg(when(col("__pos"), col("p_keep"))).as("__mp"),
        avg(when(!col("__pos"), col("p_keep"))).as("__mn"))
      .select(col("n_pos"), col("n_neg"),
        lit(m.nHoldout).as("n_holdout"),
        (bothClasses && col("__acc") >= accMin).as("acc_ok"),
        (bothClasses && col("__mp") - col("__mn") >= sepMin).as("sep_ok"),
        (bothClasses && lit(m.holdoutAcc) >= accMin).as("holdout_acc_ok"))
  }

  /** Per-source characteristic terms by TF-IDF — the "what is this
    * slice about" profile a corpus build runs per domain/source before
    * deciding mixture weights (and the quickest way to spot a crawl
    * slice gone wrong: its top terms become navigation chrome). tf =
    * term occurrences within the source; df = number of sources whose
    * text contains the term; idf = ln((N+1)/(df+1)) with N = source
    * count (smoothed so corpus-universal terms score exactly 0 rather
    * than dividing by anything). Ranking key is the ROUNDED score
    * (4 dp, ties by token asc) so both engines rank identical values —
    * an unrounded double rank could flip near-ties by a libm ulp.
    * Output: (source, token, tf, df, tfidf, rk ≤ k), ordered by
    * (source, rk).
    *
    * Scale shape (100 TB): the explode is narrow; tf is one map-side-
    * combinable groupBy on (source, token); df and the N scalar reduce
    * THAT vocab-sized table (df joins back on `token` as a plain
    * shuffle join — vocabulary is unbounded, never broadcast; N is one
    * broadcast row). The top-k rank is [[graft.metrics.Metrics
    * .rankByKey]] — range-partition + per-(partition, source) offsets,
    * P-way parallel even when one source's vocabulary dominates (a
    * `Window.partitionBy(source)` would funnel each source's whole
    * vocab through one reducer — the interleave/lengthFilter lesson). */
  def tfidfTopTerms(documents: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
    val tf = toks.groupBy("source", "token").agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nSrc = tf.agg(count_distinct(col("source")).as("n_sources"))
    val scored = tf.join(dfTab, Seq("token"))
      .crossJoin(broadcast(nSrc))
      .select(col("source"), col("token"),
        col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
        round(col("tf") * log((col("n_sources").cast("double") + 1) / (col("df") + 1)), 4)
          .as("tfidf"))
      .withColumn("_neg", -col("tfidf"))
    graft.metrics.Metrics.rankByKey(scored, "source", Seq("_neg", "token"))
      .filter(col("_rank") <= k)
      .select(col("source"), col("token"), col("tf"), col("df"),
        col("tfidf"), col("_rank").cast("long").as("rk"))
      .orderBy("source", "rk")
  }

  /** Corpus-wide adjacent-symbol pair counts — the first iteration of
    * BPE tokenizer training (count every within-word adjacent char
    * pair; the argmax pair is the first merge). Real BPE iterates
    * merge-recount — THAT loop is a driver-side training harness over
    * shrinking vocab tables; this operator is the corpus-scan step it
    * repeats, which is the only part that touches all the data. Ties
    * break by pair text so the top-k is a total order. Output: (pair,
    * n), count-descending, top `topK`.
    *
    * Scale shape: two narrow explodes (word, then pair — never
    * cross-word, never cross-space), one map-side-combinable pair
    * count, and a TakeOrderedAndProject heap for the top-k (no full
    * sort of the pair vocabulary). */
  def bpePairCounts(documents: DataFrame, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val pairs = graft.util.SparkUtil.widen(documents)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).cast(LongType).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** BPE merge APPLICATION — encode every document with a learned
    * merge list (the missing half of the tokenizer family:
    * [[bpePairCounts]] learns pair statistics, [[bpeApply]] spends
    * them; the per-doc pass a training-data pipeline actually runs).
    * Each word is encoded independently by the codegen'd
    * [[graft.functions.BpeEncodeExpr]]: start from code points, each
    * round splice the adjacent pair with the lowest merge rank
    * (leftmost on ties), up to `maxRounds` rounds — one merge per
    * round, so with maxRounds ≥ longest-word − 1 this is the Sennrich
    * fixpoint, and ANY maxRounds is exactly mirrored by the oracle's
    * bounded CTE unroll. Reconstruction invariant: pieces concatenate
    * back to the word (spec-pinned).
    *
    * Output: (doc_id, bpe_text = pieces space-joined across words in
    * order, n_pieces, n_words), null-text docs excluded, ordered by
    * doc_id.
    *
    * Scale shape: ONE narrow codegen'd projection — the merge table
    * rides in codegen references (no join, no broadcast needed at any
    * corpus size; the table is tokenizer-sized, KBs); the piece array
    * is materialized once in a bound column for its two consumers
    * (SPARK-35410 discipline). No shuffle before the output sort. */
  def bpeApply(documents: DataFrame, merges: Seq[(String, String)],
               maxRounds: Int = 64): DataFrame = {
    graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .withColumn("__w", tokens(col("text")))
      .withColumn("__pieces", flatten(transform(col("__w"),
        w => graft.functions.BpeEncodeExpr(w, merges, maxRounds))))
      .select(col("doc_id"),
        concat_ws(" ", col("__pieces")).as("bpe_text"),
        size(col("__pieces")).cast(LongType).as("n_pieces"),
        size(col("__w")).cast(LongType).as("n_words"))
      .orderBy("doc_id")
  }

  /** One trained BPE merge: rank order, the two merged symbols, and
    * the weighted pair count that won the round. */
  final case class BpeMerge(rank: Int, lhs: String, rhs: String, n: Long)

  /** Iterative BPE MERGE TRAINING — closes the tokenizer story
    * end-to-end ([[bpePairCounts]] is the single-merge statistic,
    * [[bpeApply]] spends a FIXED list; this produces the list): the
    * Sennrich loop over a distributed word-frequency vocabulary.
    *
    * Round r: adjacent symbol pairs of every vocab word (lambda-free
    * shifted-slice zip — overlapping positions count, the Sennrich
    * convention), weighted by word frequency; the argmax (count DESC,
    * then (lhs, rhs) lexicographic — a deterministic total order both
    * engines agree on) becomes merge r and is folded into every
    * symbol array GREEDILY LEFT-TO-RIGHT (an `aggregate` fold whose
    * merged token never re-merges in the same round — the resume-
    * after-match convention the oracle's string `replace` shares
    * exactly). Vocab is checkpointed per round (the PageRank round
    * discipline: nMerges bounded jobs, lineage truncated) — only the
    * one argmax ROW ever reaches the driver per round, plus the merge
    * list itself (tokenizer-sized by definition).
    *
    * Words come from [[bpeishTokens]] (lowercase alnum runs) so the
    * symbol alphabet is delimiter-safe for the oracle's wrapped-string
    * mirror. Training stops early when no pair remains (every word a
    * single symbol). Scale shape: the vocab table is DISTINCT words —
    * orders of magnitude below corpus rows — and each round is one
    * narrow fold + one tiny aggregate; the corpus is scanned ONCE. */
  def bpeTrainMerges(documents: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    require(nMerges >= 1 && nMerges <= 64, s"nMerges out of range: $nMerges")
    var vocab = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .select(explode(bpeishTokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("sym"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[BpeMerge]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = vocab
        .filter(size(col("sym")) >= 2)
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1))).as("p"))
        .select(col("freq"), col("p.0").as("a"), col("p.1").as("b"))
        .groupBy("a", "b").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += BpeMerge(r, a, b, top(0).getLong(2))
        val folded = aggregate(col("sym"),
          array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(s))))
        vocab = vocab.select(col("freq"), folded.as("sym"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }

  /** One merge of a BATCHED training round: global rank, the round it
    * was selected in, its within-round pick order, the merged symbols
    * and the weighted count (measured against the ROUND-START vocab). */
  final case class BpeBatchMerge(rank: Int, round: Int, lhs: String,
                                 rhs: String, n: Long)

  /** BATCHED BPE merge training — the scale path past
    * [[bpeTrainMerges]]'s one-merge-per-round loop (a 32k-merge
    * vocabulary would mean 32k Spark rounds; this cuts rounds by
    * `batchK`, the standard multi-merge trick): each round computes
    * pair counts ONCE over the round-start vocab, greedily selects up
    * to `batchK` pairs in (count DESC, lhs, rhs) order subject to a
    * NON-INTERACTION constraint, and folds all of them into every
    * symbol array in ONE pass.
    *
    * The constraint that makes a batch round EXACTLY k independent
    * Sennrich merges against the round-start vocab: a pair (a, b) is
    * admissible iff none of {a, b, a+b} appears in the forbidden set
    * F = ∪ over already-chosen pairs of {lhs, rhs, lhs+rhs}. Symbol
    * disjointness means no chosen pair can create or destroy another's
    * occurrences (an occurrence is two adjacent symbols neither of
    * which any other chosen pair touches), and keeping PRODUCED tokens
    * in F means a newly merged token can never complete another chosen
    * pair mid-pass — so the single simultaneous fold, sequential
    * application in any order, and the oracle's chained `replace`
    * over the wrapped encoding all agree, and every reported count is
    * exact for the round-start vocab.
    *
    * Selection runs on the driver over a bounded TakeOrdered fetch
    * (4·batchK rows; refetched with the forbidden filter pushed into
    * the plan in the rare case a fetch window is exhausted before k
    * admissible pairs are found — the first row of a filtered refetch
    * is always admissible, so the loop provably progresses). Only
    * tokenizer-sized data ever reaches the driver.
    *
    * Scale shape: rounds = ceil(nMerges / batchK) Spark jobs instead
    * of nMerges; per round one map-side-combinable pair count + one
    * narrow fold over the DISTINCT-word vocab, localCheckpoint per
    * round (lineage truncated). See SCALE.md "BPE training at real
    * vocabulary sizes". */
  def bpeTrainMergesBatched(documents: DataFrame, nRounds: Int,
                            batchK: Int): Seq[BpeBatchMerge] = {
    require(nRounds >= 1 && nRounds <= 4096, s"nRounds out of range: $nRounds")
    require(batchK >= 1 && batchK <= 1024, s"batchK out of range: $batchK")
    var vocab = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .select(explode(bpeishTokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("sym"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[BpeBatchMerge]
    var rank = 0
    var r = 0
    var exhausted = false
    while (r < nRounds && !exhausted) {
      val pairTable = vocab
        .filter(size(col("sym")) >= 2)
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1))).as("p"))
        .select(col("freq"), col("p.0").as("a"), col("p.1").as("b"))
        .groupBy("a", "b").agg(sum(col("freq")).as("n"))
        // persisted so a refetch (exhausted window) pays only the
        // filter + TakeOrdered, not a second explode+groupBy pass —
        // the 'ONE pair-count pass per round' claim holds on BOTH
        // selection paths; unpersisted at round end
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val chosen = Vector.newBuilder[BpeBatchMerge]
      var nChosen = 0
      var forbidden = Set.empty[String]
      var roundDone = false
      val fetchLimit = math.max(batchK * 4, 16)
      try while (nChosen < batchK && !roundDone) {
        val cond =
          if (forbidden.isEmpty) lit(true)
          else {
            val f = forbidden.toSeq
            !col("a").isin(f: _*) && !col("b").isin(f: _*) &&
              !concat(col("a"), col("b")).isin(f: _*)
          }
        val rows = pairTable.filter(cond)
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(fetchLimit).collect()
        val before = nChosen
        var i = 0
        while (i < rows.length && nChosen < batchK) {
          val a = rows(i).getString(0)
          val b = rows(i).getString(1)
          if (!forbidden(a) && !forbidden(b) && !forbidden(a + b)) {
            chosen += BpeBatchMerge(rank, r, a, b, rows(i).getLong(2))
            rank += 1; nChosen += 1
            forbidden = forbidden + a + b + (a + b)
          }
          i += 1
        }
        // a SHORT fetch means the filtered table was scanned fully:
        // no admissible pair remains beyond what we just admitted
        if (rows.length < fetchLimit) roundDone = true
        else if (nChosen == before) roundDone = true // defensive; unreachable
      } finally pairTable.unpersist(false)
      val picks = chosen.result()
      if (picks.isEmpty) exhausted = true
      else {
        merges ++= picks
        // one simultaneous fold: (last, next) looked up in the chosen
        // pair map — non-interaction makes this exactly the sequential
        // per-pair fold of each merge against the round-start vocab.
        // Keys join symbols with NUL, which bpeishTokens'
        // [a-z0-9] alphabet can never contain.
        val pm = map(picks.flatMap(p =>
          Seq(lit(p.lhs + "\u0000" + p.rhs), lit(p.lhs + p.rhs))): _*)
        val folded = aggregate(col("sym"),
          array().cast("array<string>"),
          (acc, s) => {
            val hit = try_element_at(pm,
              concat(element_at(acc, -1), lit("\u0000"), s))
            when(size(acc) > 0 && hit.isNotNull,
              concat(slice(acc, lit(1), size(acc) - 1), array(hit)))
              .otherwise(concat(acc, array(s)))
          })
        vocab = vocab.select(col("freq"), folded.as("sym"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }

  /** The oracled BATCHED-train surface: [[bpeTrainMergesBatched]] as
    * a one-row-per-merge table (rank, round, pick, lhs, rhs, n) —
    * mirrorable in SQL by unrolling each round as one pair-count CTE
    * plus `batchK` greedy pick CTEs (each filtered NOT IN the earlier
    * picks' {lhs, rhs, lhs||rhs}) and a chained-`replace` vocab CTE. */
  def bpeTrainBatchedReport(documents: DataFrame, nRounds: Int,
                            batchK: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeTrainMergesBatched(documents, nRounds, batchK)
      .map(m => (m.rank.toLong, m.round.toLong, m.lhs, m.rhs, m.n))
      .toDF("rank", "round", "lhs", "rhs", "n")
      .orderBy("rank")
  }

  /** The oracled TRAIN surface: [[bpeTrainMerges]] as a one-row-per-
    * merge table (rank, lhs, rhs, n), ordered by rank — fully
    * mirrorable in SQL by unrolling the rounds as CTEs over a wrapped
    * symbol-string encoding whose `replace` is exactly the fold. */
  def bpeTrainReport(documents: DataFrame, nMerges: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeTrainMerges(documents, nMerges)
      .map(m => (m.rank.toLong, m.lhs, m.rhs, m.n))
      .toDF("rank", "lhs", "rhs", "n")
      .orderBy("rank")
  }

  /** Per-document character-bigram entropy — the gibberish / wrong-
    * charset / binary-blob detector ([[qualityScores]]'s rules catch
    * structural junk; entropy catches STATISTICAL junk: base64 blobs
    * and random strings score near the uniform bound, single-char
    * spam near 0, natural language in between). Computed as
    * `H = (ln n − Σ c·ln c / n) / ln 2` over the bigram counts — the
    * scalar-applied-once form both engines mirror exactly
    * ([[unigramLogProb]]'s evaluation shape). Docs with < 2 chars have
    * no bigrams and score 0. Output: (doc_id, n_bigrams, entropy_bits
    * 4 dp), ordered by doc_id.
    *
    * Scale shape: one narrow bigram explode + a map-side-combinable
    * (doc_id, gram) count + one doc_id aggregate; the reattach join
    * moves only (doc_id, 2 numbers). */
  def charEntropy(documents: DataFrame): DataFrame = {
    val n = length(col("text"))
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), n - 1), i => col("text").substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val counts = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), explode(bigrams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy("doc_id")
      .agg(sum("c").as("nb"), sum(col("c") * log(col("c"))).as("s"))
      .select(col("doc_id"), col("nb").cast(LongType).as("n_bigrams"),
        (round((log(col("nb")) - col("s") / col("nb")) / log(lit(2.0)), 4)
          + lit(0.0)).as("entropy_bits"))
    documents.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("entropy_bits"), lit(0.0)).as("entropy_bits"))
      .orderBy("doc_id")
  }

  /** Per-source Zipf fit — OLS slope of ln(freq) vs ln(rank) over each
    * source's token-frequency table (rank 1 = most frequent; ties
    * broken by token so the rank is a total order both engines agree
    * on). Natural language fits slope ≈ −1 (Zipf's law); a flat slope
    * flags templated/generated text, a cliff flags tokenizer damage —
    * the corpus-health panel next to [[sourceDrift]]. Output: (source,
    * vocab, zipf_slope) — slope = covar_pop(ln r, ln f)/var_pop(ln r),
    * 4 dp (FP summation order differs cross-engine; the round is the
    * standard float-aggregate discipline) — sources with a single
    * distinct token carry no slope and are dropped; ordered by source.
    *
    * Scale shape (100 TB): one map-side-combinable (source, token)
    * groupBy; ranks via the skew-safe
    * [[graft.metrics.Metrics.rankByKey]] (a source's vocabulary is
    * unbounded — never a per-source window funnel); the slope is one
    * combinable aggregate over the vocab-sized rank table. */
  def zipfSlope(documents: DataFrame): DataFrame = {
    val tf = graft.util.SparkUtil.widen(documents)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("_neg", -col("cnt"))
    graft.metrics.Metrics.rankByKey(tf, "source", Seq("_neg", "token"))
      .select(col("source"),
        log(col("_rank").cast("double")).as("lnr"),
        log(col("cnt").cast("double")).as("lnf"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("vocab"),
        covar_pop(col("lnr"), col("lnf")).as("cv"),
        var_pop(col("lnr")).as("vr"))
      .filter(col("vocab") >= 2)
      .select(col("source"), col("vocab"),
        (round(col("cv") / col("vr"), 4) + lit(0.0)).as("zipf_slope"))
      .orderBy("source")
  }

  /** Per-source distribution drift — KL divergence of each source's
    * token distribution from the whole-corpus distribution, the mix
    * monitor a pipeline runs per ingest round ("did this crawl slice
    * change what the model will read?"). MLE distributions restricted
    * to each source's OBSERVED tokens (every observed token has a
    * corpus count, so no smoothing is needed and the per-source sum has
    * exactly vocab_s terms): KL(p_s ‖ p_c) = Σ_t (c_st/n_s) ·
    * ln((c_st/n_s)/(c_t/n)), computed as sum(c_st·(ln c_st − ln c_t))
    * / n_s + ln n − ln n_s so the scalar totals apply ONCE above the
    * per-source aggregate (the unigramLogProb trick) and the oracle
    * mirrors the exact arithmetic order. Output: (source, n_tokens,
    * vocab, kl_bits) — KL in bits, 4 dp — ordered by source.
    *
    * Scale shape (100 TB): one map-side-combinable groupBy on
    * (source, token); corpus counts reduce THAT vocab-sized table and
    * join back on `token` (plain shuffle join — vocabulary unbounded);
    * per-source totals reduce it again (|sources| rows, joins on
    * `source`); (n) is one broadcast row. Nothing corpus-sized crosses
    * an exchange twice. */
  def sourceDrift(documents: DataFrame): DataFrame = {
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
    val st = toks.groupBy("source", "token").agg(count(lit(1)).as("c_st"))
    val ct = st.groupBy("token").agg(sum("c_st").as("c_t"))
    val ns = st.groupBy("source").agg(sum("c_st").as("n_s"),
      count(lit(1)).as("vocab"))
    val n = ct.agg(sum("c_t").as("n"))
    val ln2 = log(lit(2.0))
    st.join(ct, Seq("token"))
      .groupBy("source")
      .agg(sum(col("c_st") * (log(col("c_st")) - log(col("c_t")))).as("s"))
      .join(ns, Seq("source"))
      .crossJoin(broadcast(n))
      .select(col("source"), col("n_s").cast("long").as("n_tokens"),
        col("vocab").cast("long").as("vocab"),
        // + 0.0 collapses IEEE −0.0 (a zero-drift source can round to
        // the negative zero in either engine — the importanceWeights
        // hash-discipline lesson)
        (round((col("s") / col("n_s") + log(col("n")) - log(col("n_s"))) / ln2, 4)
          + lit(0.0)).as("kl_bits"))
      .orderBy("source")
  }

  /** Jensen–Shannon divergence of each source's token distribution vs
    * the corpus — [[sourceDrift]]'s KL made SYMMETRIC and BOUNDED
    * ([0, 1] bits): KL explodes toward ∞ when a source merely lacks
    * corpus-common tokens, JS saturates — the cross-source comparison
    * number that can actually be thresholded.
    *
    * Computed SPARSELY: both half-KLs sum only over tokens PRESENT in
    * the source, and the q-side mass of ABSENT tokens enters in closed
    * form (p = 0 ⇒ m = q/2 ⇒ Σ_absent q·ln(q/m) = ln2·(1 − Σ_present
    * q)) — no dense source×vocab grid at any vocabulary size; the
    * grid-free trick is what makes exact per-source JS viable when the
    * vocab is web-scale.
    *
    * Output: (source, n_tokens, js_bits 4 dp, −0.0 collapsed),
    * ordered. Scale shape: the sourceDrift plan — one (source, token)
    * combinable groupBy, vocab-keyed join, panel arithmetic. */
  def sourceJsDivergence(documents: DataFrame): DataFrame = {
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
    val st = toks.groupBy("source", "token").agg(count(lit(1)).as("c_st"))
      .localCheckpoint(true) // feeds vocab totals, source totals, sums
    val ct = st.groupBy("token").agg(sum("c_st").as("c_t"))
    val ns = st.groupBy("source").agg(sum("c_st").as("n_s"))
    val n = ct.agg(sum("c_t").as("n"))
    val ln2 = log(lit(2.0))
    val p = col("c_st").cast("double") / col("n_s")
    val q = col("c_t").cast("double") / col("n")
    val m = (p + q) / lit(2.0)
    st.join(ct, Seq("token")).join(ns, Seq("source"))
      .crossJoin(broadcast(n))
      .groupBy("source")
      .agg(first(col("n_s")).as("n_s"),
        sum(p * log(p / m)).as("__kl_pm"),
        sum(q * log(q / m)).as("__kl_qm_present"),
        sum(q).as("__q_cov"))
      .select(col("source"), col("n_s").cast("long").as("n_tokens"),
        (round((lit(0.5) * col("__kl_pm") +
          lit(0.5) * (col("__kl_qm_present") +
            ln2 * (lit(1.0) - col("__q_cov")))) / ln2, 4) + lit(0.0))
          .as("js_bits"))
      .orderBy("source")
  }

  def bm25Scores(documents: DataFrame, terms: Seq[String],
                 k1: Double = Bm25K1, b: Double = Bm25B): DataFrame = {
    require(terms.nonEmpty, "query term set must be non-empty")
    val toks = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val matched = toks.filter(col("token").isInCollection(terms))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfTab = matched.groupBy("token").agg(count(lit(1)).as("df"))
    // operation order mirrors the oracle SQL exactly; constants are
    // pre-computed once (k1+1, 1−b) so both engines use identical
    // doubles
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val score = idf * col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    matched.join(broadcast(dfTab), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_matched_terms"),
        round(sum(score), 4).as("bm25"))
      .orderBy("doc_id")
  }

  /** Pairwise source vocabulary overlap — Jaccard of the DISTINCT
    * token sets of every source pair (the corpus-health panel next to
    * [[sourceDrift]]: drift compares frequency SHAPES, this compares
    * vocabulary MEMBERSHIP — a source whose vocabulary barely
    * intersects the rest is mislabeled, machine-generated, or another
    * language). Output: ONE row per source pair (source_a < source_b,
    * n_common, jaccard 4 dp), ordered — zero-overlap pairs INCLUDED
    * (the n_common = 0 row IS the mislabeled-source signal).
    *
    * Scale shape (100 TB): the corpus reduces to the DISTINCT
    * (source, token) table at scan speed (combinable distinct); the
    * common-token join is keyed on `token` — a token in k sources
    * contributes k·(k−1)/2 pairs, bounded by |sources|², and
    * |sources| is panel-sized (thousands at most), never
    * corpus-sized; the complete pair panel is a cross of the
    * panel-sized vocab-count table with itself. No all-pairs on
    * documents anywhere. */
  def sourceVocabOverlap(documents: DataFrame): DataFrame = {
    // eager checkpoint: the corpus-dominant explode+distinct feeds the
    // sizes groupBy AND both self-join sides — the winnowPairs
    // single-pass discipline (3 consumers, one execution)
    val sv = graft.util.SparkUtil.widen(documents)
      .select(col("source"), explode(bpeishTokens(col("text"))).as("token"))
      .distinct()
      .localCheckpoint(true)
    val sizes = sv.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_vocab"))
    val common = sv.select(col("source").as("source_a"), col("token"))
      .join(sv.select(col("source").as("source_b"), col("token")), Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).cast("long").as("n_common"))
    sizes.select(col("source").as("source_a"), col("n_vocab").as("na"))
      // explicit broadcast: panel-sized today, but an UNhinted cross
      // join is the one shape AQE can turn into a real cartesian stage
      // at a 10⁴-source panel — pin the nested-loop side
      .crossJoin(broadcast(
        sizes.select(col("source").as("source_b"), col("n_vocab").as("nb"))))
      .filter(col("source_a") < col("source_b"))
      .join(common, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("n_common"), lit(0L))), 4)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Boilerplate n-gram mining — the top-`topK` word 3-shingles by
    * DOCUMENT frequency (distinct docs containing the gram, df ≥
    * `minDf`): the blocklist-construction pass behind C4-style
    * boilerplate rules and [[graft.analytics.Dedup.winnowPairs]]'s
    * stop-fingerprint cap (a gram in thousands of documents is chrome
    * — cookie banners, nav text — not content, and feeding it to any
    * pair generator is quadratic fan-out for zero signal).
    *
    * Output: (gram, df), ordered df DESC then gram — the deterministic
    * total order both engines cut the top-k on.
    *
    * Scale shape (100 TB): tokens BOUND once (SPARK-35410), per-doc
    * `array_distinct` BEFORE the explode (df counts docs, so dedup
    * happens in the narrow projection — a doc repeating a gram 100×
    * sends it across the shuffle once), one combinable gram groupBy,
    * and the global top-k is `orderBy.limit` = TakeOrderedAndProject —
    * a per-partition heap + driver merge of topK rows, never a full
    * sort of the vocab-sized df table. */
  def boilerplateNgrams(documents: DataFrame, minDf: Long = 2,
                        topK: Int = 20): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    require(topK >= 1, s"topK must be >= 1: $topK")
    graft.util.SparkUtil.widen(documents)
      .withColumn("__words", split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
      .select(col("doc_id"),
        explode(array_distinct(
          graft.analytics.Dedup.shinglesFromWords(col("__words"), 3)))
          .as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("gram"))
      .limit(topK)
  }

  /** Per-document n-gram novelty — the fraction of a doc's DISTINCT
    * word 3-shingles that appear in NO other document (corpus df = 1):
    * the complement of [[boilerplateNgrams]] at the document grain.
    * Near-0 novelty flags templated/mirrored/near-dup content that
    * survived exact dedup; near-1 is genuinely fresh text. Docs with
    * no shingles (< 3 words, null text) emit no row — the shingle-less
    * convention every gram operator here shares.
    *
    * Output: (doc_id, n_grams, n_novel, novelty 4 dp), ordered.
    *
    * Scale shape (100 TB): tokens BOUND once (SPARK-35410), per-doc
    * distinct BEFORE the explode; the df table is one combinable gram
    * groupBy and joins back on the SAME gram key (the unigram-LM
    * exchange-reuse shape); the per-doc aggregate is map-side
    * combinable. The exploded gram table feeds df AND the join-back —
    * eagerly checkpointed once (the winnowPairs single-pass
    * discipline). */
  def ngramNovelty(documents: DataFrame): DataFrame = {
    val grams = graft.util.SparkUtil.widen(documents)
      .withColumn("__words", split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
      .select(col("doc_id"),
        explode(array_distinct(
          graft.analytics.Dedup.shinglesFromWords(col("__words"), 3)))
          .as("gram"))
      .localCheckpoint(true)
    val dfTab = grams.groupBy("gram")
      .agg(count(lit(1)).cast("long").as("__df"))
    grams.join(dfTab, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 4).as("novelty"))
      .orderBy("doc_id")
  }

  /** RAKE keyword extraction (Rose et al. 2010, public): candidate
    * phrases = maximal runs of non-stopword tokens; per-document word
    * stats freq(w) = occurrences, deg(w) = Σ length of phrases
    * containing each occurrence; phrase score = Σ deg(w)/freq(w) over
    * its words; top-k phrases per doc. One simplification, documented:
    * candidate boundaries are STOPWORDS only — [[bpeishTokens]] strips
    * punctuation before the phrase split (full RAKE also breaks at
    * punctuation).
    *
    * Output: (doc_id, rk, phrase, score 4 dp), ordered.
    *
    * Scale shape (100 TB): the phrase split is one narrow projection
    * (tokens BOUND first — SPARK-35410); word stats and the score
    * aggregate are (doc_id[, word])-keyed groupBys — corpus-cardinality
    * keys, map-side combinable; the rank is a doc_id-partitioned
    * window over phrase-count rows (corpus-cardinality partitions —
    * NOT a global funnel). Ranking compares the ROUNDED score with a
    * (phrase, position) tie-break, the [[tfidfTopTerms]] discipline —
    * a raw-double rank would be ulp-unstable cross-engine. */
  def rakeKeywords(documents: DataFrame, stopwords: Seq[String],
                   topK: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(stopwords.nonEmpty, "RAKE needs a stopword set (phrase delimiters)")
    import org.apache.spark.sql.expressions.Window
    val stopArr = array(stopwords.map(lit): _*)
    val phrases = graft.util.SparkUtil.widen(documents)
      .withColumn("__toks", bpeishTokens(col("text")))
      .withColumn("__segs",
        split(concat_ws(" ", transform(col("__toks"), t =>
          when(array_contains(stopArr, t), lit("|")).otherwise(t))), "\\|"))
      .select(col("doc_id"), posexplode(col("__segs")).as(Seq("ppos", "seg")))
      .select(col("doc_id"), col("ppos"), trim(col("seg")).as("phrase"))
      .filter(col("phrase") =!= "")
    // eager checkpoint: the tokenize + double-explode stage feeds both
    // the word-stats groupBy and the score join — single-pass
    // discipline (see winnowPairs)
    val words = phrases
      .withColumn("__ws", split(col("phrase"), " "))
      .select(col("doc_id"), col("ppos"), col("phrase"),
        size(col("__ws")).as("plen"), explode(col("__ws")).as("w"))
      .localCheckpoint(true)
    val stats = words.groupBy("doc_id", "w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
    val scored = words.join(stats, Seq("doc_id", "w"))
      .groupBy("doc_id", "ppos", "phrase")
      .agg(round(sum(col("deg").cast("double") / col("freq")), 4).as("score"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("phrase"), col("ppos"))).cast("long"))
      .filter(col("rk") <= topK)
      .select("doc_id", "rk", "phrase", "score")
      .orderBy("doc_id", "rk")
  }

  /** PMI collocations — adjacent word pairs that co-occur far more than
    * their unigram frequencies predict (pmi = ln(p(ab)/(p(a)p(b)))),
    * the classic collocation/multi-word-expression miner (Church &
    * Hanks 1990) a tokenizer-vocabulary or phrase-mining pass runs over
    * the corpus. `minCount` suppresses the low-frequency pairs whose
    * PMI is pure noise (a count-1 pair of two rare words maxes the
    * score — the known PMI pathology).
    *
    * Determinism: the output is the LIFT ratio itself, not its log —
    * ONE fixed left-associated double expression
    * (cBi·totU·totU)/(totB·cA·cB), every factor an exactly-
    * representable integer count. IEEE multiply/divide are correctly
    * rounded, so the value is bit-identical on ANY conformant engine
    * build; `ln` is a libm call that differs in the last ulp across
    * implementations (the round-9 driver-oracle drift — VERDICT r9 §1)
    * and never reaches the hashed output. PMI = ln(lift) is monotone,
    * so the ranking is unchanged.
    *
    * Output: (w1, w2, n, lift 4 dp) for pairs with n ≥ minCount,
    * ordered by (lift DESC on the ROUNDED value, w1, w2) — float order
    * is only safe post-round.
    *
    * Scale shape (100 TB): bigrams explode from the bound token array
    * (SPARK-35410) in one narrow pass; unigram and bigram counts are
    * map-side-combinable groupBys on vocab-grain keys; the two
    * frequency lookups are shuffle equi-joins on token keys (vocab ≪
    * corpus — natural-language vocab is sublinear, Heaps-law); the
    * scalar totals cross-join ABOVE the aggregates (the unigramLogProb
    * pattern) — never per-row. */
  def collocationsPmi(documents: DataFrame, minCount: Long = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    // checkpoints at every fan-out (the round-8 plan-audit discipline —
    // ReuseExchange does NOT cover differently-shaped consumers): the
    // tokenized corpus feeds bigram AND unigram counting (was 5 scans
    // in-plan); the unigram table feeds u1/u2/total; the bigram table
    // feeds the pair join and its total
    // >= 2-token gate on the CHEAP source column (see bigramLogProb:
    // a pushed-down size(__t) predicate re-evaluates the split below
    // the projection); trim(text) containing a whitespace char is
    // exactly size(split(trim(text), WS+)) >= 2, and rlike(null) is
    // null so the isNotNull guard is subsumed
    val docs = graft.util.SparkUtil.widen(documents)
      .filter(trim(col("text")).rlike("[ \\t\\n\\x0B\\f\\r]"))
      .select(tokens(col("text")).as("__t"))
      .localCheckpoint(true)
    val bi = docs.select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = docs.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
      .localCheckpoint(true)
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint(true)
    val totals = uni.agg(sum("cu").as("tot_u")).crossJoin(
      bc.agg(sum("cb").as("tot_b")))
    val u1 = uni.select(col("w").as("w1"), col("cu").as("cu1"))
    val u2 = uni.select(col("w").as("w2"), col("cu").as("cu2"))
    bc.filter(col("cb") >= minCount)
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("cb").cast("long").as("n"),
        round((col("cb").cast("double") * col("tot_u") * col("tot_u")) /
          (col("tot_b").cast("double") * col("cu1") * col("cu2")), 4)
          .as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
  }

  /** Burrows' Delta stylometric distance between sources — the corpus-
    * forensics panel (Burrows 2002, the standard authorship-attribution
    * measure): per source, z-scores of the relative frequencies of the
    * corpus's `topWords` most frequent words (function words — style,
    * not topic), and per source PAIR the mean |z difference|. Low delta
    * = same register/pipeline (a "two sources" pair that is really one
    * crawl twice); an outlier source against all others is a different
    * genre — or machine-generated. A function word ABSENT from a
    * source counts as frequency 0 (the grid is dense by construction);
    * a word with zero cross-source variance contributes z = 0.
    *
    * Output: (source_a < source_b, delta 4 dp, n_words), ordered.
    *
    * Scale shape (100 TB): ONE token explode + one combinable
    * (source, word) groupBy collapse the corpus; everything after is
    * panel arithmetic (|sources|·topWords rows) — the function-word
    * cut is a TakeOrdered heap, the dense grid a broadcast cross of
    * two panel tables (lint-allowed scalar cross), the pair join a
    * word-keyed equi-join of panels. */
  def stylometryDelta(documents: DataFrame, topWords: Int = 10): DataFrame = {
    require(topWords >= 1, s"topWords must be >= 1: $topWords")
    val sw = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds totals, global counts, and the grid
    val totals = sw.groupBy("source").agg(sum("c").as("tot"))
    val fw = sw.groupBy("w").agg(sum("c").as("gc"))
      .orderBy(col("gc").desc, col("w")).limit(topWords).select("w")
    val grid = fw.crossJoin(broadcast(totals))
      .join(sw, Seq("w", "source"), "left")
      .withColumn("f",
        coalesce(col("c"), lit(0L)).cast("double") / col("tot"))
    val stats = grid.groupBy("w")
      .agg(avg("f").as("mu"), stddev_pop("f").as("sd"))
    val z = grid.join(broadcast(stats), "w")
      .select(col("source"), col("w"),
        when(col("sd") > 0, (col("f") - col("mu")) / col("sd"))
          .otherwise(0.0).as("z"))
    val za = z.select(col("source").as("source_a"), col("w"),
      col("z").as("za"))
    val zb = z.select(col("source").as("source_b"), col("w"),
      col("z").as("zb"))
    za.join(zb, Seq("w")).filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(round(avg(abs(col("za") - col("zb"))), 4).as("delta"),
        count(lit(1)).cast("long").as("n_words"))
      .orderBy("source_a", "source_b")
  }

  /** Character-trigram language identification — the CLD/langid.py
    * profile shape upgraded from [[languageId]]'s marker words: per
    * labeled language, the top-`profileSize` char trigrams (of the
    * lowercased, whitespace-collapsed-to-'_' text) form the profile;
    * a document's score per language = its trigram OCCURRENCES found
    * in that profile (pure integer — no tf-idf float surface), argmax
    * with language-code tiebreak. Output is the per-language confusion
    * matrix (actual × predicted doc counts) — the self-train accuracy
    * audit a curation run uses to decide whether the `lang` column can
    * be trusted. Docs with < 3 normalized chars or zero profile hits
    * classify as nothing and are absent (documented; both engines
    * drop them identically through the inner join).
    *
    * Scale shape (100 TB): the trigram table explodes from a BOUND
    * normalized-string column and is checkpointed once for its two
    * consumers (profile training + classification); profile ranking
    * windows run at (lang × trigram-vocab) grain, never corpus grain;
    * profiles broadcast (|langs|·profileSize rows); the per-doc argmax
    * window partitions on doc_id — corpus-cardinality, no funnel. */
  def trigramLangId(documents: DataFrame, profileSize: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(profileSize >= 1, s"profileSize must be >= 1: $profileSize")
    val norm = regexp_replace(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+", "_")
    // CONTRACT: null-lang docs are excluded — an unlabeled doc cannot
    // train a profile nor appear in a supervised confusion matrix
    val base = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang"), norm.as("__s"))
      // trigram extraction with NO per-element lambda: HOFs are
      // CodegenFallback (interpreted per element — measured 101 s at
      // sf0.1), and per-position substring(__s, i, 3) walks codepoints
      // from the string start (O(i) each → O(n²) per doc, 12 s). The
      // r9 fix (char-split + arrays_zip of three shifted slices) paid
      // per-codepoint object churn: split("") allocates one UTF8String
      // per char, each slice copies the array, arrays_zip builds a
      // 3-string struct per position (measured 3.5 s at sf0.1). ONE
      // codegen'd regexp_extract_all does the whole walk in-place
      // (r18 opt round): the lookahead captures 3 codepoints at every
      // position, '.' consumes one — exactly the n−2 trigrams, in
      // order; (?s) so a literal U+2028/U+2029 inside a doc cannot
      // break the walk (whitespace is already collapsed to '_').
      // Measured 0.64 s; exceptAll 0/0 both directions vs the zip
      // form. The length >= 3 prefilter is subsumed: a shorter string
      // extracts an empty array and explode drops the row — and the
      // old filter(length(__s)) pushed below the projection and
      // re-evaluated the regexp_replace per row (no CSE across
      // Filter/Project).
      .select(col("doc_id"), col("lang"),
        explode(regexp_extract_all(col("__s"),
          lit("(?s)(?=(.{3}))."), lit(1))).as("tg"))
      // collapse to per-doc trigram COUNTS before the checkpoint —
      // occurrence semantics preserved as weights, ~40% less cached
      // data and every downstream pass runs at (doc, tg) grain
      .groupBy("doc_id", "lang", "tg").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds profile training AND classification
    val counts = base.groupBy("lang", "tg").agg(sum("cnt").as("c"))
    val profiles = counts
      .withColumn("__rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("tg"))))
      .filter(col("__rk") <= profileSize)
      .select(col("lang").as("plang"), col("tg"))
    val scored = base.join(broadcast(profiles), "tg")
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(sum("cnt").as("score"))
    scored
      .withColumn("__p", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("plang"))))
      .filter(col("__p") === 1)
      .groupBy(col("lang").as("actual_lang"), col("plang").as("predicted_lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .orderBy("actual_lang", "predicted_lang")
  }

  /** Readability panel — Flesch reading ease per document from exact
    * integer counts: sentences (terminator-split), words (whitespace
    * tokens), syllables (vowel-group runs per word, floor 1 — the
    * standard dictionary-free heuristic). The synthetic corpus has no
    * punctuation, so callers forge deterministic terminators in-plan
    * (the corpus_chunk_sentences scaffold — same integer arithmetic in
    * both engines); a no-terminator doc is ONE sentence (split on a
    * non-matching pattern returns the whole string — both engines).
    *
    * flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), a fixed per-row double expression over exact longs —
    * deterministic, rounded to 2 dp for display only.
    *
    * Output: (doc_id, n_sentences, n_words, n_syllables, flesch),
    * null-text and zero-sentence docs excluded (a 0-sentence doc has
    * no defined words-per-sentence — emitting ±Inf would poison any
    * downstream aggregate; exclusion is the portable semantics),
    * ordered by doc_id.
    *
    * Scale shape: pure narrow per-document projection — scan speed;
    * the token and sentence arrays bind once (SPARK-35410) and every
    * lambda touches only its own element. */
  def readability(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      // sentence COUNT with row-level regexps only (no regexp inside a
      // HOF lambda — SPARK-35410 interpretation rule): replace each
      // terminator+ws separator with \\u0000, drop every terminator
      // char, and count runs of non-separator chars. An element of the
      // original split survives its trailing-[.!?]+ trim iff it
      // contains ANY non-terminator char, so the run count equals the
      // original filter(transform(...)) size exactly.
      .withColumn("__sflat",
        regexp_replace(
          regexp_replace(trim(col("text")),
            "[.!?][ \\t\\n\\x0B\\f\\r]+", "\u0000"),
          "[.!?]", ""))
      .withColumn("__toks", tokens(col("text")))
      .select(col("doc_id"),
        size(regexp_extract_all(col("__sflat"), lit("[^\u0000]+"), lit(0)))
          .cast("long").as("n_sentences"),
        size(col("__toks")).cast("long").as("n_words"),
        aggregate(col("__toks"), lit(0L), (acc, w) =>
          acc + greatest(lit(1),
            size(regexp_extract_all(lower(w), lit("[aeiou]+"), lit(0))))
            .cast("long"))
          .as("n_syllables"))
      .filter(col("n_sentences") > 0)
      // Flesch in EXACT integer arithmetic end to end:
      //   206.835 - 1.015*W/S - 84.6*Y/W
      //   = (206835*S*W - 1015*W^2 - 84600*Y*S) / (1000*S*W) = num/den.
      // Two chained double divisions drift in the last ulp across
      // engines (flipped a .xx5 2-dp boundary at sf0.1), and even a
      // bit-identical num/den double can't be round()ed portably:
      // den = 1000*S*W makes exact 3-decimal .xx5 rationals SYSTEMATIC,
      // and on those Spark's round (shortest-repr BigDecimal, sees
      // "73.365", rounds up) disagrees with DuckDB's (C round of the
      // binary value 73.36499..., rounds down). So the HALF-UP round to
      // 2 dp is integer math too — k = ±((200*|num| + den) div (2*den))
      // — and the only float op is the final exact-integer k/100
      // division (IEEE correctly-rounded, bit-identical anywhere).
      // Exact while BIGINTs fit: W up to ~6e6 tokens/doc
      // (200*1015*W^2 < 9.2e18); ANSI overflow fails loud past it.
      .withColumn("__rnum",
        lit(206835L) * col("n_sentences") * col("n_words")
          - lit(1015L) * col("n_words") * col("n_words")
          - lit(84600L) * col("n_syllables") * col("n_sentences"))
      .withColumn("__rden", lit(1000L) * col("n_sentences") * col("n_words"))
      .withColumn("flesch",
        expr("""CASE WHEN __rnum >= 0L
            THEN (200L * __rnum + __rden) DIV (2L * __rden)
            ELSE -((200L * -__rnum + __rden) DIV (2L * __rden)) END""")
          .cast("double") / lit(100.0))
      .drop("__rnum", "__rden")
      .orderBy("doc_id")

  /** OOV-rate-vs-vocabulary-size curve — the tokenizer-budget design
    * panel: for each candidate vocab size V (top-V types by frequency,
    * ties on token), the share of corpus TOKENS that would fall out of
    * vocabulary, in EXACT integer permille. The curve's knee is the
    * standard vocab-size pick; computing it from one ranked type table
    * beats re-running a tokenizer trainer per candidate.
    *
    * Output: (vocab_size, n_types, total_tokens, covered_tokens,
    * oov_permille), one row per candidate V, ordered; empty corpora
    * emit nothing (no 0-division row).
    *
    * Scale shape: one combinable (token, cnt) aggregate at VOCABULARY
    * cardinality, the constant-key skew-safe [[graft.metrics.Metrics
    * .rankByKey]] global rank (a ranking window would funnel the
    * vocabulary through one task), then ONE pass of conditional sums —
    * all candidates from a single scan of the ranked types. */
  def oovCurve(documents: DataFrame,
               vocabSizes: Seq[Long] = Seq(16L, 64L, 256L, 1024L, 4096L))
      : DataFrame = {
    require(vocabSizes.nonEmpty && vocabSizes.forall(_ >= 1) &&
      vocabSizes == vocabSizes.sorted && vocabSizes.distinct == vocabSizes,
      s"vocabSizes must be sorted positive distinct: $vocabSizes")
    val counts = graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("__k", lit(1)).withColumn("__neg", -col("cnt"))
    val ranked = graft.metrics.Metrics.rankByKey(counts, "__k",
      Seq("__neg", "token"))
    val aggCols = Seq(
      count(lit(1)).cast("long").as("n_types"),
      sum("cnt").cast("long").as("total_tokens")) ++
      vocabSizes.map(v =>
        coalesce(sum(when(col("_rank") <= v, col("cnt"))), lit(0L))
          .as(s"__c$v"))
    val agg = ranked.agg(aggCols.head, aggCols.tail: _*)
    agg
      .select(col("n_types"), col("total_tokens"),
        explode(array(vocabSizes.map(v =>
          struct(lit(v).as("v"), col(s"__c$v").as("c"))): _*)).as("e"))
      .filter(col("total_tokens") > 0)
      .select(col("e.v").as("vocab_size"), col("n_types"),
        col("total_tokens"), col("e.c").as("covered_tokens"))
      .withColumn("oov_permille",
        expr("(1000L * (total_tokens - covered_tokens)) DIV total_tokens"))
      .orderBy("vocab_size")
  }

  /** Sentence-length burstiness per document — the variance-to-mean
    * ratio (index of dispersion) of tokens-per-sentence: uniform prose
    * sits near 0–1, machine-generated boilerplate near 0, and
    * concatenated-fragment spam ≫ 1 — a cheap structural-quality gate
    * alongside [[readability]] (same sentence scaffold). EXACT integer
    * end to end: with sentence token counts x_i (n sentences, S = Σx,
    * Q = Σx²), vmr_permille = (1000·(n·Q − S²)) div (n·S) — population
    * variance over mean, half-floor, zero float surface.
    *
    * Output: (doc_id, n_sentences, n_words, vmr_permille), ordered;
    * null-text and zero-sentence docs excluded (readability contract).
    *
    * Scale shape: explode to sentence rows (the per-element-lambda
    * split stays OUT of a HOF — SPARK-35410 interpretation rule), then
    * ONE combinable per-doc aggregate. */
  def burstiness(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      // explode FIRST, then trim trailing terminators at ROW level —
      // the regexp never runs inside a HOF lambda (SPARK-35410
      // interpretation rule); semantics identical to trimming inside
      // the array.
      .withColumn("__sents",
        split(trim(col("text")), "[.!?][ \\t\\n\\x0B\\f\\r]+"))
      .select(col("doc_id"), explode(col("__sents")).as("__s0"))
      .select(col("doc_id"),
        regexp_replace(col("__s0"), "[.!?]+$", "").as("__s"))
      .filter(col("__s") =!= "")
      .select(col("doc_id"),
        size(split(trim(col("__s")), "[ \\t\\n\\x0B\\f\\r]+")).cast("long")
          .as("__x"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_sentences"),
        sum("__x").as("n_words"),
        sum(col("__x") * col("__x")).as("__q"))
      .withColumn("vmr_permille",
        expr("""(1000L * (n_sentences * __q - n_words * n_words))
          DIV (n_sentences * n_words)"""))
      .drop("__q")
      .orderBy("doc_id")

  /** Weighted-lexicon document scoring — the classifier-free quality /
    * sentiment / toxicity panel stage (a VADER/LIWC-style lexicon is
    * the standard cheap gate before a learned scorer): per document,
    * the token count, lexicon hit count, signed weight sum, and the
    * length-normalized score in EXACT integer permille
    * (±((2000·|wsum| + n) div (2n)) — half-away rounding with zero
    * float surface, the readability discipline; ratio rounding on
    * doubles flips shortest-repr .5 boundaries across engines).
    *
    * Null-text docs are excluded (token contract); docs with zero
    * lexicon hits still report (wsum 0). Weights are caller-supplied
    * (token → signed int) so the same operator serves quality,
    * sentiment, and toxicity lexicons.
    *
    * Scale shape: ONE scan — explode(tokens) → broadcast LEFT join on
    * the lexicon (real lexicons are ≤100k rows — always broadcast) →
    * one combinable per-doc aggregate. The per-element CASE-chain
    * alternative is the SPARK-35410 interpreted-lambda trap AND scales
    * with |lexicon| per token; the join form scales with corpus only. */
  def lexiconScore(documents: DataFrame,
                   lexicon: Seq[(String, Int)]): DataFrame = {
    require(lexicon.nonEmpty, "lexiconScore: empty lexicon")
    require(lexicon.map(_._1).distinct.size == lexicon.size,
      "lexiconScore: duplicate lexicon tokens")
    val spark = documents.sparkSession
    import spark.implicits._
    val lex = lexicon.toDF("__ltoken", "__w")
    graft.util.SparkUtil.widen(documents)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("__token"))
      .join(broadcast(lex), col("__token") === col("__ltoken"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("__w").isNotNull, 1L).otherwise(0L)).as("lex_hits"),
        coalesce(sum(col("__w").cast("long")), lit(0L)).as("wsum"))
      .withColumn("score_permille",
        expr("""CASE WHEN wsum >= 0L
            THEN (2000L * wsum + n_tokens) DIV (2L * n_tokens)
            ELSE -((2000L * -wsum + n_tokens) DIV (2L * n_tokens)) END"""))
      .orderBy("doc_id")
  }
}
