package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Document-cleaning operators a pretraining corpus build runs BEFORE
  * dedup/selection: line-level boilerplate removal (the C4 / MassiveText
  * family of heuristics — published rule sets, not reference-derived;
  * the reference corpus has no cleaning stage, this is part of the
  * "operations a large-scale training-data pipeline needs" mandate) and
  * PII redaction (regex scrubbing of emails / IPs / SSNs / phone
  * numbers, the standard pre-release pass).
  *
  * Both are deterministic and DuckDB-oracled; both stay narrow except
  * where the semantics genuinely need a corpus-wide view (the
  * line-frequency table in [[removeBoilerplate]]). */
object Cleaning {

  /** Line identity used for corpus-frequency counting: lowercased,
    * trimmed, internal whitespace collapsed — boilerplate identity must
    * survive spacing noise (a triple-spaced cookie banner is the same
    * banner). md5 so the shuffled key is 32 bytes regardless of line
    * length (the raw line would ship whole boilerplate paragraphs
    * through the exchange). */
  private def lineHash(line: Column): Column =
    md5(regexp_replace(lower(trim(line)), "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Words-per-line, empty-safe: `split` of an empty string yields
    * `[""]`, which must count 0, not 1 (both engines agree after the
    * non-empty filter). */
  private def wordCount(line: Column): Column =
    size(filter(split(trim(line), "[ \\t\\n\\x0B\\f\\r]+"), w => w =!= ""))

  /** Default drop-line patterns (applied to the lowercased line) — the
    * C4 "javascript / lorem ipsum / curly brace" family plus the usual
    * legal-footer markers. */
  val defaultBoilerplatePatterns: String =
    "javascript|cookie|copyright|all rights reserved|privacy policy|" +
      "terms of (use|service)|lorem ipsum"

  /** Line-level boilerplate removal — C4-style local rules plus a
    * MassiveText-style corpus-frequency rule:
    *
    *  - a line is RULE-dropped when it has fewer than `minWords` words
    *    or its lowercased form matches `patterns`;
    *  - a line is CORPUS-dropped when its normalized form appears in
    *    more than `maxLineDocFreq` distinct documents (navigation bars,
    *    legal footers, cookie banners — boilerplate is what repeats
    *    across pages);
    *  - documents keep their surviving lines in original order;
    *    documents with zero surviving lines are dropped entirely
    *    (C4 drops boilerplate-only pages).
    *
    * Output: (doc_id, text_clean, n_lines_kept, n_lines_dropped),
    * ordered by doc_id.
    *
    * Scale shape (100 TB): the explode is narrow; the frequency table
    * is one groupBy on the 32-byte line hash with a map-side-combinable
    * `countDistinct(doc_id)` partial; only hashes with df >
    * `maxLineDocFreq` survive the HAVING — a heavy-hitter set, orders
    * of magnitude smaller than the line count, but UNBOUNDED in
    * adversarial corpora, so it joins back as a plain shuffle anti-join
    * on the same 32-byte key (never a forced broadcast). The regroup is
    * one doc_id shuffle; per-doc state is that doc's own lines. Nothing
    * funnels. */
  def removeBoilerplate(documents: DataFrame, minWords: Int = 3,
                        maxLineDocFreq: Long = 2,
                        patterns: String = defaultBoilerplatePatterns): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1: $minWords")
    require(maxLineDocFreq >= 1, s"maxLineDocFreq must be >= 1: $maxLineDocFreq")
    val lines = graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", lineHash(col("line")))
    // corpus-frequency over ALL lines (rule-dropped lines still count
    // toward boilerplate evidence — a 2-word cookie banner is still a
    // cookie banner)
    val frequent = lines.groupBy("lh")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") > maxLineDocFreq)
      .select("lh")
    val kept = lines
      .filter(wordCount(col("line")) >= minWords &&
        !lower(col("line")).rlike(patterns))
      .join(frequent, Seq("lh"), "left_anti")
    val regrouped = kept.groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x("line")), "\n").as("text_clean"),
        count(lit(1)).cast(LongType).as("n_lines_kept"))
    val totals = documents.select(col("doc_id"),
      size(split(col("text"), "\n")).cast(LongType).as("n_lines_total"))
    regrouped.join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("text_clean"), col("n_lines_kept"),
        (col("n_lines_total") - col("n_lines_kept")).as("n_lines_dropped"))
      .orderBy("doc_id")
  }

  /** Within-document repeated-line removal — the complement of
    * [[removeBoilerplate]]'s corpus-frequency rule: chrome that repeats
    * INSIDE one page (expanded accordion menus, per-item "add to cart"
    * rows, pagination footers stitched together by an extractor) never
    * crosses the document-frequency bar but still floods the page.
    * The RefinedWeb/C4 line-dedup family's in-page rule: first
    * occurrence wins, original order kept.
    *
    * Output: (doc_id, text_dedup, n_lines, n_unique_lines), ordered by
    * doc_id.
    *
    * Scale shape (100 TB): `split → array_distinct → array_join` is ONE
    * narrow codegen'd projection — per-doc state only, no explode, no
    * shuffle; it runs at scan speed and composes freely under any
    * downstream operator. (`array_distinct` preserves first-occurrence
    * order in Spark; the DuckDB oracle must NOT use `list_distinct`,
    * which does not — it mirrors the semantics with a min-position
    * group-by instead.) */
  def dedupLinesInDoc(documents: DataFrame): DataFrame =
    graft.util.SparkUtil.widen(documents)
      .select(col("doc_id"), split(col("text"), "\n").as("lines"))
      .select(col("doc_id"),
        array_join(array_distinct(col("lines")), "\n").as("text_dedup"),
        size(col("lines")).cast(LongType).as("n_lines"),
        size(array_distinct(col("lines"))).cast(LongType).as("n_unique_lines"))
      .orderBy("doc_id")

  /** Unicode text canonicalization — the pass a corpus build runs
    * before ANY hash-keyed stage (exact dedup, MinHash shingles,
    * winnowing): visually-identical texts must be byte-identical or
    * they escape every fingerprint. Three deterministic rules, in
    * order:
    *
    *  1. NFC-normalize (combining sequences compose: "e"+U+0301 → "é")
    *     via the codegen'd [[graft.functions.NfcNormalizeExpr]];
    *  2. strip NON-whitespace control characters — Cc minus
    *     {TAB LF VT FF CR}, spelled as the explicit codepoint class
    *     `[\x00-\x08\x0E-\x1F\x7F-\x9F]` (C0 + DEL + C1);
    *  3. collapse every whitespace run to one space, then trim. The
    *     collapse class is spelled EXPLICITLY as `[ \t\n\x0B\f\r]+`,
    *     never `\s+`: Java's `\s` matches VT (\x0B) but RE2's does
    *     not, so `\s+` silently means different things to the two
    *     engines — a VT in corpus text would become a space in Spark
    *     yet survive in the DuckDB oracle, an engine-UNSTABLE identity
    *     in the very pass that exists to guarantee stable hash keys.
    *
    * Rule order matters twice: controls strip BEFORE the collapse so a
    * space-flanked control leaves ONE space, not two ("a  b" →
    * "a b"); and the whitespace controls are excluded from the strip
    * class so newlines become separators, not deleted glue ("foo\nbar"
    * → "foo bar", never "foobar"). All regexes are Java∩RE2 (the PII
    * dialect rule) so the DuckDB oracle runs `nfc_normalize` + the same
    * two patterns verbatim — the class is explicit hex ranges, NOT
    * `\p{Cntrl}`, which RE2 does not know inside `\p{...}` and
    * SILENTLY matches nothing (the oracle would pass while stripping
    * nothing; both dialects were probed with C0 and C1 chars). Output: the input frame with `text`
    * replaced by its normal form and `n_chars` recomputed.
    *
    * Scale shape: entirely narrow — one codegen'd projection, no
    * shuffle; already-NFC text (virtually all of a real corpus) takes
    * the isNormalized fast path and is returned without copying. */
  def normalizeText(documents: DataFrame): DataFrame = {
    val nfc = graft.functions.NfcNormalizeExpr(col("text"))
    val stripped = regexp_replace(nfc, "[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F]", "")
    val clean = trim(regexp_replace(stripped, "[ \\t\\n\\x0B\\f\\r]+", " "))
    graft.util.SparkUtil.widen(documents)
      .withColumn("text", clean)
      .withColumn("n_chars", length(col("text")).cast(LongType))
  }

  /** Mojibake sequence → repaired form. The classic UTF-8-bytes-read-
    * as-Windows-1252 double-encoding artifacts that survive in every
    * web crawl (the ftfy problem class, public): the UTF-8 encoding of
    * a punctuation/accented char, misdecoded, becomes one of these
    * stable marker sequences — each maps back to exactly one intended
    * char, so plain literal replacement (no regex) repairs them.
    * ORDER MATTERS: longer sequences first, so "â€¦" never loses its
    * tail to the 2-char "â€" prefix rules. Literal-for-literal in BOTH
    * engines (`replace`, not `regexp_replace` — no dialect surface). */
  val mojibakePatterns: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€˜" -> "‘",   // curly single quotes
    "â€œ" -> "“", "â€" -> "”", // curly double quotes
    "â€“" -> "–", "â€”" -> "—",   // en/em dash
    "â€¦" -> "…",                      // ellipsis
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã¤" -> "ä", "Ã¶" -> "ö", "Ã¼" -> "ü", "Ã±" -> "ñ", "Ã§" -> "ç",
    "Â " -> " ")                            // stray  before nbsp-space

  /** Encoding repair — undo UTF-8-as-Windows-1252 mojibake via the
    * fixed [[mojibakePatterns]] table. Output: the input frame with
    * `text` repaired, `n_chars` recomputed, and a `was_broken` flag
    * (repair changed the text — the per-source rate of this flag is
    * the crawl-health signal that a source's charset declaration is
    * lying). Null text passes through null, flag false.
    *
    * Scale shape: entirely narrow — a chain of literal `replace`
    * builtins (codegen'd, no regex engine), one projection at scan
    * speed, no shuffle. */
  def fixEncoding(documents: DataFrame): DataFrame = {
    val repaired = mojibakePatterns.foldLeft(col("text")) {
      case (acc, (bad, good)) =>
        call_function("replace", acc, lit(bad), lit(good))
    }
    graft.util.SparkUtil.widen(documents)
      .withColumn("__fixed", repaired)
      .withColumn("was_broken",
        coalesce(col("__fixed") =!= col("text"), lit(false)))
      .withColumn("text", col("__fixed"))
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .drop("__fixed")
  }

  /** PII category → (regex, replacement token). ORDER MATTERS and is
    * part of the contract: emails first (their local/domain parts
    * contain dots and digits that the later patterns must not see),
    * then IPv4 (dotted digit runs that the dot-separated phone form
    * would otherwise shadow), then SSN (3-2-4) and phone (3-3-4 —
    * disjoint digit groupings, but both must run after IPv4). All
    * patterns are valid in BOTH Java regex and RE2 (no backrefs, no
    * lookaround) so the DuckDB oracle runs them verbatim. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** PII redaction — replace emails / IPv4 addresses / SSNs / phone
    * numbers with typed tokens and count each category. Counts are
    * PER-PASS: category i is counted on the text after categories
    * 0..i-1 were already replaced, so each count equals the number of
    * tokens that pass actually inserted (a digit-run inside an email
    * counts as email only, never double-counts as phone/IP). Output:
    * (doc_id, text_redacted, n_emails, n_ips, n_ssns, n_phones),
    * ordered by doc_id.
    *
    * Scale shape: one narrow projection — chained `regexp_replace` +
    * `regexp_count`, all codegen'd builtins at scan speed (the shared
    * replace prefixes collapse under subexpression elimination); no
    * shuffle, no UDF. [[graft.util.SparkUtil.widen]] keeps the regex
    * CPU parallel on few-file inputs. */
  def redactPii(documents: DataFrame): DataFrame = {
    // stages(i) = text after the first i replacement passes
    val stages = piiPatterns.scanLeft(col("text")) {
      case (acc, (_, pat, tok)) => regexp_replace(acc, pat, tok)
    }
    val counts = piiPatterns.zipWithIndex.map { case ((name, pat, _), i) =>
      regexp_count(stages(i), lit(pat)).cast(LongType).as(s"n_${name}s")
    }
    graft.util.SparkUtil.widen(documents)
      .select(col("doc_id") +: stages.last.as("text_redacted") +: counts: _*)
      .orderBy("doc_id")
  }

  /** Gopher/MassiveText-style quality GATE — the published rule set a
    * pretraining build applies before dedup (distinct from
    * [[graft.analytics.TextAnalysis.qualityScores]], which SCORES for
    * downstream weighting; this one makes the keep/drop decision):
    *
    *  - word count within [`minWords`, `maxWords`];
    *  - mean word length within [`minMeanLen`, `maxMeanLen`] (filters
    *    char-soup and concatenated-token garbage);
    *  - fraction of words containing an alphabetic character >=
    *    `minAlphaFrac` (filters numeric/symbol tables);
    *  - at least `minStopHits` stopword occurrences (the Gopher "2 of
    *    the common-word list" rule — filters keyword-stuffing pages).
    *
    * The keep decision compares the ROUNDED mean/fraction (4 dp) so
    * the boundary cannot drift by a float ulp between engines — same
    * discipline as [[lengthFilter]]'s rank-based cut. Output: (doc_id,
    * n_words, mean_word_len, alpha_frac, stop_hits, keep), ordered by
    * doc_id.
    *
    * Scale shape (100 TB): one narrow codegen'd projection — the word
    * array is built once and every rule folds over it with collection
    * HOFs (`aggregate`/`filter`/`size`); no shuffle, no UDF, no
    * regex-per-word JVM object churn beyond the single `[A-Za-z]`
    * probe. [[graft.util.SparkUtil.widen]] keeps it parallel on
    * few-file inputs. */
  /** Blocklist gate — the C4 "bad words" rule (any page containing a
    * blocklisted token is dropped entirely; Raffel et al. 2020): per
    * document, the blocked-token occurrence count and the keep flag.
    * Membership is lowercased whole-token compare (substring matches
    * would false-positive on benign carriers — the documented C4
    * over-blocking criticism cuts the other way; choose the list, not
    * the matcher). Gate REPORT, not a filtered table (the gopherRules
    * convention — composition sites filter on `keep`).
    *
    * Scale shape: one narrow projection, no shuffle, no UDF, no
    * regex. The per-token membership check is a `filter` HOF lambda —
    * INTERPRETED per element (the SCALE.md HOF rule), acceptable here
    * because the step is one small-array containment; for a C4-scale
    * blocklist (hundreds of terms) the O(tokens × terms) interpreted
    * scan matters — swap the literal array for a broadcast semi-join
    * of exploded lowered tokens against a blocklist table. */
  def blocklistFilter(documents: DataFrame,
                      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklistFilter needs a non-empty list")
    require(blocklist.forall(w => w == w.toLowerCase),
      s"blocklist must be lowercase (tokens are lowercased): $blocklist")
    val blockArr = array(blocklist.map(lit): _*)
    graft.util.SparkUtil.widen(documents)
      .withColumn("__w", graft.analytics.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        coalesce(size(filter(col("__w"),
          t => array_contains(blockArr, lower(t)))), lit(0))
          .cast("long").as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0L)
      .orderBy("doc_id")
  }

  def gopherRules(documents: DataFrame,
                  minWords: Long = 50, maxWords: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaFrac: Double = 0.8, minStopHits: Long = 2,
                  stopwords: Seq[String] = Seq("the", "a", "of", "and")): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"word-count bounds must satisfy 1 <= min <= max: [$minWords, $maxWords]")
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val ws = col("__ws")
    val n = size(ws).cast(LongType)
    val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val meanLen = round(
      when(n === 0, 0.0).otherwise(sumLen.cast("double") / n), 4)
    val alphaFrac = round(
      when(n === 0, 0.0).otherwise(
        size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / n), 4)
    val stopHits =
      size(filter(ws, w => lower(w).isInCollection(stopwords))).cast(LongType)
    graft.util.SparkUtil.widen(documents)
      // lambda-bearing trees get no subexpression elimination
      // (SPARK-35410): split/filter the word array once, not per rule
      .withColumn("__ws", filter(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"), w => w =!= ""))
      .select(col("doc_id"), n.as("n_words"), meanLen.as("mean_word_len"),
        alphaFrac.as("alpha_frac"), stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen &&
          col("alpha_frac") >= minAlphaFrac && col("stop_hits") >= minStopHits)
      .orderBy("doc_id")
  }

  /** Grouped length-percentile filter: within each language, keep
    * documents whose length rank sits in [`pLo`, `pHi`] — the
    * "drop the shortest 5% and longest 5% per language" trim of a
    * multilingual corpus build, where absolute thresholds fail (a short
    * Chinese document is not a short English one). The decision is
    * RANK-based, not value-interpolated: percent rank over the TOTAL
    * order (n_chars, doc_id) is an exact rational (r−1)/(n−1) both
    * engines compute identically, so the keep/drop boundary cannot
    * drift by a float ulp the way an interpolated quantile threshold
    * can. Output kept docs: (doc_id, lang, n_chars, len_pct),
    * ordered by doc_id.
    *
    * Scale shape (100 TB): delegates to
    * [[graft.metrics.Metrics.percentRankByKey]] — every stage P-way
    * parallel, no per-language window funnel (a naive
    * `Window.partitionBy(lang)` would pull the whole corpus through
    * ~30 reducers). */
  def lengthFilter(documents: DataFrame, pLo: Double = 0.05,
                   pHi: Double = 0.95): DataFrame =
    graft.metrics.Metrics.rankByKey(
        graft.util.SparkUtil.widen(documents)
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", Seq("n_chars", "doc_id"))
      .withColumn("pct_rank",
        when(col("_nk") > 1,
          (col("_rank") - 1).cast("double") / (col("_nk") - 1).cast("double"))
          .otherwise(0.0))
      // a single-document language has no tail to trim — keep it (its
      // one doc is the median, not an outlier)
      .filter(col("_nk") === 1 ||
        (col("pct_rank") >= pLo && col("pct_rank") <= pHi))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("pct_rank"), 6).as("len_pct"))
      .orderBy("doc_id")

  /** Context-limit head truncation — the export trim before packing
    * into a fixed training context (a doc beyond the window would be
    * silently cut by the loader anyway; cutting it HERE makes the
    * token accounting (`CorpusOps.tokenBudget`/`packSequences`) see
    * the real lengths). Keeps the first `maxTokens` whitespace tokens,
    * rejoined single-spaced (the normalizeText convention). Null text
    * passes through null with zero kept. Output: (doc_id, text_trunc,
    * n_tokens_kept, was_truncated), ordered by doc_id.
    *
    * Scale shape: one narrow codegen'd projection (bound token array,
    * slice + concat_ws) — scan speed, no shuffle. */
  def truncateDocs(documents: DataFrame, maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    graft.util.SparkUtil.widen(documents)
      .withColumn("__w", graft.analytics.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", slice(col("__w"), 1, maxTokens)))
          .as("text_trunc"),
        least(coalesce(size(col("__w")), lit(0)), lit(maxTokens))
          .cast(LongType).as("n_tokens_kept"),
        coalesce(size(col("__w")) > maxTokens, lit(false))
          .as("was_truncated"))
      .orderBy("doc_id")
  }

  /** Markup-removal passes of [[htmlToText]], applied in order. Every
    * pattern is valid in BOTH Java regex and RE2 (inline (?is) flags,
    * lazy quantifiers, no lookaround/backrefs) so the DuckDB oracle
    * runs them verbatim. script/style blocks drop their CONTENT
    * (machine text, not prose), comments drop, remaining tags become
    * spaces. */
  val htmlBlockPatterns: Seq[String] = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->",
    "<[^>]*>")

  /** HTML entity decode table for [[htmlToText]]. ORDER MATTERS and is
    * part of the contract: `&amp;` is decoded LAST — decoding it first
    * would turn the escaped text `&amp;lt;` into `&lt;` and then
    * falsely into `<` (double-decode). Entities are decoded AFTER tag
    * stripping, so `&lt;div&gt;` survives as the literal text `<div>`
    * (it was escaped prose, not markup). */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of an HTML column: strip script/style/comment blocks
    * and tags ([[htmlBlockPatterns]]), decode common entities
    * ([[htmlEntities]]), collapse whitespace, trim. Null → null. */
  def htmlToText(html: Column): Column = {
    val noMarkup = htmlBlockPatterns.foldLeft(html)(
      (acc, p) => regexp_replace(acc, p, " "))
    val decoded = htmlEntities.foldLeft(noMarkup) {
      case (acc, (e, c)) => call_function("replace", acc, lit(e), lit(c))
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** Main-text extraction from raw HTML — the first pass of every
    * web-crawl corpus pipeline (the C4/CCNet preprocessing step that
    * precedes all quality/dedup work): [[htmlToText]] per document plus
    * the removed-volume audit column (markup share ≈ 1 −
    * text_clean/len is the page-chrome signal). Plain-text documents
    * pass through with n_chars_removed counting only whitespace
    * normalization. Output: (doc_id, text_clean, n_chars_removed),
    * null html → null row values, ordered by doc_id.
    *
    * Scale shape: entirely narrow — chained codegen'd regexp_replace +
    * literal replace builtins in ONE projection at scan speed, no
    * shuffle, no UDF, no DOM allocation ([[graft.util.SparkUtil.widen]]
    * keeps the regex CPU parallel on few-file inputs). A DOM-fidelity
    * extractor (trafilatura-class boilerplate heuristics) would slot in
    * as a per-partition batch pass, but the regex form IS the
    * C4-published baseline. */
  def extractText(documents: DataFrame, htmlCol: String = "text"): DataFrame =
    graft.util.SparkUtil.widen(documents)
      .withColumn("__clean", htmlToText(col(htmlCol)))
      .select(col("doc_id"), col("__clean").as("text_clean"),
        (length(col(htmlCol)) - length(col("__clean")))
          .cast(LongType).as("n_chars_removed"))
      .orderBy("doc_id")
}
