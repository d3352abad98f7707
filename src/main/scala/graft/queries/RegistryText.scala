package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `text` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryText {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("txt_token_stats",
      (s, d) => TextAnalysis.tokenStats(t(s, d, "documents")),
      Some(s"""SELECT doc_id,
        len($toksSql) AS n_tokens,
        len(list_distinct($toksSql)) AS n_uniq_tokens,
        len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_subwords,
        n_chars,
        round(CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql), 4) AS type_token_ratio
        FROM documents ORDER BY doc_id"""), bench = true),

    QueryDef("txt_quality_scores",
      (s, d) => TextAnalysis.qualityScores(t(s, d, "documents"), stopwords),
      Some(s"""SELECT doc_id, len($toksSql) AS n_tokens,
        round(CAST(length(text) AS DOUBLE) / len($toksSql), 4) AS mean_token_len,
        round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
          / length(text), 6) AS punct_density,
        round(CAST(len(list_filter($toksSql, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)
          / len($toksSql), 4) AS stopword_ratio,
        (len($toksSql) >= 10 AND
         round(CAST(len(list_filter($toksSql, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)
          / len($toksSql), 4) >= 0.05) AS is_quality
        FROM documents ORDER BY doc_id""")),

    // Gopher-style repetition signals: duplicate bigram/trigram
    // fractions (boilerplate and generation loops score high)
    QueryDef("txt_repetition",
      (s, d) => TextAnalysis.repetitionScores(t(s, d, "documents")),
      Some {
        def gramSql(k: Int): String = {
          val parts = (0 until k).map(j => s"w[i${if (j == 0) "" else s"+$j"}]")
            .mkString(" || ' ' || ")
          s"""CASE WHEN len(w) >= $k
              THEN list_transform(range(1, len(w) - ${k - 2}), i -> $parts)
              ELSE [] END"""
        }
        def dupSql(g: String): String =
          s"""round((CASE WHEN len($g) > 0
              THEN 1.0 - CAST(len(list_distinct($g)) AS DOUBLE) / len($g)
              ELSE 0.0 END)::DOUBLE, 4)"""
        s"""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            ${dupSql("bi")} AS dup_bigram_ratio,
            ${dupSql("tri")} AS dup_trigram_ratio
          FROM (SELECT doc_id, w, ${gramSql(2)} AS bi, ${gramSql(3)} AS tri
            FROM (SELECT doc_id, $toksSql AS w FROM documents))
          ORDER BY doc_id"""
      }),

    QueryDef("txt_language_id",
      (s, d) => TextAnalysis.languageId(t(s, d, "documents"), langMarkers),
      Some {
        val lt = """regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')"""
        val score = (ws: Seq[String]) =>
          s"len(list_filter($lt, t -> list_contains(${sqlList(ws)}, t)))"
        val langs = langMarkers.toSeq.sortBy(_._1)
        val greatest = langs.map(l => score(l._2)).mkString("greatest(", ", ", ")")
        val cases = langs.map { case (lang, ws) =>
          s"WHEN ${score(ws)} = $greatest THEN '$lang'" }.mkString(" ")
        s"""SELECT doc_id, lang AS actual_lang,
          CASE $cases END AS predicted_lang,
          $greatest AS marker_hits
          FROM documents ORDER BY doc_id"""
      }),

    QueryDef("txt_top_tokens",
      (s, d) => graft.util.SparkUtil.widen(t(s, d, "documents"))
        .select(explode(TextAnalysis.bpeishTokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok")).limit(20),
      Some("""SELECT tok, count(*) AS n FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
          t -> t <> '')) AS tok FROM documents)
        GROUP BY tok ORDER BY n DESC, tok LIMIT 20""")),

    QueryDef("txt_winnowing_fingerprints",
      (s, d) => TextAnalysis.winnowingFingerprints(t(s, d, "documents")),
      Some("""WITH g AS (SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 0) + 1),
            i -> substr(md5(substr(text, i, 8)), 1, 8)) AS grams
          FROM documents),
        wfp AS (SELECT doc_id,
          CASE WHEN len(grams) >= 16 THEN
            list_distinct(list_transform(range(1, len(grams) - 15 + 1),
              j -> list_min(grams[j:j+15])))
          WHEN len(grams) > 0 THEN [list_min(grams)] ELSE NULL END AS wins
          FROM g)
        SELECT doc_id, CAST(len(wins) AS BIGINT) AS n_fingerprints,
          list_min(wins) AS min_fp, list_max(wins) AS max_fp
        FROM wfp ORDER BY doc_id""")),

    // per-source duplication rate: the fixture unions a copy of every
    // doc_id % 10 == 0 document (new ids) so the rate is non-trivial
    QueryDef("dedup_rate_by_source",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.dedupRateBySource(docs.unionByName(
          docs.filter(col("doc_id") % 10 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L)))
      },
      Some("""WITH corpus AS (
          SELECT source, text FROM documents
          UNION ALL
          SELECT source, text FROM documents WHERE doc_id % 10 = 0)
        SELECT source, count(*)::BIGINT AS n_docs,
          count(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::BIGINT AS n_unique,
          round(1.0 - count(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::DOUBLE
            / count(*), 4) AS dup_rate
        FROM corpus GROUP BY source ORDER BY source""")),

    // winnowing pair generation: substring-evidence near-dup pairs
    // (MOSS family) — docs sharing >= 2 winnow fingerprints after the
    // stop-fingerprint df cap; complements the MinHash bag-of-shingles
    // pairs with position-robust copied-substring evidence
    QueryDef("dedup_winnow_pairs",
      (s, d) => Dedup.winnowPairs(t(s, d, "documents"),
        k = 8, w = 16, minShared = 3, maxFpDf = 16),
      Some("""WITH g AS (SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 0) + 1),
            i -> substr(md5(substr(text, i, 8)), 1, 8)) AS grams
          FROM documents),
        wfp AS (SELECT doc_id,
          CASE WHEN len(grams) >= 16 THEN
            list_distinct(list_transform(range(1, len(grams) - 15 + 1),
              j -> list_min(grams[j:j+15])))
          WHEN len(grams) > 0 THEN [list_min(grams)] ELSE [] END AS wins
          FROM g),
        fp AS MATERIALIZED (SELECT doc_id, unnest(wins) AS fp FROM wfp),
        rare AS (SELECT fp FROM fp GROUP BY fp
          HAVING count(DISTINCT doc_id) <= 16),
        kept AS (SELECT fp.doc_id, fp.fp FROM fp JOIN rare USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*)::BIGINT AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3
        ORDER BY doc_a, doc_b"""),
      bench = true),

    // winnow containment: the ASYMMETRIC near-dup case (short doc
    // quoted inside a long one — low Jaccard, high containment vs the
    // short side); score = shared post-cap fingerprints / the smaller
    // doc's FULL winnow-set size, filter on the ROUNDED value
    QueryDef("dedup_containment_pairs",
      (s, d) => Dedup.containmentPairs(t(s, d, "documents"),
        k = 8, w = 16, minContainment = 0.2, maxFpDf = 16),
      Some("""WITH g AS (SELECT doc_id,
          list_transform(range(1, greatest(length(text) - 7, 0) + 1),
            i -> substr(md5(substr(text, i, 8)), 1, 8)) AS grams
          FROM documents),
        wfp AS (SELECT doc_id,
          CASE WHEN len(grams) >= 16 THEN
            list_distinct(list_transform(range(1, len(grams) - 15 + 1),
              j -> list_min(grams[j:j+15])))
          WHEN len(grams) > 0 THEN [list_min(grams)] ELSE [] END AS wins
          FROM g),
        fp AS MATERIALIZED (SELECT doc_id, unnest(wins) AS fp FROM wfp),
        sizes AS (SELECT doc_id, len(wins)::BIGINT AS n_fp FROM wfp
          WHERE len(wins) > 0),
        rare AS (SELECT fp FROM fp GROUP BY fp
          HAVING count(DISTINCT doc_id) <= 16),
        kept AS (SELECT fp.doc_id, fp.fp FROM fp JOIN rare USING (fp)),
        sh AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*)::BIGINT AS n_shared
          FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, n_shared,
          round(CAST(n_shared AS DOUBLE) / least(na.n_fp, nb.n_fp), 4)
            AS containment
        FROM sh JOIN sizes na ON na.doc_id = sh.doc_a
          JOIN sizes nb ON nb.doc_id = sh.doc_b
        WHERE round(CAST(n_shared AS DOUBLE) / least(na.n_fp, nb.n_fp), 4)
          >= 0.2
        ORDER BY doc_a, doc_b"""),
      bench = true),

    QueryDef("txt_fingerprints",
      (s, d) => TextAnalysis.fingerprints(t(s, d, "documents")),
      Some("""SELECT doc_id,
        md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        md5(text) AS raw_md5 FROM documents ORDER BY doc_id""")),

    // unigram-LM cross-entropy (the CCNet/Gopher perplexity-filter
    // shape, unigram so both engines express it): add-one-smoothed
    // −log2 p averaged per doc, model fit on the corpus itself
    QueryDef("txt_unigram_lm",
      (s, d) => TextAnalysis.unigramLogProb(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          freq AS (SELECT token, count(*)::BIGINT AS tf FROM toks GROUP BY token),
          tot AS MATERIALIZED (SELECT sum(tf)::BIGINT AS n_total, count(*)::BIGINT AS n_vocab FROM freq),
          perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
            avg(ln(tf + 1)) AS avg_ln_tf1
          FROM toks JOIN freq USING (token) GROUP BY doc_id)
          SELECT doc_id, n_tokens,
            round((ln(n_total + n_vocab) - avg_ln_tf1) / ln(2.0), 4) AS bits_per_token
          FROM perdoc CROSS JOIN tot ORDER BY doc_id"""
      }, bench = true),

    // Heaps-law vocabulary growth: distinct vs total n-grams, n = 1..4,
    // one tagged explode + two-level combinable count
    QueryDef("txt_vocab_growth",
      (s, d) => TextAnalysis.vocabGrowth(t(s, d, "documents"), 4),
      Some("""WITH w AS (SELECT regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS w
          FROM documents WHERE text IS NOT NULL),
        g AS (
          SELECT 1 AS n, unnest(w) AS gram FROM w
          UNION ALL SELECT 2, unnest([array_to_string(w[i:i+1], ' ')
            FOR i IN range(1, len(w))]) FROM w WHERE len(w) >= 2
          UNION ALL SELECT 3, unnest([array_to_string(w[i:i+2], ' ')
            FOR i IN range(1, len(w) - 1)]) FROM w WHERE len(w) >= 3
          UNION ALL SELECT 4, unnest([array_to_string(w[i:i+3], ' ')
            FOR i IN range(1, len(w) - 2)]) FROM w WHERE len(w) >= 4)
        SELECT n::BIGINT AS n, count(*)::BIGINT AS n_total,
          count(DISTINCT gram)::BIGINT AS n_distinct,
          round(count(DISTINCT gram)::DOUBLE / count(*), 6) AS ttr
        FROM g GROUP BY n ORDER BY n"""),
      bench = true),

    // tokenizer fertility / compression per language: one combinable
    // lang groupBy, bpeish subwords as the deterministic proxy
    QueryDef("txt_fertility",
      (s, d) => TextAnalysis.tokenizerFertility(t(s, d, "documents")),
      Some {
        val w = s"coalesce(len($toksSql), 0)"
        val b = "coalesce(len(list_filter(regexp_split_to_array(lower(text), " +
          "'[^a-z0-9]+'), t -> t <> '')), 0)"
        val c = "coalesce(length(text), 0)"
        s"""SELECT lang, count(*)::BIGINT AS n_docs,
          sum($w)::BIGINT AS n_words, sum($b)::BIGINT AS n_subwords,
          CASE WHEN sum($w) > 0
            THEN round(sum($b)::DOUBLE / sum($w), 4) END AS fertility,
          CASE WHEN sum($b) > 0
            THEN round(sum($c)::DOUBLE / sum($b), 4) END AS chars_per_subword
        FROM documents GROUP BY lang ORDER BY lang NULLS FIRST"""
      }, bench = true),

    // two-pass Misra-Gries heavy hitters: output = EXACTLY the tokens
    // with cnt*(k+1) > N at k=40 — the oracle derives that set from
    // full counts, so a hash match proves the MG survival guarantee
    QueryDef("txt_frequent_tokens",
      (s, d) => TextAnalysis.frequentTokens(t(s, d, "documents"), 40),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT unnest($toksSql) AS token FROM documents),
          tc AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
          tot AS MATERIALIZED (SELECT sum(cnt)::BIGINT AS n FROM tc)
          SELECT token, cnt, round(cnt::DOUBLE / n, 6) AS share
          FROM tc CROSS JOIN tot WHERE cnt * 41 > n
          ORDER BY cnt DESC, token"""
      }, bench = true),

    // CCNet head/middle/tail perplexity bucketing per source: rank the
    // ROUNDED unigram-LM score within each source (doc_id tie-break),
    // bucket = ((rank-1)*3) div n — integer math, exact in both engines
    QueryDef("txt_perplexity_buckets",
      (s, d) => TextAnalysis.perplexityBuckets(t(s, d, "documents"), 3),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          freq AS (SELECT token, count(*)::BIGINT AS tf FROM toks GROUP BY token),
          tot AS MATERIALIZED (SELECT sum(tf)::BIGINT AS n_total, count(*)::BIGINT AS n_vocab FROM freq),
          perdoc AS (SELECT doc_id, avg(ln(tf + 1)) AS avg_ln_tf1
            FROM toks JOIN freq USING (token) GROUP BY doc_id),
          sc AS (SELECT p.doc_id, d.source,
              round((ln(t.n_total + t.n_vocab) - p.avg_ln_tf1) / ln(2.0), 4)
                AS bits_per_token
            FROM perdoc p CROSS JOIN tot t JOIN documents d ON d.doc_id = p.doc_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY bits_per_token, doc_id) AS rk,
            count(*) OVER (PARTITION BY source) AS n FROM sc)
          SELECT doc_id, source, bits_per_token,
            (((rk - 1) * 3) // n)::BIGINT AS bucket
          FROM r ORDER BY doc_id"""
      }, bench = true),

    // TRAINED quality classifier (fastText-shape logistic regression
    // over hashed binary presence features, full-batch treeAggregate
    // GD, ridge l2=0.001, md5-split 1-in-5 holdout with best-epoch
    // selection): the fixture plants a marker token on the positive
    // class in-plan, so the seed-labeled corpus is linearly separable
    // up to hash collisions — the oracled surface is exact class
    // counts, the EXACT holdout size (the md5 split is the same
    // arithmetic in both engines), and partition-stable quality
    // booleans (whole-corpus acc >= 0.95, mean-prob separation >= 0.5,
    // holdout acc >= 0.95; trained weights themselves are
    // float-sum-order-dependent, the recall-panel discipline)
    QueryDef("txt_classifier_train",
      (s, d) => {
        val docs = t(s, d, "documents")
        val forged = docs.withColumn("text",
          when(col("doc_id") % 3 === 0 && col("text").isNotNull,
            concat(col("text"), lit(" qualmarker qualmarker qualmarker")))
            .otherwise(col("text")))
        TextAnalysis.classifierTrainReport(forged, col("doc_id") % 3 === 0,
          l2 = 0.001, holdoutMod = 5)
      },
      Some("""SELECT count(CASE WHEN doc_id % 3 = 0 THEN 1 END)::BIGINT AS n_pos,
          count(CASE WHEN doc_id % 3 <> 0 THEN 1 END)::BIGINT AS n_neg,
          count(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 5 = 0
            THEN 1 END)::BIGINT AS n_holdout,
          TRUE AS acc_ok, TRUE AS sep_ok, TRUE AS holdout_acc_ok
        FROM documents WHERE text IS NOT NULL"""),
      bench = true),

    // Okapi BM25 against a fixed query term set (retrieval-based
    // filtering). Float constants are injected from the SAME Scala
    // doubles the operator uses, cast from their round-trip string
    // form — both engines then compute with bit-identical constants
    QueryDef("txt_bm25_scores",
      (s, d) => TextAnalysis.bm25Scores(t(s, d, "documents"), bm25Terms),
      Some {
        import TextAnalysis.{Bm25K1, Bm25B}
        val c1 = s"CAST('${Bm25K1 + 1}' AS DOUBLE)" // k1 + 1
        val ck = s"CAST('$Bm25K1' AS DOUBLE)"       // k1
        val c2 = s"CAST('${1 - Bm25B}' AS DOUBLE)"  // 1 − b
        val cb = s"CAST('$Bm25B' AS DOUBLE)"        // b
        val inList = bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          dl AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
          stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
          matched AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks
            WHERE token IN $inList GROUP BY doc_id, token),
          dfs AS (SELECT token, count(*)::BIGINT AS df FROM matched GROUP BY token)
          SELECT doc_id, count(*)::BIGINT AS n_matched_terms,
            round(sum(ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
              * tf * $c1 / (tf + $ck * ($c2 + $cb * dl / avgdl))), 4) AS bm25
          FROM matched JOIN dfs USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY doc_id ORDER BY doc_id"""
      }),

    // DSIR importance weights (hashed-unigram target-vs-raw LLR; the
    // data-selection scorer). Target slice = lang='en'. The oracle
    // mirrors the exact arithmetic order: avg of per-token
    // ln(cnt_tgt+1)−ln(cnt_raw+1), smoothing scalar applied above the
    // per-doc aggregate
    QueryDef("txt_importance_weights",
      (s, d) => TextAnalysis.importanceWeights(
        t(s, d, "documents"), col("lang") === "en", 256),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_target,
            unnest($toksSql) AS token FROM documents),
          tb AS (SELECT doc_id, is_target,
            (('0x' || substr(md5(token), 1, 8))::BIGINT % 256) AS bucket FROM toks),
          counts AS (SELECT bucket, count(*)::BIGINT AS cnt_raw,
            sum(is_target)::BIGINT AS cnt_tgt FROM tb GROUP BY bucket),
          totals AS (SELECT sum(cnt_raw)::BIGINT AS n_raw,
            sum(cnt_tgt)::BIGINT AS n_tgt FROM counts),
          perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
            avg(ln(cnt_tgt + 1) - ln(cnt_raw + 1)) AS avg_w
            FROM tb JOIN counts USING (bucket) GROUP BY doc_id)
          SELECT doc_id, n_tokens,
            round(avg_w + ln(n_raw + 256) - ln(n_tgt + 256), 4) + 0 AS log_ratio
          FROM perdoc CROSS JOIN totals ORDER BY doc_id"""
      }, bench = true),

    // hashing-trick linear classifier (fastText shape): bucket →
    // formulaic weight, logit = mean weight, sigmoid. Entirely narrow —
    // the scan-speed ceiling for a classifier pass
    QueryDef("txt_hash_classifier",
      (s, d) => TextAnalysis.hashClassifierScore(t(s, d, "documents"), 256),
      Some {
        s"""SELECT doc_id, n_tokens,
            round(1.0 / (1.0 + exp(-logit)), 4) AS p_keep,
            logit >= 0 AS is_kept
          FROM (SELECT doc_id, len(w)::BIGINT AS n_tokens,
            list_sum(list_transform(w, t ->
              ((('0x' || substr(md5(t), 1, 8))::BIGINT % 256) * 2654435761 % 1001)
                / 500.0 - 1.0)) / len(w) AS logit
            FROM (SELECT doc_id, $toksSql AS w FROM documents))
          ORDER BY doc_id"""
      }),

    // conditional bigram LM (add-one smoothed p(w2|w1), V = distinct
    // continuations): the two-token deepening of txt_unigram_lm —
    // word salads score high even when every word is common
    QueryDef("txt_bigram_lm",
      (s, d) => TextAnalysis.bigramLogProb(t(s, d, "documents")),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
            FROM w WHERE len(w) >= 2),
          c12 AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
          c1 AS MATERIALIZED (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1),
          v AS MATERIALIZED (SELECT count(DISTINCT w2)::BIGINT AS v FROM c12)
          SELECT doc_id, count(*)::BIGINT AS n_bigrams,
            round(avg(ln(c1 + v) - ln(c12 + 1)) / ln(2.0), 4) AS bits_per_bigram
          FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
          GROUP BY doc_id ORDER BY doc_id"""
      }, bench = true),

    // vocabulary coverage vs the corpus top-16 tokens (count DESC,
    // token ASC tie-break — the k-th seat is deterministic both
    // engines): the tokenizer-fit / OOV-rate check. k=16 < the
    // synthetic corpus's 31-token vocabulary so the OOV path is
    // genuinely exercised (k=100 would cover everything → all-zero)
    QueryDef("txt_vocab_coverage",
      (s, d) => TextAnalysis.vocabCoverage(t(s, d, "documents"), 16),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS token FROM documents),
          vocab AS (SELECT token FROM (SELECT token, count(*) AS cnt FROM toks
            GROUP BY token ORDER BY cnt DESC, token LIMIT 16)),
          perdoc AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
            sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
            FROM toks LEFT JOIN vocab v ON toks.token = v.token GROUP BY doc_id)
          SELECT doc_id, n_tokens, n_oov,
            round(CAST(n_oov AS DOUBLE) / n_tokens, 4) AS oov_rate
          FROM perdoc ORDER BY doc_id"""
      }),

    // per-source characteristic terms (TF-IDF top-5). Ranking key is
    // the ROUNDED score + token tie-break so both engines rank
    // identical values; Spark side ranks via the skew-safe rankByKey
    // (no per-source window funnel), oracle via the plain window
    QueryDef("txt_tfidf_terms",
      (s, d) => TextAnalysis.tfidfTopTerms(t(s, d, "documents"), 5),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token FROM documents),
          tf AS MATERIALIZED (SELECT source, token, count(*)::BIGINT AS tf FROM toks
            GROUP BY source, token),
          dfs AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
          ns AS (SELECT count(DISTINCT source)::BIGINT AS n_sources FROM tf),
          scored AS (SELECT source, token, tf, df,
            round(tf * ln((CAST(n_sources AS DOUBLE) + 1) / (df + 1)), 4) AS tfidf
            FROM tf JOIN dfs USING (token) CROSS JOIN ns),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY tfidf DESC, token) AS rk FROM scored)
          SELECT source, token, tf, df, tfidf, rk::BIGINT AS rk
          FROM ranked WHERE rk <= 5 ORDER BY source, rk"""
      }),

    // Zipf fit: per-source OLS slope of ln(freq) on ln(rank) — the
    // corpus-health panel (natural language ≈ −1); the tie-broken
    // row_number rank matches rankByKey's total order
    QueryDef("txt_zipf_slope",
      (s, d) => TextAnalysis.zipfSlope(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token FROM documents),
          tf AS MATERIALIZED (SELECT source, token, count(*) AS cnt FROM toks
            GROUP BY source, token),
          r AS (SELECT source, cnt, row_number() OVER (PARTITION BY source
            ORDER BY cnt DESC, token) AS rk FROM tf)
          SELECT source, count(*)::BIGINT AS vocab,
            round(covar_pop(ln(rk), ln(cnt)) / var_pop(ln(rk)), 4) + 0.0
              AS zipf_slope
          FROM r GROUP BY source HAVING count(*) >= 2 ORDER BY source"""
      }),

    // boilerplate 3-gram mining: top-20 word shingles by DOCUMENT
    // frequency (per-doc distinct BEFORE the explode), df >= 2; the
    // global cut is a TakeOrderedAndProject heap on the total order
    // (df DESC, gram) both engines share
    QueryDef("txt_boilerplate_ngrams",
      (s, d) => TextAnalysis.boilerplateNgrams(t(s, d, "documents"), 2, 20),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(${shinglesSql("w")}))
            AS gram FROM w),
          d AS (SELECT gram, count(*)::BIGINT AS df FROM sh GROUP BY gram)
          SELECT gram, df FROM d WHERE df >= 2
          ORDER BY df DESC, gram LIMIT 20"""
      }, bench = true),

    // per-doc n-gram novelty: share of a doc's distinct 3-shingles
    // with corpus df = 1 (templated-content detector; the doc-grain
    // complement of the boilerplate miner); shingle-less docs emit no
    // row, matching the shingle convention
    QueryDef("txt_ngram_novelty",
      (s, d) => TextAnalysis.ngramNovelty(t(s, d, "documents")),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(${shinglesSql("w")}))
            AS gram FROM w),
          d AS (SELECT gram, count(*)::BIGINT AS df FROM sh GROUP BY gram)
          SELECT sh.doc_id, count(*)::BIGINT AS n_grams,
            sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
            round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE /
              count(*), 4) AS novelty
          FROM sh JOIN d USING (gram)
          GROUP BY sh.doc_id ORDER BY doc_id"""
      }, bench = true),

    // PMI collocations, hardened (VERDICT r9 §1): the hashed output is
    // the exactly-representable LIFT ratio (integer-count products +
    // one division — IEEE-correctly-rounded, bit-identical on any
    // engine build), never ln (libm last-ulp drift); ordering only on
    // the ROUNDED score (same ranking — ln is monotone)
    QueryDef("txt_collocations_pmi",
      (s, d) => TextAnalysis.collocationsPmi(t(s, d, "documents")),
      Some {
        s"""WITH d AS (SELECT $toksSql AS t FROM documents
            WHERE text IS NOT NULL AND len($toksSql) >= 2),
          tok AS (SELECT unnest(t) AS w FROM d),
          uni AS MATERIALIZED (SELECT w, count(*) AS cu FROM tok GROUP BY w),
          tu AS (SELECT sum(cu)::DOUBLE AS tot_u FROM uni),
          bx AS (SELECT t, unnest(range(1, len(t))) AS i FROM d),
          big AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM bx),
          bc AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
          tb AS (SELECT sum(cb)::DOUBLE AS tot_b FROM bc)
          SELECT bc.w1, bc.w2, bc.cb::BIGINT AS n,
            round((bc.cb::DOUBLE * tot_u * tot_u) /
              (tot_b * u1.cu * u2.cu), 4) AS lift
          FROM bc CROSS JOIN tu CROSS JOIN tb
          JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w
          WHERE bc.cb >= 5
          ORDER BY lift DESC, w1, w2"""
      }, bench = true),

    // Burrows' Delta stylometric source distance: z-scores of the
    // top-10 function-word frequencies across the dense word x source
    // grid (absent word = freq 0; zero-variance word = z 0)
    QueryDef("txt_stylometry_delta",
      (s, d) => TextAnalysis.stylometryDelta(t(s, d, "documents")),
      Some {
        s"""WITH tok AS (SELECT source, unnest($toksSql) AS w
            FROM documents WHERE text IS NOT NULL),
          sw AS MATERIALIZED (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
          tot AS MATERIALIZED (SELECT source, sum(c) AS tot FROM sw GROUP BY source),
          gl AS (SELECT w, sum(c) AS gc FROM sw GROUP BY w),
          fw AS (SELECT w FROM gl ORDER BY gc DESC, w LIMIT 10),
          grid AS (SELECT fw.w, t.source,
              coalesce(sw.c, 0)::DOUBLE / t.tot AS f
            FROM fw CROSS JOIN tot t
            LEFT JOIN sw ON sw.w = fw.w AND sw.source = t.source),
          st AS MATERIALIZED (SELECT w, avg(f) AS mu, stddev_pop(f) AS sd
            FROM grid GROUP BY w),
          z AS MATERIALIZED (SELECT g.source, g.w,
              CASE WHEN st.sd > 0 THEN (g.f - st.mu) / st.sd
                ELSE 0.0 END AS z
            FROM grid g JOIN st USING (w))
          SELECT a.source AS source_a, b.source AS source_b,
            round(avg(abs(a.z - b.z)), 4) AS delta,
            count(*)::BIGINT AS n_words
          FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2 ORDER BY source_a, source_b"""
      }, bench = true),

    // char-trigram language ID (CLD-style self-trained profiles):
    // integer occurrence scoring, argmax with lang tiebreak, confusion
    // matrix output; DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all default
    QueryDef("txt_langid_trigram",
      (s, d) => TextAnalysis.trigramLangId(t(s, d, "documents")),
      Some("""WITH d AS (SELECT doc_id, lang,
            regexp_replace(lower(trim(text)), '[ \t\n\x0B\f\r]+', '_', 'g') AS s
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        dd AS (SELECT doc_id, lang, s FROM d WHERE length(s) >= 3),
        tg AS MATERIALIZED (SELECT doc_id, lang,
            unnest(list_transform(range(1, length(s) - 1),
              i -> substr(s, i, 3))) AS tg
          FROM dd),
        cnt AS (SELECT lang, tg, count(*) AS c FROM tg GROUP BY 1, 2),
        prof AS (SELECT lang AS plang, tg FROM
          (SELECT *, row_number() OVER (PARTITION BY lang
              ORDER BY c DESC, tg) AS rk FROM cnt)
          WHERE rk <= 50),
        sc AS (SELECT t.doc_id, t.lang, p.plang, count(*) AS score
          FROM tg t JOIN prof p USING (tg) GROUP BY 1, 2, 3),
        pick AS (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, plang) AS rk FROM sc)
        SELECT lang AS actual_lang, plang AS predicted_lang,
          count(*)::BIGINT AS n_docs
        FROM pick WHERE rk = 1
        GROUP BY 1, 2 ORDER BY actual_lang, predicted_lang"""),
      bench = true),

    // Flesch readability over forged sentence terminators (the shared
    // corpus_chunk_sentences scaffold); exact integer counts, one
    // fixed per-row double formula
    QueryDef("txt_readability",
      (s, d) => TextAnalysis.readability(forgeSentences(t(s, d, "documents"))),
      Some {
        s"""WITH $forgedSentencesCte,
          s1 AS (SELECT doc_id,
              list_filter(list_transform(
                regexp_split_to_array(trim(text), '[.!?][ \\t\\n\\x0B\\f\\r]+'),
                x -> regexp_replace(x, '[.!?]+$$', '')), x -> x <> '') AS ss,
              regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tk
            FROM b WHERE text IS NOT NULL),
          m AS (SELECT doc_id, len(ss) AS n_sentences, len(tk) AS n_words,
              list_sum(list_transform(tk, w -> greatest(1,
                len(regexp_extract_all(lower(w), '[aeiou]+')))))::BIGINT
                AS n_syllables
            FROM s1 WHERE len(ss) > 0)
          , m2 AS (SELECT doc_id, n_sentences, n_words, n_syllables,
              206835::BIGINT * n_sentences * n_words
                - 1015::BIGINT * n_words * n_words
                - 84600::BIGINT * n_syllables * n_sentences AS rnum,
              1000::BIGINT * n_sentences * n_words AS rden
            FROM m)
          SELECT doc_id, n_sentences::BIGINT AS n_sentences,
            n_words::BIGINT AS n_words, n_syllables,
            (CASE WHEN rnum >= 0 THEN (200 * rnum + rden) // (2 * rden)
              ELSE -((200 * -rnum + rden) // (2 * rden)) END)::DOUBLE
              / 100.0::DOUBLE AS flesch
          FROM m2 ORDER BY doc_id"""
      }, bench = true),

    // OOV-vs-vocab-size curve: skew-safe constant-key global type rank,
    // one conditional-sum pass for all candidates, exact permille
    QueryDef("txt_oov_curve",
      (s, d) => TextAnalysis.oovCurve(t(s, d, "documents"), oovVocabSizes),
      Some {
        val vs = oovVocabSizes.mkString("[", ", ", "]")
        s"""WITH toks AS MATERIALIZED (SELECT unnest($toksSql) AS token
            FROM documents WHERE text IS NOT NULL),
          c AS (SELECT token, count(*)::BIGINT AS cnt
            FROM toks GROUP BY token),
          r AS MATERIALIZED (SELECT token, cnt,
              row_number() OVER (ORDER BY cnt DESC, token) AS rk FROM c),
          t AS (SELECT count(*)::BIGINT AS n_types,
              sum(cnt)::BIGINT AS total FROM r),
          v AS (SELECT unnest($vs) AS vocab_size),
          cov AS (SELECT v.vocab_size,
              coalesce(sum(CASE WHEN r.rk <= v.vocab_size
                THEN r.cnt END), 0)::BIGINT AS covered
            FROM v CROSS JOIN r GROUP BY 1)
          SELECT vocab_size::BIGINT AS vocab_size, n_types,
            total AS total_tokens, covered AS covered_tokens,
            ((1000 * (total - covered)) // total)::BIGINT AS oov_permille
          FROM cov CROSS JOIN t WHERE total > 0 ORDER BY vocab_size"""
      }, bench = true),

    // sentence-length burstiness (index of dispersion): exact integer
    // permille over the readability sentence scaffold
    QueryDef("txt_burstiness",
      (s, d) => TextAnalysis.burstiness(forgeSentences(t(s, d, "documents"))),
      Some {
        s"""WITH $forgedSentencesCte,
          s1 AS (SELECT doc_id,
              list_filter(list_transform(
                regexp_split_to_array(trim(text), '[.!?][ \\t\\n\\x0B\\f\\r]+'),
                x -> regexp_replace(x, '[.!?]+$$', '')), x -> x <> '') AS ss
            FROM b WHERE text IS NOT NULL),
          xs AS (SELECT doc_id,
              len(regexp_split_to_array(trim(unnest(ss)),
                '[ \\t\\n\\x0B\\f\\r]+'))::BIGINT AS x
            FROM s1 WHERE len(ss) > 0),
          g AS (SELECT doc_id, count(*)::BIGINT AS n_sentences,
              sum(x)::BIGINT AS n_words, sum(x * x)::BIGINT AS q
            FROM xs GROUP BY doc_id)
          SELECT doc_id, n_sentences, n_words,
            ((1000 * (n_sentences * q - n_words * n_words))
              // (n_sentences * n_words))::BIGINT AS vmr_permille
          FROM g ORDER BY doc_id"""
      }, bench = true),

    // weighted-lexicon scoring: broadcast LEFT join over exploded
    // tokens, exact integer-permille normalization; lexicon injected
    // from ONE Scala value on both sides
    QueryDef("txt_lexicon_score",
      (s, d) => TextAnalysis.lexiconScore(t(s, d, "documents"),
        scoringLexicon),
      Some {
        val rows = scoringLexicon
          .map { case (tk, w) => s"('$tk', $w)" }.mkString(", ")
        s"""WITH toks AS MATERIALIZED (SELECT doc_id,
              unnest($toksSql) AS token
            FROM documents WHERE text IS NOT NULL),
          lex AS (SELECT * FROM (VALUES $rows) v(token, weight)),
          j AS (SELECT t.doc_id, l.weight
            FROM toks t LEFT JOIN lex l ON t.token = l.token),
          g AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
              sum(CASE WHEN weight IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                AS lex_hits,
              coalesce(sum(weight), 0)::BIGINT AS wsum
            FROM j GROUP BY doc_id)
          SELECT doc_id, n_tokens, lex_hits, wsum,
            (CASE WHEN wsum >= 0
              THEN (2000 * wsum + n_tokens) // (2 * n_tokens)
              ELSE -((2000 * -wsum + n_tokens) // (2 * n_tokens))
              END)::BIGINT AS score_permille
          FROM g ORDER BY doc_id"""
      }, bench = true))
}
