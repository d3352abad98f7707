package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `corpus` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryCorpus {
  val defs: Seq[QueryDef] = Seq(
    // dedup survivors ∩ quality gate ∩ language allowlist — the final
    // keep set of a corpus build, composed from the already-oracled
    // fingerprint and quality heuristics
    QueryDef("corpus_select",
      (s, d) => CorpusOps.corpusSelect(t(s, d, "documents"),
        stopwords, corpusLangs),
      Some {
        s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))),
          q AS MATERIALIZED (SELECT doc_id, lang, source, len($toksSql) AS n_tokens,
            round(CAST(len(list_filter($toksSql, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)
              / len($toksSql), 4) AS stopword_ratio
            FROM documents)
          SELECT doc_id, lang, source, n_tokens FROM q
          WHERE doc_id IN (SELECT doc_id FROM keep)
            AND n_tokens >= 10 AND stopword_ratio >= 0.05
            AND lang IN ${sqlList(corpusLangs).replace("[", "(").replace("]", ")")}
          ORDER BY doc_id"""
      }, bench = true),

    // deterministic hash sampling per language (domain mixing): keep iff
    // u32(md5(salt:doc_id)) < rate * 2^32 — no rand(), engine-portable
    QueryDef("corpus_stratified_sample",
      (s, d) => CorpusOps.stratifiedSample(t(s, d, "documents"),
        sampleRates.toMap, "mix1"),
      Some {
        // thresholds precomputed by the SAME Scala floor as the Spark
        // side — an independently-evaluated float rate*2^32 diverges on
        // non-dyadic rates (truncate vs round-to-nearest)
        val thrCase = "CASE lang " + sampleRates.map { case (l, r) =>
          s"WHEN '$l' THEN ${CorpusOps.sampleThreshold(r)}" }.mkString(" ") +
          s" ELSE ${CorpusOps.sampleThreshold(1.0)} END"
        s"""SELECT doc_id, lang, source FROM documents
          WHERE ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            < $thrCase
          ORDER BY doc_id"""
      }),

    // per-source token budget: running total in doc_id order, cut at B
    QueryDef("corpus_token_budget",
      (s, d) => CorpusOps.tokenBudget(t(s, d, "documents"), 800L),
      Some {
        s"""SELECT doc_id, source, n_tokens, cum_tokens FROM (
            SELECT doc_id, source, len($toksSql) AS n_tokens,
              CAST(sum(len($toksSql)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE cum_tokens <= 800 ORDER BY doc_id"""
      }, bench = true),

    // benchmark decontamination: docs sharing any 3-shingle with the
    // eval split (doc_id % 50 = 0) are dropped from the training split
    QueryDef("corpus_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        CorpusOps.decontaminate(docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), 3)
      },
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
          eg AS (SELECT DISTINCT unnest(${shinglesSql("w")}) AS gram
            FROM toks WHERE doc_id % 50 = 0),
          dg AS (SELECT doc_id, unnest(${shinglesSql("w")}) AS gram
            FROM toks WHERE doc_id % 50 <> 0),
          bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN eg USING (gram))
          SELECT doc_id, lang, source FROM documents
          WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id"""
      }, bench = true),

    // contamination scoring: per-doc fraction of DISTINCT 3-shingles
    // present in the eval split (the audit report behind the
    // decontaminate threshold choice); zero-shingle docs score 0.0
    QueryDef("corpus_contamination_score",
      (s, d) => {
        val docs = t(s, d, "documents")
        CorpusOps.contaminationScore(docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), 3)
      },
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM documents),
          eg AS (SELECT DISTINCT unnest(${shinglesSql("w")}) AS gram
            FROM toks WHERE doc_id % 50 = 0),
          dg AS (SELECT doc_id, unnest(list_distinct(${shinglesSql("w")})) AS gram
            FROM toks WHERE doc_id % 50 <> 0),
          hits AS (SELECT dg.doc_id, count(*) AS n_grams,
              count(eg.gram) AS n_hit
            FROM dg LEFT JOIN eg ON dg.gram = eg.gram GROUP BY dg.doc_id)
          SELECT t.doc_id,
            coalesce(n_grams, 0)::BIGINT AS n_grams,
            coalesce(n_hit, 0)::BIGINT AS n_hit,
            round(CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
              ELSE n_hit::DOUBLE / n_grams END, 4) AS contamination
          FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) t
          LEFT JOIN hits USING (doc_id)
          ORDER BY doc_id"""
      }),

    // snapshot diff: the old snapshot is `documents`; the new one
    // deterministically removes doc_id % 13 == 0, rewrites the text of
    // doc_id % 17 == 0, and adds doc_id + 1000000 for doc_id % 11 == 0
    QueryDef("corpus_snapshot_diff",
      (s, d) => {
        val docs = t(s, d, "documents")
        val newer = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text", when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
          .unionByName(docs.filter(col("doc_id") % 11 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        CorpusOps.snapshotDiff(docs, newer)
      },
      Some("""WITH newdocs AS (
          SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
            ELSE text END AS text
          FROM documents WHERE doc_id % 13 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0),
        o AS (SELECT doc_id, md5(text) AS old_md5, TRUE AS in_old
          FROM documents),
        n AS MATERIALIZED (SELECT doc_id, md5(text) AS new_md5, TRUE AS in_new
          FROM newdocs),
        j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
            old_md5, new_md5, in_old, in_new
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        SELECT doc_id,
          CASE WHEN in_old IS NULL THEN 'added'
            WHEN in_new IS NULL THEN 'removed'
            WHEN old_md5 IS DISTINCT FROM new_md5 THEN 'changed'
            ELSE 'unchanged' END AS status,
          old_md5, new_md5
        FROM j
        WHERE in_old IS NULL OR in_new IS NULL
          OR old_md5 IS DISTINCT FROM new_md5
        ORDER BY doc_id"""),
      bench = true),

    // char-bigram entropy: statistical-junk detector; the oracle
    // mirrors the exact scalar-applied-once arithmetic
    QueryDef("txt_char_entropy",
      (s, d) => TextAnalysis.charEntropy(t(s, d, "documents")),
      Some("""WITH b AS (SELECT doc_id,
          unnest(list_transform(range(1, length(text)),
            i -> substr(text, i, 2))) AS g
          FROM documents WHERE length(text) >= 2),
        c AS MATERIALIZED (SELECT doc_id, g, count(*) AS c FROM b GROUP BY doc_id, g),
        e AS MATERIALIZED (SELECT doc_id, sum(c)::BIGINT AS nb,
          round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(2), 4) + 0.0 AS h
          FROM c GROUP BY doc_id)
        SELECT d.doc_id, coalesce(nb, 0)::BIGINT AS n_bigrams,
          coalesce(h, 0.0) AS entropy_bits
        FROM documents d LEFT JOIN e USING (doc_id)
        ORDER BY doc_id"""),
      bench = true),

    // BPE first-merge statistics: top-20 within-word adjacent char
    // pairs (the corpus-scan step the merge loop repeats)
    QueryDef("txt_bpe_pairs",
      (s, d) => TextAnalysis.bpePairCounts(t(s, d, "documents"), 20),
      Some("""WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS w
          FROM documents),
        p AS (SELECT unnest(list_transform(range(1, length(w)),
          i -> substr(w, i, 2))) AS pair FROM w WHERE length(w) >= 2)
        SELECT pair, count(*)::BIGINT AS n FROM p
        GROUP BY pair ORDER BY n DESC, pair LIMIT 20"""),
      bench = true),

    // BPE merge APPLICATION — encode every doc with the pinned merge
    // table (8 bounded rounds = fixpoint at this corpus's max word
    // length 8; ONE merge per round, exactly unrolled as chained CTE
    // pairs below — the dedup_pagerank pattern). The rank CASE chain
    // is generated from the same Scala Seq the Spark expression gets:
    // zero literal drift.
    QueryDef("txt_bpe_apply",
      (s, d) => TextAnalysis.bpeApply(t(s, d, "documents"), bpeMerges, 8),
      Some {
        val rankCase = bpeMerges.zipWithIndex.map { case ((l, r), k) =>
          s"WHEN toks[i] = '$l' AND toks[i+1] = '$r' THEN $k*10000 + i"
        }.mkString("CASE ", " ", " ELSE NULL END")
        val best =
          s"list_min(list_transform(range(1, len(toks)), i -> $rankCase))"
        val rounds = (1 to 8).map { k =>
          s"""s$k AS (SELECT doc_id, wl,
              list_transform(wl, toks -> $best) AS b FROM r${k - 1}),
            r$k AS (SELECT doc_id, list_transform(range(1, len(wl)+1), wi ->
              CASE WHEN b[wi] IS NULL THEN wl[wi]
              ELSE list_concat(list_concat(wl[wi][1:(b[wi]%10000)-1],
                [wl[wi][b[wi]%10000] || wl[wi][b[wi]%10000+1]]),
                wl[wi][(b[wi]%10000)+2:]) END) AS wl FROM s$k)"""
        }.mkString(",\n")
        s"""WITH r0 AS (SELECT doc_id,
            list_transform(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
              w -> list_transform(range(1, length(w)+1), i -> w[i:i])) AS wl
            FROM documents WHERE text IS NOT NULL),
          $rounds
          SELECT doc_id,
            coalesce(array_to_string(flatten(wl), ' '), '') AS bpe_text,
            len(flatten(wl))::BIGINT AS n_pieces, len(wl)::BIGINT AS n_words
          FROM r8 ORDER BY doc_id"""
      }, bench = true),

    // BPE merge TRAINING — the Sennrich loop producing the list
    // txt_bpe_apply spends: 8 rounds, each = weighted adjacent-pair
    // argmax (count DESC, then lexicographic — a total order) over the
    // word-frequency vocab + greedy left-to-right fold of the winner.
    // Oracle: rounds unrolled as CTE pairs over a WRAPPED symbol
    // string ('|a||b||c|' — every symbol carries its own delimiters,
    // so plain replace() has exactly the fold's token-level resume-
    // after-match semantics: no cross-symbol false match, no consumed
    // shared boundary).
    QueryDef("txt_bpe_train",
      (s, d) => TextAnalysis.bpeTrainReport(t(s, d, "documents"), 8),
      Some {
        val rounds = (1 to 8).map { k =>
          s"""p$k AS MATERIALIZED (SELECT a, b, n FROM (
              SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS n
              FROM (SELECT freq, string_split(trim(w, '|'), '||') AS syms,
                      unnest(range(1, len(string_split(trim(w, '|'), '||')))) AS i
                    FROM v${k - 1})
              GROUP BY 1, 2)
            ORDER BY n DESC, a, b LIMIT 1),
          v$k AS MATERIALIZED (SELECT v.freq,
              replace(v.w, '|' || p.a || '||' || p.b || '|',
                '|' || p.a || p.b || '|') AS w
            FROM v${k - 1} v, p$k p)"""
        }.mkString(",\n")
        val unions = (1 to 8).map(k =>
          s"SELECT ${k - 1}::BIGINT AS rank, a AS lhs, b AS rhs, n FROM p$k")
          .mkString(" UNION ALL ")
        s"""WITH v0 AS MATERIALIZED (SELECT
            '|' || array_to_string(list_transform(range(1, length(w) + 1),
              i -> w[i]), '||') || '|' AS w,
            count(*)::BIGINT AS freq
          FROM (SELECT unnest(list_filter(
              regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS w
            FROM documents WHERE text IS NOT NULL)
          GROUP BY 1),
          $rounds
          SELECT * FROM ($unions) ORDER BY rank"""
      }, bench = true),

    // BATCHED BPE merge training — the scale path (k merges per
    // round, each round ONE corpus-vocab pass): greedy top-k selection
    // under the non-interaction constraint ({a, b, a||b} disjoint
    // from every earlier pick's {lhs, rhs, lhs||rhs}), so the batch
    // is exactly k independent Sennrich merges against the round-start
    // vocab and the oracle's chained replace() over the wrapped
    // encoding mirrors the single simultaneous fold. 3 rounds × k=3
    // unrolled: per round one pair-count CTE, three pick CTEs (each
    // NOT IN the earlier picks' symbol/product strings), one
    // triple-replace vocab CTE.
    QueryDef("txt_bpe_train_batched",
      (s, d) => TextAnalysis.bpeTrainBatchedReport(t(s, d, "documents"), 3, 3),
      Some {
        val rounds = (1 to 3).map { k =>
          val picks = (1 to 3).map { j =>
            if (j == 1)
              s"""p${k}_1 AS MATERIALIZED (SELECT a, b, n FROM c$k
                ORDER BY n DESC, a, b LIMIT 1)"""
            else {
              val priors = (1 until j).map(i => s"p${k}_$i q$i").mkString(", ")
              val f = (1 until j).map { i =>
                s"""c.a NOT IN (q$i.a, q$i.b, q$i.a||q$i.b)
                  AND c.b NOT IN (q$i.a, q$i.b, q$i.a||q$i.b)
                  AND c.a||c.b NOT IN (q$i.a, q$i.b, q$i.a||q$i.b)"""
              }.mkString(" AND ")
              s"""p${k}_$j AS MATERIALIZED (SELECT c.a, c.b, c.n
                FROM c$k c, $priors WHERE $f
                ORDER BY c.n DESC, c.a, c.b LIMIT 1)"""
            }
          }.mkString(",\n")
          val repl = (1 to 3).foldLeft("v.w") { (acc, j) =>
            s"""replace($acc, '|'||q$j.a||'||'||q$j.b||'|',
              '|'||q$j.a||q$j.b||'|')"""
          }
          s"""c$k AS MATERIALIZED (SELECT syms[i] AS a, syms[i+1] AS b,
              sum(freq)::BIGINT AS n
            FROM (SELECT freq, string_split(trim(w, '|'), '||') AS syms,
                    unnest(range(1, len(string_split(trim(w, '|'), '||')))) AS i
                  FROM v${k - 1})
            GROUP BY 1, 2),
          $picks,
          v$k AS MATERIALIZED (SELECT v.freq, $repl AS w
            FROM v${k - 1} v, p${k}_1 q1, p${k}_2 q2, p${k}_3 q3)"""
        }.mkString(",\n")
        val unions = (for (k <- 1 to 3; j <- 1 to 3) yield
          s"""SELECT ${(k - 1) * 3 + j - 1}::BIGINT AS rank,
            ${k - 1}::BIGINT AS round, a AS lhs, b AS rhs, n
          FROM p${k}_$j""").mkString(" UNION ALL ")
        s"""WITH v0 AS MATERIALIZED (SELECT
            '|' || array_to_string(list_transform(range(1, length(w) + 1),
              i -> w[i]), '||') || '|' AS w,
            count(*)::BIGINT AS freq
          FROM (SELECT unnest(list_filter(
              regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS w
            FROM documents WHERE text IS NOT NULL)
          GROUP BY 1),
          $rounds
          SELECT * FROM ($unions) ORDER BY rank"""
      }, bench = true),

    // pairwise source vocabulary Jaccard (membership complement of
    // the frequency-shape sourceDrift panel)
    QueryDef("txt_vocab_overlap",
      (s, d) => TextAnalysis.sourceVocabOverlap(t(s, d, "documents")),
      Some("""WITH sv AS MATERIALIZED (SELECT DISTINCT source,
            unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
              t -> t <> '')) AS token
          FROM documents),
        sizes AS (SELECT source, count(*)::BIGINT AS n_vocab
          FROM sv GROUP BY source),
        common AS (SELECT a.source AS source_a, b.source AS source_b,
            count(*)::BIGINT AS n_common
          FROM sv a JOIN sv b ON a.token = b.token AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT sa.source AS source_a, sb.source AS source_b,
          coalesce(n_common, 0)::BIGINT AS n_common,
          round(CAST(coalesce(n_common, 0) AS DOUBLE) /
            (sa.n_vocab + sb.n_vocab - coalesce(n_common, 0)), 4) AS jaccard
        FROM sizes sa JOIN sizes sb ON sa.source < sb.source
        LEFT JOIN common ON source_a = sa.source AND source_b = sb.source
        ORDER BY source_a, source_b"""), bench = true),

    // Bloom-filter admission: the sketch's Murmur3 probes are not
    // DuckDB-expressible, so the oracled surface is the guarantee set
    // computed against the EXACT membership join: no true duplicate
    // admitted (bloom has no false negatives), and the false-positive
    // rejection rate among novel docs within 5× the configured 1 %
    QueryDef("corpus_bloom_admit",
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 2 === 0)
        val admitted = Dedup.bloomAdmit(docs, corpus,
          expectedItems = math.max(1L, corpus.count()), fpp = 0.01)
        val corpusFps = corpus
          .select(md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
            .as("f")).distinct()
        val incomingF = docs.select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("f"))
        val dupIds = incomingF.join(corpusFps, Seq("f"), "left_semi")
          .select("doc_id")
        val admittedIds = admitted.select("doc_id")
        val falseNeg = admittedIds.join(dupIds, Seq("doc_id"), "left_semi").count()
        val nNovel = docs.count() - dupIds.count()
        val nAdmitted = admittedIds.count()
        val fpRejected = nNovel - nAdmitted // novel docs the bloom rejected
        import s.implicits._
        Seq((docs.count(), falseNeg == 0L,
            nNovel == 0L || fpRejected.toDouble / nNovel <= 0.05))
          .toDF("n_incoming", "no_false_negatives", "fp_ok")
      },
      Some("""SELECT count(*)::BIGINT AS n_incoming,
        TRUE AS no_false_negatives, TRUE AS fp_ok FROM documents""")),

    // per-source health panel: volume + dup rate + empty share in one
    // combinable source groupBy (the ingest-round dashboard row)
    QueryDef("corpus_health_report",
      (s, d) => CorpusOps.sourceHealthReport(t(s, d, "documents")),
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
          sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')))::BIGINT AS n_tokens,
          round(avg(n_chars), 2) AS mean_chars,
          round(1.0 - count(DISTINCT
              md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::DOUBLE
            / count(*), 4) AS dup_rate,
          round(avg(CASE WHEN text IS NULL OR length(trim(text)) = 0
            THEN 1.0 ELSE 0.0 END), 4) AS empty_share
        FROM documents GROUP BY source ORDER BY source"""), bench = true),

    // cluster-balanced diversity sampling: k-means cells are not
    // DuckDB-reproducible, so the oracled surface is the invariant set
    // that pins the semantics given ANY clustering (the kmeans-recall
    // pattern): every sampled cell holds exactly min(quota, cell size)
    // rows, the sampled cells' sizes sum to the whole corpus (no cell
    // dropped), and no vector repeats; n_corpus anchors real data
    QueryDef("corpus_cluster_sample",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        clusterSampleSurface(s, emb,
          CorpusOps.clusterBalancedSample(emb, k = 8, quota = 25))
      },
      Some("""SELECT count(*)::BIGINT AS n_corpus, TRUE AS quota_ok,
        TRUE AS coverage_ok, TRUE AS distinct_ok
        FROM embeddings WHERE embedding IS NOT NULL"""), bench = true),

    // SAMPLE ONLY — the serve path, measured without Lloyd's training:
    // centroids persisted once per JVM (memoized writeKmeansCentroids),
    // read back each run — under min-of-N round 1 pays the build, later
    // rounds measure the pure quota-sampling plan (heap + broadcast
    // argmax). Same invariant surface and oracle; corpus_cluster_sample
    // stays benched as the train+sample row so train cost is visible.
    QueryDef("corpus_cluster_sample_only",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cents = s.read.parquet(kmeansCentroidDir(s, d))
        clusterSampleSurface(s, emb,
          CorpusOps.clusterBalancedSampleFromCentroids(emb, cents, quota = 25))
      },
      Some("""SELECT count(*)::BIGINT AS n_corpus, TRUE AS quota_ok,
        TRUE AS coverage_ok, TRUE AS distinct_ok
        FROM embeddings WHERE embedding IS NOT NULL"""), bench = true),

    // RAKE keyword extraction: stopword-delimited candidate phrases,
    // deg/freq word scoring, top-3 per doc. Rank compares the ROUNDED
    // score (tfidf discipline) with (phrase, position) tie-break;
    // engine position bases differ by 1 but order is monotonic
    QueryDef("txt_rake_keywords",
      (s, d) => TextAnalysis.rakeKeywords(t(s, d, "documents"), stopwords, 3),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
              t -> t <> '') AS tk FROM documents),
          segs AS (SELECT doc_id, str_split(array_to_string(
              list_transform(tk, t -> CASE WHEN list_contains(${sqlList(stopwords)}, t)
                THEN '|' ELSE t END), ' '), '|') AS sg FROM toks),
          phr AS (SELECT doc_id, trim(unnest(sg)) AS phrase,
              unnest(generate_series(1, len(sg))) AS ppos FROM segs),
          pw AS (SELECT doc_id, ppos, phrase, str_split(phrase, ' ') AS ws
            FROM phr WHERE phrase <> ''),
          wx AS (SELECT doc_id, ppos, phrase, len(ws) AS plen, unnest(ws) AS w
            FROM pw),
          stats AS (SELECT doc_id, w, count(*) AS freq,
              sum(plen)::BIGINT AS deg
            FROM wx GROUP BY doc_id, w),
          sc AS (SELECT wx.doc_id, ppos, phrase,
              round(sum(CAST(deg AS DOUBLE) / freq), 4) AS score
            FROM wx JOIN stats ON wx.doc_id = stats.doc_id AND wx.w = stats.w
            GROUP BY wx.doc_id, ppos, phrase)
          SELECT doc_id, rk, phrase, score FROM (
            SELECT doc_id, phrase, score,
              CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, phrase, ppos) AS BIGINT) AS rk
            FROM sc) WHERE rk <= 3
          ORDER BY doc_id, rk"""
      }, bench = true),

    // k-anonymity release audit over the (lang, source) quasi-identifier
    QueryDef("corpus_k_anonymity",
      (s, d) => CorpusOps.kAnonymityAudit(t(s, d, "documents"),
        Seq("lang", "source"), 10),
      Some("""SELECT lang, source, count(*)::BIGINT AS n,
          count(*) < 10 AS at_risk
        FROM documents GROUP BY lang, source
        ORDER BY lang NULLS FIRST, source""")),

    // Laplace noisy-count release (reproducible-seed variant): u off
    // 0/half/1 via (k+0.5)/2^48 from the md5 coin, inverse-CDF noise in
    // IDENTICAL expression order, floor (never round — half-up vs
    // half-even diverges on exact .5), clamp at 0
    QueryDef("corpus_dp_release",
      (s, d) => CorpusOps.dpNoisyCountRelease(t(s, d, "documents"),
        Seq("lang", "source")),
      Some("""WITH g AS (SELECT lang, source, count(*)::BIGINT AS n
          FROM documents GROUP BY 1, 2),
        k AS (SELECT lang, source, n,
            (('0x' || substr(md5('dp:'
                || (CASE WHEN lang IS NULL THEN '0' ELSE '1' END)
                || ':' || md5(coalesce(lang, '')) || ':'
                || (CASE WHEN source IS NULL THEN '0' ELSE '1' END)
                || ':' || md5(coalesce(source, ''))), 1, 12))::BIGINT::DOUBLE
              + 0.5) / 281474976710656.0 AS u
          FROM g)
        SELECT lang, source,
          greatest(0, n + floor((-1.0) * sign(u - 0.5)
            * ln(1.0 - 2.0 * abs(u - 0.5)))::BIGINT)::BIGINT AS n_noisy
        FROM k ORDER BY lang NULLS FIRST, source""")),

    // USER-level DP release (r14 verdict #6): each user clamped to
    // their 3 deterministically-first events (row_number over
    // (user_id ORDER BY event_id)), then Laplace at b = 3/1 — the
    // post-clamp user-level sensitivity. Null users excluded (the
    // privacy unit is undefined). Same md5 coin / inverse-CDF / floor
    // discipline as corpus_dp_release, noise scale ×3.
    QueryDef("corpus_dp_release_user",
      (s, d) => CorpusOps.dpNoisyCountReleaseUser(t(s, d, "events"),
        Seq("event_type"), "user_id", "event_id",
        maxPerUser = 3, epsilon = 1.0),
      Some("""WITH capped AS (SELECT event_type FROM (
            SELECT event_type,
              row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS r
            FROM events WHERE user_id IS NOT NULL) WHERE r <= 3),
          g AS (SELECT event_type, count(*)::BIGINT AS n
            FROM capped GROUP BY 1),
          k AS (SELECT event_type, n,
              (('0x' || substr(md5('dpu:'
                  || (CASE WHEN event_type IS NULL THEN '0' ELSE '1' END)
                  || ':' || md5(coalesce(event_type, ''))), 1, 12))
                ::BIGINT::DOUBLE + 0.5) / 281474976710656.0 AS u
            FROM g)
          SELECT event_type,
            greatest(0, n + floor((-3.0) * sign(u - 0.5)
              * ln(1.0 - 2.0 * abs(u - 0.5)))::BIGINT)::BIGINT AS n_noisy
          FROM k ORDER BY event_type NULLS FIRST""")),

    // l-diversity: the homogeneity-attack screen k-anonymity misses —
    // distinct sensitive values per quasi group
    QueryDef("corpus_l_diversity",
      (s, d) => CorpusOps.lDiversityAudit(t(s, d, "documents"),
        Seq("lang", "source"), "n_chars", 5),
      Some("""SELECT lang, source, count(*)::BIGINT AS n,
          count(DISTINCT n_chars)::BIGINT AS n_sensitive,
          count(DISTINCT n_chars) < 5 AS at_risk
        FROM documents GROUP BY lang, source
        ORDER BY lang NULLS FIRST, source"""), bench = true),

    // t-closeness: the skewness-attack screen completing the privacy
    // trio — per-source total-variation distance of the lang
    // distribution vs the corpus, all mass arithmetic on exact
    // integers over the common denominator n_group*N (one float
    // division at the end); uncovered global mass in closed form
    QueryDef("corpus_t_closeness",
      (s, d) => CorpusOps.tClosenessAudit(t(s, d, "documents"),
        Seq("source"), "lang", 0.2),
      Some("""WITH b AS MATERIALIZED (SELECT source, lang FROM documents
            WHERE lang IS NOT NULL),
          cells AS MATERIALIZED (SELECT source, lang, count(*)::BIGINT AS c
            FROM b GROUP BY 1, 2),
          gl AS (SELECT lang, count(*)::BIGINT AS g FROM b GROUP BY 1),
          nn AS (SELECT count(*)::BIGINT AS nt FROM b),
          grp AS (SELECT source, sum(c)::BIGINT AS ng FROM cells GROUP BY 1),
          agg AS (SELECT cells.source,
              sum(abs(c * nt - g * ng))::BIGINT AS num,
              sum(g)::BIGINT AS cov
            FROM cells JOIN gl USING (lang) CROSS JOIN nn
              JOIN grp ON cells.source IS NOT DISTINCT FROM grp.source
            GROUP BY 1)
        SELECT agg.source, grp.ng AS n,
          round((num + (nt - cov) * ng)::DOUBLE
            / (2.0::DOUBLE * ng::DOUBLE * nt::DOUBLE), 4) AS tv,
          round((num + (nt - cov) * ng)::DOUBLE
            / (2.0::DOUBLE * ng::DOUBLE * nt::DOUBLE), 4) > 0.2 AS at_risk
        FROM agg JOIN grp ON agg.source IS NOT DISTINCT FROM grp.source
          CROSS JOIN nn
        ORDER BY agg.source NULLS FIRST"""), bench = true),

    // exact-k-per-source sampling: fixed quota of 5 docs per source by
    // ascending u32(md5) order, via the graft_topk heap (never a
    // corpus-wide ranking window)
    QueryDef("corpus_exact_sample",
      (s, d) => CorpusOps.exactSamplePerSource(t(s, d, "documents"), 5, "smp"),
      Some("""SELECT doc_id, source FROM (
          SELECT doc_id, source, row_number() OVER (PARTITION BY source
            ORDER BY ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
              doc_id) AS rk
          FROM documents)
        WHERE rk <= 5 ORDER BY doc_id""")),

    // domain-mixture sampling: integer-only thresholds (see
    // CorpusOps.mixtureSample) — 40/30/20/10% of a 60-doc mix from
    // four sources, everything else weight 0
    QueryDef("corpus_mixture_sample",
      (s, d) => CorpusOps.mixtureSample(t(s, d, "documents"),
        Map("src0" -> 400L, "src1" -> 300L, "src2" -> 200L, "src3" -> 100L),
        60L, "mix1"),
      Some("""WITH tgt(source, permille) AS (VALUES
          ('src0', 400), ('src1', 300), ('src2', 200), ('src3', 100)),
        thr AS MATERIALIZED (SELECT d.source,
            least(4294967296, ((permille * 60) // 1000) * 4294967296 // count(*)) AS thr
          FROM documents d JOIN tgt USING (source) GROUP BY d.source, permille)
        SELECT doc_id, lang, source FROM documents JOIN thr USING (source)
        WHERE ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr
        ORDER BY doc_id""")),

    // C4/MassiveText line-level boilerplate removal over a lined corpus
    // synthesized identically on both sides (the raw synthetic docs are
    // single-line): body + a per-source legal footer (corpus-frequent),
    // a javascript banner or a unique section line, and a short "ok" or
    // a 40-char body prefix — exercising the pattern rule, the
    // min-words rule, and the corpus-frequency rule at once
    QueryDef("corpus_remove_boilerplate",
      (s, d) => {
        val lined = t(s, d, "documents").withColumn("text",
          concat(col("text"),
            lit("\ncopyright "), col("source"), lit(" all rights reserved\n"),
            when(col("doc_id") % 3 === 0,
              lit("please enable javascript and cookies to continue"))
              .otherwise(concat(lit("section "), col("doc_id").cast("string"),
                lit(" of the archive collection"))),
            lit("\n"),
            when(col("doc_id") % 7 === 0, lit("ok"))
              .otherwise(substring(col("text"), 1, 40))))
        Cleaning.removeBoilerplate(lined)
      },
      Some {
        s"""WITH lined AS (SELECT doc_id,
            text || chr(10) || 'copyright ' || source || ' all rights reserved' || chr(10) ||
            CASE WHEN doc_id % 3 = 0 THEN 'please enable javascript and cookies to continue'
                 ELSE 'section ' || CAST(doc_id AS VARCHAR) || ' of the archive collection' END || chr(10) ||
            CASE WHEN doc_id % 7 = 0 THEN 'ok' ELSE substr(text, 1, 40) END AS t
          FROM documents),
          lines AS (SELECT doc_id, unnest(str_split(t, chr(10))) AS line,
            unnest(generate_series(1, len(str_split(t, chr(10))))) AS pos FROM lined),
          norm AS (SELECT doc_id, pos, line,
            md5(regexp_replace(lower(trim(line)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS lh,
            len(list_filter(regexp_split_to_array(trim(line), '[ \\t\\n\\x0B\\f\\r]+'), w -> w <> '')) AS nw
          FROM lines),
          freq AS (SELECT lh FROM norm GROUP BY lh HAVING count(DISTINCT doc_id) > 2),
          kept AS (SELECT * FROM norm WHERE nw >= 3
            AND NOT regexp_matches(lower(line), '${Cleaning.defaultBoilerplatePatterns}')
            AND lh NOT IN (SELECT lh FROM freq)),
          agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
            count(*)::BIGINT AS n_lines_kept FROM kept GROUP BY doc_id)
          SELECT a.doc_id, text_clean, n_lines_kept,
            (len(str_split(l.t, chr(10))) - n_lines_kept)::BIGINT AS n_lines_dropped
          FROM agg a JOIN lined l ON a.doc_id = l.doc_id ORDER BY a.doc_id"""
      }, bench = true),

    // within-doc repeated-line removal: the fixture interleaves the
    // doc's own body and an "add to cart" chrome line twice each —
    // in-page repetition that corpus-frequency boilerplate rules
    // cannot see. The oracle reproduces first-occurrence-wins with a
    // min-position group-by (DuckDB's list_distinct does NOT preserve
    // order — never use it where the rejoined text is hashed)
    QueryDef("corpus_dedup_lines",
      (s, d) => {
        // null text coalesced to '' on BOTH sides: Spark's
        // concat/split null-propagate (the doc would emit a null row)
        // while DuckDB's unnest of a null split drops it entirely —
        // the same null-text vintage hazard the mm_* oracles guard
        val lined = t(s, d, "documents").withColumn("text",
          concat(coalesce(col("text"), lit("")),
            lit("\nadd to cart\n"), coalesce(col("text"), lit("")),
            lit("\nadd to cart")))
        Cleaning.dedupLinesInDoc(lined)
          .select(col("doc_id"), md5(col("text_dedup")).as("dedup_md5"),
            col("n_lines"), col("n_unique_lines"))
          .orderBy("doc_id")
      },
      Some("""WITH lined AS (SELECT doc_id,
            coalesce(text, '') || chr(10) || 'add to cart' || chr(10) ||
              coalesce(text, '') || chr(10) || 'add to cart' AS t
          FROM documents),
        lines AS (SELECT doc_id, unnest(str_split(t, chr(10))) AS line,
          unnest(generate_series(1, len(str_split(t, chr(10))))) AS pos
          FROM lined),
        firsts AS (SELECT doc_id, line, min(pos) AS fp
          FROM lines GROUP BY doc_id, line),
        agg AS (SELECT doc_id,
            string_agg(line, chr(10) ORDER BY fp) AS text_dedup,
            count(*)::BIGINT AS n_unique_lines
          FROM firsts GROUP BY doc_id)
        SELECT a.doc_id, md5(text_dedup) AS dedup_md5,
          len(str_split(l.t, chr(10)))::BIGINT AS n_lines, n_unique_lines
        FROM agg a JOIN lined l ON a.doc_id = l.doc_id
        ORDER BY a.doc_id""")),

    // PII redaction over synthetic PII injected identically on both
    // sides (emails/IPs always, SSN on doc_id%3=0, phone on doc_id%2=0)
    QueryDef("corpus_redact_pii",
      (s, d) => {
        val injected = t(s, d, "documents").withColumn("text",
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com ip 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 100).cast("string"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" ssn 123-45-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 2 === 0,
              concat(lit(" call 555-867-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))))
        Cleaning.redactPii(injected)
      },
      Some {
        // Scala's "\\b" is the two chars \b — embeds verbatim into the
        // single-quoted RE2 literal (patterns are dialect-shared)
        val Seq(em, ip, ssn, ph) = Cleaning.piiPatterns.map(_._2)
        s"""WITH injected AS (SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.' ||
            CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ||
            CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
            CASE WHEN doc_id % 2 = 0 THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
          FROM documents),
          s1 AS (SELECT doc_id, t, regexp_replace(t, '$em', '<EMAIL>', 'g') AS t1 FROM injected),
          s2 AS (SELECT *, regexp_replace(t1, '$ip', '<IP>', 'g') AS t2 FROM s1),
          s3 AS (SELECT *, regexp_replace(t2, '$ssn', '<SSN>', 'g') AS t3 FROM s2)
          SELECT doc_id,
            regexp_replace(t3, '$ph', '<PHONE>', 'g') AS text_redacted,
            len(regexp_extract_all(t, '$em'))::BIGINT AS n_emails,
            len(regexp_extract_all(t1, '$ip'))::BIGINT AS n_ips,
            len(regexp_extract_all(t2, '$ssn'))::BIGINT AS n_ssns,
            len(regexp_extract_all(t3, '$ph'))::BIGINT AS n_phones
          FROM s3 ORDER BY doc_id"""
      }),

    // sequence packing (chunked concatenation): each doc's span across
    // fixed-256-token training sequences, per source in doc_id order
    QueryDef("corpus_pack_sequences",
      (s, d) => CorpusOps.packSequences(t(s, d, "documents"), 256L),
      Some {
        s"""SELECT doc_id, source, n_tokens,
            (cum_tokens - n_tokens) // 256 AS first_seq,
            (cum_tokens - 1) // 256 AS last_seq,
            (cum_tokens - n_tokens) % 256 AS seq_offset
          FROM (SELECT doc_id, source,
              CAST(len($toksSql) AS BIGINT) AS n_tokens,
              CAST(sum(len($toksSql)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE n_tokens > 0 ORDER BY doc_id"""
      }),

    // packing-efficiency audit over the same 256-token layout:
    // per-source fill rate (tail padding only) + doc fragmentation
    QueryDef("corpus_packing_stats",
      (s, d) => CorpusOps.packingStats(t(s, d, "documents"), 256L),
      Some {
        s"""WITH p AS (SELECT doc_id, source, n_tokens,
            (cum_tokens - n_tokens) // 256 AS first_seq,
            (cum_tokens - 1) // 256 AS last_seq
          FROM (SELECT doc_id, source,
              CAST(len($toksSql) AS BIGINT) AS n_tokens,
              CAST(sum(len($toksSql)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM documents)
          WHERE n_tokens > 0)
          SELECT source, count(*)::BIGINT AS n_docs,
            sum(n_tokens)::BIGINT AS n_tokens,
            (max(last_seq) + 1)::BIGINT AS n_seqs,
            round(sum(n_tokens)::DOUBLE / ((max(last_seq) + 1) * 256), 4)
              AS fill_rate,
            sum(CASE WHEN first_seq <> last_seq THEN 1 ELSE 0 END)::BIGINT
              AS n_split_docs,
            round(sum(CASE WHEN first_seq <> last_seq THEN 1 ELSE 0 END)::DOUBLE
              / count(*), 4) AS split_rate
          FROM p GROUP BY source ORDER BY source"""
      }),

    // shard-assignment audit for the training export: deterministic
    // md5(doc_id) sharding, per-shard count/bytes/id-range. The writer
    // itself ([[CorpusOps.writeShards]]) is spec-tested; this query is
    // the balance check over the same mapping
    QueryDef("corpus_shard_stats",
      (s, d) => CorpusOps.shardStats(t(s, d, "documents"), 16),
      Some {
        """SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16) AS shard,
            count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_bytes,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc
          FROM documents GROUP BY 1 ORDER BY shard"""
      }),

    // curriculum staging: global (n_chars, doc_id) order cut into 8
    // equal stages — Spark side is the constant-key skew-safe rankByKey
    // (no single-reducer global window), oracle is the plain window
    QueryDef("corpus_curriculum",
      (s, d) => CorpusOps.curriculumStages(t(s, d, "documents"), col("n_chars"), 8),
      Some("""WITH r AS (SELECT doc_id, n_chars,
            row_number() OVER (ORDER BY n_chars NULLS FIRST, doc_id) AS rk,
            count(*) OVER () AS n FROM documents)
        SELECT doc_id, n_chars AS score,
          CAST(floor((rk - 1) * 8 / n) AS BIGINT) AS stage
        FROM r ORDER BY doc_id""")),

    // round-robin source interleaving: the deterministic training
    // order (turn 1 of every source, then turn 2, …). Spark side is
    // the skew-safe rankByKey, oracle is the plain window — identical
    // results, different physical plans
    QueryDef("corpus_interleave",
      (s, d) => CorpusOps.interleave(t(s, d, "documents")),
      Some("""SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS turn
        FROM documents ORDER BY turn, source, doc_id""")),

    // per-language length-percentile trim (drop shortest/longest 5%):
    // rank-based boundary — an exact rational both engines compute
    // identically, immune to interpolated-quantile ulp drift
    QueryDef("corpus_length_filter",
      (s, d) => Cleaning.lengthFilter(t(s, d, "documents"), 0.05, 0.95),
      Some("""WITH r AS (SELECT doc_id, lang, n_chars,
            count(*) OVER (PARTITION BY lang) AS nk,
            CASE WHEN count(*) OVER (PARTITION BY lang) > 1
              THEN CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars NULLS FIRST, doc_id) - 1 AS DOUBLE)
                / (count(*) OVER (PARTITION BY lang) - 1)
              ELSE 0.0 END AS pr
          FROM documents)
        SELECT doc_id, lang, n_chars, round(pr, 6) AS len_pct
        FROM r WHERE nk = 1 OR (pr >= 0.05 AND pr <= 0.95) ORDER BY doc_id""")),

    // Unicode canonicalization (NFC + control strip + whitespace
    // collapse) — the pre-hash normalize pass. The synthetic suffix
    // appends a combining acute (composes under NFC) and a BEL control
    // (strips) so the corpus genuinely exercises both rules; the
    // control class is explicit hex ranges on BOTH dialects (RE2
    // silently matches nothing for \p{Cntrl} — see
    // Cleaning.normalizeText)
    QueryDef("corpus_normalize_text",
      (s, d) => Cleaning.normalizeText(
          t(s, d, "documents").withColumn("text",
            // DECOMPOSED "e"+U+0301 then BEL: the operator must
            // compose and strip - a pre-composed suffix would let a
            // broken normalizer pass vacuously
            concat(col("text"), lit(" e\u0301\u0007x "))))
        .select(col("doc_id"), col("n_chars").as("n_chars_norm"),
          md5(col("text")).as("norm_md5"))
        .orderBy("doc_id"),
      Some {
        """SELECT doc_id, length(norm)::BIGINT AS n_chars_norm,
            md5(norm) AS norm_md5
          FROM (SELECT doc_id,
            trim(regexp_replace(regexp_replace(
              nfc_normalize(text || ' e' || chr(769) || chr(7) || 'x '),
              '[\x00-\x08\x0E-\x1F\x7F-\x9F]', '', 'g'),
              '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
            FROM documents) ORDER BY doc_id"""
      }, bench = true),

    // C4 bad-words rule: any blocklisted token drops the whole doc;
    // whole-token lowercased membership, gate-report form
    QueryDef("corpus_blocklist_filter",
      (s, d) => Cleaning.blocklistFilter(t(s, d, "documents"),
        Seq("merge", "window")),
      Some(s"""SELECT doc_id,
          len($toksSql)::BIGINT AS n_tokens,
          coalesce(len(list_filter($toksSql,
            t -> list_contains(['merge', 'window'], lower(t)))), 0)::BIGINT
            AS n_blocked,
          coalesce(len(list_filter($toksSql,
            t -> list_contains(['merge', 'window'], lower(t)))), 0) = 0
            AS keep
        FROM documents ORDER BY doc_id"""), bench = true),

    // Gopher-style quality gate: word-count / mean-word-length /
    // alpha-fraction / stopword-hit rules; keep compares the ROUNDED
    // stats so the boundary cannot drift by a float ulp cross-engine
    QueryDef("corpus_gopher_filter",
      (s, d) => Cleaning.gopherRules(t(s, d, "documents"),
        minWords = 10, maxWords = 1000, stopwords = stopwords),
      Some {
        s"""WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
              x -> x <> '') AS ws
          FROM documents),
        s AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
            round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
              list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                / len(ws) END, 4) AS mean_word_len,
            round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
              len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                / len(ws) END, 4) AS alpha_frac,
            len(list_filter(ws,
              x -> list_contains(${sqlList(stopwords)}, lower(x))))::BIGINT
              AS stop_hits
          FROM w)
        SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
          (n_words >= 10 AND n_words <= 1000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND alpha_frac >= 0.8 AND stop_hits >= 2) AS keep
        FROM s ORDER BY doc_id"""
      }, bench = true),

    // sliding-window chunking (context-window prep): 32-token windows
    // at stride 24 (8-token overlap), last window truncates; chunk
    // content compared by md5
    QueryDef("corpus_chunk_windows",
      (s, d) => CorpusOps.chunkWindows(t(s, d, "documents"), 32, 24),
      Some {
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          c AS MATERIALIZED (SELECT doc_id, unnest(range(0, len(w), 24)) AS st, w FROM w)
          SELECT doc_id, (st // 24)::BIGINT AS chunk_id, st::BIGINT AS chunk_start,
            len(w[st+1:st+32])::BIGINT AS chunk_tokens,
            md5(array_to_string(w[st+1:st+32], ' ')) AS chunk_md5
          FROM c ORDER BY doc_id, chunk_id"""
      }),

    // per-source KL drift from the corpus token distribution (mix
    // monitor). Scalar totals applied ABOVE the per-source aggregate —
    // the unigram-LM arithmetic-order discipline
    QueryDef("corpus_source_drift",
      (s, d) => TextAnalysis.sourceDrift(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token FROM documents),
          st AS MATERIALIZED (SELECT source, token, count(*)::BIGINT AS c_st FROM toks
            GROUP BY source, token),
          ct AS (SELECT token, sum(c_st)::BIGINT AS c_t FROM st GROUP BY token),
          ns AS (SELECT source, sum(c_st)::BIGINT AS n_s, count(*)::BIGINT AS vocab
            FROM st GROUP BY source),
          n AS MATERIALIZED (SELECT sum(c_t)::BIGINT AS n FROM ct),
          agg AS (SELECT source, sum(c_st * (ln(c_st) - ln(c_t))) AS s
            FROM st JOIN ct USING (token) GROUP BY source)
          SELECT source, n_s AS n_tokens, vocab,
            round((s / n_s + ln(n) - ln(n_s)) / ln(2.0), 4) + 0 AS kl_bits
          FROM agg JOIN ns USING (source) CROSS JOIN n ORDER BY source"""
      }),

    // symmetric bounded drift: Jensen-Shannon vs the corpus, sparse
    // form (absent-token q-mass in closed form: ln2 * (1 - q_cov))
    QueryDef("corpus_source_js",
      (s, d) => TextAnalysis.sourceJsDivergence(t(s, d, "documents")),
      Some {
        s"""WITH toks AS MATERIALIZED (SELECT source, unnest($toksSql) AS token
            FROM documents),
          st AS MATERIALIZED (SELECT source, token, count(*)::BIGINT AS c_st FROM toks
            GROUP BY source, token),
          ct AS (SELECT token, sum(c_st)::BIGINT AS c_t FROM st
            GROUP BY token),
          ns AS (SELECT source, sum(c_st)::BIGINT AS n_s FROM st
            GROUP BY source),
          n AS MATERIALIZED (SELECT sum(c_t)::BIGINT AS n FROM ct),
          terms AS (SELECT st.source,
              (c_st::DOUBLE / n_s) AS p, (c_t::DOUBLE / n) AS q
            FROM st JOIN ct USING (token) JOIN ns USING (source)
            CROSS JOIN n),
          agg AS (SELECT source,
              sum(p * ln(p / ((p + q) / 2.0))) AS kl_pm,
              sum(q * ln(q / ((p + q) / 2.0))) AS kl_qm_present,
              sum(q) AS q_cov
            FROM terms GROUP BY source)
          SELECT a.source, ns.n_s AS n_tokens,
            round((0.5 * kl_pm + 0.5 * (kl_qm_present +
              ln(2.0) * (1.0 - q_cov))) / ln(2.0), 4) + 0 AS js_bits
          FROM agg a JOIN ns ON ns.source = a.source ORDER BY a.source"""
      }, bench = true),

    // leakage-safe train/test split: whole near-dup clusters land on
    // one side (md5 of the cluster id), so a test doc's near-duplicate
    // can never sit in train. Oracle = the dedup_clusters recursive
    // CTE + the same split hash
    QueryDef("corpus_split_leakage",
      (s, d) => Dedup.leakageSafeSplit(t(s, d, "documents"), 3, 8, 4, 200),
      Some {
        s"""WITH RECURSIVE $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
          cl AS (SELECT d.doc_id,
              least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN
              (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
              ON m.src = d.doc_id)
          SELECT doc_id, cluster_id,
            CASE WHEN ('0x' || substr(md5('split:' || cluster_id), 1, 8))::BIGINT
              % 1000 < 200 THEN 'test' ELSE 'train' END AS split
          FROM cl ORDER BY doc_id"""
      }),

    // temperature-scaled source mixture weights (α=0.7, 1M-token
    // budget): ONE source groupBy + a single-row broadcast normalizer;
    // weight/epochs are float surfaces → rounded 6/4 dp, identical
    // operation order in both engines
    QueryDef("corpus_mix_weights",
      (s, d) => CorpusOps.sourceMixWeights(t(s, d, "documents"), 0.7, 1000000L),
      Some("""WITH per AS (SELECT source,
          coalesce(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))), 0)::BIGINT
            AS n_tokens
          FROM documents GROUP BY source)
        SELECT source, n_tokens,
          round(power(n_tokens, 0.7) / sum(power(n_tokens, 0.7)) OVER (), 6)
            AS weight,
          CASE WHEN n_tokens > 0
            THEN round(1000000.0 * (power(n_tokens, 0.7) /
              sum(power(n_tokens, 0.7)) OVER ()) / n_tokens, 4)
            ELSE 0.0 END AS epochs
        FROM per ORDER BY source""")),

    // quantile normalization across sources: within-source permille
    // mapped onto the corpus distribution — all integer rank math,
    // normalized scores are actual data values
    QueryDef("corpus_quantile_normalize",
      (s, d) => CorpusOps.quantileNormalize(t(s, d, "documents"), stopwords),
      Some {
        val w = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""
        s"""WITH sc AS (SELECT doc_id, source,
            coalesce(round(CAST(len(list_filter($w,
              t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE) /
              len($w), 4), -1.0) AS score
          FROM documents),
          ps AS (SELECT doc_id, source, score,
              row_number() OVER (PARTITION BY source
                ORDER BY score, doc_id) AS r,
              count(*) OVER (PARTITION BY source) AS n
            FROM sc),
          g AS (SELECT score AS norm_score,
              row_number() OVER (ORDER BY score, doc_id) AS gr,
              count(*) OVER () AS nn
            FROM sc)
          SELECT ps.doc_id, ps.source, ps.score, g.norm_score
          FROM ps JOIN g
            ON g.gr = (((1000 * ps.r + ps.n - 1) // ps.n) * g.nn + 999) // 1000
          ORDER BY ps.doc_id"""
      }, bench = true),

    // largest-remainder (Hamilton) quota apportionment — the integer
    // sampling plan sourceMixWeights feeds; pure long arithmetic, the
    // quotas sum to EXACTLY the budget in both engines
    QueryDef("corpus_quota_plan",
      (s, d) => CorpusOps.quotaPlan(t(s, d, "documents"), 10000L),
      Some("""WITH per AS (SELECT source,
          coalesce(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))), 0)::BIGINT
            AS n_tokens
          FROM documents GROUP BY source),
        tot AS MATERIALIZED (SELECT sum(n_tokens)::BIGINT AS n FROM per),
        q AS MATERIALIZED (SELECT source, n_tokens,
            (10000 * n_tokens) // n AS base, (10000 * n_tokens) % n AS rem
          FROM per CROSS JOIN tot),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
          FROM q),
        x AS MATERIALIZED (SELECT 10000 - sum(base)::BIGINT AS extras FROM r)
        SELECT source, n_tokens,
          (base + CASE WHEN rk <= extras THEN 1 ELSE 0 END)::BIGINT AS quota,
          rk <= extras AS got_extra
        FROM r CROSS JOIN x ORDER BY source"""), bench = true),

    // cross-source exact-dup attribution: sparse nonzero source-pair
    // matrix over distinct (fingerprint, source) — 32-byte hashes
    // cross the shuffle, fan-out bounded by |sources|² per key. The
    // synthetic corpus's dups are all INTRA-source, so the fixture
    // forges mirror sources from a doc_id slice (the corpus_cross_pairs
    // pattern) — otherwise the oracle would only ever compare empty
    QueryDef("corpus_dup_matrix",
      (s, d) => {
        val docs = t(s, d, "documents")
        val mirror = docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L)
          .withColumn("source", concat(lit("mirror:"), col("source")))
        Dedup.dupSourceMatrix(docs.unionByName(mirror))
      },
      Some("""WITH all_docs AS (
          SELECT text, source FROM documents
          UNION ALL
          SELECT text, 'mirror:' || source AS source FROM documents
          WHERE doc_id % 7 = 0),
        f AS (SELECT DISTINCT
          md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp, source
          FROM all_docs WHERE text IS NOT NULL)
        SELECT a.source AS source_a, b.source AS source_b,
          count(*)::BIGINT AS n_shared
        FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        GROUP BY a.source, b.source ORDER BY source_a, source_b""")),

    // one-row corpus data card (datasheet headline), same dup/empty
    // formulas as the per-source health report
    QueryDef("corpus_data_card",
      (s, d) => CorpusOps.dataCard(t(s, d, "documents")),
      Some("""SELECT count(*)::BIGINT AS n_docs,
          count(DISTINCT source)::BIGINT AS n_sources,
          count(DISTINCT lang)::BIGINT AS n_langs,
          coalesce(sum(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))), 0)::BIGINT
            AS n_tokens,
          round(avg(n_chars), 2) AS mean_chars,
          round(1.0 - count(DISTINCT
              md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))::DOUBLE
            / count(*), 4) AS dup_rate,
          round(avg(CASE WHEN text IS NULL OR length(trim(text)) = 0
            THEN 1.0 ELSE 0.0 END), 4) AS empty_share
        FROM documents"""), bench = true),

    // mojibake repair: the synthetic corpus is clean ASCII, so the
    // fixture forges UTF-8-as-cp1252 damage in-plan for doc_id % 9 == 0
    // (suffix built FROM Cleaning.mojibakePatterns — one source of
    // truth, zero literal drift between engines); oracle chains the
    // same literal replace()s
    QueryDef("corpus_fix_encoding",
      (s, d) => {
        val suffix = " " + Cleaning.mojibakePatterns.map(_._1).mkString("|")
        val broken = t(s, d, "documents").withColumn("text",
          when(col("doc_id") % 9 === 0, concat(col("text"), lit(suffix)))
            .otherwise(col("text")))
        Cleaning.fixEncoding(broken)
          .select(col("doc_id"), col("text"), col("was_broken"),
            col("n_chars"))
          .orderBy("doc_id")
      },
      Some {
        val suffix = " " + Cleaning.mojibakePatterns.map(_._1).mkString("|")
        val chain = Cleaning.mojibakePatterns.foldLeft("b.text") {
          case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
        }
        s"""WITH b AS (SELECT doc_id,
            CASE WHEN doc_id % 9 = 0 THEN text || '$suffix' ELSE text END
              AS text FROM documents),
          f AS (SELECT doc_id, b.text AS orig, $chain AS fixed FROM b)
          SELECT doc_id, fixed AS text,
            coalesce(fixed <> orig, FALSE) AS was_broken,
            length(fixed)::BIGINT AS n_chars
          FROM f ORDER BY doc_id"""
      }, bench = true),

    // context-limit head truncation: first 40 tokens rejoined, exact
    // kept-count and flag; clamped slice in both engines
    QueryDef("corpus_truncate_docs",
      (s, d) => Cleaning.truncateDocs(t(s, d, "documents"), 40),
      Some {
        s"""SELECT doc_id,
            CASE WHEN text IS NULL THEN NULL
              ELSE array_to_string(($toksSql)[1:40], ' ') END AS text_trunc,
            least(coalesce(len($toksSql), 0), 40)::BIGINT AS n_tokens_kept,
            coalesce(len($toksSql) > 40, FALSE) AS was_truncated
          FROM documents ORDER BY doc_id"""
      }, bench = true),

    // sentence-aligned chunking: the corpus has no natural punctuation,
    // so the fixture forges deterministic terminators in-plan (the
    // corpus_extract_html scaffold pattern — same integer arithmetic in
    // both engines), then packs sentences greedily to <= 12 tokens; the
    // oracle replays the sequential pack as a per-doc recursive CTE
    QueryDef("corpus_chunk_sentences",
      (s, d) => CorpusOps.chunkBySentences(
        forgeSentences(t(s, d, "documents")), maxTokens = 12),
      Some {
        s"""WITH RECURSIVE $forgedSentencesCte,
          sen1 AS (SELECT doc_id,
              list_filter(list_transform(
                regexp_split_to_array(trim(text), '[.!?][ \\t\\n\\x0B\\f\\r]+'),
                x -> regexp_replace(trim(x), '[.!?]+$$', '')),
                x -> x <> '') AS ss
            FROM b WHERE text IS NOT NULL),
          senx AS (SELECT doc_id, ss,
              unnest(range(1, len(ss)+1)) AS idx FROM sen1),
          sen AS (SELECT doc_id, idx, ss[idx] AS sent,
              len(regexp_split_to_array(ss[idx], '[ \\t\\n\\x0B\\f\\r]+')) AS ntok
            FROM senx),
          walk AS (
            SELECT doc_id, idx, sent, ntok, 1 AS chunk_id, ntok AS cur
            FROM sen WHERE idx = 1
            UNION ALL
            SELECT s.doc_id, s.idx, s.sent, s.ntok,
              CASE WHEN w.cur + s.ntok <= 12 THEN w.chunk_id
                ELSE w.chunk_id + 1 END,
              CASE WHEN w.cur + s.ntok <= 12 THEN w.cur + s.ntok
                ELSE s.ntok END
            FROM walk w JOIN sen s
              ON s.doc_id = w.doc_id AND s.idx = w.idx + 1)
          SELECT doc_id, chunk_id::BIGINT AS chunk_id,
            count(*)::BIGINT AS n_sentences, sum(ntok)::BIGINT AS n_tokens,
            string_agg(sent, ' ' ORDER BY idx) AS chunk_text
          FROM walk GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id"""
      }, bench = true),

    // chat-template SFT JSONL export: literal-template render around
    // the shared escape chain (to_json key order is engine-private —
    // the hand-built concat is byte-identical by construction); both
    // sides of every escape rule come from CorpusOps.jsonEscapes
    QueryDef("corpus_sft_export",
      (s, d) => CorpusOps.sftExport(t(s, d, "documents"), 10),
      Some(s"$sftExportSql ORDER BY doc_id"), bench = true),

    // round trip: the exported records re-parsed by DuckDB's OWN JSON
    // reader vs Spark's from_json — two independent parsers agreeing
    // on every content byte proves escape -> unescape is identity
    QueryDef("corpus_sft_roundtrip",
      (s, d) => CorpusOps.sftParse(
        CorpusOps.sftExport(t(s, d, "documents"), 10)),
      Some {
        s"""WITH exp AS ($sftExportSql)
          SELECT doc_id,
            json_extract_string(record, '$$.messages[0].content')
              AS sys_content,
            json_extract_string(record, '$$.messages[1].role') AS user_role,
            json_extract_string(record, '$$.messages[1].content')
              AS user_content,
            json_extract_string(record, '$$.messages[2].content')
              AS asst_content,
            json_array_length(record, '$$.messages')::BIGINT AS n_messages
          FROM exp ORDER BY doc_id"""
      }, bench = true),

    // per-source length-vs-quality Pearson correlation (trim-policy
    // advisor); ROUNDED ratio feeds corr in both engines
    QueryDef("corpus_quality_corr",
      (s, d) => CorpusOps.qualityLengthCorrelation(
        t(s, d, "documents"), stopwords),
      Some {
        val w = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""
        s"""WITH sc AS (SELECT source, n_chars::DOUBLE AS len,
            round(len(list_filter($w,
              t -> list_contains(${sqlList(stopwords)}, t)))::DOUBLE
              / len($w), 4) AS q
          FROM documents)
        SELECT source, count(*)::BIGINT AS n,
          round(corr(len, q), 4) AS len_quality_corr
        FROM sc GROUP BY source ORDER BY source"""
      }, bench = true),

    // END-TO-END corpus build: eval split → gopher gate → exact dedup →
    // decontaminate → token volume, one stats row — the composition
    // headline; oracle chains the per-stage CTE fragments
    QueryDef("corpus_e2e_stats",
      (s, d) => CorpusOps.buildCorpusStats(t(s, d, "documents"), stopwords, 97),
      Some {
        s"""WITH train AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 97 <> 0),
          w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                x -> x <> '') AS ws
            FROM train),
          gs AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
              round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                  / len(ws) END, 4) AS mean_word_len,
              round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
                len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                  / len(ws) END, 4) AS alpha_frac,
              len(list_filter(ws,
                x -> list_contains(${sqlList(stopwords)}, lower(x))))::BIGINT
                AS stop_hits
            FROM w),
          q AS MATERIALIZED (SELECT t.* FROM train t JOIN gs ON gs.doc_id = t.doc_id
            WHERE gs.n_words >= 10 AND gs.n_words <= 1000
              AND gs.mean_word_len >= 3.0 AND gs.mean_word_len <= 10.0
              AND gs.alpha_frac >= 0.8 AND gs.stop_hits >= 2),
          u AS (SELECT min(doc_id) AS doc_id FROM q
            GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))),
          qq AS MATERIALIZED (SELECT q.* FROM q WHERE doc_id IN (SELECT doc_id FROM u)),
          etoks AS (SELECT $toksSql AS w FROM documents WHERE doc_id % 97 = 0),
          eg AS (SELECT DISTINCT unnest(${shinglesSql("w")}) AS gram FROM etoks),
          dtoks AS (SELECT doc_id, $toksSql AS w FROM qq),
          dg AS (SELECT doc_id, unnest(${shinglesSql("w")}) AS gram FROM dtoks),
          bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN eg USING (gram)),
          clean AS (SELECT qq.* FROM qq
            WHERE doc_id NOT IN (SELECT doc_id FROM bad))
          SELECT (SELECT count(*) FROM train)::BIGINT AS n_input,
            (SELECT count(*) FROM q)::BIGINT AS n_quality,
            (SELECT count(*) FROM qq)::BIGINT AS n_unique,
            (SELECT count(*) FROM clean)::BIGINT AS n_clean,
            (SELECT coalesce(sum(len($toksSql)), 0) FROM clean)::BIGINT
              AS n_tokens_final"""
      }, bench = true),

    // pre-flight join cardinality: documents self-joined on lang —
    // per-key pair counts, the quadratic-blowup detector
    QueryDef("join_cardinality_probe",
      (s, d) => {
        val docs = t(s, d, "documents")
        Metrics.joinCardinalityProbe(docs, docs, "lang")
      },
      Some("""WITH l AS (SELECT lang, count(*)::BIGINT AS left_rows
            FROM documents GROUP BY lang),
          r AS (SELECT lang, count(*)::BIGINT AS right_rows
            FROM documents GROUP BY lang)
        SELECT l.lang AS lang, left_rows, right_rows,
          (left_rows * right_rows)::BIGINT AS pairs
        FROM l JOIN r ON l.lang IS NOT DISTINCT FROM r.lang
        ORDER BY pairs DESC, l.lang"""),
      bench = true),

    // skew-safe exact quantile panel: per-source doc-length p10/50/90
    // via integer permille rank math — no per-group percentile buffer
    QueryDef("corpus_length_quantiles",
      (s, d) => Metrics.quantilesByKey(t(s, d, "documents"),
        "source", "n_chars", Seq(100, 500, 900)),
      Some("""WITH r AS (SELECT source, n_chars,
            row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
            count(*) OVER (PARTITION BY source) AS n
          FROM documents WHERE n_chars IS NOT NULL)
        SELECT source, count(*)::BIGINT AS n,
          max(CASE WHEN rk <= (100 * n + 999) // 1000 THEN n_chars END) AS p100,
          max(CASE WHEN rk <= (500 * n + 999) // 1000 THEN n_chars END) AS p500,
          max(CASE WHEN rk <= (900 * n + 999) // 1000 THEN n_chars END) AS p900
        FROM r GROUP BY source ORDER BY source"""),
      bench = true),

    // BERT-style deterministic masking export: per-position md5 coins
    // under the Scala-computed integer threshold (both engines get the
    // same literal); 0-based positions in the hash string
    QueryDef("corpus_mlm_mask",
      (s, d) => CorpusOps.mlmMask(t(s, d, "documents"), 150, "mlm"),
      Some {
        val thr = 150L * 4294967296L / 1000L
        val coin = "('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) " +
          s"|| ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT < $thr"
        s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents
            WHERE text IS NOT NULL)
          SELECT doc_id,
            array_to_string([CASE WHEN $coin THEN '[MASK]' ELSE w[i + 1] END
              FOR i IN range(0, len(w))], ' ') AS input_text,
            coalesce(array_to_string([w[i + 1] FOR i IN range(0, len(w))
              IF $coin], ' '), '') AS targets,
            coalesce(len([i FOR i IN range(0, len(w)) IF $coin]), 0)::BIGINT AS n_masked,
            len(w)::BIGINT AS n_tokens
          FROM w ORDER BY doc_id"""
      }, bench = true),

    // Efraimidis-Spirakis weighted sample (∝ n_chars), deterministic
    // md5 coin, ROUNDED exponential keys, graft_topk heap selection
    QueryDef("corpus_weighted_sample",
      (s, d) => CorpusOps.weightedSample(t(s, d, "documents"),
        col("n_chars"), 100, "ws"),
      Some("""WITH sc AS (SELECT doc_id, n_chars::DOUBLE AS weight,
            round(ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              + 1) / 4294967296.0) / n_chars::DOUBLE, 9) AS key
          FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        r AS (SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rk
          FROM sc)
        SELECT doc_id, weight, key FROM r WHERE rk <= 100
        ORDER BY doc_id"""),
      bench = true),

    // HTML main-text extraction: markup forged in-plan from the shared
    // scaffold literals (plain docs every 3rd id exercise passthrough);
    // the oracle chains the same RE2∩Java patterns and entity replaces
    QueryDef("corpus_extract_html",
      (s, d) => {
        val wrapped = t(s, d, "documents").withColumn("text",
          when(col("doc_id") % 3 === 0, col("text"))
            .otherwise(concat(lit(htmlFixturePre), col("text"),
              lit(htmlFixtureSuf))))
        Cleaning.extractText(wrapped)
      },
      Some {
        val tagStrip = Cleaning.htmlBlockPatterns.foldLeft("html") {
          (acc, p) => s"regexp_replace($acc, '$p', ' ', 'g')"
        }
        val entity = Cleaning.htmlEntities.foldLeft(tagStrip) {
          case (acc, (e, c)) => s"replace($acc, '$e', '${c.replace("'", "''")}')"
        }
        s"""WITH h AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN text
              ELSE '$htmlFixturePre' || text || '$htmlFixtureSuf' END
              AS html FROM documents),
          c AS MATERIALIZED (SELECT doc_id, html,
            trim(regexp_replace($entity, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS text_clean
            FROM h)
          SELECT doc_id, text_clean,
            (length(html) - length(text_clean))::BIGINT AS n_chars_removed
          FROM c ORDER BY doc_id"""
      }, bench = true),

    // quality-stratified audit sampling: 10 docs from each of 10
    // equal-population strata of the ROUNDED stopword-ratio
    // distribution; global rank is the skew-safe rankByKey (constant
    // key), stratum = ((rank-1)*B) div n — integer arithmetic, exact
    // in both engines; winners = smallest u32(md5) per stratum via
    // the graft_topk heap. (NOT corpus_stratified_sample — that name
    // is the per-language hash sampler above.)
    QueryDef("corpus_quality_strata",
      (s, d) => CorpusOps.stratifiedQualitySample(t(s, d, "documents"),
        stopwords, 10, 10, "strat"),
      Some {
        val w = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""
        s"""WITH q AS MATERIALIZED (SELECT doc_id,
            coalesce(round(CAST(len(list_filter($w,
              t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE) /
              len($w), 4), -1.0) AS score
          FROM documents),
          r AS (SELECT doc_id, score,
            row_number() OVER (ORDER BY score, doc_id) AS rk,
            count(*) OVER () AS n FROM q),
          b AS (SELECT doc_id, score, ((rk - 1) * 10) // n AS bucket FROM r),
          s AS (SELECT *, row_number() OVER (PARTITION BY bucket
            ORDER BY ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
              doc_id) AS srk FROM b)
          SELECT doc_id, bucket::BIGINT AS bucket, score FROM s
          WHERE srk <= 10 ORDER BY doc_id"""
      }, bench = true))
}
