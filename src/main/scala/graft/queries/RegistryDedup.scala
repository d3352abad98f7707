package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `dedup` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryDedup {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_exact",
      (s, d) => Dedup.exactDuplicates(t(s, d, "documents")),
      Some("""SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        min(doc_id) AS keep_doc_id, count(*) AS group_size,
        coalesce(string_agg(DISTINCT lang, ',' ORDER BY lang), '') AS langs
        FROM documents GROUP BY 1 ORDER BY keep_doc_id"""), bench = true),

    QueryDef("dedup_minhash_signatures",
      (s, d) => {
        val sig = Dedup.minhashSignatures(t(s, d, "documents"), 3, 8)
        sig.select(col("doc_id"),
          concat_ws("-", (0 until 8).map(i => coalesce(col(s"h$i"), lit(""))): _*).as("sig"))
          .orderBy("doc_id")
      },
      Some {
        val hs = (0 until 8).map(j => s"coalesce(${minhashSliceSql(j)}, '')")
        s"""WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS w
            FROM documents),
          sh AS MATERIALIZED (SELECT doc_id, ${shinglesSql("w")} AS sh FROM words)
          SELECT doc_id, ${hs.mkString(" || '-' || ")} AS sig
          FROM sh ORDER BY doc_id"""
      }, bench = true),

    QueryDef("dedup_simhash",
      (s, d) => Dedup.simhash(t(s, d, "documents")),
      Some {
        s"""WITH $simhashFpCtes
          SELECT doc_id, hi AS simhash_hi, lo AS simhash_lo
          FROM fp ORDER BY doc_id"""
      }),

    // Hamming-banded near-dup — the SimHash family's verify stage: four
    // 16-bit bands of the 64-bit fingerprint (pigeonhole: distance <= 3
    // pairs share a band exactly), equi-join on (band, key), then
    // popcount(xor) <= 3 verify. Oracle mirrors fingerprints AND the
    // band join with portable bit ops (bit_count / xor / shifts).
    QueryDef("dedup_simhash_pairs",
      (s, d) => Dedup.simhashNearDupPairs(t(s, d, "documents"), 3),
      Some {
        s"""WITH $simhashFpCtes,
          bands AS (
            SELECT doc_id, hi, lo, 0 AS band, (hi >> 16) & 65535 AS key FROM fp
            UNION ALL SELECT doc_id, hi, lo, 1, hi & 65535 FROM fp
            UNION ALL SELECT doc_id, hi, lo, 2, (lo >> 16) & 65535 FROM fp
            UNION ALL SELECT doc_id, hi, lo, 3, lo & 65535 FROM fp),
          pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
            CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
          FROM pairs
          WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 3
          ORDER BY doc_a, doc_b"""
      }, bench = true),

    // Incremental corpus admission — dedup an incoming batch against
    // the EXISTING corpus via its signature bands (computed once,
    // writeSignatures-persistable), without re-scanning the corpus:
    // semi-join marks band collisions, anti-join admits the rest.
    // Even doc_ids play the corpus, odd ones the incoming batch.
    QueryDef("corpus_admit_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpusSig = Dedup.minhashSignatures(
          docs.filter(col("doc_id") % 2 === 0), 3, 8)
        Dedup.admitNewDocuments(docs.filter(col("doc_id") % 2 === 1),
            corpusSig, 3, 8, 4)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy("doc_id")
      },
      Some {
        s"""WITH ${minhashBandsCtesFor("WHERE doc_id % 2 = 0", "c")},
          ${minhashBandsCtesFor("WHERE doc_id % 2 = 1", "n")},
          dup AS (SELECT DISTINCT n.doc_id FROM nbands n JOIN cbands c
            ON n.band = c.band AND n.key = c.key)
          SELECT doc_id, lang, source FROM documents
          WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)
          ORDER BY doc_id"""
      }, bench = true),

    // Cluster formation — the stage AFTER pairs: connected components
    // of the candidate graph (pairs alone under-merge: A~B, B~C means
    // {A,B,C} is ONE group). Spark side is iterative min-label
    // propagation; the oracle computes the same components with a
    // recursive transitive-closure CTE. cluster_id = min doc_id of the
    // component; singletons are their own cluster.
    QueryDef("dedup_clusters",
      (s, d) => Dedup.duplicateClusters(t(s, d, "documents"), 3, 8, 4),
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
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
          SELECT d.doc_id, least(d.doc_id, coalesce(m.mn, d.doc_id)) AS cluster_id
          FROM documents d LEFT JOIN
            (SELECT src, min(dst) AS mn FROM reach GROUP BY src) m
            ON m.src = d.doc_id
          ORDER BY doc_id"""
      }, bench = true),

    // quality-aware survivors: keep the LONGEST doc per near-dup
    // cluster (argmax n_chars, min-id ties) — combinable struct-max,
    // recursive-CTE clusters + row_number argmax in the oracle
    QueryDef("dedup_keep_best",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.keepBestPerCluster(
          Dedup.duplicateClusters(docs, 3, 8, 4),
          docs.select(col("doc_id"), col("n_chars").cast("double").as("score")))
      },
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
              ON m.src = d.doc_id),
          sc AS (SELECT cl.doc_id, cl.cluster_id, dd.n_chars::DOUBLE AS score
            FROM cl JOIN documents dd ON dd.doc_id = cl.doc_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY coalesce(score, '-infinity'::DOUBLE) DESC, doc_id) AS rk,
            count(*) OVER (PARTITION BY cluster_id) AS n FROM sc)
          SELECT cluster_id, doc_id AS keep_doc_id, n::BIGINT AS n_docs,
            score AS keep_score
          FROM r WHERE rk = 1 ORDER BY cluster_id"""
      }),

    // PageRank over the MinHash candidate graph (template-hub triage):
    // 10 synchronous rounds unrolled as chained CTEs — the exact
    // recurrence both engines compute; 6 dp absorbs FP sum order
    QueryDef("dedup_pagerank",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.pagerankFromPairs(docs,
          Dedup.minhashCandidatePairs(docs, 3, 8, 4)
            .select(col("doc_a"), col("doc_b")))
      },
      Some {
        val iters = (1 to 10).map { i =>
          s"""pr$i AS (SELECT d.doc_id,
              0.15 / nn.n + 0.85 * coalesce(
                (SELECT sum(p.r / dg.deg) FROM sym e
                  JOIN pr${i - 1} p ON p.doc_id = e.src
                  JOIN deg dg ON dg.doc_id = e.src
                  WHERE e.dst = d.doc_id), 0) AS r
            FROM documents d CROSS JOIN nn)"""
        }.mkString(",\n")
        s"""WITH $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          sym AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
            UNION ALL SELECT doc_b, doc_a FROM cand),
          deg AS MATERIALIZED (SELECT src AS doc_id, count(*)::BIGINT AS deg FROM sym
            GROUP BY src),
          nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM documents),
          pr0 AS (SELECT doc_id, 1.0 / nn.n AS r FROM documents
            CROSS JOIN nn),
          $iters
          SELECT p.doc_id, round(p.r * nn.n, 6) AS rank_norm
          FROM pr10 p CROSS JOIN nn ORDER BY p.doc_id"""
      }, bench = true),

    // near-dup decontamination (removal form): MinHash band collision
    // vs the eval slice at agreement >= 4/8, anti-joined away — the
    // rewritten-leak complement of exact k-gram decontaminate
    QueryDef("corpus_decontaminate_neardup",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.decontaminateNearDup(docs.filter(col("doc_id") % 41 =!= 0),
          docs.filter(col("doc_id") % 41 === 0), 3, 8, 4, 0.5)
      },
      Some {
        s"""WITH adocs AS (SELECT * FROM documents WHERE doc_id % 41 <> 0),
          bdocs AS (SELECT * FROM documents WHERE doc_id % 41 = 0),
          ${minhashBandsCtesFor("", "a", "adocs")},
          ${minhashBandsCtesFor("", "b", "bdocs")},
          bad AS (SELECT DISTINCT a.doc_id FROM abands a JOIN bbands b
              ON a.key = b.key AND a.band = b.band
            WHERE a.key IS NOT NULL
              AND list_sum(list_transform(list_zip(a.sig, b.sig),
                p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) >= 4)
          SELECT doc_id, lang, source FROM adocs
          WHERE doc_id NOT IN (SELECT doc_id FROM bad)
          ORDER BY doc_id"""
      }, bench = true),

    // LSH banding S-curve advisor: pure model arithmetic, identical
    // literals in both engines (round-trip doubles), rounded pow
    QueryDef("dedup_lsh_tuning",
      (s, d) => Dedup.lshTuningTable(s, 8,
        Seq(0.3, 0.5, 0.7, 0.8, 0.9)),
      Some("""WITH rb AS (
          SELECT 1::BIGINT AS rows_per_band, 8::BIGINT AS n_bands
          UNION ALL SELECT 2, 4 UNION ALL SELECT 4, 2 UNION ALL SELECT 8, 1),
        js AS (SELECT unnest([0.3, 0.5, 0.7, 0.8, 0.9]::DOUBLE[]) AS jaccard)
        SELECT rows_per_band, n_bands,
          round(power(1.0 / n_bands, 1.0 / rows_per_band), 4) AS threshold_est,
          jaccard,
          round(1.0 - power(1.0 - power(jaccard, rows_per_band), n_bands), 6)
            AS p_candidate
        FROM rb CROSS JOIN js
        ORDER BY rows_per_band, jaccard"""),
      bench = false),

    // cluster-size histogram over the near-dup labeling: the dedup
    // yield report (keep-one removal volume) — same recursive CTE as
    // dedup_clusters, then two groupBys
    QueryDef("dedup_cluster_sizes",
      (s, d) => Dedup.clusterSizeReport(
        Dedup.duplicateClusters(t(s, d, "documents"), 3, 8, 4)),
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
              ON m.src = d.doc_id),
          sz AS (SELECT cluster_id, count(*)::BIGINT AS s FROM cl
            GROUP BY cluster_id)
          SELECT s AS cluster_size, count(*)::BIGINT AS n_clusters,
            (s * count(*))::BIGINT AS n_docs,
            ((s - 1) * count(*))::BIGINT AS n_removable
          FROM sz GROUP BY s ORDER BY cluster_size"""
      }),

    // soft dedup: 1/cluster_size weights over the same recursive-CTE
    // cluster labeling — keep-all-with-weights instead of removal
    QueryDef("dedup_soft_weights",
      (s, d) => Dedup.softDedupWeights(
        Dedup.duplicateClusters(t(s, d, "documents"), 3, 8, 4)),
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
              ON m.src = d.doc_id),
          sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
            FROM cl GROUP BY cluster_id)
          SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
            round(1.0 / sz.cluster_size, 6) AS weight
          FROM cl JOIN sz USING (cluster_id) ORDER BY doc_id"""
      }, bench = true),

    // LSH-then-verify: MinHash band candidates → exact Jaccard ≥ 0.8.
    // The oracle mirrors the full pipeline including the band join, so
    // the bucketed (100 TB-shape) path is exactly what gets verified.
    QueryDef("dedup_jaccard_pairs",
      (s, d) => Dedup.jaccardPairs(t(s, d, "documents"), 3, 8, 4, 0.8),
      Some {
        s"""WITH $minhashBandsCtes,
          cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          toks AS MATERIALIZED (SELECT doc_id,
            list_distinct(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS toks FROM documents),
          j AS (SELECT doc_a, doc_b,
            CAST(len(list_filter(ta.toks, t -> list_contains(tb.toks, t))) AS DOUBLE) /
              (len(ta.toks) + len(tb.toks) -
               len(list_filter(ta.toks, t -> list_contains(tb.toks, t)))) AS jac
            FROM cand JOIN toks ta ON ta.doc_id = doc_a JOIN toks tb ON tb.doc_id = doc_b)
          SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
          WHERE jac >= 0.8 ORDER BY doc_a, doc_b"""
      }, bench = true),

    // prefix-filter EXACT Jaccard join (AllPairs/PPJoin family): the
    // oracle brute-forces ALL pairs — a match proves the prefix
    // filter's no-false-negative guarantee, not just plan agreement
    QueryDef("dedup_prefix_jaccard",
      (s, d) => Dedup.prefixJaccardPairs(t(s, d, "documents"), 3, 0.5),
      Some("""WITH w AS (SELECT doc_id,
            regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS w
          FROM documents WHERE text IS NOT NULL),
        sh AS MATERIALIZED (SELECT doc_id,
            list_distinct([array_to_string(w[i:i+2], ' ')
              FOR i IN range(1, len(w) - 1)]) AS ts
          FROM w WHERE len(w) >= 3),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_filter(a.ts, x -> list_contains(b.ts, x)))::BIGINT AS inter,
            len(a.ts)::BIGINT AS na, len(b.ts)::BIGINT AS nb
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, inter AS n_shared,
          round(inter::DOUBLE / (na + nb - inter), 4) AS jaccard
        FROM p WHERE inter::DOUBLE / (na + nb - inter) >= 0.5
        ORDER BY doc_a, doc_b"""),
      bench = true),

    // ExactSubstr-family repeated spans: 3-gram hits with df > 2 merged
    // gaps-and-islands into maximal per-doc spans (token offsets)
    QueryDef("dedup_repeated_spans",
      (s, d) => Dedup.repeatedSpans(t(s, d, "documents"), 3, 2),
      Some {
        s"""WITH $repeatedSpansCte
          SELECT doc_id, span_start, span_end, n_grams
          FROM spans ORDER BY doc_id, span_start"""
      }, bench = true),

    // the removal half: token-rebuilt text with every spanned range cut
    // (the oracle rebuilds via explode + range anti-join; the engine
    // side is a narrow higher-order filter — same semantics)
    QueryDef("dedup_cut_spans",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.cutRepeatedSpans(docs, Dedup.repeatedSpans(docs, 3, 2))
      },
      Some {
        s"""WITH $repeatedSpansCte,
          toks2 AS (SELECT doc_id, unnest(w) AS tok,
            unnest(range(0, len(w))) AS pos FROM toksw),
          keep AS (SELECT t.doc_id, t.tok, t.pos FROM toks2 t
            WHERE NOT EXISTS (SELECT 1 FROM spans s
              WHERE s.doc_id = t.doc_id
                AND t.pos >= s.span_start AND t.pos < s.span_end)),
          agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_cut,
            count(*)::BIGINT AS n_kept FROM keep GROUP BY doc_id)
          SELECT d.doc_id, coalesce(a.text_cut, '') AS text_cut,
            (len($toksSql) - coalesce(a.n_kept, 0))::BIGINT AS n_tokens_removed
          FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
          ORDER BY d.doc_id"""
      }),

    // SRP-bucketed near-dup: pairs only within a shared LSH bucket, then
    // exact cosine ≥ threshold; oracle mirrors the bucket assignment.
    QueryDef("dedup_embedding_cosine",
      (s, d) => Dedup.embeddingNearDupPairs(t(s, d, "embeddings"), 4, 0.35),
      Some {
        s"""WITH v AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
          b AS (SELECT vec_id, vec, ${srpBucketSql(4)} AS bucket FROM v)
          SELECT id_a, id_b, round(cos, 4) AS cosine FROM (
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
              list_sum(list_transform(list_zip(a.vec, b2.vec), p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(a.vec, x -> x * x))) *
               sqrt(list_sum(list_transform(b2.vec, x -> x * x)))) AS cos
            FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
          WHERE cos >= 0.35 ORDER BY id_a, id_b"""
      }, bench = true),

    // hard-negative mining: top-k most-similar DIFFERENT-label
    // neighbors per query (contrastive-training negatives) — the label
    // exclusion lives in the broadcast-join predicate, top-k in the
    // graft_topk_tag heap
    QueryDef("sim_hard_negatives",
      (s, d) => Similarity.hardNegatives(t(s, d, "embeddings"), Seq(0L, 1L, 2L, 3L, 4L), 10),
      Some("""WITH v AS MATERIALIZED (SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
        q AS MATERIALIZED (SELECT vec_id AS qid, vec AS qvec, label AS qlabel FROM v WHERE vec_id < 5),
        sc AS (SELECT q.qid, v.vec_id, v.label,
          list_sum(list_transform(list_zip(q.qvec, v.vec), p -> p[1] * p[2])) /
          (sqrt(list_sum(list_transform(q.qvec, x -> x * x))) *
           sqrt(list_sum(list_transform(v.vec, x -> x * x)))) AS cos
          FROM q, v WHERE v.vec_id <> q.qid AND v.label <> q.qlabel)
        SELECT qid AS query_id, vec_id, label, cosine, rk FROM (
          SELECT qid, vec_id, label, round(cos, 4) AS cosine,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM sc)
        WHERE rk <= 10 ORDER BY query_id, rk""")),

    // SemDeDup: within-cluster (label cell) exact-cosine pruning with
    // the deterministic earlier-id keeper. Exact pairs inside cells
    // only — the oracle self-joins on label and precomputes norms once
    QueryDef("dedup_semantic",
      (s, d) => Dedup.semanticDedup(t(s, d, "embeddings"), 0.3),
      Some {
        s"""WITH v AS MATERIALIZED (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings WHERE embedding IS NOT NULL),
          n AS MATERIALIZED (SELECT vec_id, label, vec,
            sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm FROM v),
          dups AS (SELECT b.vec_id, count(*)::BIGINT AS n_earlier_dups
            FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]))
              / (a.nrm * b.nrm) >= 0.3
            GROUP BY b.vec_id)
          SELECT v.vec_id, v.label::BIGINT AS label,
            coalesce(d.n_earlier_dups, 0)::BIGINT AS n_earlier_dups,
            coalesce(d.n_earlier_dups, 0) = 0 AS is_kept
          FROM v LEFT JOIN dups d USING (vec_id) ORDER BY vec_id"""
      }, bench = true),

    // Semantic admission batch twin (r14 verdict #2): the SAME
    // Dedup.semanticAdmit the streaming semanticAdmissionPipeline runs
    // per micro-batch, exercised over a forged store/incoming split of
    // the embeddings table — store = even vec_ids (SRP-bucketed),
    // incoming = odd vec_ids PLUS planted positive-scaled copies of
    // the %10 store vectors (×2.0 — SRP is sign-of-projection, so a
    // scaled copy lands in the SAME bucket with cosine ≈ 1: MUST be
    // rejected via the store; null-embedding incoming rows are
    // admitted untouched with a null bucket). The scaling happens
    // AFTER the double cast on BOTH engines so the floats are
    // bit-identical; cos >= tau compares unrounded doubles (the
    // dedup_embedding_cosine precedent).
    QueryDef("corpus_admit_semantic",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dim = Similarity.embeddingDim(emb)
        val vecd = transform(col("embedding"), x => x.cast("double"))
        val store = emb
          .filter(col("vec_id") % 2 === 0 && col("embedding").isNotNull)
          .select(Similarity.srpBucket(vecd, dim, 4).as("bucket"),
            vecd.as("vec"))
        val incoming = emb.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"), vecd.as("embedding"))
          .unionByName(emb
            .filter(col("vec_id") % 10 === 0 && col("embedding").isNotNull)
            .select((col("vec_id") + 10000000L).as("vec_id"),
              transform(vecd, x => x * lit(2.0d)).as("embedding")))
        Dedup.semanticAdmit(store, incoming, 0.35, 4, Some(dim))
          .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
            col("n_store_dups").cast("long").as("n_store_dups"),
            col("n_batch_earlier_dups").cast("long").as("n_batch_earlier_dups"),
            col("admitted"))
          .orderBy("vec_id")
      },
      Some {
        def cos(a: String, b: String) =
          s"""(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform($a, x -> x * x))) *
             sqrt(list_sum(list_transform($b, x -> x * x)))))"""
        s"""WITH base AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
          st AS MATERIALIZED (SELECT ${srpBucketSql(4)} AS bucket, vec
            FROM base WHERE vec_id % 2 = 0 AND vec IS NOT NULL),
          inc0 AS (SELECT vec_id, vec FROM base WHERE vec_id % 2 = 1
            UNION ALL
            SELECT vec_id + 10000000, list_transform(vec, x -> x * 2.0)
            FROM base WHERE vec_id % 10 = 0 AND vec IS NOT NULL),
          inc AS MATERIALIZED (SELECT vec_id, vec,
            CASE WHEN vec IS NULL THEN NULL ELSE ${srpBucketSql(4)} END AS bucket
            FROM inc0),
          sd AS (SELECT i.vec_id, count(*)::BIGINT AS n
            FROM inc i JOIN st s ON i.bucket = s.bucket
            WHERE ${cos("i.vec", "s.vec")} >= 0.35 GROUP BY i.vec_id),
          bd AS (SELECT b.vec_id, count(*)::BIGINT AS n
            FROM inc a JOIN inc b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE ${cos("a.vec", "b.vec")} >= 0.35 GROUP BY b.vec_id)
          SELECT i.vec_id, i.bucket::BIGINT AS bucket,
            coalesce(sd.n, 0)::BIGINT AS n_store_dups,
            coalesce(bd.n, 0)::BIGINT AS n_batch_earlier_dups,
            (coalesce(sd.n, 0) = 0 AND coalesce(bd.n, 0) = 0) AS admitted
          FROM inc i LEFT JOIN sd ON i.vec_id = sd.vec_id
          LEFT JOIN bd ON i.vec_id = bd.vec_id
          ORDER BY i.vec_id"""
      }, bench = true),

    // SEMANTIC decontamination (the embedding-space analog of the
    // n-gram gate — rephrased benchmark leakage shares no shingles but
    // lands at cosine ≈ 1): corpus = the embeddings table, eval =
    // ×2-scaled copies of the %10 vectors (SRP scale-invariance makes
    // the hit provable) plus ONE native odd vector; the oracle mirrors
    // the FULL bucket-join + cosine computation so incidental
    // same-bucket hits count identically on both engines
    QueryDef("corpus_decontaminate_semantic",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dim = Similarity.embeddingDim(emb)
        val vecd = transform(col("embedding"), x => x.cast("double"))
        val eval = emb
          .filter(col("vec_id") % 10 === 0 && col("embedding").isNotNull)
          .select(transform(vecd, x => x * lit(2.0d)).as("embedding"))
          .unionByName(emb
            .filter(col("vec_id") === 1 && col("embedding").isNotNull)
            .select(vecd.as("embedding")))
        Dedup.semanticDecontaminate(emb, eval, 0.35, 4, Some(dim))
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("n_eval_hits").cast("long").as("n_eval_hits"),
            col("is_kept"))
      },
      Some {
        def cos(a: String, b: String) =
          s"""(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
            (sqrt(list_sum(list_transform($a, x -> x * x))) *
             sqrt(list_sum(list_transform($b, x -> x * x)))))"""
        s"""WITH base AS MATERIALIZED (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
          ev0 AS (SELECT list_transform(vec, x -> x * 2.0) AS vec
              FROM base WHERE vec_id % 10 = 0 AND vec IS NOT NULL
            UNION ALL SELECT vec FROM base WHERE vec_id = 1 AND vec IS NOT NULL),
          ev AS MATERIALIZED (SELECT vec, ${srpBucketSql(4)} AS bucket FROM ev0),
          cb AS MATERIALIZED (SELECT vec_id, label, vec,
            CASE WHEN vec IS NULL THEN NULL ELSE ${srpBucketSql(4)} END AS bucket
            FROM base),
          h AS (SELECT c.vec_id, count(*)::BIGINT AS n
            FROM cb c JOIN ev e ON c.bucket = e.bucket
            WHERE ${cos("c.vec", "e.vec")} >= 0.35 GROUP BY c.vec_id)
          SELECT c.vec_id, c.label::BIGINT AS label,
            coalesce(h.n, 0)::BIGINT AS n_eval_hits,
            coalesce(h.n, 0) = 0 AS is_kept
          FROM cb c LEFT JOIN h USING (vec_id) ORDER BY vec_id"""
      }, bench = true),

    QueryDef("dedup_minhash_pairs",
      (s, d) => Dedup.minhashCandidatePairs(t(s, d, "documents"), 3, 8, 4),
      Some {
        // full LSH pipeline mirrored in SQL: signatures → 2 bands of 4
        // slots → band-key self-join → distinct pairs w/ agreement
        s"""WITH $minhashBandsCtes
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 8 AS sig_agreement
          FROM bands a JOIN bands b
            ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
          WHERE a.key IS NOT NULL
          ORDER BY doc_a, doc_b"""
      }, bench = true),

    // triangle enumeration on the near-dup graph (degree-ordered wedge
    // join — see Dedup.triangles): the minhash pair graph is sparse at
    // these SFs, so a deterministic ring fixture (i,i+1)+(i,i+2) over
    // the first 30 ids is unioned in (the forged-fixture pattern) to
    // exercise the operator on known dense structure; the oracle's
    // naive a<b<c 3-way join is plan-free of the degree ordering —
    // orientation changes the JOIN SHAPE, never the triangle set
    QueryDef("dedup_triangles",
      (s, d) => {
        val pairs = Dedup.minhashCandidatePairs(t(s, d, "documents"), 3, 8, 4)
          .select(col("doc_a"), col("doc_b"))
        val ring = s.range(29)
            .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
          .unionAll(s.range(28)
            .select(col("id").as("doc_a"), (col("id") + 2).as("doc_b")))
        Dedup.triangles(pairs.unionAll(ring))
      },
      Some {
        s"""WITH $minhashBandsCtes,
          mh AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          ring AS (SELECT i AS doc_a, i + 1 AS doc_b FROM range(29) t(i)
            UNION ALL SELECT i, i + 2 FROM range(28) t(i)),
          e AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM
            (SELECT * FROM mh UNION ALL SELECT * FROM ring))
          SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b, e2.doc_b AS doc_c
          FROM e e1 JOIN e e2 ON e1.doc_b = e2.doc_a
            JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
          ORDER BY doc_a, doc_b, doc_c"""
      }, bench = true),

    // k-core extraction (iterative peel, 24 pinned rounds — the
    // dedup_pagerank fixed-round pattern; fixture fixpoint is 16, spec
    // asserts convergence): minhash pairs + the ring (which cascades
    // away entirely at k=3 — every peel exposes the next node) + a
    // forged K5 at ids 40–44 (the dense family that SURVIVES)
    QueryDef("dedup_kcore",
      (s, d) => {
        val pairs = Dedup.minhashCandidatePairs(t(s, d, "documents"), 3, 8, 4)
          .select(col("doc_a"), col("doc_b"))
        val ring = s.range(29)
            .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
          .unionAll(s.range(28)
            .select(col("id").as("doc_a"), (col("id") + 2).as("doc_b")))
        import s.implicits._
        val k5 = (for { a <- 40L to 44L; b <- (a + 1) to 44L } yield (a, b))
          .toDF("doc_a", "doc_b")
        Dedup.kCore(pairs.unionAll(ring).unionAll(k5), k = 3, rounds = 24)
      },
      Some {
        // every e_r is referenced THREE times by round r+1 — without
        // MATERIALIZED, DuckDB's CTE inlining expands the chain ~3^24
        // (observed as a file-handle explosion on the parquet scan)
        val rounds = 24
        val iters = (1 to rounds).map { r =>
          s"""deg$r AS MATERIALIZED (SELECT v, count(*) AS d FROM
              (SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
              GROUP BY v),
            keep$r AS (SELECT v FROM deg$r WHERE d >= 3),
            e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
              JOIN keep$r ka ON ka.v = e.a JOIN keep$r kb ON kb.v = e.b)"""
        }.mkString(",\n")
        s"""WITH $minhashBandsCtes,
          mh AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            WHERE a.key IS NOT NULL),
          ring AS (SELECT i AS doc_a, i + 1 AS doc_b FROM range(29) t(i)
            UNION ALL SELECT i, i + 2 FROM range(28) t(i)),
          k5 AS (SELECT a.i AS doc_a, b.i AS doc_b
            FROM range(40, 45) a(i), range(40, 45) b(i) WHERE a.i < b.i),
          e0 AS MATERIALIZED (SELECT DISTINCT doc_a AS a, doc_b AS b FROM
            (SELECT * FROM mh UNION ALL SELECT * FROM ring
             UNION ALL SELECT * FROM k5)),
          $iters
          SELECT v AS doc_id, count(*)::BIGINT AS core_degree FROM
            (SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds)
          GROUP BY v ORDER BY doc_id"""
      }, bench = true),

    // cross-corpus near-dup audit: corpus A = documents, corpus B =
    // every 5th doc re-keyed +1,000,000 with UNCHANGED text — each B
    // doc must band-collide with its A original (plus any A near-dups
    // of it); the oracle instantiates the full MinHash CTE stack twice
    QueryDef("corpus_cross_pairs",
      (s, d) => {
        val docs = t(s, d, "documents")
        val b = docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        Dedup.crossCorpusPairs(docs, b, 3, 8, 4)
      },
      Some {
        s"""WITH bdocs AS (SELECT doc_id + 1000000 AS doc_id, text
            FROM documents WHERE doc_id % 5 = 0),
          ${minhashBandsCtesFor("", "a")},
          ${minhashBandsCtesFor("", "b", "bdocs")}
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 8 AS sig_agreement
          FROM abands a JOIN bbands b
            ON a.key = b.key AND a.band = b.band
          WHERE a.key IS NOT NULL
          ORDER BY doc_a, doc_b"""
      }, bench = true))
}
