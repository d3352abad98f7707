package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared query per implemented operator (SURVEY.md §2 inventory +
  * the LLM-pipeline north-star operators), each with equivalent ANSI SQL
  * the driver runs in DuckDB over the same parquet tables.
  *
  * Oracle-matching rules (learned the hard way, keep in sync):
  *  - integer outputs are BIGINT on both sides (Spark `size`/`year`/
  *    `row_number` are cast to long; DuckDB `sum(int)` is cast from
  *    HUGEINT to BIGINT);
  *  - float aggregates are `round`ed (2–6 dp) — FP summation order is
  *    nondeterministic in both engines;
  *  - every query ORDER BYs its full output for stable row order;
  *  - hashes are md5 (identical hex in both engines), never xxhash.
  */
final case class QueryDef(
  name: String,
  build: (SparkSession, String) => DataFrame,
  oracle: Option[String],
  bench: Boolean = false)

object Registry {

  /** Table loader. The driver's `events.ts` annotation has varied across
    * testdata generations — TIMESTAMP(NANOS) (Spark 4 refuses by default;
    * read nanos as long via the legacy conf and rebuild a µs timestamp,
    * `div 1000` truncation matching DuckDB's ns→µs cast) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark reads TIMESTAMP_NTZ;
    * reinterpret as UTC instant — session timeZone is pinned to UTC, and
    * DuckDB's `CAST(ts AS TIMESTAMP)` is the same naive-µs no-op). Branch
    * on the schema actually read so both generations load identically. */
  def table(s: SparkSession, dir: String, n: String): DataFrame = t(s, dir, n)

  private[queries] def t(s: SparkSession, dir: String, n: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$n.parquet")
    if (n == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df // already a zoned timestamp
      }
    } else df
  }

  /** Per-JVM memoized IVF-PQ index dir for `sim_ivfpq_search` — train
    * once, search many. Keyed by sf dir; a fresh temp dir per JVM means
    * a regenerated testdata set can never collide with a stale index
    * (the cross-process staleness a fixed path would invite). */
  private[queries] val ivfPqDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def ivfPqIndexDir(s: SparkSession, d: String): String =
    ivfPqDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
      Similarity.writeIvfPq(t(s, d, "embeddings"), dir,
        nCells = 8, m = 16, ksub = 32, rounds = 3)
      dir
    })

  /** Per-JVM memoized k-means centroid dir for
    * `corpus_cluster_sample_only` — train once, sample many (the
    * `sim_ivfpq_search` pattern: under min-of-N, round 1 pays Lloyd's
    * iterations, later rounds measure the pure sampling plan). Same
    * (k=8, rounds=3) as the train+sample row. */
  private[queries] val kmeansDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def kmeansCentroidDir(s: SparkSession, d: String): String =
    kmeansDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_kmeans_cents").toString
      Similarity.writeKmeansCentroids(t(s, d, "embeddings"), dir,
        k = 8, rounds = 3)
      dir
    })

  /** Clustering-independent invariant panel shared by
    * `corpus_cluster_sample` (train+sample) and
    * `corpus_cluster_sample_only` (read-back centroids): per-cell quota
    * exactness, full coverage, winner distinctness — true for ANY
    * centroid set, which is what makes the surface oracle-able. */
  private[queries] def clusterSampleSurface(s: SparkSession, emb: DataFrame,
                                   smp: DataFrame): DataFrame = {
    val perCell = smp.groupBy("cell")
      .agg(count(lit(1)).as("n_smp"), first(col("n_cell")).as("nc"))
    val pc = perCell.agg(
      sum(when(col("n_smp") === least(col("nc"), lit(25L)), 0L)
        .otherwise(1L)).as("bad"),
      sum(col("nc")).as("covered")).head()
    val n = smp.count()
    val dn = smp.select("vec_id").distinct().count()
    // null embeddings are excluded by the sampler's contract — the
    // coverage invariant counts the sampleable corpus, not raw rows
    val nCorpus = emb.filter(col("embedding").isNotNull).count()
    import s.implicits._
    Seq((nCorpus, pc.getLong(0) == 0L, pc.getLong(1) == nCorpus, dn == n))
      .toDF("n_corpus", "quota_ok", "coverage_ok", "distinct_ok")
  }

  /** The IVF-PQ selection-quality surface shared by `sim_ivfpq_topk`
    * (train+search) and `sim_ivfpq_search` (read-back index): ADC
    * top-10 at nProbe=4 vs brute-force exact — raw recall@10 on
    * unstructured random embeddings is too unstable to oracle
    * (measured 1–7 hits across SFs), so the oracled invariant is that
    * the mean TRUE cosine of the ADC-selected 10 sits within 0.15 of
    * the exact top-10's mean and clears 0.15 absolutely (random-pick
    * baseline ~0.0 ± 0.04; measured gap ≤ 0.078, floor ≥ 0.234). */
  private[queries] def ivfPqSelectionSurface(s: SparkSession, emb: DataFrame,
                                    cc: DataFrame, cb: DataFrame,
                                    codes: DataFrame,
                                    refine: Option[Int] = None): DataFrame = {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val sel = (refine match {
      case Some(r) =>
        Similarity.ivfPqTopKRefined(emb, cc, cb, codes, qids, 10, nProbe = 4, refine = r)
      case None =>
        Similarity.ivfPqTopK(emb, cc, cb, codes, qids, 10, nProbe = 4)
    }).select(col("query_id"), col("vec_id"))
    val exact = Similarity.bruteForceTopK(emb, qids, 10)
      .select(col("query_id"), col("vec_id"))
    val corpus = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val qv = corpus.filter(col("vec_id").isInCollection(qids))
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    def meanTrueCos(picks: DataFrame, out: String): DataFrame =
      picks.join(corpus, "vec_id").join(broadcast(qv), "query_id")
        .select(col("query_id"),
          (aggregate(zip_with(col("vec"), col("qvec"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) /
            (sqrt(aggregate(transform(col("vec"), x => x * x),
              lit(0.0), (acc, x) => acc + x)) *
             sqrt(aggregate(transform(col("qvec"), x => x * x),
               lit(0.0), (acc, x) => acc + x)))).as("cos"))
        .groupBy("query_id").agg(avg("cos").as(out))
    import s.implicits._
    emb.filter(col("vec_id").isInCollection(qids) && col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"))
      .join(meanTrueCos(sel, "sel_cos"), Seq("query_id"), "left")
      .join(meanTrueCos(exact, "exact_cos"), Seq("query_id"), "left")
      .select(col("query_id"), lit(10L).as("k"),
        (coalesce(col("sel_cos"), lit(-1.0)) >=
          coalesce(col("exact_cos"), lit(1.0)) - 0.15 &&
         coalesce(col("sel_cos"), lit(-1.0)) >= 0.15).as("sel_ok"))
      .orderBy("query_id")
  }

  private[queries] val ivfPqSelectionOracle: String =
    """SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
      TRUE AS sel_ok FROM embeddings
      WHERE vec_id < 5 AND embedding IS NOT NULL
      ORDER BY query_id"""

  // deterministic heuristic inputs (mirrored literally in oracle SQL)
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("batch", "stream"), "en" -> Seq("the", "a"),
    "es" -> Seq("data", "value"), "fr" -> Seq("merge", "join"),
    "zh" -> Seq("spark", "vector"))
  val stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Pinned sentiment-ish lexicon for `txt_lexicon_score` — injected
    * verbatim into BOTH the Spark call and the oracle VALUES list. */
  val scoringLexicon: Seq[(String, Int)] = Seq(
    "fast" -> 3, "slow" -> -3, "merge" -> 2, "join" -> 1,
    "query" -> 2, "error" -> -2, "spill" -> -2, "broken" -> -3)

  /** Candidate vocab sizes for `txt_oov_curve` — one Scala value feeds
    * the Spark call and the oracle unnest list. */
  val oovVocabSizes: Seq[Long] = Seq(16L, 64L, 256L, 1024L, 4096L)

  /** Pinned BPE merge table for `txt_bpe_apply` — rank = position.
    * Hand-laid over the synthetic vocabulary to exercise multi-round
    * full-word merges (join/scan/sort/data/the), merged-symbol rules
    * ((at,a), (s,ort)), rank-priority conflicts (order: (e,r) rank 1
    * beats (o,r) rank 2) and partial fixpoints (query → q u ery).
    * Shared verbatim by the Spark expression and the generated oracle
    * CASE chain — zero literal drift. */
  val bpeMerges: Seq[(String, String)] = Seq(
    "a" -> "t", "e" -> "r", "o" -> "r", "t" -> "h", "th" -> "e",
    "j" -> "o", "jo" -> "i", "joi" -> "n", "s" -> "c", "sc" -> "a",
    "sca" -> "n", "or" -> "t", "s" -> "ort", "er" -> "y",
    "at" -> "a", "d" -> "ata")

  /** HTML scaffold for `corpus_extract_html` — documents.text is plain
    * prose, so the fixture forges markup damage in-plan, identically in
    * both engines (the corpus_fix_encoding pattern). Deliberately
    * quote-free so the literals embed in SQL unescaped; exercises every
    * [[graft.analytics.Cleaning.htmlBlockPatterns]] pass and every
    * [[graft.analytics.Cleaning.htmlEntities]] entry. */
  private[queries] def htmlFixturePre: String =
    "<html><head><script>var x = 1;</script><style>p { color: red }" +
      "</style></head><body><!-- nav --><h1>Title &amp; Summary</h1><p>"
  private[queries] def htmlFixtureSuf: String =
    "</p><br><div>footer &lt;eof&gt; &#39;q&#39;&nbsp;&quot;z&quot;" +
      "</div></body></html>"

  private[queries] def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Sentence-terminator forge shared by `corpus_chunk_sentences` and
    * `txt_readability` — the corpus has no natural punctuation, so a
    * deterministic terminator ('.', '!', '?' or nothing, chosen by
    * (i·31 + doc_id) mod 9) is appended per token, with the IDENTICAL
    * integer arithmetic in the Spark plan and the oracle CTE. */
  private[queries] def forgeSentences(df: DataFrame): DataFrame =
    df.withColumn("text",
      when(col("text").isNotNull, concat_ws(" ",
        transform(TextAnalysis.tokens(col("text")), (tk, i) =>
          concat(tk, element_at(
            array(lit("."), lit("!"), lit("?"), lit(""), lit(""),
              lit(""), lit(""), lit(""), lit("")),
            (pmod(i.cast("long") * 31 + col("doc_id"), lit(9)) + 1)
              .cast("int")))))))

  /** The SFT-export record SQL shared by `corpus_sft_export` (verbatim,
    * + ORDER BY) and `corpus_sft_roundtrip` (as the CTE its JSON
    * re-parse reads) — both sides of every escape rule come from
    * [[CorpusOps.jsonEscapes]], zero literal drift. */
  private[queries] def sftExportSql: String = {
    def sqlLit(x: String): String = x match {
      case "\n" => "chr(10)"
      case "\r" => "chr(13)"
      case "\t" => "chr(9)"
      case other => "'" + other.replace("'", "''") + "'"
    }
    def esc(c: String): String = CorpusOps.jsonEscapes.foldLeft(c) {
      case (acc, (bad, good)) =>
        s"replace($acc, ${sqlLit(bad)}, ${sqlLit(good)})"
    }
    s"""WITH w AS (SELECT doc_id, source, $toksSql AS toks
        FROM documents WHERE text IS NOT NULL),
      f AS (SELECT doc_id, source,
        coalesce(array_to_string(toks[1:10], ' '), '') AS p,
        coalesce(array_to_string(toks[11:], ' '), '') AS r,
        least(len(toks), 10) AS np,
        greatest(len(toks) - 10, 0) AS nr FROM w)
      SELECT doc_id,
        '{"messages":[{"role":"system","content":"source: ' ||
          ${esc("source")} ||
          '"},{"role":"user","content":"Continue: ' || ${esc("p")} ||
          '"},{"role":"assistant","content":"' || ${esc("r")} ||
          '"}]}' AS record,
        np::BIGINT AS n_prompt_tokens, nr::BIGINT AS n_response_tokens
      FROM f"""
  }

  /** The oracle half of [[forgeSentences]]: a CTE named `b` yielding
    * (doc_id, text) with forged terminators. */
  private[queries] def forgedSentencesCte: String =
    s"""b AS (
        SELECT doc_id, CASE WHEN text IS NULL THEN NULL ELSE
          array_to_string(list_transform(range(1, len(toks)+1), i ->
            toks[i] || CASE ((i-1)*31 + doc_id) % 9
              WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?'
              ELSE '' END), ' ')
          END AS text
        FROM (SELECT doc_id, text, $toksSql AS toks FROM documents))"""

  // ---------------- relational (TPC-H-style analytics layer) ----------

  // ---------------- metrics (A-series over events) --------------------

  // ---------------- P-series scalar ops over events/documents ---------

  // ---------------- UDM pipeline (synth packets → full transform) -----

  // ---------------- text analysis -------------------------------------

  private[queries] val bm25Terms = Seq("spark", "vector", "merge", "customer", "window")

  private[queries] def toksSql = """regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')"""


  // ---------------- dedup ---------------------------------------------

  private[queries] def shinglesSql(w: String) =
    s"""CASE WHEN len($w) >= 3
        THEN list_transform(range(1, len($w) - 1), i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])
        ELSE [] END"""

  /** Shared CTE prefix for the repeated-span family (ExactSubstr):
    * tokens → positioned 3-gram hashes → df > 2 frequent set → hits →
    * gaps-and-islands → maximal `spans(doc_id, span_start, span_end,
    * n_grams)`. Mirrors [[Dedup.repeatedSpans]](n=3, maxDocFreq=2). */
  private[queries] def repeatedSpansCte =
    s"""toksw AS (SELECT doc_id, $toksSql AS w FROM documents),
      grams AS (SELECT doc_id,
        unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(0, len(w) - 3 + 1),
          i -> md5(array_to_string(w[i+1:i+3], ' '))) ELSE [] END) AS gh,
        unnest(CASE WHEN len(w) >= 3 THEN range(0, len(w) - 3 + 1) ELSE [] END) AS pos
      FROM toksw),
      freq AS (SELECT gh FROM grams GROUP BY gh HAVING count(DISTINCT doc_id) > 2),
      hits AS (SELECT doc_id, pos::BIGINT AS pos, (pos + 3)::BIGINT AS epos
        FROM grams WHERE gh IN (SELECT gh FROM freq)),
      flagged AS (SELECT doc_id, pos, epos,
        CASE WHEN max(epos) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
          OR pos > max(epos) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          THEN 1 ELSE 0 END AS new_span FROM hits),
      islands AS (SELECT *, sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
        ROWS UNBOUNDED PRECEDING) AS island FROM flagged),
      spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
        max(epos)::BIGINT AS span_end, count(*)::BIGINT AS n_grams
        FROM islands GROUP BY doc_id, island)"""

  /** Hash j = 8-hex slice (j%4) of md5 of seed group (j/4) || shingle —
    * the single source of truth for the slice scheme, mirroring
    * [[Dedup.minhashSignatures]]. */
  private[queries] def minhashSliceSql(j: Int, shingleVar: String = "sh") =
    s"list_min(list_transform($shingleVar, x -> substr(md5('${j / 4}:' || x), ${1 + 8 * (j % 4)}, 8)))"

  /** Shared CTE prefix for the MinHash-LSH SQL mirrors (k=3 shingles,
    * 8 hashes, 2 bands of 4): words → shingles → signature slots →
    * banded keys. Used by dedup_minhash_pairs and the jaccard verifier
    * it feeds. */
  private[queries] def minhashBandsCtes: String = minhashBandsCtesFor("", "")

  /** Parameterized variant: `where` restricts the document subset,
    * `p` prefixes every CTE name so two instantiations (e.g. corpus
    * vs incoming) can coexist in one WITH clause, `src` swaps the
    * source relation (a remapping CTE for cross-corpus fixtures). */
  private[queries] def minhashBandsCtesFor(where: String, p: String,
                                  src: String = "documents"): String = {
    val hs = (0 until 8).map(j => s"${minhashSliceSql(j)} AS h$j").mkString(", ")
    val sigList = (0 until 8).map(j => s"h$j").mkString("[", ", ", "]")
    val bandKeys = (0 until 2).map { b =>
      val slots = (0 until 4).map(r => s"sig[${b * 4 + r + 1}]").mkString(" || '|' || ")
      s"SELECT doc_id, sig, $b AS band, md5($slots) AS key FROM ${p}sig"
    }.mkString(" UNION ALL ")
    s"""${p}words AS (SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS w FROM $src $where),
      ${p}sh AS MATERIALIZED (SELECT doc_id, ${shinglesSql("w")} AS sh FROM ${p}words),
      ${p}sigs AS (SELECT doc_id, $hs FROM ${p}sh),
      ${p}sig AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM ${p}sigs),
      ${p}bands AS ($bandKeys)"""
  }

  /** SRP-LSH bucket mirror (over a `vec` DOUBLE list column): plane p's
    * ±1 components from bit 0 of md5("p:i"); same left-to-right double
    * summation as the Spark side. Shared by sim_lsh_topk and the
    * embedding near-dup verifier. */
  private[queries] def srpBucketSql(nBits: Int): String = (0 until nBits).map { p =>
    val elem = s"CASE WHEN (('0x' || substr(md5('$p:' || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT & 1) = 1 THEN vec[i] ELSE -vec[i] END"
    s"CASE WHEN list_sum(list_transform(range(1, len(vec) + 1), i -> $elem)) >= 0 THEN ${1 << p} ELSE 0 END"
  }.mkString(" + ")

  /** SimHash fingerprint CTEs (toks → per-bit votes → 64-bit fp as two
    * 32-bit halves `hi`/`lo`), mirroring [[Dedup.simhash]]'s math —
    * shared by the fingerprint query and the Hamming pair query. */
  private[queries] val simhashFpCtes: String = {
    def votes(half: String, off: Int) = (0 until 32).map(b =>
      s"CAST(sum(CASE WHEN ((('0x' || substr(md5(tok), $off, 8))::BIGINT >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS ${half}$b").mkString(", ")
    def fp(half: String) = (0 until 32).map(b =>
      s"CASE WHEN ${half}$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
      .mkString(" | ")
    s"""toks AS MATERIALIZED (SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
        FROM documents),
      v AS MATERIALIZED (SELECT doc_id, ${votes("hi", 1)}, ${votes("lo", 9)} FROM toks GROUP BY doc_id),
      fp AS MATERIALIZED (SELECT doc_id, ${fp("hi")} AS hi, ${fp("lo")} AS lo FROM v)"""
  }


  // ---------------- similarity search ---------------------------------

  // ---------------- multimodal ----------------------------------------

  // ---------------- corpus assembly (selection / mixing / budgeting) --

  private[queries] val corpusLangs = Seq("de", "en", "fr")
  // 0.3 is deliberately non-dyadic: it exercises the shared-floor
  // threshold (an engine-local float rate*2^32 would diverge here)
  private[queries] val sampleRates = Seq("en" -> 0.3, "zh" -> 0.25) // others: 1.0


  val all: Seq[QueryDef] =
    RegistryRelational.defs ++ RegistryMetrics.defs ++
      RegistryScalars.defs ++ RegistryUdm.defs ++ RegistryText.defs ++
      RegistryDedup.defs ++ RegistrySimilarity.defs ++
      RegistryMultimodal.defs ++ RegistryCorpus.defs

  // a duplicated name would silently SHADOW the earlier query in the
  // maps below (Map last-wins) — the earlier operator's oracle coverage
  // would vanish without any failure; fail loud at class init instead
  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names: " + all.groupBy(_.name).collect {
      case (n, ds) if ds.size > 1 => n }.mkString(", "))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** Deterministic mixture-of-Gaussians embedding fixture for the ANN
    * recall oracles (r13 verdict #5): the shipped `embeddings` table is
    * uniform-random, which has NO cluster structure — flattering to
    * nobody and actively unflattering to IVF (every cell holds a slice
    * of every query's true neighbors, so low-probe recall is luck).
    * This forge keeps the table's SF-scaled id universe and labels but
    * replaces each vector with `center(vec_id % nClusters) + sigma·z`:
    * centers are 3.0·one-hot blocks of dim/nClusters coordinates
    * (pairwise distance 3√2 ≫ sigma — separable by construction), and
    * z is a per-(id, dim) Box-Muller gaussian over two md5 coins (the
    * corpus_dp_release inverse-CDF discipline: (k+0.5)/2⁴⁸ keeps u
    * strictly inside (0,1), so ln/cos never hit a pole). Fully
    * deterministic — same fixture every run, any engine.
    * Fixture-gen only (interpreted-HOF cost is paid once per query,
    * bounded by rows × dim, never part of the measured operator). */
  def forgeClusteredEmbeddings(
      s: SparkSession, d: String, dim: Int = 32, nClusters: Int = 8,
      sigma: Double = 0.5): DataFrame = {
    require(dim % nClusters == 0, s"dim $dim must divide into $nClusters blocks")
    val block = dim / nClusters
    def u(salt: String) =
      s"""(CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), '_',
         |CAST(j AS STRING), '_$salt')), 1, 12), 16, 10) AS DOUBLE) + 0.5d)
         | / 281474976710656.0d""".stripMargin.replaceAll("\n", " ")
    t(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        (col("vec_id") % nClusters).cast("int").as("__c"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           |CAST((CASE WHEN j div $block = __c THEN 3.0d ELSE 0.0d END)
           |  + $sigma * sqrt(-2.0d * ln(${u("u1")}))
           |    * cos(2.0d * pi() * ${u("u2")}) AS FLOAT))"""
          .stripMargin.replaceAll("\n", " ")))
      .select(col("vec_id"), col("label"), col("embedding"))
  }

  /** Queries whose BUILD executes heavy work — a bounded streaming
    * drain, or ANN training over a forged fixture — so the DataFrame
    * that comes back is a summary over executed results, not a plan
    * worth pinning; PlanLintSpec and PlanManifestGen both skip these
    * (linting them would EXECUTE the drain/training just to stringify
    * a summary plan). */
  val planExempt: Set[String] = Set(
    "a3_file_latency", "stream_monitoring_panel", "stream_skew_alerts",
    // forge + localCheckpoint + kmeans/IVF-PQ training run at build
    // time; their plan shape is a joined summary over trained models
    "sim_ivf_recall_clustered", "sim_ivfpq_recall_clustered",
    "sim_ivfpq_recall_refined")

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").trim)).toMap

  val benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
