package graft.queries

import graft.analytics._
import graft.metrics.Metrics
import graft.udm.{SynthPackets, UdmTransform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry._

/** The `multimodal` domain of the query registry, split out of
  * [[Registry]] (round 13) purely for file size: shared table
  * loaders, fixtures and SQL helpers stay on [[Registry]], and
  * composition + the fail-loud duplicate-name gate are unchanged
  * in [[Registry.all]]. */
private[queries] object RegistryMultimodal {

  /** The planted-pair audit surface shared by the four perceptual
    * near-dup queries (image/jpeg/audio/video): every doc_id%5==0 doc
    * gets ONE forged copy at doc_id+10⁷ (built by the caller with a
    * byte-different, perceptually-identical rendering), the pair
    * generator runs over base ∪ copies, and the audit left-joins the
    * planted pairs: bytes_differ (md5-checked in-plan), pair_found,
    * hamming_zero. The oracle for every instance is
    * [[plantedPairOracleSql]]. */
  private def plantedNearDupAudit(docs: org.apache.spark.sql.DataFrame,
      base: org.apache.spark.sql.DataFrame,
      copies: org.apache.spark.sql.DataFrame,
      pairsOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val pairs = pairsOf(base.unionByName(copies))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    val md5A = base.select(col("doc_id").as("doc_a"),
      md5(col("payload")).as("__ma"))
    val md5B = copies.select((col("doc_id") - 10000000L).as("doc_a"),
      md5(col("payload")).as("__mb"))
    docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + 10000000L).as("doc_b"))
      .join(md5A, Seq("doc_a")).join(md5B, Seq("doc_a"))
      .join(pairs, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        (col("__ma") =!= col("__mb")).as("bytes_differ"),
        col("hamming").isNotNull.as("pair_found"),
        (coalesce(col("hamming"), lit(-1L)) === 0L).as("hamming_zero"))
      .orderBy("doc_a")
  }

  private val plantedPairOracleSql: String =
    """SELECT doc_id AS doc_a, doc_id + 10000000 AS doc_b,
        TRUE AS bytes_differ, TRUE AS pair_found, TRUE AS hamming_zero
      FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_a"""

  val defs: Seq[QueryDef] = Seq(
    // REAL decode oracle: payloads are synthesized PNG/JPEG binaries
    // (even/odd doc_id) whose IHDR/SOF dimensions follow a doc_id
    // formula; Spark parses the BYTES (MediaDecode), DuckDB mirrors
    // the formula — a parser regression (wrong offset, endianness,
    // segment walk) hash-mismatches. content_hash (md5 over the
    // CRC-bearing binary) is not SQL-reconstructible and stays on the
    // decodeBatched surface, spec-covered.
    QueryDef("mm_media_features",
      (s, d) => Multimodal.mediaFeatures(t(s, d, "documents")),
      Some("""SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
          CAST((doc_id * 7) % 1920 + 1 AS INTEGER) AS width,
          CAST((doc_id * 13) % 1080 + 1 AS INTEGER) AS height,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 45 ELSE 33 END
            + coalesce(octet_length(encode(text)), 0) AS BIGINT) AS payload_bytes,
          round(CAST((doc_id * 7) % 1920 + 1 AS DOUBLE)
            / ((doc_id * 13) % 1080 + 1), 4) AS aspect
        FROM documents ORDER BY doc_id"""), bench = true),

    // LAION-style image gate on PARSED header dims: the oracle derives
    // width/height from the same synthesis formulas mm_media_features
    // proves the real parser reproduces; raw-division aspect compare
    QueryDef("mm_image_filter",
      (s, d) => Multimodal.imageFilter(t(s, d, "documents"), 64, 3.0),
      Some {
        val inv = s"CAST('${1.0 / 3.0}' AS DOUBLE)"
        s"""WITH m AS (SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
            CAST((doc_id * 7) % 1920 + 1 AS INTEGER) AS width,
            CAST((doc_id * 13) % 1080 + 1 AS INTEGER) AS height
          FROM documents)
          SELECT doc_id, format, width, height,
            round(width::DOUBLE / height, 4) AS aspect,
            (format IN ('png', 'jpeg') AND width >= 64 AND height >= 64
              AND width::DOUBLE / height <= 3.0
              AND width::DOUBLE / height >= $inv) AS keep
          FROM m ORDER BY doc_id"""
      }, bench = true),

    // SDXL-style aspect-ratio bucketing on parsed dims: EXACT integer
    // cross-product argmin (common-h drop + lcm(q) scaling), panel and
    // lcm injected from the same Scala values — zero literal drift
    QueryDef("mm_aspect_buckets",
      (s, d) => Multimodal.aspectBuckets(t(s, d, "documents")),
      Some {
        val rows = Multimodal.aspectBucketPanel.zipWithIndex.map {
          case ((p, q, name), i) => s"($i, $p, $q, '$name')"
        }.mkString(", ")
        val lcm = Multimodal.aspectBucketLcm
        s"""WITH m AS (SELECT doc_id,
            CAST((doc_id * 7) % 1920 + 1 AS INTEGER) AS width,
            CAST((doc_id * 13) % 1080 + 1 AS INTEGER) AS height
          FROM documents),
          e AS (SELECT doc_id, width, height, b.bucket,
              abs(width::BIGINT * b.q - b.p * height::BIGINT)
                * ($lcm // b.q) AS err, b.i
            FROM m CROSS JOIN
              (SELECT * FROM (VALUES $rows) v(i, p, q, bucket)) b),
          r AS (SELECT doc_id, width, height, bucket, err,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY err, i) AS rk
            FROM e)
          SELECT doc_id, width, height, bucket, err::BIGINT AS err_scaled
          FROM r WHERE rk = 1 ORDER BY doc_id"""
      }, bench = true),

    // byte-level near-dup over the binary modality: hex 8-byte grams
    // at 4-byte stride through the standard MinHash+LSH stack (gram =
    // k=1 shingle). Payload bound to utf8(text) so BOTH engines build
    // identical bytes (the mm fixtures' CRC-bearing PNGs cannot be
    // rebuilt in SQL — mm_payload_dedup's documented limit); forged
    // trailer-append copies at doc_id % 13 must band-collide with
    // their originals
    QueryDef("mm_payload_neardup",
      (s, d) => {
        val base = t(s, d, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val copies = base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("payload"),
              encode(lit(" tail tail tail"), "UTF-8")).as("payload"))
        Multimodal.payloadNearDupPairs(base.unionAll(copies))
      },
      Some {
        val hs = (0 until 8).map(j => s"${minhashSliceSql(j)} AS h$j")
          .mkString(", ")
        val sigList = (0 until 8).map(j => s"h$j").mkString("[", ", ", "]")
        val bandKeys = (0 until 2).map { b =>
          val slots = (0 until 4).map(r => s"sig[${b * 4 + r + 1}]")
            .mkString(" || '|' || ")
          s"SELECT doc_id, sig, $b AS band, md5($slots) AS key FROM psig"
        }.mkString(" UNION ALL ")
        s"""WITH pbase AS (SELECT doc_id, encode(text) AS payload
            FROM documents WHERE text IS NOT NULL),
          pcp AS (SELECT doc_id + 1000000 AS doc_id,
              payload || encode(' tail tail tail') AS payload
            FROM pbase WHERE doc_id % 13 = 0),
          pu AS (SELECT * FROM pbase UNION ALL SELECT * FROM pcp),
          ph AS (SELECT doc_id, hex(payload) AS h FROM pu),
          pg AS (SELECT doc_id,
              list_transform(range(0, (length(h) - 16) // 8 + 1),
                k -> substr(h, 1 + 8 * k, 16)) AS sh
            FROM ph WHERE length(h) >= 16),
          psigs AS (SELECT doc_id, $hs FROM pg),
          psig AS (SELECT doc_id, $sigList AS sig FROM psigs),
          pbands AS ($bandKeys)
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(list_sum(list_transform(list_zip(a.sig, b.sig),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 8
              AS sig_agreement
          FROM pbands a JOIN pbands b
            ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
          WHERE a.key IS NOT NULL
          ORDER BY doc_a, doc_b"""
      }, bench = true),

    // binary-modality exact dedup: the fixture forges REAL payload
    // collisions by synthesizing every doc's image from its doc_id
    // mod 50 base (same dims + same trailing text bytes ⇒ identical
    // binaries), so the md5 groups are exactly the mod-50 classes —
    // which the oracle derives from the SAME arithmetic without
    // rebuilding a CRC-bearing PNG in SQL
    // PERCEPTUAL image near-dup (r14 verdict #5): real pixel-bearing
    // grayscale PNGs (IDAT zlib + filter-0 scanlines); each doc_id%5==0
    // doc gets a RE-ENCODED copy — same pixels, zlib level 9 vs 1, new
    // doc_id — whose bytes differ (md5-checked in-plan) but whose dHash
    // is identical, so the pigeonhole band join MUST find it at
    // Hamming 0. DuckDB cannot inflate zlib, so the oracle pins the
    // planted-pair audit surface (the recall-panel discipline); the
    // full no-false-positive pair set is spec-pinned on a hand fixture.
    QueryDef("mm_image_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withPixelPayload(docs, level = 1),
          Multimodal.withPixelPayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            level = 9, pixelSeedOffset = 10000000L),
          Multimodal.imageNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    // PERCEPTUAL near-dup over the JPEG modality — the entropy decoder
    // (JpegDecode: Huffman + dequant + IDCT, baseline AND progressive)
    // feeding the same dHash + SimHash band join as the PNG path. Each
    // doc_id%5==0 doc gets a RE-EXPORT copy: PROGRESSIVE (SOF2)
    // re-encode of the same pixels PLUS a COM metadata segment — bytes
    // differ thoroughly (different entropy-coding order, md5-checked
    // in-plan), but same quality = same quant tables = same
    // coefficients, so the decoded pixels are BIT-identical
    // (spec-pinned) and the pair MUST surface at Hamming 0. The JPEGs
    // are REAL (ImageIO-encoded, the independent encoder); a decoder
    // that cannot entropy-decode SOF2 drops the copy row and
    // pair_found flips false — this query IS the progressive-coverage
    // gate. DuckDB cannot decode JPEG, so the oracle pins the
    // planted-pair audit surface (the mm_image_neardup discipline);
    // decode CORRECTNESS is the JpegDecodeSpec differential vs ImageIO.
    QueryDef("mm_jpeg_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withJpegPixelPayload(docs, quality = 0.9f),
          Multimodal.withJpegPixelPayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            quality = 0.9f, pixelSeedOffset = 10000000L,
            comment = Some("re-exported asset, same pixels"),
            progressive = true),
          Multimodal.imageNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    // PERCEPTUAL near-dup over the AUDIO modality: real PCM-bearing
    // WAVs (9-segment multi-tone fixture), fingerprinted by the
    // Haitsma-Kalker-shape band-energy gradient hash (wavPcmMono
    // decode + internal-8 kHz resample + Goertzel filterbank) through
    // the same SimHash band join. Each doc_id%5==0 doc gets a
    // RE-RENDERED copy — gain 0.5, 16-bit, stereo, RESAMPLED to
    // 44.1 kHz vs the 8-bit mono 8 kHz original: bytes differ
    // (md5-checked in-plan), band-energy ratios are identical after
    // the rate normalization, so the pair MUST surface at Hamming 0
    // (gain + rate invariance, measured 0 flips over 400 docs × 3
    // rates). DuckDB cannot decode PCM or run Goertzel, so the oracle
    // pins the planted-pair audit surface (the mm_image_neardup
    // discipline); decode+fingerprint semantics are spec-pinned
    // (gain/bit-depth/stereo/sample-rate invariance, containment).
    QueryDef("mm_audio_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withTonePayload(docs),
          Multimodal.withTonePayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            gain = 0.5, bits = 16, channels = 2, seedOffset = 10000000L,
            sr = 44100),
          Multimodal.audioNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    // COMPRESSED-audio near-dup: the copy is a FLAC re-export carrying
    // the FULL re-render stack (16-bit, stereo, gain 0.5, 44.1 kHz)
    // of the 8-bit mono 8 kHz WAV original — FLAC is lossless, so the
    // decoded doubles are bit-identical to an equivalent WAV's
    // (spec-pinned) and the fingerprint survives the container change
    // exactly like the gain/rate re-renders: Hamming 0. The decode
    // under test is the pure-JVM FLAC frame walk (fixed predictors +
    // Rice residuals); its correctness gate is the lossless
    // encode∘decode identity in MultimodalPropertySpec.
    QueryDef("mm_flac_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withTonePayload(docs),
          Multimodal.withFlacTonePayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            gain = 0.5, bits = 16, channels = 2, seedOffset = 10000000L,
            sr = 44100),
          Multimodal.audioNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    QueryDef("mm_payload_dedup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val base = docs.filter(col("doc_id") < 50)
          .select(col("doc_id").as("bid"), col("text").as("btext"))
        val remapped = docs.select(col("doc_id").as("real_id"),
            (col("doc_id") % 50).as("bid"))
          .join(base, Seq("bid"))
          .select(col("real_id"), col("bid").as("doc_id"),
            col("btext").as("text"))
        Multimodal.payloadDedup(
          Multimodal.withPayload(remapped), idCol = "real_id")
      },
      Some("""SELECT min(doc_id)::BIGINT AS keep_doc_id,
          count(*)::BIGINT AS group_size
        FROM documents GROUP BY doc_id % 50 ORDER BY keep_doc_id"""), bench = true),

    // audio WAV header decode: duration is derived from the PARSED
    // data-chunk length and byte rate — the oracle reconstructs both
    // from the synthesis formulas, so a match proves the RIFF walk
    // read real little-endian bytes, not a formula
    QueryDef("mm_audio_features",
      (s, d) => Multimodal.audioFeatures(t(s, d, "documents")),
      Some("""WITH a AS (SELECT doc_id,
            CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
              ELSE 44100 END AS sr,
            doc_id % 2 + 1 AS ch,
            CASE WHEN (doc_id // 2) % 2 = 0 THEN 8 ELSE 16 END AS bits,
            coalesce(octet_length(encode(text)), 0) AS data_len
          FROM documents)
        SELECT doc_id, 'wav' AS format,
          ch::BIGINT AS channels,
          sr::BIGINT AS sample_rate_hz,
          bits::BIGINT AS bits_per_sample,
          (data_len * 1000 // (sr * ch * (bits // 8)))::BIGINT AS duration_ms,
          (44 + data_len)::BIGINT AS payload_bytes
        FROM a ORDER BY doc_id""")),

    // PERCEPTUAL near-dup over the VIDEO modality — completes the
    // image/audio/video trilogy: GVID containers carrying REAL
    // pixel-bearing PNG frames; fingerprint = temporal majority pool
    // of per-frame dHashes. Each doc_id%5==0 doc gets a copy with
    // every frame RE-ENCODED (zlib 9 vs 1): container bytes differ
    // (md5-checked in-plan), frame pixels identical, so the pool is
    // bit-identical and the pair MUST surface at Hamming 0. Planted-
    // pair audit oracle (mm_image_neardup discipline); pooling
    // semantics spec-pinned.
    QueryDef("mm_video_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withVideoPixelPayload(docs, level = 1),
          Multimodal.withVideoPixelPayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            level = 9, pixelSeedOffset = 10000000L),
          Multimodal.videoNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    // PERCEPTUAL near-dup over REAL MJPEG-in-AVI containers — the
    // first real video container on the perceptual path (the GVID walk
    // above is a fixture stand-in): the RIFF/AVI demux
    // (MediaDecode.aviMjpegFrames) hands each 00dc chunk to the JPEG
    // entropy decoder, per-frame dHashes majority-pool exactly as for
    // GVID. Each doc_id%5==0 doc gets a RE-EXPORT copy: every frame
    // progressively re-encoded (SOF2 — pixel-identical bytes-different
    // per the spec-pinned coefficient argument) AND the container
    // JUNK-padded — bytes differ thoroughly (md5-checked in-plan), the
    // pooled fingerprint is bit-identical, so the pair MUST surface at
    // Hamming 0. Planted-pair audit oracle (mm_image_neardup
    // discipline); demux semantics spec-pinned (GVID/AVI fingerprint
    // equality on identical frames, truncation containment).
    QueryDef("mm_avi_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withAviPixelPayload(docs, quality = 0.9f),
          Multimodal.withAviPixelPayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            quality = 0.9f, pixelSeedOffset = 10000000L,
            progressive = true, junk = 64),
          Multimodal.videoNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    // the SAME real-container near-dup with frameStep=4 thinning — the
    // bounded-decode-cost path (only every 4th frame's entropy decode
    // runs; boundaries come free from the demux). The planted oracle
    // is UNCHANGED: a re-export copy has frame-aligned pixel-identical
    // content, so both sides thin to the same frame indices and the
    // pooled fingerprints stay bit-identical — Hamming 0 at any step.
    // Benched next to mm_avi_neardup to price the thinning.
    QueryDef("mm_avi_neardup_step4",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withAviPixelPayload(docs, quality = 0.9f),
          Multimodal.withAviPixelPayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            quality = 0.9f, pixelSeedOffset = 10000000L,
            progressive = true, junk = 64),
          Multimodal.videoNearDupPairs(_, frameStep = 4))
      },
      Some(plantedPairOracleSql), bench = true),

    // MP4 (ISO-BMFF) track metadata over REAL bytes: the box walk +
    // sample tables (stsd dims, mdhd duration/timescale, stsz count,
    // stco/co64 split by doc_id parity so BOTH offset widths parse)
    // against a doc_id formula oracle — a wrong box offset, a
    // big-endian misread, or a broken co64 path hash-mismatches
    QueryDef("mm_mp4_meta",
      (s, d) => Multimodal.mp4Features(t(s, d, "documents")),
      Some("""SELECT doc_id, 0::BIGINT AS track_idx,
          'vide' AS handler, 'jpeg' AS codec,
          (doc_id % 640 + 16)::BIGINT AS width,
          (doc_id % 360 + 9)::BIGINT AS height,
          ((doc_id % 7 + 1) * 1000 // 25)::BIGINT AS duration_ms,
          (doc_id % 7 + 1)::BIGINT AS n_samples
        FROM documents ORDER BY doc_id, track_idx"""), bench = true),

    // PERCEPTUAL near-dup over REAL MJPEG-in-MP4 — the dominant real
    // container joins the perceptual path: the ISO-BMFF sample-table
    // walk (MediaDecode.mp4JpegSamples) hands each `jpeg` sample to
    // the JPEG entropy decoder, pooled exactly like GVID/AVI. Each
    // doc_id%5==0 doc gets a RE-EXPORT copy: every frame progressively
    // re-encoded (SOF2) AND the container re-laid-out with a `free`
    // pad box — bytes differ thoroughly (md5-checked in-plan), the
    // pooled fingerprint is bit-identical, Hamming 0. Planted-pair
    // audit oracle (mm_avi_neardup discipline).
    QueryDef("mm_mp4_neardup",
      (s, d) => {
        val docs = t(s, d, "documents").select("doc_id")
        plantedNearDupAudit(docs,
          Multimodal.withMp4PixelPayload(docs, quality = 0.9f),
          Multimodal.withMp4PixelPayload(
            docs.filter(col("doc_id") % 5 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id")),
            quality = 0.9f, pixelSeedOffset = 10000000L,
            progressive = true, freePad = 64),
          Multimodal.videoNearDupPairs(_))
      },
      Some(plantedPairOracleSql), bench = true),

    // video frame sampling: every 2nd frame of each synthetic container
    // (doc_id % 7 + 1 frames); the oracle reconstructs the SAME frame
    // bytes from the deterministic formula, so the md5 compare proves
    // the container walk read real bytes, not a formula
    QueryDef("mm_frame_sample",
      (s, d) => Multimodal.frameSample(t(s, d, "documents"), 2),
      Some("""WITH f AS (SELECT doc_id, coalesce(substr(text, 1, 16), '') AS p,
            unnest(range(0, doc_id % 7 + 1)) AS frame_idx
          FROM documents)
        SELECT doc_id, frame_idx::BIGINT AS frame_idx,
          md5('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p) AS frame_md5,
          octet_length(encode('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p))::BIGINT AS frame_bytes
        FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx"""),
      bench = true),

    // frame sampling over the REAL container: the SAME deterministic
    // frame bytes ride as AVI movi/00dc chunk bodies (a chunk body is
    // opaque bytes — spec-legal), so the md5 compare is an EXACT
    // formula oracle for the RIFF/LIST walk itself: a wrong chunk
    // offset, a missed even-pad, or a misread little-endian size
    // hash-mismatches. Same everyK=2 thinning as mm_frame_sample.
    QueryDef("mm_avi_frame_sample",
      (s, d) => Multimodal.frameSampleFrom(
        Multimodal.withAviPayload(
          graft.util.SparkUtil.widen(t(s, d, "documents"))), 2),
      Some("""WITH f AS (SELECT doc_id, coalesce(substr(text, 1, 16), '') AS p,
            unnest(range(0, doc_id % 7 + 1)) AS frame_idx
          FROM documents)
        SELECT doc_id, frame_idx::BIGINT AS frame_idx,
          md5('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p) AS frame_md5,
          octet_length(encode('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p))::BIGINT AS frame_bytes
        FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx"""),
      bench = true),

    // EXIF privacy AUDIT over REAL bytes: the marker walk + TIFF parse
    // (endianness, IFD0 orientation, GPS IFD rational triples) against
    // the fixture formulas — a wrong IFD offset or rational read
    // hash-mismatches; the GPS coordinates are the release-blocking
    // signal a training-image corpus screens for
    QueryDef("mm_exif_audit",
      (s, d) => Multimodal.exifAudit(t(s, d, "documents")),
      Some("""SELECT doc_id, doc_id % 5 <> 0 AS has_exif,
          CASE WHEN doc_id % 5 <> 0 THEN (doc_id % 8 + 1)::BIGINT END
            AS orientation,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 90)::DOUBLE, 4) END AS gps_lat,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 180)::DOUBLE, 4) END AS gps_lon
        FROM documents ORDER BY doc_id"""), bench = true),

    // metadata SCRUB audit: segment-level strip (no entropy decode) —
    // bytes_removed is the CLOSED-FORM APP1 size (150 with GPS IFD, 36
    // without, 0 when none existed), exif_removed re-parses the
    // scrubbed bytes, pixels_identical DECODES both (the lossless
    // claim, measured per doc, not asserted)
    QueryDef("mm_exif_scrub",
      (s, d) => Multimodal.exifScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 0
                WHEN doc_id % 3 = 0 THEN 150 ELSE 36 END)::BIGINT
            AS bytes_removed,
          TRUE AS exif_removed, TRUE AS pixels_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // PNG text-chunk audit + scrub — the EXIF discipline on PNG:
    // tEXt Author/Comment parsed from real chunk bytes (CRC-bearing),
    // scrub keeps only the pixel-affecting chunk set; bytes_removed is
    // the CLOSED-FORM sum of the two injected tEXt chunks, pixel
    // identity DECODED per doc
    QueryDef("mm_png_text_scrub",
      (s, d) => Multimodal.pngMetaScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 2 END)::BIGINT
            AS n_text_chunks,
          CASE WHEN doc_id % 5 <> 0
            THEN 'author_' || (doc_id % 50)::VARCHAR END AS author,
          (CASE WHEN doc_id % 5 = 0 THEN 0
            ELSE 42 + length('author_' || (doc_id % 50)::VARCHAR) END)::BIGINT
            AS bytes_removed,
          TRUE AS text_removed, TRUE AS pixels_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // the COMPLETE PNG privacy audit: all three text-chunk forms
    // (tEXt / zTXt inflated from a stored-block zlib stream / iTXt)
    // plus EXIF orientation + GPS out of the eXIf chunk through the
    // SAME TIFF walk as the JPEG path — PNG GPS is the same release
    // blocker; bytes_removed is CLOSED-FORM over the four injected
    // metadata chunks and EXCLUDES the cHRM chunk, so a scrub that
    // wrongly dropped color interpretation (the Adobe-APP14 lesson)
    // hash-mismatches here
    QueryDef("mm_png_exif_audit",
      (s, d) => Multimodal.pngMetaAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 3 END)::BIGINT
            AS n_text_chunks,
          CASE WHEN doc_id % 5 <> 0
            THEN 'author_' || (doc_id % 50)::VARCHAR END AS author,
          CASE WHEN doc_id % 5 <> 0
            THEN 'desc_' || (doc_id % 7)::VARCHAR END AS description,
          CASE WHEN doc_id % 5 <> 0
            THEN 'title_' || (doc_id % 11)::VARCHAR END AS title,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN (doc_id % 8 + 1)::BIGINT END AS orientation,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 90)::DOUBLE, 4) END AS gps_lat,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 180)::DOUBLE, 4) END AS gps_lon,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            19 + length('author_' || (doc_id % 50)::VARCHAR)
            + 36 + length('desc_' || (doc_id % 7)::VARCHAR)
            + 22 + length('title_' || (doc_id % 11)::VARCHAR)
            + CASE WHEN doc_id % 3 = 0 THEN 152 ELSE 0 END END)::BIGINT
            AS bytes_removed,
          TRUE AS meta_removed, TRUE AS pixels_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // MP3 frame-header SCREEN — the route-and-screen layer for the
    // dominant scraped-audio format whose decode is the documented
    // NO-GO (SCALE.md): sample rate / bitrate / frame count /
    // duration from the MPEG frame walk (32 kHz 128 kbps mono ⇒
    // 576-byte frames, 36 ms each — every column an exact formula),
    // ID3v2/ID3v1 presence flags
    QueryDef("mm_mp3_meta",
      (s, d) => Multimodal.mp3MetaAudit(t(s, d, "documents")),
      Some("""SELECT doc_id, TRUE AS parsed, 32000::BIGINT AS sample_rate,
          128::BIGINT AS bitrate_kbps, 1::BIGINT AS channels,
          (doc_id % 4 + 2)::BIGINT AS n_frames,
          ((doc_id % 4 + 2) * 36)::BIGINT AS duration_ms,
          doc_id % 5 <> 0 AS has_id3v2,
          doc_id % 5 <> 0 AND doc_id % 2 = 0 AS has_id3v1
        FROM documents ORDER BY doc_id"""), bench = true),

    // ID3 tag audit + scrub — the EXIF discipline on MP3: TPE1/TIT2
    // text frames + the TXXX geo frame (location is the release
    // blocker) + ID3v1 trailer fields; scrub drops the v2 block and
    // the v1 trailer, audio frames byte-verbatim (re-walked frame
    // count + duration pin it); bytes_removed CLOSED-FORM
    QueryDef("mm_mp3_tags_scrub",
      (s, d) => Multimodal.mp3TagScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
              + CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END END)::BIGINT
            AS n_tags,
          CASE WHEN doc_id % 5 <> 0
            THEN 'artist_' || (doc_id % 50)::VARCHAR END AS artist,
          CASE WHEN doc_id % 5 <> 0
            THEN 't_' || (doc_id % 7)::VARCHAR END AS title,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN 'lat=' || (doc_id % 90)::VARCHAR ||
                 ';lon=' || (doc_id % 180)::VARCHAR END AS geo,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            32 + length('artist_' || (doc_id % 50)::VARCHAR)
               + length('t_' || (doc_id % 7)::VARCHAR)
            + CASE WHEN doc_id % 3 = 0
                THEN 15 + length('lat=' || (doc_id % 90)::VARCHAR ||
                  ';lon=' || (doc_id % 180)::VARCHAR) ELSE 0 END
            + CASE WHEN doc_id % 2 = 0 THEN 128 ELSE 0 END END)::BIGINT
            AS bytes_removed,
          TRUE AS tags_removed, TRUE AS frames_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // bare-TIFF screen — the FOURTH container on the shared TIFF/IFD
    // walk (.tif files themselves): dims from IFD0 tags 256/257,
    // orientation + GPS; a TIFF scrub is deliberately ABSENT (every
    // IFD entry is offset-linked — rewriting the directory graph is
    // the transcode path), so GPS-bearing docs route to QUARANTINE
    QueryDef("mm_tiff_exif_audit",
      (s, d) => Multimodal.tiffExifAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (100 + doc_id % 50)::BIGINT AS width,
          (80 + doc_id % 30)::BIGINT AS height,
          CASE WHEN doc_id % 5 <> 0
            THEN (doc_id % 8 + 1)::BIGINT END AS orientation,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 90)::DOUBLE, 4) END AS gps_lat,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 180)::DOUBLE, 4) END AS gps_lon,
          doc_id % 5 <> 0 AND doc_id % 3 = 0 AS quarantine
        FROM documents ORDER BY doc_id"""), bench = true),

    // GZIP header privacy audit + scrub — the container of web-scale
    // training data: MTIME/FNAME/FCOMMENT are metadata exactly like
    // EXIF; the scrub rewrites every member to a bare 10-byte header
    // with the DEFLATE stream verbatim, so decompressed bytes are
    // IDENTICAL — measured per doc, the strongest oracle form;
    // bytes_removed CLOSED-FORM over the fixture's per-member
    // metadata
    QueryDef("mm_gzip_meta_scrub",
      (s, d) => Multimodal.gzipScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (doc_id % 3 + 1)::BIGINT AS n_members,
          CASE WHEN doc_id % 5 <> 0
            THEN 'f_' || (doc_id % 7)::VARCHAR END AS fname,
          doc_id % 5 <> 0 AND doc_id % 3 = 0 AS has_comment,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            (doc_id % 3 + 1) *
              (length('f_' || (doc_id % 7)::VARCHAR) + 1
               + CASE WHEN doc_id % 3 = 0
                   THEN length('c_' || (doc_id % 11)::VARCHAR) + 1
                   ELSE 0 END) END)::BIGINT AS bytes_removed,
          TRUE AS meta_removed, TRUE AS decompressed_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // WARC record inventory over the CommonCrawl layout (one gzip
    // MEMBER per record): warcinfo + response records with formula
    // URIs and bodies — the md5 compare is an EXACT oracle for the
    // multi-member inflate + version-line/header/Content-Length walk
    // (a wrong member boundary or body slice hash-mismatches)
    QueryDef("corpus_warc_inventory",
      (s, d) => Multimodal.warcInventory(t(s, d, "documents")),
      Some("""WITH r AS (SELECT doc_id,
            unnest(range(0, doc_id % 4 + 2)) AS rec_idx
          FROM documents),
        body AS (SELECT doc_id, rec_idx,
            CASE WHEN rec_idx = 0
              THEN 'software: graft ' || doc_id::VARCHAR
              ELSE 'body:' || doc_id::VARCHAR || ':'
                || (rec_idx - 1)::VARCHAR END AS payload
          FROM r)
        SELECT doc_id, rec_idx::BIGINT AS rec_idx,
          CASE WHEN rec_idx = 0 THEN 'warcinfo' ELSE 'response' END
            AS warc_type,
          CASE WHEN rec_idx > 0 THEN 'https://ex.com/' || doc_id::VARCHAR
            || '/' || (rec_idx - 1)::VARCHAR END AS target_uri,
          octet_length(encode(payload))::BIGINT AS content_length,
          md5(payload) AS body_md5
        FROM body ORDER BY doc_id, rec_idx"""), bench = true),

    // WebP privacy audit + scrub — the JPEG/PNG EXIF discipline on
    // the THIRD image container: dims through BOTH layouts (bare VP8L
    // for clean docs, VP8X canvas for tagged), EXIF via the SAME
    // shared TIFF walk (a WebP EXIF chunk body is a bare TIFF
    // stream), XMP presence; bytes_removed CLOSED-FORM and EXCLUDES
    // the retained ICCP chunk (the cHRM/Adobe-APP14 lesson), VP8X
    // E/X flag bits cleared by the scrub
    QueryDef("mm_webp_exif_audit",
      (s, d) => Multimodal.webpExifScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN 'vp8l' ELSE 'vp8x' END AS format,
          (24 + doc_id % 8)::BIGINT AS width,
          (16 + doc_id % 5)::BIGINT AS height,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN (doc_id % 8 + 1)::BIGINT END AS orientation,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 90)::DOUBLE, 4) END AS gps_lat,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN round((doc_id % 180)::DOUBLE, 4) END AS gps_lon,
          doc_id % 5 <> 0 AS has_xmp,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            14 + CASE WHEN doc_id % 3 = 0 THEN 148 ELSE 0 END END)::BIGINT
            AS bytes_removed,
          TRUE AS meta_removed, TRUE AS image_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // GIF screen + comment scrub — dims/frames from the block walk,
    // the comment extension is the GIF PII carrier; scrub drops
    // comment + application extensions at byte level (graphic-control
    // retained: transparency/timing are rendering), LZW data verbatim
    QueryDef("mm_gif_meta_scrub",
      (s, d) => Multimodal.gifMetaScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (10 + doc_id % 16)::BIGINT AS width,
          (7 + doc_id % 9)::BIGINT AS height,
          (doc_id % 3 + 1)::BIGINT AS n_frames,
          CASE WHEN doc_id % 5 <> 0
            THEN 'c_' || (doc_id % 7)::VARCHAR END AS comment,
          (CASE WHEN doc_id % 5 = 0 THEN 0
            ELSE 4 + length('c_' || (doc_id % 7)::VARCHAR) END)::BIGINT
            AS bytes_removed,
          TRUE AS comments_removed, TRUE AS frames_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // OGG container SCREEN — the page walk + ID-header parse for the
    // other big scraped-audio family (Vorbis AND Opus by doc parity):
    // codec, channels, rate, page count, duration from the last
    // granule (Vorbis granule = PCM samples at the stream rate; Opus
    // granule 48 kHz-denominated per RFC 7845) — every column an
    // exact formula
    QueryDef("mm_ogg_meta",
      (s, d) => Multimodal.oggMetaAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END AS codec,
          (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)::BIGINT AS channels,
          (CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 48000 END)::BIGINT
            AS sample_rate,
          (doc_id % 4 + 3)::BIGINT AS n_pages,
          ((doc_id % 4 + 1) *
            CASE WHEN doc_id % 2 = 0 THEN 128 ELSE 20 END)::BIGINT
            AS duration_ms
        FROM documents ORDER BY doc_id"""), bench = true),

    // Ogg comment audit + in-place REDACTION — the privacy seam on
    // the Ogg family (same Vorbis-comment structure as FLAC, read out
    // of the second packet): values overwritten with spaces IN PLACE
    // (Ogg pages are CRC-sealed and sequence-numbered — removal would
    // renumber every following page), each touched page's CRC
    // re-sealed; bytes_redacted CLOSED-FORM, the re-parse pins keys
    // surviving with blank values and every page CRC valid
    QueryDef("mm_ogg_tags_redact",
      (s, d) => Multimodal.oggTagRedactAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END END)::BIGINT
            AS n_tags,
          CASE WHEN doc_id % 5 <> 0
            THEN 'artist_' || (doc_id % 50)::VARCHAR END AS artist,
          CASE WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0
            THEN 'lat=' || (doc_id % 90)::VARCHAR ||
                 ';lon=' || (doc_id % 180)::VARCHAR END AS geo,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE
            length('artist_' || (doc_id % 50)::VARCHAR)
            + length('t_' || (doc_id % 7)::VARCHAR)
            + CASE WHEN doc_id % 3 = 0
                THEN length('lat=' || (doc_id % 90)::VARCHAR ||
                  ';lon=' || (doc_id % 180)::VARCHAR) ELSE 0 END END)::BIGINT
            AS bytes_redacted,
          TRUE AS values_blanked, TRUE AS pages_sealed
        FROM documents ORDER BY doc_id"""), bench = true),

    // FLAC tag audit + scrub — the EXIF discipline on the audio
    // modality: Vorbis comments parsed (LITTLE-endian lengths inside
    // the big-endian container — the spec quirk a wrong-endian read
    // garbles), scrub keeps only STREAMINFO + frames; bytes_removed is
    // the CLOSED-FORM comment-block size, sample identity DECODED per
    // doc (lossless by construction, measured not asserted)
    QueryDef("mm_flac_tags_scrub",
      (s, d) => Multimodal.flacTagScrubAudit(t(s, d, "documents")),
      Some("""SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 2 END)::BIGINT AS n_tags,
          CASE WHEN doc_id % 5 <> 0
            THEN 'artist_' || (doc_id % 50)::VARCHAR END AS artist,
          (CASE WHEN doc_id % 5 = 0 THEN 0
            ELSE 25 + length('ARTIST=artist_' || (doc_id % 50)::VARCHAR)
               + length('TITLE=t_' || (doc_id % 7)::VARCHAR) END)::BIGINT
            AS bytes_removed,
          TRUE AS tags_removed, TRUE AS samples_identical
        FROM documents ORDER BY doc_id"""), bench = true),

    // frame sampling over the REAL MP4 container: the SAME
    // deterministic frame bytes ride as mdat samples resolved through
    // the FULL table walk (stsc runs → stsz sizes → stco/co64 offsets,
    // BOTH widths by doc parity) — an EXACT md5 formula oracle for the
    // sample-range arithmetic itself (the near-dup oracle is only
    // planted-pair level; a one-byte offset error here hash-mismatches)
    QueryDef("mm_mp4_frame_sample",
      (s, d) => Multimodal.frameSampleFrom(
        Multimodal.withMp4Payload(
          graft.util.SparkUtil.widen(t(s, d, "documents"))), 2),
      Some("""WITH f AS (SELECT doc_id, coalesce(substr(text, 1, 16), '') AS p,
            unnest(range(0, doc_id % 7 + 1)) AS frame_idx
          FROM documents)
        SELECT doc_id, frame_idx::BIGINT AS frame_idx,
          md5('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p) AS frame_md5,
          octet_length(encode('frame:' || CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR) || ':' || p))::BIGINT AS frame_bytes
        FROM f WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx"""),
      bench = true))
}
