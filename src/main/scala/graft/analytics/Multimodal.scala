package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract runs per-partition so batch-oriented decoders
  * amortize (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The decode step itself is STUBBED (no media libs in this
  * container): [[stubDecode]] derives deterministic fake
  * width/height/duration from the payload hash. The Spark-side
  * contract — schema, partitioning, batch shape — is real and tested;
  * swap `stubDecode`'s body for a JNI/FFI decoder in production.
  */
object Multimodal {

  /** The typed metadata schema a real decoder would fill. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("payload_bytes", LongType)))

  /** Attach a binary payload column (here synthesized from text —
    * stands in for image/audio bytes read from object storage). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.withColumn("payload", encode(col("text"), "UTF-8").cast(BinaryType))

  /** STUB decoder — deterministic fake metadata from the payload
    * (md5-derived dimensions). Real implementation: a batched
    * per-partition decoder (`mapPartitions` over an iterator of rows,
    * decoding in chunks); the stub keeps identical schema + semantics
    * so downstream operators (resize planning, frame sampling,
    * dedup-by-content-hash) are exercised for real. */
  def stubDecode(payload: Column): Column = {
    val h = md5(payload)
    val hx = (off: Int) => conv(substring(h, off, 4), 16, 10).cast(IntegerType)
    struct(
      when(hx(1) % 3 === 0, "png").when(hx(1) % 3 === 1, "jpeg").otherwise("webp")
        .as("format"),
      (hx(5) % 1920 + 1).as("width"),
      (hx(9) % 1080 + 1).as("height"),
      (hx(13) % 60000).cast(LongType).as("duration_ms"),
      length(payload).cast(LongType).as("payload_bytes"))
  }

  /** Batched per-partition decode — the Scala analog of a
    * `mapInPandas` batch UDF: rows flow through the decoder in
    * `batchSize` groups so a real (vectorized/FFI) decoder amortizes
    * per-call overhead. The stub mirrors [[stubDecode]] bit-for-bit
    * (JVM md5 of the payload) so the two implementations are
    * cross-checked in specs. Output schema matches [[mediaMetaSchema]]
    * plus doc_id. */
  def decodeBatched(documents: DataFrame, batchSize: Int = 64): DataFrame = {
    val src = withPayload(graft.util.SparkUtil.widen(documents))
      .select(col("doc_id"), col("payload"))
    import src.sparkSession.implicits._
    src.as[(Long, Array[Byte])].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would hand `batch` to one vectorized call here
        batch.iterator.map { case (id, payload) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val h = md.digest(payload).map("%02x".format(_)).mkString
          def hx(off: Int) = Integer.parseInt(h.substring(off - 1, off + 3), 16)
          val fmt = hx(1) % 3 match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }
          (id, fmt, hx(5) % 1920 + 1, hx(9) % 1080 + 1,
            (hx(13) % 60000).toLong, payload.length.toLong)
        }
      }
    }.toDF("doc_id", "format", "width", "height", "duration_ms", "payload_bytes")
  }

  /** Decode + derive: content hash (dedup key for multimodal dedup),
    * aspect bucket (training-shard grouping), sampled frame offsets. */
  def mediaFeatures(documents: DataFrame): DataFrame =
    withPayload(graft.util.SparkUtil.widen(documents))
      .withColumn("meta", stubDecode(col("payload")))
      .select(
        col("doc_id"),
        md5(col("payload")).as("content_hash"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.payload_bytes").as("payload_bytes"),
        round(col("meta.width").cast("double") / col("meta.height"), 4).as("aspect"),
        // frame sampling plan: one frame per ~10 s of (fake) duration
        size(sequence(lit(0L), col("meta.duration_ms"), lit(10000L)))
          .cast("long").as("n_frames"))
      .orderBy("doc_id")
}
