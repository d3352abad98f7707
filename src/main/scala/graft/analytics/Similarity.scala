package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * approximate variant as the scale path (SURVEY.md §7.7 north star).
  *
  * All arithmetic is over doubles (cast once at scan) with
  * left-to-right `aggregate` accumulation — deterministic and
  * DuckDB-matchable. At 100 TB the brute-force path is a broadcast of
  * the (small) query set against a scan of the corpus: no shuffle on
  * the corpus side until the final per-query top-k (window over query
  * id). The LSH path buckets the corpus once (narrow) and only probes
  * matching buckets.
  */
object Similarity {

  /** Dot product of two double arrays (sequential fold — stable). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Embedding dimensionality from the data (one tiny job), with a
    * descriptive error for empty/null-embedding tables. */
  def embeddingDim(embeddings: DataFrame): Int = {
    val head = embeddings.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).head(1)
    require(head.nonEmpty, "embeddings table has no non-null embedding rows")
    head(0).getInt(0)
  }

  /** Exact brute-force cosine top-k: each query (small set, broadcast)
    * against every corpus vector; per-query top-k via ranking window. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = graft.util.SparkUtil.widen(embeddings)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"), col("label"))
    val queries = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    scored.select(col("query_id"), col("vec_id"), col("label"),
        round(col("cos"), 4).as("cosine"), row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= k)
      .orderBy("query_id", "rk")
  }

  /** Sign-random-projection LSH bucket key: `nBits` hyperplanes with
    * deterministic md5-derived ±1 components; bucket = bit pattern of
    * projection signs. Same-bucket vectors are candidate neighbors —
    * the approximate scale path (probe only matching buckets, ~1/2^bits
    * of the corpus per probe). */
  def srpBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { plane =>
      // deterministic ±1 hyperplane: sign from md5 of (plane, index)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) =>
          when(conv(substring(md5(concat(lit(plane + ":"), i)), 1, 8), 16, 10)
            .cast(LongType).bitwiseAND(1) === 1, x).otherwise(-x)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), plane)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: restrict candidates to the query's SRP bucket
    * then exact-rank within it. Recall trades off with `nBits`. */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int, nBits: Int,
              dimOpt: Option[Int] = None): DataFrame = {
    val dim = dimOpt.getOrElse(embeddingDim(embeddings))
    val corpus = graft.util.SparkUtil.widen(embeddings)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("bucket", srpBucket(col("vec"), dim, nBits))
    val queries = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"), col("bucket"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("qvec"), col("vec")).as("cos"))
      .select(col("query_id"), col("vec_id"), round(col("cos"), 4).as("cosine"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= k)
      .orderBy("query_id", "rk")
  }

  /** IVF-style approximate top-k: coarse cells are the `label` column
    * (a precomputed assignment — at corpus scale this comes from
    * k-means over a sample), each query ranks cell centroids by cosine
    * and exact-searches only the `nProbe` nearest cells. Cost per query
    * drops from |corpus| to ~nProbe/|cells| of it; recall is tunable
    * via nProbe. Centroids and the query→cell plan are tiny →
    * broadcast; the corpus is scanned once, filtered by probed cell. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nProbe: Int, dimOpt: Option[Int] = None): DataFrame = {
    val dim = dimOpt.getOrElse(embeddingDim(embeddings))
    val corpus = graft.util.SparkUtil.widen(embeddings)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("vec"))
    val centroids = corpus.groupBy("label").agg(
        count(lit(1)).as("n"),
        array((0 until dim).map(i => sum(element_at(col("vec"), i + 1))): _*).as("sums"))
      .select(col("label"), transform(col("sums"), s => s / col("n")).as("centroid"))
    val queries = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val wCell = Window.partitionBy("query_id").orderBy(desc("c"), asc("label"))
    val probed = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"), col("label"),
        cosine(col("qvec"), col("centroid")).as("c"))
      .withColumn("cr", row_number().over(wCell))
      .filter(col("cr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("label"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    corpus.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("qvec"), col("vec")).as("cos"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(col("cos"), 4).as("cosine"), row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= k)
      .orderBy("query_id", "rk")
  }

  /** Centroid stats per label — the IVF coarse-quantizer building block
    * (mean vector per cluster; at scale: train k-means on a sample,
    * assign via nearest centroid, search within cells). */
  def labelCentroidNorms(embeddings: DataFrame): DataFrame = {
    val dim = embeddingDim(embeddings)
    val withVec = embeddings.select(col("label"), asDouble(col("embedding")).as("vec"))
    // mean per dimension: aggregate array sums via element-wise reduce
    val summed = withVec.groupBy("label").agg(
      count(lit(1)).as("n"),
      array((0 until dim).map(i => sum(element_at(col("vec"), i + 1))): _*).as("sums"))
    summed.select(col("label"), col("n"),
        round(sqrt(aggregate(transform(col("sums"), s => (s / col("n")) * (s / col("n"))),
          lit(0.0d), (acc, v) => acc + v)), 4).as("centroid_norm"))
      .orderBy("label")
  }
}
