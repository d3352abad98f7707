// Prefix-doubling cost probe at sf0.1 -- measures the per-round
// corpus-wide range-shuffle a distributed suffix-array build would pay,
// vs the full gram-cover pipeline (repeatedSpans) on the same corpus.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", 32)
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def timeIt[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
}

// positioned token table = the suffix-array "text" (one row per suffix)
val toks = docs.filter(col("text").isNotNull)
  .select(col("doc_id"), posexplode(graft.analytics.TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
val positioned = toks.select(col("doc_id"), col("pos"),
  xxhash64(col("tok")).as("rank")).localCheckpoint(true)
val n = timeIt("build positioned table (checkpoint)") { positioned.count() }
println(s"[probe] suffix count: $n")

// ONE prefix-doubling round: pair rank with rank at offset 2^k (window
// per doc = the cheap part), then the corpus-wide SORT by (rank, rank2)
// that re-ranks -- this range shuffle is the per-round cost floor.
import org.apache.spark.sql.expressions.Window
val w = Window.partitionBy("doc_id").orderBy("pos")
def round(offset: Int): Long = {
  val paired = positioned.withColumn("rank2", lead("rank", offset).over(w))
  // re-rank = global sort by the pair + dense rank; the sort IS the cost
  paired.repartitionByRange(32, col("rank"), col("rank2"))
    .sortWithinPartitions("rank", "rank2")
    .select(spark_partition_id().cast("long").as("p"))
    .groupBy("p").count().count()
}
val r1 = timeIt("doubling round (offset 1)") { round(1) }
val r2 = timeIt("doubling round (offset 16)") { round(16) }
val r3 = timeIt("doubling round (offset 32)") { round(32) }

// the gram-cover pipeline, full, n=50 (the ExactSubstr Lmin analog)
val spans50 = timeIt("gram cover FULL pipeline n=50") {
  graft.analytics.Dedup.repeatedSpans(docs, n = 50, maxDocFreq = 1).count()
}
println(s"[probe] spans at n=50: $spans50")
val spans3 = timeIt("gram cover FULL pipeline n=3 (benched op)") {
  graft.analytics.Dedup.repeatedSpans(docs, n = 3, maxDocFreq = 1).count()
}
println(s"[probe] spans at n=3: $spans3")
sys.exit(0)
