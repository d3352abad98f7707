// Round-19 probe for the r18 "pqTrain/kmeansTrain recompile the
// nearest-cell codegen every round" hypothesis: measures Janino
// compilation COUNT and wall time per training round by diffing
// org.apache.spark.metrics.source.CodegenMetrics across
// kmeansCentroids / pqTrain calls at different round counts (the
// per-round plan is textually identical -- the centroid matrix rides
// codegen references -- so the compile cache SHOULD hit; this probe
// decides with evidence instead).
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/train_codegen_probe.scala
// ASCII-only on purpose.
try {
  import org.apache.spark.metrics.source.CodegenMetrics
  val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
  val emb = graft.queries.Registry.table(spark, sf, "embeddings")
  def compiles(): Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
  def run(label: String)(body: => Unit): Unit = {
    val c0 = compiles(); val t0 = System.nanoTime()
    body
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $label wall=$dt%.2f s compiles=${compiles() - c0}")
  }
  // warm: JVM + first-time codegen of the shared operators
  run("kmeans r2 (warm-up)") {
    graft.analytics.Similarity.kmeansCentroids(emb, k = 8, rounds = 2).count() }
  run("kmeans rounds=1") {
    graft.analytics.Similarity.kmeansCentroids(emb, k = 8, rounds = 1).count() }
  run("kmeans rounds=4") {
    graft.analytics.Similarity.kmeansCentroids(emb, k = 8, rounds = 4).count() }
  run("pq r2 (warm-up)") {
    graft.analytics.Similarity.pqTrain(emb, m = 16, ksub = 32, rounds = 2).count() }
  run("pq rounds=1") {
    graft.analytics.Similarity.pqTrain(emb, m = 16, ksub = 32, rounds = 1).count() }
  run("pq rounds=3") {
    graft.analytics.Similarity.pqTrain(emb, m = 16, ksub = 32, rounds = 3).count() }
} catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
sys.exit(0)
