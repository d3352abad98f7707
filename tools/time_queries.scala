// Quick per-query timing loop (Bench methodology: noop sink,
// interleaved min-of-N) for a subset of registry queries.
//   TIME_QUERIES=name1,name2 [TIME_SF=...] [TIME_ROUNDS=3]
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.adaptive.enabled=true \
//     --conf spark.sql.autoBroadcastJoinThreshold=67108864 \
//     --driver-class-path target/scala-2.13/classes -i tools/time_queries.scala
// ASCII-only on purpose.
try {
  val names = sys.env.getOrElse("TIME_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
  val sf = sys.env.getOrElse("TIME_SF", "/root/testdata/sf0.1")
  val rounds = sys.env.getOrElse("TIME_ROUNDS", "3").toInt
  val best = scala.collection.mutable.LinkedHashMap[String, Double](names.map(_ -> -1.0): _*)
  // warm codegen once
  graft.queries.Registry.queries("a1_counts_by_type")(spark, sf)
    .write.format("noop").mode("overwrite").save()
  for (r <- 0 until rounds; n <- names) {
    spark.sparkContext.setJobDescription(s"time:$n round $r")
    val t0 = System.nanoTime()
    graft.queries.Registry.queries(n)(spark, sf)
      .write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    if (best(n) < 0 || t < best(n)) best(n) = t
  }
  best.foreach { case (n, t) => println(f"[time] $n $t%.3f s") }
} catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
sys.exit(0)
