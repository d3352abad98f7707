// Round-19 optimization probe: stateful-drain fixed cost vs state-store
// PROVIDER (HDFS-backed default vs RocksDB + changelog checkpointing)
// and vs shuffle-width FLOOR (8 vs 4 vs 2) for the NON-transformWithState
// drains the r18 round left on the HDFS provider. Layout matches
// Bench.twinDrain exactly (sf0.1 events, 16 files, maxFilesPerTrigger=2,
// AvailableNow, best-of-2, fresh dirs per attempt).
//   PROBE_DRAINS=rd,nv,hll PROBE_WIDTHS=8 PROBE_PROVIDERS=hdfs,rocksdb \
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/provider_width_probe.scala
// ASCII-only on purpose (spark-shell -i under the C locale).
try {
  import org.apache.spark.sql.types._
  import java.nio.file.{Files, Paths}
  val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
  val widths = sys.env.getOrElse("PROBE_WIDTHS", "8,4,2")
    .split(",").map(_.trim.toInt).toSeq
  val providers = sys.env.getOrElse("PROBE_PROVIDERS", "hdfs,rocksdb")
    .split(",").map(_.trim).toSeq
  val drains = sys.env.getOrElse("PROBE_DRAINS", "rd,nv,hll,sess,anom")
    .split(",").map(_.trim).toSeq
  val rows = graft.queries.Registry.table(spark, sf, "events")
    .where("user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL")
    .selectExpr("ts", "user_id", "event_type")
    .orderBy("ts").toJSON.collect()
  val schema = StructType(Seq(StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))
  val base = Files.createTempDirectory("graft_provider_probe")
  val providerKey = "spark.sql.streaming.stateStore.providerClass"
  val changelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  def drain(label: String, width: Int, provider: String, attempt: Int)
           (xform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double = {
    val in = s"$base/$label-$width-$provider-in$attempt"
    val ckpt = s"$base/$label-$width-$provider-ckpt$attempt"
    Files.createDirectories(Paths.get(in))
    rows.grouped(math.max(1, rows.length / 16)).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.writeString(Paths.get(in, f"part_$i%03d.jsonl"), chunk.mkString("\n"))
    }
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    if (provider == "rocksdb") {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(changelogKey, "true")
    } else {
      spark.conf.unset(providerKey)
      spark.conf.unset(changelogKey)
    }
    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).json(in)
    val q = xform(stream).writeStream.format("noop")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a timed-out drain is a FAILURE, never a ~600 s "sample"
    require(q.awaitTermination(600000), s"$label width=$width $provider timed out")
    (System.nanoTime() - t0) / 1e9
  }
  val xforms: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = Map(
    "rd" -> { df => graft.streaming.StreamingPipeline.rollingDistinctPipeline(
      df, windowDays = 7, watermarkDelay = "1 hour") },
    "nv" -> { df => graft.streaming.StreamingPipeline.noveltyPipeline(
      df, "ts", Seq("user_id", "event_type"), "event_type",
      windowSeconds = 3600, watermarkDelay = "1 hour") },
    "hll" -> { df => graft.streaming.StreamingPipeline.rollingDistinctHllPipeline(
      df, windowDays = 7, watermarkDelay = "1 hour") },
    "sess" -> { df => graft.streaming.StreamingPipeline.sessionSummaryPipeline(
      df.select("ts", "user_id"), "ts", "user_id", gapSeconds = 1800) },
    "anom" -> { df => graft.streaming.StreamingPipeline.anomalyAlerts(
      df.selectExpr("ts", "event_type AS label"), "ts", "label",
      windowSeconds = 3600) })
  println(s"[probe] rows=${rows.length}")
  for (d <- drains; w <- widths; p <- providers) {
    val t = Seq(0, 1).map(a => drain(d, w, p, a)(xforms(d))).min
    println(f"[probe] drain=$d width=$w provider=$p secs=$t%.2f")
  }
} catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
sys.exit(0)
