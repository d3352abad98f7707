// TWS drain fixed cost vs shuffle width and RocksDB changelog
// checkpointing: drains quotaLimitPipeline (transformWithState) over
// the sf0.1 events with Bench.twinDrain's layout (16 files,
// maxFilesPerTrigger=2, AvailableNow), at (width, changelog) combos.
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/tws_width_probe.scala
// ASCII-only on purpose.
try {
  import org.apache.spark.sql.types._
  import java.nio.file.{Files, Paths}
  val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
  spark.conf.set("spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  val rows = graft.queries.Registry.table(spark, sf, "events")
    .where("event_type IS NOT NULL AND event_id IS NOT NULL")
    .selectExpr("ts", "event_type", "event_id")
    .orderBy("ts").toJSON.collect()
  val schema = StructType(Seq(StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("event_id", LongType)))
  val base = Files.createTempDirectory("graft_tws_probe")
  def drain(width: Int, changelog: Boolean, attempt: Int): Double = {
    val in = s"$base/q-$width-$changelog-in$attempt"
    val ckpt = s"$base/q-$width-$changelog-ckpt$attempt"
    Files.createDirectories(Paths.get(in))
    rows.grouped(math.max(1, rows.length / 16)).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.writeString(Paths.get(in, f"part_$i%03d.jsonl"), chunk.mkString("\n"))
    }
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      changelog.toString)
    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).json(in)
    val q = graft.streaming.StreamingPipeline.quotaLimitPipeline(
        stream, windowSeconds = 60, cap = 3)
      .writeStream.format("noop")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a timed-out drain is a FAILURE, never a ~600 s "sample"
    require(q.awaitTermination(600000), s"width=$width changelog=$changelog timed out")
    (System.nanoTime() - t0) / 1e9
  }
  println(s"[probe] rows=${rows.length}")
  // PROBE_COMBOS: "width:changelog" pairs, default the r18 grid
  val combos = sys.env.getOrElse("PROBE_COMBOS", "32:false,8:false,8:true,32:true")
    .split(",").map(_.trim.split(":")).map(a => (a(0).toInt, a(1).toBoolean)).toSeq
  for ((w, cl) <- combos) {
    val t = Seq(0, 1).map(a => drain(w, cl, a)).min
    println(f"[probe] width=$w changelog=$cl quota=$t%.2f")
  }
} catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
sys.exit(0)
