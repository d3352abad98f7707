// Measures the stateful-drain fixed cost vs shuffle width: drains the
// rollingDistinctPipeline (3 chained stateful ops -- the worst case) and
// noveltyPipeline over the sf0.1 events with the SAME file layout as
// Bench.twinDrain (16 files, maxFilesPerTrigger=2, AvailableNow), once
// per width in PROBE_WIDTHS (default "32,8"). Fresh dirs per run.
//   /opt/spark/bin/spark-shell --master local[32] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/drain_width_probe.scala
// ASCII-only on purpose.
try {
  import org.apache.spark.sql.types._
  import java.nio.file.{Files, Paths}
  val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
  val widths = sys.env.getOrElse("PROBE_WIDTHS", "32,8").split(",").map(_.trim.toInt).toSeq
  val rows = graft.queries.Registry.table(spark, sf, "events")
    .where("user_id IS NOT NULL AND ts IS NOT NULL")
    .selectExpr("ts", "user_id", "event_type")
    .orderBy("ts").toJSON.collect()
  val schema = StructType(Seq(StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))
  val base = Files.createTempDirectory("graft_width_probe")
  def drain(label: String, width: Int, attempt: Int)
           (xform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double = {
    val in = s"$base/$label-$width-in$attempt"
    val ckpt = s"$base/$label-$width-ckpt$attempt"
    Files.createDirectories(Paths.get(in))
    rows.grouped(math.max(1, rows.length / 16)).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.writeString(Paths.get(in, f"part_$i%03d.jsonl"), chunk.mkString("\n"))
    }
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).json(in)
    val q = xform(stream).writeStream.format("noop")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a timed-out drain is a FAILURE, never a ~600 s "sample"
    require(q.awaitTermination(600000), s"$label width=$width timed out")
    (System.nanoTime() - t0) / 1e9
  }
  println(s"[probe] rows=${rows.length}")
  for (w <- widths) {
    val rd = Seq(0, 1).map(a => drain("rd", w, a) { df =>
      graft.streaming.StreamingPipeline.rollingDistinctPipeline(
        df, windowDays = 7, watermarkDelay = "1 hour") }).min
    val nv = Seq(0, 1).map(a => drain("nv", w, a) { df =>
      graft.streaming.StreamingPipeline.noveltyPipeline(
        df, "ts", Seq("user_id", "event_type"), "event_type",
        windowSeconds = 3600, watermarkDelay = "1 hour") }).min
    println(f"[probe] width=$w rolling_distinct=$rd%.2f novelty=$nv%.2f")
  }
} catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
sys.exit(0)
