package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline (bench-flagged) queries on
  * SPARK_GRAFT_SF_DIR, forcing full materialization through a noop sink
  * (a bare `.count()` lets Catalyst prune most of the work), and prints
  * one JSON metrics line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // best-of-2 per query: a single run is hostage to whatever else the
    // machine is doing (the driver observed a 4× contention-inflated
    // total); the min of two runs measures the engine, not the box
    def run(name: String): (String, Double) = {
      val a = runOnce(name)
      if (a < 0) return name -> a
      val b = runOnce(name)
      name -> (if (b < 0) a else math.min(a, b))
    }

    // warm the JVM/codegen once with the cheapest query
    runOnce("a1_counts_by_type")
    val results = Registry.benchNames.map(run)

    // flagship streaming number: the notifyPipeline AvailableNow drain
    // (notification queue → GET → UDM transform → 3 idempotent sinks),
    // admission-bounded at 16 messages/batch. File synthesis is setup,
    // not measured; the drain is timed end-to-end and also reported as
    // packets/s (SCALE.md's tracked figure).
    // setup failures (e.g. an unreadable sf dir) must still yield the
    // JSON line with stream_pipeline in "failed", not a dead process
    val (streamSecs, streamPkts) = try {
      import java.nio.file.{Files, Paths}
      val nJson = 24
      val nPcap = 8
      val perFile = 1000
      val base = Files.createTempDirectory("graft_bench_stream")
      val data = s"$base/data"
      Files.createDirectories(Paths.get(data))
      val raw = graft.udm.SynthPackets.fromEvents(
          Registry.table(spark, sfDir, "events").limit(nJson * perFile))
        .select("raw").collect().map(_.getString(0))
      val jsonNames = raw.grouped(perFile).zipWithIndex.map { case (chunk, i) =>
        val n = f"cap_$i%03d.json"
        Files.writeString(Paths.get(data, n), chunk.mkString("[", ",", "]"))
        n
      }.toSeq
      // binary captures: the native pcap decoder runs INSIDE the same
      // streaming plan (download → decode → transform — the reference's
      // actual processor path), so the drain number covers it
      val pcapNames = (0 until nPcap).map { i =>
        val n = f"bin_$i%03d.pcap"
        Files.write(Paths.get(data, n),
          graft.sources.CaptureBytes.syntheticPcap(perFile, seed = i))
        n
      }
      val msgs = jsonNames ++ pcapNames
      // best-of-2 like every other bench entry (fresh queue/out/ckpt per
      // attempt — a drain is stateful, so reruns need clean dirs)
      def drainOnce(attempt: Int): Double = {
        val (queue, out, ckpt) =
          (s"$base/q$attempt", s"$base/out$attempt", s"$base/ckpt$attempt")
        Files.createDirectories(Paths.get(queue))
        msgs.zipWithIndex.foreach { case (name, i) =>
          Files.writeString(Paths.get(queue, f"msg_$i%03d"), name)
        }
        val t0 = System.nanoTime()
        try {
          val q = graft.streaming.StreamingPipeline.notifyPipeline(
            spark, queue, data, out, ckpt,
            trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
            maxMessagesPerTrigger = 16).start()
          if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
          else { // timed out: a hung drain is a FAILURE, not a 600 s datapoint
            q.stop()
            System.err.println("[bench] stream_pipeline timed out")
            -1.0
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] stream_pipeline failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      val best = if (a < 0) a else { val b = drainOnce(1); if (b < 0) a else math.min(a, b) }
      (best, raw.length + nPcap * perFile)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream_pipeline setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    val all = results :+ ("stream_pipeline" -> streamSecs)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // failures are UNMISTAKABLE: named in "failed", never silently
    // shrinking the total (a failed query records -1 in "queries" too)
    val failed = all.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = all.map(_._2).filter(_ >= 0).sum
    val pps = if (streamSecs > 0) streamPkts / streamSecs else -1.0
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$failed,"queries":$qs,"stream_pkts_per_sec":$pps%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
