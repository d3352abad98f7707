package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs the headline (bench-flagged) queries on
  * SPARK_GRAFT_SF_DIR, forcing full materialization through a noop sink
  * (a bare `.count()` lets Catalyst prune most of the work), and prints
  * one JSON metrics line.
  *
  * Timing protocol — interleaved min-of-N: the full query list is run
  * ROUNDS times in round-robin order (A,B,C,…,A,B,C,…) and each entry
  * reports the minimum across rounds. Back-to-back repeats of one query
  * are hostage to any ambient-load spike that spans both runs (the
  * observed 2.7× txt_token_stats swing between driver rounds); with
  * interleaving a spike lands on ONE round's pass through the suite and
  * the other rounds still yield a clean sample for every query. */
object Bench {
  /** Isolation evidence, embedded in every published JSON line so a
    * contended run is self-evidencing instead of circumstantial (the
    * r6→r7 uniform ~1.1–1.6× inflation on untouched queries could only
    * be argued, not shown):
    *  - `load_avg_start` — the 1-min system load BEFORE any Spark work:
    *    ambient load; on an idle box this is ≪ core count.
    *  - `load_avg_end` — same at exit; includes the bench's own threads
    *    (≈ concurrent task slots), so alone it proves little, but a
    *    value far above the core count means someone else ran too.
    *  - `cpu_share` — this JVM's CPU seconds ÷ (wall × cores): the
    *    discriminator. External contention steals cycles from the
    *    bench, so a run whose share drops well below its usual band
    *    (with the same query set) was contended even if the thief
    *    exited before the end-of-run load sample. */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  private def processCpuSecs(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    val wallStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    require(rounds >= 1, s"SPARK_GRAFT_BENCH_ROUNDS must be >= 1: $rounds")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fatal JVM errors (OOM, LinkageError) must kill the process, not be
    // recorded as a "failed" entry while the run limps on in a corrupted
    // JVM — catch NonFatal only, everywhere
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm the JVM/codegen once with the cheapest query
    runOnce("a1_counts_by_type")
    val names = Registry.benchNames
    val best = scala.collection.mutable.LinkedHashMap[String, Double](
      names.map(_ -> -1.0): _*)
    for (_ <- 0 until rounds; name <- names) {
      val t = runOnce(name)
      if (t >= 0 && (best(name) < 0 || t < best(name))) best(name) = t
    }
    val results = best.toSeq

    // streaming drains: each is stateful (queue/checkpoint/sink), so a
    // repeat needs fresh dirs; best-of-2 per entry, fail-unmistakable.
    // msgs = (message name, file bytes); returns best drain seconds.
    def streamDrain(label: String, base: java.nio.file.Path,
                    msgs: Seq[(String, Array[Byte])]): Double = {
      import java.nio.file.{Files, Paths}
      val data = s"$base/$label-data"
      Files.createDirectories(Paths.get(data))
      msgs.foreach { case (n, bytes) => Files.write(Paths.get(data, n), bytes) }
      def drainOnce(attempt: Int): Double = {
        val (queue, out, ckpt) = (s"$base/$label-q$attempt",
          s"$base/$label-out$attempt", s"$base/$label-ckpt$attempt")
        Files.createDirectories(Paths.get(queue))
        msgs.zipWithIndex.foreach { case ((name, _), i) =>
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
            System.err.println(s"[bench] $label timed out")
            -1.0
          }
        } catch { case NonFatal(e) =>
          System.err.println(s"[bench] $label failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      if (a < 0) a else { val b = drainOnce(1); if (b < 0) a else math.min(a, b) }
    }

    // flagship streaming numbers: the notifyPipeline AvailableNow drain
    // (notification queue → GET → transform → 3 idempotent sinks),
    // admission-bounded at 16 messages/batch. TWO entries — the JSON
    // path and the native-binary-decode path are different workloads
    // (r4's mixed entry made the pkts/s incomparable across rounds).
    // File synthesis is setup, not measured.
    // setup failures (e.g. an unreadable sf dir) must still yield the
    // JSON line with the entry in "failed", not a dead process
    val perFile = 1000
    val (jsonSecs, jsonPkts, binSecs, binPkts) = try {
      import java.nio.file.Files
      val nJson = 24
      val nPcap = 8
      val base = Files.createTempDirectory("graft_bench_stream")
      val raw = graft.udm.SynthPackets.fromEvents(
          Registry.table(spark, sfDir, "events").limit(nJson * perFile))
        .select("raw").collect().map(_.getString(0))
      val jsonMsgs = raw.grouped(perFile).zipWithIndex.map { case (chunk, i) =>
        f"cap_$i%03d.json" -> chunk.mkString("[", ",", "]").getBytes("UTF-8")
      }.toSeq
      val pcapMsgs = (0 until nPcap).map { i =>
        f"bin_$i%03d.pcap" ->
          graft.sources.CaptureBytes.syntheticPcap(perFile, seed = i)
      }
      (streamDrain("stream_json", base, jsonMsgs), raw.length,
        streamDrain("stream_binary", base, pcapMsgs), nPcap * perFile)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] stream setup failed: ${e.getMessage}")
      (-1.0, 0, -1.0, 0)
    }

    // shared admission-drain harness: docsJson → nFiles jsonl chunks →
    // admissionPipeline AvailableNow drain; best-of-2 (stateful, so
    // each attempt gets fresh queue/store/checkpoint dirs);
    // fail-unmistakable (-1 + stderr naming the entry)
    def admissionDrain(label: String, docsJson: Array[String],
                       nFiles: Int, maxFilesPerTrigger: Int): Double = {
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory(s"graft_bench_$label")
      def drainOnce(attempt: Int): Double = {
        val (in, sig, out, ckpt) = (s"$base/in$attempt", s"$base/sig$attempt",
          s"$base/out$attempt", s"$base/ckpt$attempt")
        Files.createDirectories(Paths.get(in))
        docsJson.grouped(math.max(1, docsJson.length / nFiles)).zipWithIndex
          .foreach { case (chunk, i) =>
            Files.writeString(Paths.get(in, f"docs_$i%03d.jsonl"),
              chunk.mkString("\n"))
          }
        val t0 = System.nanoTime()
        try {
          val q = graft.streaming.StreamingPipeline.admissionPipeline(
            spark, in, sig, out, ckpt,
            trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
            maxFilesPerTrigger = maxFilesPerTrigger).start()
          if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
          else {
            q.stop()
            System.err.println(s"[bench] $label timed out")
            -1.0
          }
        } catch { case NonFatal(e) =>
          System.err.println(s"[bench] $label failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      if (a < 0) a else { val x = drainOnce(1); if (x < 0) a else math.min(a, x) }
    }

    // continuous corpus admission (MinHash-LSH against the persisted
    // signature store, per micro-batch): docs/s over an AvailableNow
    // drain of several micro-batches — the spec proves semantics, this
    // entry tracks throughput
    val (admSecs, admDocs) = try {
      val docs = Registry.table(spark, sfDir, "documents")
        .selectExpr("doc_id", "text", "lang", "source").toJSON.collect()
      (admissionDrain("admission_stream", docs, nFiles = 16,
        maxFilesPerTrigger = 4), docs.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] admission_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // amortization datapoint: ONE big micro-batch (4× the corpus,
    // texts made distinct by deterministic word-order variants so the
    // collision subgraph stays realistic) against the ~5 s/batch fixed
    // cost (per-batch MinHash + signature-store read + CC rounds + 3
    // sinks) the 1,250-doc batches above cannot amortize. Reported
    // separately as admission_stream_big / admission_big_docs_per_sec.
    val (admBigSecs, admBigDocs) = try {
      val d0 = Registry.table(spark, sfDir, "documents")
        .selectExpr("doc_id", "text", "lang", "source")
      // variant id stride = max(doc_id)+1, not count(): sparse or
      // gapped ids must not collide across variants inside the batch
      val stride = d0.agg(org.apache.spark.sql.functions.max("doc_id")).head() match {
        case r if r.isNullAt(0) => 1L
        case r => r.getLong(0) + 1
      }
      val bigDocs = Seq(
        "text",
        "concat_ws(' ', reverse(split(text, ' ')))",
        "concat_ws(' ', array_sort(split(text, ' ')))",
        "concat_ws(' ', reverse(array_sort(split(text, ' '))))")
        .zipWithIndex.map { case (t, i) =>
          d0.selectExpr(s"doc_id + ${i * stride} AS doc_id", s"$t AS text",
            "lang", "source")
        }.reduce(_ unionByName _).toJSON.collect()
      (admissionDrain("admission_stream_big", bigDocs, nFiles = 8,
        maxFilesPerTrigger = 32), bigDocs.length) // whole corpus, ONE batch
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] admission_stream_big setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // continuous SEMANTIC admission (SRP-bucket store + exact-cosine
    // verify per micro-batch, r15): vectors/s over an AvailableNow
    // drain of several micro-batches; fresh dirs per attempt, best-of-2
    val (semSecs, semVecs) = try {
      val embT = Registry.table(spark, sfDir, "embeddings")
      val dim = graft.analytics.Similarity.embeddingDim(embT)
      val vecs = embT.selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
          "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
        .toJSON.collect()
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory("graft_bench_semantic_admission")
      def drainOnce(attempt: Int): Double = {
        val (in, st, out, ckpt) = (s"$base/in$attempt", s"$base/store$attempt",
          s"$base/out$attempt", s"$base/ckpt$attempt")
        Files.createDirectories(Paths.get(in))
        vecs.grouped(math.max(1, vecs.length / 16)).zipWithIndex.foreach {
          case (chunk, i) =>
            Files.writeString(Paths.get(in, f"vecs_$i%03d.jsonl"),
              chunk.mkString("\n"))
        }
        val t0 = System.nanoTime()
        try {
          val q = graft.streaming.StreamingPipeline.semanticAdmissionPipeline(
            spark, in, st, out, ckpt,
            trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
            maxFilesPerTrigger = 4, tau = 0.9, nBits = 8, dim = dim).start()
          if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
          else { q.stop()
            System.err.println("[bench] semantic_admission_stream timed out"); -1.0 }
        } catch { case NonFatal(e) =>
          System.err.println(s"[bench] semantic_admission_stream failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      (if (a < 0) a
       else { val x = drainOnce(1); if (x < 0) a else math.min(a, x) },
        vecs.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] semantic_admission_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // continuous ANN index maintenance (frozen-model delta encode,
    // r15 second wave): vectors/s over an AvailableNow drain of the
    // whole embeddings table. The index TRAIN sits OUTSIDE the timed
    // window — train-once-search-many; the steady-state per-batch
    // encode + delta write is the cost being priced. Best-of-2 drains.
    val (idxmSecs, idxmVecs) = try {
      val embT = Registry.table(spark, sfDir, "embeddings")
      val vecs = embT.selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
          "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
        .toJSON.collect()
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory("graft_bench_index_maint")
      val idx = s"$base/index"
      graft.analytics.Similarity.writeIvfPq(embT, idx,
        nCells = 8, m = 16, ksub = 32, rounds = 3)
      def drainOnce(attempt: Int): Double = {
        val (in, delta, ckpt) = (s"$base/in$attempt",
          s"$base/delta$attempt", s"$base/ckpt$attempt")
        Files.createDirectories(Paths.get(in))
        vecs.grouped(math.max(1, vecs.length / 16)).zipWithIndex.foreach {
          case (chunk, i) =>
            Files.writeString(Paths.get(in, f"vecs_$i%03d.jsonl"),
              chunk.mkString("\n"))
        }
        val t0 = System.nanoTime()
        try {
          val q = graft.streaming.StreamingPipeline.indexMaintenancePipeline(
            spark, in, idx, delta, ckpt,
            trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
            maxFilesPerTrigger = 4).start()
          if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
          else { q.stop()
            System.err.println("[bench] index_maintenance_stream timed out"); -1.0 }
        } catch { case NonFatal(e) =>
          System.err.println(s"[bench] index_maintenance_stream failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      (if (a < 0) a
       else { val x = drainOnce(1); if (x < 0) a else math.min(a, x) },
        vecs.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] index_maintenance_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // maintained-search cost vs delta LIFETIME batches — the datapoint
    // behind compactMaintainedDelta: search must be flat in store ROWS,
    // not in lifetime batch count (every maintainedCodes query re-lists
    // the delta). 16 single-file micro-batches build a 16-partition
    // delta; the IDENTICAL ivfPqTopK probe is timed (best-of-2) over it
    // before and after the atomic-swap fold (16 partitions → 2).
    val (msPreSecs, msDuringSecs, msPostSecs) = try {
      val embT = Registry.table(spark, sfDir, "embeddings")
      val vecs = embT.selectExpr("vec_id + 8000000 AS vec_id",
          "CAST(label AS BIGINT) AS label",
          "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
        .toJSON.collect()
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory("graft_bench_maint_compact")
      val idx = s"$base/index"
      graft.analytics.Similarity.writeIvfPq(embT, idx,
        nCells = 8, m = 16, ksub = 32, rounds = 3)
      val (in, delta, ckpt) = (s"$base/in", s"$base/delta", s"$base/ckpt")
      Files.createDirectories(Paths.get(in))
      vecs.grouped(math.max(1, vecs.length / 16)).zipWithIndex.foreach {
        case (chunk, i) =>
          val f = Paths.get(in, f"vecs_$i%03d.jsonl")
          Files.writeString(f, chunk.mkString("\n"))
          f.toFile.setLastModified(1700000000000L + i * 2000L)
      }
      val q = graft.streaming.StreamingPipeline.indexMaintenancePipeline(
        spark, in, idx, delta, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        maxFilesPerTrigger = 1).start()
      require(q.awaitTermination(600000), "maintenance drain timed out")
      def searchOnce(): Double = {
        val t0 = System.nanoTime()
        graft.analytics.Similarity.ivfPqTopK(embT,
          spark.read.parquet(s"$idx/cells"),
          spark.read.parquet(s"$idx/codebook"),
          graft.analytics.Similarity.maintainedCodes(spark, idx, delta),
          Seq(0L, 1L, 2L, 3L, 4L), 10, nProbe = 4).count()
        (System.nanoTime() - t0) / 1e9
      }
      val pre = math.min(searchOnce(), searchOnce())
      // the probe DURING a live fold — the manifest protocol's claim:
      // search runs unbroken (and roughly flat) while compaction
      // publishes its segment and swaps the manifest concurrently
      @volatile var compactErr: Throwable = null
      val folder = new Thread(() =>
        try graft.streaming.StreamingPipeline.compactMaintainedDelta(spark, delta)
        catch { case e: Throwable => compactErr = e })
      folder.start()
      val during = searchOnce()
      folder.join()
      if (compactErr != null) throw compactErr
      // second maintenance entry sweeps the retired partitions, so the
      // "compacted" probe measures the steady state
      graft.streaming.StreamingPipeline.compactMaintainedDelta(spark, delta)
      val post = math.min(searchOnce(), searchOnce())
      (pre, during, post)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] maintained_search setup failed: ${e.getMessage}")
      (-1.0, -1.0, -1.0)
    }

    // streaming twins with DataFrame→DataFrame shape (anomalyAlerts,
    // trendingTokensSketch): file-source AvailableNow drain through a
    // noop sink. Inputs are written in ts order so the watermark (and
    // therefore window closure + state eviction) advances with the
    // batch sequence exactly as in production; throughput = rows/s.
    // widthFloor 2 for classic stateful ops; 8 for transformWithState
    // drains (per-ROW handlers need parallel width — see
    // StreamingPipeline.withStreamShuffleWidth)
    def twinDrain(label: String, rows: Array[String],
                  schema: org.apache.spark.sql.types.StructType,
                  nFiles: Int, maxFilesPerTrigger: Int,
                  widthFloor: Int = 2)
                 (xform: org.apache.spark.sql.DataFrame
                    => org.apache.spark.sql.DataFrame): Double = {
      import java.nio.file.{Files, Paths}
      val base = Files.createTempDirectory(s"graft_bench_$label")
      def drainOnce(attempt: Int): Double = {
        val (in, ckpt) = (s"$base/in$attempt", s"$base/ckpt$attempt")
        Files.createDirectories(Paths.get(in))
        rows.grouped(math.max(1, rows.length / nFiles)).zipWithIndex.foreach {
          case (chunk, i) =>
            Files.writeString(Paths.get(in, f"part_$i%03d.jsonl"),
              chunk.mkString("\n"))
        }
        val t0 = System.nanoTime()
        // batch-scoped stateful shuffle width (the admissionPipeline
        // discipline, r18 opt round): width derives from the drain's
        // admission unit (maxFilesPerTrigger), never the core count —
        // see StreamingPipeline.withStreamShuffleWidth for the
        // measured 3–6× per-batch fixed-cost evidence
        try graft.streaming.StreamingPipeline
          .withStreamShuffleWidth(spark, maxFilesPerTrigger, widthFloor) {
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", maxFilesPerTrigger).json(in)
          val q = xform(stream).writeStream.format("noop")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
          else { q.stop(); System.err.println(s"[bench] $label timed out"); -1.0 }
        } catch { case NonFatal(e) =>
          System.err.println(s"[bench] $label failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      if (a < 0) a else { val x = drainOnce(1); if (x < 0) a else math.min(a, x) }
    }
    import org.apache.spark.sql.types.{StructType, StructField, TimestampType, StringType}

    // streaming EWMA anomaly twin: per-label windowed counts →
    // flatMapGroupsWithState baseline/ratio labels over closed windows
    val (anomSecs, anomEvents) = try {
      val rows = Registry.table(spark, sfDir, "events")
        .where("event_type IS NOT NULL")
        .selectExpr("ts", "event_type AS label")
        .orderBy("ts").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("label", StringType)))
      (twinDrain("anomaly_stream", rows, schema,
        nFiles = 16, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.anomalyAlerts(
          df, "ts", "label", windowSeconds = 3600)
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] anomaly_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // trend-aware Holt capacity alerts over the same closed-window
    // fold (per-label level+trend dot products, horizons emitted)
    val (holtSecs, holtEvents) = try {
      val rows = Registry.table(spark, sfDir, "events")
        .where("event_type IS NOT NULL")
        .selectExpr("ts", "event_type AS label")
        .orderBy("ts").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("label", StringType)))
      (twinDrain("holt_alert_stream", rows, schema,
        nFiles = 16, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.holtCapacityAlerts(
          df, "ts", "label", windowSeconds = 3600, capacity = 1000.0,
          lookback = 7)
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] holt_alert_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // streaming MG-sketch trending-tokens twin: token explode →
    // batch-local MG(sketchK) pre-sketch → per-window sketch state;
    // synthetic ts spreads the corpus over 10 closed 60 s windows
    val (trendSecs, trendDocs) = try {
      val rows = Registry.table(spark, sfDir, "documents")
        .where("text IS NOT NULL")
        .selectExpr("timestamp_seconds(1700000000 + doc_id % 600) AS ts",
          "text")
        .orderBy("ts", "text").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("text", StringType)))
      (twinDrain("trending_stream_sketch", rows, schema,
        nFiles = 8, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.trendingTokensSketch(
          df, "ts", "text", windowSeconds = 60, sketchK = 30, topK = 10)
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] trending_stream_sketch setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // native session_window streaming twin: per-user session state
    // merge + watermark-close emission
    val (sessSecs, sessEvents) = try {
      val rows = Registry.table(spark, sfDir, "events")
        .where("user_id IS NOT NULL")
        .selectExpr("ts", "user_id")
        .orderBy("ts").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("user_id", org.apache.spark.sql.types.LongType)))
      (twinDrain("session_stream", rows, schema,
        nFiles = 16, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.sessionSummaryPipeline(
          df, "ts", "user_id", gapSeconds = 1800)
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] session_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // stream–stream interval join twin: clicks ⋈ purchases on user_id
    // within 6 h — TWO correlated file streams (the processor's
    // notification+object shape), both watermarked, state bounded by
    // the horizon; throughput = (left+right rows)/s drained.
    val (ijSecs, ijEvents) = try {
      import java.nio.file.{Files, Paths}
      val ev = Registry.table(spark, sfDir, "events")
        .where("user_id IS NOT NULL")
      def rowsOf(kind: String): Array[String] = ev
        .where(s"event_type = '$kind'")
        .selectExpr("ts", "user_id", "event_id")
        .orderBy("ts").toJSON.collect()
      val (lRows, rRows) = (rowsOf("click"), rowsOf("purchase"))
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("user_id", org.apache.spark.sql.types.LongType),
        StructField("event_id", org.apache.spark.sql.types.LongType)))
      val base = Files.createTempDirectory("graft_bench_interval_join")
      def drainOnce(attempt: Int): Double = {
        val (inL, inR, ckpt) =
          (s"$base/l$attempt", s"$base/r$attempt", s"$base/ckpt$attempt")
        for ((dir, rows) <- Seq(inL -> lRows, inR -> rRows)) {
          Files.createDirectories(Paths.get(dir))
          rows.grouped(math.max(1, rows.length / 8)).zipWithIndex.foreach {
            case (chunk, i) =>
              Files.writeString(Paths.get(dir, f"part_$i%03d.jsonl"),
                chunk.mkString("\n"))
          }
        }
        val t0 = System.nanoTime()
        // batch-scoped stateful width (see twinDrain's note): the
        // two-sided state is keyed on user_id — width-neutral results.
        // ONE val feeds both the source option and the width so they
        // cannot silently diverge (the width must derive from the
        // admission unit)
        val mft = 2
        try graft.streaming.StreamingPipeline.withStreamShuffleWidth(spark, mft) {
          def src(dir: String) = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", mft).json(dir)
          val q = graft.streaming.StreamingPipeline.intervalJoinPipeline(
              src(inL), "ts", src(inR), "ts", "user_id", 6L * 3600L)
            .writeStream.format("noop")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
          else { q.stop()
            System.err.println("[bench] interval_join_stream timed out"); -1.0 }
        } catch { case NonFatal(e) =>
          System.err.println(s"[bench] interval_join_stream failed: ${e.getMessage}")
          -1.0
        }
      }
      val a = drainOnce(0)
      (if (a < 0) a
       else { val x = drainOnce(1); if (x < 0) a else math.min(a, x) },
        lRows.length + rRows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] interval_join_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // RocksDB provider save/set/restore shared by every TWS drain.
    // Changelog checkpointing rides along (r18 opt round): the default
    // commit uploads a FULL RocksDB snapshot per store per batch —
    // pure per-batch fixed cost that only grows with checkpoint
    // round-trips at production scale (object-store checkpoints);
    // changelog mode commits the per-batch delta and amortizes
    // snapshots into background maintenance. Measured on the quota
    // drain (sf0.1, local[32], best-of-2): 8.1 → 5.7 s at width 8,
    // 25.2 → 13.4 s at width 32. State contents are identical — the
    // changelog replays to the same store.
    def withRocksDbProvider[A](f: => A): A =
      graft.streaming.StreamingPipeline.withRocksDbStateStore(spark)(f)

    // transformWithState hard-quota drain: first-N per (type, minute
    // window); RocksDB provider required by the operator — set for the
    // drain, restored after
    val (quotaSecs, quotaEvents) = try {
      withRocksDbProvider {
        val rows = Registry.table(spark, sfDir, "events")
          .where("event_type IS NOT NULL AND event_id IS NOT NULL")
          .selectExpr("ts", "event_type", "event_id")
          .orderBy("ts").toJSON.collect()
        val schema = StructType(Seq(StructField("ts", TimestampType),
          StructField("event_type", StringType),
          StructField("event_id", org.apache.spark.sql.types.LongType)))
        (twinDrain("quota_stream", rows, schema,
          nFiles = 16, maxFilesPerTrigger = 2, widthFloor = 8) { df =>
          graft.streaming.StreamingPipeline.quotaLimitPipeline(
            df, windowSeconds = 60, cap = 3)
        }, rows.length)
      }
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] quota_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // transformWithState streaming funnel drain (view→click→purchase,
    // 2-day gap — the batch funnel_steps parameters); RocksDB required
    val (funSecs, funEvents) = try {
      withRocksDbProvider {
        val rows = Registry.table(spark, sfDir, "events")
          .where("user_id IS NOT NULL AND " +
            "event_type IN ('view','click','purchase')")
          .selectExpr("user_id", "ts", "event_type")
          .orderBy("ts").toJSON.collect()
        val schema = StructType(Seq(
          StructField("user_id", org.apache.spark.sql.types.LongType),
          StructField("ts", TimestampType),
          StructField("event_type", StringType)))
        (twinDrain("funnel_stream", rows, schema,
          nFiles = 16, maxFilesPerTrigger = 2, widthFloor = 8) { df =>
          graft.streaming.StreamingPipeline.funnelPipeline(
            df, Seq("view", "click", "purchase"), 2L * 86400L)
        }, rows.length)
      }
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] funnel_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // chained stateful drain: dedup-within-watermark -> windowed count
    // in ONE streaming plan (two stateful operators, watermark
    // propagated through the dedup); 1 h delay keeps real dedup state
    val (novSecs, novEvents) = try {
      val rows = Registry.table(spark, sfDir, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL")
        .selectExpr("ts", "user_id", "event_type")
        .orderBy("ts").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("user_id", org.apache.spark.sql.types.LongType),
        StructField("event_type", StringType)))
      (twinDrain("novelty_stream", rows, schema,
        nFiles = 16, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.noveltyPipeline(
          df, "ts", Seq("user_id", "event_type"), "event_type",
          windowSeconds = 3600, watermarkDelay = "1 hour")
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] novelty_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // transformWithState SCD2 drain: buffer-until-watermark version
    // builder per user; RocksDB required by the operator
    val (scd2Secs, scd2Events) = try {
      withRocksDbProvider {
        val rows = Registry.table(spark, sfDir, "events")
          .where("user_id IS NOT NULL AND ts IS NOT NULL")
          .selectExpr("user_id", "ts", "event_id", "event_type")
          .orderBy("ts").toJSON.collect()
        val schema = StructType(Seq(
          StructField("user_id", org.apache.spark.sql.types.LongType),
          StructField("ts", TimestampType),
          StructField("event_id", org.apache.spark.sql.types.LongType),
          StructField("event_type", StringType)))
        (twinDrain("scd2_stream", rows, schema,
          nFiles = 16, maxFilesPerTrigger = 2, widthFloor = 8) { df =>
          graft.streaming.StreamingPipeline.scd2Pipeline(df)
        }, rows.length)
      }
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] scd2_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // transformWithState as-of join drain: purchases enriched with the
    // nearest at-or-before view per user (1-day tolerance) — TWO
    // correlated file streams, O(1) compacted ref state per key;
    // RocksDB required by the operator
    val (asofSecs, asofEvents) = try {
      withRocksDbProvider {
        import java.nio.file.{Files, Paths}
        val ev = Registry.table(spark, sfDir, "events")
          .where("user_id IS NOT NULL AND ts IS NOT NULL")
        def rowsOf(kind: String): Array[String] = ev
          .where(s"event_type = '$kind'")
          .selectExpr("ts", "user_id", "event_id")
          .orderBy("ts").toJSON.collect()
        val (pRows, rRows) = (rowsOf("purchase"), rowsOf("view"))
        val schema = StructType(Seq(StructField("ts", TimestampType),
          StructField("user_id", org.apache.spark.sql.types.LongType),
          StructField("event_id", org.apache.spark.sql.types.LongType)))
        val base = Files.createTempDirectory("graft_bench_asof")
        def drainOnce(attempt: Int): Double = {
          val (inP, inR, ckpt) =
            (s"$base/p$attempt", s"$base/r$attempt", s"$base/ckpt$attempt")
          for ((dir, rows) <- Seq(inP -> pRows, inR -> rRows)) {
            Files.createDirectories(Paths.get(dir))
            rows.grouped(math.max(1, rows.length / 8)).zipWithIndex.foreach {
              case (chunk, i) =>
                Files.writeString(Paths.get(dir, f"part_$i%03d.jsonl"),
                  chunk.mkString("\n"))
            }
          }
          val t0 = System.nanoTime()
          // batch-scoped stateful width (see twinDrain's note); one
          // val feeds both the option and the width; TWS floor 8
          val mft = 2
          try graft.streaming.StreamingPipeline.withStreamShuffleWidth(spark, mft, floor = 8) {
            def src(dir: String) = spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", mft).json(dir)
            val q = graft.streaming.StreamingPipeline.asofPipeline(
                src(inP), src(inR), watermarkDelay = "6 hours",
                toleranceSeconds = 86400L)
              .writeStream.format("noop")
              .outputMode("append").option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            if (q.awaitTermination(600000)) (System.nanoTime() - t0) / 1e9
            else { q.stop()
              System.err.println("[bench] asof_stream timed out"); -1.0 }
          } catch { case NonFatal(e) =>
            System.err.println(s"[bench] asof_stream failed: ${e.getMessage}")
            -1.0
          }
        }
        val a = drainOnce(0)
        (if (a < 0) a
         else { val x = drainOnce(1); if (x < 0) a else math.min(a, x) },
          pRows.length + rRows.length)
      }
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] asof_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // THREE chained stateful operators: day-grain dedup -> sliding
    // 7d/1d window expand + (window,label,user) agg (the structural
    // dedup) -> (window,label) count
    val (rdSecs, rdEvents) = try {
      val rows = Registry.table(spark, sfDir, "events")
        .where("user_id IS NOT NULL AND ts IS NOT NULL")
        .selectExpr("ts", "user_id", "event_type")
        .orderBy("ts").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("user_id", org.apache.spark.sql.types.LongType),
        StructField("event_type", StringType)))
      (twinDrain("rolling_distinct_stream", rows, schema,
        nFiles = 16, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.rollingDistinctPipeline(
          df, windowDays = 7, watermarkDelay = "1 hour")
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] rolling_distinct_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    // the bounded-state twin of the drain above: ONE stateful
    // hll_sketch_agg under the sliding window (state = 4 KiB per open
    // (window, label) cell vs the exact chain's per-user membership) —
    // the 100 TB dashboard runs THIS; the delta vs
    // rolling_distinct_stream is the price of exactness
    val (rdHllSecs, rdHllEvents) = try {
      val rows = Registry.table(spark, sfDir, "events")
        .where("user_id IS NOT NULL AND ts IS NOT NULL")
        .selectExpr("ts", "user_id", "event_type")
        .orderBy("ts").toJSON.collect()
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("user_id", org.apache.spark.sql.types.LongType),
        StructField("event_type", StringType)))
      (twinDrain("rolling_distinct_hll_stream", rows, schema,
        nFiles = 16, maxFilesPerTrigger = 2) { df =>
        graft.streaming.StreamingPipeline.rollingDistinctHllPipeline(
          df, windowDays = 7, watermarkDelay = "1 hour")
      }, rows.length)
    } catch { case NonFatal(e) =>
      System.err.println(s"[bench] rolling_distinct_hll_stream setup failed: ${e.getMessage}")
      (-1.0, 0)
    }

    val all = results ++ Seq("stream_json" -> jsonSecs,
      "stream_binary" -> binSecs, "admission_stream" -> admSecs,
      "admission_stream_big" -> admBigSecs,
      "anomaly_stream" -> anomSecs,
      "holt_alert_stream" -> holtSecs,
      "trending_stream_sketch" -> trendSecs,
      "session_stream" -> sessSecs,
      "interval_join_stream" -> ijSecs,
      "quota_stream" -> quotaSecs,
      "funnel_stream" -> funSecs,
      "novelty_stream" -> novSecs,
      "rolling_distinct_stream" -> rdSecs,
      "rolling_distinct_hll_stream" -> rdHllSecs,
      "scd2_stream" -> scd2Secs,
      "asof_stream" -> asofSecs,
      "semantic_admission_stream" -> semSecs,
      "index_maintenance_stream" -> idxmSecs,
      "maintained_search_delta16" -> msPreSecs,
      "maintained_search_live_compact" -> msDuringSecs,
      "maintained_search_compacted" -> msPostSecs)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // failures are UNMISTAKABLE: named in "failed", never silently
    // shrinking the total (a failed query records -1 in "queries" too)
    val failed = all.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = all.map(_._2).filter(_ >= 0).sum
    def rate(n: Int, secs: Double): Double = if (secs > 0) n / secs else -1.0
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","rounds":$rounds,"failed":$failed,"queries":$qs,"stream_json_pkts_per_sec":${rate(jsonPkts, jsonSecs)}%.0f,"stream_binary_pkts_per_sec":${rate(binPkts, binSecs)}%.0f,"admission_docs_per_sec":${rate(admDocs, admSecs)}%.0f,"admission_big_docs_per_sec":${rate(admBigDocs, admBigSecs)}%.0f,"anomaly_events_per_sec":${rate(anomEvents, anomSecs)}%.0f,"holt_alert_events_per_sec":${rate(holtEvents, holtSecs)}%.0f,"trending_docs_per_sec":${rate(trendDocs, trendSecs)}%.0f,"session_events_per_sec":${rate(sessEvents, sessSecs)}%.0f,"interval_join_events_per_sec":${rate(ijEvents, ijSecs)}%.0f,"quota_events_per_sec":${rate(quotaEvents, quotaSecs)}%.0f,"funnel_events_per_sec":${rate(funEvents, funSecs)}%.0f,"novelty_events_per_sec":${rate(novEvents, novSecs)}%.0f,"rolling_distinct_events_per_sec":${rate(rdEvents, rdSecs)}%.0f,"rolling_distinct_hll_events_per_sec":${rate(rdHllEvents, rdHllSecs)}%.0f,"scd2_events_per_sec":${rate(scd2Events, scd2Secs)}%.0f,"asof_events_per_sec":${rate(asofEvents, asofSecs)}%.0f,"semantic_admission_vecs_per_sec":${rate(semVecs, semSecs)}%.0f,"index_maintenance_vecs_per_sec":${rate(idxmVecs, idxmSecs)}%.0f,"load_avg_start":$loadStart%.2f,"load_avg_end":${loadAvg()}%.2f,"cpu_share":${
      val cpu = processCpuSecs()
      val wall = (System.nanoTime() - wallStart) / 1e9
      if (cpu < 0) -1.0
      else cpu / (wall * Runtime.getRuntime.availableProcessors())
    }%.3f,"sf":"$sfDir"}"""
    println(line)
    // the printed one-line contract stays; ALSO persist it to a
    // fixed-name file so a log-tail capture that truncates the (large)
    // line can never lose the round's per-query evidence — a write
    // failure must not fail a bench that already succeeded
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")),
      line + "\n")
    catch { case NonFatal(e) =>
      System.err.println(s"[bench] bench_last.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
