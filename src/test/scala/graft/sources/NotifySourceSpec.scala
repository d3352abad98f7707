package graft.sources

import graft.SparkSpec
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

/** The graft-notify DataSourceV2 stream: Pub/Sub-shaped delivery —
  * exactly-once across restarts via checkpointed offsets, ack-on-commit
  * cleanup, and the notification-driven pipeline (payload names the
  * object to process). */
class NotifySourceSpec extends SparkSpec {

  /** Write a message file with an explicit, strictly-increasing mtime
    * (the source orders by (mtime, name); tests must not depend on
    * filesystem timestamp granularity). */
  private def msg(dir: String, name: String, payload: String, mtimeMs: Long): Unit = {
    val p = Paths.get(dir, name)
    Files.writeString(p, payload)
    Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs))
  }

  test("delivers each message once across restarts; ack=delete cleans the queue") {
    val q = Files.createTempDirectory("graft_q").toString
    val ckpt = Files.createTempDirectory("graft_qckpt").toString
    val out = Files.createTempDirectory("graft_qout").toString
    msg(q, "m1", "capture_001.pcap.json", 1000000L)
    msg(q, "m2", "capture_002.pcap.json", 1000001L)

    def runOnce(): Unit = {
      val stream = spark.readStream.format("graft-notify")
        .option("ack", "delete").load(q)
      val qq = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.mode("overwrite").json(s"$out/batch_id=$id"); ()
        }
        .start()
      qq.awaitTermination(120000)
    }
    runOnce()
    val got1 = spark.read.json(out).select("message_id", "payload").collect()
      .map(r => (r.getAs[String]("message_id"), r.getAs[String]("payload"))).sorted.toSeq
    assert(got1 == Seq("m1" -> "capture_001.pcap.json", "m2" -> "capture_002.pcap.json"))

    // a new message after restart is delivered exactly once; the engine
    // acks (commits) the previous batch on the next incarnation, so the
    // first run's messages are cleaned here (lazy ack, like Kafka
    // offset commits)
    msg(q, "m3", "capture_003.pcap.json", 1000002L)
    runOnce()
    val got2 = spark.read.json(out).select("message_id").collect()
      .map(_.getAs[String]("message_id")).sorted.toSeq
    assert(got2 == Seq("m1", "m2", "m3"))
    assert(!Files.exists(Paths.get(q, "m1")) && !Files.exists(Paths.get(q, "m2")))
  }

  test("AvailableNow drains messages written in the current millisecond") {
    val q = Files.createTempDirectory("graft_nowq").toString
    val ckpt = Files.createTempDirectory("graft_nowckpt").toString
    val out = Files.createTempDirectory("graft_nowout").toString
    // real filesystem mtime = NOW — no backdating, start immediately
    Files.writeString(Paths.get(q, "m1"), "fresh.pcap.json")
    val qq = spark.readStream.format("graft-notify").load(q)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").json(s"$out/batch_id=$id"); ()
      }.start()
    qq.awaitTermination(120000)
    val got = spark.read.json(out).select("payload").collect().map(_.getAs[String]("payload"))
    assert(got.toSeq == Seq("fresh.pcap.json"))
  }

  test("admission control: a backlog drains in <=maxMessagesPerTrigger micro-batches") {
    val q = Files.createTempDirectory("graft_bq").toString
    val ckpt = Files.createTempDirectory("graft_bckpt").toString
    val n = 1000
    (0 until n).foreach(i => msg(q, f"m$i%04d", s"payload_$i", 5000000L + i))

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.Set.empty[String]
    val qq = spark.readStream.format("graft-notify")
      .option("maxMessagesPerTrigger", 128).load(q)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("message_id").collect().map(_.getString(0))
        batchSizes.synchronized { batchSizes += ids.length; seen ++= ids }
        ()
      }.start()
    qq.awaitTermination(300000)

    assert(seen.size == n, s"all $n messages delivered, got ${seen.size}")
    assert(batchSizes.forall(_ <= 128), s"every batch bounded: $batchSizes")
    assert(batchSizes.count(_ > 0) >= n / 128,
      s"backlog split into multiple admission-bounded batches: $batchSizes")
  }

  test("latestOffset never regresses below the committed offset after ack-delete") {
    val q = Files.createTempDirectory("graft_rq").toString
    val ckpt = Files.createTempDirectory("graft_rckpt").toString
    val out = Files.createTempDirectory("graft_rout").toString

    def runOnce(): Unit = {
      val qq = spark.readStream.format("graft-notify")
        .option("ack", "delete").load(q)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (!b.isEmpty) b.write.mode("overwrite").json(s"$out/batch_id=$id"); ()
        }.start()
      qq.awaitTermination(120000)
    }

    msg(q, "m1", "first", 6000000L)
    runOnce()
    // ack=delete emptied the queue: a rescan sees nothing — the offset
    // must hold at the committed watermark, not rewind to MinValue
    runOnce()
    // a file backdated BELOW the acked watermark must not be redelivered
    // past the ack point (the watermark is monotonic; mtime ordering is
    // the source's delivery contract)
    msg(q, "m0_backdated", "stale", 5999999L)
    runOnce()
    val delivered = spark.read.json(s"$out/*").select("payload").collect()
      .map(_.getAs[String]("payload")).toSeq
    assert(delivered == Seq("first"), s"backdated file redelivered: $delivered")
  }

  private val goodPacket =
    """{"_source": {"layers": {
      |"frame": {"frame.number": "1", "frame.time_utc": "Sep  5, 2025 12:34:56.123456000 UTC", "frame.protocols": "eth:ethertype:ip:tcp"},
      |"ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
      |"tcp": {"tcp.srcport": "1234", "tcp.dstport": "80", "tcp.flags": "0x0018"}}}}""".stripMargin.replace("\n", "")

  test("notification-driven pipeline: GET-by-payload, F1 rejects, counts") {
    val q = Files.createTempDirectory("graft_nq").toString
    val data = Files.createTempDirectory("graft_ndata").toString
    val out = Files.createTempDirectory("graft_nout").toString
    val ckpt = Files.createTempDirectory("graft_nckpt").toString
    Files.writeString(Paths.get(data, "capture_a.pcap.json"),
      s"[$goodPacket,$goodPacket]")
    Files.writeString(Paths.get(data, "capture_b.pcap.json"), s"[$goodPacket]")
    msg(q, "m1", "capture_a.pcap.json", 2000000L)
    msg(q, "m2", "capture_b.pcap.json", 2000001L)
    msg(q, "m3", "../evil.pcap.json", 2000002L) // F1: must dead-letter, no retry

    val qq = StreamingPipeline.notifyPipeline(spark, q, data, out, ckpt,
      trigger = Trigger.AvailableNow()).start()
    qq.awaitTermination(120000)

    assert(spark.read.text(s"$out/events").count() == 3)
    val notif = spark.read.json(s"$out/_notifications")
    assert(notif.agg(sum("packets_processed")).head().getLong(0) == 3)
    val dlq = spark.read.json(s"$out/_errors")
    val bad = dlq.filter(col("dlq_reason") === "invalid filename").collect()
    assert(bad.length == 1 && bad(0).getAs[String]("payload") == "../evil.pcap.json")
  }

  test("a payload naming a missing object exhausts the retry budget into the DLQ") {
    val q = Files.createTempDirectory("graft_mq").toString
    val data = Files.createTempDirectory("graft_mdata").toString
    val out = Files.createTempDirectory("graft_mout").toString
    val ckpt = Files.createTempDirectory("graft_mckpt").toString
    msg(q, "m1", "does_not_exist.pcap.json", 3000000L)

    def runOnce(): Boolean =
      try {
        val qq = StreamingPipeline.notifyPipeline(spark, q, data, out, ckpt,
          trigger = Trigger.AvailableNow(), maxAttempts = 2).start()
        qq.awaitTermination(120000); true
      } catch {
        case _: org.apache.spark.sql.streaming.StreamingQueryException => false
      }
    assert(!runOnce()) // read of the missing object throws
    assert(!runOnce()) // budget consumed
    assert(runOnce())  // dead-letter + commit
    val dlq = spark.read.json(s"$out/_errors")
    assert(dlq.filter(col("dlq_reason") === "retry budget exhausted").count() == 1)
  }
}
