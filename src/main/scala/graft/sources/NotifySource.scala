package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-notify` — a true notification-queue streaming source with the
  * reference subscription's delivery semantics (reference
  * terraform/main.tf:202–231, processor_app.py:108–133), built as a
  * first-class DataSourceV2 [[MicroBatchStream]]:
  *
  *  - a *message* is one file in the queue directory; its content is
  *    the payload (for the reference: just the capture-object name,
  *    sniffer_entrypoint.sh:192);
  *  - *delivery* is at-least-once: a micro-batch that fails before its
  *    checkpoint commit is redelivered in full on restart (the Pub/Sub
  *    redelivery analog — pair with the pipeline's retry budget for
  *    the 5-attempts-then-DLQ policy);
  *  - *ack* happens at `commit(offset)` — exactly the Pub/Sub ack on
  *    the processed message set — and optionally deletes or archives
  *    the acked message files (`ack=delete|archive|off`, default off;
  *    `archiveDir` for archive);
  *  - *ordering* is (modification time, name): monotonic for any real
  *    delivery directory (new messages arrive with fresh mtimes; ties
  *    broken by name). The offset is that watermark pair — O(1) state
  *    in the checkpoint, no unbounded seen-set.
  *
  * Usage: `spark.readStream.format("graft-notify").load(dir)` →
  * schema `message_id: string, payload: string, publish_ms: bigint`.
  * At 100 TB scale the queue directory holds notifications (tiny), not
  * data — the payload names the object to fetch, so queue listing cost
  * is proportional to message count, never data volume.
  */
class NotifySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-notify"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NotifySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // DSv2 options are conventionally case-insensitive; a user writing
    // .option("maxmessagespertrigger", …) must not silently run unbounded
    val opts = new CaseInsensitiveStringMap(properties)
    new NotifyTable(opts.get("path"),
      Option(opts.get("ack")).getOrElse("off"),
      Option(opts.get("archiveDir")),
      Option(opts.get("maxMessagesPerTrigger")).map(_.toInt),
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
  }
}

object NotifySource {
  val schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("publish_ms", LongType, nullable = false)))

  /** Test probe: total queue-directory `listStatus` calls across all
    * graft-notify streams. The listing contract — at most ONE full
    * listing per micro-batch regardless of backlog size — is
    * spec-asserted against this counter. */
  private[graft] val listings = new java.util.concurrent.atomic.AtomicLong(0)
}

class NotifyTable(path: String, ack: String, archiveDir: Option[String],
                  maxMessagesPerTrigger: Option[Int],
                  conf: org.apache.spark.util.SerializableConfiguration)
  extends Table with SupportsRead {
  require(path != null, "graft-notify requires a queue directory: .load(dir)")
  require(maxMessagesPerTrigger.forall(_ > 0),
    s"maxMessagesPerTrigger must be positive: ${maxMessagesPerTrigger.get}")
  require(Set("off", "delete", "archive")(ack),
    s"ack=$ack (expected delete|archive|off)") // fail at plan time, not first commit
  override def name(): String = s"graft-notify:$path"
  override def schema(): StructType = NotifySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = NotifySource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new NotifyMicroBatchStream(path, ack, archiveDir, maxMessagesPerTrigger, conf)
      }
    }
}

/** Offset = high-watermark (mtime ms, name) over the message log. */
case class NotifyOffset(ms: Long, name: String) extends Offset {
  override def json(): String =
    s"""{"ms":$ms,"name":"${name.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
}

class NotifyMicroBatchStream(path: String, ack: String, archiveDir: Option[String],
                             maxMessagesPerTrigger: Option[Int],
                             conf: org.apache.spark.util.SerializableConfiguration)
  extends MicroBatchStream with SupportsTriggerAvailableNow {
  import org.apache.hadoop.fs.{FileStatus, Path}

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[NotifyMicroBatchStream])

  // the session's Hadoop configuration (fs credentials, defaultFS, …)
  // — a bare `new Configuration()` would silently drop spark.hadoop.*
  private def fs = new Path(path).getFileSystem(conf.value)

  private def listSorted(): Seq[FileStatus] = {
    NotifySource.listings.incrementAndGet()
    val dir = new Path(path)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).filter(_.isFile)
      .sortBy(f => (f.getModificationTime, f.getPath.getName)).toSeq
  }

  /** One listing per trigger (r3 verdict #1): `latestOffset` performs the
    * trigger's single full `listStatus` and caches the snapshot here;
    * `planInputPartitions`, `reportLatestOffset` AND `commit` reuse it
    * instead of re-listing — so a 10M-message backlog costs ONE
    * O(queue) listing per bounded micro-batch, not three. The only
    * re-list is restart recovery, where Spark replans/commits a batch
    * before any `latestOffset` call (and that path re-fills the
    * snapshot, so the recovery trigger also lists once). */
  @volatile private var listingSnapshot: Seq[FileStatus] = null

  private def after(f: FileStatus, o: NotifyOffset): Boolean = {
    val k = (f.getModificationTime, f.getPath.getName)
    k._1 > o.ms || (k._1 == o.ms && k._2 > o.name)
  }

  /** Watermark candidates exclude the CURRENT millisecond: a producer
    * can still create a message in this ms whose (mtime, name) sorts
    * below an already-listed same-ms file — advancing the watermark
    * into an in-flux ms would skip (and, with ack, delete) that message
    * forever. Capping at `now - 1` guarantees every later-created file
    * sorts after the watermark (assumes mtimes are not backdated, true
    * for any real delivery directory). */
  private def scanLatest(): NotifyOffset = {
    val cutoff = System.currentTimeMillis()
    val files = listSorted().filter(_.getModificationTime < cutoff)
    if (files.isEmpty) NotifyOffset(Long.MinValue, "")
    else NotifyOffset(files.last.getModificationTime, files.last.getPath.getName)
  }

  // Trigger.AvailableNow: freeze the target offset at query start so the
  // run drains exactly the messages present then and terminates
  @volatile private var availableNowCap: Option[NotifyOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    // the watermark cutoff excludes the current (in-flux) millisecond —
    // but "write messages, then start an AvailableNow drain" is the
    // common pattern, and a message written in THIS ms would otherwise
    // be invisible to this run. Wait (bounded) for the clock to pass
    // the newest existing mtime so everything already present drains.
    val files = listSorted()
    if (files.nonEmpty) {
      val newest = files.last.getModificationTime
      val deadline = System.currentTimeMillis() + 100
      while (System.currentTimeMillis() <= newest &&
             System.currentTimeMillis() < deadline) Thread.sleep(1)
    }
    // derive the cap from the listing already taken (no second listStatus):
    // the bounded wait above moved the clock past every listed mtime, so
    // the cutoff filter below only excludes future-dated (skewed) files
    val cutoff = System.currentTimeMillis()
    val eligible = files.filter(_.getModificationTime < cutoff)
    val cap =
      if (eligible.isEmpty) NotifyOffset(Long.MinValue, "")
      else NotifyOffset(eligible.last.getModificationTime, eligible.last.getPath.getName)
    // clock skew / future-dated mtimes beyond the bounded wait: the
    // frozen cap would silently exclude already-present messages from
    // this drain — make that observable (ADVICE r2)
    val excluded = files.count(f => after(f, cap))
    if (excluded > 0)
      log.warn(s"graft-notify AvailableNow cap at (${cap.ms},${cap.name}) excludes " +
        s"$excluded listed message(s) with future mtimes (clock skew?); " +
        "they will drain in a later run")
    availableNowCap = Some(cap)
  }

  /** Admission control (the reference subscription's flow control —
    * ack-deadline + bounded per-instance concurrency,
    * terraform/variables.tf:56–60): without it a backlog of N messages
    * drains as ONE micro-batch — a driver-memory hazard in
    * notifyPipeline's payload collect and an all-or-nothing poison/DLQ
    * granularity. `maxMessagesPerTrigger` is the file source's
    * maxFilesPerTrigger analog. */
  override def getDefaultReadLimit: ReadLimit =
    maxMessagesPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())

  private def maxRowsOf(limit: ReadLimit): Option[Long] = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadMaxRows}
    limit match {
      case r: ReadMaxRows => Some(r.maxRows())
      case c: CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(maxRowsOf).reduceOption(_ min _)
      case _ => None
    }
  }

  /** Next batch's end offset: messages after `start` (the committed
    * watermark — never regress below it, even when ack-cleanup has
    * emptied the directory), capped by the AvailableNow freeze and
    * admitted up to the read limit. An AvailableNow drain of a large
    * backlog thus terminates after ⌈N/limit⌉ micro-batches rather than
    * one unbounded batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[NotifyOffset]
    // cutoff BEFORE the listing (scanLatest's in-flux-ms rule): taken
    // after, a message created in the listing's millisecond — but after
    // the listStatus — could be passed over by a watermark that
    // advances into that ms, skipping it forever
    val cutoff = System.currentTimeMillis()
    val all = listSorted() // the trigger's ONE listing
    listingSnapshot = all
    val visible = availableNowCap match {
      case Some(cap) => all.filter(f => !after(f, cap))
      case None => all.filter(_.getModificationTime < cutoff)
    }
    val pending = visible.filter(f => after(f, s))
    val admitted = maxRowsOf(limit) match {
      case Some(n) if pending.length > n => pending.take(n.toInt)
      case _ => pending
    }
    if (admitted.isEmpty) s
    else NotifyOffset(admitted.last.getModificationTime, admitted.last.getPath.getName)
  }

  /** Advisory (backlog metrics only): latest message in this trigger's
    * snapshot — never an extra listing in steady state. */
  override def reportLatestOffset(): Offset = {
    val snap = listingSnapshot
    if (snap == null) scanLatest()
    else if (snap.isEmpty) NotifyOffset(Long.MinValue, "")
    else NotifyOffset(snap.last.getModificationTime, snap.last.getPath.getName)
  }

  override def initialOffset(): Offset = NotifyOffset(Long.MinValue, "")

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset = {
    // minimal parse of the fixed {"ms":N,"name":"..."} shape
    val m = """\{"ms":(-?\d+),"name":"(.*)"\}""".r
    json match {
      case m(ms, name) =>
        NotifyOffset(ms.toLong, name.replace("\\\"", "\"").replace("\\\\", "\\"))
      case other => throw new IllegalArgumentException(s"bad NotifyOffset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[NotifyOffset]
    val e = end.asInstanceOf[NotifyOffset]
    // `end` was chosen from this trigger's snapshot, so the snapshot
    // contains every file in (start, end] — reuse it. A null snapshot
    // means restart recovery (Spark replans the in-flight batch before
    // calling latestOffset): list once there and keep the snapshot for
    // that batch's commit.
    var snap = listingSnapshot
    if (snap == null) { snap = listSorted(); listingSnapshot = snap }
    snap
      .filter(f => after(f, s) && !after(f, e))
      .map(f => NotifyPartition(f.getPath.toString, f.getPath.getName,
        f.getModificationTime, conf): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new NotifyReader(partition.asInstanceOf[NotifyPartition])
    }

  /** Ack: the offset's message set is processed-and-committed — apply
    * the cleanup policy to every message at-or-before the watermark
    * (K5 analog; Pub/Sub ack), SWEPT from the trigger's cached listing
    * snapshot rather than a fresh listStatus. Sweeping (vs acking only
    * the batch's planned names) is deliberate: a partially-failed ack
    * (crash mid-delete after the commit log recorded the batch) leaves
    * below-watermark stragglers that only a sweep ever reclaims — and
    * the snapshot makes the sweep free. The only re-list is a restart
    * incarnation that commits before any listing exists.
    *
    * Corollary of the no-backdated-mtimes contract (see [[scanLatest]]):
    * a file moved in WITH a preserved old mtime below the watermark is
    * undeliverable by the ordering contract, and the sweep applies the
    * cleanup policy to it like any other sub-watermark file — under
    * ack=archive it is preserved in the archive dir; producers that
    * copy files in must give them fresh mtimes. */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[NotifyOffset]
    if (ack == "off") return
    val snap = listingSnapshot
    val acked = (if (snap != null) snap else listSorted())
      .filter(f => !after(f, e))
    ack match {
      case "delete" => acked.foreach(f => fs.delete(f.getPath, false))
      case "archive" =>
        val dir = new Path(archiveDir.getOrElse(s"$path/_acked"))
        fs.mkdirs(dir)
        // exists-guard: snapshot entries can be a trigger old; rename of
        // a vanished source throws on some FileSystems
        acked.foreach(f =>
          if (fs.exists(f.getPath)) fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
      case other => throw new IllegalArgumentException(s"ack=$other (delete|archive|off)")
    }
  }

  override def stop(): Unit = ()
}

case class NotifyPartition(filePath: String, name: String, mtime: Long,
                           conf: org.apache.spark.util.SerializableConfiguration)
  extends InputPartition

/** One message per partition: reads the payload file content. Messages
  * are tiny (a filename / a small JSON); one task per message mirrors
  * the reference's one-delivery-per-request model and keeps redelivery
  * granularity per message. */
class NotifyReader(p: NotifyPartition) extends PartitionReader[InternalRow] {
  import org.apache.hadoop.fs.Path

  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val path = new Path(p.filePath)
    val fs = path.getFileSystem(p.conf.value)
    val in = fs.open(path)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    row = InternalRow(
      UTF8String.fromString(p.name),
      UTF8String.fromBytes(bytes),
      p.mtime)
    done = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
