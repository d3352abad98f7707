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
                        properties: java.util.Map[String, String]): Table =
    new NotifyTable(properties.get("path"),
      Option(properties.get("ack")).getOrElse("off"),
      Option(properties.get("archiveDir")),
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
}

object NotifySource {
  val schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("publish_ms", LongType, nullable = false)))
}

class NotifyTable(path: String, ack: String, archiveDir: Option[String],
                  conf: org.apache.spark.util.SerializableConfiguration)
  extends Table with SupportsRead {
  require(path != null, "graft-notify requires a queue directory: .load(dir)")
  override def name(): String = s"graft-notify:$path"
  override def schema(): StructType = NotifySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = NotifySource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new NotifyMicroBatchStream(path, ack, archiveDir, conf)
      }
    }
}

/** Offset = high-watermark (mtime ms, name) over the message log. */
case class NotifyOffset(ms: Long, name: String) extends Offset {
  override def json(): String =
    s"""{"ms":$ms,"name":"${name.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
}

class NotifyMicroBatchStream(path: String, ack: String, archiveDir: Option[String],
                             conf: org.apache.spark.util.SerializableConfiguration)
  extends MicroBatchStream with SupportsTriggerAvailableNow {
  import org.apache.hadoop.fs.{FileStatus, Path}

  // the session's Hadoop configuration (fs credentials, defaultFS, …)
  // — a bare `new Configuration()` would silently drop spark.hadoop.*
  private def fs = new Path(path).getFileSystem(conf.value)

  private def listSorted(): Seq[FileStatus] = {
    val dir = new Path(path)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).filter(_.isFile)
      .sortBy(f => (f.getModificationTime, f.getPath.getName)).toSeq
  }

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
    availableNowCap = Some(scanLatest())
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowCap.getOrElse(scanLatest())
  override def reportLatestOffset(): Offset = scanLatest()

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
    listSorted()
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
    * (K5 analog; Pub/Sub ack). */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[NotifyOffset]
    if (ack == "off") return
    val acked = listSorted().filter(f => !after(f, e))
    ack match {
      case "delete" => acked.foreach(f => fs.delete(f.getPath, false))
      case "archive" =>
        val dir = new Path(archiveDir.getOrElse(s"$path/_acked"))
        fs.mkdirs(dir)
        acked.foreach(f => fs.rename(f.getPath, new Path(dir, f.getPath.getName)))
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
