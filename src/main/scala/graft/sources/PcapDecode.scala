package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — the pcap → tshark-JSON decode stage. The reference shells out
  * to `tshark -r f -T json` once per file (reference
  * processor/processor_app.py:149–155); the Spark-native shape is a
  * binaryFile scan + per-partition decode, so a 1000-executor cluster
  * decodes 1000 pcaps concurrently with no intermediate files.
  *
  * Three interchangeable decoders:
  *  - [[PcapParser.nativeDecoder]] (DEFAULT) — a real in-JVM libpcap
  *    parser (Ethernet/IPv4/IPv6/TCP/UDP/ICMP/ARP + DNS/HTTP/TLS-SNI)
  *    emitting tshark-shaped JSON; no external processes;
  *  - [[processDecoder]] — the reference's subprocess hop for a real
  *    tshark (exotic link types, deeper dissection);
  *  - [[stubDecoder]] — deterministic synthetic packets from payload
  *    bytes, for load/pipeline tests without real captures.
  */
object PcapDecode {

  type Decoder = (String, Array[Byte]) => Iterator[String]

  /** Deterministic fake decode: one synthetic TCP packet per 64-byte
    * chunk of payload, fields derived from the chunk bytes. Stands in
    * for tshark's JSON output so downstream UDM plumbing is exercised
    * end-to-end. */
  val stubDecoder: Decoder = (path, bytes) => {
    val name = path.replaceAll("^.*/", "")
    bytes.grouped(64).zipWithIndex.map { case (chunk, i) =>
      val b0 = chunk.headOption.getOrElse(0: Byte) & 0xff
      val b1 = (if (chunk.length > 1) chunk(1) else 0: Byte) & 0xff
      s"""{"_source":{"layers":{
         |"frame":{"frame.number":"${i + 1}","frame.time_utc":"Jan 01, 2024 00:00:${"%02d".format(i % 60)} UTC","frame.protocols":"eth:ethertype:ip:tcp"},
         |"ip":{"ip.src":"10.0.$b0.$b1","ip.dst":"10.0.0.1","ip.ttl":"64"},
         |"tcp":{"tcp.srcport":"${1024 + b0}","tcp.dstport":"443","tcp.flags":"0x0002"}
         |}}}""".stripMargin.replace("\n", "")
    }
  }

  /** Real subprocess decode — the reference's `tshark -r f -T json`
    * hop (processor_app.py:149–155) run INSIDE the scan partition:
    * bytes land in a task-local temp file (tshark can't stream all
    * capture formats from stdin), `cmd tmpfile` runs, and the JSON
    * array on stdout splits into one raw packet string per element.
    * Executors each decode their own files — per-file parallelism, no
    * driver hop. Output is buffered per file (as the reference does);
    * files are notification-sized (~10 MB rotations), not unbounded.
    * A nonzero exit fails the task loudly with the decoder's stderr —
    * upstream retry/DLQ policy decides what happens next.
    *
    * Usage: `decode(spark, dir, decoder = processDecoder(Seq("tshark",
    * "-T", "json", "-r")))` — the file path is appended as the last
    * argument. */
  def processDecoder(cmd: Seq[String]): Decoder = (path, bytes) => {
    import java.nio.file.Files
    val tmp = Files.createTempFile("graft_pcap_", ".pcap")
    val errTmp = Files.createTempFile("graft_pcap_err_", ".txt")
    try {
      Files.write(tmp, bytes)
      val pb = new ProcessBuilder((cmd :+ tmp.toString): _*)
      pb.redirectError(ProcessBuilder.Redirect.to(errTmp.toFile))
      val proc = pb.start()
      proc.getOutputStream.close()
      val out = new String(proc.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      if (rc != 0) {
        val err = new String(Files.readAllBytes(errTmp),
          java.nio.charset.StandardCharsets.UTF_8).take(2048)
        throw new RuntimeException(
          s"decoder '${cmd.mkString(" ")}' exited $rc for $path: $err")
      }
      splitJsonArray(out).iterator
    } finally {
      Files.deleteIfExists(tmp)
      Files.deleteIfExists(errTmp)
    }
  }

  /** Split a JSON array into compact per-element strings (tshark emits
    * one array per file; downstream wants one packet per row). */
  private def splitJsonArray(s: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(s)
    require(node != null && node.isArray,
      s"decoder output is not a JSON array: ${s.take(80)}")
    (0 until node.size).map(i => mapper.writeValueAsString(node.get(i)))
  }

  /** Read raw pcap files and decode each to packet rows
    * (`source_file`, `raw`). Decode runs inside the scan's partitions —
    * per-file parallelism, no driver involvement, no temp files. */
  def decode(spark: SparkSession, dir: String, glob: String = "*.pcap*",
             decoder: Decoder = PcapParser.nativeDecoder): DataFrame =
    decodeScan(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir), decoder)

  /** Same decode over an explicit file list — the notification-driven
    * shape, where a micro-batch's payloads name the exact objects to
    * fetch (download → decode → transform, processor_app.py:144–163). */
  def decodePaths(spark: SparkSession, paths: Seq[String],
                  decoder: Decoder = PcapParser.nativeDecoder): DataFrame =
    decodeScan(spark.read.format("binaryFile").load(paths: _*), decoder)

  /** [[decodePaths]] with per-FILE error containment: a capture whose
    * decode throws yields ONE marker row (`source_file`, a
    * non-JSON `GRAFT_DECODE_ERROR …` string) instead of failing the
    * whole scan. The marker is unparseable on purpose — downstream the
    * total UDM transform (P14) turns it into a Malformed error event
    * that the pipeline's `is_error` routing dead-letters, so one
    * corrupt capture DLQs one message while every co-batched message
    * still processes (the reference handles each notification in its
    * own request — this is that granularity inside one micro-batch).
    * Only the decoders' documented bad-input signals are contained:
    * IllegalArgumentException (the native parser's fail-loud contract,
    * fuzz-asserted to be its only bad-input throw), IOException
    * (unparseable subprocess output), and a BARE RuntimeException (the
    * subprocess nonzero-exit signal). Genuine decoder bugs — NPE,
    * index errors, OOM — still fail the task loudly instead of being
    * masked as bad input. */
  def decodePathsContained(spark: SparkSession, paths: Seq[String],
                           decoder: Decoder = PcapParser.nativeDecoder): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        try {
          // decoders are lazy iterators: force inside the try so a
          // mid-file parse failure is contained too, not thrown later
          decoder(path, bytes).map(raw => (path, raw)).toVector.iterator
        } catch {
          case e if e.isInstanceOf[IllegalArgumentException] ||
            e.isInstanceOf[java.io.IOException] ||
            e.getClass == classOf[RuntimeException] =>
            Iterator.single((path,
              s"GRAFT_DECODE_ERROR ${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      })
      .toDF("source_file", "raw")
  }

  private def decodeScan(files: DataFrame, decoder: Decoder): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        decoder(path, bytes).map(raw => (path, raw))
      })
      .toDF("source_file", "raw")
  }
}
