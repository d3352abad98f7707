package graft.sources

import graft.SparkSpec
import graft.udm.UdmTransform
import org.apache.spark.sql.functions._

/** Differential parity check: [[PcapParser.nativeDecoder]] vs the
  * reference's REAL tshark subprocess hop ([[PcapDecode.processDecoder]],
  * reference processor/processor_app.py:149–155) on IDENTICAL capture
  * bytes, compared at the UDM-event level.
  *
  * This is the reference's golden-file procedure (reference
  * test/readme.md:7–15) made executable: its upstream golden blobs were
  * never published (.MISSING_LARGE_BLOBS), so instead of frozen
  * fixtures we synthesize a multi-protocol capture from the public pcap
  * spec ([[CaptureBytes]]), pipe it through BOTH decode paths, and
  * assert the downstream UDM events agree on every field the transform
  * extracts (event type, principal/target endpoints, DNS question,
  * HTTP host, TLS SNI, timestamps).
  *
  * The comparison is at the UDM level, not raw-JSON level, on purpose:
  * real tshark emits hundreds of dissector fields the pipeline never
  * reads and whose set varies by tshark version; the parity that
  * matters — and that this spec pins — is "a user switching the decode
  * hop sees identical events".
  *
  * Skip-if-absent: the build container ships no tshark, so there the
  * spec reports one cancelled test (visible in the run, not silently
  * green). On any host with tshark on PATH it runs for real.
  */
class TsharkDifferentialSpec extends SparkSpec {

  private val tsharkBin: Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .iterator.filter(_.nonEmpty)
      .map(p => java.nio.file.Paths.get(p, "tshark"))
      .find(java.nio.file.Files.isExecutable)
      .map(_.toString)

  /** UDM fields both decode paths must agree on, one row per packet. */
  private def udmView(raws: Seq[String]) = {
    import spark.implicits._
    val packets = raws.zipWithIndex
      .map { case (raw, i) => (f"diff_$i%03d", raw) }
      .toDF("source_file", "raw")
    UdmTransform.transform(packets, "raw")
      .select(
        col("event_struct.event.metadata.event_type").as("event_type"),
        col("event_struct.event.metadata.event_timestamp").as("ts"),
        col("event_struct.event.principal.ip").as("p_ip"),
        col("event_struct.event.principal.port").as("p_port"),
        col("event_struct.event.target.ip").as("t_ip"),
        col("event_struct.event.target.port").as("t_port"),
        col("event_struct.event.network.dns.questions").as("dns_q"),
        col("event_struct.event.network.http.response_headers").as("http_h"),
        col("event_struct.event.network.tls.client.server_name").as("sni"))
      .collect().map(_.toString).sorted.toSeq
  }

  test("nativeDecoder matches real tshark at the UDM level on one capture") {
    assume(tsharkBin.isDefined, "tshark not on PATH — differential skipped " +
      "(documented: the build container has no tshark; run on a host that does)")
    val bytes = CaptureBytes.pcapFile(CaptureBytes.samplePackets)
    val native = PcapParser.nativeDecoder("diff.pcap", bytes).toSeq
    val viaTshark = PcapDecode.processDecoder(
      Seq(tsharkBin.get, "-T", "json", "-r"))("diff.pcap", bytes).toSeq
    assert(native.length == viaTshark.length,
      s"packet count differs: native=${native.length} tshark=${viaTshark.length}")
    assert(udmView(native) == udmView(viaTshark))
  }
}
