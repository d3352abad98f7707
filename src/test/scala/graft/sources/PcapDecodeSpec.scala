package graft.sources

import graft.SparkSpec
import graft.udm.UdmTransform
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S5 decode-stage plumbing: binary pcap scan → per-partition decode →
  * packet rows → UDM transform, with the stub decoder standing in for
  * the tshark subprocess. */
class PcapDecodeSpec extends SparkSpec {

  test("binary pcap files decode to packet rows and flow into the UDM transform") {
    val dir = Files.createTempDirectory("graft_pcap").toString
    Files.write(Paths.get(dir, "capture_a.pcap"), Array.fill[Byte](130)(7)) // 3 chunks
    Files.write(Paths.get(dir, "capture_b.pcapng"), Array.fill[Byte](64)(9)) // 1 chunk
    Files.writeString(Paths.get(dir, "notes.txt"), "ignored by glob")

    val packets = PcapDecode.decode(spark, dir)
    assert(packets.count() == 4)
    assert(packets.select("source_file").distinct().count() == 2)

    val udm = UdmTransform.transform(packets, "raw")
      .select(col("event_struct.event.metadata.event_type").as("t"))
      .groupBy("t").count().collect()
    assert(udm.length == 1 && udm(0).getString(0) == "NETWORK_CONNECTION")
    assert(udm(0).getLong(1) == 4) // every decoded packet became an event

    // determinism: same bytes → same packets
    val again = PcapDecode.decode(spark, dir).orderBy("source_file", "raw").collect()
    val first = PcapDecode.decode(spark, dir).orderBy("source_file", "raw").collect()
    assert(again.map(_.toString).toSeq == first.map(_.toString).toSeq)
  }
}
