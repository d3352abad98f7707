package graft.sources

import graft.SparkSpec
import graft.udm.UdmTransform
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

/** Native libpcap decode: hand-built capture bytes → tshark-shaped
  * JSON → the UDM transform, covering every decoded protocol. The pcap
  * bytes are constructed from the public format spec (no fixtures). */
class PcapParserSpec extends SparkSpec {

  // ----------------------------------------------------- byte builders

  private def u8(out: ByteArrayOutputStream, v: Int): Unit = out.write(v & 0xff)
  private def u16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def ethernet(etherType: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Array.tabulate[Byte](6)(i => (0x10 + i).toByte)) // dst
    o.write(Array.tabulate[Byte](6)(i => (0x20 + i).toByte)) // src
    u16(o, etherType); o.write(payload)
    o.toByteArray
  }

  private def ipv4(proto: Int, src: Array[Int], dst: Array[Int],
                   payload: Array[Byte], ttl: Int = 64): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u8(o, 0x45); u8(o, 0) // ver/ihl, tos
    u16(o, 20 + payload.length); u16(o, 1); u16(o, 0) // len, id, flags/frag
    u8(o, ttl); u8(o, proto); u16(o, 0) // ttl, proto, cksum
    src.foreach(u8(o, _)); dst.foreach(u8(o, _))
    o.write(payload); o.toByteArray
  }

  private def tcp(srcPort: Int, dstPort: Int, flags: Int,
                  payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, srcPort); u16(o, dstPort)
    u32(o, 1); u32(o, 2)          // seq, ack
    u8(o, 0x50); u8(o, flags)     // data offset 5 words, flags
    u16(o, 8192); u16(o, 0); u16(o, 0) // window, cksum, urg
    o.write(payload); o.toByteArray
  }

  private def udp(srcPort: Int, dstPort: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, srcPort); u16(o, dstPort); u16(o, 8 + payload.length); u16(o, 0)
    o.write(payload); o.toByteArray
  }

  private def dnsQuery(name: String, qtype: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, 0x1234); u16(o, 0x0100) // id, flags: standard query RD
    u16(o, 1); u16(o, 0); u16(o, 0); u16(o, 0)
    name.split('.').foreach { label =>
      u8(o, label.length); o.write(label.getBytes("ASCII"))
    }
    u8(o, 0); u16(o, qtype); u16(o, 1)
    o.toByteArray
  }

  /** Response with a compression-pointer answer name (0xC00C → the
    * question name at offset 12). */
  private def dnsResponse(name: String, ttl: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, 0x1234); u16(o, 0x8180) // id, flags: response RA
    u16(o, 1); u16(o, 1); u16(o, 0); u16(o, 0)
    name.split('.').foreach { label =>
      u8(o, label.length); o.write(label.getBytes("ASCII"))
    }
    u8(o, 0); u16(o, 1); u16(o, 1)       // question: type A, IN
    u16(o, 0xc00c); u16(o, 1); u16(o, 1) // answer name (pointer), A, IN
    u32(o, ttl); u16(o, 4); (1 to 4).foreach(u8(o, _)) // ttl, rdlen, 1.2.3.4
    o.toByteArray
  }

  private def clientHello(sni: String): Array[Byte] = {
    val ext = new ByteArrayOutputStream() // server_name extension
    val nameBytes = sni.getBytes("ASCII")
    u16(ext, 0); u16(ext, nameBytes.length + 5)         // type 0, ext len
    u16(ext, nameBytes.length + 3); u8(ext, 0); u16(ext, nameBytes.length)
    ext.write(nameBytes)
    val body = new ByteArrayOutputStream() // ClientHello body
    u16(body, 0x0303)                      // legacy version TLS1.2
    body.write(new Array[Byte](32))        // random
    u8(body, 0)                            // session id len
    u16(body, 2); u16(body, 0x1301)        // one cipher suite
    u8(body, 1); u8(body, 0)               // compression: null
    u16(body, ext.size()); body.write(ext.toByteArray)
    val hs = new ByteArrayOutputStream()   // handshake header
    u8(hs, 1) // ClientHello
    val b = body.toByteArray
    u8(hs, 0); u16(hs, b.length)           // 3-byte length
    hs.write(b)
    val rec = new ByteArrayOutputStream()  // record header
    u8(rec, 22); u8(rec, 3); u8(rec, 3)    // handshake, TLS1.2
    val h = hs.toByteArray
    u16(rec, h.length); rec.write(h)
    rec.toByteArray
  }

  private def arpRequest(): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, 1); u16(o, 0x0800); u8(o, 6); u8(o, 4); u16(o, 1) // request
    o.write(Array.tabulate[Byte](6)(i => (0xaa - i).toByte))
    Seq(10, 0, 0, 7).foreach(u8(o, _))
    o.write(new Array[Byte](6))
    Seq(10, 0, 0, 254).foreach(u8(o, _))
    o.toByteArray
  }

  private def ipv6Packet(nextHeader: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u32(o, 0x60000000L); u16(o, payload.length); u8(o, nextHeader); u8(o, 64)
    // src 2001:db8::1, dst 2001:db8::2
    u16(o, 0x2001); u16(o, 0x0db8); (0 until 5).foreach(_ => u16(o, 0)); u16(o, 1)
    u16(o, 0x2001); u16(o, 0x0db8); (0 until 5).foreach(_ => u16(o, 0)); u16(o, 2)
    o.write(payload); o.toByteArray
  }

  private def pcapFile(packets: Seq[Array[Byte]], tsBase: Long = 1757075696L): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u32(o, 0xa1b2c3d4L); u16(o, 2); u16(o, 4) // magic (big-endian, usec), v2.4
    u32(o, 0); u32(o, 0); u32(o, 65535); u32(o, 1) // zone, sigfigs, snaplen, Ethernet
    packets.zipWithIndex.foreach { case (p, i) =>
      u32(o, tsBase + i); u32(o, 123456); u32(o, p.length); u32(o, p.length)
      o.write(p)
    }
    o.toByteArray
  }

  private val srcIp = Array(10, 0, 0, 1)
  private val dstIp = Array(10, 0, 0, 2)

  private def samplePackets: Seq[Array[Byte]] = Seq(
    // 1: HTTP GET with Host + User-Agent
    ethernet(0x0800, ipv4(6, srcIp, dstIp, tcp(49152, 80, 0x18,
      ("GET /index.html HTTP/1.1\r\nHost: www.example.com\r\n" +
        "User-Agent: graft-test/1.0\r\n\r\n").getBytes("ASCII")))),
    // 2: DNS query over UDP
    ethernet(0x0800, ipv4(17, srcIp, dstIp, udp(33000, 53,
      dnsQuery("api.example.org", 1)))),
    // 3: DNS response with compression-pointer answer
    ethernet(0x0800, ipv4(17, dstIp, srcIp, udp(53, 33000,
      dnsResponse("api.example.org", 300L)))),
    // 4: TLS ClientHello with SNI
    ethernet(0x0800, ipv4(6, srcIp, dstIp, tcp(49153, 443, 0x18,
      clientHello("secure.example.net")))),
    // 5: ARP request
    ethernet(0x0806, arpRequest()),
    // 6: ICMP echo request
    ethernet(0x0800, ipv4(1, srcIp, dstIp, Array[Byte](8, 0, 0, 0))),
    // 7: IPv6 TCP SYN
    ethernet(0x86dd, ipv6Packet(6, tcp(52000, 443, 0x02, Array.empty))),
    // 8: bare TCP ACK, no payload
    ethernet(0x0800, ipv4(6, srcIp, dstIp, tcp(49154, 8080, 0x10, Array.empty))))

  // ------------------------------------------------------------- tests

  test("decodes every protocol layer from hand-built pcap bytes") {
    val jsons = PcapParser.decodeFile(pcapFile(samplePackets))
    assert(jsons.length == 8)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def layers(i: Int) = mapper.readTree(jsons(i)).path("_source").path("layers")

    val http = layers(0)
    assert(http.path("frame").path("frame.time_utc").asText()
      == "Sep  5, 2025 12:34:56.123456000 UTC")
    assert(http.path("frame").path("frame.protocols").asText()
      == "eth:ethertype:ip:tcp:http")
    assert(http.path("ip").path("ip.src").asText() == "10.0.0.1")
    assert(http.path("ip").path("ip.ttl").asText() == "64")
    assert(http.path("tcp").path("tcp.flags").asText() == "0x0018")
    assert(http.path("http").path("http.host").asText() == "www.example.com")
    assert(http.path("http").path("http.request.full_uri").asText()
      == "http://www.example.com/index.html")

    val dnsQ = layers(1).path("dns")
    val qKey = "api.example.org: type A, class IN"
    assert(dnsQ.path("Queries").path(qKey).path("dns.qry.name").asText()
      == "api.example.org")
    assert(dnsQ.path("dns.flags_tree").path("dns.flags.response").asText() == "0")

    val dnsR = layers(2).path("dns")
    assert(dnsR.path("dns.flags_tree").path("dns.flags.response").asText() == "1")
    val ans = dnsR.path("Answers").elements()
    assert(ans.hasNext)
    val a0 = ans.next()
    assert(a0.path("dns.resp.name").asText() == "api.example.org") // via pointer
    assert(a0.path("dns.resp.ttl").asText() == "300")

    val tls = layers(3).path("tls").path("tls.record")
    assert(tls.path("tls.record.version").asText() == "0x0303")
    assert(tls.path("tls.handshake").path("tls.handshake.extensions_server_name")
      .asText() == "secure.example.net")

    val arp = layers(4).path("arp")
    assert(arp.path("arp.opcode").asText() == "1")
    assert(arp.path("arp.src.proto_ipv4").asText() == "10.0.0.7")

    assert(layers(5).path("icmp").path("icmp.type").asText() == "8")

    val v6 = layers(6)
    assert(v6.path("ipv6").path("ipv6.src").asText() == "2001:db8::1")
    assert(v6.path("tcp").path("tcp.dstport").asText() == "443")

    assert(layers(7).path("tcp").path("tcp.flags").asText() == "0x0010")
    assert(!layers(7).has("http") && !layers(7).has("tls"))
  }

  test("little-endian and nanosecond pcap variants decode identically") {
    val be = PcapParser.decodeFile(pcapFile(samplePackets))
    // rewrite header+records little-endian with ns timestamps
    val o = new ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    le32(0xa1b23c4dL); le16(2); le16(4); le32(0); le32(0); le32(65535); le32(1)
    samplePackets.zipWithIndex.foreach { case (p, i) =>
      le32(1757075696L + i); le32(123456000L); le32(p.length); le32(p.length)
      o.write(p)
    }
    val le = PcapParser.decodeFile(o.toByteArray)
    assert(le == be)
  }

  test("corrupt files fail loudly; unknown payloads just omit layers") {
    intercept[IllegalArgumentException] {
      PcapParser.decodeFile("not a pcap at all".getBytes)
    }
    val truncated = pcapFile(samplePackets).dropRight(10)
    intercept[IllegalArgumentException] { PcapParser.decodeFile(truncated) }
    // binary garbage payload on a TCP port: tcp layer only, no crash
    val garbage = ethernet(0x0800, ipv4(6, srcIp, dstIp,
      tcp(1234, 5678, 0x18, Array.tabulate[Byte](64)(i => (i * 7).toByte))))
    val out = PcapParser.decodeFile(pcapFile(Seq(garbage)))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val l = mapper.readTree(out.head).path("_source").path("layers")
    assert(l.has("tcp") && !l.has("http") && !l.has("tls") && !l.has("dns"))
  }

  test("native-decoded pcap flows through decode() into the UDM classifier") {
    val dir = Files.createTempDirectory("graft_pcap_native").toString
    Files.write(Paths.get(dir, "cap.pcap"), pcapFile(samplePackets))
    val packets = PcapDecode.decode(spark, dir, decoder = PcapParser.nativeDecoder)
    assert(packets.count() == 8)
    val types = UdmTransform.transform(packets, "raw")
      .select(col("event_struct.event.metadata.event_type").as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // TLS > DNS > HTTP > ARP > ICMP precedence (P4): 1 HTTP, 2 DNS,
    // 2 SSL (ClientHello + the v6 SYN to 443 has no TLS record -> conn),
    // 1 ARP (STATUS_UPDATE), 1 ICMP, rest generic connections
    assert(types.getOrElse("NETWORK_HTTP", 0L) == 1L)
    assert(types.getOrElse("NETWORK_DNS", 0L) == 2L)
    assert(types.getOrElse("NETWORK_SSL", 0L) == 1L)
    assert(types.values.sum == 8L)
  }
}
