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

  // pcapng builders (big-endian section; public SHB/IDB/EPB block spec)
  private def ngBlock(blockType: Long, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val padded = (body.length + 3) & ~3
    val total = 12 + padded
    u32(o, blockType); u32(o, total); o.write(body)
    o.write(new Array[Byte](padded - body.length))
    u32(o, total)
    o.toByteArray
  }
  private def ngShb(): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    u32(b, 0x1a2b3c4dL); u16(b, 1); u16(b, 0)         // BOM, v1.0
    u32(b, 0xffffffffL); u32(b, 0xffffffffL)          // section length -1
    ngBlock(0x0a0d0d0aL, b.toByteArray)
  }
  private def ngIdb(tsresol: Option[Int] = None): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    u16(b, 1); u16(b, 0); u32(b, 65535)               // Ethernet, snaplen
    tsresol.foreach { v =>
      u16(b, 9); u16(b, 1); u8(b, v); u8(b, 0); u8(b, 0); u8(b, 0) // if_tsresol + pad
      u16(b, 0); u16(b, 0)                            // opt_endofopt
    }
    ngBlock(1L, b.toByteArray)
  }
  private def ngEpb(ts: Long, data: Array[Byte], ifId: Int = 0): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    u32(b, ifId); u32(b, (ts >>> 32) & 0xffffffffL); u32(b, ts & 0xffffffffL)
    u32(b, data.length); u32(b, data.length)
    b.write(data)
    ngBlock(6L, b.toByteArray)
  }
  private def ngFile(blocks: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    blocks.foreach(o.write)
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

  test("pcapng decodes identically to classic pcap (µs default and if_tsresol=9 ns)") {
    val classic = PcapParser.decodeFile(pcapFile(samplePackets))
    def build(resol: Option[Int], unitsPerSec: Long, fracUnits: Long): Array[Byte] =
      ngFile(ngShb() +: ngIdb(resol) +: samplePackets.zipWithIndex.map {
        case (p, i) => ngEpb((1757075696L + i) * unitsPerSec + fracUnits, p)
      }: _*)
    val us = PcapParser.decodeFile(build(None, 1000000L, 123456L))
    assert(us == classic) // default resolution = microseconds
    val ns = PcapParser.decodeFile(build(Some(9), 1000000000L, 123456000L))
    assert(ns == classic) // decimal if_tsresol: nanoseconds
  }

  test("pcapng power-of-two tsresol and little-endian sections decode") {
    // if_tsresol 0x87 = 2^-7 -> 128 units/s; 64 units = exactly .5 s
    val pow2 = PcapParser.decodeFile(ngFile(ngShb(), ngIdb(Some(0x87)),
      ngEpb(1757075696L * 128 + 64, samplePackets.head)))
    assert(pow2.length == 1)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def frameTime(json: String): String = mapper.readTree(json)
      .path("_source").path("layers").path("frame").path("frame.time_utc").asText()
    assert(frameTime(pow2.head) == "Sep  5, 2025 12:34:56.500000000 UTC")

    // the same capture as a little-endian section (µs resolution)
    val o = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    w32(0x0a0d0d0aL); w32(28); w32(0x1a2b3c4dL)
    w16(1); w16(0); w32(0xffffffffL); w32(0xffffffffL); w32(28) // SHB
    w32(1); w32(20); w16(1); w16(0); w32(65535); w32(20)        // IDB, no options
    val p = samplePackets.head
    val ts = 1757075696L * 1000000L + 500000L
    val padded = (p.length + 3) & ~3
    val total = 32 + padded
    w32(6); w32(total); w32(0); w32(ts >>> 32); w32(ts & 0xffffffffL)
    w32(p.length); w32(p.length); o.write(p)
    o.write(new Array[Byte](padded - p.length)); w32(total)     // EPB
    val le = PcapParser.decodeFile(o.toByteArray)
    assert(le == pow2) // same instant, same packet, byte-identical JSON
  }

  test("pcapng skips NRB/ISB metadata blocks, fails loudly on anything else") {
    // tshark-shaped file: SHB, IDB, NRB, one packet, trailing ISB
    val nrb = ngBlock(4L, Array[Byte](0, 0, 0, 0))
    val isb = ngBlock(5L, new Array[Byte](8))
    val ok = PcapParser.decodeFile(ngFile(ngShb(), ngIdb(), nrb,
      ngEpb(1757075696L * 1000000L + 123456L, samplePackets.head), isb))
    assert(ok.length == 1)

    // Simple Packet Block carries packet data we do not decode: throw
    val spb = ngBlock(3L, samplePackets.head)
    val e1 = intercept[IllegalArgumentException] {
      PcapParser.decodeFile(ngFile(ngShb(), ngIdb(), spb))
    }
    assert(e1.getMessage.contains("block type"))

    // EPB before any IDB: undefined interface
    val e2 = intercept[IllegalArgumentException] {
      PcapParser.decodeFile(ngFile(ngShb(),
        ngEpb(1757075696L * 1000000L, samplePackets.head)))
    }
    assert(e2.getMessage.contains("undefined interface"))

    // corrupted trailing block length
    val good = ngFile(ngShb(), ngIdb(),
      ngEpb(1757075696L * 1000000L, samplePackets.head))
    good(good.length - 1) = (good(good.length - 1) + 4).toByte
    val e3 = intercept[IllegalArgumentException] { PcapParser.decodeFile(good) }
    assert(e3.getMessage.contains("trailer"))
  }

  test("jumbo DNS messages are capped, not rejected") {
    // 70 answers (> the 64-answer walk cap): still a dns layer, 64 walked
    val many = {
      val o = new ByteArrayOutputStream()
      u16(o, 0x1234); u16(o, 0x8180); u16(o, 1); u16(o, 70); u16(o, 0); u16(o, 0)
      "big.example.org".split('.').foreach { l => u8(o, l.length); o.write(l.getBytes("ASCII")) }
      u8(o, 0); u16(o, 1); u16(o, 1)
      (0 until 70).foreach { _ =>
        u16(o, 0xc00c); u16(o, 1); u16(o, 1); u32(o, 60); u16(o, 4)
        (1 to 4).foreach(u8(o, _))
      }
      o.toByteArray
    }
    val out = PcapParser.decodeFile(pcapFile(Seq(
      ethernet(0x0800, ipv4(17, dstIp, srcIp, udp(53, 33000, many))))))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val l = mapper.readTree(out.head).path("_source").path("layers")
    assert(l.path("frame").path("frame.protocols").asText().endsWith(":dns"))
    var count = 0
    val it = l.path("dns").path("Answers").elements()
    while (it.hasNext) { it.next(); count += 1 }
    assert(count == 64, s"walk capped at 64 answers, got $count")
  }

  test("native-decoded pcap AND pcapng flow through decode() into the UDM classifier") {
    val dir = Files.createTempDirectory("graft_pcap_native").toString
    Files.write(Paths.get(dir, "cap.pcap"), pcapFile(samplePackets))
    // the default glob (*.pcap*) admits pcapng — previously this file
    // would burn the retry budget and DLQ (r3 verdict missing #1)
    Files.write(Paths.get(dir, "cap2.pcapng"), ngFile(ngShb(), ngIdb(),
      ngEpb(1757075800L * 1000000L, samplePackets.head)))
    val packets = PcapDecode.decode(spark, dir, decoder = PcapParser.nativeDecoder)
    assert(packets.count() == 9)
    val types = UdmTransform.transform(packets, "raw")
      .select(col("event_struct.event.metadata.event_type").as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // TLS > DNS > HTTP > ARP > ICMP precedence (P4): 1 HTTP (+1 from the
    // pcapng copy), 2 DNS, 1 SSL (ClientHello; the v6 SYN to 443 has no
    // TLS record -> conn), 1 ARP (STATUS_UPDATE), 1 ICMP, rest generic
    assert(types.getOrElse("NETWORK_HTTP", 0L) == 2L)
    assert(types.getOrElse("NETWORK_DNS", 0L) == 2L)
    assert(types.getOrElse("NETWORK_SSL", 0L) == 1L)
    assert(types.values.sum == 9L)
  }
}
