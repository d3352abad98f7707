package graft.sources

import java.io.ByteArrayOutputStream

/** Synthetic capture construction — classic pcap and pcapng files
  * built from the public format specs, packet by packet. Two uses:
  * deterministic load/bench captures ([[syntheticPcap]] drives the
  * stream bench's binary-decode path), and hand-built protocol
  * fixtures for the parser/pipeline specs (no binary fixtures on
  * disk — every test capture is constructed from the spec). */
object CaptureBytes {

  /** A deterministic n-packet classic pcap: a rotating HTTP / DNS /
    * TLS-ClientHello / bare-TCP mix over varying endpoints. Byte-stable
    * for a given (nPackets, seed) — benchmarks and load tests can
    * regenerate identical inputs anywhere. */
  def syntheticPcap(nPackets: Int, seed: Int = 0): Array[Byte] = {
    val o = new ByteArrayOutputStream(nPackets * 160)
    u32(o, 0xa1b2c3d4L); u16(o, 2); u16(o, 4)
    u32(o, 0); u32(o, 0); u32(o, 65535); u32(o, 1)
    var i = 0
    while (i < nPackets) {
      val k = seed * 7919 + i
      val src = Array(10, 1, (k >> 8) & 0xff, k & 0xff)
      val pkt = (k % 4) match {
        case 0 => ethernet(0x0800, ipv4(6, src, dstIp, tcp(1024 + (k % 50000), 80, 0x18,
          (s"GET /item/$k HTTP/1.1\r\nHost: host-${k % 97}.example.com\r\n" +
            "User-Agent: graft-synth/1.0\r\n\r\n").getBytes("ASCII"))))
        case 1 => ethernet(0x0800, ipv4(17, src, dstIp, udp(1024 + (k % 50000), 53,
          dnsQuery(s"svc-${k % 211}.example.org", 1))))
        case 2 => ethernet(0x0800, ipv4(6, src, dstIp, tcp(1024 + (k % 50000), 443, 0x18,
          clientHello(s"tls-${k % 131}.example.net"))))
        case _ => ethernet(0x0800, ipv4(6, src, dstIp,
          tcp(1024 + (k % 50000), 8080, 0x10, Array.empty)))
      }
      u32(o, 1700000000L + i / 50); u32(o, (i % 50) * 20000L)
      u32(o, pkt.length); u32(o, pkt.length)
      o.write(pkt)
      i += 1
    }
    o.toByteArray
  }

  // ----------------------------------------------------- byte builders

  def u8(out: ByteArrayOutputStream, v: Int): Unit = out.write(v & 0xff)
  def u16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  def ethernet(etherType: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Array.tabulate[Byte](6)(i => (0x10 + i).toByte)) // dst
    o.write(Array.tabulate[Byte](6)(i => (0x20 + i).toByte)) // src
    u16(o, etherType); o.write(payload)
    o.toByteArray
  }

  def ipv4(proto: Int, src: Array[Int], dst: Array[Int],
           payload: Array[Byte], ttl: Int = 64): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u8(o, 0x45); u8(o, 0) // ver/ihl, tos
    u16(o, 20 + payload.length); u16(o, 1); u16(o, 0) // len, id, flags/frag
    u8(o, ttl); u8(o, proto); u16(o, 0) // ttl, proto, cksum
    src.foreach(u8(o, _)); dst.foreach(u8(o, _))
    o.write(payload); o.toByteArray
  }

  def tcp(srcPort: Int, dstPort: Int, flags: Int,
          payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, srcPort); u16(o, dstPort)
    u32(o, 1); u32(o, 2)          // seq, ack
    u8(o, 0x50); u8(o, flags)     // data offset 5 words, flags
    u16(o, 8192); u16(o, 0); u16(o, 0) // window, cksum, urg
    o.write(payload); o.toByteArray
  }

  def udp(srcPort: Int, dstPort: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, srcPort); u16(o, dstPort); u16(o, 8 + payload.length); u16(o, 0)
    o.write(payload); o.toByteArray
  }

  def dnsQuery(name: String, qtype: Int): Array[Byte] = {
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
  def dnsResponse(name: String, ttl: Long): Array[Byte] = {
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

  def clientHello(sni: String): Array[Byte] = {
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

  def arpRequest(): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, 1); u16(o, 0x0800); u8(o, 6); u8(o, 4); u16(o, 1) // request
    o.write(Array.tabulate[Byte](6)(i => (0xaa - i).toByte))
    Seq(10, 0, 0, 7).foreach(u8(o, _))
    o.write(new Array[Byte](6))
    Seq(10, 0, 0, 254).foreach(u8(o, _))
    o.toByteArray
  }

  def ipv6Packet(nextHeader: Int, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u32(o, 0x60000000L); u16(o, payload.length); u8(o, nextHeader); u8(o, 64)
    // src 2001:db8::1, dst 2001:db8::2
    u16(o, 0x2001); u16(o, 0x0db8); (0 until 5).foreach(_ => u16(o, 0)); u16(o, 1)
    u16(o, 0x2001); u16(o, 0x0db8); (0 until 5).foreach(_ => u16(o, 0)); u16(o, 2)
    o.write(payload); o.toByteArray
  }

  def pcapFile(packets: Seq[Array[Byte]], tsBase: Long = 1757075696L,
               linkType: Int = 1): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u32(o, 0xa1b2c3d4L); u16(o, 2); u16(o, 4) // magic (big-endian, usec), v2.4
    u32(o, 0); u32(o, 0); u32(o, 65535); u32(o, linkType) // zone, sigfigs, snaplen, link
    packets.zipWithIndex.foreach { case (p, i) =>
      u32(o, tsBase + i); u32(o, 123456); u32(o, p.length); u32(o, p.length)
      o.write(p)
    }
    o.toByteArray
  }

  // pcapng builders (big-endian section; public SHB/IDB/EPB block spec)
  def ngBlock(blockType: Long, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val padded = (body.length + 3) & ~3
    val total = 12 + padded
    u32(o, blockType); u32(o, total); o.write(body)
    o.write(new Array[Byte](padded - body.length))
    u32(o, total)
    o.toByteArray
  }
  def ngShb(): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    u32(b, 0x1a2b3c4dL); u16(b, 1); u16(b, 0)         // BOM, v1.0
    u32(b, 0xffffffffL); u32(b, 0xffffffffL)          // section length -1
    ngBlock(0x0a0d0d0aL, b.toByteArray)
  }
  def ngIdb(tsresol: Option[Int] = None, linkType: Int = 1): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    u16(b, linkType); u16(b, 0); u32(b, 65535)        // link type, snaplen
    tsresol.foreach { v =>
      u16(b, 9); u16(b, 1); u8(b, v); u8(b, 0); u8(b, 0); u8(b, 0) // if_tsresol + pad
      u16(b, 0); u16(b, 0)                            // opt_endofopt
    }
    ngBlock(1L, b.toByteArray)
  }
  def ngEpb(ts: Long, data: Array[Byte], ifId: Int = 0): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    u32(b, ifId); u32(b, (ts >>> 32) & 0xffffffffL); u32(b, ts & 0xffffffffL)
    u32(b, data.length); u32(b, data.length)
    b.write(data)
    ngBlock(6L, b.toByteArray)
  }
  def ngFile(blocks: Array[Byte]*): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    blocks.foreach(o.write)
    o.toByteArray
  }

  /** LINKTYPE_SLL (113) "Linux cooked" header: pkttype, ARPHRD, addr
    * len, 8 addr bytes, then the EtherType-keyed payload. */
  def sll(etherType: Int, payload: Array[Byte], pktType: Int = 0): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    u16(o, pktType); u16(o, 1); u16(o, 6)             // ARPHRD_ETHER, halen 6
    o.write(Array.tabulate[Byte](8)(i => (0x30 + i).toByte))
    u16(o, etherType); o.write(payload)
    o.toByteArray
  }

  val srcIp: Array[Int] = Array(10, 0, 0, 1)
  val dstIp: Array[Int] = Array(10, 0, 0, 2)

  /** The SELF-GOLDEN decode fixtures (r13 verdict #8): the tshark
    * differential has never executed in this sandbox (no tshark binary
    * since round 7), so the next-best regression guard is a FROZEN
    * copy of the native decoder's own output over a canonical capture
    * set — future parser edits diff field-by-field against the pinned
    * artifact (src/test/resources/golden/native_decode.golden.tsv,
    * regen: `sbt "runMain graft.tools.GoldenDecodeGen"`) instead of
    * only property specs. NOT an independent second opinion (TESTDATA
    * .md notes it as self-golden); it catches unintended drift, not
    * day-one bugs. Byte-deterministic by construction. Covers all
    * three link layers and both container formats. */
  def goldenFixtures: Seq[(String, Array[Byte])] = Seq(
    "pcap_sample" -> pcapFile(samplePackets),
    "pcapng_nanos" -> ngFile(ngShb(), ngIdb(Some(9)),
      ngEpb(1757075696123456789L, samplePackets.head),
      ngEpb(1757075697123456789L, samplePackets(3))),
    "sll_cooked" -> pcapFile(Seq(
      sll(0x0800, ipv4(6, srcIp, dstIp, tcp(49160, 80, 0x18,
        "GET /sll HTTP/1.1\r\nHost: sll.example.com\r\n\r\n"
          .getBytes("ASCII"))))), linkType = 113),
    "raw_ip" -> pcapFile(Seq(
      ipv4(17, srcIp, dstIp, udp(40000, 53, dnsQuery("raw.example.org", 1)))),
      linkType = 101))

  /** One of each decoded protocol — the parser spec's canonical set. */
  def samplePackets: Seq[Array[Byte]] = Seq(
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
}
