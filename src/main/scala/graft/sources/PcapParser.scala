package graft.sources

import com.fasterxml.jackson.core.JsonFactory

/** Native libpcap decoder — S5 without the external tshark dependency.
  *
  * Parses the classic pcap capture format (public spec; magic
  * 0xa1b2c3d4/0xa1b23c4d in either byte order) AND pcapng (SHB/IDB/EPB
  * block structure, either byte order, per-interface `if_tsresol` —
  * the format tshark itself writes, and the reference's own file glob
  * admits: `capture_*.pcap*`, sniffer_entrypoint.sh:165), and decodes
  * the protocol stack the UDM transform consumes — Ethernet (+1 VLAN
  * tag), raw-IP (LINKTYPE_RAW 101) and Linux cooked (LINKTYPE_SLL 113)
  * link layers, IPv4,
  * IPv6 (+ common extension headers), TCP, UDP, ICMP/ICMPv6, ARP, and
  * the payload protocols the reference's classifier keys on: DNS
  * (queries + answers with name decompression), HTTP (request line,
  * Host, User-Agent, response code) and TLS (record version + the
  * ClientHello SNI walk) — emitting one tshark-`-T json`-shaped object
  * per packet ([[graft.udm.PacketSchemas]] field names), so the decoded
  * stream drops into the same pipeline as tshark output.
  *
  * The reference shells out to `tshark -r f -T json`
  * (processor_app.py:149–155); this parser replaces that subprocess for
  * the formats above — zero external processes, runs inside the scan
  * partition (see [[PcapDecode.decode]]), one file per task. Use
  * [[PcapDecode.processDecoder]] with a real tshark when exotic link
  * types or deeper dissection are required.
  *
  * Fail-loud policy: a corrupt FILE (bad magic, unsupported link type,
  * truncated record header) throws — the upstream retry/DLQ budget
  * decides; a payload that merely doesn't parse as DNS/HTTP/TLS simply
  * omits that layer (tshark's behavior for unrecognized payloads).
  */
object PcapParser {

  /** The plug-in for [[PcapDecode.decode]]. */
  val nativeDecoder: PcapDecode.Decoder =
    (path, bytes) => decodeFile(bytes, path).iterator

  // ---------------------------------------------------------- file level

  private final class Reader(val b: Array[Byte], var pos: Int, littleEndian: Boolean) {
    def remaining: Int = b.length - pos
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = {
      val v = if (littleEndian) (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)
      else ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)
      pos += 2; v
    }
    def u32(): Long = {
      val v = if (littleEndian)
        (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
          ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)
      else ((b(pos) & 0xffL) << 24) | ((b(pos + 1) & 0xffL) << 16) |
        ((b(pos + 2) & 0xffL) << 8) | (b(pos + 3) & 0xffL)
      pos += 4; v
    }
  }

  // network-order (big-endian) views used inside packet data
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  def decodeFile(bytes: Array[Byte], path: String = "<bytes>"): Seq[String] = {
    require(bytes.length >= 12, s"capture too short for any header: $path")
    val magicBE = be32(bytes, 0)
    if (magicBE == 0x0a0d0d0aL) return decodePcapng(bytes, path)
    require(bytes.length >= 24, s"pcap too short for global header: $path")
    val (little, nanos) = magicBE match {
      case 0xa1b2c3d4L => (false, false)
      case 0xd4c3b2a1L => (true, false)
      case 0xa1b23c4dL => (false, true)
      case 0x4d3cb2a1L => (true, true)
      case other => throw new IllegalArgumentException(
        f"not a pcap or pcapng capture (magic 0x$other%08x; expected classic " +
          f"pcap 0xa1b2c3d4/0xa1b23c4d either byte order, or pcapng SHB 0x0a0d0d0a): $path")
    }
    val r = new Reader(bytes, 4, little)
    r.u16(); r.u16(); r.u32(); r.u32(); r.u32() // version, thiszone, sigfigs, snaplen
    val linkType = r.u32().toInt
    requireSupportedLink(linkType, path)

    val out = Seq.newBuilder[String]
    var n = 0
    while (r.remaining > 0) {
      require(r.remaining >= 16,
        s"truncated record header at packet ${n + 1}: $path")
      val tsSec = r.u32()
      val tsFrac = r.u32()
      val inclLen = r.u32().toInt
      r.u32() // orig_len
      require(inclLen >= 0 && r.remaining >= inclLen,
        s"truncated packet ${n + 1} (need $inclLen, have ${r.remaining}): $path")
      val data = java.util.Arrays.copyOfRange(r.b, r.pos, r.pos + inclLen)
      r.pos += inclLen
      n += 1
      out += decodePacket(n, tsSec, if (nanos) tsFrac else tsFrac * 1000L, data, linkType)
    }
    out.result()
  }

  /** Supported capture link types (public LINKTYPE_* registry):
    * 1 = EN10MB (Ethernet, + 1 VLAN tag), 101 = RAW (bare IPv4/IPv6,
    * version nibble dispatches), 113 = LINUX_SLL (Linux "cooked"
    * capture, `tcpdump -i any`: 16-byte header whose protocol field is
    * an EtherType). Anything else fails loudly — the documented
    * escape hatch for exotic links is [[PcapDecode.processDecoder]]
    * with a real tshark. */
  private val supportedLinkTypes = Set(1, 101, 113)
  private def requireSupportedLink(linkType: Int, path: String): Unit =
    require(supportedLinkTypes.contains(linkType),
      s"unsupported link type $linkType (supported: 1/EN10MB Ethernet, " +
        s"101/RAW IP, 113/LINUX_SLL cooked; use processDecoder+tshark for others): $path")

  // ------------------------------------------------------------- pcapng

  /** pcapng (the format tshark writes by default; public spec,
    * draft-ietf-opsawg-pcapng). Block walk: Section Header (0x0a0d0d0a,
    * sets byte order + resets the interface list), Interface Description
    * (0x00000001, link type + `if_tsresol` option), Enhanced Packet
    * (0x00000006, 64-bit timestamp in the interface's resolution) —
    * routed into the same [[decodePacket]] as classic pcap. Name
    * Resolution (0x4) and Interface Statistics (0x5) blocks carry no
    * packet data and are skipped (tshark appends an ISB to every
    * capture); any OTHER block type throws — per the fail-loud policy a
    * block we cannot prove packet-free must not be silently dropped. */
  private def decodePcapng(b: Array[Byte], path: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var little = false
    def u16(o: Int): Int =
      if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) else be16(b, o)
    def u32(o: Int): Long =
      if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else be32(b, o)

    // per-interface state for the current section: (tsresol exponent,
    // isPowerOfTwo, link type) — if_tsresol MSB set means 2^-exp, clear
    // means 10^-exp; absent means the default 10^-6 (microseconds)
    var ifaces = Vector.empty[(Int, Boolean, Int)]
    var pos = 0
    var n = 0
    while (pos < b.length) {
      require(b.length - pos >= 12, s"truncated pcapng block header at offset $pos: $path")
      if (be32(b, pos) == 0x0a0d0d0aL) { // SHB type is endian-palindromic
        val bom = be32(b, pos + 8)
        little = bom match {
          case 0x1a2b3c4dL => false
          case 0x4d3c2b1aL => true
          case other => throw new IllegalArgumentException(
            f"bad pcapng byte-order magic 0x$other%08x at offset $pos: $path")
        }
        ifaces = Vector.empty // a new section defines its own interfaces
      }
      val totalLen = u32(pos + 4).toInt
      require(totalLen >= 12 && totalLen % 4 == 0 && totalLen <= b.length - pos,
        s"bad pcapng block length $totalLen at offset $pos: $path")
      require(u32(pos + totalLen - 4).toInt == totalLen,
        s"pcapng block trailer length mismatch at offset $pos: $path")
      u32(pos).toInt match {
        case 0x0a0d0d0a => () // SHB: handled above; section length ignored
        case 1 => // IDB
          require(totalLen >= 20, s"short pcapng IDB at offset $pos: $path")
          val link = u16(pos + 8)
          requireSupportedLink(link, path)
          var resol = 6; var pow2 = false
          var op = pos + 16 // options follow linktype/reserved/snaplen
          val end = pos + totalLen - 4
          var done = false
          while (!done && op + 4 <= end) {
            val code = u16(op); val len = u16(op + 2)
            if (code == 0) done = true
            else {
              if (code == 9 && len >= 1 && op + 4 < end) { // if_tsresol
                val v = b(op + 4) & 0xff
                pow2 = (v & 0x80) != 0; resol = v & 0x7f
              }
              op += 4 + ((len + 3) & ~3) // option values pad to 32 bits
            }
          }
          require(if (pow2) resol <= 30 else resol <= 9,
            s"unsupported pcapng if_tsresol ${if (pow2) "2^-" else "10^-"}$resol: $path")
          ifaces :+= ((resol, pow2, link))
        case 6 => // EPB
          require(totalLen >= 32, s"short pcapng EPB at offset $pos: $path")
          val ifId = u32(pos + 8).toInt
          require(ifId >= 0 && ifId < ifaces.length,
            s"pcapng EPB references undefined interface $ifId at offset $pos: $path")
          val ts = (u32(pos + 12) << 32) | u32(pos + 16)
          val capLen = u32(pos + 20).toInt
          require(capLen >= 0 && capLen <= totalLen - 32,
            s"pcapng EPB captured length $capLen exceeds block at offset $pos: $path")
          val data = java.util.Arrays.copyOfRange(b, pos + 28, pos + 28 + capLen)
          val (resol, pow2, link) = ifaces(ifId)
          val (sec, nanos) =
            if (pow2) {
              val div = 1L << resol
              (ts / div, (ts % div) * 1000000000L / div)
            } else {
              var div = 1L; var i = 0
              while (i < resol) { div *= 10; i += 1 }
              (ts / div, (ts % div) * (1000000000L / div))
            }
          n += 1
          out += decodePacket(n, sec, nanos, data, link)
        case 4 | 5 => () // NRB / ISB: metadata only, no packet data
        case other => throw new IllegalArgumentException(
          f"unsupported pcapng block type 0x$other%08x at offset $pos: $path")
      }
      pos += totalLen
    }
    out.result()
  }

  // -------------------------------------------------------- packet level

  /** One decoded layer: (tshark layer name, ordered field -> value).
    * Values are strings except DNS's map-typed members. */
  private type Fields = scala.collection.mutable.LinkedHashMap[String, Any]
  private def fields(kv: (String, Any)*): Fields = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    kv.foreach { case (k, v) => if (v != null) m += k -> v }
    m
  }

  private val months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** tshark frame.time_utc: `"Sep  5, 2025 12:34:56.123456000 UTC"` —
    * space-padded day, nine fractional digits. */
  private def frameTime(sec: Long, nanoFrac: Long): String = {
    val t = java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)
    val day = if (t.getDayOfMonth < 10) s" ${t.getDayOfMonth}" else s"${t.getDayOfMonth}"
    f"${months(t.getMonthValue - 1)} $day, ${t.getYear}%d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d.$nanoFrac%09d UTC"
  }

  private def mac(b: Array[Byte], o: Int): String =
    (0 until 6).map(i => f"${b(o + i) & 0xff}%02x").mkString(":")
  private def ipv4(b: Array[Byte], o: Int): String =
    (0 until 4).map(i => (b(o + i) & 0xff).toString).mkString(".")

  /** RFC 5952-style compressed lowercase IPv6 (longest zero run → ::). */
  private def ipv6(b: Array[Byte], o: Int): String = {
    val groups = (0 until 8).map(i => be16(b, o + 2 * i))
    var bestStart = -1; var bestLen = 0; var i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        var j = i; while (j < 8 && groups(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) groups.map(g => f"$g%x").mkString(":")
    else {
      val head = groups.take(bestStart).map(g => f"$g%x").mkString(":")
      val tail = groups.drop(bestStart + bestLen).map(g => f"$g%x").mkString(":")
      s"$head::$tail"
    }
  }

  private def decodePacket(num: Int, tsSec: Long, tsNanos: Long,
                           d: Array[Byte], linkType: Int = 1): String = {
    val layers = scala.collection.mutable.LinkedHashMap.empty[String, Fields]
    val protos = scala.collection.mutable.ArrayBuffer.empty[String]

    linkType match {
      case 1 => // Ethernet (+ 1 VLAN tag)
        protos += "eth"
        if (d.length >= 14) {
          layers += "eth" -> fields("eth.dst" -> mac(d, 0), "eth.src" -> mac(d, 6))
          var etherType = be16(d, 12)
          var l3 = 14
          if (etherType == 0x8100 && d.length >= 18) { // one VLAN tag
            etherType = be16(d, 16); l3 = 18
          }
          protos += "ethertype"
          etherType match {
            case 0x0800 => decodeIpv4(d, l3, layers, protos)
            case 0x86dd => decodeIpv6(d, l3, layers, protos)
            case 0x0806 => decodeArp(d, l3, layers, protos)
            case _ => () // unknown L3: frame + eth only
          }
        }
      case 101 => // LINKTYPE_RAW: bare IP, version nibble dispatches
        protos += "raw"
        if (d.length >= 1) (d(0) & 0xf0) match {
          case 0x40 => decodeIpv4(d, 0, layers, protos)
          case 0x60 => decodeIpv6(d, 0, layers, protos)
          case _ => () // not IP: frame only (tshark: raw "data")
        }
      case 113 => // LINKTYPE_SLL (Linux cooked): 16-byte header, then an
        // EtherType-keyed payload exactly like Ethernet's
        protos += "sll"
        if (d.length >= 16) {
          val etherType = be16(d, 14)
          layers += "sll" -> fields(
            "sll.pkttype" -> be16(d, 0).toString,
            "sll.etype" -> f"0x$etherType%04x")
          protos += "ethertype"
          etherType match {
            case 0x0800 => decodeIpv4(d, 16, layers, protos)
            case 0x86dd => decodeIpv6(d, 16, layers, protos)
            case 0x0806 => decodeArp(d, 16, layers, protos)
            case _ => ()
          }
        }
      case other => throw new IllegalStateException(
        s"decodePacket reached with unvetted link type $other") // guarded at file level
    }

    val frame = fields(
      "frame.number" -> num.toString,
      "frame.time_utc" -> frameTime(tsSec, tsNanos),
      "frame.protocols" -> protos.mkString(":"))

    val sw = new java.io.StringWriter(512)
    val g = jsonFactory.createGenerator(sw)
    g.writeStartObject()
    g.writeObjectFieldStart("_source")
    g.writeObjectFieldStart("layers")
    writeLayer(g, "frame", frame)
    layers.foreach { case (name, fs) => writeLayer(g, name, fs) }
    g.writeEndObject(); g.writeEndObject(); g.writeEndObject()
    g.close()
    sw.toString
  }

  private val jsonFactory = new JsonFactory()

  private def writeLayer(g: com.fasterxml.jackson.core.JsonGenerator,
                         name: String, fs: Fields): Unit = {
    g.writeObjectFieldStart(name)
    fs.foreach {
      case (k, v: String) => g.writeStringField(k, v)
      case (k, v: Fields @unchecked) => writeLayer(g, k, v)
      case (k, v) => throw new IllegalStateException(s"bad field $k: $v")
    }
    g.writeEndObject()
  }

  // ------------------------------------------------------------ L3 / L4

  private def decodeIpv4(d: Array[Byte], o: Int,
                         layers: scala.collection.mutable.LinkedHashMap[String, Fields],
                         protos: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (d.length < o + 20 || (d(o) & 0xf0) != 0x40) return
    val ihl = (d(o) & 0x0f) * 4
    if (ihl < 20 || d.length < o + ihl) return
    protos += "ip"
    layers += "ip" -> fields(
      "ip.src" -> ipv4(d, o + 12), "ip.dst" -> ipv4(d, o + 16),
      "ip.ttl" -> (d(o + 8) & 0xff).toString)
    val fragOffset = be16(d, o + 6) & 0x1fff
    if (fragOffset != 0) return // non-first fragment: no L4 header
    decodeL4(d, o + ihl, d(o + 9) & 0xff, layers, protos)
  }

  private def decodeIpv6(d: Array[Byte], o: Int,
                         layers: scala.collection.mutable.LinkedHashMap[String, Fields],
                         protos: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (d.length < o + 40 || (d(o) & 0xf0) != 0x60) return
    protos += "ipv6"
    layers += "ipv6" -> fields(
      "ipv6.src" -> ipv6(d, o + 8), "ipv6.dst" -> ipv6(d, o + 24))
    var next = d(o + 6) & 0xff
    var p = o + 40
    var hops = 0
    while (hops < 8) { // bounded extension-header chain walk
      next match {
        case 0 | 43 | 60 => // hop-by-hop / routing / destination options
          if (d.length < p + 2) return
          val len = ((d(p + 1) & 0xff) + 1) * 8
          next = d(p) & 0xff; p += len; hops += 1
        case 44 => // fragment header
          if (d.length < p + 8) return
          if ((be16(d, p + 2) & 0xfff8) != 0) return // non-first fragment
          next = d(p) & 0xff; p += 8; hops += 1
        case _ =>
          decodeL4(d, p, next, layers, protos); return
      }
    }
  }

  private def decodeL4(d: Array[Byte], o: Int, proto: Int,
                       layers: scala.collection.mutable.LinkedHashMap[String, Fields],
                       protos: scala.collection.mutable.ArrayBuffer[String]): Unit =
    proto match {
      case 6 => // TCP
        if (d.length < o + 20) return
        val src = be16(d, o); val dst = be16(d, o + 2)
        val dataOff = ((d(o + 12) & 0xf0) >> 4) * 4
        if (dataOff < 20 || d.length < o + dataOff) return
        val flags9 = ((d(o + 12) & 0x01) << 8) | (d(o + 13) & 0xff)
        protos += "tcp"
        layers += "tcp" -> fields(
          "tcp.srcport" -> src.toString, "tcp.dstport" -> dst.toString,
          "tcp.flags" -> f"0x$flags9%04x")
        val payload = o + dataOff
        if (payload < d.length) {
          if (src == 53 || dst == 53) {
            // DNS over TCP: 2-byte length prefix then the message
            if (d.length >= payload + 14 &&
              decodeDns(d, payload + 2, layers)) protos += "dns"
          } else if (decodeTls(d, payload, layers)) protos += "tls"
          else if (decodeHttp(d, payload, layers)) protos += "http"
        }
      case 17 => // UDP
        if (d.length < o + 8) return
        val src = be16(d, o); val dst = be16(d, o + 2)
        protos += "udp"
        layers += "udp" -> fields(
          "udp.srcport" -> src.toString, "udp.dstport" -> dst.toString)
        if ((src == 53 || dst == 53) && d.length > o + 8 &&
          decodeDns(d, o + 8, layers)) protos += "dns"
      case 1 | 58 => // ICMP / ICMPv6 (schema folds both into `icmp`)
        if (d.length < o + 2) return
        protos += (if (proto == 58) "icmpv6" else "icmp")
        layers += "icmp" -> fields(
          "icmp.type" -> (d(o) & 0xff).toString,
          "icmp.code" -> (d(o + 1) & 0xff).toString)
      case _ => ()
    }

  private def decodeArp(d: Array[Byte], o: Int,
                        layers: scala.collection.mutable.LinkedHashMap[String, Fields],
                        protos: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (d.length < o + 28) return
    // Ethernet/IPv4 ARP only (hw type 1, proto 0x0800, hlen 6, plen 4)
    if (be16(d, o) != 1 || be16(d, o + 2) != 0x0800 ||
      (d(o + 4) & 0xff) != 6 || (d(o + 5) & 0xff) != 4) return
    protos += "arp"
    layers += "arp" -> fields(
      "arp.opcode" -> be16(d, o + 6).toString,
      "arp.src.hw_mac" -> mac(d, o + 8),
      "arp.src.proto_ipv4" -> ipv4(d, o + 14),
      "arp.dst.hw_mac" -> mac(d, o + 18),
      "arp.dst.proto_ipv4" -> ipv4(d, o + 24))
  }

  // ------------------------------------------------------------- payloads

  private val dnsTypes = Map(1 -> "A", 2 -> "NS", 5 -> "CNAME", 6 -> "SOA",
    12 -> "PTR", 15 -> "MX", 16 -> "TXT", 28 -> "AAAA", 33 -> "SRV")

  /** DNS name at `o` with RFC 1035 compression; returns (name, next
    * offset) or null on malformed input. */
  private def dnsName(d: Array[Byte], start: Int, msgStart: Int): (String, Int) = {
    val sb = new StringBuilder
    var o = start
    var next = -1 // offset after the first pointer (caller resumes there)
    var jumps = 0
    while (true) {
      if (o >= d.length || jumps > 32) return null
      val len = d(o) & 0xff
      if (len == 0) {
        return (if (sb.isEmpty) "<Root>" else sb.toString,
          if (next >= 0) next else o + 1)
      } else if ((len & 0xc0) == 0xc0) {
        if (o + 1 >= d.length) return null
        if (next < 0) next = o + 2
        o = msgStart + (((len & 0x3f) << 8) | (d(o + 1) & 0xff))
        jumps += 1
      } else {
        if (o + 1 + len > d.length) return null
        if (sb.nonEmpty) sb.append('.')
        var i = 0
        while (i < len) {
          val c = d(o + 1 + i) & 0xff
          // printable ascii passes through; anything else escapes as \xNN
          sb.append(if (c >= 0x21 && c <= 0x7e) c.toChar.toString else f"\\x$c%02x")
          i += 1
        }
        o += 1 + len
      }
    }
    null // unreachable
  }

  /** Parse a DNS message at `o`; adds a `dns` layer and returns true
    * when the header + the walked questions parse cleanly.
    *
    * Large messages: the walk is CAPPED (first 16 questions, first 64
    * answers) rather than the message rejected — a valid jumbo message
    * still classifies as DNS with its leading records extracted (tshark
    * parses them all; the divergence is only in fields beyond the cap,
    * documented here). When the QUESTION count exceeds the cap the
    * answer section cannot be located (answers start after the last
    * question), so answers are omitted for that — vanishingly rare —
    * shape. Malformed names still reject the whole message. */
  private def decodeDns(d: Array[Byte], o: Int,
                        layers: scala.collection.mutable.LinkedHashMap[String, Fields]): Boolean = {
    if (d.length < o + 12) return false
    val flags = be16(d, o + 2)
    val qd = be16(d, o + 4); val an = be16(d, o + 6)
    if (qd == 0 && an == 0) return false
    val isResponse = (flags >> 15) & 1

    val queries = scala.collection.mutable.LinkedHashMap.empty[String, Fields]
    var p = o + 12
    var i = 0
    val qdWalk = math.min(qd, 16)
    while (i < qdWalk) {
      val nm = dnsName(d, p, o)
      if (nm == null || d.length < nm._2 + 4) return false
      val qtype = be16(d, nm._2); val qclass = be16(d, nm._2 + 2)
      val typeName = dnsTypes.getOrElse(qtype, s"type $qtype")
      val className = if (qclass == 1) "IN" else s"class $qclass"
      queries += s"${nm._1}: type $typeName, class $className" -> fields(
        "dns.qry.name" -> nm._1, "dns.qry.type" -> qtype.toString)
      p = nm._2 + 4
      i += 1
    }
    val answers = scala.collection.mutable.LinkedHashMap.empty[String, Fields]
    i = 0
    var ok = qd <= 16 // unwalked questions -> answer offset unknown
    val anWalk = math.min(an, 64)
    while (i < anWalk && ok) {
      val nm = dnsName(d, p, o)
      if (nm == null || d.length < nm._2 + 10) ok = false
      else {
        val ttl = be32(d, nm._2 + 4)
        val rdlen = be16(d, nm._2 + 8)
        if (d.length < nm._2 + 10 + rdlen) ok = false
        else {
          answers += s"${nm._1}: answer ${i + 1}" -> fields(
            "dns.resp.name" -> nm._1, "dns.resp.ttl" -> ttl.toString)
          p = nm._2 + 10 + rdlen
        }
      }
      i += 1
    }
    val dns = fields()
    if (queries.nonEmpty) dns += "Queries" -> queries
    if (answers.nonEmpty) dns += "Answers" -> answers
    dns += "dns.flags_tree" -> fields("dns.flags.response" -> isResponse.toString)
    layers += "dns" -> dns
    true
  }

  private val httpMethods =
    Seq("GET ", "POST ", "PUT ", "DELETE ", "HEAD ", "OPTIONS ", "PATCH ")

  // compiled once — header extraction runs per HTTP packet in the scan loop
  private val hostPattern =
    java.util.regex.Pattern.compile("(?mi)^Host:\\s*(.*?)\\s*$")
  private val userAgentPattern =
    java.util.regex.Pattern.compile("(?mi)^User-Agent:\\s*(.*?)\\s*$")

  /** Detect + parse an HTTP/1.x request or response head. */
  private def decodeHttp(d: Array[Byte], o: Int,
                         layers: scala.collection.mutable.LinkedHashMap[String, Fields]): Boolean = {
    val len = math.min(d.length - o, 2048)
    if (len < 12) return false
    val text = new String(d, o, len, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lineEnd = text.indexOf("\r\n")
    if (lineEnd < 0) return false
    val line = text.substring(0, lineEnd)
    def header(p: java.util.regex.Pattern): String = {
      val m = p.matcher(text)
      if (m.find()) m.group(1) else null
    }
    if (httpMethods.exists(line.startsWith)) {
      val parts = line.split(" ", 3)
      if (parts.length < 3 || !parts(2).startsWith("HTTP/1.")) return false
      val host = header(hostPattern)
      layers += "http" -> fields(
        "http.host" -> host,
        "http.request.method" -> parts(0),
        "http.request.full_uri" ->
          (if (host != null) s"http://$host${parts(1)}" else null),
        "http.user_agent" -> header(userAgentPattern))
      true
    } else if (line.startsWith("HTTP/1.")) {
      val parts = line.split(" ", 3)
      if (parts.length < 2 || !parts(1).forall(_.isDigit)) return false
      layers += "http" -> fields("http.response.code" -> parts(1))
      true
    } else false
  }

  /** Detect + parse a TLS record; walks a ClientHello for the SNI
    * extension. Emits `tls.record` as a single OBJECT — the shape
    * tshark uses for one record (the pipeline's object-or-array
    * normalization handles it, P10). */
  private def decodeTls(d: Array[Byte], o: Int,
                        layers: scala.collection.mutable.LinkedHashMap[String, Fields]): Boolean = {
    if (d.length < o + 5) return false
    val contentType = d(o) & 0xff
    val vMajor = d(o + 1) & 0xff; val vMinor = d(o + 2) & 0xff
    if (contentType < 20 || contentType > 23 || vMajor != 3 || vMinor > 4) return false
    val recVersion = f"0x$vMajor%02x$vMinor%02x"
    val record = fields("tls.record.version" -> recVersion)
    if (contentType == 22 && d.length >= o + 9 && (d(o + 5) & 0xff) == 1) {
      // ClientHello: handshake type(1) len(3) version(2) random(32)
      var p = o + 9
      val hsVersion =
        if (d.length >= p + 2) f"0x${d(p) & 0xff}%02x${d(p + 1) & 0xff}%02x" else null
      var sni: String = null
      if (d.length >= p + 35) {
        p += 34 // version + random
        val sidLen = d(p) & 0xff; p += 1 + sidLen // session id
        if (d.length >= p + 2) {
          val csLen = be16(d, p); p += 2 + csLen // cipher suites
          if (d.length >= p + 1) {
            val compLen = d(p) & 0xff; p += 1 + compLen // compression
            if (d.length >= p + 2) {
              var extEnd = p + 2 + be16(d, p); p += 2
              extEnd = math.min(extEnd, d.length)
              while (p + 4 <= extEnd && sni == null) {
                val extType = be16(d, p); val extLen = be16(d, p + 2)
                if (extType == 0 && p + 4 + extLen <= extEnd && extLen >= 5) {
                  // server_name list: len(2) type(1)=host_name len(2) name
                  val nameLen = be16(d, p + 7)
                  if (p + 9 + nameLen <= extEnd)
                    sni = new String(d, p + 9, nameLen,
                      java.nio.charset.StandardCharsets.US_ASCII)
                }
                p += 4 + extLen
              }
            }
          }
        }
      }
      val hs = fields("tls.handshake.version" -> hsVersion,
        "tls.handshake.extensions_server_name" -> sni)
      if (hs.nonEmpty) record += "tls.handshake" -> hs
    }
    layers += "tls" -> fields("tls.record" -> record)
    true
  }
}
