package graft.udm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic tshark-JSON packet synthesis from the driver's `events`
  * table — replaces the reference's missing test pcaps
  * (reference .MISSING_LARGE_BLOBS, test/readme.md:7–15) with a
  * DuckDB-oracle-checkable generator: each event row becomes one packet
  * whose protocol mix is a pure function of `event_type`, so the UDM
  * output is predictable by the oracle without reimplementing the
  * transform in SQL.
  *
  * Mapping: click→HTTP/TCP, view→DNS/UDP, purchase→TLS/TCP,
  * signup→ARP, error→TCP with a non-numeric port (drives the
  * reference's int() error path, json2udm_cloud.py:156).
  */
object SynthPackets {

  private def nul(t: DataType): Column = lit(null).cast(t)

  // JSON fragments shared by the per-type templates (codegen-friendly
  // format_string synthesis — to_json is CodegenFallback and was the
  // costliest node in the synthesis plan)
  private val ethJson =
    """"eth":{"eth.src":"aa:bb:cc:00:00:01","eth.dst":"aa:bb:cc:00:00:02"}"""
  private val ipJson =
    """"ip":{"ip.src":"10.0.0.%3$s","ip.dst":"203.0.113.9","ip.ttl":"64"}"""
  // NB: the original struct builder prefixes "eth:ethertype:ip:" for
  // EVERY type (including ARP) — preserved verbatim
  private def frameJson(protocols: String) =
    s""""frame":{"frame.number":"%1$$s","frame.time_utc":"%2$$s","frame.protocols":"eth:ethertype:ip:$protocols"}"""
  private def pkt(layers: String*) =
    s"""{"_source":{"layers":{${layers.mkString(",")}}}}"""

  /** events(event_id, ts, user_id, event_type, ...) → one raw tshark
    * packet JSON string per row (column `raw`), event_id retained.
    *
    * Every packet is a pure `format_string` of (event_id, ts, user_id)
    * — fully codegen'd, so synthesis fuses into the same whole-stage
    * span as the downstream parse+transform. Layer mix per type matches
    * the original struct builder below (which remains the
    * documentation of record for the shapes): click→HTTP/TCP,
    * view→DNS/UDP, purchase→TLS/TCP, signup→ARP (no eth/ip),
    * error→TCP with a non-numeric srcport.
    *
    * `widen=false` skips the parallelizing repartition for callers that
    * already repartitioned (e.g. an upstream range sort whose order the
    * narrow synth+transform chain must preserve). */
  def fromEvents(events: DataFrame, widen: Boolean = true): DataFrame = {
    val et = col("event_type")
    val idStr = col("event_id").cast(StringType)
    val uidStr = col("user_id").cast(StringType)
    val tsStr = concat(date_format(col("ts"), "MMM dd, yyyy HH:mm:ss.SSSSSS"), lit(" UTC"))
    // %1=event_id %2=ts %3=user_id %4=srcport
    val clickTpl = pkt(frameJson("tcp:http"), ethJson, ipJson,
      """"tcp":{"tcp.srcport":"%4$s","tcp.dstport":"80","tcp.flags":"0x0018"}""",
      """"http":{"http.host":"host%3$s.example.com","http.request.method":"GET","http.request.full_uri":"http://host%3$s.example.com/","http.response.code":"200"}""")
    val viewTpl = pkt(frameJson("udp:dns"), ethJson, ipJson,
      """"udp":{"udp.srcport":"%4$s","udp.dstport":"53"}""",
      """"dns":{"Queries":{"q%3$s.example.org: type A, class IN":{"dns.qry.name":"q%3$s.example.org","dns.qry.type":"1"}},"dns.flags_tree":{"dns.flags.response":"0"}}""")
    val purchaseTpl = pkt(frameJson("tcp:tls"), ethJson, ipJson,
      """"tcp":{"tcp.srcport":"%4$s","tcp.dstport":"443","tcp.flags":"0x0018"}""",
      """"tls":{"tls.record":{"tls.record.version":"0x0303","tls.handshake":{"tls.handshake.version":"0x0304","tls.handshake.extensions_server_name":"sni%3$s.example.net"}}}""")
    val signupTpl = pkt(frameJson("arp"),
      """"arp":{"arp.opcode":"1","arp.src.hw_mac":"aa:bb:cc:00:00:01","arp.src.proto_ipv4":"10.0.0.%3$s","arp.dst.proto_ipv4":"10.0.0.254"}""")
    val errorTpl = pkt(frameJson("tcp"), ethJson, ipJson,
      """"tcp":{"tcp.srcport":"port_%3$s","tcp.dstport":"443","tcp.flags":"0x0002"}""")

    val srcport = when(et === "view", (lit(20000) + col("user_id")).cast(StringType))
      .otherwise((lit(10000) + col("user_id")).cast(StringType))
    val raw = when(et === "click", format_string(clickTpl, idStr, tsStr, uidStr, srcport))
      .when(et === "view", format_string(viewTpl, idStr, tsStr, uidStr, srcport))
      .when(et === "purchase", format_string(purchaseTpl, idStr, tsStr, uidStr, srcport))
      .when(et === "signup", format_string(signupTpl, idStr, tsStr, uidStr, srcport))
      .otherwise(format_string(errorTpl, idStr, tsStr, uidStr, srcport))

    val base = if (widen) graft.util.SparkUtil.widen(events) else events
    base.select(col("event_id"), raw.as("raw"))
  }

  /** The original typed-struct synthesis (kept as the executable spec of
    * the packet shapes; [[fromEvents]] must stay equivalent — see
    * UdmPacketParseSpec's cross-check). */
  def fromEventsStruct(events: DataFrame): DataFrame = {
    val uid = col("user_id").cast(StringType)
    val et = col("event_type")
    val tsStr = concat(date_format(col("ts"), "MMM dd, yyyy HH:mm:ss.SSSSSS"), lit(" UTC"))

    val frame = struct(
      col("event_id").cast(StringType).as("frame.number"),
      tsStr.as("frame.time_utc"),
      concat(lit("eth:ethertype:ip:"),
        when(et === "view", "udp:dns").when(et === "click", "tcp:http")
          .when(et === "purchase", "tcp:tls").when(et === "signup", "arp")
          .otherwise("tcp")).as("frame.protocols"))

    val ip = struct(
      concat(lit("10.0.0."), uid).as("ip.src"),
      lit("203.0.113.9").as("ip.dst"),
      lit("64").as("ip.ttl"))

    val tcpT = StructType(Seq(StructField("tcp.srcport", StringType),
      StructField("tcp.dstport", StringType), StructField("tcp.flags", StringType)))
    val tcp = when(et === "click" || et === "purchase",
        struct((lit(10000) + col("user_id")).cast(StringType).as("tcp.srcport"),
          when(et === "click", "80").otherwise("443").as("tcp.dstport"),
          lit("0x0018").as("tcp.flags")))
      .when(et === "error",
        struct(concat(lit("port_"), uid).as("tcp.srcport"),
          lit("443").as("tcp.dstport"), lit("0x0002").as("tcp.flags")))
      .otherwise(nul(tcpT))

    val udpT = StructType(Seq(StructField("udp.srcport", StringType),
      StructField("udp.dstport", StringType)))
    val udp = when(et === "view",
      struct((lit(20000) + col("user_id")).cast(StringType).as("udp.srcport"),
        lit("53").as("udp.dstport"))).otherwise(nul(udpT))

    val httpT = StructType(Seq(StructField("http.host", StringType),
      StructField("http.request.method", StringType),
      StructField("http.request.full_uri", StringType),
      StructField("http.response.code", StringType)))
    val host = concat(lit("host"), uid, lit(".example.com"))
    val http = when(et === "click",
      struct(host.as("http.host"), lit("GET").as("http.request.method"),
        concat(lit("http://"), host, lit("/")).as("http.request.full_uri"),
        lit("200").as("http.response.code"))).otherwise(nul(httpT))

    val qname = concat(lit("q"), uid, lit(".example.org"))
    val dnsT = StructType(Seq(
      StructField("Queries", MapType(StringType, PacketSchemas.dnsQuerySchema)),
      StructField("dns.flags_tree", StructType(Seq(
        StructField("dns.flags.response", StringType))))))
    val dns = when(et === "view",
      struct(
        map(concat(qname, lit(": type A, class IN")),
          struct(qname.as("dns.qry.name"), lit("1").as("dns.qry.type"))).as("Queries"),
        struct(lit("0").as("dns.flags.response")).as("dns.flags_tree"))).otherwise(nul(dnsT))

    val sni = concat(lit("sni"), uid, lit(".example.net"))
    val tlsT = StructType(Seq(StructField("tls.record", StructType(Seq(
      StructField("tls.record.version", StringType),
      StructField("tls.handshake", StructType(Seq(
        StructField("tls.handshake.version", StringType),
        StructField("tls.handshake.extensions_server_name", StringType)))))))))
    val tls = when(et === "purchase",
      struct(struct(lit("0x0303").as("tls.record.version"),
        struct(lit("0x0304").as("tls.handshake.version"),
          sni.as("tls.handshake.extensions_server_name")).as("tls.handshake"))
        .as("tls.record"))).otherwise(nul(tlsT))

    val arpT = StructType(Seq(StructField("arp.opcode", StringType),
      StructField("arp.src.hw_mac", StringType),
      StructField("arp.src.proto_ipv4", StringType),
      StructField("arp.dst.proto_ipv4", StringType)))
    val arp = when(et === "signup",
      struct(lit("1").as("arp.opcode"),
        lit("aa:bb:cc:00:00:01").as("arp.src.hw_mac"),
        concat(lit("10.0.0."), uid).as("arp.src.proto_ipv4"),
        lit("10.0.0.254").as("arp.dst.proto_ipv4"))).otherwise(nul(arpT))

    val eth = when(et =!= "signup",
      struct(lit("aa:bb:cc:00:00:01").as("eth.src"), lit("aa:bb:cc:00:00:02").as("eth.dst")))

    // signup (ARP) packets carry no IP layer
    val layers = struct(
      frame.as("frame"), eth.as("eth"),
      when(et =!= "signup", ip).as("ip"),
      tcp.as("tcp"), udp.as("udp"), dns.as("dns"), http.as("http"),
      tls.as("tls"), arp.as("arp"))

    graft.util.SparkUtil.widen(events).select(col("event_id"),
      to_json(struct(struct(layers.as("layers")).as("_source")),
        Map("ignoreNullFields" -> "true")).as("raw"))
  }
}
