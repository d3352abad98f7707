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

  /** events(event_id, ts, user_id, event_type, ...) → one raw tshark
    * packet JSON string per row (column `raw`), event_id retained. */
  def fromEvents(events: DataFrame): DataFrame = {
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
