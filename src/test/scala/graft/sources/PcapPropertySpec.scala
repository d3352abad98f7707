package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input properties for the native pcap parser: the
  * fail-loud contract is IllegalArgumentException for corrupt FILE
  * structure and never any other crash; well-framed records always
  * yield one JSON object per packet regardless of payload garbage.
  * Pure JVM — no Spark session needed. */
class PcapPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private def header(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      24 + payloads.map(16 + _.length).sum)
    bb.putInt(0xa1b2c3d4); bb.putShort(2); bb.putShort(4)
    bb.putInt(0); bb.putInt(0); bb.putInt(65535); bb.putInt(1)
    payloads.foreach { p =>
      bb.putInt(1700000000); bb.putInt(1); bb.putInt(p.length); bb.putInt(p.length)
      bb.put(p)
    }
    bb.array()
  }

  test("arbitrary bytes either decode or throw IllegalArgumentException - nothing else") {
    val gen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    samples(gen, 500).foreach { bytes =>
      try PcapParser.decodeFile(bytes)
      catch { case _: IllegalArgumentException => () } // the only allowed failure
    }
  }

  test("well-framed records with garbage payloads: one valid JSON object per packet") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payloadGen = Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val fileGen = Gen.chooseNum(0, 5).flatMap(k => Gen.listOfN(k, payloadGen))
    samples(fileGen, 200).foreach { payloads =>
      val out = PcapParser.decodeFile(header(payloads))
      assert(out.length == payloads.length)
      out.foreach { j =>
        val node = mapper.readTree(j) // must parse
        assert(node.path("_source").path("layers").path("frame")
          .path("frame.number").isTextual)
      }
    }
  }

  test("ethernet-framed random L3+ bytes never crash (header-shaped prefixes included)") {
    // bias generation toward valid-looking prefixes so parsing descends
    // into the protocol decoders instead of bailing at the ethertype
    val l3Gen: Gen[Array[Byte]] = for {
      ethertype <- Gen.oneOf(0x0800, 0x86dd, 0x0806, 0x8100, 0x1234)
      body <- Gen.chooseNum(0, 120).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      firstByte <- Gen.oneOf(0x45, 0x60, 0x46, 0x00, 0xff) // v4/v6-ish starts
    } yield {
      val eth = new Array[Byte](14)
      eth(12) = ((ethertype >> 8) & 0xff).toByte
      eth(13) = (ethertype & 0xff).toByte
      eth ++ (firstByte.toByte +: body.toArray)
    }
    samples(l3Gen, 500).foreach { pkt =>
      val out = PcapParser.decodeFile(header(Seq(pkt)))
      assert(out.length == 1)
    }
  }

  test("pcapng-magic-prefixed garbage either decodes or throws IllegalArgumentException") {
    // random bytes almost never start with the SHB magic, so target the
    // block walker directly: valid magic + random tail, and valid
    // SHB/IDB prefix + random blocks
    val tailGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val shb = CaptureBytes.ngShb()
    val idb = CaptureBytes.ngIdb()
    samples(tailGen, 400).foreach { tail =>
      try PcapParser.decodeFile(Array[Byte](0x0a, 0x0d, 0x0d, 0x0a) ++ tail)
      catch { case _: IllegalArgumentException => () }
      try PcapParser.decodeFile(shb ++ idb ++ tail)
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("DNS and TLS deep parsers survive random payloads on their ports") {
    // valid Ethernet+IPv4+UDP:53 / TCP:443 framing so parsing descends
    // into the pointer-chasing DNS decompressor and the TLS SNI walk,
    // with fully random (and 0x16/0xc0-biased) payload bytes
    def ipv4Udp53(payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(14 + 20 + 8 + payload.length)
      bb.put(new Array[Byte](12)); bb.putShort(0x0800.toShort) // eth
      bb.put(0x45.toByte); bb.put(0.toByte)
      bb.putShort((20 + 8 + payload.length).toShort); bb.putInt(0)
      bb.put(64.toByte); bb.put(17.toByte); bb.putShort(0) // ttl, UDP
      bb.putInt(0x0a000001); bb.putInt(0x0a000002)
      bb.putShort(33000.toShort); bb.putShort(53); bb.putShort(0); bb.putShort(0)
      bb.put(payload); bb.array()
    }
    def ipv4Tcp443(payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(14 + 20 + 20 + payload.length)
      bb.put(new Array[Byte](12)); bb.putShort(0x0800.toShort)
      bb.put(0x45.toByte); bb.put(0.toByte)
      bb.putShort((20 + 20 + payload.length).toShort); bb.putInt(0)
      bb.put(64.toByte); bb.put(6.toByte); bb.putShort(0) // ttl, TCP
      bb.putInt(0x0a000001); bb.putInt(0x0a000002)
      bb.putShort(49000.toShort); bb.putShort(443)
      bb.putInt(1); bb.putInt(2); bb.put(0x50.toByte); bb.put(0x18.toByte)
      bb.putShort(8192.toShort); bb.putShort(0); bb.putShort(0)
      bb.put(payload); bb.array()
    }
    // bias bytes toward DNS pointer markers (0xc0) and TLS handshake
    // prefixes (0x16 0x03) so the deep branches actually execute
    val byteGen = Gen.frequency(
      6 -> Gen.chooseNum(-128, 127).map(_.toByte),
      1 -> Gen.const(0xc0.toByte), 1 -> Gen.const(0x16.toByte),
      1 -> Gen.const(0x03.toByte), 1 -> Gen.const(0x00.toByte))
    val payloadGen = Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, byteGen).map(_.toArray))
    samples(payloadGen, 400).foreach { p =>
      assert(PcapParser.decodeFile(header(Seq(ipv4Udp53(p)))).length == 1)
      assert(PcapParser.decodeFile(header(Seq(ipv4Tcp443(p)))).length == 1)
    }
  }
}
