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
}
