package graft.analytics

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-JVM binary container parsers — the P14
  * containment stance as an invariant: NO input, however malformed,
  * may throw; well-formed containers round-trip exactly. Pure JVM (no
  * Spark session needed — the parsers are the per-row kernels of the
  * batched decode operators). */
class MultimodalPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  test("wav round-trips every synthesizable parameter combination") {
    val params = for {
      ch <- Gen.chooseNum(1, 8)
      rate <- Gen.oneOf(8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000)
      bits <- Gen.oneOf(8, 16, 24, 32)
      n <- Gen.chooseNum(0, 300)
    } yield (ch, rate, bits, n)
    samples(params, 200).foreach { case (ch, rate, bits, n) =>
      val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val meta = MediaDecode.wav(Multimodal.wavBytes(ch, rate, bits, data))
      assert(meta.contains(WavMeta(ch, rate, bits, n.toLong)),
        s"round-trip failed for ch=$ch rate=$rate bits=$bits n=$n")
    }
  }

  test("wav never throws: arbitrary bytes, corrupted headers, any truncation") {
    samples(bytesGen, 300).foreach { b =>
      MediaDecode.wav(b) // None or Some, never a throw
    }
    val wf = Multimodal.wavBytes(2, 44100, 16, Array.tabulate[Byte](64)(_.toByte))
    // every truncation point of a well-formed container
    (0 to wf.length).foreach { cut => MediaDecode.wav(wf.take(cut)) }
    // every single-byte corruption of the header region
    (0 until 44).foreach { i =>
      val c = wf.clone(); c(i) = (c(i) ^ 0x5a).toByte
      MediaDecode.wav(c)
    }
  }

  test("image decode never throws on arbitrary or truncated input") {
    samples(bytesGen, 300).foreach(b => MediaDecode.decode(b))
    val png = Multimodal.pngBytes(640, 480)
    val jpg = Multimodal.jpegBytes(640, 480)
    (0 to png.length).foreach(cut => MediaDecode.decode(png.take(cut)))
    (0 to jpg.length).foreach(cut => MediaDecode.decode(jpg.take(cut)))
  }

  test("video container walk round-trips and contains every truncation") {
    val framesGen = Gen.chooseNum(0, 9).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0, 40).map(n =>
        Array.tabulate[Byte](n)(i => (i * 7).toByte))))
    samples(framesGen, 100).foreach { frames =>
      val enc = Multimodal.videoBytes(frames)
      val back = Multimodal.parseFrames(enc)
      assert(back.length == frames.length &&
        back.zip(frames).forall { case (a, b) => a.sameElements(b) })
      // any truncation yields a prefix of the frames, never a throw
      (0 to enc.length).foreach { cut =>
        val part = Multimodal.parseFrames(enc.take(cut))
        assert(part.length <= frames.length)
        assert(part.zip(frames).forall { case (a, b) => a.sameElements(b) })
      }
    }
    samples(bytesGen, 200).foreach(b => Multimodal.parseFrames(b))
  }
}
