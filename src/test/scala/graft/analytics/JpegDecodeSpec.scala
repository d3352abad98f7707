package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Differential + containment tests for the baseline JPEG entropy
  * decoder. The reference decoder is the JDK's own ImageIO JPEG plugin
  * — an INDEPENDENT implementation (the round-14 verdict's standing
  * ask: no graft decoder had ever been cross-checked against a second
  * decoder; for JPEG this spec closes that). Tolerances exist because
  * the two IDCTs differ legitimately (ImageIO uses libjpeg's scaled
  * integer IDCT; graft uses the exact float definition) — a wrong
  * Huffman walk, dequant, or block placement produces errors in the
  * tens-to-hundreds, far outside them.
  */
class JpegDecodeSpec extends AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  /** Smooth gradient — JPEG-friendly (low quantization error). */
  private def smoothGray(w: Int, h: Int): Array[Byte] = {
    val g = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        g(y * w + x) = (((x * 200) / math.max(w - 1, 1) +
          (y * 55) / math.max(h - 1, 1)) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    g
  }

  private def imageIoGray(jpeg: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "ImageIO failed to decode the fixture")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = (img.getRaster.getSample(x, y, 0) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** BT.601 luma recomputed from ImageIO's RGB output (the YCbCr→RGB→
    * luma round trip costs ≤ ~2 levels on top of IDCT differences). */
  private def imageIoLumaFromRgb(jpeg: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "ImageIO failed to decode the fixture")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(y * w + x) =
          math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt.min(255).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  private def diffStats(a: Array[Byte], b: Array[Byte]): (Double, Int) = {
    assert(a.length == b.length)
    var sum = 0L; var mx = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      sum += d; if (d > mx) mx = d
      i += 1
    }
    (sum.toDouble / a.length, mx)
  }

  test("gray baseline JPEG decodes within tolerance of the ImageIO reference") {
    for ((w, h) <- Seq((24, 16), (17, 13), (64, 48))) {
      val px = smoothGray(w, h)
      val jpeg = Multimodal.jpegBytesGrayEncoded(w, h, px, 0.9f)
      val mine = MediaDecode.jpegLumaPixels(jpeg)
      assert(mine.isDefined, s"decode failed at ${w}x$h")
      val (mw, mh, mg) = mine.get
      assert(mw == w && mh == h)
      val (_, _, ref) = imageIoGray(jpeg)
      // measured: mean 0.0065, max 1 at 64x48 — the two IDCTs agree to
      // the last rounding step; anything structural lands in the tens
      val (mean, mx) = diffStats(mg, ref)
      assert(mean <= 0.5 && mx <= 2,
        s"${w}x$h: mean abs diff $mean, max $mx vs ImageIO")
    }
  }

  test("RGB JPEG luma decodes within tolerance of the ImageIO reference") {
    // color path: 3 components, whatever sampling ImageIO's encoder
    // picks (subsampled chroma = multi-block MCUs; the luma plane is
    // what graft outputs). Odd dims exercise partial edge blocks.
    for ((w, h) <- Seq((40, 24), (19, 11))) {
      System.setProperty("java.awt.headless", "true")
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = (x * 255) / math.max(w - 1, 1)
          val g = (y * 255) / math.max(h - 1, 1)
          val b = ((x + y) * 127) / math.max(w + h - 2, 1)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val bos = new java.io.ByteArrayOutputStream()
      try {
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.9f)
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
        ios.close()
      } finally writer.dispose()
      val jpeg = bos.toByteArray
      val mine = MediaDecode.jpegLumaPixels(jpeg)
      assert(mine.isDefined, s"decode failed at ${w}x$h")
      val (mw, mh, mg) = mine.get
      assert(mw == w && mh == h)
      val (_, _, ref) = imageIoLumaFromRgb(jpeg)
      // measured: mean 0.0125, max 1 at 40x24 with 4:2:0 sampling
      // (SOF reads 22 11 11 — the multi-block-MCU path IS exercised)
      val (mean, mx) = diffStats(mg, ref)
      assert(mean <= 1.0 && mx <= 3,
        s"${w}x$h: mean abs diff $mean, max $mx vs ImageIO luma")
    }
  }

  test("COM metadata variant decodes to byte-identical pixels") {
    val px = Multimodal.synthGray(7L, 24, 16)
    val base = Multimodal.jpegBytesGrayEncoded(24, 16, px, 0.9f)
    val variant = Multimodal.jpegWithComment(base, "metadata variant x")
    assert(!java.util.Arrays.equals(base, variant)) // bytes differ
    val a = MediaDecode.jpegLumaPixels(base)
    val b = MediaDecode.jpegLumaPixels(variant)
    assert(a.isDefined && b.isDefined)
    assert(java.util.Arrays.equals(a.get._3, b.get._3)) // pixels identical
    // hence identical dHash — the Hamming-0 guarantee the registry
    // fixture (mm_jpeg_neardup) builds on
    assert(Multimodal.dHash64(a.get._3, 24, 16) ==
      Multimodal.dHash64(b.get._3, 24, 16))
  }

  test("re-encode at a different quality stays within dHash Hamming 3") {
    // the perceptual claim: a lossy RE-encode (not just re-container)
    // of the same smooth image lands within the band join's pigeonhole
    // completeness radius
    val px = smoothGray(48, 32)
    val a = MediaDecode.jpegLumaPixels(
      Multimodal.jpegBytesGrayEncoded(48, 32, px, 0.92f)).get
    val b = MediaDecode.jpegLumaPixels(
      Multimodal.jpegBytesGrayEncoded(48, 32, px, 0.8f)).get
    val ham = java.lang.Long.bitCount(
      Multimodal.dHash64(a._3, 48, 32) ^ Multimodal.dHash64(b._3, 48, 32))
    assert(ham <= 3, s"re-encode Hamming $ham")
  }

  // ---- hand-built fixture: restart markers + DC predictor reset ----
  // 8x16 gray, quant all-ones, two vertical MCUs with DRI=1:
  // MCU1 DC=63 (block 136s), RST0, MCU2 DC diff 0 — which is pixel 128
  // ONLY if the predictor reset to 0 at the restart.
  private def restartJpeg(rstByte: Int, sampling: Int = 0x11,
                          dqtPrecisionLie: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
    u16(0xffd8) // SOI
    // dqtPrecisionLie: declare pq=1 (16-bit entries) over an
    // 8-bit-sized payload — the table overruns its own segment
    u16(0xffdb); u16(2 + 1 + 64)
    o.write(if (dqtPrecisionLie) 0x10 else 0x00)
    (0 until 64).foreach(_ => o.write(1))
    // DHT DC table 0: len1 -> size 0; len2 -> size 6
    u16(0xffc4); u16(2 + 1 + 16 + 2); o.write(0x00)
    val dcCounts = new Array[Int](16); dcCounts(0) = 1; dcCounts(1) = 1
    dcCounts.foreach(o.write); o.write(0x00); o.write(0x06)
    // DHT AC table 0: len1 -> 0x00 (EOB)
    u16(0xffc4); u16(2 + 1 + 16 + 1); o.write(0x10)
    val acCounts = new Array[Int](16); acCounts(0) = 1
    acCounts.foreach(o.write); o.write(0x00)
    u16(0xffc0); u16(8 + 3); o.write(8) // SOF0
    u16(16); u16(8) // h=16 w=8
    o.write(1); o.write(1); o.write(sampling); o.write(0) // 1 comp, tq 0
    u16(0xffdd); u16(4); u16(1) // DRI = 1 MCU
    u16(0xffda); u16(6 + 2); o.write(1) // SOS, 1 comp
    o.write(1); o.write(0x00) // comp 1, DC 0 / AC 0
    o.write(0); o.write(63); o.write(0) // Ss/Se/AhAl
    // MCU1: DC '10'+'111111' (63), AC EOB '0' -> 10111111 0_1111111
    o.write(0xbf); o.write(0x7f)
    u16(0xff00 | rstByte) // RST0 = 0xd0
    // MCU2: DC '0' (size 0), EOB '0' -> 00_111111
    o.write(0x3f)
    u16(0xffd9) // EOI
    o.toByteArray
  }

  test("restart markers reset the DC predictor and realign the reader") {
    val out = MediaDecode.jpegLumaPixels(restartJpeg(0xd0))
    assert(out.isDefined, "restart fixture failed to decode")
    val (w, h, g) = out.get
    assert(w == 8 && h == 16)
    // DC 63, all-ones quant: pixel = 63/8 + 128 = 135.875 -> 136
    assert((0 until 8 * 8).forall(i => (g(i) & 0xff) == 136),
      s"MCU1 wrong: ${g.take(8).map(_ & 0xff).mkString(",")}")
    // predictor reset: diff 0 after RST must mean DC 0, not 63
    assert((8 * 8 until 16 * 8).forall(i => (g(i) & 0xff) == 128),
      s"MCU2 wrong (predictor not reset?): ${(g(64) & 0xff)}")
  }

  test("wrong restart marker number is malformed, not a crash") {
    assert(MediaDecode.jpegLumaPixels(restartJpeg(0xd1)).isEmpty)
  }

  test("single-component scan is non-interleaved: declared sampling factors never form MCUs") {
    // T.81 A.2: with one component the MCU is ONE data unit in raster
    // order — a 2x2-sampled grayscale frame must decode EXACTLY like
    // the 1x1 one (an interleaved walk would scramble block placement
    // or reject the block count)
    val plain = MediaDecode.jpegLumaPixels(restartJpeg(0xd0, sampling = 0x11))
    val sampled = MediaDecode.jpegLumaPixels(restartJpeg(0xd0, sampling = 0x22))
    assert(plain.isDefined && sampled.isDefined)
    assert(java.util.Arrays.equals(plain.get._3, sampled.get._3),
      "2x2-sampled grayscale must decode identically to 1x1")
  }

  test("a DQT overrunning its declared segment is malformed, not silently misread") {
    // pq=1 (16-bit) declared over an 8-bit-sized payload: reading 128
    // bytes would cross into the next marker segment — must be None
    assert(MediaDecode.jpegLumaPixels(
      restartJpeg(0xd0, dqtPrecisionLie = true)).isEmpty)
  }

  test("progressive gray JPEG decodes within tolerance of the ImageIO reference") {
    // the writer's MODE_DEFAULT progression script exercises DC
    // first+refine and AC first+refine with spectral selection —
    // the full annex-G surface. SOF marker checked to prove the
    // fixture really is SOF2, not silently sequential.
    for ((w, h) <- Seq((24, 16), (17, 13), (64, 48), (129, 65))) {
      val jpeg = Multimodal.jpegBytesGrayEncoded(w, h, smoothGray(w, h),
        0.9f, progressive = true)
      assert(sofMarker(jpeg) == 0xc2, s"fixture at ${w}x$h is not progressive")
      val mine = MediaDecode.jpegLumaPixels(jpeg)
      assert(mine.isDefined, s"progressive decode failed at ${w}x$h")
      val (mw, mh, mg) = mine.get
      assert(mw == w && mh == h)
      val (_, _, ref) = imageIoGray(jpeg)
      // measured: mean <= 0.014, max 1 at every size — same agreement
      // as the baseline path (the two IDCTs' last rounding step)
      val (mean, mx) = diffStats(mg, ref)
      assert(mean <= 0.5 && mx <= 2,
        s"${w}x$h progressive: mean abs diff $mean, max $mx vs ImageIO")
    }
  }

  test("progressive color (4:2:0) JPEG luma decodes within tolerance of ImageIO") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255) / (w - 1); val g = (y * 255) / (h - 1)
        val b = ((x + y) * 127) / (w + h - 2)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    try {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close()
    } finally writer.dispose()
    val jpeg = bos.toByteArray
    assert(sofMarker(jpeg) == 0xc2, "color fixture is not progressive")
    val mine = MediaDecode.jpegLumaPixels(jpeg)
    assert(mine.isDefined, "progressive color decode failed")
    val (mw, mh, mg) = mine.get
    assert(mw == w && mh == h)
    // interleaved DC scan across all 3 components + per-component AC
    // scans: the chroma-skip path AND the interleaved-DC path both run
    val (_, _, ref) = imageIoLumaFromRgb(jpeg)
    val (mean, mx) = diffStats(mg, ref)
    assert(mean <= 1.0 && mx <= 3,
      s"progressive color: mean abs diff $mean, max $mx vs ImageIO luma")
  }

  test("progressive re-encode of the same pixels decodes BIT-identical to the baseline encode") {
    // same encoder, same quality => same quant tables => same
    // coefficients; progressive only reorders the entropy coding — so
    // the two decodes must agree exactly, which is what makes a
    // progressive re-export a Hamming-0 planted pair in mm_jpeg_neardup
    val px = Multimodal.synthGray(7L, 24, 16)
    val base = Multimodal.jpegBytesGrayEncoded(24, 16, px, 0.9f)
    val prog = Multimodal.jpegBytesGrayEncoded(24, 16, px, 0.9f,
      progressive = true)
    assert(!java.util.Arrays.equals(base, prog)) // bytes thoroughly differ
    val a = MediaDecode.jpegLumaPixels(base)
    val b = MediaDecode.jpegLumaPixels(prog)
    assert(a.isDefined && b.isDefined)
    assert(java.util.Arrays.equals(a.get._3, b.get._3),
      "baseline and progressive decodes of the same coefficients must be bit-identical")
  }

  test("a progressive frame with ZERO SOS scans is malformed, not mid-gray") {
    // crafted SOI + DQT + SOF2 + EOI: comps and the coefficient store
    // are both allocated, but no scan ever ran — reconstructing would
    // emit Some(uniform mid-gray) where the baseline path returns None
    val o = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
    u16(0xffd8)                       // SOI
    u16(0xffdb); u16(67); o.write(0x00) // DQT pq=0 tq=0
    (0 until 64).foreach(_ => o.write(1))
    u16(0xffc2); u16(11)              // SOF2, 1 component
    o.write(8); u16(16); u16(16); o.write(1)
    o.write(1); o.write(0x11); o.write(0)
    u16(0xffd9)                       // EOI — no SOS ever
    assert(MediaDecode.jpegLumaPixels(o.toByteArray).isEmpty,
      "zero-scan progressive stream must be rejected, not decoded as gray")
  }

  test("lossless/arithmetic frames remain out of profile") {
    // forge an SOF3 (lossless) header on an otherwise-valid stream
    val jpeg = Multimodal.jpegBytesGrayEncoded(24, 16, smoothGray(24, 16), 0.9f)
    var i = 2
    var sofAt = -1
    while (i + 1 < jpeg.length && sofAt < 0) {
      if ((jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xc0) sofAt = i
      i += 1
    }
    assert(sofAt > 0)
    val forged = jpeg.clone()
    forged(sofAt + 1) = 0xc3.toByte
    assert(MediaDecode.jpegLumaPixels(forged).isEmpty)
  }

  test("truncation and corruption never throw (P14 containment)") {
    for (progressive <- Seq(false, true)) {
      val jpeg = Multimodal.jpegBytesGrayEncoded(24, 16,
        Multimodal.synthGray(3L, 24, 16), 0.9f, progressive)
      // every prefix: None or a successful decode, never an exception
      (0 until jpeg.length by 7).foreach { n =>
        MediaDecode.jpegLumaPixels(java.util.Arrays.copyOf(jpeg, n))
      }
      // deterministic single-byte corruption sweep
      (0 until jpeg.length by 11).foreach { i =>
        val c = jpeg.clone()
        c(i) = (c(i) + 37).toByte
        MediaDecode.jpegLumaPixels(c)
      }
    }
  }

  private def sofMarker(jpeg: Array[Byte]): Int = {
    var i = 2
    while (i + 1 < jpeg.length) {
      val m = jpeg(i + 1) & 0xff
      if ((jpeg(i) & 0xff) == 0xff && m >= 0xc0 && m <= 0xcf &&
        m != 0xc4 && m != 0xc8 && m != 0xcc) return m
      i += 1
    }
    -1
  }
}
