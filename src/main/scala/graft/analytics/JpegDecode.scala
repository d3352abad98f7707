package graft.analytics

/** Pure-JVM JPEG entropy decoder (ITU-T T.81, Huffman coding) — the
  * decode stage that unlocks perceptual (pixel-level) dedup for the
  * JPEG modality, previously documented as byte-level-only. Scope is
  * the Huffman-coded 8-bit profiles real corpora carry:
  *
  *  - SOF0 (baseline), SOF1 (extended sequential-Huffman) and SOF2
  *    (PROGRESSIVE — the dominant web-export encoding; spectral
  *    selection + successive approximation via
  *    [[progressiveLumaPixels]]'s coefficient buffers) frames at
  *    8-bit precision; lossless/hierarchical/arithmetic-coded frames
  *    return None;
  *  - 1-component (grayscale) and 3-component (JFIF YCbCr) images, any
  *    sampling factors 1–4 (4:4:4, 4:2:0, 4:2:2, …) — only the LUMA
  *    component is dequantized/IDCT'd (JFIF's Y IS BT.601 luma, the
  *    plane [[Multimodal.dHash64]] consumes); chroma blocks are still
  *    Huffman-decoded to advance the bitstream, then discarded. A
  *    single-component scan is NON-interleaved per T.81 A.2 (one data
  *    unit per MCU in raster order — declared sampling factors never
  *    form multi-block MCUs there);
  *  - restart markers (DRI/RSTn) with DC-predictor reset and
  *    byte-alignment;
  *  - 0xFF00 byte unstuffing inside the entropy segment.
  *
  * One interleaved scan covering all frame components (the shape every
  * baseline encoder writes, including the JDK's own `ImageIO` JPEG
  * plugin — which the differential spec uses as the INDEPENDENT
  * reference decoder). Anything else — multi-scan, 12-bit, truncated
  * entropy data, malformed tables — returns None: a corrupt image is
  * DATA, not an engine error (the P14 containment stance shared with
  * [[MediaDecode.pngGrayPixels]]).
  *
  * The IDCT is the exact separable float definition (precomputed
  * c(u)/2·cos((2x+1)uπ/16) table, rows then columns) — deterministic
  * JVM double math, no fast-integer approximation whose rounding could
  * drift between builds. Reference anchor: the reference treats media
  * payloads as opaque bytes end-to-end; pixel decode is part of this
  * repo's mandated multimodal surface, not a port.
  */
private[analytics] object JpegDecode {

  /** Natural-order index for each zigzag position (T.81 figure A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** idct1d(u)(x) = c(u)/2 · cos((2x+1)·u·π/16). */
  private val IdctTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** Canonical Huffman table in the T.81 mincode/maxcode/valptr form. */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l)
          k += counts(l)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
      if (k != vals.length) fail()
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  /** Entropy-segment bit reader: 0xFF00 unstuffing; ANY bare marker is
    * end-of-data (reading past it is malformed). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    private var ended = false

    def bit(): Int = {
      if (bitCnt == 0) {
        if (ended || pos >= b.length) fail()
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) fail()
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else { ended = true; fail() } // marker mid-entropy: truncated
        }
        bitBuf = v
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= code && code >= h.minCode(l)) return h.value(l, code)
        code = (code << 1) | bit()
        l += 1
      }
      fail()
    }

    /** Byte-align and consume the expected RSTn marker (fill 0xFFs
      * allowed before it per the spec). */
    def restart(n: Int): Unit = {
      bitCnt = 0
      ended = false
      // skip to the marker: expect 0xFF+ then 0xD0+n
      if (pos >= b.length) fail()
      while (pos < b.length && (b(pos) & 0xff) == 0xff &&
        pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + n)) fail()
      pos += 2
    }
  }

  private def ext(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v + ((-1 << s) + 1) else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Dequantize a zigzag-order coefficient block against `qt` (zigzag
    * order, as stored), run the exact separable float IDCT, and write
    * the +128-shifted clamped bytes into `plane` at (ox, oy). `coef`
    * and `tmp` are caller-provided 64-double scratch (no per-block
    * allocation). Shared by the baseline streaming decode and the
    * progressive coefficient-buffer decode — the two paths MUST
    * reconstruct identical pixels from identical coefficients (the
    * mm_jpeg_neardup progressive-re-encode guarantee). */
  private def idctToPlane(zz: Array[Int], qt: Array[Int], plane: Array[Byte],
                          lw: Int, ox: Int, oy: Int,
                          coef: Array[Double], tmp: Array[Double]): Unit = {
    java.util.Arrays.fill(coef, 0.0)
    var j = 0
    while (j < 64) {
      if (zz(j) != 0) coef(Zigzag(j)) = zz(j).toDouble * qt(j)
      j += 1
    }
    var y0 = 0
    while (y0 < 8) {
      var x0 = 0
      while (x0 < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          acc += IdctTab(u)(x0) * coef(y0 * 8 + u)
          u += 1
        }
        tmp(y0 * 8 + x0) = acc
        x0 += 1
      }
      y0 += 1
    }
    var x1 = 0
    while (x1 < 8) {
      var y1 = 0
      while (y1 < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          acc += IdctTab(v)(y1) * tmp(v * 8 + x1)
          v += 1
        }
        val px = acc + 128.0
        val clamped =
          if (px <= 0.0) 0
          else if (px >= 255.0) 255
          else math.round(px).toInt
        plane((oy + y1) * lw + (ox + x1)) = clamped.toByte
        y1 += 1
      }
      x1 += 1
    }
  }

  /** Position of the next REAL marker's 0xFF at/after `from` inside an
    * entropy segment: stuffed 0xFF00 bytes, fill 0xFFs and RSTn
    * markers are skipped (progressive scans end at the next SOS/DHT/
    * EOI/… marker, with restarts interior to the scan). */
  private def nextMarker(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val m = b(p + 1) & 0xff
        if (m == 0x00) p += 2
        else if (m == 0xff) p += 1
        else if (m >= 0xd0 && m <= 0xd7) p += 2
        else return p
      } else p += 1
    }
    fail()
  }

  /** Decode to the LUMA plane: (width, height, row-major gray bytes),
    * or None for anything outside the supported baseline profile. */
  def lumaPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      def be16(o: Int): Int = {
        if (o + 1 >= b.length) fail()
        ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      }
      val quant = new Array[Array[Int]](4) // zigzag order, as stored
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var comps: Array[Comp] = null
      var w = 0; var h = 0
      var restartInterval = 0
      var p = 2
      var sosAt = -1
      // ---- marker segment walk up to SOS ----
      while (sosAt < 0) {
        if (p + 1 >= b.length) fail()
        if ((b(p) & 0xff) != 0xff) fail()
        var m = b(p + 1) & 0xff
        while (m == 0xff) { p += 1; if (p + 1 >= b.length) fail(); m = b(p + 1) & 0xff }
        if (m == 0xd9) fail() // EOI before SOS
        // standalone markers carry NO length word (T.81 B.1.1.3): RSTn,
        // TEM (0x01), and a stray second SOI — reading a 2-byte
        // "length" for them would misparse otherwise-decodable streams
        if ((m >= 0xd0 && m <= 0xd7) || m == 0x01 || m == 0xd8) { p += 2 }
        else {
          val len = be16(p + 2)
          if (len < 2 || p + 2 + len > b.length) fail()
          val seg = p + 4 // segment payload start
          val segEnd = p + 2 + len
          m match {
            case 0xdb => // DQT: one or more (pq|tq, 64/128 bytes) entries
              var q = seg
              while (q < segEnd) {
                val pq = (b(q) & 0xff) >> 4
                val tq = b(q) & 0x0f
                if (tq > 3 || pq > 1) fail()
                val tab = new Array[Int](64)
                var i = 0
                q += 1
                while (i < 64) {
                  // bounds are the SEGMENT's, not the payload's: a
                  // table overrunning its declared length must not
                  // silently read the next marker segment as quant
                  // values (Some(wrong pixels) where None is owed)
                  if (pq == 1) {
                    if (q + 2 > segEnd) fail()
                    tab(i) = be16(q); q += 2
                  } else {
                    if (q >= segEnd) fail(); tab(i) = b(q) & 0xff; q += 1
                  }
                  i += 1
                }
                quant(tq) = tab
              }
            case 0xc4 => // DHT: one or more tables
              var q = seg
              while (q < segEnd) {
                val tc = (b(q) & 0xff) >> 4
                val th = b(q) & 0x0f
                if (tc > 1 || th > 3) fail()
                q += 1
                val counts = new Array[Int](17)
                var tot = 0
                var l = 1
                while (l <= 16) {
                  if (q >= segEnd) fail()
                  counts(l) = b(q) & 0xff; tot += counts(l); q += 1; l += 1
                }
                if (q + tot > segEnd || tot > 256) fail()
                val vals = java.util.Arrays.copyOfRange(b, q, q + tot)
                q += tot
                val huff = new Huff(counts, vals)
                if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
              }
            case 0xc0 | 0xc1 => // SOF0/SOF1: the supported frames
              if (comps != null) fail()
              if (len < 8) fail()
              val prec = b(seg) & 0xff
              h = be16(seg + 1); w = be16(seg + 3)
              val nc = b(seg + 5) & 0xff
              if (prec != 8 || w < 1 || h < 1 || (nc != 1 && nc != 3)) return None
              if (len != 8 + 3 * nc) fail()
              comps = Array.tabulate(nc) { i =>
                val o = seg + 6 + 3 * i
                val c = Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
                  b(o + 1) & 0x0f, b(o + 2) & 0x0f)
                if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) fail()
                c
              }
              // T.81 A.2: a single-component scan is NON-interleaved —
              // one data unit per MCU over the component's own
              // ceil(w/8)×ceil(h/8) block grid, regardless of declared
              // sampling factors (an interleaved h×v-blocks-per-MCU
              // walk would place blocks scrambled). Normalizing the
              // factors to 1×1 makes the generic MCU loop below BE the
              // raster walk.
              if (nc == 1) comps = Array(comps(0).copy(h = 1, v = 1))
            case 0xc2 =>
              // progressive: a different decode SHAPE (coefficient
              // buffers accumulated across scans) — re-parse from
              // scratch in the dedicated path
              return progressiveLumaPixels(b)
            case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                 0xcd | 0xce | 0xcf =>
              return None // lossless/arithmetic/hierarchical: out of profile
            case 0xdd => // DRI
              if (len != 4) fail()
              restartInterval = be16(seg)
            case 0xda => sosAt = p
            case _ => () // APPn/COM/DNL/…: skip
          }
          p = segEnd
        }
      }
      if (comps == null) fail()
      // ---- SOS header ----
      val sosLen = be16(sosAt + 2)
      val ns = b(sosAt + 4) & 0xff
      if (ns != comps.length || sosLen != 6 + 2 * ns) return None // multi-scan
      val scanDc = new Array[Huff](comps.length)
      val scanAc = new Array[Huff](comps.length)
      var i = 0
      while (i < ns) {
        val cs = b(sosAt + 5 + 2 * i) & 0xff
        val ci = comps.indexWhere(_.id == cs)
        if (ci != i) fail() // scan order must match frame order
        val td = (b(sosAt + 6 + 2 * i) & 0xff) >> 4
        val ta = b(sosAt + 6 + 2 * i) & 0x0f
        scanDc(ci) = dcTabs(td); scanAc(ci) = acTabs(ta)
        if (scanDc(ci) == null || scanAc(ci) == null) fail()
        i += 1
      }
      // Ss/Se/Ah/Al at sosAt+5+2ns .. +3: baseline fixes 0/63/0/0 —
      // tolerate other values only by rejecting (progressive leftovers)
      val ssOff = sosAt + 5 + 2 * ns
      if ((b(ssOff) & 0xff) != 0 || (b(ssOff + 1) & 0xff) != 63 ||
        (b(ssOff + 2) & 0xff) != 0) return None
      // ---- MCU geometry ----
      val hmax = comps.map(_.h).max
      val vmax = comps.map(_.v).max
      val lumaIdx = 0 // JFIF: first frame component is Y; gray: the only one
      val luma = comps(lumaIdx)
      if (quant(luma.tq) == null) fail()
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      // padded luma plane (block-aligned)
      val lw = mcusX * 8 * luma.h
      val lh = mcusY * 8 * luma.v
      if (lw.toLong * lh.toLong > 256L * 1024 * 1024) return None
      val plane = new Array[Byte](lw * lh)
      val lumaQt = quant(luma.tq)
      val reader = new BitReader(b, sosAt + 4 + sosLen - 2)
      val dcPred = new Array[Int](comps.length)
      val zz = new Array[Int](64)
      val coef = new Array[Double](64)
      val tmp = new Array[Double](64)
      var mcu = 0
      val nMcus = mcusX * mcusY
      var rstN = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          reader.restart(rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
        }
        val mcuX = mcu % mcusX
        val mcuY = mcu / mcusX
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val isLuma = ci == lumaIdx
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // entropy-decode one block into zz (zigzag order)
              java.util.Arrays.fill(zz, 0)
              val s = reader.decode(scanDc(ci))
              if (s > 11) fail()
              dcPred(ci) += ext(reader.receive(s), s)
              zz(0) = dcPred(ci)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = reader.decode(scanAc(ci))
                val r = rs >> 4
                val sz = rs & 15
                if (sz == 0) {
                  if (r == 15) k += 16 else eob = true
                } else {
                  k += r
                  if (k > 63 || sz > 10) fail()
                  zz(k) = ext(reader.receive(sz), sz)
                  k += 1
                }
              }
              if (isLuma) {
                idctToPlane(zz, lumaQt, plane, lw,
                  (mcuX * c.h + bx) * 8, (mcuY * c.v + by) * 8, coef, tmp)
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      // crop the padded plane; if Y is subsampled relative to another
      // component (non-JFIF oddity), nearest-sample up to frame dims
      val out = new Array[Byte](w * h)
      var y2 = 0
      while (y2 < h) {
        val sy = if (luma.v == vmax) y2 else y2 * luma.v / vmax
        var x2 = 0
        while (x2 < w) {
          val sx = if (luma.h == hmax) x2 else x2 * luma.h / hmax
          out(y2 * w + x2) = plane(sy * lw + sx)
          x2 += 1
        }
        y2 += 1
      }
      Some((w, h, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** PROGRESSIVE (SOF2) decode to the luma plane — the dominant
    * web-export encoding (T.81 annex G, spectral selection +
    * successive approximation): coefficients accumulate across SCANS
    * into per-block buffers, then one dequant + IDCT pass reconstructs
    * pixels. Only the LUMA component's coefficients are stored;
    * chroma DC bits are still entropy-decoded when a DC scan is
    * interleaved (they share its bitstream) and chroma AC scans —
    * always single-component per T.81 — are SKIPPED wholesale to the
    * next marker (each scan is an independent entropy segment, so a
    * skipped scan costs a byte walk, not a Huffman decode).
    *
    *  - DC first (Ah=0): predictor diff, coef₀ = diff·2^Al;
    *    DC refine: one correction bit, coef₀ |= bit·2^Al (two's-
    *    complement OR — exactly the encoder's bit-plane split);
    *  - AC first: the EOB-run algorithm (eobrun = 2^r−1 + receive(r)
    *    pending all-zero-band blocks);
    *  - AC refine: libjpeg's correction-bit walk — nonzero history
    *    coefficients take a correction bit wherever the walk passes,
    *    zero-history coefficients count down the run before a new
    *    ±2^Al lands; EOB-runs refine the remaining band tail;
    *  - restart markers reset DC predictors AND the EOB run.
    *
    * Non-interleaved scans walk the component's OWN ceil(w/8)×ceil(h/8)
    * block grid (no MCU padding); interleaved DC scans walk the padded
    * MCU grid — both index one padded luma coefficient store. Same
    * containment stance as the baseline path: anything malformed
    * returns None, never wrong pixels. Validated differentially
    * against ImageIO on its own MODE_DEFAULT progressive output
    * (JpegDecodeSpec). */
  private def progressiveLumaPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      def be16(o: Int): Int = {
        if (o + 1 >= b.length) fail()
        ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      }
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var comps: Array[Comp] = null
      var w = 0; var h = 0
      var restartInterval = 0
      var hmax = 0; var vmax = 0
      var mcusX = 0; var mcusY = 0
      var padBW = 0; var padBH = 0 // padded luma block grid
      var lumaCoef: Array[Array[Int]] = null // per block, zigzag order
      var sawLumaScan = false // ≥1 luma SOS decoded; else all-zero coefs
      val lumaIdx = 0
      var p = 2
      var sawEoi = false
      while (!sawEoi) {
        if (p + 1 >= b.length) fail()
        if ((b(p) & 0xff) != 0xff) fail()
        var m = b(p + 1) & 0xff
        while (m == 0xff) { p += 1; if (p + 1 >= b.length) fail(); m = b(p + 1) & 0xff }
        if (m == 0xd9) { sawEoi = true }
        else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01 || m == 0xd8) { p += 2 }
        else {
          val len = be16(p + 2)
          if (len < 2 || p + 2 + len > b.length) fail()
          val seg = p + 4
          val segEnd = p + 2 + len
          m match {
            case 0xdb =>
              var q = seg
              while (q < segEnd) {
                val pq = (b(q) & 0xff) >> 4
                val tq = b(q) & 0x0f
                if (tq > 3 || pq > 1) fail()
                val tab = new Array[Int](64)
                var i = 0
                q += 1
                while (i < 64) {
                  if (pq == 1) {
                    if (q + 2 > segEnd) fail()
                    tab(i) = be16(q); q += 2
                  } else {
                    if (q >= segEnd) fail(); tab(i) = b(q) & 0xff; q += 1
                  }
                  i += 1
                }
                quant(tq) = tab
              }
            case 0xc4 =>
              var q = seg
              while (q < segEnd) {
                val tc = (b(q) & 0xff) >> 4
                val th = b(q) & 0x0f
                if (tc > 1 || th > 3) fail()
                q += 1
                val counts = new Array[Int](17)
                var tot = 0
                var l = 1
                while (l <= 16) {
                  if (q >= segEnd) fail()
                  counts(l) = b(q) & 0xff; tot += counts(l); q += 1; l += 1
                }
                if (q + tot > segEnd || tot > 256) fail()
                val vals = java.util.Arrays.copyOfRange(b, q, q + tot)
                q += tot
                val huff = new Huff(counts, vals)
                if (tc == 0) dcTabs(th) = huff else acTabs(th) = huff
              }
            case 0xc2 =>
              if (comps != null) fail()
              if (len < 8) fail()
              val prec = b(seg) & 0xff
              h = be16(seg + 1); w = be16(seg + 3)
              val nc = b(seg + 5) & 0xff
              if (prec != 8 || w < 1 || h < 1 || (nc != 1 && nc != 3)) return None
              if (len != 8 + 3 * nc) fail()
              comps = Array.tabulate(nc) { i =>
                val o = seg + 6 + 3 * i
                val c = Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
                  b(o + 1) & 0x0f, b(o + 2) & 0x0f)
                if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) fail()
                c
              }
              // the baseline normalization (T.81 A.2): one component
              // means every scan is non-interleaved — factors are moot
              if (nc == 1) comps = Array(comps(0).copy(h = 1, v = 1))
              hmax = comps.map(_.h).max
              vmax = comps.map(_.v).max
              mcusX = (w + 8 * hmax - 1) / (8 * hmax)
              mcusY = (h + 8 * vmax - 1) / (8 * vmax)
              padBW = mcusX * comps(lumaIdx).h
              padBH = mcusY * comps(lumaIdx).v
              if (padBW.toLong * padBH.toLong > 1024L * 1024) return None
              lumaCoef = Array.fill(padBW * padBH)(new Array[Int](64))
            case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                 0xcb | 0xcd | 0xce | 0xcf =>
              fail() // a second frame header in a progressive stream
            case 0xdd =>
              if (len != 4) fail()
              restartInterval = be16(seg)
            case 0xda =>
              if (comps == null) fail()
              val ns = b(seg) & 0xff
              if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) fail()
              val scanComps = Array.tabulate(ns) { i =>
                val cs = b(seg + 1 + 2 * i) & 0xff
                val ci = comps.indexWhere(_.id == cs)
                if (ci < 0) fail()
                val td = (b(seg + 1 + 2 * i + 1) & 0xff) >> 4
                val ta = b(seg + 1 + 2 * i + 1) & 0x0f
                (ci, td, ta)
              }
              val ss = b(seg + 1 + 2 * ns) & 0xff
              val se = b(seg + 2 + 2 * ns) & 0xff
              val ah = (b(seg + 3 + 2 * ns) & 0xff) >> 4
              val al = b(seg + 3 + 2 * ns) & 0x0f
              val entropyStart = segEnd
              if (ss == 0) {
                // DC scan: Se must be 0; interleaved covers ALL frame
                // components in order (the shape every encoder emits)
                if (se != 0) fail()
                if (ns > 1 && (ns != comps.length ||
                  scanComps.map(_._1).toSeq != comps.indices.toSeq)) fail()
                // interleaved always covers luma; single-comp covers it
                // only when the component IS luma
                if (ns > 1 || scanComps(0)._1 == lumaIdx) sawLumaScan = true
                val reader = new BitReader(b, entropyStart)
                val dcPred = new Array[Int](comps.length)
                val dcs = scanComps.map { case (ci, td, _) =>
                  if (ah == 0) { if (dcTabs(td) == null) fail(); dcTabs(td) }
                  else null
                }
                var rstN = 0
                def maybeRestart(mcu: Int): Unit =
                  if (restartInterval > 0 && mcu > 0 &&
                    mcu % restartInterval == 0) {
                    reader.restart(rstN)
                    rstN = (rstN + 1) & 7
                    java.util.Arrays.fill(dcPred, 0)
                  }
                def decodeDc(si: Int, ci: Int, blockIdx: Int): Unit = {
                  val isLuma = ci == lumaIdx
                  if (ah == 0) {
                    val s = reader.decode(dcs(si))
                    if (s > 11) fail()
                    dcPred(ci) += ext(reader.receive(s), s)
                    if (isLuma && blockIdx >= 0)
                      lumaCoef(blockIdx)(0) = dcPred(ci) << al
                  } else {
                    val bit = reader.bit()
                    if (bit == 1 && isLuma && blockIdx >= 0)
                      lumaCoef(blockIdx)(0) |= (1 << al)
                  }
                }
                if (ns > 1) {
                  // interleaved: padded MCU grid, h×v blocks per comp
                  var mcu = 0
                  val nMcus = mcusX * mcusY
                  while (mcu < nMcus) {
                    maybeRestart(mcu)
                    val mcuX = mcu % mcusX
                    val mcuY = mcu / mcusX
                    var si = 0
                    while (si < ns) {
                      val ci = scanComps(si)._1
                      val c = comps(ci)
                      var by = 0
                      while (by < c.v) {
                        var bx = 0
                        while (bx < c.h) {
                          val blockIdx =
                            if (ci == lumaIdx)
                              (mcuY * c.v + by) * padBW + (mcuX * c.h + bx)
                            else -1
                          decodeDc(si, ci, blockIdx)
                          bx += 1
                        }
                        by += 1
                      }
                      si += 1
                    }
                    mcu += 1
                  }
                } else {
                  // non-interleaved: the component's own block grid
                  val ci = scanComps(0)._1
                  val c = comps(ci)
                  val cw = (w * c.h + hmax - 1) / hmax
                  val ch = (h * c.v + vmax - 1) / vmax
                  val bw = (cw + 7) / 8
                  val bh = (ch + 7) / 8
                  var blk = 0
                  val nBlk = bw * bh
                  while (blk < nBlk) {
                    maybeRestart(blk)
                    val blockIdx =
                      if (ci == lumaIdx) (blk / bw) * padBW + blk % bw else -1
                    decodeDc(0, ci, blockIdx)
                    blk += 1
                  }
                }
                p = nextMarker(b, reader.pos)
              } else {
                // AC scan: single component ALWAYS (T.81 G.1.1.1.1)
                if (ns != 1 || ss > se || se > 63) fail()
                val (ci, _, ta) = scanComps(0)
                if (ci != lumaIdx) {
                  // chroma band: an independent entropy segment — skip
                  p = nextMarker(b, entropyStart)
                } else {
                  sawLumaScan = true
                  val ac = acTabs(ta)
                  if (ac == null) fail()
                  val reader = new BitReader(b, entropyStart)
                  val c = comps(ci)
                  val cw = (w * c.h + hmax - 1) / hmax
                  val ch = (h * c.v + vmax - 1) / vmax
                  val bw = (cw + 7) / 8
                  val bh = (ch + 7) / 8
                  var eobrun = 0
                  var rstN = 0
                  val p1 = 1 << al
                  val m1 = -1 << al
                  var blk = 0
                  val nBlk = bw * bh
                  while (blk < nBlk) {
                    if (restartInterval > 0 && blk > 0 &&
                      blk % restartInterval == 0) {
                      reader.restart(rstN)
                      rstN = (rstN + 1) & 7
                      eobrun = 0
                    }
                    val zz = lumaCoef((blk / bw) * padBW + blk % bw)
                    if (ah == 0) {
                      // AC first pass: the EOB-run algorithm
                      if (eobrun > 0) eobrun -= 1
                      else {
                        var k = ss
                        var done = false
                        while (k <= se && !done) {
                          val rs = reader.decode(ac)
                          val r = rs >> 4
                          val s = rs & 15
                          if (s == 0) {
                            if (r == 15) k += 16
                            else {
                              eobrun = (1 << r) - 1
                              if (r > 0) eobrun += reader.receive(r)
                              done = true
                            }
                          } else {
                            k += r
                            if (k > se || s > 10) fail()
                            zz(k) = ext(reader.receive(s), s) * p1
                            k += 1
                          }
                        }
                      }
                    } else {
                      // AC refinement: correction-bit walk (libjpeg's
                      // decode_mcu_AC_refine shape)
                      var k = ss
                      if (eobrun == 0) {
                        var break = false
                        while (k <= se && !break) {
                          val rs = reader.decode(ac)
                          var r = rs >> 4
                          val s = rs & 15
                          var value = 0
                          if (s == 0) {
                            if (r != 15) {
                              eobrun = 1 << r
                              if (r > 0) eobrun += reader.receive(r)
                              break = true
                            }
                            // r == 15: pass over 16 zero-history coefs
                          } else {
                            if (s != 1) fail()
                            value = if (reader.bit() == 1) p1 else m1
                          }
                          if (!break) {
                            var placed = false
                            while (k <= se && !placed) {
                              val cur = zz(k)
                              if (cur != 0) {
                                if (reader.bit() == 1 && (cur & p1) == 0)
                                  zz(k) = if (cur >= 0) cur + p1 else cur + m1
                              } else {
                                if (r == 0) {
                                  if (value != 0) zz(k) = value
                                  placed = true
                                } else r -= 1
                              }
                              k += 1
                            }
                          }
                        }
                      }
                      if (eobrun > 0) {
                        // EOB run covers this block: refine the
                        // remaining nonzero history in the band
                        while (k <= se) {
                          val cur = zz(k)
                          if (cur != 0) {
                            if (reader.bit() == 1 && (cur & p1) == 0)
                              zz(k) = if (cur >= 0) cur + p1 else cur + m1
                          }
                          k += 1
                        }
                        eobrun -= 1
                      }
                    }
                    blk += 1
                  }
                  p = nextMarker(b, reader.pos)
                }
              }
            case _ => () // APPn/COM/DNL: skip
          }
          if (m != 0xda) p = segEnd
        }
      }
      // a crafted SOF2+EOI stream with ZERO SOS scans would otherwise
      // reconstruct the all-zero coefficient store into Some(mid-gray)
      // where the baseline path returns None — require ≥1 luma scan
      // (the baseline path's implicit SOS requirement)
      if (comps == null || lumaCoef == null || !sawLumaScan) fail()
      val luma = comps(lumaIdx)
      if (quant(luma.tq) == null) fail()
      // reconstruct: one dequant + IDCT pass over the accumulated
      // coefficient store, then crop (the baseline tail)
      val lw = padBW * 8
      val lh = padBH * 8
      if (lw.toLong * lh.toLong > 256L * 1024 * 1024) return None
      val plane = new Array[Byte](lw * lh)
      val lumaQt = quant(luma.tq)
      val coef = new Array[Double](64)
      val tmp = new Array[Double](64)
      var bi = 0
      while (bi < lumaCoef.length) {
        idctToPlane(lumaCoef(bi), lumaQt, plane, lw,
          (bi % padBW) * 8, (bi / padBW) * 8, coef, tmp)
        bi += 1
      }
      val out = new Array[Byte](w * h)
      var y2 = 0
      while (y2 < h) {
        val sy = if (luma.v == vmax) y2 else y2 * luma.v / vmax
        var x2 = 0
        while (x2 < w) {
          val sx = if (luma.h == hmax) x2 else x2 * luma.h / hmax
          out(y2 * w + x2) = plane(sy * lw + sx)
          x2 += 1
        }
        y2 += 1
      }
      Some((w, h, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
