package graft.multimodal

/** Pure-JVM baseline JPEG (ITU-T T.81 sequential DCT, Huffman): the most
  * common real-world image container, next to the BMP/PNG/WAV/AVI codecs
  * in [[Codecs]]. No AWT/ImageIO — executor-safe byte-level code.
  *
  * Decoder: general baseline — marker parse (APPn/COM skipped; 0xFF
  * fill bytes and the length-less standalone markers TEM/RST0-7 handled
  * in the scan loop), 8-bit DQT tables, SOF0 with per-component
  * sampling factors (4:4:4, 4:2:0, 4:2:2 — any h×v in 1..4 dividing
  * the frame maxima; chroma upsampled by sample replication), DRI +
  * restart-interval entropy segments (byte-align, consume RSTn, reset
  * DC predictors), DHT canonical Huffman table build (the spec's
  * mincode/maxcode/valptr algorithm), interleaved-MCU SOS entropy
  * decode with 0xFF00 byte-unstuffing, DC prediction + AC run-length
  * (EOB/ZRL), dequantize in zigzag order, double-precision reference
  * IDCT with round + clamp + level shift, and JFIF YCbCr→RGB for
  * 3-component scans. Progressive/arithmetic/12-bit and non-dividing
  * sampling return None (skip, not fail — the corrupt-asset discipline
  * of [[Multimodal.decodeMedia]]).
  *
  * Encoder: DC-only blocks (each 8×8 block a constant value) with
  * all-ones quantization and the Annex K standard Huffman tables — a
  * valid baseline interchange stream any decoder accepts, chosen because
  * constant blocks ROUND-TRIP PIXEL-EXACTLY: the DCT of a constant block
  * is a lone DC coefficient 8·(v−128), and the reference IDCT of a lone
  * DC is DC/8 — an exact multiple of 0.125, exact in IEEE double — so
  * decode(encode(img)) == img, which is what makes a header-AND-pixel
  * oracle possible (q286/q296 predict the full decoded pixel sum from
  * id arithmetic, not just the header fields). Emits 4:4:4 or 4:2:0
  * (luma 2×2, per-MCU constant chroma — still pixel-exact), optionally
  * with DRI/RSTn restart intervals. */
object Jpeg {

  /** Decoded image: `pixels` row-major; gray values for 1 component,
    * 0xRRGGBB for 3 components. */
  final case class JpegImage(
      width: Int, height: Int, nComponents: Int, pixels: Array[Int])

  // ----------------------------------------------------------------
  // Annex K standard Huffman tables (luminance)
  // ----------------------------------------------------------------
  private val dcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals: Array[Int] = (0 to 11).toArray
  private val acBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // canonical progressive AC table: only the EOBn run symbols r<<4
  // (r = 0..14) — Annex K's AC table lacks 0x10..0xE0, and an all-zero-AC
  // progressive scan codes nothing else. 15 codes of length 4 fit the
  // canonical space (16 at length 4) with room to spare.
  private val acBitsProg: Array[Int] =
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acValsProg: Array[Int] = (0 to 14).map(_ << 4).toArray

  /** Zigzag order: zigzag(i) = natural (row-major) index of scan pos i. */
  private val zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var (x, y, up) = (0, 0, true)
    for (i <- 0 until 64) {
      z(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    z
  }

  // canonical code assignment: (code, length) per symbol, in table order
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var vi = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out += vals(vi) -> ((code, len))
        code += 1
        vi += 1
      }
      code <<= 1
    }
    out.result()
  }

  // ----------------------------------------------------------------
  // Encoder (DC-only constant blocks)
  // ----------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(bitsValue: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bitsValue >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = { // pad the final byte with 1s (spec F.1.2.3)
      while (nbits != 0) put(1, 1)
    }
    /** Byte-align (1-padding gets stuffed if it lands on 0xFF) and emit
      * a marker. Marker 0xFF bytes are written raw — the stuffing rule
      * applies to entropy-coded bytes only (spec B.1.1.5). */
    def putMarker(m: Int): Unit = {
      flushOnes()
      out.write(0xff); out.write(m & 0xff)
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Per-block constant pixel value of the synthesized fixture — shared
    * with the q286 oracle's arithmetic: v = (id·7 + bx·13 + by·29) mod 256. */
  def blockValue(id: Long, bx: Int, by: Int): Int =
    ((id * 7 + bx * 13L + by * 29L) % 256).toInt

  /** Per-MCU constant chroma of the 4:2:0 fixture — shared with the
    * q296 oracle: cb = (id·11 + mx·17 + my·23) mod 256. */
  def chromaCb(id: Long, mx: Int, my: Int): Int =
    ((id * 11 + mx * 17L + my * 23L) % 256).toInt

  /** cr = (id·5 + mx·19 + my·31) mod 256 — see [[chromaCb]]. */
  def chromaCr(id: Long, mx: Int, my: Int): Int =
    ((id * 5 + mx * 19L + my * 31L) % 256).toInt

  /** Encode a grayscale baseline JPEG whose 8×8 block (bx, by) is the
    * constant [[blockValue]](seed, bx, by); edge blocks are padded with
    * the same constant, so clipped pixels keep the block's value. */
  def encodeJpegGray(width: Int, height: Int, seed: Long): Array[Byte] =
    encodeDcOnly(width, height,
      Seq((bx: Int, by: Int) => blockValue(seed, bx, by)), Seq((1, 1)))

  /** 3-component (YCbCr 4:4:4) DC-only encode: one value function per
    * component. All components share the luminance tables (legal —
    * table ids are per-scan-component assignments). */
  def encodeJpegColor(
      width: Int, height: Int,
      yF: (Int, Int) => Int, cbF: (Int, Int) => Int, crF: (Int, Int) => Int): Array[Byte] =
    encodeDcOnly(width, height, Seq(yF, cbF, crF), Seq((1, 1), (1, 1), (1, 1)))

  /** 4:2:0 DC-only encode — the dominant real-world chroma layout: luma
    * sampled 2×2 (each MCU is 4 Y blocks covering 16×16 pixels), chroma
    * 1×1 (one Cb + one Cr block per MCU, upsampled 2×2 at decode).
    * `yF(bx, by)` prices each 8×8 LUMA block; `cbF`/`crF`(mx, my) price
    * each MCU's constant chroma — constant-per-MCU chroma replicates
    * exactly through the 2×2 upsample, so the full color round-trip
    * stays pixel-exact. `restartInterval` > 0 emits a DRI segment and
    * RSTn markers every that many MCUs (DC predictors reset — the
    * stream decodes to the identical image). */
  def encodeJpeg420(
      width: Int, height: Int,
      yF: (Int, Int) => Int, cbF: (Int, Int) => Int, crF: (Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] =
    encodeDcOnly(width, height, Seq(yF, cbF, crF),
      Seq((2, 2), (1, 1), (1, 1)), restartInterval)

  /** 4:2:2 DC-only encode (luma 2×1): the other common subsampled form;
    * `cbF`/`crF` price each MCU column-pair's constant chroma. */
  def encodeJpeg422(
      width: Int, height: Int,
      yF: (Int, Int) => Int, cbF: (Int, Int) => Int, crF: (Int, Int) => Int): Array[Byte] =
    encodeDcOnly(width, height, Seq(yF, cbF, crF),
      Seq((2, 1), (1, 1), (1, 1)))

  /** General interleaved DC-only encode: per-component (h, v) sampling
    * factors; each component c's block (bx, by) — in ITS OWN block grid,
    * mcusX·h(c) × mcusY·v(c) — is the constant `comps(c)(bx, by)`.
    * For chroma at 1×1 under luma 2×2 the grid IS the MCU grid, which
    * is how [[encodeJpeg420]] prices per-MCU chroma. */
  private def encodeDcOnly(
      width: Int, height: Int,
      comps: Seq[(Int, Int) => Int],
      sampling: Seq[(Int, Int)],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && (comps.size == 1 || comps.size == 3))
    require(sampling.size == comps.size &&
      sampling.forall { case (h, v) => h >= 1 && h <= 4 && v >= 1 && v <= 4 })
    require(restartInterval >= 0 && restartInterval <= 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int*): Unit = b.foreach(v => out.write(v & 0xff))
    m(0xff, 0xd8) // SOI
    // DQT: table 0, 8-bit, all ones (lossless for DC-only blocks)
    m(0xff, 0xdb, 0x00, 0x43, 0x00)
    for (_ <- 0 until 64) out.write(1)
    // SOF0
    val nc = comps.size
    m(0xff, 0xc0, 0x00, 8 + 3 * nc, 8,
      (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff, nc)
    for (c <- 0 until nc)
      m(c + 1, (sampling(c)._1 << 4) | sampling(c)._2, 0x00) // id, HxV, quant 0
    // DHT: DC table 0 + AC table 0 (Annex K luminance)
    m(0xff, 0xc4, 0x00, 19 + dcVals.length, 0x00)
    dcBits.foreach(out.write); dcVals.foreach(out.write)
    m(0xff, 0xc4, 0x00, 19 + acVals.length, 0x10)
    acBits.foreach(out.write); acVals.foreach(out.write)
    if (restartInterval > 0) // DRI (B.2.4.4)
      m(0xff, 0xdd, 0x00, 0x04, (restartInterval >> 8) & 0xff, restartInterval & 0xff)
    // SOS
    m(0xff, 0xda, 0x00, 6 + 2 * nc, nc)
    for (c <- 1 to nc) m(c, 0x00) // DC table 0, AC table 0
    m(0x00, 0x3f, 0x00) // Ss, Se, Ah/Al
    // entropy: raster MCUs; per MCU each component contributes its
    // v(c)×h(c) DC-only blocks (+ EOB) in the spec's interleave order
    val dcTab = buildEncodeTable(dcBits, dcVals)
    val acTab = buildEncodeTable(acBits, acVals)
    val bw = new BitWriter
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val prev = new Array[Int](nc)
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.putMarker(0xd0 + (rst % 8)) // RSTn: byte-align + reset DC pred
        rst += 1
        java.util.Arrays.fill(prev, 0)
      }
      mcu += 1
      for (c <- 0 until nc; v <- 0 until sampling(c)._2; h <- 0 until sampling(c)._1) {
        val (bx, by) = (mx * sampling(c)._1 + h, my * sampling(c)._2 + v)
        val dc = 8 * (comps(c)(bx, by) - 128) // DCT DC of a constant block
        var diff = dc - prev(c)
        prev(c) = dc
        var s = 0
        var mag = math.abs(diff)
        while (mag != 0) { s += 1; mag >>= 1 }
        val (code, len) = dcTab(s)
        bw.put(code, len)
        if (s > 0) {
          if (diff < 0) diff += (1 << s) - 1
          bw.put(diff, s)
        }
        val (eob, eobLen) = acTab(0x00)
        bw.put(eob, eobLen)
      }
    }
    bw.flushOnes()
    out.write(bw.toBytes, 0, bw.toBytes.length)
    m(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale PROGRESSIVE (SOF2) DC-only encode — see
    * [[encodeJpegProgressive]]. */
  def encodeJpegProgressiveGray(width: Int, height: Int, seed: Long,
      restartInterval: Int = 0): Array[Byte] =
    encodeJpegProgressive(width, height,
      Seq((bx: Int, by: Int) => blockValue(seed, bx, by)), Seq((1, 1)),
      restartInterval)

  /** 4:2:0 color PROGRESSIVE (SOF2) DC-only encode — the dominant
    * real-world JPEG shape (progressive + subsampled); per-8×8-luma-block
    * constant Y, per-MCU constant chroma, as [[encodeJpeg420]]. */
  def encodeJpegProgressive420(
      width: Int, height: Int,
      yF: (Int, Int) => Int, cbF: (Int, Int) => Int, crF: (Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] =
    encodeJpegProgressive(width, height, Seq(yF, cbF, crF),
      Seq((2, 2), (1, 1), (1, 1)), restartInterval)

  /** PROGRESSIVE (SOF2) DC-only encode with spectral selection AND
    * successive approximation — the scan script most web encoders emit,
    * reduced to the DC-only payload that round-trips pixel-exactly:
    *
    *  1. DC first scan, interleaved, Al=1 (point-transformed diffs);
    *  2. DC refinement scan, Ah=1→Al=0 (one raw appended bit per block —
    *     genuinely nonzero bits: the DC quant step is 8, so the coded DC
    *     is v−128, odd for odd v);
    *  3. per component, AC first scan Ss=1..63 at Al=1 — every AC is
    *     zero, so the scan is pure EOBn run-length coding (the
    *     progressive-only band-skip machinery, spec G.1.2.2);
    *  4. per component, AC refinement scan Ah=1→Al=0 — zero history, so
    *     EOBn runs with no correction bits (spec G.1.2.3's parse path).
    *
    * AC scans are single-component NON-interleaved (mandatory in
    * progressive), so a subsampled luma plane's scan covers its own
    * ceil(cw/8)×ceil(ch/8) block count, NOT the padded MCU grid — the
    * dims mismatch every progressive decoder must get right. Quant table:
    * q(DC)=8 (exact: dequantized DC is 8·(v−128), the same lone-DC IDCT
    * as baseline), q(AC)=1. Uses the Annex K DC table and a minimal
    * EOBn-only AC table (Annex K's AC table has no 0x10..0xE0 symbols). */
  def encodeJpegProgressive(
      width: Int, height: Int,
      comps: Seq[(Int, Int) => Int],
      sampling: Seq[(Int, Int)],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && (comps.size == 1 || comps.size == 3))
    require(sampling.size == comps.size &&
      sampling.forall { case (h, v) => h >= 1 && h <= 4 && v >= 1 && v <= 4 })
    require(restartInterval >= 0 && restartInterval <= 0xffff)
    val nc = comps.size
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int*): Unit = b.foreach(v => out.write(v & 0xff))
    m(0xff, 0xd8) // SOI
    // DQT: q(DC)=8 (scan pos 0), q(AC)=1
    m(0xff, 0xdb, 0x00, 0x43, 0x00)
    out.write(8)
    for (_ <- 1 until 64) out.write(1)
    // SOF2 (progressive DCT, Huffman)
    m(0xff, 0xc2, 0x00, 8 + 3 * nc, 8,
      (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff, nc)
    for (c <- 0 until nc)
      m(c + 1, (sampling(c)._1 << 4) | sampling(c)._2, 0x00)
    // DHT: Annex K DC table 0 + EOBn-only AC table 0
    m(0xff, 0xc4, 0x00, 19 + dcVals.length, 0x00)
    dcBits.foreach(out.write); dcVals.foreach(out.write)
    m(0xff, 0xc4, 0x00, 19 + acValsProg.length, 0x10)
    acBitsProg.foreach(out.write); acValsProg.foreach(out.write)
    if (restartInterval > 0) // DRI (B.2.4.4) — applies to EVERY scan
      m(0xff, 0xdd, 0x00, 0x04, (restartInterval >> 8) & 0xff, restartInterval & 0xff)
    val dcTab = buildEncodeTable(dcBits, dcVals)
    val acTab = buildEncodeTable(acBitsProg, acValsProg)
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // quantized DC of component c's block (bx, by): (v − 128), q step 8
    def dcQ(c: Int)(bx: Int, by: Int): Int = comps(c)(bx, by) - 128
    def sosHeader(scanComps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      m(0xff, 0xda, 0x00, 6 + 2 * scanComps.size, scanComps.size)
      for (c <- scanComps) m(c + 1, 0x00) // DC table 0, AC table 0
      m(ss, se, (ah << 4) | al)
    }
    def writeDiff(bw: BitWriter, diff0: Int): Unit = {
      var diff = diff0
      var s = 0
      var mag = math.abs(diff)
      while (mag != 0) { s += 1; mag >>= 1 }
      val (code, len) = dcTab(s)
      bw.put(code, len)
      if (s > 0) {
        if (diff < 0) diff += (1 << s) - 1
        bw.put(diff, s)
      }
    }
    // scan 1: DC first, interleaved, Al=1 (RSTn every restartInterval
    // MCUs: byte-align, marker, reset DC predictors — E.2.4)
    sosHeader(0 until nc, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter
      val prev = new Array[Int](nc)
      var mcu = 0
      var rst = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.putMarker(0xd0 + (rst % 8)); rst += 1
          java.util.Arrays.fill(prev, 0)
        }
        mcu += 1
        for (c <- 0 until nc; v <- 0 until sampling(c)._2; h <- 0 until sampling(c)._1) {
          val pt = dcQ(c)(mx * sampling(c)._1 + h, my * sampling(c)._2 + v) >> 1
          writeDiff(bw, pt - prev(c))
          prev(c) = pt
        }
      }
      bw.flushOnes()
      out.write(bw.toBytes, 0, bw.toBytes.length)
    }
    // scan 2: DC refinement, Ah=1 -> Al=0: one appended bit per block
    // (restart markers still punctuate the scan; nothing to reset)
    sosHeader(0 until nc, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter
      var mcu = 0
      var rst = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.putMarker(0xd0 + (rst % 8)); rst += 1
        }
        mcu += 1
        for (c <- 0 until nc; v <- 0 until sampling(c)._2; h <- 0 until sampling(c)._1)
          bw.put(dcQ(c)(mx * sampling(c)._1 + h, my * sampling(c)._2 + v) & 1, 1)
      }
      bw.flushOnes()
      out.write(bw.toBytes, 0, bw.toBytes.length)
    }
    // EOBn runs covering n all-zero-AC blocks (G.1.2.2: run length
    // L = 2^r + ext(r bits), max 32767)
    def writeEobRuns(bw: BitWriter, n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        val l = math.min(n, 32767)
        var r = 0
        while ((1 << (r + 1)) <= l) r += 1
        val (code, len) = acTab(r << 4)
        bw.put(code, len)
        if (r > 0) bw.put(l - (1 << r), r)
        n -= l
      }
    }
    // scans 3..: per component, AC first (Al=1) then AC refine (Ah=1).
    // In a non-interleaved scan the MCU is ONE block, so RSTn falls
    // every restartInterval blocks — and an EOBn run may never span a
    // restart boundary (E.2.4 resets the EOB run), so runs are emitted
    // per restart segment.
    for (pass <- 0 to 1; c <- 0 until nc) {
      val cw = (width * sampling(c)._1 + hMax - 1) / hMax
      val ch = (height * sampling(c)._2 + vMax - 1) / vMax
      val nBlocks = ((cw + 7) / 8) * ((ch + 7) / 8)
      if (pass == 0) sosHeader(Seq(c), 1, 63, 0, 1)
      else sosHeader(Seq(c), 1, 63, 1, 0)
      val bw = new BitWriter
      if (restartInterval <= 0) writeEobRuns(bw, nBlocks)
      else {
        var done = 0
        var rst = 0
        while (done < nBlocks) {
          if (done > 0) { bw.putMarker(0xd0 + (rst % 8)); rst += 1 }
          val seg = math.min(restartInterval, nBlocks - done)
          writeEobRuns(bw, seg)
          done += seg
        }
      }
      bw.flushOnes()
      out.write(bw.toBytes, 0, bw.toBytes.length)
    }
    m(0xff, 0xd9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Decoder (general baseline, 4:4:4)
  // ----------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // spec C.2/F.2.2.3: mincode/maxcode/valptr per code length
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var vi = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) == 0) maxCode(len) = -1
        else {
          valPtr(len) = vi
          minCode(len) = code
          code += bits(len - 1); vi += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      if (maxCode(len) < 0 || code > maxCode(len))
        throw new java.io.IOException("bad huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new java.io.IOException("eof in entropy data")
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length || (b(pos) & 0xff) != 0x00)
            throw new java.io.IOException("marker in entropy data")
          pos += 1 // unstuff
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      for (_ <- 0 until n) v = (v << 1) | bit()
      v
    }
    /** Restart boundary (spec E.2.4): discard the pad bits of the
      * current byte, consume the expected RSTn marker. The caller resets
      * the DC predictors. */
    def expectRst(n: Int): Unit = {
      nbits = 0 // byte-align: the encoder 1-padded to the boundary
      if (pos + 2 > b.length) throw new java.io.IOException("eof at restart")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + n))
        throw new java.io.IOException("expected RST marker")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val idctCos: Array[Double] =
    Array.tabulate(8 * 8)(i => math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16))
  private val c0 = 1.0 / math.sqrt(2.0)

  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) c0 else 1.0
            val cv = if (v == 0) c0 else 1.0
            sum += cu * cv * coef(v * 8 + u) * idctCos(x * 8 + u) * idctCos(y * 8 + v)
            u += 1
          }
          v += 1
        }
        val p = math.round(sum / 4.0).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp8(v: Double): Int =
    math.max(0, math.min(255, math.round(v).toInt))

  /** Decode a JPEG — baseline sequential (SOF0) or progressive Huffman
    * (SOF2, spectral selection + successive approximation). None for
    * anything unsupported or corrupt (arithmetic coding, 12-bit,
    * non-dividing sampling factors, truncation).
    *
    * The decoder is the standard two-stage shape every multi-scan
    * decoder uses (spec G.2): scans accumulate QUANTIZED coefficients
    * into per-component buffers — DC first/refine (F.2.4.1 + point
    * transform), AC first with EOBn band-run skipping (G.1.2.2), AC
    * refinement with correction bits (G.1.2.3) — and reconstruction
    * (dequantize + IDCT + upsample + YCbCr) runs once at EOI. Baseline
    * is the degenerate single full-band scan through the same machinery
    * and reconstructs immediately after its SOS (no EOI required, as
    * before). Progressive AC scans are single-component NON-interleaved:
    * they cover the component's own ceil(cw/8)×ceil(ch/8) blocks, not
    * the padded interleaved MCU grid. DRI/RSTn restart intervals reset
    * DC predictors AND the EOB run in every scan kind. */
  def decodeJpeg(b: Array[Byte]): Option[JpegImage] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = 0; var height = 0
    var nc = 0
    var progressive = false
    var compId: Array[Int] = null
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var dri = 0 // restart interval in MCUs (0 = none)
    var mcusX = 0; var mcusY = 0
    var bxn: Array[Int] = null // per-component block-grid width
    var byn: Array[Int] = null
    var coefs: Array[Array[Int]] = null // QUANTIZED coefs, natural order
    var anyScan = false
    def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    /** Dequantize + IDCT every block, then upsample + color-convert. */
    def reconstruct(): JpegImage = {
      val hMax = compH.max; val vMax = compV.max
      val planes = Array.tabulate(nc)(c => new Array[Int](bxn(c) * byn(c) * 64))
      val dq = new Array[Int](64)
      var c = 0
      while (c < nc) {
        val q = quant(compQ(c))
        if (q == null) throw new java.io.IOException("missing quant table")
        val arr = coefs(c)
        var bi = 0
        val nBlocks = bxn(c) * byn(c)
        while (bi < nBlocks) {
          val base = bi * 64
          var k = 0
          while (k < 64) { val nat = zigzag(k); dq(nat) = arr(base + nat) * q(k); k += 1 }
          System.arraycopy(idct(dq), 0, planes(c), base, 64)
          bi += 1
        }
        c += 1
      }
      // sample component c at pixel (x, y): replication upsample
      def sample(ci: Int, x: Int, y: Int): Int = {
        val px = x * compH(ci) / hMax
        val py = y * compV(ci) / vMax
        planes(ci)(((py / 8) * bxn(ci) + px / 8) * 64 + (py % 8) * 8 + (px % 8))
      }
      val pixels = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          pixels(y * width + x) =
            if (nc == 1) sample(0, x, y)
            else {
              val yy = sample(0, x, y).toDouble
              val cb = sample(1, x, y) - 128.0
              val cr = sample(2, x, y) - 128.0
              (clamp8(yy + 1.402 * cr) << 16) |
                (clamp8(yy - 0.344136 * cb - 0.714136 * cr) << 8) |
                clamp8(yy + 1.772 * cb)
            }
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, nc, pixels)
    }

    /** Decode one scan's entropy data into the coefficient buffers;
      * returns the position of the next marker's 0xFF. */
    def decodeScan(start: Int, scanC: Array[Int], scanDc: Array[Int],
        scanAc: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
      val ns = scanC.length
      val br = new BitReader(b, start)
      val pred = new Array[Int](ns)
      var eobrun = 0
      for (si <- 0 until ns) {
        // sequential needs both tables; progressive DC-first needs DC
        // only; DC refinement is raw bits (no table); AC scans need AC
        val needDc = !progressive || (ss == 0 && ah == 0)
        val needAc = !progressive || ss > 0
        if (needDc && dcTabs(scanDc(si)) == null)
          throw new java.io.IOException("missing DC table")
        if (needAc && acTabs(scanAc(si)) == null)
          throw new java.io.IOException("missing AC table")
      }

      // decode one block of scan component si at natural-order offset off
      def block(si: Int, off: Int): Unit = {
        val arr = coefs(scanC(si))
        if (!progressive) { // sequential: full-band DC+AC
          val t = dcTabs(scanDc(si)).decode(br)
          pred(si) += extend(br.receive(t), t)
          arr(off) = pred(si)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = acTabs(scanAc(si)).decode(br)
            val (r, s) = (rs >> 4, rs & 0x0f)
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += r
              if (k > 63) throw new java.io.IOException("ac overflow")
              arr(off + zigzag(k)) = extend(br.receive(s), s)
              k += 1
            }
          }
        } else if (ss == 0 && ah == 0) { // DC first (F.2.4.1 + Al shift)
          val t = dcTabs(scanDc(si)).decode(br)
          pred(si) += extend(br.receive(t), t)
          arr(off) = pred(si) << al
        } else if (ss == 0) { // DC refinement: one appended bit
          if (br.bit() == 1) arr(off) |= (1 << al)
        } else if (ah == 0) { // AC first with EOBn runs (G.1.2.2)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (k <= se && !done) {
              val rs = acTabs(scanAc(si)).decode(br)
              val (r, s) = (rs >> 4, rs & 0x0f)
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1
                  if (r > 0) eobrun += br.receive(r)
                  done = true
                }
              } else {
                k += r
                if (k > se) throw new java.io.IOException("ac overflow")
                arr(off + zigzag(k)) = extend(br.receive(s), s) << al
                k += 1
              }
            }
          }
        } else { // AC refinement (G.1.2.3, the jdphuff structure)
          val p1 = 1 << al
          val m1 = -1 << al
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = acTabs(scanAc(si)).decode(br)
              var r = rs >> 4
              val s = rs & 0x0f
              var sVal = 0
              if (s != 0) {
                if (s != 1) throw new java.io.IOException("bad refine magnitude")
                sVal = if (br.bit() == 1) p1 else m1
              } else if (r != 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += br.receive(r)
                brk = true
              }
              if (!brk) {
                // advance over r zero-HISTORY coefficients, emitting a
                // correction bit at every nonzero one passed
                var placed = false
                while (k <= se && !placed) {
                  val o2 = off + zigzag(k)
                  if (arr(o2) != 0) {
                    if (br.bit() == 1 && (arr(o2) & p1) == 0)
                      arr(o2) += (if (arr(o2) >= 0) p1 else m1)
                    k += 1
                  } else if (r == 0) {
                    if (sVal != 0) arr(o2) = sVal
                    k += 1
                    placed = true
                  } else { r -= 1; k += 1 }
                }
              }
            }
          }
          if (eobrun > 0) { // EOB tail: correction bits on nonzero history
            while (k <= se) {
              val o2 = off + zigzag(k)
              if (arr(o2) != 0) {
                if (br.bit() == 1 && (arr(o2) & p1) == 0)
                  arr(o2) += (if (arr(o2) >= 0) p1 else m1)
              }
              k += 1
            }
            eobrun -= 1
          }
        }
      }

      var mcu = 0
      var rst = 0
      def restartBoundary(): Unit =
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          br.expectRst(rst % 8)
          rst += 1
          java.util.Arrays.fill(pred, 0)
          eobrun = 0 // E.2.4 applies to the EOB run too (G.1.2.2 note)
        }
      if (ns > 1) { // interleaved: MCU loop over the padded grid
        for (_my <- 0 until mcusY; _mx <- 0 until mcusX) {
          restartBoundary()
          mcu += 1
          for (si <- 0 until ns) {
            val c = scanC(si)
            for (v <- 0 until compV(c); h <- 0 until compH(c)) {
              val bx = _mx * compH(c) + h
              val by = _my * compV(c) + v
              block(si, (by * bxn(c) + bx) * 64)
            }
          }
        }
      } else { // non-interleaved: the component's OWN block count
        val c = scanC(0)
        val hMax = compH.max; val vMax = compV.max
        val cw = (width * compH(c) + hMax - 1) / hMax
        val ch = (height * compV(c) + vMax - 1) / vMax
        val nbx = (cw + 7) / 8
        val nby = (ch + 7) / 8
        for (by <- 0 until nby; bx <- 0 until nbx) {
          restartBoundary() // MCU = one block in a non-interleaved scan
          mcu += 1
          block(0, (by * bxn(c) + bx) * 64)
        }
      }
      // scan ends at the next marker: first 0xFF not followed by 0x00
      var p = br.pos
      while (p + 1 < b.length &&
        !((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) != 0x00)) p += 1
      p
    }

    while (pos + 2 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      // 0xFF fill bytes: any number of 0xFF may pad before the marker
      // byte (spec B.1.1.2) — skip to the last one
      var mp = pos + 1
      while (mp + 1 < b.length && (b(mp) & 0xff) == 0xff) mp += 1
      val marker = b(mp) & 0xff
      if (marker == 0xd9) // EOI: reconstruct if any scan landed
        return if (anyScan && nc > 0) Some(reconstruct()) else None
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        // standalone markers (TEM, stray RSTn): length-less — skip
        pos = mp + 1
      } else {
        if (mp + 3 > b.length) return None
        val len = u16(mp + 1)
        if (len < 2) return None
        val seg = mp + 3
        marker match {
          case 0xdb => // DQT, possibly several tables
            var o = seg
            while (o < seg + len - 2) {
              val pq = (b(o) & 0xff) >> 4
              val tq = b(o) & 0x0f
              if (pq != 0) return None // 16-bit tables unsupported
              quant(tq) = Array.tabulate(64)(i => b(o + 1 + i) & 0xff)
              o += 65
            }
          case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive Huffman
            if (nc > 0) return None // second frame
            progressive = marker == 0xc2
            height = u16(seg + 1); width = u16(seg + 3)
            nc = b(seg + 5) & 0xff
            if ((b(seg) & 0xff) != 8 || (nc != 1 && nc != 3)) return None
            if (width <= 0 || height <= 0 ||
              width.toLong * height > (1L << 26)) return None
            compId = new Array[Int](nc)
            compQ = new Array[Int](nc)
            compH = new Array[Int](nc)
            compV = new Array[Int](nc)
            for (c <- 0 until nc) {
              compId(c) = b(seg + 6 + 3 * c) & 0xff
              val hv = b(seg + 7 + 3 * c) & 0xff
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4)
                return None
              compQ(c) = b(seg + 8 + 3 * c) & 0xff
            }
            if (nc == 1) { compH(0) = 1; compV(0) = 1 } // non-interleaved
            // replication upsampling needs each factor to divide the max
            if ((0 until nc).exists(c =>
                compH.max % compH(c) != 0 || compV.max % compV(c) != 0))
              return None
            val hMax = compH.max; val vMax = compV.max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            bxn = Array.tabulate(nc)(c => mcusX * compH(c))
            byn = Array.tabulate(nc)(c => mcusY * compV(c))
            coefs = Array.tabulate(nc)(c => new Array[Int](bxn(c) * byn(c) * 64))
          case 0xc1 | 0xc3 | 0xc9 | 0xca | 0xcb =>
            return None // non-baseline/non-progressive-Huffman SOF
          case 0xc4 => // DHT, possibly several tables
            var o = seg
            while (o < seg + len - 2) {
              val tc = (b(o) & 0xff) >> 4
              val th = b(o) & 0x0f
              val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(i => b(o + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              o += 17 + nv
            }
          case 0xdd => // DRI (B.2.4.4)
            if (len != 4) return None
            dri = u16(seg)
          case 0xda => // SOS
            val ns = b(seg) & 0xff
            if (nc == 0 || ns < 1 || ns > nc) return None
            val scanC = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            for (si <- 0 until ns) {
              val cid = b(seg + 1 + 2 * si) & 0xff
              val ci = compId.indexOf(cid)
              if (ci < 0) return None
              scanC(si) = ci
              scanDc(si) = (b(seg + 2 + 2 * si) & 0xff) >> 4
              scanAc(si) = b(seg + 2 + 2 * si) & 0x0f
            }
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val (ah, al) = (ahal >> 4, ahal & 0x0f)
            if (progressive) {
              // G.1.1.1.1: DC scans are Ss=Se=0 (interleave allowed);
              // AC scans are a single component with 1 <= Ss <= Se <= 63
              if (ss == 0 && se != 0) return None
              if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
              if (al > 13 || ah > 13) return None
            } else if (ss != 0 || se != 63 || ah != 0 || al != 0) return None
            val next = decodeScan(seg + len - 2, scanC, scanDc, scanAc, ss, se, ah, al)
            anyScan = true
            // baseline with every component in the scan is complete here
            // (no EOI required — the pre-progressive contract)
            if (!progressive && ns == nc) return Some(reconstruct())
            pos = next
          case _ => () // APPn, COM, others: skip
        }
        if (marker != 0xda) pos = seg + len - 2
      }
    }
    None
  } catch { case _: Exception => None } // corrupt assets skip, never fail

  /** WHY a sniffed-but-undecodable JPEG dropped — the honest tag the
    * corpus coverage audit reports next to `sniffed` instead of a
    * silent None (a real-corpus audit must say whether coverage is
    * partial because of a scoped-out coding form or because the bytes
    * are damaged). A cheap second marker walk, independent of the
    * decoder: arithmetic-coded SOFs (SOF9–11/13–15) and the DAC
    * conditioning segment tag `jpeg_arithmetic`; a Huffman SOF whose
    * sample precision is not 8 tags `jpeg_12bit`; a DQT table in the
    * 16-bit form tags `jpeg_16bit_quant`; anything else that still
    * failed the decoder — truncation, bad entropy data, malformed
    * segments — tags `corrupt`. */
  def dropReason(b: Array[Byte]): String = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return "corrupt"
    var at = 2
    while (at + 4 <= b.length) {
      if ((b(at) & 0xff) != 0xff) return "corrupt"
      val marker = b(at + 1) & 0xff
      val len = ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
      if (len < 2) return "corrupt"
      marker match {
        case m if (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) ||
          m == 0xcc => return "jpeg_arithmetic"
        case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 =>
          if (at + 4 < b.length && (b(at + 4) & 0xff) != 8)
            return "jpeg_12bit"
        case 0xdb =>
          var o = at + 4
          while (o < at + 2 + len && o < b.length) {
            if (((b(o) & 0xff) >> 4) != 0) return "jpeg_16bit_quant"
            o += 65
          }
        case 0xda => return "corrupt" // supported structure up to the
        // entropy data: the failure is damage, not a scoped-out form
        case _ => ()
      }
      at += 2 + len
    }
    "corrupt"
  } catch { case _: Exception => "corrupt" }
}
