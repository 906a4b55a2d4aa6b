package graft.multimodal

/** WebP LOSSLESS (VP8L) — encoder + decoder for the largest web-image
  * class that previously only sniffed, never decoded
  * (reference corpus shape: `/root/reference/playground.py` ships
  * mixed-media assets; the census q311 counts WebP shells).
  *
  * Implements the published VP8L bitstream (RFC 9649 / the WebP
  * Lossless Bitstream Specification): LSB-first bit packing, canonical
  * prefix codes in BOTH header forms (the simple 1/2-symbol form and
  * the full code-length-coded form with 16/17/18 repeat codes over the
  * 19-symbol reordered code-length alphabet), meta prefix-code groups
  * via an entropy image, LZ77 backward references with the prefix
  * length/distance scheme, and ALL FOUR inverse transforms —
  * PREDICTOR (14 modes, block-scoped subresolution mode image), COLOR
  * (cross-color delta elements), SUBTRACT_GREEN, and COLOR_INDEXING
  * (delta-coded palette incl. sub-byte pixel bundling at palette ≤ 16).
  *
  * Round 15 closed the color-cache scope-out: cache_bits ∈ 1..11
  * decode (zero-initialized 1 << cache_bits slots, the 0x1e35a7bd
  * multiplicative key, every written pixel inserted, green symbols
  * ≥ 280 reading slots) plus a cache-emitting encoder class
  * ([[encodeCachedAsset]]) — real cwebp output uses the cache
  * routinely, so without it a real corpus partially downgrades to
  * sniffed in the coverage audit. Round 16 closed the 2D
  * short-distance scope-out: distance codes 1..120 resolve through
  * the spec's 120-entry plane-code table ([[kCodeToPlane]],
  * yoffset·width + xoffset against the coded width) plus a
  * 2D-emitting encoder class ([[encode2dAsset]]) — cwebp emits these
  * near-ubiquitously for photographic content. Lossy VP8 stays
  * sniff-only ([[Codecs.sniff]]).
  *
  * Everything is exact integer arithmetic — mod-256 channel math,
  * arithmetic-shift color deltas — so decoded pixels restate from id
  * arithmetic in the oracle (the q302 payload-gate discipline). */
object Vp8l {

  // ------------------------------------------------------------------
  // LSB-first bit IO (the VP8L packing: value bits enter low-bit-first;
  // prefix CODES are walked root-first, i.e. written MSB-of-code first)
  // ------------------------------------------------------------------

  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >> i) & 1L).toInt << nBits)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** A canonical prefix code: MSB first (the tree-walk order). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      val out = if (nBits > 0) buf.toArray :+ cur.toByte else buf.toArray
      out
    }
  }

  final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    private var bad = false
    def failed: Boolean = bad
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bp = pos + i
        if (bp >= b.length * 8) { bad = true; return 0 }
        v |= (((b(bp >> 3) >> (bp & 7)) & 1) << i)
        i += 1
      }
      pos += n
      v
    }
    def readBit(): Int = readBits(1)
  }

  // ------------------------------------------------------------------
  // Canonical prefix codes
  // ------------------------------------------------------------------

  /** DEFLATE-style canonical assignment: shorter codes first, ties by
    * symbol order. Returns (symbol → (code, len)) for nonzero lens. */
  def canonicalCodes(lens: Array[Int]): Map[Int, (Int, Int)] = {
    val maxLen = if (lens.isEmpty) 0 else lens.max
    if (maxLen == 0) return Map.empty
    val blCount = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
    }
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (s <- lens.indices if lens(s) > 0) {
      out(s) = (nextCode(lens(s)), lens(s))
      nextCode(lens(s)) += 1
    }
    out.toMap
  }

  /** A decodable prefix code: either a zero-bit single-symbol code (the
    * simple form's 1-symbol case) or a canonical (len, code) → symbol
    * walk. Decoding uses the canonical first-code/offset arrays — per
    * canonical construction the codes of length l are consecutive from
    * the DEFLATE `nextCode(l)` in symbol order, so membership is one
    * range check and the symbol one array index per length step. This
    * accepts and returns EXACTLY the (len, code) → symbol pairs the
    * former Map held (bit-identical decode); it just drops the per-bit
    * tuple allocation + hash lookup that dominated the q325/q347/q354
    * decode profiles. */
  final class PrefixCode(lens: Array[Int], single: Int = -1) {
    private val maxLen = if (single >= 0) 0 else lens.foldLeft(0)(math.max)
    // firstCode(l) = canonical code of the first symbol of length l;
    // firstIdx(l) = its position in the (len, code)-sorted symbol list;
    // count(l) = how many symbols have length l; syms = that list.
    private val count = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 1)
    private val firstIdx = new Array[Int](maxLen + 1)
    private val syms: Array[Int] = if (single >= 0) Array.empty else {
      var s = 0
      while (s < lens.length) {
        if (lens(s) > 0) count(lens(s)) += 1
        s += 1
      }
      var code = 0
      var idx = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + count(l - 1)) << 1
        firstCode(l) = code
        firstIdx(l) = idx
        idx += count(l)
        l += 1
      }
      val out = new Array[Int](idx)
      val next = firstIdx.clone()
      s = 0
      while (s < lens.length) {
        if (lens(s) > 0) { out(next(lens(s))) = s; next(lens(s)) += 1 }
        s += 1
      }
      out
    }
    def decode(r: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | r.readBit()
        len += 1
        val off = code - firstCode(len)
        if (off >= 0 && off < count(len)) return syms(firstIdx(len) + off)
      }
      -1 // not a valid code — caller surfaces None
    }
  }

  /** The spec's reordered code-length alphabet. */
  val kCodeLengthCodeOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code header (simple or code-length-coded form) for
    * an alphabet of `alphabetSize`. Returns None on malformed input. */
  def readPrefixCode(r: BitReader, alphabetSize: Int): Option[PrefixCode] = {
    if (r.readBit() == 1) {
      // simple form
      val numSymbols = r.readBits(1) + 1
      val first8 = r.readBit()
      val s0 = r.readBits(if (first8 == 1) 8 else 1)
      if (numSymbols == 1) {
        if (r.failed || s0 >= alphabetSize) None
        else Some(new PrefixCode(Array.empty, single = s0))
      } else {
        val s1 = r.readBits(8)
        if (r.failed || s0 >= alphabetSize || s1 >= alphabetSize || s0 == s1) None
        else {
          val lens = new Array[Int](alphabetSize)
          lens(s0) = 1; lens(s1) = 1
          Some(new PrefixCode(lens))
        }
      }
    } else {
      val numCodeLengths = 4 + r.readBits(4)
      if (numCodeLengths > kCodeLengthCodeOrder.length) return None
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) {
        clLens(kCodeLengthCodeOrder(i)) = r.readBits(3)
        i += 1
      }
      if (r.failed) return None
      val clCode = new PrefixCode(clLens)
      // optional symbol-count bound
      var maxSymbol =
        if (r.readBit() == 1) {
          val lengthNBits = 2 + 2 * r.readBits(3)
          2 + r.readBits(lengthNBits)
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.decode(r)
        if (r.failed || cl < 0 || cl > 18) return None
        if (cl < 16) {
          lens(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, fillLen) = cl match {
            case 16 => (3 + r.readBits(2), prevLen)
            case 17 => (3 + r.readBits(3), 0)
            case _  => (11 + r.readBits(7), 0)
          }
          if (symbol + repeat > alphabetSize) return None
          var j = 0
          while (j < repeat) { lens(symbol) = fillLen; symbol += 1; j += 1 }
        }
      }
      if (r.failed) None else Some(new PrefixCode(lens))
    }
  }

  // ------------------------------------------------------------------
  // LZ77 prefix length/distance scheme (shared by both directions)
  // ------------------------------------------------------------------

  /** Decode a prefix-coded LZ77 value from its code index: codes 0–3
    * are the values 1–4; above that, (code−2)>>1 extra bits. */
  def readLz77Value(r: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.readBits(extra) + 1
    }

  /** The 120 TWO-DIMENSIONAL short-distance codes (WebP Lossless
    * Bitstream Specification §"Distance Mapping" / libwebp
    * `kCodeToPlane`): distance codes 1..120 name a near pixel by
    * (xoffset, yoffset) rather than a scan-line distance. Each byte
    * packs (yoffset << 4) | (8 - xoffset); the decoded distance is
    * yoffset·width + xoffset, clamped to ≥ 1. The set is exactly
    * {(x, 0) : 1 ≤ x ≤ 8} ∪ {(x, y) : 1 ≤ y ≤ 7, −7 ≤ x ≤ 8}
    * (8 + 7·16 = 120 — spec-test-locked), ordered by closeness. */
  private[graft] val kCodeToPlane: Array[Int] = Array(
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70)

  /** Resolve a decoded distance code against the coded width: codes
    * 1..120 are the 2D plane codes above; larger codes are the direct
    * scan-line distance + 120. */
  private[graft] def planeCodeToDistance(width: Int, distCode: Int): Int =
    if (distCode > 120) distCode - 120
    else {
      val p = kCodeToPlane(distCode - 1)
      val d = (p >> 4) * width + (8 - (p & 0xf))
      if (d >= 1) d else 1
    }

  /** The distance code for a 2D (xoffset, yoffset) pair, if the pair is
    * one of the 120 mapped neighbors (the encoder-side inverse). */
  private[graft] def planeCodeOf(xo: Int, yo: Int): Option[Int] = {
    if (yo < 0 || yo > 7 || xo < -7 || xo > 8) return None
    val packed = (yo << 4) | (8 - xo)
    val i = kCodeToPlane.indexOf(packed)
    if (i < 0) None else Some(i + 1)
  }

  /** (code, extraBits, nExtraBits) for an LZ77 value ≥ 1. */
  def lz77Code(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      val x = v - 1
      val msb = 31 - Integer.numberOfLeadingZeros(x)
      val code = 2 * msb + ((x >> (msb - 1)) & 1)
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      (code, v - 1 - offset, extra)
    }
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  final case class Argb(a: Int, r: Int, g: Int, b: Int) {
    def packed: Int = (a << 24) | (r << 16) | (g << 8) | b
  }

  private def subSize(s: Int, bits: Int): Int = (s + (1 << bits) - 1) >> bits

  /** Decode one spatially-coded image (no transforms): the shared core
    * for entropy images, transform images, palettes, and the main
    * image. `allowMeta` only for the level-0 ARGB image. Pixels are
    * packed ARGB ints. None on any malformed structure. */
  private[multimodal] def decodeImage(
      r: BitReader,
      w: Int,
      h: Int,
      allowMeta: Boolean): Option[Array[Int]] = {
    // color cache (spec §5.2.2): cache_bits ∈ 1..11, 1 << cache_bits
    // zero-initialized slots; EVERY pixel written to the image inserts
    // at slot (0x1e35a7bd·argb) >>> (32 − cache_bits), and green
    // symbols ≥ 280 read a slot. One cache per spatially-coded image,
    // shared across meta groups.
    var cacheBits = 0
    var cache: Array[Int] = null
    if (r.readBit() == 1) {
      cacheBits = r.readBits(4)
      if (cacheBits < 1 || cacheBits > 11) return None
      cache = new Array[Int](1 << cacheBits)
    }
    var metaBits = 0
    var metaImage: Array[Int] = null
    var nGroups = 1
    if (allowMeta && r.readBit() == 1) {
      metaBits = 2 + r.readBits(3)
      val mw = subSize(w, metaBits)
      val mh = subSize(h, metaBits)
      metaImage = decodeImage(r, mw, mh, allowMeta = false).getOrElse(return None)
      nGroups = metaImage.map(p => ((p >> 8) & 0xffff) + 1).foldLeft(1)(math.max)
    }
    val cacheSize = if (cache == null) 0 else 1 << cacheBits
    val groups = (0 until nGroups).map { _ =>
      val green = readPrefixCode(r, 256 + 24 + cacheSize).getOrElse(return None)
      val red = readPrefixCode(r, 256).getOrElse(return None)
      val blue = readPrefixCode(r, 256).getOrElse(return None)
      val alpha = readPrefixCode(r, 256).getOrElse(return None)
      val dist = readPrefixCode(r, 40).getOrElse(return None)
      (green, red, blue, alpha, dist)
    }
    val n = w * h
    val out = new Array[Int](n)
    def insert(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    while (pos < n) {
      val gi =
        if (metaImage == null) 0
        else {
          val x = pos % w
          val y = pos / w
          val mp = metaImage(
            (y >> metaBits) * subSize(w, metaBits) + (x >> metaBits))
          (mp >> 8) & 0xffff
        }
      val (gc, rc, bc, ac, dc) = groups(gi)
      val s = gc.decode(r)
      if (r.failed || s < 0) return None
      if (s < 256) {
        val red = rc.decode(r)
        val blue = bc.decode(r)
        val alpha = ac.decode(r)
        if (r.failed || red < 0 || blue < 0 || alpha < 0) return None
        out(pos) = (alpha << 24) | (red << 16) | (s << 8) | blue
        insert(out(pos))
        pos += 1
      } else if (s >= 256 + 24) {
        // color-cache reference: the slot's current pixel verbatim
        // (re-inserting it is the identity — the key is a pure function
        // of the pixel)
        if (cache == null || s - 280 >= cacheSize) return None
        out(pos) = cache(s - 280)
        pos += 1
      } else {
        // backward reference
        val length = readLz77Value(r, s - 256)
        val distSym = dc.decode(r)
        if (r.failed || distSym < 0) return None
        val distCode = readLz77Value(r, distSym)
        if (distCode <= 0) return None
        // codes 1..120 are the 2D neighbor offsets (resolved against
        // the CODED width — the same raster LZ77 walks); above that,
        // the direct scan-line distance + 120
        val dist = planeCodeToDistance(w, distCode)
        if (dist <= 0 || dist > pos || pos + length > n) return None
        var j = 0
        while (j < length) {
          out(pos + j) = out(pos + j - dist)
          insert(out(pos + j))
          j += 1
        }
        pos += length
      }
    }
    if (r.failed) None else Some(out)
  }

  // inverse transform helpers --------------------------------------

  private def avg2(x: Int, y: Int): Int = {
    // per-channel (a+b)/2, all four channels in the packed word
    (((x ^ y) & 0xfefefefe) >>> 1) + (x & y)
  }

  private def clamp255(v: Int): Int = math.max(0, math.min(255, v))

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val c = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      out |= c << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      val c = clamp255(a + (a - b) / 2)
      out |= c << sh
      sh += 8
    }
    out
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pl = 0
    var pt = 0
    var sh = 0
    while (sh < 32) {
      val lc = (l >>> sh) & 0xff
      val tc = (t >>> sh) & 0xff
      val tlc = (tl >>> sh) & 0xff
      val p = lc + tc - tlc
      pl += math.abs(p - lc)
      pt += math.abs(p - tc)
      sh += 8
    }
    if (pt <= pl) t else l
  }

  /** The 14 spatial predictors (packed-ARGB in, packed-ARGB out). */
  def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int = mode match {
    case 0  => 0xff000000
    case 1  => l
    case 2  => t
    case 3  => tr
    case 4  => tl
    case 5  => avg2(avg2(l, tr), t)
    case 6  => avg2(l, tl)
    case 7  => avg2(l, t)
    case 8  => avg2(tl, t)
    case 9  => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(avg2(l, t), tl)
    case _  => 0xff000000
  }

  /** Per-channel mod-256 add of prediction + residual. */
  private def addPixels(p: Int, residual: Int): Int = {
    val ag = ((p & 0xff00ff00) >>> 8) + ((residual & 0xff00ff00) >>> 8)
    val rb = (p & 0x00ff00ff) + (residual & 0x00ff00ff)
    ((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff)
  }

  /** Signed cross-color delta: (int8(t) * int8(c)) >> 5. */
  def colorDelta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5) & 0xff

  private final case class Transform(kind: Int, bits: Int, data: Array[Int], size: Int)

  /** Decode a RIFF/WEBP-wrapped VP8L stream. Returns (width, height,
    * ARGB pixels, applied-transform tags in inverse-application
    * order). */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int], Seq[String])] = {
    val payload = vp8lChunk(bytes).getOrElse(return None)
    if (payload.length < 5 || (payload(0) & 0xff) != 0x2f) return None
    val r = new BitReader(payload.drop(1))
    val w = r.readBits(14) + 1
    val h = r.readBits(14) + 1
    r.readBits(1) // alpha hint
    if (r.readBits(3) != 0) return None // version must be 0
    // transforms (level 0 only); COLOR_INDEXING shrinks the coded width
    var codedW = w
    val transforms = scala.collection.mutable.ArrayBuffer[Transform]()
    val seen = scala.collection.mutable.Set[Int]()
    while (r.readBit() == 1) {
      if (r.failed || transforms.length == 4) return None
      val kind = r.readBits(2)
      if (seen.contains(kind)) return None
      seen += kind
      kind match {
        case 0 | 1 => // PREDICTOR / COLOR: block bits + subres image
          val bits = 2 + r.readBits(3)
          val sw = subSize(codedW, bits)
          val sh = subSize(h, bits)
          val img = decodeImage(r, sw, sh, allowMeta = false).getOrElse(return None)
          transforms += Transform(kind, bits, img, 0)
        case 2 => // SUBTRACT_GREEN
          transforms += Transform(2, 0, null, 0)
        case _ => // COLOR_INDEXING
          val paletteSize = 1 + r.readBits(8)
          val raw = decodeImage(r, paletteSize, 1, allowMeta = false)
            .getOrElse(return None)
          // palette entries are delta-coded per channel vs the previous
          val pal = new Array[Int](paletteSize)
          var acc = 0
          var i = 0
          while (i < paletteSize) {
            acc = addPixels(acc, raw(i))
            pal(i) = acc
            i += 1
          }
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          codedW = subSize(codedW, widthBits)
          transforms += Transform(3, widthBits, pal, paletteSize)
      }
    }
    if (r.failed) return None
    var pix = decodeImage(r, codedW, h, allowMeta = true).getOrElse(return None)
    var curW = codedW
    val tags = scala.collection.mutable.ArrayBuffer[String]()
    // inverse transforms, in reverse read order
    for (tf <- transforms.reverseIterator) tf.kind match {
      case 3 =>
        val widthBits = tf.bits
        val out = new Array[Int](w * h)
        val perByte = 1 << widthBits // pixels packed per coded green byte
        val idxBits = 8 >> widthBits // bits per palette index
        val mask = (1 << idxBits) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val packed = pix(y * curW + (if (widthBits > 0) x / perByte else x))
            val green = (packed >> 8) & 0xff
            val idx =
              if (widthBits == 0) green
              else (green >> (idxBits * (x % perByte))) & mask
            if (idx >= tf.size) return None
            out(y * w + x) = tf.data(idx)
            x += 1
          }
          y += 1
        }
        pix = out
        curW = w
        tags += "palette"
      case 2 =>
        var i = 0
        while (i < pix.length) {
          val p = pix(i)
          val g = (p >> 8) & 0xff
          val red = (((p >> 16) & 0xff) + g) & 0xff
          val blue = ((p & 0xff) + g) & 0xff
          pix(i) = (p & 0xff00ff00) | (red << 16) | blue
          i += 1
        }
        tags += "subtract_green"
      case 1 =>
        val sw = subSize(curW, tf.bits)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < curW) {
            val e = tf.data((y >> tf.bits) * sw + (x >> tf.bits))
            val g2r = e & 0xff
            val g2b = (e >> 8) & 0xff
            val r2b = (e >> 16) & 0xff
            val p = pix(y * curW + x)
            val g = (p >> 8) & 0xff
            val red = (((p >> 16) & 0xff) + colorDelta(g2r, g)) & 0xff
            val blue =
              ((p & 0xff) + colorDelta(g2b, g) + colorDelta(r2b, red)) & 0xff
            pix(y * curW + x) = (p & 0xff00ff00) | (red << 16) | blue
            x += 1
          }
          y += 1
        }
        tags += "color"
      case 0 =>
        val sw = subSize(curW, tf.bits)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < curW) {
            val i = y * curW + x
            val pred =
              if (x == 0 && y == 0) 0xff000000
              else if (y == 0) pix(i - 1) // top row: left
              else if (x == 0) pix(i - curW) // left column: top
              else {
                val mode = (tf.data((y >> tf.bits) * sw + (x >> tf.bits)) >> 8) & 0xff
                if (mode > 13) return None
                val l = pix(i - 1)
                val t = pix(i - curW)
                val tl = pix(i - curW - 1)
                // linear-buffer top-right: at the row end this is the
                // current row's first pixel (already reconstructed)
                val tr = if (x == curW - 1) pix(y * curW) else pix(i - curW + 1)
                predict(mode, l, t, tr, tl)
              }
            pix(i) = addPixels(pred, pix(i))
            x += 1
          }
          y += 1
        }
        tags += "predictor"
    }
    if (curW != w) return None
    Some((w, h, pix, if (tags.isEmpty) Seq("none") else tags.toSeq))
  }

  // ------------------------------------------------------------------
  // Encoder — the synthesis side of the oracle gate. Emits valid VP8L
  // streams exercising every decode path above: both prefix-code
  // header forms (incl. 16/18 repeat codes), meta groups, LZ77 row
  // copies with direct distances, and all four transforms.
  // ------------------------------------------------------------------

  /** 256 literals at 8 bits — the complete flat code for a 256-symbol
    * alphabet, emitted in the code-length-coded form with repeat-16
    * runs (cl-code: {8→1 bit, 16→1 bit}). */
  private def writeFlat256Header(bw: BitWriter): Unit = {
    bw.writeBits(0, 1) // not simple
    bw.writeBits(12 - 4, 4) // entries through kOrder index of symbol 8
    val clLens = new Array[Int](19)
    clLens(8) = 1; clLens(16) = 1
    for (i <- 0 until 12)
      bw.writeBits(clLens(kCodeLengthCodeOrder(i)), 3)
    bw.writeBits(0, 1) // no max-symbol bound
    val cl = canonicalCodes(clLens)
    def sym(s: Int): Unit = { val (c, l) = cl(s); bw.writeCode(c, l) }
    sym(8)
    for (_ <- 0 until 42) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(16); bw.writeBits(3 - 3, 2) // 1 + 42*6 + 3 = 256
  }

  private val flat256Lens: Array[Int] = Array.fill(256)(8)

  /** Green alphabet (280 = 256 literals + 24 length codes), all 256
    * literals at 8 bits, length codes unused — trailing zeros via a
    * repeat-18 run (cl-code: {8→1, 16→2, 18→2}). */
  private def writeFlatGreenHeader(bw: BitWriter): Unit = {
    bw.writeBits(0, 1)
    bw.writeBits(12 - 4, 4)
    val clLens = new Array[Int](19)
    clLens(8) = 1; clLens(16) = 2; clLens(18) = 2
    for (i <- 0 until 12)
      bw.writeBits(clLens(kCodeLengthCodeOrder(i)), 3)
    bw.writeBits(0, 1)
    val cl = canonicalCodes(clLens)
    def sym(s: Int): Unit = { val (c, l) = cl(s); bw.writeCode(c, l) }
    sym(8)
    for (_ <- 0 until 42) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(16); bw.writeBits(3 - 3, 2)
    sym(18); bw.writeBits(24 - 11, 7) // 24 zero lengths for 256..279
  }

  private val flatGreenLens: Array[Int] =
    Array.fill(256)(8) ++ Array.fill(24)(0)

  /** Green alphabet with the LENGTH codes live: literals 0..231 at 8
    * bits, 232..255 plus all 24 length codes at 9 bits — a complete
    * code (232/256 + 48/512 = 1) that lets a stream emit LZ77 refs. */
  private def writeMixedGreenHeader(bw: BitWriter): Unit = {
    bw.writeBits(0, 1)
    bw.writeBits(13 - 4, 4) // through kOrder index of symbol 9
    val clLens = new Array[Int](19)
    clLens(8) = 2; clLens(9) = 2; clLens(16) = 1
    for (i <- 0 until 13)
      bw.writeBits(clLens(kCodeLengthCodeOrder(i)), 3)
    bw.writeBits(0, 1)
    val cl = canonicalCodes(clLens)
    def sym(s: Int): Unit = { val (c, l) = cl(s); bw.writeCode(c, l) }
    sym(8)
    for (_ <- 0 until 38) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(16); bw.writeBits(3 - 3, 2) // 1 + 38*6 + 3 = 232 eights
    sym(9)
    for (_ <- 0 until 7) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(16); bw.writeBits(5 - 3, 2) // 1 + 7*6 + 5 = 48 nines
  }

  private val mixedGreenLens: Array[Int] =
    Array.fill(232)(8) ++ Array.fill(48)(9)

  /** Simple-form single-symbol code (zero bits per decoded symbol). */
  private def writeSimple1(bw: BitWriter, sym: Int): Unit = {
    bw.writeBits(1, 1) // simple
    bw.writeBits(0, 1) // one symbol
    if (sym < 2) { bw.writeBits(0, 1); bw.writeBits(sym, 1) }
    else { bw.writeBits(1, 1); bw.writeBits(sym, 8) }
  }

  /** Green alphabet WITH 32 color-cache symbols (cache_bits = 5):
    * literals 0..223 at 8 bits, 224..255 at 9, length codes unused
    * (24 zeros via repeat-18), cache symbols 280..311 at 9 — complete
    * (224/256 + 64/512 = 1). The repeat-16 after the 18-run legally
    * copies the last NON-ZERO length (9), the prevLen rule the decoder
    * implements. */
  private def writeCachedGreenHeader(bw: BitWriter): Unit = {
    bw.writeBits(0, 1)
    bw.writeBits(13 - 4, 4) // through kOrder index of symbol 9
    val clLens = new Array[Int](19)
    clLens(8) = 2; clLens(9) = 3; clLens(16) = 1; clLens(18) = 3
    for (i <- 0 until 13)
      bw.writeBits(clLens(kCodeLengthCodeOrder(i)), 3)
    bw.writeBits(0, 1)
    val cl = canonicalCodes(clLens)
    def sym(s: Int): Unit = { val (c, l) = cl(s); bw.writeCode(c, l) }
    sym(8)
    for (_ <- 0 until 37) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(8) // 1 + 37*6 + 1 = 224 eights
    sym(9)
    for (_ <- 0 until 5) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(9) // 1 + 5*6 + 1 = 32 nines (literals 224..255)
    sym(18); bw.writeBits(24 - 11, 7) // 24 zero lengths for 256..279
    for (_ <- 0 until 5) { sym(16); bw.writeBits(6 - 3, 2) }
    sym(9); sym(9) // 5*6 + 2 = 32 nines (cache symbols 280..311)
  }

  private val cachedGreenLens: Array[Int] =
    Array.fill(224)(8) ++ Array.fill(32)(9) ++
      Array.fill(24)(0) ++ Array.fill(32)(9)

  private final case class Codebook(
      green: Map[Int, (Int, Int)],
      rb: Map[Int, (Int, Int)],
      alphaSym: Int)

  /** Write the five prefix-code headers for one group: `green` flat or
    * mixed, red/blue flat, alpha and distance simple. Returns the
    * encoder-side codebook. */
  private def writeGroupHeaders(
      bw: BitWriter,
      mixedGreen: Boolean,
      alphaSym: Int,
      distSym: Int): Codebook = {
    if (mixedGreen) writeMixedGreenHeader(bw) else writeFlatGreenHeader(bw)
    writeFlat256Header(bw) // red
    writeFlat256Header(bw) // blue
    writeSimple1(bw, alphaSym)
    writeSimple1(bw, distSym)
    Codebook(
      canonicalCodes(if (mixedGreen) mixedGreenLens else flatGreenLens),
      canonicalCodes(flat256Lens),
      alphaSym)
  }

  private def writeLiteral(bw: BitWriter, cb: Codebook, argb: Int): Unit = {
    val (gc, gl) = cb.green((argb >> 8) & 0xff)
    bw.writeCode(gc, gl)
    val (rc, rl) = cb.rb((argb >> 16) & 0xff)
    bw.writeCode(rc, rl)
    val (bc, bl) = cb.rb(argb & 0xff)
    bw.writeCode(bc, bl)
    require(((argb >>> 24) & 0xff) == cb.alphaSym,
      "encoder alpha codebook is single-symbol")
    // alpha: simple single-symbol code — zero bits
  }

  /** A sub-image (transform data, entropy image, palette): cache bit
    * + five headers + literals. Alpha varies across sub-images, so it
    * rides a flat code too — here alpha uses the red/blue flat form
    * via a dedicated header. */
  private def writeSubImage(bw: BitWriter, pix: Array[Int]): Unit = {
    bw.writeBits(0, 1) // no color cache
    writeFlatGreenHeader(bw)
    writeFlat256Header(bw) // red
    writeFlat256Header(bw) // blue
    writeFlat256Header(bw) // alpha (full flat — palette deltas vary)
    writeSimple1(bw, 0) // distance, unused
    val green = canonicalCodes(flatGreenLens)
    val flat = canonicalCodes(flat256Lens)
    pix.foreach { p =>
      val (gc, gl) = green((p >> 8) & 0xff); bw.writeCode(gc, gl)
      val (rc, rl) = flat((p >> 16) & 0xff); bw.writeCode(rc, rl)
      val (bc, bl) = flat(p & 0xff); bw.writeCode(bc, bl)
      val (ac, al) = flat((p >>> 24) & 0xff); bw.writeCode(ac, al)
    }
  }

  private def subPixels(a: Int, b: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= ((((a >>> sh) & 0xff) - ((b >>> sh) & 0xff)) & 0xff) << sh
      sh += 8
    }
    out
  }

  /** The deterministic ramp pixel for asset `id` at flat index `q`. */
  def rampPixel(id: Long, q: Long): Int = {
    val r = ((id + 3 * q) % 256).toInt
    val g = ((id + 5 * q) % 256).toInt
    val b = ((id + 7 * q) % 256).toInt
    (255 << 24) | (r << 16) | (g << 8) | b
  }

  /** Encode one synthesized VP8L asset. Class (id % 4):
    *  0 — COLOR transform (4×4 blocks, id-derived delta elements);
    *  1 — SUBTRACT_GREEN, odd rows emitted as LZ77 whole-row copies
    *      (direct distance = 120 + w) under the mixed green code;
    *  2 — COLOR_INDEXING with palette size 2–7 (exercises 1-, 2- and
    *      4-bit pixel bundling);
    *  3 — PREDICTOR transform (4×4 blocks, modes cycling over all 14)
    *      plus META prefix groups (8×8, two groups).
    * Returns the RIFF/WEBP-wrapped stream. */
  def encodeAsset(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383)
    val cls = (id % 4).toInt
    val K = (id % 6 + 2).toInt // palette size for class 2
    def original(x: Int, y: Int): Int = cls match {
      case 1 => rampPixel(id, ((y - y % 2).toLong * w + x))
      case 2 => rampPixel(id, ((y.toLong * w + x) % K))
      case _ => rampPixel(id, (y.toLong * w + x))
    }
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1L, 14)
    bw.writeBits(h - 1L, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    var codedW = w
    cls match {
      case 0 =>
        bw.writeBits(1, 1); bw.writeBits(1, 2) // COLOR
        bw.writeBits(0, 3) // block bits = 2 (4×4)
        val sw = subSize(w, 2); val sh = subSize(h, 2)
        val elems = Array.tabulate(sw * sh) { i =>
          val bx = i % sw; val by = i / sw
          val g2r = ((id + bx) % 16).toInt
          val g2b = ((id + by) % 16).toInt
          val r2b = ((id + bx + by) % 16).toInt
          (255 << 24) | (r2b << 16) | (g2b << 8) | g2r
        }
        writeSubImage(bw, elems) // transform data rides inside the transform
        bw.writeBits(0, 1) // end of transforms
        // main image with the forward color transform applied
        bw.writeBits(0, 1) // no cache
        bw.writeBits(0, 1) // no meta
        val cb = writeGroupHeaders(bw, mixedGreen = false, 255, 0)
        for (y <- 0 until h; x <- 0 until w) {
          val p = original(x, y)
          val e = elems((y >> 2) * sw + (x >> 2))
          val g = (p >> 8) & 0xff
          val r0 = (p >> 16) & 0xff
          val b0 = p & 0xff
          val r1 = (r0 - colorDelta(e & 0xff, g)) & 0xff
          val b1 = (b0 - colorDelta((e >> 8) & 0xff, g) -
            colorDelta((e >> 16) & 0xff, r0)) & 0xff
          writeLiteral(bw, cb, (255 << 24) | (r1 << 16) | (g << 8) | b1)
        }
      case 1 =>
        bw.writeBits(1, 1); bw.writeBits(2, 2) // SUBTRACT_GREEN
        bw.writeBits(0, 1) // end of transforms
        bw.writeBits(0, 1) // no cache
        bw.writeBits(0, 1) // no meta
        val cb = writeGroupHeaders(bw, mixedGreen = true, 255,
          lz77Code(120 + w)._1)
        for (y <- 0 until h) {
          if (y % 2 == 1) {
            // whole-row copy: length w at direct distance w
            val (lc, lext, lbits) = lz77Code(w)
            val (gc, gl) = cb.green(256 + lc)
            bw.writeCode(gc, gl)
            bw.writeBits(lext.toLong, lbits)
            val (_, dext, dbits) = lz77Code(120 + w)
            // distance symbol is the simple zero-bit code; extras follow
            bw.writeBits(dext.toLong, dbits)
          } else for (x <- 0 until w) {
            val p = original(x, y)
            val g = (p >> 8) & 0xff
            val r1 = (((p >> 16) & 0xff) - g) & 0xff
            val b1 = ((p & 0xff) - g) & 0xff
            writeLiteral(bw, cb, (255 << 24) | (r1 << 16) | (g << 8) | b1)
          }
        }
      case 2 =>
        bw.writeBits(1, 1); bw.writeBits(3, 2) // COLOR_INDEXING
        bw.writeBits(K - 1, 8)
        val widthBits = if (K <= 2) 3 else if (K <= 4) 2 else 1
        val perByte = 1 << widthBits
        val idxBits = 8 >> widthBits
        codedW = subSize(w, widthBits)
        val pal = Array.tabulate(K)(k => rampPixel(id, k.toLong))
        val deltas = Array.tabulate(K)(k =>
          if (k == 0) pal(0) else subPixels(pal(k), pal(k - 1)))
        writeSubImage(bw, deltas) // the delta-coded palette image
        bw.writeBits(0, 1) // end of transforms
        bw.writeBits(0, 1) // no cache
        bw.writeBits(0, 1) // no meta
        val cb = writeGroupHeaders(bw, mixedGreen = false, 255, 0)
        for (y <- 0 until h; cx <- 0 until codedW) {
          var packed = 0
          for (s <- 0 until perByte) {
            val x = cx * perByte + s
            if (x < w) packed |= ((y * w + x) % K) << (idxBits * s)
          }
          writeLiteral(bw, cb, (255 << 24) | (packed << 8))
        }
      case _ =>
        bw.writeBits(1, 1); bw.writeBits(0, 2) // PREDICTOR
        bw.writeBits(0, 3) // block bits = 2 (4×4)
        val sw = subSize(w, 2); val sh = subSize(h, 2)
        val modes = Array.tabulate(sw * sh) { i =>
          val bx = i % sw; val by = i / sw
          (255 << 24) | ((((id + bx + by) % 14).toInt) << 8)
        }
        writeSubImage(bw, modes) // the block-mode image
        bw.writeBits(0, 1) // end of transforms
        bw.writeBits(0, 1) // no cache
        // META: two groups over 8×8 blocks
        bw.writeBits(1, 1)
        bw.writeBits(1, 3) // meta bits = 3
        val mw = subSize(w, 3); val mh = subSize(h, 3)
        val meta = Array.tabulate(mw * mh) { i =>
          val bx = i % mw; val by = i / mw
          (255 << 24) | (((bx + by) % 2) << 8) // group in (r<<8)|g
        }
        writeSubImage(bw, meta)
        // the decoder reads max(group)+1 header sets: a single-block
        // meta image (w, h ≤ 8) has only group 0
        val cb0 = writeGroupHeaders(bw, mixedGreen = false, 0, 0)
        val cb1 =
          if (mw * mh > 1) writeGroupHeaders(bw, mixedGreen = true, 0, 0)
          else cb0
        for (y <- 0 until h; x <- 0 until w) {
          val p = original(x, y)
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) original(x - 1, 0)
            else if (x == 0) original(0, y - 1)
            else {
              val mode = (modes((y >> 2) * sw + (x >> 2)) >> 8) & 0xff
              val tr = if (x == w - 1) original(0, y) else original(x + 1, y - 1)
              predict(mode, original(x - 1, y), original(x, y - 1), tr,
                original(x - 1, y - 1))
            }
          val res = subPixels(p, pred)
          val cb = if (((x >> 3) + (y >> 3)) % 2 == 0) cb0 else cb1
          writeLiteral(bw, cb, res)
        }
    }
    riffWebp(bw.result())
  }

  /** Color-CACHE stream (round 15): no transforms, cache_bits = 5,
    * pixels cycling over `nColors` id-derived ramp colors so the stream
    * genuinely alternates literals (which insert) and cache references
    * (green symbols ≥ 280) — including evictions when two colors share
    * a multiplicative-hash slot. The encoder simulates the decoder's
    * exact cache (zero-initialized, insert-on-write), so the round-trip
    * is bit-deterministic and the oracle states the pixels from id
    * arithmetic alone. */
  def encodeCachedAsset(id: Long, w: Int, h: Int, nColors: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && nColors >= 1)
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1L, 14)
    bw.writeBits(h - 1L, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    bw.writeBits(0, 1) // end of transforms (none)
    bw.writeBits(1, 1) // color cache present
    bw.writeBits(5, 4) // cache_bits = 5 (32 slots)
    bw.writeBits(0, 1) // no meta
    writeCachedGreenHeader(bw)
    writeFlat256Header(bw) // red
    writeFlat256Header(bw) // blue
    writeSimple1(bw, 255) // alpha
    writeSimple1(bw, 0) // distance, unused
    val green = canonicalCodes(cachedGreenLens)
    val rb = canonicalCodes(flat256Lens)
    val cache = new Array[Int](32)
    for (y <- 0 until h; x <- 0 until w) {
      val p = rampPixel(id, ((y.toLong * w + x) % nColors))
      val key = (0x1e35a7bd * p) >>> 27
      if (cache(key) == p) {
        val (c, l) = green(280 + key)
        bw.writeCode(c, l)
      } else {
        cache(key) = p
        val (gc, gl) = green((p >> 8) & 0xff)
        bw.writeCode(gc, gl)
        val (rc, rl) = rb((p >> 16) & 0xff)
        bw.writeCode(rc, rl)
        val (bc, bl) = rb(p & 0xff)
        bw.writeCode(bc, bl)
        // alpha 255: simple single-symbol code — zero bits
      }
    }
    riffWebp(bw.result())
  }

  /** TWO-DIMENSIONAL short-distance stream (round 16): no transforms,
    * no cache, backward references through the 120-entry plane-code
    * table — the form real cwebp output emits near-ubiquitously for
    * photographic content. Even ids draw the DIAGONAL ramp
    * (pixel(x, y) = ramp(x + y)) and encode every row after the first
    * as one length-(w−1) copy at plane code (−1, 1) (distance code 4 →
    * distance w−1, a negative x offset); odd ids draw the vertically
    * constant ramp (pixel(x, y) = ramp(x)) and copy whole rows at
    * plane code (0, 1) (distance code 1 → distance w). Degenerate
    * widths/heights fall back to literals. The decoder must resolve
    * the plane codes against the coded width or every copied pixel —
    * and the oracle's id-predicted sum — is wrong. */
  def encode2dAsset(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1)
    val diag = id % 2 == 0
    def original(x: Int, y: Int): Int =
      rampPixel(id, if (diag) (x + y).toLong else x.toLong)
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1L, 14)
    bw.writeBits(h - 1L, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    bw.writeBits(0, 1) // end of transforms (none)
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta
    val distCode2d = if (diag) 4 else 1 // (-1, 1) / (0, 1)
    val copies = h > 1 && (!diag || w > 1)
    val cb = writeGroupHeaders(bw, mixedGreen = copies, 255,
      if (copies) lz77Code(distCode2d)._1 else 0)
    def literalRow(y: Int): Unit =
      for (x <- 0 until w) writeLiteral(bw, cb, original(x, y))
    if (!copies) {
      for (y <- 0 until h) literalRow(y)
    } else {
      literalRow(0)
      for (y <- 1 until h) {
        // diagonal: pixels x = 0..w−2 copy from (x+1, y−1) — one
        // length-(w−1) reference at distance w−1 — and the row's LAST
        // pixel is the fresh diagonal value, a literal (a copy there
        // would wrap to (0, y) in the raster). vertical: the whole row
        // copies the previous one at distance w.
        val copyLen = if (diag) w - 1 else w
        val (lc, lext, lbits) = lz77Code(copyLen)
        val (gc, gl) = cb.green(256 + lc)
        bw.writeCode(gc, gl)
        bw.writeBits(lext.toLong, lbits)
        // distance symbol is the simple zero-bit code; extras follow
        val (_, dext, dbits) = lz77Code(distCode2d)
        bw.writeBits(dext.toLong, dbits)
        if (diag) writeLiteral(bw, cb, original(w - 1, y))
      }
    }
    riffWebp(bw.result())
  }

  /** Wrap a VP8L payload in its RIFF/WEBP container (2-byte-aligned). */
  def riffWebp(payload: Array[Byte]): Array[Byte] = {
    val padded = payload.length + (payload.length & 1)
    val total = 12 + 8 + padded
    val out = new Array[Byte](total)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    var v = (total - 8).toLong
    for (i <- 0 until 4) { out(4 + i) = (v & 0xff).toByte; v >>= 8 }
    "WEBPVP8L".getBytes("US-ASCII").copyToArray(out, 8)
    var s = payload.length.toLong
    for (i <- 0 until 4) { out(16 + i) = (s & 0xff).toByte; s >>= 8 }
    payload.copyToArray(out, 20)
    out
  }

  /** Extract the VP8L chunk payload from a RIFF/WEBP container. */
  def vp8lChunk(b: Array[Byte]): Option[Array[Byte]] = {
    def u32le(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return None
    var at = 12L
    while (at + 8 <= b.length) {
      val tag = new String(b, at.toInt, 4, "US-ASCII")
      val size = u32le(at.toInt + 4)
      if (at + 8 + size > b.length) return None
      if (tag == "VP8L")
        return Some(java.util.Arrays.copyOfRange(b, at.toInt + 8, (at + 8 + size).toInt))
      at += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    None
  }
}
