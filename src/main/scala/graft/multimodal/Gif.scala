package graft.multimodal

/** GIF87a/89a codec — the remaining classic web-image container the
  * census corpus lacked, implemented against the GIF89a specification:
  * logical screen descriptor, global color table, extension-block
  * skipping (a Graphic Control Extension is emitted so the skip path
  * is always exercised), and the REAL LZW image stream — variable code
  * width starting at minCodeSize+1 and growing at each table-fill
  * boundary, clear/EOI codes, the KwKwK (code == next unassigned)
  * case, LSB-first bit packing, 255-byte sub-block framing, and the
  * four-pass row interlace. Both directions are integer-deterministic
  * so decoded pixel sums are id-predictable for the oracle.
  *
  * Palette and index streams are closed-form in (seed, pixel ordinal)
  * — the [[Codecs.encodePngPalette]] discipline — so a wrong LZW
  * growth boundary, sub-block reassembly, deinterlace pass geometry,
  * or palette lookup moves the pinned sums. */
object Gif {

  /** Global-color-table entry `j` — id-independent so the oracle
    * replays it as pure arithmetic. */
  def paletteEntry(j: Int): (Int, Int, Int) =
    ((7 * j + 1) % 256, (11 * j + 2) % 256, (13 * j + 3) % 256)

  /** Pixel ordinal `q`'s palette index for a `k`-entry table. */
  def pixelIndex(seed: Long, q: Int, k: Int): Int =
    (((seed + 3L * q) % k + k) % k).toInt

  final case class GifImage(
      width: Int,
      height: Int,
      paletteBits: Int,
      interlaced: Boolean,
      pixels: Array[Int]) // packed 0xRRGGBB, row-major after deinterlace

  // interlace pass (row origin, row stride) per the GIF89a spec
  private val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** Rows in STORAGE order: identity when sequential, the four-pass
    * schedule when interlaced. */
  private def storageRows(height: Int, interlaced: Boolean): Array[Int] =
    if (!interlaced) Array.range(0, height)
    else passes.flatMap { case (o, s) => o until height by s }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  def encodeGif(
      width: Int,
      height: Int,
      seed: Long,
      paletteBits: Int,
      interlaced: Boolean): Array[Byte] = {
    require(width >= 1 && height >= 1 && paletteBits >= 1 && paletteBits <= 8)
    val k = 1 << paletteBits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | 0x70 | (paletteBits - 1)) // GCT present, 8-bit color res
    out.write(0) // background color index
    out.write(0) // aspect ratio
    var j = 0
    while (j < k) {
      val (r, g, b) = paletteEntry(j)
      out.write(r); out.write(g); out.write(b)
      j += 1
    }
    // Graphic Control Extension — payload irrelevant here; emitted so
    // every decoder exercises the extension-skip path
    out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0))
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(if (interlaced) 0x40 else 0x00)
    // pixel indices in storage order
    val rows = storageRows(height, interlaced)
    val idx = new Array[Int](width * height)
    var p = 0
    for (y <- rows; x <- 0 until width) {
      idx(p) = pixelIndex(seed, y * width + x, k)
      p += 1
    }
    val minCode = math.max(2, paletteBits)
    out.write(minCode)
    val lzw = lzwEncode(idx, minCode)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n)
      out.write(lzw, o, n)
      o += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: emit-then-add, code width grows when the next
    * free slot passes the current width's ceiling (the classic
    * compress pairing the decoder mirrors one step behind). */
  private def lzwEncode(px: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var nBits = minCode + 1
    var nextCode = eoi + 1
    // the classic compress pairing: the growth check runs AFTER each
    // code is written, so the first wider code is the one FOLLOWING the
    // write that saw the table outgrow the current width — the decoder
    // (one table entry behind) grows at exactly that seam
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += nBits
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
      if (nextCode > (1 << nBits) - 1 && nBits < 12) nBits += 1
    }
    val dict = scala.collection.mutable.LongMap.empty[Int]
    put(clear)
    var cur = px(0)
    var i = 1
    while (i < px.length) {
      val key = (cur.toLong << 16) | px(i)
      val hit = dict.getOrElse(key, -1)
      if (hit >= 0) cur = hit
      else {
        put(cur)
        dict.update(key, nextCode)
        nextCode += 1
        if (nextCode == 4096) { // table full: reset (not reached by the
          put(clear); dict.clear() // small oracle assets; kept for spec use)
          nextCode = eoi + 1; nBits = minCode + 1
        }
        cur = px(i)
      }
      i += 1
    }
    put(cur)
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  def decodeGif(b: Array[Byte]): Option[GifImage] = try {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val packed = b(10) & 0xff
    if ((packed & 0x80) == 0) return None // no global color table
    val paletteBits = (packed & 0x07) + 1
    val k = 1 << paletteBits
    val palette = new Array[Int](k)
    var o = 13
    var j = 0
    while (j < k) {
      if (o + 3 > b.length) return None
      palette(j) = ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
      o += 3
      j += 1
    }
    // walk blocks to the first image descriptor, skipping extensions
    var imgAt = -1
    while (imgAt < 0) {
      if (o >= b.length) return None
      (b(o) & 0xff) match {
        case 0x2c => imgAt = o
        case 0x21 => // extension: label + length-prefixed sub-blocks
          o += 2
          while (o < b.length && (b(o) & 0xff) != 0) o += 1 + (b(o) & 0xff)
          o += 1
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    if (imgAt + 10 > b.length) return None
    val width = u16(imgAt + 5)
    val height = u16(imgAt + 7)
    if (width <= 0 || height <= 0 || width.toLong * height > (1L << 26)) return None
    val iPacked = b(imgAt + 9) & 0xff
    if ((iPacked & 0x80) != 0) return None // local color tables: out of scope
    val interlaced = (iPacked & 0x40) != 0
    o = imgAt + 10
    if (o >= b.length) return None
    val minCode = b(o) & 0xff
    if (minCode < 2 || minCode > 11) return None
    o += 1
    // reassemble the LZW stream from its sub-blocks
    val lzw = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (o >= b.length) return None
      val n = b(o) & 0xff
      o += 1
      if (n == 0) done = true
      else {
        if (o + n > b.length) return None
        lzw.write(b, o, n)
        o += n
      }
    }
    val idx = lzwDecode(lzw.toByteArray, minCode, width * height)
      .getOrElse(return None)
    // scatter storage rows back onto the output grid
    val rows = storageRows(height, interlaced)
    val pixels = new Array[Int](width * height)
    var p = 0
    for (y <- rows; x <- 0 until width) {
      val v = idx(p)
      if (v >= k) return None
      pixels(y * width + x) = palette(v)
      p += 1
    }
    Some(GifImage(width, height, paletteBits, interlaced, pixels))
  } catch { case _: Exception => None }

  /** GIF-variant LZW decode: table rebuilt one step behind the
    * encoder, KwKwK case honored, width grows at the same boundaries.
    * None unless exactly `expect` indices decode before EOI. */
  private def lzwDecode(
      data: Array[Byte],
      minCode: Int,
      expect: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var nBits = minCode + 1
    var bitBuf = 0L
    var bitCnt = 0
    var at = 0
    def read(): Int = {
      while (bitCnt < nBits) {
        if (at >= data.length) return -1
        bitBuf |= (data(at) & 0xffL) << bitCnt
        bitCnt += 8
        at += 1
      }
      val v = (bitBuf & ((1L << nBits) - 1)).toInt
      bitBuf >>>= nBits
      bitCnt -= nBits
      v
    }
    val out = new Array[Int](expect)
    var n = 0
    var nextCode = eoi + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    def emitEntry(code: Int, extra: Int): Int = { // returns first index
      // walk the chain into a small stack, then emit in order
      val stack = new Array[Int](4097)
      var top = 0
      var c = code
      while (c >= clear) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      val first = c
      if (n + top + 1 + (if (extra >= 0) 1 else 0) > expect) return -1
      out(n) = first; n += 1
      while (top > 0) { top -= 1; out(n) = stack(top); n += 1 }
      if (extra >= 0) { out(n) = extra; n += 1 }
      first
    }
    var prev = -1
    var stop = false
    while (!stop) {
      val code = read()
      if (code < 0) return None
      if (code == clear) {
        nextCode = eoi + 1
        nBits = minCode + 1
        prev = -1
      } else if (code == eoi) {
        stop = true
      } else if (code < nextCode) { // clear/eoi handled above
        val first = emitEntry(code, -1)
        if (first < 0) return None
        if (prev >= 0 && nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = first
          nextCode += 1
          if (nextCode > (1 << nBits) - 1 && nBits < 12) nBits += 1
        }
        prev = code
      } else if (code == nextCode && prev >= 0 && nextCode < 4096) {
        // KwKwK: the code being defined right now — prev ++ first(prev)
        var c = prev
        while (c >= clear) c = prefix(c)
        val first = c
        prefix(nextCode) = prev
        suffix(nextCode) = first
        nextCode += 1
        val emitted = emitEntry(nextCode - 1, -1)
        if (emitted < 0) return None
        if (nextCode > (1 << nBits) - 1 && nBits < 12) nBits += 1
        prev = nextCode - 1
      } else return None
    }
    if (n != expect) None else Some(out)
  }
}
