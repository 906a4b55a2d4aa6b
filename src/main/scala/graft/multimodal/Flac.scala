package graft.multimodal

/** FLAC subset codec — the lossless audio format real speech/music
  * corpora actually ship in, implemented against the public FLAC
  * format specification (RFC 9639): fLaC marker + STREAMINFO, frames
  * with the 14-bit sync code, UTF-8-coded frame numbers, CRC-8
  * header and CRC-16 frame checksums (both VALIDATED on decode — a
  * corrupted frame must drop the asset, not emit garbage), and the
  * full subframe family: CONSTANT, VERBATIM, FIXED orders 0–2, and
  * LPC at any order (precision 2–15, non-negative shift) with genuine
  * Rice-coded residuals (zigzag fold, unary quotient = q zero bits
  * then a one). Round 15 added stereo decorrelation (all four channel
  * assignments — independent, left/side, right/side, mid/side — the
  * side channel at bps + 1); round 16 closed the residual-coding
  * scope-outs: WASTED BITS (flag + unary k−1, decode at bits − k and
  * shift back — quiet material hits this routinely), both Rice
  * methods (4-bit RICE and 5-bit RICE2), partition orders > 0, and
  * the ESCAPE parameter (unencoded two's-complement residuals at a
  * 5-bit width).
  *
  * Everything is integer-exact both directions, so decoded sample
  * sums are id-predictable: a wrong Rice fold, unary sense, warmup
  * width, fixed-predictor recursion, or CRC rule fails the oracle
  * hash on every asset. */
object Flac {

  // ------------------------------------------------------------------
  // bit I/O (MSB-first, the FLAC convention)
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L)
        nAcc += 1
        if (nAcc == 8) { out.write(acc.toInt & 0xff); acc = 0L; nAcc = 0 }
        i -= 1
      }
    }
    def alignZero(): Unit = if (nAcc > 0) put(0L, 8 - nAcc)
    def toBytes: Array[Byte] = { require(nAcc == 0); out.toByteArray }
  }

  private final class BitReader(b: Array[Byte], var at: Int) {
    private var bit = 0
    def bytePos: Int = at
    def aligned: Boolean = bit == 0
    def skipToByte(): Unit = if (bit != 0) { bit = 0; at += 1 }
    def read(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) {
        if (at >= b.length) throw new IllegalArgumentException("eof")
        v = (v << 1) | ((b(at) >> (7 - bit)) & 1L)
        bit += 1
        if (bit == 8) { bit = 0; at += 1 }
        i += 1
      }
      v
    }
    /** Unary: count zero bits up to the terminating one. */
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0L) {
        q += 1
        if (q > (1 << 20)) throw new IllegalArgumentException("runaway unary")
      }
      q
    }
  }

  // ------------------------------------------------------------------
  // CRCs (FLAC: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0)
  // ------------------------------------------------------------------

  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------------
  // encode (subset: mono, 16-bit, rate 8000, blocksize-code 0110)
  // ------------------------------------------------------------------

  /** One frame's samples as a subframe of the given class:
    * 0 = CONSTANT (samples must all equal), 1 = VERBATIM,
    * 2 = FIXED order 1, 3 = FIXED order 2. */
  def encodeFlac(frames: Seq[(Int, Array[Int])]): Array[Byte] = {
    val total = frames.map(_._2.length.toLong).sum
    val head = new java.io.ByteArrayOutputStream()
    head.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-metadata flag + type 0, length 34
    head.write(0x80); head.write(0); head.write(0); head.write(34)
    val si = new BitWriter
    val maxBs = frames.map(_._2.length).max
    val minBs = frames.map(_._2.length).min
    si.put(minBs.toLong, 16); si.put(maxBs.toLong, 16)
    si.put(0L, 24); si.put(0L, 24) // frame sizes unknown
    si.put(8000L, 20)
    si.put(0L, 3) // channels - 1 (mono)
    si.put(15L, 5) // bps - 1
    si.put(total, 36)
    si.put(0L, 64); si.put(0L, 64) // md5 zeroed (unset)
    head.write(si.toBytes)
    frames.zipWithIndex.foreach { case ((cls, xs), fIdx) =>
      head.write(encodeFrame(cls, xs, fIdx))
    }
    head.toByteArray
  }

  private def zigzag(r: Int): Long = ((r << 1) ^ (r >> 31)).toLong & 0xffffffffL

  private def encodeFrame(cls: Int, xs: Array[Int], fIdx: Int): Array[Byte] = {
    require(xs.nonEmpty && fIdx < 128)
    val w = new BitWriter
    w.put(0x3ffe, 14) // sync
    w.put(0L, 1) // reserved
    w.put(0L, 1) // fixed blocksize stream
    w.put(6L, 4) // blocksize: 8-bit value at end of header
    w.put(4L, 4) // rate: 8 kHz
    w.put(0L, 4) // channels: mono
    w.put(4L, 3) // bps: 16
    w.put(0L, 1) // reserved
    w.put(fIdx.toLong, 8) // UTF-8 frame number (< 128: one byte)
    w.put((xs.length - 1).toLong, 8)
    val headNoCrc = { w.alignZero(); w.toBytes }
    val w2 = new BitWriter
    headNoCrc.foreach(b => w2.put(b.toLong & 0xff, 8))
    w2.put(crc8(headNoCrc, 0, headNoCrc.length).toLong, 8)
    // subframe
    cls match {
      case 0 => // CONSTANT
        w2.put(0L, 1); w2.put(0L, 6); w2.put(0L, 1)
        w2.put(xs(0).toLong & 0xffff, 16)
      case 1 => // VERBATIM
        w2.put(0L, 1); w2.put(1L, 6); w2.put(0L, 1)
        xs.foreach(x => w2.put(x.toLong & 0xffff, 16))
      case o if o == 2 || o == 3 => // FIXED order 1 / 2
        val order = o - 1
        w2.put(0L, 1); w2.put((8 + order).toLong, 6); w2.put(0L, 1)
        (0 until order).foreach(i => w2.put(xs(i).toLong & 0xffff, 16))
        // residual: method 0 (4-bit Rice), partition order 0
        w2.put(0L, 2); w2.put(0L, 4)
        val param = 4
        w2.put(param.toLong, 4)
        var i = order
        while (i < xs.length) {
          val r =
            if (order == 1) xs(i) - xs(i - 1)
            else xs(i) - 2 * xs(i - 1) + xs(i - 2)
          val u = zigzag(r)
          val q = (u >> param).toInt
          var j = 0
          while (j < q) { w2.put(0L, 1); j += 1 }
          w2.put(1L, 1)
          w2.put(u & ((1L << param) - 1), param)
          i += 1
        }
      case 4 => encodeLpc2(w2, xs, 16)
      case other => throw new IllegalArgumentException(s"class $other")
    }
    w2.alignZero()
    val body = w2.toBytes
    val w3 = new BitWriter
    body.foreach(b => w3.put(b.toLong & 0xff, 8))
    w3.put(crc16(body, 0, body.length).toLong, 16)
    w3.toBytes
  }

  // ------------------------------------------------------------------
  // stereo + LPC extension (round 15 — closes the documented scope-out)
  // ------------------------------------------------------------------

  /** Deterministic order-2 LPC subframe: QLP precision 5, shift 2,
    * coefficients (5, -2) — prediction (5·x[i-1] − 2·x[i-2]) >> 2. The
    * round-trip is lossless whatever the coefficients (the residual
    * absorbs the prediction error), so fixed deterministic ones
    * exercise the decoder's published warmup/precision/shift/dot-
    * product path while keeping the oracle an id-arithmetic statement
    * of the INPUT samples. Residual Rice parameter 6 (LPC residuals
    * run larger than the fixed predictors'). */
  private def encodeLpc2(w2: BitWriter, xs: Array[Int], bits: Int): Unit = {
    require(xs.length > 2)
    w2.put(0L, 1); w2.put(33L, 6); w2.put(0L, 1) // LPC order 2
    w2.put(xs(0).toLong & ((1L << bits) - 1), bits)
    w2.put(xs(1).toLong & ((1L << bits) - 1), bits)
    w2.put(4L, 4) // precision - 1 (5-bit coefficients)
    w2.put(2L, 5) // shift
    w2.put(5L, 5) // coef 0 = 5
    w2.put((-2L) & 31L, 5) // coef 1 = -2
    w2.put(0L, 2); w2.put(0L, 4) // Rice method 0, partition order 0
    val param = 6
    w2.put(param.toLong, 4)
    var i = 2
    while (i < xs.length) {
      val pred = ((5L * xs(i - 1) - 2L * xs(i - 2)) >> 2).toInt
      val u = zigzag(xs(i) - pred)
      val q = (u >> param).toInt
      var j = 0
      while (j < q) { w2.put(0L, 1); j += 1 }
      w2.put(1L, 1)
      w2.put(u & ((1L << param) - 1), param)
      i += 1
    }
  }

  /** One subframe of the given class at the channel's effective bit
    * depth (`bits` = 17 on a side channel): the [[encodeFrame]] classes
    * generalized, plus 4 = LPC order 2. */
  private def encodeSubframe(
      w2: BitWriter, cls: Int, xs: Array[Int], bits: Int): Unit = cls match {
    case 0 =>
      require(xs.forall(_ == xs(0)))
      w2.put(0L, 1); w2.put(0L, 6); w2.put(0L, 1)
      w2.put(xs(0).toLong & ((1L << bits) - 1), bits)
    case 1 =>
      w2.put(0L, 1); w2.put(1L, 6); w2.put(0L, 1)
      xs.foreach(x => w2.put(x.toLong & ((1L << bits) - 1), bits))
    case o if o == 2 || o == 3 =>
      val order = o - 1
      w2.put(0L, 1); w2.put((8 + order).toLong, 6); w2.put(0L, 1)
      (0 until order).foreach(i =>
        w2.put(xs(i).toLong & ((1L << bits) - 1), bits))
      w2.put(0L, 2); w2.put(0L, 4)
      val param = 4
      w2.put(param.toLong, 4)
      var i = order
      while (i < xs.length) {
        val r =
          if (order == 1) xs(i) - xs(i - 1)
          else xs(i) - 2 * xs(i - 1) + xs(i - 2)
        val u = zigzag(r)
        val q = (u >> param).toInt
        var j = 0
        while (j < q) { w2.put(0L, 1); j += 1 }
        w2.put(1L, 1)
        w2.put(u & ((1L << param) - 1), param)
        i += 1
      }
    case 4 => encodeLpc2(w2, xs, bits)
    case other => throw new IllegalArgumentException(s"class $other")
  }

  /** A STEREO stream: each frame is (mode, (clsL, L), (clsR, R)) over
    * the channel SIGNALS — mode 0 = independent, 1 = left/side,
    * 2 = right/side, 3 = mid/side (side = L − R, mid = (L + R) >> 1,
    * the side subframe carrying 17 bits). Subframe classes as in
    * [[encodeFlac]] plus 4 = LPC order 2. */
  def encodeFlacStereo(
      frames: Seq[(Int, (Int, Array[Int]), (Int, Array[Int]))]): Array[Byte] = {
    require(frames.nonEmpty)
    val total = frames.map(_._2._2.length.toLong).sum
    val head = new java.io.ByteArrayOutputStream()
    head.write("fLaC".getBytes("US-ASCII"))
    head.write(0x80); head.write(0); head.write(0); head.write(34)
    val si = new BitWriter
    val sizes = frames.map(_._2._2.length)
    si.put(sizes.min.toLong, 16); si.put(sizes.max.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20)
    si.put(1L, 3) // channels - 1 (stereo)
    si.put(15L, 5) // bps - 1
    si.put(total, 36)
    si.put(0L, 64); si.put(0L, 64)
    head.write(si.toBytes)
    frames.zipWithIndex.foreach { case ((mode, (clsL, ls), (clsR, rs)), fIdx) =>
      require(ls.length == rs.length && fIdx < 128)
      val n = ls.length
      val side = Array.tabulate(n)(k => ls(k) - rs(k))
      val (chCode, a, b, bitsA, bitsB) = mode match {
        case 0 => (1L, ls, rs, 16, 16)
        case 1 => (8L, ls, side, 16, 17)
        case 2 => (9L, side, rs, 17, 16)
        case 3 => (10L, Array.tabulate(n)(k => (ls(k) + rs(k)) >> 1),
          side, 16, 17)
        case other => throw new IllegalArgumentException(s"mode $other")
      }
      val w = new BitWriter
      w.put(0x3ffe, 14)
      w.put(0L, 1); w.put(0L, 1)
      w.put(6L, 4) // blocksize: 8-bit at end of header
      w.put(4L, 4) // 8 kHz
      w.put(chCode, 4)
      w.put(4L, 3) // bps 16
      w.put(0L, 1)
      w.put(fIdx.toLong, 8)
      w.put((n - 1).toLong, 8)
      val headNoCrc = { w.alignZero(); w.toBytes }
      val w2 = new BitWriter
      headNoCrc.foreach(x => w2.put(x.toLong & 0xff, 8))
      w2.put(crc8(headNoCrc, 0, headNoCrc.length).toLong, 8)
      encodeSubframe(w2, clsL, a, bitsA)
      encodeSubframe(w2, clsR, b, bitsB)
      w2.alignZero()
      val body = w2.toBytes
      val w3 = new BitWriter
      body.foreach(x => w3.put(x.toLong & 0xff, 8))
      w3.put(crc16(body, 0, body.length).toLong, 16)
      head.write(w3.toBytes)
    }
    head.toByteArray
  }

  // ------------------------------------------------------------------
  // wasted-bits / partition / escape extension (round 16 — closes the
  // residual-coding scope-outs)
  // ------------------------------------------------------------------

  /** Rice-code one residual at `param` into `w2`. */
  private def putRice(w2: BitWriter, res: Int, param: Int): Unit = {
    val u = zigzag(res)
    val q = (u >> param).toInt
    var j = 0
    while (j < q) { w2.put(0L, 1); j += 1 }
    w2.put(1L, 1)
    w2.put(u & ((1L << param) - 1), param)
  }

  /** A MONO 16-bit stream whose frames exercise the residual-coding
    * forms real encoder output hits that the q336/q346 classes do not.
    * Each frame is (cls, k, xs):
    *  5 — FIXED order 1 with k WASTED BITS (every sample must be a
    *      multiple of 2^k; the subframe codes xs >> k at 16−k bits and
    *      the decoder shifts back);
    *  6 — FIXED order 1 at partition order 1 whose SECOND partition is
    *      the 4-bit ESCAPE (param 0b1111): a 5-bit width (9), then
    *      unencoded two's-complement residuals (|residual| ≤ 255);
    *  7 — FIXED order 2 at partition order 2, per-partition Rice
    *      parameters 3 + p (block size divisible by 4, quarter > 2);
    *  8 — FIXED order 1 under residual METHOD 1 (5-bit RICE2 — the
    *      wider-parameter form loud 24-bit material needs), param 4.
    * The round-trip is lossless, so the oracle states the INPUT
    * samples from id arithmetic (the q336 discipline). */
  def encodeFlacExtras(frames: Seq[(Int, Int, Array[Int])]): Array[Byte] = {
    require(frames.nonEmpty)
    val total = frames.map(_._3.length.toLong).sum
    val head = new java.io.ByteArrayOutputStream()
    head.write("fLaC".getBytes("US-ASCII"))
    head.write(0x80); head.write(0); head.write(0); head.write(34)
    val si = new BitWriter
    val sizes = frames.map(_._3.length)
    si.put(sizes.min.toLong, 16); si.put(sizes.max.toLong, 16)
    si.put(0L, 24); si.put(0L, 24)
    si.put(8000L, 20)
    si.put(0L, 3) // mono
    si.put(15L, 5) // bps 16
    si.put(total, 36)
    si.put(0L, 64); si.put(0L, 64)
    head.write(si.toBytes)
    frames.zipWithIndex.foreach { case ((cls, k, xs), fIdx) =>
      require(fIdx < 128 && xs.length >= 2)
      val n = xs.length
      val w = new BitWriter
      w.put(0x3ffe, 14)
      w.put(0L, 1); w.put(0L, 1)
      w.put(6L, 4) // blocksize: 8-bit at end of header
      w.put(4L, 4) // 8 kHz
      w.put(0L, 4) // mono
      w.put(4L, 3) // bps 16
      w.put(0L, 1)
      w.put(fIdx.toLong, 8)
      w.put((n - 1).toLong, 8)
      val headNoCrc = { w.alignZero(); w.toBytes }
      val w2 = new BitWriter
      headNoCrc.foreach(x => w2.put(x.toLong & 0xff, 8))
      w2.put(crc8(headNoCrc, 0, headNoCrc.length).toLong, 8)
      cls match {
        case 5 =>
          require(k >= 1 && k < 16 && xs.forall(x => (x & ((1 << k) - 1)) == 0))
          w2.put(0L, 1); w2.put(9L, 6) // FIXED order 1
          w2.put(1L, 1) // wasted-bits flag
          (0 until k - 1).foreach(_ => w2.put(0L, 1))
          w2.put(1L, 1) // unary k−1
          val eBits = 16 - k
          val ys = xs.map(_ >> k)
          w2.put(ys(0).toLong & ((1L << eBits) - 1), eBits)
          w2.put(0L, 2); w2.put(0L, 4) // RICE, partition order 0
          w2.put(4L, 4)
          (1 until n).foreach(i => putRice(w2, ys(i) - ys(i - 1), 4))
        case 6 =>
          require(n % 2 == 0 && n >= 4)
          require((n / 2 until n).forall(i => {
            val r0 = xs(i) - xs(i - 1); r0 >= -256 && r0 <= 255
          }))
          w2.put(0L, 1); w2.put(9L, 6); w2.put(0L, 1) // FIXED order 1
          w2.put(xs(0).toLong & 0xffff, 16)
          w2.put(0L, 2); w2.put(1L, 4) // RICE, partition order 1
          w2.put(4L, 4) // partition 0: param 4
          (1 until n / 2).foreach(i => putRice(w2, xs(i) - xs(i - 1), 4))
          w2.put(15L, 4) // partition 1: ESCAPE
          w2.put(9L, 5) // residual width 9
          (n / 2 until n).foreach(i =>
            w2.put((xs(i) - xs(i - 1)).toLong & 0x1ff, 9))
        case 7 =>
          require(n % 4 == 0 && n / 4 > 2)
          w2.put(0L, 1); w2.put(10L, 6); w2.put(0L, 1) // FIXED order 2
          w2.put(xs(0).toLong & 0xffff, 16)
          w2.put(xs(1).toLong & 0xffff, 16)
          w2.put(0L, 2); w2.put(2L, 4) // RICE, partition order 2
          for (p <- 0 until 4) {
            val param = 3 + p
            w2.put(param.toLong, 4)
            val from = math.max(p * (n / 4), 2)
            val until = (p + 1) * (n / 4)
            (from until until).foreach(i =>
              putRice(w2, xs(i) - 2 * xs(i - 1) + xs(i - 2), param))
          }
        case 8 =>
          w2.put(0L, 1); w2.put(9L, 6); w2.put(0L, 1) // FIXED order 1
          w2.put(xs(0).toLong & 0xffff, 16)
          w2.put(1L, 2); w2.put(0L, 4) // RICE2 (5-bit), partition order 0
          w2.put(4L, 5)
          (1 until n).foreach(i => putRice(w2, xs(i) - xs(i - 1), 4))
        case other => throw new IllegalArgumentException(s"class $other")
      }
      w2.alignZero()
      val body = w2.toBytes
      val w3 = new BitWriter
      body.foreach(x => w3.put(x.toLong & 0xff, 8))
      w3.put(crc16(body, 0, body.length).toLong, 16)
      head.write(w3.toBytes)
    }
    head.toByteArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** `samples` is channel-interleaved; `subframeTypes` carries one
    * entry per decoded SUBFRAME (frames × channels — a mono stream's
    * list length equals its frame count); `channelModes` one entry per
    * frame. */
  final case class FlacAudio(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      samples: Array[Int],
      subframeTypes: Seq[String],
      channelModes: Seq[String] = Nil)

  /** `bits`-bit sign-extended read (warmup/verbatim samples — a side
    * channel carries bps + 1 bits, RFC 9639 §6.3). */
  private def readSigned(r: BitReader, bits: Int): Int = {
    val v = r.read(bits)
    ((v << (64 - bits)) >> (64 - bits)).toInt
  }

  /** One subframe at the channel's effective bit depth. Returns the
    * reconstructed samples and the declared type, or None on any
    * out-of-spec or malformed shape. Supports CONSTANT, VERBATIM,
    * FIXED orders 0-2, LPC (any order, precision 2-15, non-negative
    * shift), WASTED BITS (flag + unary k−1: the subframe decodes at
    * bits − k and shifts back left — real encoders emit this on quiet
    * material whose low bits are all zero, RFC 9639 §9.2.2), and the
    * full residual coding: both Rice methods (4-bit RICE and 5-bit
    * RICE2), any partition order whose partition length divides the
    * block and exceeds the predictor order, and the ESCAPE parameter
    * (all-ones), whose partition stores residuals as unencoded
    * two's-complement at a 5-bit-declared width (RFC 9639 §9.2.7). */
  private def readSubframe(
      r: BitReader, blockSize: Int, bits: Int): Option[(Array[Int], String)] = {
    if (r.read(1) != 0L) return None
    val typ = r.read(6).toInt
    val wasted = if (r.read(1) == 0L) 0 else r.readUnary() + 1
    if (wasted >= bits) return None
    val eBits = bits - wasted
    val xs = new Array[Int](blockSize)
    def riceResiduals(order: Int): Boolean = {
      val method = r.read(2)
      if (method > 1L) return false // 0b10/0b11 reserved
      val pBits = if (method == 0L) 4 else 5 // RICE / RICE2
      val escape = (1L << pBits) - 1
      val partOrder = r.read(4).toInt
      val nParts = 1 << partOrder
      if (blockSize % nParts != 0) return false
      val partLen = blockSize >> partOrder
      if (partLen <= order && partOrder > 0) return false
      var i = order
      var p = 0
      while (p < nParts) {
        val cnt = if (p == 0) partLen - order else partLen
        if (cnt < 0) return false
        val param = r.read(pBits)
        if (param == escape) {
          // escaped partition: 5-bit residual width, then unencoded
          // two's-complement residuals (width 0 = all zero)
          val nb = r.read(5).toInt
          var j = 0
          while (j < cnt) {
            xs(i) = if (nb == 0) 0 else readSigned(r, nb)
            i += 1; j += 1
          }
        } else {
          val prm = param.toInt
          var j = 0
          while (j < cnt) {
            val q = r.readUnary()
            val u = (q.toLong << prm) | r.read(prm)
            xs(i) = ((u >> 1) ^ -(u & 1L)).toInt // zigzag unfold
            i += 1; j += 1
          }
        }
        p += 1
      }
      true
    }
    def shiftBack(t: String): Option[(Array[Int], String)] = {
      if (wasted > 0) {
        var i = 0
        while (i < blockSize) { xs(i) = xs(i) << wasted; i += 1 }
      }
      Some((xs, t))
    }
    if (typ == 0) {
      java.util.Arrays.fill(xs, readSigned(r, eBits))
      shiftBack("constant")
    } else if (typ == 1) {
      var i = 0
      while (i < blockSize) { xs(i) = readSigned(r, eBits); i += 1 }
      shiftBack("verbatim")
    } else if (typ >= 8 && typ <= 12) {
      val order = typ - 8
      if (order > 2 || order >= blockSize) return None
      var i = 0
      while (i < order) { xs(i) = readSigned(r, eBits); i += 1 }
      if (!riceResiduals(order)) return None
      i = order
      while (i < blockSize) {
        xs(i) +=
          (if (order == 0) 0
           else if (order == 1) xs(i - 1)
           else 2 * xs(i - 1) - xs(i - 2))
        i += 1
      }
      shiftBack(s"fixed$order")
    } else if (typ >= 32) {
      // LPC, order = (typ & 31) + 1: warmup, QLP precision/shift/coefs,
      // then the same Rice residual machinery; prediction is the
      // 64-bit-accumulated dot product arithmetic-shifted down
      val order = typ - 31
      if (order >= blockSize) return None
      var i = 0
      while (i < order) { xs(i) = readSigned(r, eBits); i += 1 }
      val precision = r.read(4).toInt + 1
      if (precision == 16) return None // 0b1111 is invalid per spec
      val shift = readSigned(r, 5)
      if (shift < 0) return None // negative shift is reserved
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = readSigned(r, precision); i += 1 }
      if (!riceResiduals(order)) return None
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * xs(i - 1 - j); j += 1 }
        xs(i) += (acc >> shift).toInt
        i += 1
      }
      shiftBack(s"lpc$order")
    } else None
  }

  def decodeFlac(b: Array[Byte]): Option[FlacAudio] = try {
    if (b.length < 42 || new String(b, 0, 4, "US-ASCII") != "fLaC") return None
    // metadata blocks: find STREAMINFO (must be first), skip the rest
    var at = 4
    var last = false
    var rate = -1; var channels = -1; var bps = -1; var total = -1L
    var first = true
    while (!last) {
      if (at + 4 > b.length) return None
      last = (b(at) & 0x80) != 0
      val typ = b(at) & 0x7f
      val len = ((b(at + 1) & 0xff) << 16) | ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
      if (at + 4 + len > b.length) return None
      if (first) {
        if (typ != 0 || len != 34) return None // STREAMINFO must lead
        val r = new BitReader(b, at + 4)
        r.read(16); r.read(16); r.read(24); r.read(24)
        rate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        total = r.read(36)
        first = false
      }
      at += 4 + len
    }
    if (rate <= 0 || channels < 1 || channels > 2 || bps != 16 || total < 0)
      return None
    val out = new Array[Int](total.toInt * channels)
    var got = 0L
    val types = Vector.newBuilder[String]
    val modes = Vector.newBuilder[String]
    while (got < total) {
      val frameStart = at
      val r = new BitReader(b, at)
      if (r.read(14) != 0x3ffe) return None
      r.read(1)
      r.read(1)
      val bsCode = r.read(4).toInt
      val rateCode = r.read(4).toInt
      val chCode = r.read(4).toInt
      val bpsCode = r.read(3).toInt
      r.read(1)
      // UTF-8 frame number: subset writes < 128 (one byte); reject others
      val fn = r.read(8)
      if ((fn & 0x80L) != 0) return None
      if (bpsCode != 4 || rateCode != 4) return None
      // channel assignment: 0 = mono, 1 = independent stereo, 8/9/10 =
      // left/side, right/side, mid/side (the side channel carries one
      // extra bit — RFC 9639 §6.3)
      val (nCh, mode) = chCode match {
        case 0 => (1, "mono")
        case 1 => (2, "independent")
        case 8 => (2, "left_side")
        case 9 => (2, "right_side")
        case 10 => (2, "mid_side")
        case _ => return None
      }
      if (nCh != channels) return None
      val blockSize = bsCode match {
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None
      }
      if (!r.aligned) return None
      val headEnd = r.bytePos
      val storedCrc8 = r.read(8).toInt
      if (storedCrc8 != crc8(b, frameStart, headEnd)) return None
      modes += mode
      // subframes (bit-continuous; the side channel reads bps + 1)
      val chans = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        val extra = mode match {
          case "left_side" if c == 1 => 1
          case "right_side" if c == 0 => 1
          case "mid_side" if c == 1 => 1
          case _ => 0
        }
        readSubframe(r, blockSize, bps + extra) match {
          case Some((xs, t)) => chans(c) = xs; types += t
          case None => return None
        }
        c += 1
      }
      r.skipToByte()
      val bodyEnd = r.bytePos
      val storedCrc16 = r.read(16).toInt
      if (storedCrc16 != crc16(b, frameStart, bodyEnd)) return None
      if (got + blockSize > total) return None
      // inter-channel reconstruction (libFLAC's exact integer forms)
      var k = 0
      while (k < blockSize) {
        val base = ((got + k) * channels).toInt
        mode match {
          case "mono" => out(base) = chans(0)(k)
          case "independent" =>
            out(base) = chans(0)(k); out(base + 1) = chans(1)(k)
          case "left_side" =>
            out(base) = chans(0)(k); out(base + 1) = chans(0)(k) - chans(1)(k)
          case "right_side" =>
            out(base) = chans(1)(k) + chans(0)(k); out(base + 1) = chans(1)(k)
          case "mid_side" =>
            val side = chans(1)(k)
            val mid = (chans(0)(k) << 1) | (side & 1)
            out(base) = (mid + side) >> 1
            out(base + 1) = (mid - side) >> 1
        }
        k += 1
      }
      got += blockSize
      at = r.bytePos
    }
    Some(FlacAudio(rate, channels, 16, out, types.result(), modes.result()))
  } catch { case _: Exception => None }
}
