package graft.multimodal

/** MPEG-audio (MP3) frame walk and Ogg page walk — the two remaining
  * audio CONTAINER classes a mixed corpus census meets (per-frame
  * entropy decode of Layer III / Vorbis is out of scope; what the
  * census needs is the structural walk: how many frames/pages, what
  * rate, how long). Both implemented against the public layouts:
  * ISO/IEC 11172-3 frame headers (11-bit sync, version/layer bits,
  * bitrate and sample-rate index tables, per-frame padding bit in the
  * length arithmetic) with ID3v2 skip (syncsafe 28-bit size), and the
  * Xiph Ogg page format (OggS capture, lacing-value packet
  * termination, page CRC-32 poly 0x04c11db7 computed with the CRC
  * field zeroed — VALIDATED, a corrupt page drops the asset). */
object Mpeg {

  // MPEG-1 Layer III tables (ISO/IEC 11172-3)
  private val bitrateKbps = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val sampleRates = Array(44100, 48000, 32000, 0)

  /** Frame byte length for MPEG-1 Layer III. */
  def mp3FrameLen(kbps: Int, rate: Int, padding: Int): Int =
    144 * kbps * 1000 / rate + padding

  /** Synthesize: optional ID3v2 shell + `nFrames` valid MPEG-1 Layer
    * III headers with zero audio payloads, per-frame padding bits from
    * `padBit` (frame index → 0|1). */
  def encodeMp3(
      nFrames: Int,
      bitrateIdx: Int,
      rateIdx: Int,
      id3Size: Int,
      padBit: Int => Int): Array[Byte] = {
    require(nFrames >= 1 && bitrateIdx >= 1 && bitrateIdx <= 14 &&
      rateIdx >= 0 && rateIdx <= 2 && id3Size >= 0 && id3Size < (1 << 28))
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0) // version 2.3, no flags
      // syncsafe size: 4 x 7 bits
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size))
    }
    val rate = sampleRates(rateIdx)
    val kbps = bitrateKbps(bitrateIdx)
    for (f <- 0 until nFrames) {
      val pad = padBit(f) & 1
      val len = mp3FrameLen(kbps, rate, pad)
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      frame(2) = ((bitrateIdx << 4) | (rateIdx << 2) | (pad << 1)).toByte
      frame(3) = 0 // stereo, no extras
      out.write(frame)
    }
    out.toByteArray
  }

  final case class Mp3Info(
      sampleRate: Int,
      bitrateKbps: Int,
      nFrames: Long,
      durationMs: Long)

  /** Walk: skip one ID3v2 tag if present, then parse every frame
    * header, honoring the per-frame padding bit in the stride — a
    * wrong stride desyncs at the very next frame. Constant-bitrate
    * streams only (rate/bitrate must not change mid-stream); anything
    * malformed or truncated returns None. */
  def walkMp3(b: Array[Byte]): Option[Mp3Info] = try {
    var at = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      at = 10 + size
    }
    if (at >= b.length) return None
    var rate = -1
    var kbps = -1
    var frames = 0L
    while (at < b.length) {
      if (at + 4 > b.length) return None
      if ((b(at) & 0xff) != 0xff || (b(at + 1) & 0xfe) != 0xfa) return None
      val hasCrc = (b(at + 1) & 0x01) == 0
      if (hasCrc) return None // protected frames out of scope
      val bIdx = (b(at + 2) >> 4) & 0x0f
      val rIdx = (b(at + 2) >> 2) & 0x03
      val pad = (b(at + 2) >> 1) & 0x01
      if (bIdx == 0 || bIdx == 15 || rIdx == 3) return None
      val r = sampleRates(rIdx)
      val k = bitrateKbps(bIdx)
      if (rate < 0) { rate = r; kbps = k }
      else if (rate != r || kbps != k) return None // VBR out of scope
      val len = mp3FrameLen(k, r, pad)
      if (at + len > b.length) return None
      at += len
      frames += 1
    }
    if (frames == 0) None
    else Some(Mp3Info(rate, kbps, frames, frames * 1152L * 1000L / rate))
  } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // Layers I and II (round 17 — closes the MPEG-audio family: the
  // header format is shared, only the bitrate table, the
  // samples-per-frame constant, and Layer I's 4-byte-slot length
  // arithmetic differ — ISO/IEC 11172-3 §2.4.2.3/§2.4.3.1)
  // ------------------------------------------------------------------

  private val bitrateKbpsL1 = Array(
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
  private val bitrateKbpsL2 = Array(
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)

  private def layerBitrate(layer: Int, idx: Int): Int = layer match {
    case 1 => bitrateKbpsL1(idx)
    case 2 => bitrateKbpsL2(idx)
    case _ => bitrateKbps(idx)
  }

  /** Samples per MPEG-1 frame: 384 for Layer I, 1152 for II/III. */
  def mp3SamplesPerFrame(layer: Int): Int = if (layer == 1) 384 else 1152

  /** Frame byte length, per layer: Layer I counts 12·kbps·1000/rate
    * 4-byte SLOTS (+ one 4-byte padding slot); II/III count
    * 144·kbps·1000/rate bytes (+ one padding byte). */
  def mp3FrameLenLayer(layer: Int, kbps: Int, rate: Int, padding: Int): Int =
    if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
    else 144 * kbps * 1000 / rate + padding

  /** The header's layer FIELD (2 bits): 11 = Layer I, 10 = II, 01 = III. */
  private def layerField(layer: Int): Int = layer match {
    case 1 => 3; case 2 => 2; case _ => 1
  }

  /** Synthesize a CBR stream of any MPEG-1 layer: `nFrames` valid
    * headers with zero audio payloads, per-frame padding from
    * `padBit`. */
  def encodeMp3Layered(
      layer: Int,
      nFrames: Int,
      bitrateIdx: Int,
      rateIdx: Int,
      padBit: Int => Int): Array[Byte] = {
    require(layer >= 1 && layer <= 3 && nFrames >= 1 &&
      bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    val rate = sampleRates(rateIdx)
    val kbps = layerBitrate(layer, bitrateIdx)
    for (f <- 0 until nFrames) {
      val pad = padBit(f) & 1
      val len = mp3FrameLenLayer(layer, kbps, rate, pad)
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = (0xf0 | 0x08 | (layerField(layer) << 1) | 0x01).toByte
      frame(2) = ((bitrateIdx << 4) | (rateIdx << 2) | (pad << 1)).toByte
      frame(3) = 0 // stereo, no extras
      out.write(frame)
    }
    out.toByteArray
  }

  final case class Mp3LayerInfo(
      layer: Int,
      sampleRate: Int,
      bitrateKbps: Int,
      nFrames: Long,
      durationMs: Long)

  /** Walk a CBR stream of ANY MPEG-1 layer: the q337 walk generalized
    * over the layer field — per-layer bitrate table, Layer I's 4-byte
    * slot stride, 384-vs-1152 duration arithmetic. The layer must not
    * change mid-stream (a desync symptom, like a rate change); None on
    * anything malformed, truncated, protected, or free-format. */
  def walkMp3Layers(b: Array[Byte]): Option[Mp3LayerInfo] = try {
    var at = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      at = 10 + size
    }
    if (at >= b.length) return None
    var layer = -1
    var rate = -1
    var kbps = -1
    var frames = 0L
    while (at < b.length) {
      if (at + 4 > b.length) return None
      if ((b(at) & 0xff) != 0xff || (b(at + 1) & 0xf8) != 0xf8) return None
      val lf = (b(at + 1) >> 1) & 0x03
      if (lf == 0) return None // reserved
      val ly = lf match { case 3 => 1; case 2 => 2; case _ => 3 }
      val hasCrc = (b(at + 1) & 0x01) == 0
      if (hasCrc) return None // the protected walk is walkMp3Vbr's
      val bIdx = (b(at + 2) >> 4) & 0x0f
      val rIdx = (b(at + 2) >> 2) & 0x03
      val pad = (b(at + 2) >> 1) & 0x01
      if (bIdx == 0 || bIdx == 15 || rIdx == 3) return None
      val r = sampleRates(rIdx)
      val k = layerBitrate(ly, bIdx)
      if (layer < 0) { layer = ly; rate = r; kbps = k }
      else if (layer != ly || rate != r || kbps != k) return None
      val len = mp3FrameLenLayer(ly, k, r, pad)
      if (at + len > b.length) return None
      at += len
      frames += 1
    }
    if (frames == 0) None
    else Some(Mp3LayerInfo(layer, rate, kbps, frames,
      frames * mp3SamplesPerFrame(layer).toLong * 1000L / rate))
  } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // VBR + CRC (round 16 — closes the CBR/no-CRC gate: most podcast-era
  // MP3s are VBR, and CRC-protected frames appear in broadcast rips)
  // ------------------------------------------------------------------

  /** ISO/IEC 11172-3 frame CRC: CRC-16 poly 0x8005, init 0xFFFF,
    * MSB-first, over header bytes 2-3 then the Layer III side
    * information. */
  private[multimodal] def mp3Crc16(
      b: Array[Byte], hdrAt: Int, sideAt: Int, sideLen: Int): Int = {
    var crc = 0xffff
    def feed(v: Int): Unit = {
      crc ^= (v & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
    }
    feed(b(hdrAt + 2)); feed(b(hdrAt + 3))
    var i = 0
    while (i < sideLen) { feed(b(sideAt + i)); i += 1 }
    crc
  }

  /** MPEG-1 Layer III side-information length (bytes): 17 mono, 32
    * otherwise. */
  private def sideInfoLen(channelMode: Int): Int =
    if (channelMode == 3) 17 else 32

  /** Synthesize a VBR stream: per-frame bitrate indices from
    * `bitrateIdxOf`, per-frame CRC protection from `crcOf` (protected
    * frames carry a VALID ISO CRC-16 over header bytes 2-3 + side
    * info), and — when `xingFrames` ≥ 0 — a Xing tag in frame 0's
    * payload (after side info, and after the CRC word if frame 0 is
    * protected) declaring that frame count. Stereo, zero audio. */
  def encodeMp3Vbr(
      nFrames: Int,
      rateIdx: Int,
      bitrateIdxOf: Int => Int,
      crcOf: Int => Boolean,
      xingFrames: Long = -1L,
      id3Size: Int = 0): Array[Byte] = {
    require(nFrames >= 1 && rateIdx >= 0 && rateIdx <= 2 && id3Size >= 0)
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size))
    }
    val rate = sampleRates(rateIdx)
    for (f <- 0 until nFrames) {
      val bIdx = bitrateIdxOf(f)
      require(bIdx >= 1 && bIdx <= 14)
      val kbps = bitrateKbps(bIdx)
      val pad = 0
      val len = mp3FrameLen(kbps, rate, pad)
      val crc = crcOf(f)
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = (if (crc) 0xfa else 0xfb).toByte // MPEG-1 L3, CRC bit
      frame(2) = ((bIdx << 4) | (rateIdx << 2) | (pad << 1)).toByte
      frame(3) = 0 // stereo
      val sideAt = if (crc) 6 else 4
      val sideLen = sideInfoLen(0)
      require(len >= sideAt + sideLen + (if (f == 0 && xingFrames >= 0) 12 else 0))
      if (f == 0 && xingFrames >= 0) {
        val tagAt = sideAt + sideLen
        "Xing".getBytes("US-ASCII").copyToArray(frame, tagAt)
        frame(tagAt + 7) = 1 // flags: FRAMES field present
        frame(tagAt + 8) = ((xingFrames >> 24) & 0xff).toByte
        frame(tagAt + 9) = ((xingFrames >> 16) & 0xff).toByte
        frame(tagAt + 10) = ((xingFrames >> 8) & 0xff).toByte
        frame(tagAt + 11) = (xingFrames & 0xff).toByte
      }
      if (crc) {
        val c = mp3Crc16(frame, 0, sideAt, sideLen)
        frame(4) = ((c >> 8) & 0xff).toByte
        frame(5) = (c & 0xff).toByte
      }
      out.write(frame)
    }
    out.toByteArray
  }

  final case class Mp3VbrInfo(
      sampleRate: Int,
      nFrames: Long,
      nCrcFrames: Long,
      minKbps: Int,
      maxKbps: Int,
      sumKbps: Long,
      declaredFrames: Long, // Xing FRAMES field, or −1 when absent
      durationMs: Long)

  /** The VBR-aware walk: skip one ID3v2 tag, then parse every frame
    * header letting the BITRATE vary per frame (the sample rate must
    * not — a mid-stream rate change is a broken file, not VBR),
    * VALIDATING the ISO CRC-16 on protected frames (a mismatch drops
    * the asset: a desynced walk must not masquerade as a short file),
    * and reading frame 0's Xing/Info tag (after side info and the CRC
    * word) when present — the declared frame count a seeking player
    * trusts, reported next to the walked count so a census can flag
    * streams whose declaration lies. */
  def walkMp3Vbr(b: Array[Byte]): Option[Mp3VbrInfo] = try {
    var at = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      at = 10 + size
    }
    if (at >= b.length) return None
    var rate = -1
    var frames = 0L
    var crcFrames = 0L
    var minK = Int.MaxValue
    var maxK = -1
    var sumK = 0L
    var declared = -1L
    while (at < b.length) {
      if (at + 4 > b.length) return None
      if ((b(at) & 0xff) != 0xff || (b(at + 1) & 0xfe) != 0xfa) return None
      val hasCrc = (b(at + 1) & 0x01) == 0
      val bIdx = (b(at + 2) >> 4) & 0x0f
      val rIdx = (b(at + 2) >> 2) & 0x03
      val pad = (b(at + 2) >> 1) & 0x01
      val chMode = (b(at + 3) >> 6) & 0x03
      if (bIdx == 0 || bIdx == 15 || rIdx == 3) return None
      val r = sampleRates(rIdx)
      val k = bitrateKbps(bIdx)
      if (rate < 0) rate = r
      else if (rate != r) return None // a rate change is corruption
      val len = mp3FrameLen(k, r, pad)
      if (at + len > b.length) return None
      val sideLen = sideInfoLen(chMode)
      val sideAt = at + (if (hasCrc) 6 else 4)
      if (hasCrc) {
        if (sideAt + sideLen > at + len) return None
        val stored = ((b(at + 4) & 0xff) << 8) | (b(at + 5) & 0xff)
        if (stored != mp3Crc16(b, at, sideAt, sideLen)) return None
        crcFrames += 1
      }
      if (frames == 0L && sideAt + sideLen + 8 <= at + len) {
        val t = sideAt + sideLen
        val tag = new String(b, t, 4, "US-ASCII")
        if (tag == "Xing" || tag == "Info") {
          val flags = ((b(t + 4) & 0xff) << 24) | ((b(t + 5) & 0xff) << 16) |
            ((b(t + 6) & 0xff) << 8) | (b(t + 7) & 0xff)
          if ((flags & 1) != 0 && t + 12 <= at + len)
            declared = ((b(t + 8) & 0xffL) << 24) | ((b(t + 9) & 0xffL) << 16) |
              ((b(t + 10) & 0xffL) << 8) | (b(t + 11) & 0xffL)
        }
      }
      sumK += k
      minK = math.min(minK, k)
      maxK = math.max(maxK, k)
      at += len
      frames += 1
    }
    if (frames == 0) None
    else Some(Mp3VbrInfo(rate, frames, crcFrames, minK, maxK, sumK,
      declared, frames * 1152L * 1000L / rate))
  } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // Ogg
  // ------------------------------------------------------------------

  // Ogg page CRC: poly 0x04c11db7, not reflected, init 0, no final xor
  private val oggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def oggCrc(b: Array[Byte], from: Int, until: Int, zeroFrom: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val v = if (i >= zeroFrom && i < zeroFrom + 4) 0 else b(i) & 0xff
      crc = (crc << 8) ^ oggCrcTable(((crc >>> 24) ^ v) & 0xff)
      i += 1
    }
    crc
  }

  /** One Ogg page: packets as lacing runs (a packet of n bytes emits
    * n/255 lacing values of 255 then one of n mod 255 — a multiple of
    * 255 is continued by a 0 lacing value, per the spec). */
  def encodeOggPage(
      serial: Int,
      pageSeq: Int,
      granule: Long,
      headerType: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { p =>
      val full = p.length / 255
      Seq.fill(full)(255) :+ (p.length % 255)
    }
    require(lacing.length <= 255, "too many lacing values for one page")
    val body = packets.flatMap(_.toSeq).toArray
    val page = new Array[Byte](27 + lacing.length + body.length)
    "OggS".getBytes("US-ASCII").copyToArray(page, 0)
    page(4) = 0
    page(5) = headerType.toByte
    var i = 0
    while (i < 8) { page(6 + i) = ((granule >> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 4) {
      page(14 + i) = ((serial >> (8 * i)) & 0xff).toByte
      page(18 + i) = ((pageSeq >> (8 * i)) & 0xff).toByte
      i += 1
    }
    page(26) = lacing.length.toByte
    lacing.zipWithIndex.foreach { case (v, ix) => page(27 + ix) = v.toByte }
    body.copyToArray(page, 27 + lacing.length)
    val crc = oggCrc(page, 0, page.length, 22)
    i = 0
    while (i < 4) { page(22 + i) = ((crc >> (8 * i)) & 0xff).toByte; i += 1 }
    page
  }

  /** A Vorbis I identification header (spec §4.2.2, 30 bytes): packet
    * type 0x01 + "vorbis", version 0, channels, sample rate, three
    * zero bitrate fields, blocksize byte, framing bit. */
  def vorbisIdHeader(channels: Int, rate: Long): Array[Byte] = {
    val out = new Array[Byte](30)
    out(0) = 0x01
    "vorbis".getBytes("US-ASCII").copyToArray(out, 1)
    // version u32 = 0 (bytes 7..10 stay zero)
    out(11) = channels.toByte
    var i = 0
    while (i < 4) { out(12 + i) = ((rate >> (8 * i)) & 0xff).toByte; i += 1 }
    // bitrate_{max,nominal,min} s32 = 0 (bytes 16..27 stay zero)
    out(28) = 0xb8.toByte // blocksize0 = 256 (2^8), blocksize1 = 2048 (2^11)
    out(29) = 0x01 // framing bit
    out
  }

  /** An Opus `OpusHead` identification header (RFC 7845 §5.1, 19 bytes
    * at mapping family 0): magic, version 1, channels, pre-skip u16,
    * input sample rate u32, output gain 0, mapping family 0. */
  def opusHead(channels: Int, preSkip: Int, rate: Long): Array[Byte] = {
    val out = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(out, 0)
    out(8) = 0x01
    out(9) = channels.toByte
    out(10) = (preSkip & 0xff).toByte
    out(11) = ((preSkip >> 8) & 0xff).toByte
    var i = 0
    while (i < 4) { out(12 + i) = ((rate >> (8 * i)) & 0xff).toByte; i += 1 }
    // output gain s16 = 0; mapping family 0 (bytes 16..18 stay zero)
    out
  }

  final case class OggStream(
      serial: Long,
      nPages: Long,
      nPackets: Long,
      lastGranule: Long)

  /** [[OggStream]] plus the identification fields a crawl audit reports
    * per logical stream, read from packet 0 (the BOS page's first
    * packet — fixed-offset reads, no audio decode): codec ∈
    * vorbis | opus | unknown, the header's version, channel count,
    * sample rate, and Opus pre-skip (0 for Vorbis, −1 when unknown). */
  final case class OggIdStream(
      serial: Long,
      codec: String,
      version: Long,
      channels: Long,
      sampleRate: Long,
      preSkip: Long,
      nPages: Long,
      nPackets: Long,
      lastGranule: Long)

  private final case class OggAcc(
      nPages: Long,
      nPackets: Long,
      lastGranule: Long,
      firstPacket: Array[Byte])

  /** The shared page walk: every page CRC-validated, per-serial page /
    * completed-packet / granule accounting, plus each stream's FIRST
    * complete packet captured from its first page (where both the
    * Vorbis and Opus identification headers live — each spec requires
    * the id header alone on the BOS page; a first packet that continues
    * past its page is captured as empty and identifies as unknown). */
  private def walkOggCore(
      b: Array[Byte]): Option[Seq[(Long, OggAcc)]] = try {
    var at = 0
    val pages = scala.collection.mutable.LinkedHashMap.empty[Long, OggAcc]
    if (b.length == 0) return None
    while (at < b.length) {
      if (at + 27 > b.length) return None
      if (b(at) != 'O' || b(at + 1) != 'g' || b(at + 2) != 'g' || b(at + 3) != 'S')
        return None
      if (b(at + 4) != 0) return None
      var granule = 0L
      var i = 0
      while (i < 8) { granule |= (b(at + 6 + i) & 0xffL) << (8 * i); i += 1 }
      var serial = 0L
      i = 0
      while (i < 4) { serial |= (b(at + 14 + i) & 0xffL) << (8 * i); i += 1 }
      var stored = 0L
      i = 0
      while (i < 4) { stored |= (b(at + 22 + i) & 0xffL) << (8 * i); i += 1 }
      val nSeg = b(at + 26) & 0xff
      if (at + 27 + nSeg > b.length) return None
      var bodyLen = 0
      var packets = 0L
      var firstLen = -1
      var scanning = true
      i = 0
      while (i < nSeg) {
        val v = b(at + 27 + i) & 0xff
        bodyLen += v
        if (v < 255) packets += 1
        if (scanning) {
          // first packet on this page: lacing values up to the first
          // < 255 terminator
          if (v < 255) { firstLen = bodyLen; scanning = false }
        }
        i += 1
      }
      val end = at + 27 + nSeg + bodyLen
      if (end > b.length) return None
      if ((oggCrc(b, at, end, at + 22).toLong & 0xffffffffL) != stored) return None
      val prev = pages.get(serial)
      val first = prev.map(_.firstPacket).getOrElse {
        if (firstLen < 0) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(b, at + 27 + nSeg,
          at + 27 + nSeg + firstLen)
      }
      val (p0, k0) = prev.map(p => (p.nPages, p.nPackets)).getOrElse((0L, 0L))
      pages.update(serial, OggAcc(p0 + 1, k0 + packets, granule, first))
      at = end
    }
    Some(pages.toSeq)
  } catch { case _: Exception => None }

  /** Walk every page, VALIDATING each CRC; count pages and COMPLETED
    * packets (a lacing value < 255 terminates a packet) per stream
    * serial and keep the last granule position. None on bad capture,
    * truncation, or any CRC mismatch. */
  def walkOgg(b: Array[Byte]): Option[Seq[OggStream]] =
    walkOggCore(b).map(_.map { case (s, a) =>
      OggStream(s, a.nPages, a.nPackets, a.lastGranule)
    })

  private def leU16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)
  private def leU32(b: Array[Byte], o: Int): Long =
    leU16(b, o) | (leU16(b, o + 2) << 16)

  /** [[walkOgg]] extended with the per-stream IDENTIFICATION census —
    * what a real crawl audit reports per logical stream: packet 0 of
    * the BOS page parsed as a Vorbis identification header
    * (`\\x01vorbis`: version u32, channels u8, sample rate u32 — RFC
    * wrapping of the Vorbis I spec §4.2.2) or an Opus `OpusHead` (RFC
    * 7845 §5.1: version u8, channels u8, pre-skip u16, input sample
    * rate u32), all little-endian fixed-offset reads; any other first
    * packet reports codec `unknown` with −1 fields rather than
    * dropping the stream (the page accounting stands on its own). */
  def walkOggIds(b: Array[Byte]): Option[Seq[OggIdStream]] =
    walkOggCore(b).map(_.map { case (s, a) =>
      val fp = a.firstPacket
      val vorbis = fp.length >= 30 && (fp(0) & 0xff) == 0x01 &&
        fp(1) == 'v' && fp(2) == 'o' && fp(3) == 'r' && fp(4) == 'b' &&
        fp(5) == 'i' && fp(6) == 's'
      val opus = fp.length >= 19 && fp(0) == 'O' && fp(1) == 'p' &&
        fp(2) == 'u' && fp(3) == 's' && fp(4) == 'H' && fp(5) == 'e' &&
        fp(6) == 'a' && fp(7) == 'd'
      if (vorbis)
        OggIdStream(s, "vorbis", leU32(fp, 7), (fp(11) & 0xff).toLong,
          leU32(fp, 12), 0L, a.nPages, a.nPackets, a.lastGranule)
      else if (opus)
        OggIdStream(s, "opus", (fp(8) & 0xff).toLong, (fp(9) & 0xff).toLong,
          leU32(fp, 12), leU16(fp, 10), a.nPages, a.nPackets, a.lastGranule)
      else
        OggIdStream(s, "unknown", -1L, -1L, -1L, -1L,
          a.nPages, a.nPackets, a.lastGranule)
    })
}
