package graft.sources

/** POSIX ustar TAR walk — the other container text corpora actually
  * ship in (datasets are distributed as tarballs of documents; the
  * reference's own ingest stage reads a local file tree —
  * /root/reference/playground.py:213 `load_data` — which a 100 TB
  * corpus replaces with archives). Implemented against the POSIX.1
  * ustar layout: 512-byte headers (name 100, octal mode/uid/gid, octal
  * 12-byte size and mtime, checksum computed with the checksum field
  * blanked to spaces, typeflag, "ustar" magic), payloads padded to
  * 512-byte blocks, the archive closed by two zero blocks.
  *
  * The walk VALIDATES each header checksum (a corrupt or misaligned
  * header must stop the walk — guessing past it would mis-slice every
  * later member) and parses sizes as octal with Long math so a
  * hostile size field cannot wrap the cursor (the AVI/MP4 walk
  * discipline). */
object Tar {

  final case class TarMember(
      name: String,
      size: Long,
      typeflag: Char,
      payload: Array[Byte])

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
      else if (c != ' ' && c != 0) return -1L
      i += 1
    }
    v
  }

  private def putOctal(b: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val pad = len - 1 - s.length
    var i = 0
    while (i < pad) { b(off + i) = '0'; i += 1 }
    s.getBytes("US-ASCII").copyToArray(b, off + pad)
    b(off + len - 1) = 0
  }

  private def headerChecksum(h: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < 512) {
      s += (if (i >= 148 && i < 156) 32L else (h(i) & 0xffL))
      i += 1
    }
    s
  }

  /** Whether the buffer OPENS with a checksum-valid ustar header — the
    * sniff gate: the "ustar" magic at offset 257 is weak (any 512-byte
    * payload region can spell it), but a matching header checksum over
    * the full 512-byte block is essentially unforgeable by accident, so
    * content sniffing requires both before claiming tar. */
  def validFirstHeader(b: Array[Byte]): Boolean =
    b.length >= 512 && {
      val h = java.util.Arrays.copyOfRange(b, 0, 512)
      val stored = octal(h, 148, 8)
      stored >= 0 && stored == headerChecksum(h)
    }

  /** One ustar member header + padded payload. */
  def encodeMember(name: String, payload: Array[Byte], typeflag: Char = '0'): Array[Byte] = {
    require(name.getBytes("US-ASCII").length <= 100, "name over ustar limit")
    val h = new Array[Byte](512)
    name.getBytes("US-ASCII").copyToArray(h, 0)
    putOctal(h, 100, 8, 420L) // mode 0644
    putOctal(h, 108, 8, 0L) // uid
    putOctal(h, 116, 8, 0L) // gid
    putOctal(h, 124, 12, payload.length.toLong)
    putOctal(h, 136, 12, 0L) // mtime — fixed for byte determinism
    h(156) = typeflag.toByte
    "ustar".getBytes("US-ASCII").copyToArray(h, 257)
    h(262) = 0; h(263) = '0'; h(264) = '0'
    val ck = headerChecksum(h)
    // checksum: six octal digits, NUL, space (the historical format)
    val cs = f"${ck}%06o".getBytes("US-ASCII")
    cs.copyToArray(h, 148)
    h(154) = 0
    h(155) = ' '
    val padded = (payload.length + 511) / 512 * 512
    val out = new Array[Byte](512 + padded)
    h.copyToArray(out, 0)
    payload.copyToArray(out, 512)
    out
  }

  /** A complete archive: members then two zero blocks. */
  def encodeTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (n, p) => out.write(encodeMember(n, p)) }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Walk the archive: members in order, each header checksum
    * VALIDATED, sizes octal-parsed as Long and bounds-checked before
    * the cursor advances. None on any malformation — bad checksum,
    * non-octal size, truncated payload, missing terminator. */
  def parseTar(b: Array[Byte]): Option[Seq[TarMember]] = try {
    val out = Vector.newBuilder[TarMember]
    var at = 0L
    var terminated = false
    while (!terminated) {
      if (at + 512 > b.length) return None
      val h = java.util.Arrays.copyOfRange(b, at.toInt, at.toInt + 512)
      if (h.forall(_ == 0)) {
        // first zero block: require a second, fully zero, then stop
        if (at + 1024 > b.length) return None
        var i = at.toInt + 512
        while (i < at.toInt + 1024) { if (b(i) != 0) return None; i += 1 }
        terminated = true
      } else {
        val stored = octal(h, 148, 8)
        if (stored < 0 || stored != headerChecksum(h)) return None
        val size = octal(h, 124, 12)
        if (size < 0 || at + 512 + size > b.length) return None
        var nameLen = 0
        while (nameLen < 100 && h(nameLen) != 0) nameLen += 1
        val name = new String(h, 0, nameLen, "US-ASCII")
        val tf = (h(156) & 0xff).toChar
        out += TarMember(name, size,
          if (tf == 0) '0' else tf,
          java.util.Arrays.copyOfRange(b, at.toInt + 512, (at + 512 + size).toInt))
        at += 512 + (size + 511) / 512 * 512
      }
    }
    Some(out.result())
  } catch { case _: Exception => None }
}
