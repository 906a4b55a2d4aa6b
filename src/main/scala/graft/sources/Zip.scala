package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** ZIP archive walk — the third container real document corpora ship
  * in (after tarballs and *.warc.gz), implemented against the public
  * PKWARE APPNOTE layout: the End-Of-Central-Directory record is
  * located by scanning BACK from the file tail (the only correct way —
  * a ZIP is defined by its central directory, not by whatever happens
  * to sit at offset 0), central-directory entries supply name, sizes,
  * method and local-header offset, and each member's payload is read
  * through its local header with method 0 (stored) copied verbatim and
  * method 8 (DEFLATE) inflated via `java.util.zip.Inflater` and
  * CRC32-validated against the directory's value.
  *
  * Reading through the central directory rather than streaming local
  * headers matters at corpus scale: appended garbage, data descriptors
  * and self-extractor stubs all break local-header streaming, while
  * the EOCD walk ignores them by construction. */
object Zip {

  final case class ZipMember(
      name: String,
      method: Int,
      compressedSize: Long,
      size: Long,
      payload: Array[Byte])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)

  /** One archive from (name, payload, deflate?) members. Deterministic:
    * fixed DOS timestamps (0), no extra fields, no comments. */
  def encodeZip(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val central = new java.io.ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = {
      central.write((v & 0xff).toInt); central.write(((v >> 8) & 0xff).toInt)
      central.write(((v >> 16) & 0xff).toInt); central.write(((v >> 24) & 0xff).toInt)
    }
    members.foreach { case (name, payload, deflate) =>
      val nameBytes = name.getBytes("US-ASCII")
      val crc = new CRC32
      crc.update(payload)
      val data =
        if (!deflate) payload
        else {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(payload); d.finish()
          val buf = new Array[Byte](math.max(64, payload.length + payload.length / 2 + 64))
          val bo = new java.io.ByteArrayOutputStream()
          while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
          d.end()
          bo.toByteArray
        }
      val method = if (deflate) 8 else 0
      val offset = out.size().toLong
      w32(0x04034b50L) // local file header
      w16(20); w16(0); w16(method)
      w16(0); w16(0) // DOS time/date fixed
      w32(crc.getValue); w32(data.length.toLong); w32(payload.length.toLong)
      w16(nameBytes.length); w16(0)
      out.write(nameBytes); out.write(data)
      c32(0x02014b50L) // central directory header
      c16(20); c16(20); c16(0); c16(method)
      c16(0); c16(0)
      c32(crc.getValue); c32(data.length.toLong); c32(payload.length.toLong)
      c16(nameBytes.length); c16(0); c16(0)
      c16(0); c16(0); c32(0L)
      c32(offset)
      central.write(nameBytes)
    }
    val cdOffset = out.size().toLong
    val cd = central.toByteArray
    out.write(cd)
    w32(0x06054b50L) // EOCD
    w16(0); w16(0)
    w16(members.length); w16(members.length)
    w32(cd.length.toLong); w32(cdOffset)
    w16(0)
    out.toByteArray
  }

  /** Walk an archive through its central directory. None on any
    * malformation — no EOCD in the tail window, truncated directory,
    * bad local-header signature, unsupported method, CRC mismatch,
    * or a size field pointing outside the file. */
  def parseZip(b: Array[Byte]): Option[Seq[ZipMember]] = try {
    // EOCD: scan back over a possible trailing comment (<= 64 KiB).
    // The declared comment must FIT the remaining tail but need not
    // land exactly at EOF — self-extractor stubs and append-happy
    // writers leave trailing bytes after the comment, and the
    // central-directory walk never reads them; the backward scan takes
    // the LAST signature whose record is self-consistent.
    var eocd = -1
    var loose = -1
    var i = b.length - 22
    val floor = math.max(0, b.length - 22 - 0xffff)
    while (i >= floor && eocd < 0) {
      if (u32(b, i) == 0x06054b50L &&
        i + 22 + u16(b, i + 20) <= b.length) {
        // validate before accepting: the declared central directory
        // must land inside the file ahead of this record and start at
        // a CD-header signature (or declare zero entries) — an
        // EOCD-like byte pattern INSIDE a genuine trailing comment
        // must fall through to the true record further back. A ZIP64
        // EOCD carries the 0xFFFFFFFF offset sentinel (the real offset
        // lives in the ZIP64 record): that is a legitimate record, not
        // a comment artifact, so it passes candidacy — the walk below
        // then rejects what it cannot address rather than this scan
        // mislocating the record.
        val cdOff0 = u32(b, i + 16)
        val cdSize0 = u32(b, i + 12)
        val nEnt0 = u16(b, i + 10)
        if (cdOff0 == 0xffffffffL ||
          (cdOff0 + cdSize0 <= i &&
            (nEnt0 == 0 || (cdOff0 + 4 <= b.length &&
              u32(b, cdOff0.toInt) == 0x02014b50L)))) eocd = i
        else if (loose < 0) loose = i
      }
      i -= 1
    }
    // no candidate validates: a rebased archive (data-prepended / SFX
    // stubs shift every offset, so the declared cdOff points at the
    // wrong byte) still has a genuine EOCD — fall back to the LAST
    // comment-fitting signature instead of refusing to locate the
    // record; the directory walk below then accepts or rejects it on
    // its own checks
    if (eocd < 0) eocd = loose
    if (eocd < 0) return None
    var n: Long = u16(b, eocd + 10).toLong
    var cdSize = u32(b, eocd + 12)
    var cdOff = u32(b, eocd + 16)
    // ZIP64: any sentinel field routes through the ZIP64 EOCD locator
    // (20 bytes immediately before the classic EOCD) to the ZIP64 EOCD
    // record, whose 64-bit count/size/offset replace the sentinels —
    // the form every >4 GiB or >65534-entry archive ships in
    if (cdOff == 0xffffffffL || cdSize == 0xffffffffL || n == 0xffffL) {
      val loc = eocd - 20
      if (loc < 0 || u32(b, loc) != 0x07064b50L) return None
      val z = u64(b, loc + 8)
      if (z < 0 || z + 56 > loc || u32(b, z.toInt) != 0x06064b50L) return None
      n = u64(b, z.toInt + 32)
      cdSize = u64(b, z.toInt + 40)
      cdOff = u64(b, z.toInt + 48)
    }
    if (cdOff + cdSize > eocd) return None
    // REBASED archive (a self-extractor stub or other prepended bytes
    // shift every stored offset short by the prefix length): when the
    // declared offset misses the directory, the true directory still
    // ends where the tail records begin — recover the shift from that
    // invariant (Info-ZIP's trick) and apply it to every offset below
    val shift: Long =
      if (n == 0L || u32(b, cdOff.toInt) == 0x02014b50L) 0L
      else {
        val d = eocd - cdOff - cdSize
        if (d > 0 && cdOff + d + 4 <= b.length &&
          u32(b, (cdOff + d).toInt) == 0x02014b50L) d
        else return None
      }
    val out = Vector.newBuilder[ZipMember]
    var at = cdOff + shift
    var k = 0L
    while (k < n) {
      if (at + 46 > eocd || u32(b, at.toInt) != 0x02014b50L) return None
      val a = at.toInt
      val method = u16(b, a + 10)
      val crc = u32(b, a + 16)
      var csize = u32(b, a + 20)
      var size = u32(b, a + 24)
      val nameLen = u16(b, a + 28)
      val extraLen = u16(b, a + 30)
      val commentLen = u16(b, a + 32)
      var lho = u32(b, a + 42)
      if (a + 46 + nameLen + extraLen > eocd) return None
      val name = new String(b, a + 46, nameLen, "US-ASCII")
      // per-entry ZIP64 extra field (id 0x0001): 64-bit values for
      // exactly the sentineled fields, in APPNOTE order (size, csize,
      // then local-header offset)
      if (csize == 0xffffffffL || size == 0xffffffffL ||
        lho == 0xffffffffL) {
        var e = a + 46 + nameLen
        val eEnd = e + extraLen
        var found = false
        while (e + 4 <= eEnd && !found) {
          val id = u16(b, e)
          val len = u16(b, e + 2)
          if (id == 0x0001) {
            var f = e + 4
            if (size == 0xffffffffL) { size = u64(b, f); f += 8 }
            if (csize == 0xffffffffL) { csize = u64(b, f); f += 8 }
            if (lho == 0xffffffffL) { lho = u64(b, f); f += 8 }
            if (f > e + 4 + len) return None
            found = true
          } else e += 4 + len
        }
        if (!found) return None
      }
      lho += shift
      // through the local header to the data
      if (lho + 30 > b.length || u32(b, lho.toInt) != 0x04034b50L) return None
      val l = lho.toInt
      val lNameLen = u16(b, l + 26)
      val lExtraLen = u16(b, l + 28)
      val dataAt = lho + 30 + lNameLen + lExtraLen
      if (dataAt + csize > b.length) return None
      val payload = method match {
        case 0 =>
          if (csize != size) return None
          java.util.Arrays.copyOfRange(b, dataAt.toInt, (dataAt + csize).toInt)
        case 8 =>
          val inf = new Inflater(true)
          inf.setInput(b, dataAt.toInt, csize.toInt)
          val chunk = new Array[Byte](8192)
          val bo = new java.io.ByteArrayOutputStream()
          while (!inf.finished()) {
            val m = inf.inflate(chunk)
            if (m == 0 && !inf.finished()) { inf.end(); return None }
            bo.write(chunk, 0, m)
          }
          inf.end()
          val raw = bo.toByteArray
          if (raw.length.toLong != size) return None
          raw
        case _ => return None // other methods out of scope
      }
      val check = new CRC32
      check.update(payload)
      if (check.getValue != crc) return None
      out += ZipMember(name, method, csize, size, payload)
      at += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.result())
  } catch { case _: Exception => None }
}
