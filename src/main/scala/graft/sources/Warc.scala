package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** WARC-over-gzip corpus ingestion — the container the big public web
  * crawls ship as (reference: the corpus-prep stage of
  * /root/reference/playground.py's pipeline feeds from plain files; a
  * production 100 TB text corpus arrives as *.warc.gz), re-expressed
  * as pure-JVM payload codecs the engine's partition-preserving
  * mapPartitions stages can run: RFC 1952 gzip MEMBERS (each WARC
  * record is its own gzip member, concatenated — the property that
  * makes a crawl file record-splittable without decompressing the
  * whole object) and ISO 28500 WARC records (version line, named
  * headers, Content-Length-delimited payload, CRLF CRLF terminators).
  *
  * The member walker is implemented against the RFC, not delegated to
  * `GZIPInputStream`, for two production reasons: it must surface
  * member BOUNDARIES (the record index a distributed reader splits
  * on), and it must validate each member's CRC32 + ISIZE so a corrupt
  * record drops exactly one record, not the file tail. Decompression
  * itself uses `java.util.zip.Inflater` (the real DEFLATE, as the PNG
  * decoder does).
  */
object Warc {

  // ------------------------------------------------------------------
  // RFC 1952 gzip members
  // ------------------------------------------------------------------

  private val FHCRC = 0x02
  private val FEXTRA = 0x04
  private val FNAME = 0x08
  private val FCOMMENT = 0x10

  /** One gzip member wrapping `raw`: fixed header (MTIME 0, XFL 0,
    * OS 255 = unknown — byte-deterministic), raw-DEFLATE body, CRC32 +
    * ISIZE trailer. */
  def gzipMember(raw: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](math.max(64, raw.length + raw.length / 2 + 64))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      out.write(buf, 0, n)
    }
    deflater.end()
    val crc = new CRC32
    crc.update(raw)
    val t = new Array[Byte](8)
    val c = crc.getValue
    val isize = raw.length.toLong & 0xffffffffL
    var i = 0
    while (i < 4) {
      t(i) = ((c >> (8 * i)) & 0xff).toByte
      t(4 + i) = ((isize >> (8 * i)) & 0xff).toByte
      i += 1
    }
    out.write(t)
    out.toByteArray
  }

  /** Walk a (possibly multi-member) gzip stream: parse each member's
    * header (all optional FLG fields skipped per the RFC), inflate its
    * raw-DEFLATE body, verify CRC32 and ISIZE, and continue at the
    * next member. None on any malformation — bad magic, truncated
    * header, inflate error, trailing garbage, CRC or length
    * mismatch — because a reader that guesses past a broken member
    * cannot trust anything after it. */
  def gzipMembers(b: Array[Byte]): Option[Seq[Array[Byte]]] = try {
    val out = Vector.newBuilder[Array[Byte]]
    var at = 0
    if (b.length == 0) return None
    while (at < b.length) {
      if (at + 10 > b.length) return None
      if ((b(at) & 0xff) != 0x1f || (b(at + 1) & 0xff) != 0x8b || b(at + 2) != 8)
        return None
      val flg = b(at + 3) & 0xff
      var o = at + 10
      if ((flg & FEXTRA) != 0) {
        if (o + 2 > b.length) return None
        val xlen = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        o += 2 + xlen
      }
      if ((flg & FNAME) != 0) { while (o < b.length && b(o) != 0) o += 1; o += 1 }
      if ((flg & FCOMMENT) != 0) { while (o < b.length && b(o) != 0) o += 1; o += 1 }
      if ((flg & FHCRC) != 0) o += 2
      if (o >= b.length) return None
      val inflater = new Inflater(true)
      inflater.setInput(b, o, b.length - o)
      val chunk = new Array[Byte](8192)
      val body = new java.io.ByteArrayOutputStream()
      while (!inflater.finished()) {
        val n = inflater.inflate(chunk)
        if (n == 0 && !inflater.finished()) { inflater.end(); return None }
        body.write(chunk, 0, n)
      }
      val consumed = (b.length - o) - inflater.getRemaining
      inflater.end()
      val raw = body.toByteArray
      val trailerAt = o + consumed
      if (trailerAt + 8 > b.length) return None
      def u32(p: Int): Long =
        (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      val crc = new CRC32
      crc.update(raw)
      if (u32(trailerAt) != crc.getValue) return None
      if (u32(trailerAt + 4) != (raw.length.toLong & 0xffffffffL)) return None
      out += raw
      at = trailerAt + 8
    }
    Some(out.result())
  } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // ISO 28500 WARC records
  // ------------------------------------------------------------------

  final case class WarcRecord(
      recType: String,
      targetUri: String,
      contentLength: Long,
      payload: Array[Byte])

  private val crlf = "\r\n"

  /** One WARC/1.0 record: version line, the named headers the parser
    * pins, Content-Length-delimited payload, CRLF CRLF terminator. */
  def formatRecord(
      recType: String,
      targetUri: String,
      payload: Array[Byte]): Array[Byte] = {
    val header = (s"WARC/1.0$crlf" +
      s"WARC-Type: $recType$crlf" +
      s"WARC-Target-URI: $targetUri$crlf" +
      s"Content-Length: ${payload.length}$crlf" +
      crlf).getBytes("US-ASCII")
    val out = new Array[Byte](header.length + payload.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Parse one record: the version line must read WARC/1.0, headers are
    * case-insensitive name: value pairs up to the first blank line, the
    * payload is exactly Content-Length bytes, and the record must close
    * with CRLF CRLF. None on any violation. */
  def parseRecord(b: Array[Byte]): Option[WarcRecord] = try {
    // find the header/payload split: first CRLF CRLF
    var split = -1
    var i = 0
    while (i + 3 < b.length && split < 0) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        split = i
      i += 1
    }
    if (split < 0) return None
    val head = new String(b, 0, split, "US-ASCII").split("\r\n", -1)
    if (head.isEmpty || head(0) != "WARC/1.0") return None
    var recType: String = null
    var uri: String = null
    var len = -1L
    for (line <- head.drop(1)) {
      val c = line.indexOf(':')
      if (c <= 0) return None
      val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
      val value = line.substring(c + 1).trim
      name match {
        case "warc-type" => recType = value
        case "warc-target-uri" => uri = value
        case "content-length" => len = value.toLong
        case _ => () // unknown headers are legal and skipped
      }
    }
    if (recType == null || len < 0) return None
    val payloadAt = split + 4
    if (payloadAt + len + 4 != b.length.toLong) return None
    if (b(b.length - 4) != '\r' || b(b.length - 3) != '\n' ||
      b(b.length - 2) != '\r' || b(b.length - 1) != '\n') return None
    Some(WarcRecord(recType, if (uri == null) "" else uri, len,
      java.util.Arrays.copyOfRange(b, payloadAt, payloadAt + len.toInt)))
  } catch { case _: Exception => None }

  /** A complete *.warc.gz object: each record formatted and wrapped in
    * its OWN gzip member, members concatenated — the crawl-file layout
    * that keeps records independently splittable. */
  def encodeWarcGz(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (t, u, p) => out.write(gzipMember(formatRecord(t, u, p))) }
    out.toByteArray
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Decode an HTTP/1.1 `Transfer-Encoding: chunked` body (RFC 9112
    * §7.1): hex chunk-size line (chunk extensions after `;` ignored),
    * chunk data, CRLF, repeated to the 0-size chunk, then any trailer
    * fields up to the final blank line. None on any malformation —
    * a bad size line, a chunk running past the buffer, a missing
    * data CRLF, or bytes after the terminator (a length lie). */
  def dechunk(b: Array[Byte]): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream()
    var at = 0
    while (true) {
      val lineEnd = indexOfCrlf(b, at)
      if (lineEnd < 0) return None
      val sizeTok = new String(b, at, lineEnd - at, "US-ASCII")
        .split(";", 2)(0).trim
      if (sizeTok.isEmpty) return None
      val n = java.lang.Long.parseLong(sizeTok, 16)
      if (n < 0 || n > Int.MaxValue) return None
      at = lineEnd + 2
      if (n == 0L) {
        // trailer section: header lines until the blank line
        while (!(at + 1 < b.length && b(at) == '\r' && b(at + 1) == '\n')) {
          val e = indexOfCrlf(b, at)
          if (e < 0) return None
          at = e + 2
        }
        at += 2
        if (at != b.length) return None
        return Some(out.toByteArray)
      }
      if (at + n + 2 > b.length) return None
      out.write(b, at, n.toInt)
      if (b(at + n.toInt) != '\r' || b(at + n.toInt + 1) != '\n') return None
      at += n.toInt + 2
    }
    None
  } catch { case _: Exception => None }

  /** Parse the HTTP response block a WARC response record's payload
    * carries (the actual Common-Crawl layout — the WARC payload is the
    * full HTTP message, not bare HTML): status line, header fields to
    * the first blank line, then the body under its declared framing —
    * `Transfer-Encoding: chunked` bodies are de-chunked, a
    * `Content-Length` body must be exactly that long (a short body is
    * a TRUNCATED capture and drops), and a body with neither framing
    * header is read to the end of the record. Returns (status code,
    * decoded body); None on any malformation. */
  def httpResponseBody(b: Array[Byte]): Option[(Int, Array[Byte])] = try {
    var split = -1
    var i = 0
    while (i + 3 < b.length && split < 0) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        split = i
      i += 1
    }
    if (split < 0) return None
    val head = new String(b, 0, split, "US-ASCII").split("\r\n", -1)
    if (head.isEmpty || !head(0).startsWith("HTTP/1.")) return None
    val statusParts = head(0).split(" ")
    if (statusParts.length < 2) return None
    val status = statusParts(1).toInt
    var chunked = false
    var contentLength = -1L
    for (line <- head.drop(1)) {
      val c = line.indexOf(':')
      if (c <= 0) return None
      val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
      val value = line.substring(c + 1).trim
      name match {
        case "transfer-encoding" =>
          chunked = value.toLowerCase(java.util.Locale.ROOT)
            .split(",").map(_.trim).contains("chunked")
        case "content-length" => contentLength = value.toLong
        case _ => ()
      }
    }
    val body = java.util.Arrays.copyOfRange(b, split + 4, b.length)
    if (chunked) dechunk(body).map(status -> _)
    else if (contentLength >= 0) {
      if (body.length.toLong != contentLength) None // truncated capture
      else Some(status -> body)
    } else Some(status -> body)
  } catch { case _: Exception => None }
}
