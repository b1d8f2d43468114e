package graft.functions

import scala.collection.immutable.ListMap

/** One parsed WARC record: `offset` is the byte position of its version
  * line within the file blob, `headers` preserve declaration order.
  */
final case class WarcRecord(
    offset: Long,
    version: String,
    headers: ListMap[String, String],
    payload: String)

/** Strict WARC (ISO 28500 / WARC-1.1) file parser over an ASCII blob.
  *
  * Grammar parsed: each record is a `WARC/x.y` version line, CRLF-terminated
  * named header lines, one blank line, exactly `Content-Length` payload
  * bytes, then the two-CRLF record separator. Boundaries come ONLY from
  * Content-Length — a payload containing the separator byte sequence must
  * parse intact (the census query plants such payloads), which is exactly
  * the property naive split-on-separator "parsers" get wrong.
  *
  * The reference has no ingest-format surface (payloads are opaque strings,
  * /root/reference/lib/redix/stream.ex:25-38); this makes the standard
  * web-archive container a first-class source the way Mp4.scala does for
  * ISO-BMFF. Every malformation fails loudly with its byte offset: no
  * silent resync, a corrupt archive should never half-load.
  */
object Warc {

  def parse(blob: String): Vector[WarcRecord] = {
    val n = blob.length
    val out = Vector.newBuilder[WarcRecord]
    var off = 0
    while (off < n) {
      val start = off
      val vEol = blob.indexOf("\r\n", off)
      require(vEol >= 0, s"truncated version line at byte $start")
      val version = blob.substring(off, vEol)
      require(version.startsWith("WARC/"),
        s"record at byte $start does not open with a WARC/ version line")
      off = vEol + 2
      var headers = ListMap.empty[String, String]
      var blank = false
      while (!blank) {
        val hEol = blob.indexOf("\r\n", off)
        require(hEol >= 0, s"truncated header block at byte $off")
        val line = blob.substring(off, hEol)
        off = hEol + 2
        if (line.isEmpty) blank = true
        else {
          val colon = line.indexOf(':')
          require(colon > 0, s"malformed header '$line' at byte $off")
          headers += line.substring(0, colon).trim ->
            line.substring(colon + 1).trim
        }
      }
      val cl = headers.getOrElse("Content-Length",
        throw new IllegalArgumentException(
          s"record at byte $start has no Content-Length header"))
      val len = cl.toLong
      require(len >= 0 && len <= n - off - 4,
        s"record at byte $start declares Content-Length $len " +
          s"exceeding the remaining ${n - off} bytes")
      val payload = blob.substring(off, off + len.toInt)
      off += len.toInt
      require(blob.startsWith("\r\n\r\n", off),
        s"record at byte $start missing the two-CRLF separator at byte $off")
      off += 4
      out += WarcRecord(start.toLong, version, headers, payload)
    }
    out.result()
  }
}
