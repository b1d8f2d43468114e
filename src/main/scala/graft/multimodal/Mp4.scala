package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.{ByteBuffer, ByteOrder}

/** ISO BMFF (MP4) CONTAINER walk — structure only, no codec. The honest
  * scope note from the multimodal family applies: no pure-JVM H.264/AAC
  * decoder exists offline, so SAMPLE decode stays a documented stand-in;
  * what a 100 TB curation pipeline needs from video files first, though,
  * is container METADATA — track counts, durations, box inventory,
  * payload sizes — for manifests and provenance (the role q146's RIFF
  * walk plays for WAV). This parses the real binary box grammar of
  * ISO/IEC 14496-12: big-endian 32-bit size+fourcc headers, 64-bit
  * `largesize` when size==1, size==0 meaning "to end of file", and
  * recursion into the pure-container boxes.
  *
  * The reference carries only flat string payloads
  * (/root/reference/lib/stream.ex:15-16); this is engine surface for
  * training-data pipelines.
  */
object Mp4 {

  /** One parsed box: fourcc type, 1-based nesting depth, byte offset of
    * the box itself, total box size in bytes (header included), payload
    * byte offset in the file. Leaf payload length = off + size - payloadOff.
    */
  final case class Box(fourcc: String, depth: Int, off: Long, size: Long,
      payloadOff: Long)

  /** Pure-container boxes per 14496-12 §8 — their payload is child boxes. */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl",
    "edts", "mvex", "moof", "traf", "udta")

  /** Spec for one fixture track (all fields closed-form in the oracle). */
  final case class TrackSpec(trackId: Int, widthPx: Int, heightPx: Int)

  /** Build a structurally-real MP4: ftyp + moov(mvhd + N×trak(tkhd +
    * mdia(mdhd + hdlr))) + mdat. `durationMs` lands in mvhd/tkhd with
    * timescale 1000; `mdatLargesize` writes mdat with the 16-byte
    * size==1 + largesize header so walkers must handle the 64-bit form.
    */
  def encodeMp4(tracks: Seq[TrackSpec], durationMs: Long,
      mdatPayload: Array[Byte], mdatLargesize: Boolean): Array[Byte] = {
    def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(fourcc.getBytes(US_ASCII)).put(payload)
      b.array()
    }
    def full(fourcc: String, body: ByteBuffer => Unit, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version 0, flags 0
      body(b)
      require(!b.hasRemaining, s"$fourcc payload under-filled")
      box(fourcc, b.array())
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes(US_ASCII)).putInt(512)
      b.put("isom".getBytes(US_ASCII)).put("mp41".getBytes(US_ASCII))
      b.array()
    })
    val mvhd = full("mvhd", { b =>
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(1000).putInt(durationMs.toInt) // timescale 1000 = ms
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, rsvd
      b.putLong(0) // reserved
      // unity matrix
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(tracks.size + 1) // next_track_ID
    }, 100)
    val traks = tracks.map { t =>
      val tkhd = full("tkhd", { b =>
        b.putInt(0).putInt(0).putInt(t.trackId).putInt(0)
        b.putInt(durationMs.toInt)
        b.putLong(0) // reserved
        b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/rsvd
        b.putInt(0x00010000).putInt(0).putInt(0)
        b.putInt(0).putInt(0x00010000).putInt(0)
        b.putInt(0).putInt(0).putInt(0x40000000)
        b.putInt(t.widthPx << 16).putInt(t.heightPx << 16) // 16.16 fixed
      }, 84)
      val mdhd = full("mdhd", { b =>
        b.putInt(0).putInt(0).putInt(1000).putInt(durationMs.toInt)
        b.putShort(0x55c4.toShort).putShort(0) // language "und", pre_defined
      }, 24)
      val hdlr = full("hdlr", { b =>
        b.putInt(0).put("vide".getBytes(US_ASCII))
        b.putInt(0).putInt(0).putInt(0) // reserved
        b.put("graft".getBytes(US_ASCII)).put(0.toByte) // NUL-terminated name
      }, 30)
      box("trak", tkhd ++ box("mdia", mdhd ++ hdlr))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    val mdat =
      if (mdatLargesize) {
        val b = ByteBuffer.allocate(16 + mdatPayload.length)
          .order(ByteOrder.BIG_ENDIAN)
        b.putInt(1).put("mdat".getBytes(US_ASCII))
        b.putLong(16L + mdatPayload.length).put(mdatPayload)
        b.array()
      } else box("mdat", mdatPayload)
    ftyp ++ moov ++ mdat
  }

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Fragmented MP4 (the CMAF/DASH/HLS shape): ftyp + moov(mvhd +
    * mvex(trex) + trak) + per fragment [moof(mfhd(seq) + traf(tfhd)) +
    * mdat]. Sequence numbers are 1-based in fragment order — the
    * continuity a segment-ingest pipeline must verify before stitching.
    */
  def encodeFmp4(track: TrackSpec, durationMs: Long,
      fragments: Seq[Array[Byte]]): Array[Byte] = {
    val whole = encodeMp4(Seq(track), durationMs,
      mdatPayload = Array.emptyByteArray, mdatLargesize = false)
    // reuse the unfragmented encoder's ftyp + moov, dropping its empty
    // mdat (8 bytes) and splicing mvex(trex) into moov
    val head = whole.dropRight(8)
    val trex = {
      val b = ByteBuffer.allocate(32).order(ByteOrder.BIG_ENDIAN)
      b.putInt(32).put("trex".getBytes(US_ASCII))
      b.putInt(0) // version/flags
      b.putInt(track.trackId).putInt(1).putInt(0).putInt(0)
      b.array()
    }
    val mvex = {
      val b = ByteBuffer.allocate(8 + trex.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(8 + trex.length).put("mvex".getBytes(US_ASCII)).put(trex)
      b.array()
    }
    // grow moov's declared size and insert mvex right after mvhd
    val ftypLen = 24
    val moovSize = ByteBuffer.wrap(head, ftypLen, 4)
      .order(ByteOrder.BIG_ENDIAN).getInt
    val out = ByteBuffer.allocate(head.length + mvex.length +
        fragments.map(f => 56 + f.length).sum)
      .order(ByteOrder.BIG_ENDIAN)
    out.put(head, 0, ftypLen)
    out.putInt(moovSize + mvex.length).put("moov".getBytes(US_ASCII))
    out.put(head, ftypLen + 8, 108) // mvhd verbatim
    out.put(mvex)
    out.put(head, ftypLen + 8 + 108, head.length - ftypLen - 8 - 108) // trak
    fragments.zipWithIndex.foreach { case (p, f0) =>
      out.putInt(48).put("moof".getBytes(US_ASCII))
      out.putInt(16).put("mfhd".getBytes(US_ASCII))
      out.putInt(0).putInt(f0 + 1) // sequence_number, 1-based
      out.putInt(24).put("traf".getBytes(US_ASCII))
      out.putInt(16).put("tfhd".getBytes(US_ASCII))
      out.putInt(0).putInt(track.trackId)
      out.putInt(8 + p.length).put("mdat".getBytes(US_ASCII)).put(p)
    }
    require(!out.hasRemaining, "fMP4 size accounting drifted")
    out.array()
  }

  /** mfhd sequence numbers in file order, from the walked tree. */
  def mfhdSeqs(bytes: Array[Byte]): Vector[Long] =
    walkBoxes(bytes).filter(_.fourcc == "mfhd").map { b =>
      val buf = ByteBuffer.wrap(bytes, b.payloadOff.toInt, 8)
        .order(ByteOrder.BIG_ENDIAN)
      buf.getInt // version/flags
      buf.getInt.toLong & 0xffffffffL
    }

  /** Walk the full box tree. Returns boxes in file order (parents before
    * children). Rejects truncated/overlapping structure loudly — a
    * provenance manifest built on a silently-misparsed container is
    * worse than a failure.
    */
  def walkBoxes(bytes: Array[Byte]): Vector[Box] = {
    val out = Vector.newBuilder[Box]
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      while (off < end) {
        require(end - off >= 8, s"truncated box header at $off")
        val buf = ByteBuffer.wrap(bytes, off.toInt, (end - off).toInt)
          .order(ByteOrder.BIG_ENDIAN)
        val size32 = buf.getInt.toLong & 0xffffffffL
        val fourcc = {
          val a = new Array[Byte](4); buf.get(a); new String(a, US_ASCII)
        }
        val (size, hdr) =
          if (size32 == 1L) { // 64-bit largesize follows the fourcc
            require(end - off >= 16, s"truncated largesize at $off")
            (buf.getLong, 16L)
          } else if (size32 == 0L) (end - off, 8L) // box runs to end
          else (size32, 8L)
        // overflow-safe form: a hostile 64-bit largesize near Long.MAX would
        // wrap `off + size` and sneak past the range check
        require(size >= hdr && size <= end - off,
          s"box $fourcc at $off: size $size exceeds enclosing range $end")
        out += Box(fourcc, depth, off, size, off + hdr)
        if (Containers(fourcc) && size > hdr)
          walk(off + hdr, off + size, depth + 1)
        off += size
      }
    }
    walk(0L, bytes.length.toLong, 1)
    out.result()
  }

  /** mvhd (version 0) timescale + duration, from the walked tree. */
  def parseMvhd(bytes: Array[Byte]): (Long, Long) = {
    val mvhd = walkBoxes(bytes).find(_.fourcc == "mvhd")
      .getOrElse(throw new IllegalArgumentException("no mvhd box"))
    val b = ByteBuffer.wrap(bytes, mvhd.payloadOff.toInt, 20)
      .order(ByteOrder.BIG_ENDIAN)
    val verflags = b.getInt
    require((verflags >>> 24) == 0, "mvhd version 1 not in fixture scope")
    b.getInt; b.getInt // creation, modification
    (b.getInt.toLong & 0xffffffffL, b.getInt.toLong & 0xffffffffL)
  }
}
