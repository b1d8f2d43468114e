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

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    b.putInt(8 + payload.length).put(fourcc.getBytes(US_ASCII)).put(payload)
    b.array()
  }
  private def full(fourcc: String, body: ByteBuffer => Unit, size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    b.putInt(0) // version 0, flags 0
    body(b)
    require(!b.hasRemaining, s"$fourcc payload under-filled")
    box(fourcc, b.array())
  }

  /** Build a structurally-real MP4: ftyp + moov(mvhd + N×trak(tkhd +
    * mdia(mdhd + hdlr))) + mdat. `durationMs` lands in mvhd/tkhd with
    * timescale 1000; `mdatLargesize` writes mdat with the 16-byte
    * size==1 + largesize header so walkers must handle the 64-bit form.
    */
  def encodeMp4(tracks: Seq[TrackSpec], durationMs: Long,
      mdatPayload: Array[Byte], mdatLargesize: Boolean): Array[Byte] = {
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

  /** One fixture track with a REAL sample table (14496-12 §8.5-8.7):
    * per-sample sizes (stsz), one constant time delta (stts), a constant
    * samples-per-chunk packing (stsc), and chunk offsets (stco or co64).
    */
  final case class SampleTrackSpec(trackId: Int, sampleSizes: Seq[Int],
      samplesPerChunk: Int, deltaTicks: Long)

  /** Parsed per-track sample census, every field read from stbl bytes. */
  final case class TrackSampleTable(trackId: Long, sampleSizes: Vector[Long],
      sttsDurTicks: Long, samplesPerChunk: Long, chunkOffsets: Vector[Long])

  /** Build an MP4 whose tracks carry real sample tables, with mdat laid
    * out track-by-track, chunked per stsc, and chunk offsets pointing at
    * the ACTUAL absolute file positions (the circular moov-size/offset
    * dependency resolved by building moov twice — sizes don't depend on
    * offset values). mdat payload byte i (0-based) is `(seed + 13*i) % 256`
    * so byte-sum probes replay in closed form. `co64` writes 64-bit chunk
    * offsets (and exercises the wide form); stco otherwise.
    */
  def encodeMp4Samples(tracks: Seq[SampleTrackSpec], durationMs: Long,
      seed: Long, co64: Boolean): Array[Byte] = {
    val totalSampleBytes = tracks.map(_.sampleSizes.map(_.toLong).sum).sum
    def chunkSizes(t: SampleTrackSpec): Seq[Long] =
      t.sampleSizes.grouped(t.samplesPerChunk).map(_.map(_.toLong).sum).toSeq
    def trakBytes(t: SampleTrackSpec, offsets: Seq[Long]): Array[Byte] = {
      val tkhd = full("tkhd", { b =>
        b.putInt(0).putInt(0).putInt(t.trackId).putInt(0)
        b.putInt(durationMs.toInt)
        b.putLong(0)
        b.putShort(0).putShort(0).putShort(0).putShort(0)
        b.putInt(0x00010000).putInt(0).putInt(0)
        b.putInt(0).putInt(0x00010000).putInt(0)
        b.putInt(0).putInt(0).putInt(0x40000000)
        b.putInt(16 << 16).putInt(8 << 16)
      }, 84)
      val mdhd = full("mdhd", { b =>
        b.putInt(0).putInt(0).putInt(1000).putInt(durationMs.toInt)
        b.putShort(0x55c4.toShort).putShort(0)
      }, 24)
      val hdlr = full("hdlr", { b =>
        b.putInt(0).put("vide".getBytes(US_ASCII))
        b.putInt(0).putInt(0).putInt(0)
        b.put("graft".getBytes(US_ASCII)).put(0.toByte)
      }, 30)
      val n = t.sampleSizes.size
      val stsz = full("stsz", { b =>
        b.putInt(0) // sample_size 0 = per-sample table follows
        b.putInt(n)
        t.sampleSizes.foreach(b.putInt)
      }, 12 + 4 * n)
      val stts = full("stts", { b =>
        b.putInt(1) // entry_count
        b.putInt(n).putInt(t.deltaTicks.toInt)
      }, 16)
      val stsc = full("stsc", { b =>
        b.putInt(1) // entry_count
        b.putInt(1).putInt(t.samplesPerChunk).putInt(1)
      }, 20)
      val co =
        if (co64) full("co64", { b =>
          b.putInt(offsets.size)
          offsets.foreach(b.putLong)
        }, 8 + 8 * offsets.size)
        else full("stco", { b =>
          b.putInt(offsets.size)
          offsets.foreach(o => b.putInt(o.toInt))
        }, 8 + 4 * offsets.size)
      val stbl = box("stbl", stsz ++ stts ++ stsc ++ co)
      box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ box("minf", stbl)))
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes(US_ASCII)).putInt(512)
      b.put("isom".getBytes(US_ASCII)).put("mp41".getBytes(US_ASCII))
      b.array()
    })
    val mvhd = full("mvhd", { b =>
      b.putInt(0).putInt(0)
      b.putInt(1000).putInt(durationMs.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.putLong(0)
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => b.putInt(0))
      b.putInt(tracks.size + 1)
    }, 100)
    // pass 1: zero offsets, only to learn moov's byte length
    val zeroMoov = box("moov",
      mvhd ++ tracks.flatMap(t => trakBytes(t, chunkSizes(t).map(_ => 0L))))
    val mdatPayloadStart = ftyp.length.toLong + zeroMoov.length + 8
    // real offsets: tracks laid out in order, chunks in order within track
    var cursor = mdatPayloadStart
    val offsets = tracks.map { t =>
      chunkSizes(t).map { cs => val o = cursor; cursor += cs; o }
    }
    val moov = box("moov",
      mvhd ++ tracks.zip(offsets).flatMap { case (t, o) => trakBytes(t, o) })
    require(moov.length == zeroMoov.length, "moov size drifted between passes")
    val payload = Array.tabulate(totalSampleBytes.toInt)(
      i => ((seed + 13L * i) % 256).toByte)
    ftyp ++ moov ++ box("mdat", payload)
  }

  /** Per-track sample tables, every value parsed from stbl bytes. Strict:
    * a declared count that exceeds its box payload fails loudly (a
    * truncated stsz silently under-reading is how a sample census rots).
    */
  def parseSampleTables(bytes: Array[Byte]): Vector[TrackSampleTable] = {
    val boxes = walkBoxes(bytes)
    def u32(off: Long): Long =
      ByteBuffer.wrap(bytes, off.toInt, 4).order(ByteOrder.BIG_ENDIAN)
        .getInt.toLong & 0xffffffffL
    def payloadLen(b: Box): Long = b.off + b.size - b.payloadOff
    // group stbl leaves under the preceding trak (file order: parents first)
    val out = Vector.newBuilder[TrackSampleTable]
    var trackId = -1L
    var sizes: Vector[Long] = Vector.empty
    var sttsDur = -1L
    var spc = -1L
    var offs: Vector[Long] = Vector.empty
    var open = false
    def flush(): Unit = if (open) {
      require(trackId >= 0 && sizes.nonEmpty && sttsDur >= 0 && spc > 0,
        s"incomplete sample table for track $trackId")
      val expectChunks = (sizes.size + spc - 1) / spc
      require(offs.size == expectChunks,
        s"track $trackId: ${offs.size} chunk offsets, stsz/stsc imply $expectChunks")
      out += TrackSampleTable(trackId, sizes, sttsDur, spc, offs)
      open = false; trackId = -1L; sizes = Vector.empty
      sttsDur = -1L; spc = -1L; offs = Vector.empty
    }
    boxes.foreach { b =>
      b.fourcc match {
        case "trak" => flush()
        case "tkhd" =>
          trackId = u32(b.payloadOff + 12)
        case "stsz" =>
          val n = u32(b.payloadOff + 8)
          require(payloadLen(b) == 12 + 4 * n,
            s"stsz declares $n samples but carries ${(payloadLen(b) - 12) / 4}")
          sizes = (0L until n).map(j => u32(b.payloadOff + 12 + 4 * j)).toVector
          open = true
        case "stts" =>
          val n = u32(b.payloadOff + 4)
          require(payloadLen(b) == 8 + 8 * n,
            s"stts declares $n entries but payload is ${payloadLen(b)} bytes")
          sttsDur = (0L until n).map(j =>
            u32(b.payloadOff + 8 + 8 * j) * u32(b.payloadOff + 12 + 8 * j)).sum
          open = true
        case "stsc" =>
          val n = u32(b.payloadOff + 4)
          require(payloadLen(b) == 8 + 12 * n,
            s"stsc declares $n entries but payload is ${payloadLen(b)} bytes")
          require(n == 1, "fixture scope: one constant samples-per-chunk run")
          spc = u32(b.payloadOff + 12)
          open = true
        case "stco" =>
          val n = u32(b.payloadOff + 4)
          require(payloadLen(b) == 8 + 4 * n,
            s"stco declares $n entries but payload is ${payloadLen(b)} bytes")
          offs = (0L until n).map(j => u32(b.payloadOff + 8 + 4 * j)).toVector
          open = true
        case "co64" =>
          val n = u32(b.payloadOff + 4)
          require(payloadLen(b) == 8 + 8 * n,
            s"co64 declares $n entries but payload is ${payloadLen(b)} bytes")
          offs = (0L until n).map(j => ByteBuffer.wrap(bytes,
            (b.payloadOff + 8 + 8 * j).toInt, 8)
            .order(ByteOrder.BIG_ENDIAN).getLong).toVector
          open = true
        case _ => ()
      }
    }
    flush()
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
