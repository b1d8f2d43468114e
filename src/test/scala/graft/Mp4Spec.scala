package graft

import graft.multimodal.Mp4
import org.scalatest.funsuite.AnyFunSuite

/** The ISO BMFF walker must parse real box grammar — 32-bit headers,
  * 64-bit largesize, size==0 (to end of file) — and reject malformed
  * structure loudly rather than misreport a provenance manifest.
  */
class Mp4Spec extends AnyFunSuite {

  private def fixture(id: Long): Array[Byte] = {
    val nt = (1 + id % 3).toInt
    val tracks = (1 to nt).map(t =>
      Mp4.TrackSpec(t, 16 + ((id + t) % 16).toInt, 8 + ((id + t) % 8).toInt))
    val payload = Array.tabulate((64 + id % 256).toInt)(i =>
      ((id + 7L * i) % 256).toByte)
    Mp4.encodeMp4(tracks, 1000L * (1 + id % 60), payload,
      mdatLargesize = id % 2 == 0)
  }

  test("box census matches the closed-form layout for both header forms") {
    for (id <- Seq(0L, 1L, 2L, 5L, 59L, 255L, 256L)) {
      val bytes = fixture(id)
      val nt = (1 + id % 3).toInt
      val boxes = Mp4.walkBoxes(bytes)
      assert(boxes.size == 4 + 5 * nt, s"id=$id census")
      assert(boxes.count(_.fourcc == "trak") == nt)
      assert(boxes.map(_.depth).max == 4) // moov>trak>mdia>mdhd
      assert(bytes.length == 24 + 116 + 178 * nt +
        (if (id % 2 == 0) 16 else 8) + (64 + id % 256).toInt)
      val mdat = boxes.find(_.fourcc == "mdat").get
      assert(mdat.payloadOff - mdat.off == (if (id % 2 == 0) 16 else 8))
      assert(mdat.off + mdat.size == bytes.length)
      assert(Mp4.parseMvhd(bytes) == ((1000L, 1000L * (1 + id % 60))))
      assert(Mp4.isMp4(bytes))
    }
  }

  test("file order: parents precede children, siblings in byte order") {
    val boxes = Mp4.walkBoxes(fixture(1L)) // nt = 2
    assert(boxes.map(_.fourcc) == Vector("ftyp", "moov", "mvhd",
      "trak", "tkhd", "mdia", "mdhd", "hdlr",
      "trak", "tkhd", "mdia", "mdhd", "hdlr", "mdat"))
    assert(boxes.map(_.off) == boxes.map(_.off).sorted)
  }

  test("size==0 means the box runs to end of file") {
    val b = java.nio.ByteBuffer.allocate(20)
    b.putInt(0).put("mdat".getBytes("US-ASCII")).putLong(0x1122334455667788L)
      .putInt(0x99aabbcc)
    val boxes = Mp4.walkBoxes(b.array())
    assert(boxes == Vector(Mp4.Box("mdat", 1, 0L, 20L, 8L)))
  }

  test("fragmented MP4: census, sequence continuity, and payload sizes") {
    for (id <- Seq(0L, 1L, 3L, 7L, 64L)) {
      val k = (1 + id % 4).toInt
      val frags = (1 to k).map { f =>
        Array.tabulate((32 + (id + 17L * f) % 64).toInt)(i =>
          ((id + 11L * f + 3L * i) % 256).toByte)
      }
      val bytes = Mp4.encodeFmp4(Mp4.TrackSpec(1, 16, 8), 5000L, frags)
      val boxes = Mp4.walkBoxes(bytes)
      assert(boxes.size == 10 + 5 * k)
      assert(boxes.count(_.fourcc == "moof") == k)
      assert(boxes.count(_.fourcc == "mdat") == k)
      assert(Mp4.mfhdSeqs(bytes) == (1L to k.toLong))
      assert(bytes.length == 358 + frags.map(56 + _.length).sum)
      assert(Mp4.parseMvhd(bytes) == ((1000L, 5000L)))
      // fragment payloads land byte-exactly at their mdat offsets
      boxes.filter(_.fourcc == "mdat").zip(frags).foreach { case (b, p) =>
        assert(b.off + b.size - b.payloadOff == p.length)
        assert(bytes.slice(b.payloadOff.toInt,
          (b.off + b.size).toInt).sameElements(p))
      }
    }
  }

  test("malformed structure fails loudly") {
    val good = fixture(3L)
    // truncated mid-box
    assertThrows[IllegalArgumentException](
      Mp4.walkBoxes(good.take(good.length - 4)))
    // declared size overruns the file
    val over = good.clone()
    over(0) = 0x7f.toByte
    assertThrows[IllegalArgumentException](Mp4.walkBoxes(over))
    // size below the header length
    val tiny = java.nio.ByteBuffer.allocate(8)
    tiny.putInt(4).put("free".getBytes("US-ASCII"))
    assertThrows[IllegalArgumentException](Mp4.walkBoxes(tiny.array()))
  }
}
