package graft

import graft.multimodal.Mp4
import org.scalacheck.Prop.propBoolean
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws for the ISO BMFF walker over RANDOM fixture shapes —
  * Mp4Spec pins specific layouts; these pin the grammar itself: the walk
  * must invert the encoder for any track count / payload length / header
  * form, boxes must tile their parents exactly (no gaps, no overlaps),
  * and truncating a valid file anywhere strictly inside a box header or
  * payload must throw rather than misreport.
  */
object Mp4Props extends Properties("Mp4") {

  private val genFile: Gen[(Int, Long, Array[Byte], Boolean)] = for {
    nt <- Gen.chooseNum(1, 5)
    dur <- Gen.chooseNum(1L, 3600000L)
    plen <- Gen.chooseNum(0, 512)
    large <- Gen.oneOf(true, false)
    seed <- Gen.chooseNum(0L, 255L)
  } yield (nt, dur, Array.tabulate(plen)(i => ((seed + 7L * i) % 256).toByte),
    large)

  property("walk inverts encode for any shape") = Prop.forAll(genFile) {
    case (nt, dur, payload, large) =>
      val tracks = (1 to nt).map(t => Mp4.TrackSpec(t, 16 + t, 8 + t))
      val bytes = Mp4.encodeMp4(tracks, dur, payload, large)
      val boxes = Mp4.walkBoxes(bytes)
      val mdat = boxes.find(_.fourcc == "mdat").get
      (boxes.size == 4 + 5 * nt) :| "census" &&
        (boxes.count(_.fourcc == "trak") == nt) :| "tracks" &&
        (Mp4.parseMvhd(bytes) == ((1000L, dur))) :| "mvhd" &&
        (mdat.payloadOff - mdat.off == (if (large) 16L else 8L)) :| "hdr form" &&
        (mdat.off + mdat.size - mdat.payloadOff == payload.length) :| "payload len" &&
        bytes.slice(mdat.payloadOff.toInt, (mdat.off + mdat.size).toInt)
          .sameElements(payload) :| "payload bytes"
  }

  property("siblings tile their parent exactly (no gaps, no overlaps)") =
    Prop.forAll(genFile) { case (nt, dur, payload, large) =>
      val tracks = (1 to nt).map(t => Mp4.TrackSpec(t, 16, 8))
      val bytes = Mp4.encodeMp4(tracks, dur, payload, large)
      val boxes = Mp4.walkBoxes(bytes)
      // per depth-1: top-level boxes tile [0, len); children tile their
      // parent's payload range
      def tiles(bs: Seq[Mp4.Box], start: Long, end: Long): Boolean =
        bs.sortBy(_.off).foldLeft(Option(start)) {
          case (Some(pos), b) if b.off == pos => Some(b.off + b.size)
          case _ => None
        }.contains(end)
      val top = boxes.filter(_.depth == 1)
      val parents = boxes.filter(b => Set("moov", "trak", "mdia")(b.fourcc))
      tiles(top, 0L, bytes.length.toLong) :| "top level tiles file" &&
        Prop.all(parents.map { p =>
          val kids = boxes.filter(c => c.depth == p.depth + 1 &&
            c.off >= p.payloadOff && c.off < p.off + p.size)
          tiles(kids, p.payloadOff, p.off + p.size) :| s"${p.fourcc} tiled"
        }: _*)
    }

  property("any strict truncation of the file is rejected") =
    Prop.forAll(genFile, Gen.chooseNum(1, 64)) { (t, cut) =>
      truncationLaw(t, cut)
    }

  private def truncationLaw(t: (Int, Long, Array[Byte], Boolean),
      cut: Int): Prop = {
    val (nt, dur, payload, large) = t;
    {
        val bytes = Mp4.encodeMp4(
          (1 to nt).map(t => Mp4.TrackSpec(t, 16, 8)), dur, payload, large)
        // clamp into [1, len-1] OURSELVES: ScalaCheck shrinking ignores
        // generator bounds, and an unclamped shrink to cut = 0 "falsifies"
        // the law on a file that was never truncated at all
        val effCut = math.max(1, math.min(cut, bytes.length - 1))
        val mdatSize = (if (large) 16 else 8) + payload.length
        val truncated = bytes.take(bytes.length - effCut)
        if (effCut == mdatSize) {
          // the cut removed EXACTLY the trailing mdat box: the prefix
          // tiles completely, so the box GRAMMAR accepts it (walkBoxes
          // is a structural walker; whole-box truncation is a semantic
          // question for the census layer, not a grammar error)
          val cleanPrefix: Prop =
            Mp4.walkBoxes(truncated).forall(_.fourcc != "mdat")
          cleanPrefix :| "clean prefix, mdat gone"
        } else {
          Prop.throws(classOf[IllegalArgumentException])(
            Mp4.walkBoxes(truncated))
        }
    }
  }

  private val genSampled: Gen[(Seq[Mp4.SampleTrackSpec], Long, Long, Boolean)] =
    for {
      nt <- Gen.chooseNum(1, 4)
      dur <- Gen.chooseNum(1000L, 60000L)
      seed <- Gen.chooseNum(0L, 255L)
      co64 <- Gen.oneOf(true, false)
      specs <- Gen.sequence[Seq[Mp4.SampleTrackSpec], Mp4.SampleTrackSpec](
        (1 to nt).map { t =>
          for {
            ns <- Gen.chooseNum(1, 12)
            spc <- Gen.chooseNum(1, 4)
            szs <- Gen.listOfN(ns, Gen.chooseNum(1, 64))
          } yield Mp4.SampleTrackSpec(t, szs, spc, dur / ns)
        })
    } yield (specs, dur, seed, co64)

  property("sample tables: parse inverts encodeMp4Samples, offsets land in " +
    "mdat, chunks tile the payload in order") =
    Prop.forAll(genSampled) { case (specs, dur, seed, co64) =>
      val bytes = Mp4.encodeMp4Samples(specs, dur, seed, co64)
      val tabs = Mp4.parseSampleTables(bytes)
      val mdat = Mp4.walkBoxes(bytes).find(_.fourcc == "mdat").get
      val chunkSpans = tabs.flatMap { tb =>
        tb.chunkOffsets.zip(tb.sampleSizes
          .grouped(tb.samplesPerChunk.toInt).map(_.sum).toVector)
      }
      (tabs.size == specs.size) :| "one table per track" &&
        tabs.zip(specs).forall { case (tb, sp) =>
          tb.trackId == sp.trackId &&
            tb.sampleSizes == sp.sampleSizes.map(_.toLong).toVector &&
            tb.samplesPerChunk == sp.samplesPerChunk &&
            tb.sttsDurTicks == sp.sampleSizes.size * sp.deltaTicks
        } :| "per-track fields inverted" &&
        // chunks tile the mdat payload exactly, in file order
        chunkSpans.foldLeft(Option(mdat.payloadOff)) {
          case (Some(pos), (o, cs)) if o == pos => Some(o + cs)
          case _ => None
        }.contains(mdat.off + mdat.size) :| "chunks tile mdat" &&
        (chunkSpans.map(_._2).sum ==
          mdat.off + mdat.size - mdat.payloadOff) :| "stsz sums to mdat bytes"
    }

  property("a truncated/over-declaring stsz fails loudly") =
    Prop.forAll(genSampled) { case (specs, dur, seed, co64) =>
      val bytes = Mp4.encodeMp4Samples(specs, dur, seed, co64)
      // corrupt the FIRST stsz: bump its declared sample_count by one —
      // the box now under-carries; a lenient parser would misreport the
      // census instead of rejecting
      val stsz = Mp4.walkBoxes(bytes).find(_.fourcc == "stsz").get
      val cnt = (stsz.payloadOff + 8).toInt
      val n = java.nio.ByteBuffer.wrap(bytes, cnt, 4).getInt
      val bad = bytes.clone()
      java.nio.ByteBuffer.wrap(bad, cnt, 4).putInt(n + 1)
      Prop.throws(classOf[IllegalArgumentException])(
        Mp4.parseSampleTables(bad))
    }

  property("fragmented: walk inverts encodeFmp4 and sequences are 1..k") =
    Prop.forAll(Gen.chooseNum(1, 6), Gen.chooseNum(0L, 99L)) { (k, seed) =>
      val frags = (1 to k).map(f =>
        Array.tabulate((8 + (seed + f) % 32).toInt)(i =>
          ((seed + 11L * f + 3L * i) % 256).toByte))
      val bytes = Mp4.encodeFmp4(Mp4.TrackSpec(1, 16, 8), 1000L, frags)
      val boxes = Mp4.walkBoxes(bytes)
      (Mp4.mfhdSeqs(bytes) == (1L to k.toLong)) :| "sequence continuity" &&
        (boxes.count(_.fourcc == "moof") == k) :| "fragment count" &&
        boxes.filter(_.fourcc == "mdat").zip(frags).forall { case (b, p) =>
          bytes.slice(b.payloadOff.toInt, (b.off + b.size).toInt)
            .sameElements(p)
        } :| "fragment payloads byte-exact"
    }
}
