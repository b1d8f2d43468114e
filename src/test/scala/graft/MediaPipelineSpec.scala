package graft

import graft.multimodal.{Codecs, MediaPipeline, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pattern(w: Int, h: Int): Codecs.RgbImage = {
    val px = Array.tabulate(3 * w * h)(i => ((i * 7 + 13) % 256).toByte)
    Codecs.RgbImage(w, h, px)
  }

  test("PPM encode/decode round-trips pixels exactly") {
    val img = pattern(37, 23)
    val bytes = Codecs.encodePpm(img)
    assert(Codecs.isPpm(bytes) && !Codecs.isBmp(bytes))
    val back = Codecs.decodePpm(bytes)
    assert(back.width == 37 && back.height == 23)
    assert(back.pixels.toSeq == img.pixels.toSeq)
  }

  test("TIFF encode/decode round-trips pixels exactly and sniffs both byte orders") {
    val img = pattern(41, 19)
    val bytes = Codecs.encodeTiff(img)
    assert(Codecs.isTiff(bytes) && !Codecs.isPng(bytes) && !Codecs.isBmp(bytes))
    val back = Codecs.decode(bytes).get
    assert(back.width == 41 && back.height == 19)
    assert(back.pixels.toSeq == img.pixels.toSeq, "TIFF must be lossless")
    // the sniffer accepts the big-endian header form too
    assert(Codecs.isTiff(Array[Byte]('M', 'M', 0, 0x2a, 0)))
    assert(!Codecs.isTiff(Array[Byte]('M', 'I', 0, 0x2a, 0)))
  }

  test("PPM decode handles header comments and multi-whitespace") {
    val img = pattern(4, 2)
    val withComment = ("P6\n# a netpbm comment\n 4  2\n# another\n255\n"
      .getBytes("US-ASCII")) ++ img.pixels
    val back = Codecs.decodePpm(withComment)
    assert(back.width == 4 && back.height == 2 && back.pixels.toSeq == img.pixels.toSeq)
    intercept[IllegalArgumentException](Codecs.decodePpm("P6\n4 2\n65535\n".getBytes ++ img.pixels))
  }

  test("BMP encode/decode round-trips pixels exactly (incl. row padding)") {
    // width 5 -> 15-byte rows padded to 16: the padding path is exercised
    val img = pattern(5, 3)
    val bytes = Codecs.encodeBmp(img)
    assert(Codecs.isBmp(bytes) && !Codecs.isPpm(bytes))
    assert(bytes.length == 54 + 3 * Codecs.bmpRowBytes(5))
    val back = Codecs.decodeBmp(bytes)
    assert(back.width == 5 && back.height == 3)
    assert(back.pixels.toSeq == img.pixels.toSeq)
  }

  test("BMP decode handles top-down (negative height) rasters") {
    val img = pattern(3, 2)
    val bottomUp = Codecs.encodeBmp(img)
    // flip to top-down: negate height, reorder rows
    val rowBytes = Codecs.bmpRowBytes(3)
    val flipped = bottomUp.clone()
    flipped(22) = (-2 & 0xff).toByte; flipped(23) = 0xff.toByte
    flipped(24) = 0xff.toByte; flipped(25) = 0xff.toByte
    System.arraycopy(bottomUp, 54 + rowBytes, flipped, 54, rowBytes)
    System.arraycopy(bottomUp, 54, flipped, 54 + rowBytes, rowBytes)
    assert(Codecs.decodeBmp(flipped).pixels.toSeq == img.pixels.toSeq)
  }

  test("decode returns None (not a crash) for payloads that merely start like a format") {
    // "BM25 ranking..." passes the 2-byte BMP magic check; the parse must
    // fail into the fallback path, not kill the task
    assert(Codecs.decode("BM25 is a ranking function for text".getBytes("UTF-8")).isEmpty)
    assert(Codecs.decode("P6 engines and the like".getBytes("UTF-8")).isEmpty)
    assert(Codecs.decode(Array[Byte]('B', 'M')).isEmpty) // truncated header
    // and the pipeline-level fallback keeps such records flowing
    val spark2 = spark
    import spark2.implicits._
    val media = spark.createDataset(Seq(
      MediaRecord(9L, "text/plain", "BM25 is a ranking function for text".getBytes("UTF-8"))))
    val f = MediaPipeline.extractFeatures(spark, media).collect()
    assert(f.length == 1 && f.head.width >= 16) // fallback dims, no crash
  }

  test("PPM samples below maxval=255 are rescaled to canonical intensities") {
    // maxval 15: sample 15 is full white and must decode as 255
    val raw = "P6\n2 1\n15\n".getBytes("US-ASCII") ++
      Array[Byte](15, 0, 7, 15, 15, 0)
    val img = Codecs.decodePpm(raw)
    assert(img.pixel(0, 0) == ((255, 0, 119)))
    assert(img.pixel(1, 0) == ((255, 255, 0)))
  }

  test("nearest-neighbor resize is exact on integer downscale") {
    val img = pattern(8, 4)
    val half = Codecs.resizeNearest(img, 4, 2)
    assert(half.width == 4 && half.height == 2)
    // (x, y) in the half image samples (2x, 2y) in the source
    for (y <- 0 until 2; x <- 0 until 4)
      assert(half.pixel(x, y) == img.pixel(2 * x, 2 * y))
  }

  test("real decode flows through extractFeatures; resize re-encodes a decodable file") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, "image/x-portable-pixmap", Codecs.encodePpm(pattern(40, 30))),
      MediaRecord(2L, "image/bmp", Codecs.encodeBmp(pattern(60, 20))))
    val media = spark.createDataset(recs)
    val feats = MediaPipeline.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(feats(0).width == 40 && feats(0).height == 30)
    assert(feats(1).width == 60 && feats(1).height == 20)
    // resize really resamples: the re-encoded payload decodes to the plan dims
    val resized = MediaPipeline.resize(spark, media, 24, 24).collect().sortBy(_.media_id)
    val r0 = Codecs.decode(resized(0).payload).get
    assert((r0.width, r0.height) == MediaPipeline.resizePlan(40, 30, 24, 24))
    val r1 = Codecs.decode(resized(1).payload).get
    assert((r1.width, r1.height) == MediaPipeline.resizePlan(60, 20, 24, 24))
    assert(Codecs.isBmp(resized(1).payload)) // format preserved through resize
    // mime stays clean for decodable formats (no stub w/h parameters)
    assert(resized.forall(!_.mime.contains(";")))
  }

  test("PNG encode/decode round-trips pixels exactly (JDK ImageIO)") {
    val img = pattern(37, 21)
    val png = Codecs.encodePng(img)
    assert(Codecs.isPng(png) && !Codecs.isPpm(png) && !Codecs.isBmp(png))
    val back = Codecs.decode(png).get
    assert(back.width == 37 && back.height == 21)
    assert(back.pixels.toSeq == img.pixels.toSeq, "PNG must be lossless")
  }

  test("GIF encode/decode round-trips pixels exactly (exact palette)") {
    // pattern(37, 21) exercises the full 256-entry palette budget (21p+13
    // mod 256 sweeps all residues over 777 pixels)
    val img = pattern(37, 21)
    val gif = Codecs.encodeGif(img)
    assert(Codecs.isGif(gif) && !Codecs.isPng(gif) && !Codecs.isBmp(gif))
    val back = Codecs.decode(gif).get
    assert(back.width == 37 && back.height == 21)
    assert(back.pixels.toSeq == img.pixels.toSeq,
      "GIF over an exact palette must be lossless")
    // over-budget rasters must fail loudly, not quantize silently
    // (300 distinct colors: red wraps at 256, so green disambiguates)
    val wide = Codecs.RgbImage(300, 1,
      Array.tabulate(3 * 300) { i =>
        val p = i / 3
        (i % 3 match { case 0 => p % 256; case 1 => p / 256; case _ => 0 })
          .toByte
      })
    intercept[IllegalArgumentException](Codecs.encodeGif(wide))
  }

  test("JPEG round-trips dimensions exactly, pixels approximately (lossy)") {
    val img = pattern(32, 24)
    val jpg = Codecs.encodeJpeg(img)
    assert(Codecs.isJpeg(jpg))
    val back = Codecs.decode(jpg).get
    assert(back.width == 32 && back.height == 24)
    val err = img.pixels.iterator.zip(back.pixels.iterator)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
      .sum.toDouble / img.pixels.length
    assert(err < 32.0, s"jpeg mean abs channel error $err too large")
  }

  test("resize preserves PNG/JPEG container formats through re-encode") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, "image/png", Codecs.encodePng(pattern(40, 30))),
      MediaRecord(2L, "image/jpeg", Codecs.encodeJpeg(pattern(60, 20))))
    val resized = MediaPipeline.resize(spark, spark.createDataset(recs), 24, 24)
      .collect().sortBy(_.media_id)
    assert(Codecs.isPng(resized(0).payload))
    assert(Codecs.isJpeg(resized(1).payload))
    val r0 = Codecs.decode(resized(0).payload).get
    assert((r0.width, r0.height) == MediaPipeline.resizePlan(40, 30, 24, 24))
    val r1 = Codecs.decode(resized(1).payload).get
    assert((r1.width, r1.height) == MediaPipeline.resizePlan(60, 20, 24, 24))
    // real decode for these mimes: no stub w/h parameters appended
    assert(resized.forall(!_.mime.contains(";")))
  }

  test("WAV encode/decode round-trips samples exactly (incl. chunk padding)") {
    val smp = Array.tabulate(333)(i => ((i * 977) % 65536 - 32768).toShort)
    val audio = Codecs.PcmAudio(16000, 1, smp)
    val bytes = Codecs.encodeWav(audio)
    assert(Codecs.isWav(bytes) && !Codecs.isPpm(bytes))
    val back = Codecs.decodeWav(bytes)
    assert(back.sampleRate == 16000 && back.channels == 1)
    assert(back.samples.toSeq == smp.toSeq)
    assert(back.durationMicros == 333L * 1000000 / 16000)
    // stereo interleave: frames = samples / channels
    val st = Codecs.PcmAudio(8000, 2, smp.take(332))
    assert(Codecs.decodeWav(Codecs.encodeWav(st)).frames == 166)
  }

  test("WAV decode walks intermediate RIFF chunks before data") {
    val audio = Codecs.PcmAudio(8000, 1, Array[Short](1, -2, 3))
    val canonical = Codecs.encodeWav(audio)
    // splice a LIST chunk (odd-sized, exercising word alignment) between
    // fmt and data, as real encoders emit
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x', 0)
    val spliced = canonical.take(36) ++ list ++ canonical.drop(36)
    // patch the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val back = Codecs.decodeWav(spliced)
    assert(back.samples.toSeq == Seq[Short](1, -2, 3))
  }

  test("AVI encode/decode round-trips every frame exactly (incl. row padding)") {
    val frames = Vector.tabulate(4)(f =>
      Array.tabulate(3 * 13 * 6)(i => ((i * 7 + f * 31 + 5) % 256).toByte))
    val video = Codecs.RgbVideo(13, 6, frames) // width 13: padded rows
    val bytes = Codecs.encodeAvi(video)
    assert(Codecs.isAvi(bytes) && !Codecs.isWav(bytes)) // both are RIFF
    val back = Codecs.decodeAvi(bytes)
    assert(back.width == 13 && back.height == 6 && back.frames.size == 4)
    (0 until 4).foreach(f =>
      assert(back.frames(f).toSeq == frames(f).toSeq, s"frame $f diverged"))
  }

  test("video features are REAL for AVI payloads; stand-in for other containers") {
    import spark.implicits._
    val avi = Codecs.encodeAvi(Codecs.RgbVideo(16, 8,
      Vector.fill(3)(new Array[Byte](3 * 16 * 8))))
    val recs = Seq(
      MediaRecord(1L, "video/avi", avi),
      MediaRecord(2L, "video/mp4", Array[Byte](1, 2, 3, 4)))
    val feats = MediaPipeline.extractFeatures(spark, spark.createDataset(recs))
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 16 && feats(0).height == 8 && feats(0).frames == 3)
    assert(feats(1).frames >= 1) // hash-derived stand-in, not a crash
  }

  test("audio features: real parse for wav, deterministic stand-in otherwise") {
    import spark.implicits._
    val wav = Codecs.encodeWav(Codecs.PcmAudio(8000, 1, Array[Short](100, -200, 300)))
    val recs = Seq(
      MediaRecord(1L, "audio/wav", wav),
      MediaRecord(2L, "audio/mpeg", Array[Byte](1, 2, 3)))
    val feats = MediaPipeline.extractAudioFeatures(spark, spark.createDataset(recs))
      .collect().sortBy(_.media_id)
    assert(feats(0).n_frames == 3 && feats(0).peak == 300)
    assert(feats(0).energy == 100L * 100 + 200L * 200 + 300L * 300)
    val again = MediaPipeline.extractAudioFeatures(spark, spark.createDataset(recs))
      .collect().sortBy(_.media_id)
    assert(feats(1) == again(1)) // stand-in is stable
    assert(feats(1).peak == 0 && feats(1).energy == 0) // and clearly fake
  }

  test("batched feature extraction over binary payloads") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "text").as[(Long, String)]
    val media = MediaPipeline.fromText(spark, docs, "image/png")
    val feats = MediaPipeline.extractFeatures(spark, media).collect()
    assert(feats.length == 500)
    val f = feats.minBy(_.media_id)
    assert(f.n_bytes > 0)
    assert(f.byte_mean > 0 && f.byte_mean < 256)
    assert(f.byte_var >= 0)
    assert(f.width >= 16 && f.height == (f.width * 3) / 4)
    assert(f.frames == 1) // images decode to a single frame
  }

  test("video mime yields frame counts; extraction is deterministic") {
    import spark.implicits._
    val rows = spark.createDataset(Seq((1L, "abc"), (2L, "defgh")))
    val media = MediaPipeline.fromText(spark, rows, "video/mp4")
    val a = MediaPipeline.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val b = MediaPipeline.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.frames >= 1))
  }

  test("resize plan fits within the box preserving aspect; identity inside") {
    assert(MediaPipeline.resizePlan(100, 50, 200, 200) == ((100, 50)))
    val (w, h) = MediaPipeline.resizePlan(1000, 500, 200, 200)
    assert(w == 200 && h == 100) // aspect 2:1 preserved
    val (w2, h2) = MediaPipeline.resizePlan(500, 1000, 200, 100)
    assert(h2 == 100 && w2 == 50)
    assert(MediaPipeline.resizePlan(10000, 1, 5, 5)._1 >= 1) // never zero
  }

  test("batched resize emits same-schema records with the plan recorded") {
    import spark.implicits._
    val rows = spark.createDataset(Seq((1L, "a" * 5000), (2L, "bb")))
    val media = MediaPipeline.fromText(spark, rows, "image/png")
    val resized = MediaPipeline.resize(spark, media, 64, 64).collect().sortBy(_.media_id)
    assert(resized.length == 2)
    assert(resized.forall(_.mime.startsWith("image/png;w=")))
    val dims = resized.map(_.mime.split(";").drop(1).map(_.split("=")(1).toInt))
    assert(dims.forall { case Array(w, h) => w <= 64 && h <= 64 && w >= 1 && h >= 1 })
    // chaining replaces the plan instead of accumulating conflicting params
    val twice = MediaPipeline.resize(
      spark, MediaPipeline.resize(spark, media, 64, 64), 32, 32).collect()
    assert(twice.forall(_.mime.count(_ == ';') == 2))
  }

  test("frame sampling picks every k-th frame bounded by maxFrames") {
    assert(MediaPipeline.sampleFrames(3, 10) == Seq(0, 1, 2))
    val s = MediaPipeline.sampleFrames(100, 10)
    assert(s.size == 10 && s.head == 0 && s.last <= 99 && s == s.sorted)
  }

  test("q428's cut detector stays silent on drift-only clips (null path)") {
    // The oracle pins the PLANTED fixture; this pins the complement: the
    // same circular-distance walk over the UNCUT fixtureVideo (pure
    // +7/frame drift) must score exactly 7/pixel on every pair and never
    // clear the 64/pixel threshold — a detector that fires on drift would
    // shred every slow pan into phantom shots.
    (0L until 40L).foreach { id =>
      val v = Codecs.decodeAvi(Codecs.encodeAvi(
        graft.operators.Multimodal.fixtureVideo(id)))
      (1 until v.frames.size).foreach { f2 =>
        val a = v.frame(f2 - 1); val b = v.frame(f2)
        var sum = 0L
        for (y <- 0 until v.height; x <- 0 until v.width) {
          val d = ((b.pixel(x, y)._1 - a.pixel(x, y)._1) % 256 + 256) % 256
          sum += math.min(d, 256 - d)
        }
        assert(sum == 7L * v.width * v.height,
          s"clip $id pair $f2 drift score $sum != 7/px")
        assert(sum <= 64L * v.width * v.height)
      }
    }
  }
}
