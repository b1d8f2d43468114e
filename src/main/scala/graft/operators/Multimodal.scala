package graft.operators

import graft.QueryDef.q
import graft.multimodal.{Codecs, MediaPipeline, MediaRecord}
import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal decode (SURVEY.md §2B "multimodal"): REAL image
  * bytes — PPM (P6) for even ids, BMP (24-bit BI_RGB) for odd — are encoded
  * on executors from a closed-form per-doc pattern, pushed through the
  * production pipeline (extractFeatures → resize → extractFeatures), and the
  * DECODED dimensions/sizes are compared against DuckDB computing the same
  * quantities purely arithmetically from doc_id. The equality holds only if
  * the decoder actually parsed the format headers, the resampler actually
  * produced the planned raster, and the re-encoder wrote a well-formed file
  * the second decode could read — plumbing alone can't pass it.
  *
  * The reference carries only flat string payloads
  * (/root/reference/lib/stream.ex:15-16); this is engine surface for
  * training-data pipelines (binary columns + typed metadata).
  */
object Multimodal {

  /** Deterministic fixture raster for one doc: dims derived from the id,
    * channel values an affine pattern mod 256 (pixel (0,0) red = id % 256,
    * the oracle's pixel-level probe).
    */
  private[graft] def fixtureImage(id: Long): Codecs.RgbImage =
    fixtureImage(id, 0L)

  /** The same raster with the pattern brightness-shifted by `delta` — the
    * q338 near-duplicate fixture (a re-encoded copy whose few mod-256 wrap
    * cells are the only hash bits that can flip).
    */
  private[graft] def fixtureImage(id: Long, delta: Long): Codecs.RgbImage = {
    val w = 16 + (id % 48).toInt
    val h = 8 + (id % 24).toInt
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (x + 2 * y + id + delta) % 256
        val o = 3 * (y * w + x)
        px(o) = base.toByte
        px(o + 1) = ((base + 85) % 256).toByte
        px(o + 2) = ((base + 170) % 256).toByte
        x += 1
      }
      y += 1
    }
    Codecs.RgbImage(w, h, px)
  }

  /** Deterministic fixture waveform: mono 8 kHz 16-bit PCM, 64 + (id % 128)
    * frames, sample i = ((id*31 + i*17) mod 65536) - 32768 — closed-form in
    * SQL, full int16 range exercised including the -32768 edge.
    */
  private[graft] def fixtureAudio(id: Long): Codecs.PcmAudio = {
    val nf = (64 + id % 128).toInt
    val smp = new Array[Short](nf)
    var i = 0
    while (i < nf) {
      smp(i) = (((id * 31 + i * 17) % 65536) - 32768).toShort
      i += 1
    }
    Codecs.PcmAudio(8000, 1, smp)
  }

  /** Deterministic fixture clip: 3 + (id % 5) frames of the affine pattern
    * shifted 7 per frame — every frame's every pixel is closed-form in SQL.
    */
  private[graft] def fixtureVideo(id: Long): Codecs.RgbVideo = {
    val w = 16 + (id % 16).toInt
    val h = 8 + (id % 8).toInt
    val frames = Vector.tabulate(3 + (id % 5).toInt) { f =>
      val px = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (x + 2 * y + 7 * f + id) % 256
          val o = 3 * (y * w + x)
          px(o) = base.toByte
          px(o + 1) = ((base + 85) % 256).toByte
          px(o + 2) = ((base + 170) % 256).toByte
          x += 1
        }
        y += 1
      }
      px
    }
    Codecs.RgbVideo(w, h, frames)
  }

  /** [[fixtureVideo]] with a planted mid-clip scene cut: every pixel
    * jumps +128 at frame nf/2 on top of the +7/frame drift (q428). */
  private[graft] def fixtureVideoCut(id: Long): Codecs.RgbVideo = {
    val w = 16 + (id % 16).toInt
    val h = 8 + (id % 8).toInt
    val nf = 3 + (id % 5).toInt
    val cut = nf / 2
    val frames = Vector.tabulate(nf) { f =>
      val jump = if (f >= cut) 128 else 0
      val px = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (x + 2 * y + 7 * f + jump + id) % 256
          val o = 3 * (y * w + x)
          px(o) = base.toByte
          px(o + 1) = ((base + 85) % 256).toByte
          px(o + 2) = ((base + 170) % 256).toByte
          x += 1
        }
        y += 1
      }
      px
    }
    Codecs.RgbVideo(w, h, frames)
  }

  private[graft] def fixtureRecord(id: Long): MediaRecord = {
    val img = fixtureImage(id)
    if (id % 2 == 0) MediaRecord(id, "image/x-portable-pixmap", Codecs.encodePpm(img))
    else MediaRecord(id, "image/bmp", Codecs.encodeBmp(img))
  }

  val defs: Seq[QueryDef] = Seq(

    q("q134_multimodal_decode",
      // Closed-form twins of the decode pipeline: header sizes (PPM header =
      // 9 + digits(w) + digits(h); BMP = 54 + 4-byte-padded rows), the
      // fit-within-24x24 resize plan (same IEEE double op order as
      // MediaPipeline.resizePlan), and the (0,0) red channel.
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    16 + (doc_id % 48) AS w,
        |    8 + (doc_id % 24) AS h
        |  FROM documents
        |), p AS (
        |  SELECT media_id, w, h,
        |    CASE WHEN w <= 24 AND h <= 24 THEN w
        |      ELSE GREATEST(1, CAST(FLOOR(w * LEAST(CAST(24 AS DOUBLE)/w,
        |        CAST(24 AS DOUBLE)/h)) AS BIGINT)) END AS rw,
        |    CASE WHEN w <= 24 AND h <= 24 THEN h
        |      ELSE GREATEST(1, CAST(FLOOR(h * LEAST(CAST(24 AS DOUBLE)/w,
        |        CAST(24 AS DOUBLE)/h)) AS BIGINT)) END AS rh
        |  FROM m
        |)
        |SELECT media_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(CASE WHEN media_id % 2 = 0
        |    THEN 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3*w*h
        |    ELSE 54 + h * ((3*w + 3) // 4 * 4) END AS BIGINT) AS n_bytes,
        |  CAST(media_id % 256 AS BIGINT) AS first_px,
        |  CAST(rw AS BIGINT) AS r_width, CAST(rh AS BIGINT) AS r_height,
        |  CAST(CASE WHEN media_id % 2 = 0
        |    THEN 9 + length(CAST(rw AS VARCHAR)) + length(CAST(rh AS VARCHAR)) + 3*rw*rh
        |    ELSE 54 + rh * ((3*rw + 3) // 4 * 4) END AS BIGINT) AS r_bytes
        |FROM p ORDER BY media_id""") { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map(fixtureRecord))
      // decode the original payloads (real header parse + pixel probe)...
      val feats = MediaPipeline.extractFeatures(s, media)
        .select($"media_id", $"width".cast("long").as("width"),
          $"height".cast("long").as("height"), $"n_bytes")
      val firstPx = media
        .map(r => (r.media_id, Codecs.decode(r.payload).get.pixel(0, 0)._1.toLong))
        .toDF("px_id", "first_px")
      // ...then resize for real (resample + re-encode) and decode AGAIN:
      // r_width/r_height/r_bytes come out of the second parse, so they
      // certify the re-encoded file, not the plan arithmetic
      val rfeats = MediaPipeline.extractFeatures(
          s, MediaPipeline.resize(s, media, 24, 24))
        .select($"media_id".as("r_id"), $"width".cast("long").as("r_width"),
          $"height".cast("long").as("r_height"), $"n_bytes".as("r_bytes"))
      feats
        .join(firstPx, $"media_id" === $"px_id")
        .join(rfeats, $"media_id" === $"r_id")
        .select($"media_id", $"width", $"height", $"n_bytes", $"first_px",
          $"r_width", $"r_height", $"r_bytes")
        .orderBy($"media_id")
    },

    q("q143_png_roundtrip",
      // PNG is lossless, so the fixture raster's pixels survive the JDK
      // ImageIO encode→decode round-trip EXACTLY; file sizes are deflate
      // output (not closed-form), so the probes are dims + pixel values:
      // the original corners and the nearest-neighbor source pixel of the
      // re-encoded, re-decoded resize output (integer sx=(rx*w)//rw map,
      // same as Codecs.resizeNearest).
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    16 + (doc_id % 48) AS w,
        |    8 + (doc_id % 24) AS h
        |  FROM documents
        |), p AS (
        |  SELECT media_id, w, h,
        |    CASE WHEN w <= 24 AND h <= 24 THEN w
        |      ELSE GREATEST(1, CAST(FLOOR(w * LEAST(CAST(24 AS DOUBLE)/w,
        |        CAST(24 AS DOUBLE)/h)) AS BIGINT)) END AS rw,
        |    CASE WHEN w <= 24 AND h <= 24 THEN h
        |      ELSE GREATEST(1, CAST(FLOOR(h * LEAST(CAST(24 AS DOUBLE)/w,
        |        CAST(24 AS DOUBLE)/h)) AS BIGINT)) END AS rh
        |  FROM m
        |)
        |SELECT media_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(media_id % 256 AS BIGINT) AS first_px,
        |  CAST(((w-1) + 2*(h-1) + media_id + 85) % 256 AS BIGINT) AS corner_g,
        |  CAST(rw AS BIGINT) AS r_width, CAST(rh AS BIGINT) AS r_height,
        |  CAST((((rw-1)*w // rw) + 2*((rh-1)*h // rh) + media_id) % 256
        |    AS BIGINT) AS r_corner
        |FROM p ORDER BY media_id""") { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select($"doc_id")
        // spread: the PNG encode/decode round-trips below otherwise run in
        // the single-row-group scan task (serial ImageIO on a 32-core box)
        .transform(graft.Tables.spread)
        .as[Long]
        .mapPartitions(_.map(id =>
          MediaRecord(id, "image/png", Codecs.encodePng(fixtureImage(id)))))
      val orig = media.map { r =>
        val img = Codecs.decode(r.payload).get
        (r.media_id, img.width.toLong, img.height.toLong,
          img.pixel(0, 0)._1.toLong,
          img.pixel(img.width - 1, img.height - 1)._2.toLong)
      }.toDF("media_id", "width", "height", "first_px", "corner_g")
      // real resample + PNG re-encode, then decode AGAIN: the probes below
      // certify the re-encoded file, not the plan arithmetic
      val resized = MediaPipeline.resize(s, media, 24, 24).map { r =>
        val img = Codecs.decode(r.payload).get
        (r.media_id, img.width.toLong, img.height.toLong,
          img.pixel(img.width - 1, img.height - 1)._1.toLong)
      }.toDF("r_id", "r_width", "r_height", "r_corner")
      orig.join(resized, $"media_id" === $"r_id")
        .select($"media_id", $"width", $"height", $"first_px", $"corner_g",
          $"r_width", $"r_height", $"r_corner")
        .orderBy($"media_id")
    },

    q("q146_audio_decode",
      // REAL audio decode: a closed-form 16-bit PCM waveform is encoded as a
      // RIFF/WAVE file on executors, pushed through the production audio
      // pipeline (RIFF chunk walk, fmt parse, sample materialization), and
      // the decoded header fields AND signal statistics (peak |sample|,
      // integer energy) are compared against DuckDB computing the same
      // quantities purely arithmetically — a parse that skipped the actual
      // sample bytes cannot produce the right energy.
      """WITH m AS (SELECT doc_id, 64 + (doc_id % 128) AS nf FROM documents),
        |ix AS (SELECT doc_id, nf, unnest(range(nf)) AS i FROM m),
        |s AS (SELECT doc_id, nf,
        |    ((doc_id*31 + i*17) % 65536) - 32768 AS smp FROM ix)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(nf * 125 AS BIGINT) AS duration_us,
        |  CAST(MAX(ABS(smp)) AS BIGINT) AS peak,
        |  CAST(SUM(smp*smp) AS BIGINT) AS energy
        |FROM s GROUP BY doc_id, nf ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map(id =>
          MediaRecord(id, "audio/wav", Codecs.encodeWav(fixtureAudio(id)))))
      MediaPipeline.extractAudioFeatures(s, media)
        .select($"media_id".as("doc_id"),
          $"sample_rate".cast("long").as("sample_rate"),
          $"channels".cast("long").as("channels"),
          $"n_frames", $"duration_us", $"peak", $"energy")
        .orderBy($"doc_id")
    },

    q("q155_video_decode",
      // REAL video decode — the last modality: a closed-form multi-frame
      // clip is packed into an uncompressed AVI (RIFF chunk tree, DIB
      // frames) on executors, the production pipeline parses the container
      // (extractFeatures now reports REAL dims and frame counts for video),
      // and pixel probes read an actual frame RASTER — frame 0's origin and
      // the corner of the frame [[MediaPipeline.sampleFrames]] picks second
      // (floor(nf/2 + 0.5), the deterministic frame-sampling plan) — so a
      // parse that skipped the movi payload cannot pass. DuckDB computes
      // every probe arithmetically.
      """WITH m AS (SELECT doc_id,
        |    16 + (doc_id % 16) AS w, 8 + (doc_id % 8) AS h,
        |    3 + (doc_id % 5) AS nf FROM documents),
        |s AS (SELECT doc_id, w, h, nf,
        |    LEAST(nf - 1, CAST(FLOOR(nf / 2.0 + 0.5) AS BIGINT)) AS f1 FROM m)
        |SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(doc_id % 256 AS BIGINT) AS f0_px,
        |  CAST(((w-1) + 2*(h-1) + 7*f1 + doc_id) % 256 AS BIGINT) AS fs_px
        |FROM s ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map(id =>
          MediaRecord(id, "video/avi", Codecs.encodeAvi(fixtureVideo(id)))))
      // container parse through the production feature stage (real dims +
      // frame count for video now, not the stand-in)
      val feats = MediaPipeline.extractFeatures(s, media)
        .select($"media_id", $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"frames".cast("long").as("n_frames"))
      // raster probes: frame 0 origin red; the sampled frame's corner red
      val probes = media.map { r =>
        val v = Codecs.decodeAvi(r.payload)
        val f1 = MediaPipeline.sampleFrames(v.frames.size, 2).last
        (r.media_id,
          v.frame(0).pixel(0, 0)._1.toLong,
          v.frame(f1).pixel(v.width - 1, v.height - 1)._1.toLong)
      }.toDF("p_id", "f0_px", "fs_px")
      feats.join(probes, $"media_id" === $"p_id")
        .select($"media_id".as("doc_id"), $"width", $"height", $"n_frames",
          $"f0_px", $"fs_px")
        .orderBy($"doc_id")
    },

    q("q250_image_phash",
      // Perceptual image hash (average-hash) over the REAL decode path —
      // the image-dedup fingerprint (think pHash near-dup buckets for a
      // multimodal corpus): decode the PPM/BMP payload, nearest-neighbor
      // downsample to 8x8 with the production resampler, gray = (r+g+b)/3
      // per cell, bit = cell brighter than the image mean (strict >, the
      // integer compare gray*64 > sum — no float mean), bits packed into
      // two 32-bit halves. The oracle replays every step arithmetically
      // from the closed-form raster (sx = x*w//8 — Codecs.resizeNearest's
      // exact mapping), so the equality certifies decoder + resampler +
      // hash together. n_same (hash-bucket size) is the dedup readout; at
      // corpus scale the groupBy on the 64-bit hash is the only shuffle
      // and candidate verification joins stay inside buckets.
      """WITH m AS (SELECT doc_id AS media_id,
        |    16 + (doc_id % 48) AS w, 8 + (doc_id % 24) AS h FROM documents),
        |px AS (SELECT media_id, w, h, i % 8 AS x, i // 8 AS y
        |  FROM m, (SELECT unnest(range(0, 64)) AS i)),
        |s AS (SELECT media_id, (y*8 + x) AS i,
        |    ((x * w // 8) + 2 * (y * h // 8) + media_id) % 256 AS base
        |  FROM px),
        |g AS (SELECT media_id, i,
        |    (base + ((base + 85) % 256) + ((base + 170) % 256)) // 3 AS gray
        |  FROM s),
        |t AS (SELECT media_id, CAST(SUM(gray) AS BIGINT) AS total
        |  FROM g GROUP BY media_id),
        |bits AS (SELECT g.media_id, g.i,
        |    CASE WHEN g.gray * 64 > t.total THEN 1 ELSE 0 END AS b
        |  FROM g JOIN t ON t.media_id = g.media_id),
        |hsh AS (SELECT media_id,
        |    CAST(SUM(CASE WHEN i < 32 THEN b * (CAST(1 AS BIGINT) << i)
        |      ELSE 0 END) AS BIGINT) AS hash_a,
        |    CAST(SUM(CASE WHEN i >= 32 THEN b * (CAST(1 AS BIGINT) << (i - 32))
        |      ELSE 0 END) AS BIGINT) AS hash_b
        |  FROM bits GROUP BY media_id)
        |SELECT media_id, hash_a, hash_b,
        |  CAST(COUNT(*) OVER (PARTITION BY hash_a, hash_b) AS BIGINT) AS n_same
        |FROM hsh ORDER BY media_id""") { (s, dir) =>
      import s.implicits._
      val hashed = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val img = Codecs.resizeNearest(
            Codecs.decode(fixtureRecord(id).payload).get, 8, 8)
          val gray = Array.tabulate(64) { i =>
            val (r, g, b) = img.pixel(i % 8, i / 8)
            (r + g + b) / 3
          }
          val total = gray.sum.toLong
          var (ha, hb) = (0L, 0L)
          var i = 0
          while (i < 64) {
            if (gray(i) * 64L > total) {
              if (i < 32) ha |= 1L << i else hb |= 1L << (i - 32)
            }
            i += 1
          }
          (id, ha, hb)
        })
        .toDF("media_id", "hash_a", "hash_b")
      import org.apache.spark.sql.expressions.Window
      hashed
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy($"hash_a", $"hash_b")))
        .orderBy($"media_id")
    },

    q("q251_audio_fingerprint",
      // Acoustic fingerprint over the REAL WAV decode path — q250's audio
      // twin (a Shazam-style energy-profile signature, radically
      // simplified): decode the RIFF/WAVE payload, split the sample stream
      // into 8 equal-ish segments (seg = i*8//nf — exact integer
      // boundaries however nf divides), segment loudness = Σ|sample|, bit
      // = segment louder than the mean (the integer compare 8*seg > total,
      // no float). The oracle replays the waveform arithmetic closed-form
      // (q146's fixture), so a decoder that skipped sample bytes cannot
      // produce the right fingerprint. n_same buckets are the audio-dedup
      // readout; one groupBy on the byte-sized hash at any corpus scale.
      """WITH m AS (SELECT doc_id AS media_id, 64 + (doc_id % 128) AS nf
        |  FROM documents),
        |ix AS (SELECT media_id, nf, unnest(range(nf)) AS i FROM m),
        |s AS (SELECT media_id, i * 8 // nf AS seg,
        |    ABS(((media_id*31 + i*17) % 65536) - 32768) AS a FROM ix),
        |e AS (SELECT media_id, seg, CAST(SUM(a) AS BIGINT) AS seg_e
        |  FROM s GROUP BY media_id, seg),
        |t AS (SELECT media_id, CAST(SUM(seg_e) AS BIGINT) AS total
        |  FROM e GROUP BY media_id),
        |h AS (SELECT e.media_id,
        |    CAST(SUM(CASE WHEN e.seg_e * 8 > t.total
        |      THEN (CAST(1 AS BIGINT) << CAST(e.seg AS INT)) ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM e JOIN t ON t.media_id = e.media_id GROUP BY e.media_id)
        |SELECT media_id, fp,
        |  CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_same
        |FROM h ORDER BY media_id""") { (s, dir) =>
      import s.implicits._
      val fps = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val pcm = Codecs.decodeWav(Codecs.encodeWav(fixtureAudio(id)))
          val nf = pcm.samples.length
          val segE = new Array[Long](8)
          var i = 0
          while (i < nf) {
            segE(i * 8 / nf) += math.abs(pcm.samples(i).toInt).toLong
            i += 1
          }
          val total = segE.sum
          var fp = 0L
          var k = 0
          while (k < 8) {
            if (segE(k) * 8 > total) fp |= 1L << k
            k += 1
          }
          (id, fp)
        })
        .toDF("media_id", "fp")
      import org.apache.spark.sql.expressions.Window
      fps.withColumn("n_same",
          count(lit(1)).over(Window.partitionBy($"fp")))
        .orderBy($"media_id")
    },

    q("q269_gif_roundtrip",
      // REAL GIF decode through JDK ImageIO: each fixture raster is
      // LZW-encoded over its exact used-color palette (Codecs.encodeGif),
      // decoded back, and probed pixel-by-pixel. The distinct-color count
      // is the anti-quantization probe: the fixture's palette is exactly
      // w + 2h - 2 colors closed-form (base = (x + 2y + id) % 256 sweeps a
      // contiguous range), so any writer that substituted its own uniform
      // palette — what the JDK does if handed a plain RGB raster — would
      // collapse or shift colors and fail the count, not just a corner.
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    16 + (doc_id % 48) AS w,
        |    8 + (doc_id % 24) AS h
        |  FROM documents
        |)
        |SELECT media_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(media_id % 256 AS BIGINT) AS first_px,
        |  CAST(((w-1) + 2*(h-1) + media_id + 85) % 256 AS BIGINT) AS corner_g,
        |  CAST(w + 2*h - 2 AS BIGINT) AS n_colors
        |FROM m ORDER BY media_id""") { (s, dir) =>
      import s.implicits._
      // spread: the per-row GIF encode/decode otherwise runs in the
      // single-row-group scan's one task (q143's PNG rationale)
      val media = graft.Tables.spread(
          Tables.load(s, dir, "documents").select($"doc_id"))
        .as[Long]
        .mapPartitions(_.map(id =>
          MediaRecord(id, "image/gif", Codecs.encodeGif(fixtureImage(id)))))
      media.map { r =>
        val img = Codecs.decode(r.payload).get
        val seen = new java.util.HashSet[Integer]()
        var i = 0
        val n = img.width * img.height
        while (i < n) {
          val o = 3 * i
          seen.add(((img.pixels(o) & 0xff) << 16) |
            ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff))
          i += 1
        }
        (r.media_id, img.width.toLong, img.height.toLong,
          img.pixel(0, 0)._1.toLong,
          img.pixel(img.width - 1, img.height - 1)._2.toLong,
          seen.size.toLong)
      }.toDF("media_id", "width", "height", "first_px", "corner_g",
          "n_colors")
        .orderBy($"media_id")
    },

    q("q338_image_near_dup",
      // Image NEAR-duplicate detection at corpus scale: q250's perceptual
      // hash (real encode → decode → resample → hash path) plus q43's
      // band-blocked Hamming join. The corpus doubles each raster with a
      // brightness-shifted re-encode (pattern +3 — only the few mod-256
      // wrap cells can flip hash bits, the classic re-encoded-copy
      // signature). The SCALE-DEFINING move: identical hashes collapse to
      // weighted CLUSTERS first (one map-side-combining groupBy — exact
      // duplicates are counted as c·(c-1)/2 without enumerating a single
      // pair), and only DISTINCT hashes enter the band join, so candidate
      // volume is bounded by the hash-space usage, not the corpus (the
      // first formulation enumerated row pairs inside buckets and scaled
      // with exponent 1.18 on the 10x curve — this one is flat). Bands:
      // four 16-bit slices; by pigeonhole hamming <= 3 between two
      // DISTINCT hashes guarantees a shared band, so blocking loses no
      // pair below the radius. Pair mass between clusters is ca·cb —
      // arithmetic, not enumeration. The oracle replays raster, resample,
      // hash, clustering, banding, and Hamming closed-form.
      """WITH v AS (SELECT doc_id * 2 + var AS vid, doc_id AS id,
        |    3 * var AS delta, 16 + (doc_id % 48) AS w,
        |    8 + (doc_id % 24) AS h
        |  FROM documents, (SELECT unnest(range(2)) AS var)),
        |px AS (SELECT vid, id, delta, w, h, i % 8 AS x, i // 8 AS y
        |  FROM v, (SELECT unnest(range(0, 64)) AS i)),
        |s AS (SELECT vid, (y*8 + x) AS i,
        |    ((x * w // 8) + 2 * (y * h // 8) + id + delta) % 256 AS base
        |  FROM px),
        |g AS (SELECT vid, i,
        |    (base + ((base + 85) % 256) + ((base + 170) % 256)) // 3 AS gray
        |  FROM s),
        |t AS (SELECT vid, CAST(SUM(gray) AS BIGINT) AS total
        |  FROM g GROUP BY vid),
        |bits AS (SELECT g.vid, g.i,
        |    CASE WHEN g.gray * 64 > t.total THEN 1 ELSE 0 END AS b
        |  FROM g JOIN t ON t.vid = g.vid),
        |hsh AS (SELECT vid,
        |    CAST(SUM(CASE WHEN i < 32 THEN b * (CAST(1 AS BIGINT) << i)
        |      ELSE 0 END) AS BIGINT) AS ha,
        |    CAST(SUM(CASE WHEN i >= 32 THEN b * (CAST(1 AS BIGINT) << (i - 32))
        |      ELSE 0 END) AS BIGINT) AS hb
        |  FROM bits GROUP BY vid),
        |cl AS (SELECT ha, hb, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM hsh GROUP BY ha, hb),
        |exact AS (SELECT CAST(0 AS BIGINT) AS hamming,
        |    CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(*) AS BIGINT) AS n_clusters
        |  FROM cl WHERE c > 1),
        |bands AS (SELECT ha, hb, c, bd,
        |    CASE bd WHEN 0 THEN ha & 65535 WHEN 1 THEN (ha >> 16) & 65535
        |      WHEN 2 THEN hb & 65535 ELSE (hb >> 16) & 65535 END AS key
        |  FROM cl, (SELECT unnest(range(4)) AS bd)),
        |cand AS (SELECT DISTINCT a.ha ha1, a.hb hb1, a.c ca,
        |    b.ha ha2, b.hb hb2, b.c cb
        |  FROM bands a JOIN bands b ON a.bd = b.bd AND a.key = b.key
        |    AND (a.ha < b.ha OR (a.ha = b.ha AND a.hb < b.hb))),
        |near AS (SELECT CAST(bit_count(xor(ha1, ha2))
        |      + bit_count(xor(hb1, hb2)) AS BIGINT) AS hamming,
        |    ca * cb AS pm
        |  FROM cand),
        |nearg AS (SELECT hamming, CAST(SUM(pm) AS BIGINT) AS n_pairs,
        |    CAST(COUNT(*) AS BIGINT) AS n_clusters
        |  FROM near WHERE hamming >= 1 AND hamming <= 3 GROUP BY hamming)
        |SELECT * FROM exact UNION ALL SELECT * FROM nearg
        |ORDER BY hamming""") { (s, dir) =>
      import s.implicits._
      val cl = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .flatMap(id => Seq((id, 0L), (id, 1L)))
        .mapPartitions(_.map { case (id, varnt) =>
          val img0 = fixtureImage(id, 3L * varnt)
          val payload = if (id % 2 == 0) Codecs.encodePpm(img0)
            else Codecs.encodeBmp(img0)
          val img = Codecs.resizeNearest(Codecs.decode(payload).get, 8, 8)
          val gray = Array.tabulate(64) { i =>
            val (r, g, b) = img.pixel(i % 8, i / 8)
            (r + g + b) / 3
          }
          val total = gray.sum.toLong
          var (ha, hb) = (0L, 0L)
          var i = 0
          while (i < 64) {
            if (gray(i) * 64L > total) {
              if (i < 32) ha |= 1L << i else hb |= 1L << (i - 32)
            }
            i += 1
          }
          (id * 2 + varnt, ha, hb)
        })
        .toDF("vid", "ha", "hb")
        .groupBy($"ha", $"hb").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.cached) // exact + both band sides
      val exact = cl.filter($"c" > 1)
        .agg(sum(expr("c * (c - 1) div 2")).as("n_pairs"),
          count(lit(1)).as("n_clusters"))
        .select(lit(0L).as("hamming"), $"n_pairs", $"n_clusters")
      val bands = cl
        .select($"ha", $"hb", $"c",
          explode(sequence(lit(0), lit(3))).as("bd"))
        .withColumn("key", expr("CASE bd WHEN 0 THEN ha & 65535 " +
          "WHEN 1 THEN (ha >> 16) & 65535 WHEN 2 THEN hb & 65535 " +
          "ELSE (hb >> 16) & 65535 END"))
      val near = bands.as("a").join(bands.as("b"),
          $"a.bd" === $"b.bd" && $"a.key" === $"b.key" &&
            ($"a.ha" < $"b.ha" ||
              ($"a.ha" === $"b.ha" && $"a.hb" < $"b.hb")))
        .select($"a.ha".as("ha1"), $"a.hb".as("hb1"), $"a.c".as("ca"),
          $"b.ha".as("ha2"), $"b.hb".as("hb2"), $"b.c".as("cb"))
        .distinct()
        .withColumn("hamming", expr(
          "CAST(bit_count(ha1 ^ ha2) + bit_count(hb1 ^ hb2) AS BIGINT)"))
        .filter($"hamming" >= 1 && $"hamming" <= 3)
        .groupBy($"hamming")
        .agg(sum($"ca" * $"cb").as("n_pairs"),
          count(lit(1)).as("n_clusters"))
        .select($"hamming", $"n_pairs", $"n_clusters")
      exact.unionAll(near).orderBy($"hamming")
    },

    q("q393_tiff_roundtrip",
      // TIFF via the JDK 9+ built-in ImageIO plugin — the archival /
      // scientific-corpus sibling of q143's PNG: uncompressed RGB strips,
      // so the fixture raster survives encode→decode EXACTLY, and a
      // horizontal-flip augmentation stage (the pixel permutation
      // fl(x,y) = orig(w-1-x, y)) is re-encoded and re-decoded so the
      // probes certify the SECOND-generation file. Every probe is
      // closed-form from the fixture pattern (r = (x + 2y + id) % 256,
      // g = r+85, b = r+170): original first/center pixels, and the
      // flipped corners which must equal the opposite original column.
      // mapPartitions batching as in all codec stages; no shuffle at all.
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    16 + (doc_id % 48) AS w,
        |    8 + (doc_id % 24) AS h
        |  FROM documents
        |)
        |SELECT media_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(media_id % 256 AS BIGINT) AS first_r,
        |  CAST(((w // 2) + 2*(h // 2) + media_id) % 256 AS BIGINT)
        |    AS center_r,
        |  CAST(((w-1) + media_id) % 256 AS BIGINT) AS flip_first_r,
        |  CAST((2*(h-1) + media_id + 85) % 256 AS BIGINT) AS flip_corner_g
        |FROM m ORDER BY media_id""") { (s, dir) =>
      import s.implicits._
      // spread: the double TIFF encode/decode generations otherwise run
      // in the single-row-group scan's one task (q143's PNG rationale)
      val media = graft.Tables.spread(
          Tables.load(s, dir, "documents").select($"doc_id"))
        .as[Long]
        .mapPartitions(_.map(id =>
          MediaRecord(id, "image/tiff", Codecs.encodeTiff(fixtureImage(id)))))
      def flip(img: Codecs.RgbImage): Codecs.RgbImage = {
        val out = new Array[Byte](img.pixels.length)
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            val src = 3 * (y * img.width + (img.width - 1 - x))
            val dst = 3 * (y * img.width + x)
            out(dst) = img.pixels(src)
            out(dst + 1) = img.pixels(src + 1)
            out(dst + 2) = img.pixels(src + 2)
            x += 1
          }
          y += 1
        }
        Codecs.RgbImage(img.width, img.height, out)
      }
      media.mapPartitions(_.map { r =>
        val img = Codecs.decode(r.payload).get
        // second generation: flip -> TIFF re-encode -> decode again
        val fl = Codecs.decode(Codecs.encodeTiff(flip(img))).get
        (r.media_id, img.width.toLong, img.height.toLong,
          img.pixel(0, 0)._1.toLong,
          img.pixel(img.width / 2, img.height / 2)._1.toLong,
          fl.pixel(0, 0)._1.toLong,
          fl.pixel(fl.width - 1, fl.height - 1)._2.toLong)
      }).toDF("media_id", "width", "height", "first_r", "center_r",
          "flip_first_r", "flip_corner_g")
        .orderBy($"media_id")
    },

    q("q428_scene_cuts",
      // Shot/scene-cut detection over the REAL video decode path — the
      // segmentation pass a video-training pipeline runs before sampling
      // frames per shot instead of uniformly (a uniform sampler wastes its
      // budget inside long static shots and misses short ones). Fixture: a
      // planted mid-clip cut (every pixel jumps +128 at frame nf/2) on top
      // of the +7/frame drift. Detector: per adjacent frame pair, the sum
      // over pixels of the CIRCULAR byte distance min(d, 256-d) on the red
      // channel, flagged when it exceeds 64 per pixel (drift pairs score
      // exactly 7/px, the cut pair 121/px). The decode and the per-pixel
      // pair walk run on executors against the actual rasters; DuckDB
      // replays every probe arithmetically from the closed form, so a
      // parse that skipped the movi payload cannot pass. Map-side per
      // clip; no shuffle at any corpus size.
      """WITH m AS (SELECT doc_id,
        |    16 + (doc_id % 16) AS w, 8 + (doc_id % 8) AS h,
        |    3 + (doc_id % 5) AS nf FROM documents),
        |c AS (SELECT doc_id, w, h, nf, nf // 2 AS cut FROM m),
        |p AS (SELECT doc_id, w, h, nf, cut, unnest(range(1, nf)) AS f2
        |  FROM c),
        |e AS (SELECT doc_id, w, h, nf, cut, f2,
        |    CASE WHEN f2 = cut THEN 121 ELSE 7 END AS dist FROM p)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN dist > 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cuts,
        |  CAST(COALESCE(MIN(CASE WHEN dist > 64 THEN f2 END), 0) AS BIGINT)
        |    AS first_cut_frame,
        |  CAST(MAX(w * h * dist) AS BIGINT) AS max_pair_score,
        |  CAST(MIN(w * h * dist) AS BIGINT) AS min_pair_score
        |FROM e GROUP BY doc_id, nf ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map(id =>
          MediaRecord(id, "video/avi", Codecs.encodeAvi(fixtureVideoCut(id)))))
      media.map { r =>
        val v = Codecs.decodeAvi(r.payload)
        val scores = (1 until v.frames.size).map { f2 =>
          val a = v.frame(f2 - 1); val b = v.frame(f2)
          var sum = 0L; var y = 0
          while (y < v.height) {
            var x = 0
            while (x < v.width) {
              val d = ((b.pixel(x, y)._1 - a.pixel(x, y)._1) % 256 + 256) % 256
              sum += math.min(d, 256 - d)
              x += 1
            }
            y += 1
          }
          (f2, sum)
        }
        val thresh = 64L * v.width * v.height
        val cuts = scores.filter(_._2 > thresh)
        (r.media_id, v.frames.size.toLong, cuts.size.toLong,
          cuts.headOption.map(_._1.toLong).getOrElse(0L),
          scores.map(_._2).max, scores.map(_._2).min)
      }.toDF("doc_id", "n_frames", "n_cuts", "first_cut_frame",
          "max_pair_score", "min_pair_score")
        .orderBy($"doc_id")
    },

    q("q436_mp4_box_walk",
      // ISO BMFF (MP4) container walk — structure only, no codec (the
      // honest-limits line: no pure-JVM H.264/AAC decoder exists offline,
      // but manifests/provenance need the CONTAINER: track counts,
      // durations, box inventory, payload sizes — the role q146's RIFF
      // walk plays for WAV). Fixture: ftyp + moov(mvhd + N×trak(tkhd +
      // mdia(mdhd + hdlr))) + mdat built byte-for-byte on executors, with
      // the 64-bit `largesize` header form on even ids so the walker's
      // size==1 branch is actually exercised. The walk parses real
      // big-endian box headers recursively; probes cover the box census
      // (count/tracks/depth), exact file and mdat-payload sizes (header
      // form included), the mvhd duration field read from parsed bytes,
      // and the byte-sum of the actual mdat payload — a walker that
      // skipped or misaligned payload offsets cannot pass. DuckDB replays
      // every quantity arithmetically from the closed-form layout.
      // Map-side per file; no shuffle at any corpus size.
      """WITH m AS (SELECT doc_id, 1 + doc_id % 3 AS nt,
        |    1000 * (1 + doc_id % 60) AS dur_ms,
        |    64 + doc_id % 256 AS plen,
        |    CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8 END AS mhdr
        |  FROM documents),
        |ps AS (SELECT doc_id, CAST(SUM((doc_id + 7*i) % 256) AS BIGINT) AS psum
        |  FROM (SELECT doc_id, plen, unnest(range(plen)) AS i FROM m)
        |  GROUP BY doc_id)
        |SELECT m.doc_id,
        |  CAST(4 + 5 * nt AS BIGINT) AS n_boxes,
        |  CAST(nt AS BIGINT) AS n_tracks,
        |  CAST(4 AS BIGINT) AS max_depth,
        |  CAST(24 + 116 + 178 * nt + mhdr + plen AS BIGINT) AS file_bytes,
        |  CAST(plen AS BIGINT) AS mdat_bytes,
        |  CAST(mhdr AS BIGINT) AS mdat_hdr,
        |  CAST(dur_ms AS BIGINT) AS duration_ms,
        |  ps.psum AS mdat_sum
        |FROM m JOIN ps ON ps.doc_id = m.doc_id
        |ORDER BY m.doc_id""") { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val nt = (1 + id % 3).toInt
          val tracks = (1 to nt).map(t => graft.multimodal.Mp4.TrackSpec(
            t, 16 + ((id + t) % 16).toInt, 8 + ((id + t) % 8).toInt))
          val plen = (64 + id % 256).toInt
          val payload = Array.tabulate(plen)(i => ((id + 7L * i) % 256).toByte)
          val bytes = graft.multimodal.Mp4.encodeMp4(
            tracks, 1000L * (1 + id % 60), payload, mdatLargesize = id % 2 == 0)
          val boxes = graft.multimodal.Mp4.walkBoxes(bytes)
          val mdat = boxes.find(_.fourcc == "mdat").get
          var psum = 0L
          var i = mdat.payloadOff.toInt
          while (i < (mdat.off + mdat.size).toInt) {
            psum += bytes(i) & 0xff; i += 1
          }
          val (_, dur) = graft.multimodal.Mp4.parseMvhd(bytes)
          (id, boxes.size.toLong, boxes.count(_.fourcc == "trak").toLong,
            boxes.map(_.depth).max.toLong, bytes.length.toLong,
            mdat.off + mdat.size - mdat.payloadOff,
            mdat.payloadOff - mdat.off, dur, psum)
        })
        .toDF("doc_id", "n_boxes", "n_tracks", "max_depth", "file_bytes",
          "mdat_bytes", "mdat_hdr", "duration_ms", "mdat_sum")
        .orderBy($"doc_id")
    },

    q("q449_mp4_sample_census",
      // MP4 sample tables (stbl: stsz/stts/stsc/stco/co64) — the per-track
      // sample CENSUS under the q436 container walk, still structure-only
      // (honest scope: no codec). Fixture: each track carries a real
      // sample table — per-sample sizes, one constant time delta, constant
      // samples-per-chunk, and chunk offsets that point at the ACTUAL
      // absolute positions of the sample data laid out in mdat (co64 wide
      // form on even ids). Readout per (doc, track): sample count, total
      // sample bytes from stsz, chunk count, stts duration vs the mvhd
      // duration and their drift (the truncated-delta remainder), an
      // offsets-in-bounds/ordered probe, and the byte-sum of the track's
      // samples read from the file THROUGH the chunk offsets — a walker
      // with misaligned offsets or a lenient stsz cannot pass (the parser
      // rejects declared counts that exceed the box payload; Mp4Props
      // pins that law). DuckDB replays every quantity arithmetically from
      // the closed-form layout, including the per-track byte-sum via the
      // cumulative track offsets. Map-side per file; no shuffle.
      """WITH m AS (SELECT doc_id, 1 + doc_id % 2 AS nt,
        |    1000 * (1 + doc_id % 30) AS dur_ms FROM documents),
        |sp AS (SELECT doc_id, dur_ms, t,
        |    2 + (doc_id + t) % 9 AS ns, 1 + (doc_id + t) % 3 AS spc
        |  FROM (SELECT doc_id, dur_ms, unnest(range(1, nt + 1)) AS t FROM m)),
        |sz AS (SELECT doc_id, t,
        |    CAST(SUM(10 + (doc_id + 3*t + 5*j) % 50) AS BIGINT) AS bytes
        |  FROM (SELECT doc_id, t, unnest(range(ns)) AS j FROM sp)
        |  GROUP BY doc_id, t),
        |cum AS (SELECT doc_id, t, bytes,
        |    CAST(COALESCE(SUM(bytes) OVER (PARTITION BY doc_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum0
        |  FROM sz),
        |ts AS (SELECT doc_id, t,
        |    CAST(SUM((doc_id + 13*(cum0 + i)) % 256) AS BIGINT) AS track_sum
        |  FROM (SELECT doc_id, t, cum0, unnest(range(bytes)) AS i FROM cum)
        |  GROUP BY doc_id, t)
        |SELECT sp.doc_id, CAST(sp.t AS BIGINT) AS track_id,
        |  CAST(sp.ns AS BIGINT) AS n_samples,
        |  sz.bytes AS sample_bytes,
        |  CAST((sp.ns + sp.spc - 1) // sp.spc AS BIGINT) AS n_chunks,
        |  CAST(sp.spc AS BIGINT) AS spc,
        |  CAST(sp.ns * (sp.dur_ms // sp.ns) AS BIGINT) AS stts_dur_ms,
        |  CAST(sp.dur_ms AS BIGINT) AS mvhd_dur_ms,
        |  CAST(sp.dur_ms % sp.ns AS BIGINT) AS dur_drift_ms,
        |  CAST(1 AS BIGINT) AS offsets_ok,
        |  ts.track_sum
        |FROM sp JOIN sz ON sz.doc_id = sp.doc_id AND sz.t = sp.t
        |        JOIN ts ON ts.doc_id = sp.doc_id AND ts.t = sp.t
        |ORDER BY sp.doc_id, track_id""") { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.flatMap { id =>
          val nt = (1 + id % 2).toInt
          val durMs = 1000L * (1 + id % 30)
          val tracks = (1 to nt).map { t =>
            val ns = (2 + (id + t) % 9).toInt
            val sizes = (0 until ns).map(j => (10 + (id + 3L * t + 5L * j) % 50).toInt)
            graft.multimodal.Mp4.SampleTrackSpec(
              t, sizes, (1 + (id + t) % 3).toInt, durMs / ns)
          }
          val bytes = graft.multimodal.Mp4.encodeMp4Samples(
            tracks, durMs, id, co64 = id % 2 == 0)
          val tabs = graft.multimodal.Mp4.parseSampleTables(bytes)
          val mdat = graft.multimodal.Mp4.walkBoxes(bytes)
            .find(_.fourcc == "mdat").get
          val (_, mvhdDur) = graft.multimodal.Mp4.parseMvhd(bytes)
          tabs.map { tb =>
            val spans = tb.chunkOffsets.zip(tb.sampleSizes
              .grouped(tb.samplesPerChunk.toInt).map(_.sum).toVector)
            val inBounds = spans.forall { case (o, cs) =>
              o >= mdat.payloadOff && o + cs <= mdat.off + mdat.size }
            val ordered = spans.sliding(2).forall(w =>
              w.size < 2 || w(0)._1 + w(0)._2 <= w(1)._1)
            var sum = 0L
            spans.foreach { case (o, cs) =>
              var i = o.toInt
              while (i < (o + cs).toInt) { sum += bytes(i) & 0xff; i += 1 }
            }
            (id, tb.trackId, tb.sampleSizes.size.toLong, tb.sampleSizes.sum,
              tb.chunkOffsets.size.toLong, tb.samplesPerChunk,
              tb.sttsDurTicks, mvhdDur, mvhdDur - tb.sttsDurTicks,
              if (inBounds && ordered) 1L else 0L, sum)
          }
        })
        .toDF("doc_id", "track_id", "n_samples", "sample_bytes", "n_chunks",
          "spc", "stts_dur_ms", "mvhd_dur_ms", "dur_drift_ms", "offsets_ok",
          "track_sum")
        .orderBy($"doc_id", $"track_id")
    },

    q("q442_fmp4_fragments",
      // Fragmented-MP4 (CMAF/DASH/HLS) ingest manifest — the segment-
      // stitching check a streaming-video pipeline runs before treating k
      // fragments as one asset: walk the real moof/traf grammar, read
      // each mfhd sequence_number from parsed bytes, and verify
      // CONTINUITY (seq = 1..k in file order, the property a dropped or
      // reordered segment breaks). Census/file-size/payload byte-sum
      // probes as in q436 so a walker that skips fragment payloads
      // cannot pass. DuckDB replays everything arithmetically from the
      // closed-form fragment layout. Map-side per file; no shuffle.
      """WITH m AS (SELECT doc_id, 1 + doc_id % 4 AS k FROM documents),
        |fp AS (SELECT doc_id, k, f, 32 + (doc_id + 17*f) % 64 AS plen
        |  FROM (SELECT doc_id, k, unnest(range(1, k + 1)) AS f FROM m)),
        |ps AS (SELECT doc_id,
        |    CAST(SUM((doc_id + 11*f + 3*i) % 256) AS BIGINT) AS psum
        |  FROM (SELECT doc_id, f, unnest(range(plen)) AS i FROM fp)
        |  GROUP BY doc_id),
        |ag AS (SELECT doc_id, CAST(MIN(k) AS BIGINT) AS k,
        |    CAST(SUM(plen) AS BIGINT) AS payload_bytes,
        |    CAST(358 + SUM(56 + plen) AS BIGINT) AS file_bytes
        |  FROM fp GROUP BY doc_id)
        |SELECT ag.doc_id, ag.k AS n_fragments,
        |  CAST(10 + 5 * ag.k AS BIGINT) AS n_boxes,
        |  CAST(1 AS BIGINT) AS seq_ok,
        |  ag.payload_bytes, ag.file_bytes, ps.psum AS payload_sum,
        |  CAST(1000 * (1 + ag.doc_id % 30) AS BIGINT) AS duration_ms
        |FROM ag JOIN ps ON ps.doc_id = ag.doc_id
        |ORDER BY ag.doc_id""") { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val k = (1 + id % 4).toInt
          val frags = (1 to k).map { f =>
            val plen = (32 + (id + 17L * f) % 64).toInt
            Array.tabulate(plen)(i => ((id + 11L * f + 3L * i) % 256).toByte)
          }
          val track = graft.multimodal.Mp4.TrackSpec(
            1, 16 + (id % 16).toInt, 8 + (id % 8).toInt)
          val bytes = graft.multimodal.Mp4.encodeFmp4(
            track, 1000L * (1 + id % 30), frags)
          val boxes = graft.multimodal.Mp4.walkBoxes(bytes)
          val mdats = boxes.filter(_.fourcc == "mdat")
          var psum = 0L
          mdats.foreach { md =>
            var i = md.payloadOff.toInt
            while (i < (md.off + md.size).toInt) { psum += bytes(i) & 0xff; i += 1 }
          }
          val seqs = graft.multimodal.Mp4.mfhdSeqs(bytes)
          val (_, dur) = graft.multimodal.Mp4.parseMvhd(bytes)
          (id, boxes.count(_.fourcc == "moof").toLong, boxes.size.toLong,
            if (seqs == (1L to seqs.size.toLong)) 1L else 0L,
            mdats.map(b => b.off + b.size - b.payloadOff).sum,
            bytes.length.toLong, psum, dur)
        })
        .toDF("doc_id", "n_fragments", "n_boxes", "seq_ok", "payload_bytes",
          "file_bytes", "payload_sum", "duration_ms")
        .orderBy($"doc_id")
    },
  )
}
