package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM image codecs for the multimodal pipeline. Two tiers, zero
  * external dependencies:
  *
  *  - hand-rolled PPM (netpbm P6 binary RGB) and BMP (24-bit uncompressed
  *    BI_RGB) — byte-level parse/encode, fully closed-form file sizes;
  *  - PNG, TIFF, and JPEG through `javax.imageio.ImageIO`, which ships
  *    INSIDE JDK 17 (headless-safe) — the formats a real corpus is
  *    actually made of. PNG and TIFF are lossless, so pixels round-trip
  *    exactly; JPEG decode is exact for dimensions but lossy for pixels.
  *
  * Plus two RIFF containers, hand-parsed: WAV (16-bit PCM audio) and AVI
  * (uncompressed 24bpp DIB video frames). Images land in one [[RgbImage]]
  * raster, audio in [[PcmAudio]], video in [[RgbVideo]] — MediaPipeline's
  * decode / resample / re-encode / frame-sample stages are REAL for every
  * modality; only compressed codecs with no pure-JVM decoder (MP4/H.264,
  * MP3/AAC) fall back to MediaPipeline's documented deterministic
  * stand-in.
  *
  * The reference has no media path at all (its payloads are flat string
  * maps, /root/reference/lib/stream.ex:15-16); this is part of the engine's
  * training-data-pipeline surface (builder brief: multimodal columns).
  */
object Codecs {

  // must be set before any AWT-adjacent class initializes on a server JVM;
  // also skip ImageIO's disk-backed stream cache (executor tmp churn)
  locally {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Decoded raster: row-major RGB, 3 bytes per pixel, top-down. */
  final case class RgbImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == 3 * width * height,
      s"pixel buffer ${pixels.length} != 3*$width*$height")
    /** (r, g, b) at (x, y), each 0..255. */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = 3 * (y * width + x)
      ((pixels(o) & 0xff), (pixels(o + 1) & 0xff), (pixels(o + 2) & 0xff))
    }
  }

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6' && isPpmSpace(b(2))
  def isBmp(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'B' && b(1) == 'M'
  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a
  def isGif(b: Array[Byte]): Boolean =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'
  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff
  /** TIFF: little-endian "II*\0" or big-endian "MM\0*" header. */
  def isTiff(b: Array[Byte]): Boolean =
    b.length > 4 && ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 0x2a &&
      b(3) == 0) || (b(0) == 'M' && b(1) == 'M' && b(2) == 0 &&
      (b(3) & 0xff) == 0x2a))

  /** Decode by magic bytes; None for formats this container cannot parse.
    * A payload that merely STARTS like a format (text beginning "BM...",
    * a truncated file) must not crash the caller's task — parse failures
    * also return None so MediaPipeline's deterministic fallback handles
    * them, exactly like an unknown format.
    */
  def decode(payload: Array[Byte]): Option[RgbImage] =
    try {
      if (isPpm(payload)) Some(decodePpm(payload))
      else if (isBmp(payload)) Some(decodeBmp(payload))
      else if (isPng(payload) || isJpeg(payload) || isGif(payload) ||
        isTiff(payload))
        decodeImageIo(payload)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  // --- PNG / JPEG via the JDK's own ImageIO (no external codec libraries) ---

  private def decodeImageIo(bytes: Array[Byte]): Option[RgbImage] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map(fromBufferedImage)

  /** Repack a BufferedImage into the canonical raster. `getRGB` yields
    * non-premultiplied sRGB ints for every internal layout, so 8-bit RGB
    * channels pass through exactly; an alpha channel, if present, is
    * discarded (the pipeline's raster is opaque RGB).
    */
  private[multimodal] def fromBufferedImage(bi: java.awt.image.BufferedImage): RgbImage = {
    val w = bi.getWidth
    val h = bi.getHeight
    val px = new Array[Byte](3 * w * h)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      bi.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val o = 3 * (y * w + x)
        px(o) = ((rgb >> 16) & 0xff).toByte
        px(o + 1) = ((rgb >> 8) & 0xff).toByte
        px(o + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    RgbImage(w, h, px)
  }

  private[multimodal] def toBufferedImage(img: RgbImage): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](img.width)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = 3 * (y * img.width + x)
        row(x) = ((img.pixels(o) & 0xff) << 16) |
          ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
        x += 1
      }
      bi.setRGB(0, y, img.width, 1, row, 0, img.width)
      y += 1
    }
    bi
  }

  private def encodeImageIo(img: RgbImage, format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + img.pixels.length / 2)
    val ok = javax.imageio.ImageIO.write(toBufferedImage(img), format, out)
    require(ok, s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Lossless: decodePng(encodePng(img)) == img pixel-for-pixel. */
  def encodePng(img: RgbImage): Array[Byte] = encodeImageIo(img, "png")

  /** Lossless: the JDK 9+ built-in TIFF plugin writes uncompressed RGB
    * strips, so decode(encodeTiff(img)) == img pixel-for-pixel (q393).
    */
  def encodeTiff(img: RgbImage): Array[Byte] = encodeImageIo(img, "tiff")

  /** GIF, lossless for rasters with <= 256 distinct colors: the writer is
    * handed a TYPE_BYTE_INDEXED image over the EXACT used-color palette, so
    * the LZW stream round-trips pixel-for-pixel. (Handing the JDK GIF
    * writer a TYPE_INT_RGB raster instead would let it substitute its own
    * uniform quantization palette and silently shift colors.) Rasters with
    * more colors are a caller error, not a quantization surprise.
    */
  def encodeGif(img: RgbImage): Array[Byte] = {
    val index = new java.util.LinkedHashMap[Integer, Integer]()
    val n = img.width * img.height
    var i = 0
    while (i < n) {
      val o = 3 * i
      val c = ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
      if (!index.containsKey(c)) {
        require(index.size < 256,
          "encodeGif: raster exceeds 256 distinct colors")
        index.put(c, index.size)
      }
      i += 1
    }
    val cmap = new Array[Int](index.size)
    index.forEach((c, idx) => cmap(idx) = c)
    val cm = new java.awt.image.IndexColorModel(
      8, cmap.length, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = bi.getRaster
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = 3 * (y * img.width + x)
        val c = ((img.pixels(o) & 0xff) << 16) |
          ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
        raster.setSample(x, y, 0, index.get(c).intValue())
        x += 1
      }
      y += 1
    }
    // write with interlacing explicitly DISABLED: the JDK GIF writer
    // interlaces by default, and its pass bookkeeping corrupts rasters
    // shorter than ~5 rows (rows 1+ come back scrambled) — found by the
    // MediaGifProps random-raster law, invisible to the taller fixture.
    val out = new java.io.ByteArrayOutputStream(64 + img.pixels.length / 2)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Lossy: dimensions round-trip exactly, pixel values approximately. */
  def encodeJpeg(img: RgbImage): Array[Byte] = encodeImageIo(img, "jpg")

  // --- PPM (P6, maxval <= 255) ---

  def encodePpm(img: RgbImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  private def isPpmSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  def decodePpm(bytes: Array[Byte]): RgbImage = {
    require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var i = 2
    // netpbm header tokens are separated by whitespace; '#' starts a
    // comment running to end-of-line and may appear between tokens
    def nextInt(): Int = {
      while (i < bytes.length &&
          (isPpmSpace(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else i += 1
      }
      var v = 0
      val start = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      require(i > start, s"PPM header: expected integer at byte $i")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval > 0 && maxval <= 255, s"unsupported PPM maxval $maxval")
    require(i < bytes.length && isPpmSpace(bytes(i)),
      "PPM header: expected single whitespace before raster")
    i += 1 // exactly ONE whitespace byte separates header and raster
    val n = 3 * w * h
    require(bytes.length - i >= n,
      s"PPM raster truncated: need $n bytes, have ${bytes.length - i}")
    val px = java.util.Arrays.copyOfRange(bytes, i, i + n)
    // samples are stored in 0..maxval; rescale to the canonical 0..255
    // intensity range (round-half-up), else a maxval<255 file re-encoded
    // under our maxval=255 header would come out near-black
    if (maxval != 255) {
      var j = 0
      while (j < n) {
        px(j) = (((px(j) & 0xff) * 255 + maxval / 2) / maxval).toByte
        j += 1
      }
    }
    RgbImage(w, h, px)
  }

  // --- BMP (BITMAPINFOHEADER, 24bpp, BI_RGB) ---

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Padded byte width of one 24bpp row (rows align to 4 bytes). */
  def bmpRowBytes(width: Int): Int = ((3 * width + 3) / 4) * 4

  def encodeBmp(img: RgbImage): Array[Byte] = {
    val rowBytes = bmpRowBytes(img.width)
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize) // file size
    put32(10, 54) // pixel data offset
    put32(14, 40) // BITMAPINFOHEADER size
    put32(18, img.width)
    put32(22, img.height) // positive = bottom-up, the common convention
    put16(26, 1) // planes
    put16(28, 24) // bpp
    put32(30, 0) // BI_RGB
    put32(34, dataSize)
    // rows bottom-up, pixels BGR
    var y = 0
    while (y < img.height) {
      val srcRow = img.height - 1 - y
      var x = 0
      val dstOff = 54 + y * rowBytes
      val srcOff = 3 * srcRow * img.width
      while (x < img.width) {
        out(dstOff + 3 * x) = img.pixels(srcOff + 3 * x + 2) // B
        out(dstOff + 3 * x + 1) = img.pixels(srcOff + 3 * x + 1) // G
        out(dstOff + 3 * x + 2) = img.pixels(srcOff + 3 * x) // R
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmp(bytes: Array[Byte]): RgbImage = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOffset = i32(bytes, 10)
    val hdrSize = i32(bytes, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val w = i32(bytes, 18)
    val hRaw = i32(bytes, 22) // negative height = top-down row order
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP variant: bpp=$bpp compression=$compression (24bpp BI_RGB only)")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val rowBytes = bmpRowBytes(w)
    require(bytes.length - dataOffset >= rowBytes * h, "BMP raster truncated")
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val srcOff = dataOffset + srcRow * rowBytes
      var x = 0
      val dstOff = 3 * y * w
      while (x < w) {
        px(dstOff + 3 * x) = bytes(srcOff + 3 * x + 2) // R
        px(dstOff + 3 * x + 1) = bytes(srcOff + 3 * x + 1) // G
        px(dstOff + 3 * x + 2) = bytes(srcOff + 3 * x) // B
        x += 1
      }
      y += 1
    }
    RgbImage(w, h, px)
  }

  // --- WAV (RIFF, 16-bit little-endian PCM) ---

  /** Decoded audio: interleaved 16-bit samples (channel-major per frame). */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(sampleRate > 0 && channels > 0, s"bad wav params $sampleRate/$channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    def frames: Int = samples.length / channels
    /** Whole microseconds of audio (floor) — integer-exact for the oracle. */
    def durationMicros: Long = frames.toLong * 1000000L / sampleRate
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Canonical 44-byte-header WAV: RIFF / fmt (PCM, 16-bit) / data. */
  def encodeWav(audio: PcmAudio): Array[Byte] = {
    val dataSize = audio.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize)
    out.put("WAVE".getBytes(US_ASCII))
    out.put("fmt ".getBytes(US_ASCII)).putInt(16)
    out.putShort(1) // PCM
    out.putShort(audio.channels.toShort)
    out.putInt(audio.sampleRate)
    out.putInt(audio.sampleRate * audio.channels * 2) // byte rate
    out.putShort((audio.channels * 2).toShort) // block align
    out.putShort(16) // bits per sample
    out.put("data".getBytes(US_ASCII)).putInt(dataSize)
    audio.samples.foreach(out.putShort)
    out.array()
  }

  /** Parse a PCM WAV: walks the RIFF chunk list (fmt may be followed by
    * LIST/fact chunks before data), 16-bit PCM only.
    */
  def decodeWav(bytes: Array[Byte]): PcmAudio = {
    require(isWav(bytes), "not a RIFF/WAVE file")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val tag = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), US_ASCII)
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"truncated $tag chunk")
      val next = buf.position() + size + (size & 1) // chunks are word-aligned
      tag match {
        case "fmt " =>
          val format = buf.getShort
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          require(format == 1 && bits == 16,
            s"unsupported WAV variant: format=$format bits=$bits (16-bit PCM only)")
        case "data" =>
          require(sampleRate > 0, "WAV data chunk before fmt")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => () // LIST/fact/cue: skip
      }
      buf.position(next)
    }
    require(samples != null, "WAV has no data chunk")
    PcmAudio(sampleRate, channels, samples)
  }

  // --- AVI (RIFF container, uncompressed 24bpp DIB frames) ---

  /** Decoded video: per-frame row-major RGB rasters, frame order preserved. */
  final case class RgbVideo(width: Int, height: Int, frames: Vector[Array[Byte]]) {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(frames.forall(_.length == 3 * width * height), "frame size mismatch")
    def frame(i: Int): RgbImage = RgbImage(width, height, frames(i))
  }

  def isAvi(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Canonical uncompressed AVI: RIFF(AVI ) > LIST(hdrl){avih,
    * LIST(strl){strh,strf}} > LIST(movi){00db per frame}. Frames are
    * BMP-style rasters (bottom-up, BGR, 4-byte-padded rows), so the frame
    * payload layout is shared with [[encodeBmp]].
    */
  def encodeAvi(video: RgbVideo, fps: Int = 10): Array[Byte] = {
    val rowBytes = bmpRowBytes(video.width)
    val frameBytes = rowBytes * video.height
    val nf = video.frames.size
    val moviSize = 4 + nf * (8 + frameBytes)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = out.put(s.getBytes(US_ASCII))
    fourcc("RIFF"); out.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); out.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); out.putInt(56)
    out.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
    out.putInt(nf).putInt(0).putInt(1).putInt(frameBytes)
    out.putInt(video.width).putInt(video.height)
    out.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); out.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); out.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    out.putInt(0).putShort(0).putShort(0).putInt(0)
    out.putInt(1).putInt(fps) // scale / rate
    out.putInt(0).putInt(nf).putInt(frameBytes).putInt(-1).putInt(0)
    out.putShort(0).putShort(0)
    out.putShort(video.width.toShort).putShort(video.height.toShort)
    fourcc("strf"); out.putInt(40)
    out.putInt(40).putInt(video.width).putInt(video.height)
    out.putShort(1).putShort(24).putInt(0).putInt(frameBytes)
    out.putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); out.putInt(moviSize); fourcc("movi")
    video.frames.foreach { px =>
      fourcc("00db"); out.putInt(frameBytes)
      // bottom-up BGR padded rows, identical to the BMP raster layout
      var y = 0
      while (y < video.height) {
        val srcRow = video.height - 1 - y
        val srcOff = 3 * srcRow * video.width
        var x = 0
        while (x < video.width) {
          out.put(px(srcOff + 3 * x + 2)) // B
          out.put(px(srcOff + 3 * x + 1)) // G
          out.put(px(srcOff + 3 * x)) // R
          x += 1
        }
        var pad = rowBytes - 3 * video.width
        while (pad > 0) { out.put(0: Byte); pad -= 1 }
        y += 1
      }
    }
    out.array()
  }

  /** Parse an uncompressed AVI by walking the RIFF chunk tree (LISTs
    * recursively; unknown chunks skipped) — dims and frame count from the
    * avih header, 24bpp BI_RGB enforced from strf, every 00db/00dc frame
    * materialized as an RGB raster. The declared frame count must match the
    * frames present (a mismatch means a corrupt container).
    */
  def decodeAvi(bytes: Array[Byte]): RgbVideo = {
    require(isAvi(bytes), "not a RIFF/AVI file")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1; var declared = -1
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val tag = new String(bytes, p, 4, US_ASCII)
        val size = buf.getInt(p + 4)
        require(size >= 0 && p + 8 + size <= end, s"truncated $tag chunk")
        val data = p + 8
        tag match {
          case "LIST" => walk(data + 4, data + size) // skip the list type
          case "avih" =>
            declared = buf.getInt(data + 16)
            w = buf.getInt(data + 32)
            h = buf.getInt(data + 36)
          case "strf" =>
            val bpp = buf.getShort(data + 14)
            val comp = buf.getInt(data + 16)
            require(bpp == 24 && comp == 0,
              s"unsupported AVI frames: bpp=$bpp compression=$comp (24bpp BI_RGB only)")
          case "00db" | "00dc" =>
            require(w > 0 && h > 0, "AVI frame before avih header")
            val rowBytes = bmpRowBytes(w)
            require(size >= rowBytes * h, "AVI frame truncated")
            val px = new Array[Byte](3 * w * h)
            var y = 0
            while (y < h) {
              val srcOff = data + (h - 1 - y) * rowBytes
              val dstOff = 3 * y * w
              var x = 0
              while (x < w) {
                px(dstOff + 3 * x) = bytes(srcOff + 3 * x + 2) // R
                px(dstOff + 3 * x + 1) = bytes(srcOff + 3 * x + 1) // G
                px(dstOff + 3 * x + 2) = bytes(srcOff + 3 * x) // B
                x += 1
              }
              y += 1
            }
            frames += px
          case _ => () // idx1, JUNK, strn...: skip
        }
        p = data + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    val fs = frames.result()
    require(declared == fs.size,
      s"AVI declares $declared frames but holds ${fs.size}")
    RgbVideo(w, h, fs)
  }

  /** Nearest-neighbor resample — integer source mapping (x*srcW/dstW), fully
    * deterministic across JVMs, no float rounding to diverge from an oracle.
    */
  def resizeNearest(img: RgbImage, tw: Int, th: Int): RgbImage = {
    require(tw > 0 && th > 0, s"bad target dims ${tw}x$th")
    if (tw == img.width && th == img.height) img
    else {
      val px = new Array[Byte](3 * tw * th)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * img.height / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * img.width / tw).toInt
          val s = 3 * (sy * img.width + sx)
          val d = 3 * (y * tw + x)
          px(d) = img.pixels(s); px(d + 1) = img.pixels(s + 1); px(d + 2) = img.pixels(s + 2)
          x += 1
        }
        y += 1
      }
      RgbImage(tw, th, px)
    }
  }
}
