package graft.ops

/**
 * Pure-JVM media codecs — zero external dependencies. WAV (PCM) and
 * uncompressed 24-bit BMP are implemented from the public RIFF/WAVE and
 * BMP file-format specifications; PNG and JPEG decode through the JDK's
 * built-in javax.imageio readers (shipped with every JRE). Formats that
 * genuinely require native decoders (MP3/H.264) remain behind the
 * documented stub — an environment constraint, not a design one; the
 * dispatch in Multimodal.extractFeatures sniffs magic bytes and routes
 * each payload to the right decoder.
 *
 * Everything is deterministic (no RNG, fixed float op order), so decoded
 * features are bit-stable across runs and partitionings — the property the
 * pinned q_media_features oracle relies on.
 */
object MediaCodec {

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Float])
  /** Pixels packed 0xRRGGBB, row-major, top-down. */
  final case class Bmp(width: Int, height: Int, rgb: Array[Int])

  // ---------------------------------------------- little-endian byte access
  @inline private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  @inline private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  @inline private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Content sniff by magic bytes: "wav" | "bmp" | "png" | "jpeg" |
    * "unknown". */
  def sniff(b: Array[Byte]): String =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      "wav"
    else if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a &&
      b(6) == 0x1a && b(7) == 0x0a) "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) "jpeg"
    else "unknown"

  // ------------------------------------------------------------------- WAV

  /** Shared RIFF/WAVE validation: (sampleRate, channels, dataOff, dataLen)
    * for a well-formed PCM-16 file, None otherwise. No payload touched. */
  private def wavInfo(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (sniff(b) != "wav") return None
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val sz = i32(b, off + 4)
      // long arithmetic: a hostile chunk size near Int.MaxValue must fail
      // the bounds check, not wrap negative and pass it
      if (sz < 0 || off.toLong + 8L + sz > b.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val fmt = u16(b, off + 8)
          channels = u16(b, off + 10)
          sampleRate = i32(b, off + 12)
          bits = u16(b, off + 22)
          if (fmt != 1) return None // PCM only
        case "data" => dataOff = off + 8; dataLen = sz
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (dataOff < 0 || sampleRate <= 0 || channels <= 0 || bits != 16) None
    else Some((sampleRate, channels, dataOff, dataLen))
  }

  /** Header-only metadata: (sampleRate, channels). O(header), no sample
    * materialization — the metadata-scan path (Multimodal.withMeta). */
  def wavHeader(b: Array[Byte]): Option[(Int, Int)] =
    wavInfo(b).map { case (sr, ch, _, _) => (sr, ch) }

  /** Parse a RIFF/WAVE file: walks chunks, requires PCM 16-bit. Returns
    * None on anything malformed — callers fall back to the stub. */
  def decodeWav(b: Array[Byte]): Option[Wav] =
    wavInfo(b).map { case (sampleRate, channels, dataOff, dataLen) =>
      val n = dataLen / 2
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        out(i) = (u16(b, dataOff + 2 * i).toShort) / 32768.0f
        i += 1
      }
      Wav(sampleRate, channels, out)
    }

  /** Encode interleaved [-1,1] samples as PCM 16-bit WAV. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Float]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putI32(b, 4, 36 + dataLen)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putI32(b, 16, 16); putU16(b, 20, 1); putU16(b, 22, channels)
    putI32(b, 24, sampleRate)
    putI32(b, 28, sampleRate * channels * 2)
    putU16(b, 32, channels * 2); putU16(b, 34, 16)
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putI32(b, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0f, math.min(1.0f, samples(i)))
      putU16(b, 44 + 2 * i, math.round(v * 32767.0f) & 0xffff)
      i += 1
    }
    b
  }

  // ------------------------------------------------------------------- BMP

  /** Shared BMP validation: (width, height, bottomUp, dataOff, rowBytes)
    * for a well-formed uncompressed 24-bit file. No pixels touched. */
  private def bmpInfo(b: Array[Byte]): Option[(Int, Int, Boolean, Int, Int)] = {
    if (sniff(b) != "bmp") return None
    val dataOff = i32(b, 10)
    val hdrSize = i32(b, 14)
    if (hdrSize < 40) return None
    val width = i32(b, 18)
    val rawH = i32(b, 22)
    val planes = u16(b, 26); val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (width <= 0 || rawH == 0 || rawH == Int.MinValue || planes != 1 ||
      bpp != 24 || compression != 0) return None
    val height = math.abs(rawH)
    val bottomUp = rawH > 0
    // long arithmetic throughout: hostile header dims must fail the bounds
    // check, not overflow Int and pass it (then blow up in allocation)
    val rowBytes = (width.toLong * 3 + 3) & ~3L
    if (dataOff < 54 || rowBytes * height > b.length.toLong - dataOff ||
      width.toLong * height > Int.MaxValue) return None
    Some((width, height, bottomUp, dataOff, rowBytes.toInt))
  }

  /** Header-only metadata: (width, height). O(header), no pixel array. */
  def bmpHeader(b: Array[Byte]): Option[(Int, Int)] =
    bmpInfo(b).map { case (w, h, _, _, _) => (w, h) }

  /** Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up or
    * top-down). Returns None on anything else. */
  def decodeBmp(b: Array[Byte]): Option[Bmp] = {
    val info = bmpInfo(b)
    if (info.isEmpty) return None
    val (width, height, bottomUp, dataOff, rb) = info.get
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val ro = dataOff + srcRow * rb
      var x = 0
      while (x < width) {
        val o = ro + 3 * x
        out(y * width + x) =
          ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Bmp(width, height, out))
  }

  /** Encode top-down packed 0xRRGGBB pixels as a bottom-up 24-bit BMP. */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width.toLong * height,
      "pixel count mismatch")
    // long arithmetic mirrors the decode-side guard: dims whose padded
    // byte size overflows Int must fail loudly, not wrap into a negative
    // allocation or a corrupt undersized buffer
    val rowBytesL = (width.toLong * 3 + 3) & ~3L
    require(54L + rowBytesL * height <= Int.MaxValue,
      s"BMP too large to encode: ${width}x$height")
    val rowBytes = rowBytesL.toInt
    val dataLen = rowBytes * height
    val b = new Array[Byte](54 + dataLen)
    b(0) = 'B'; b(1) = 'M'
    putI32(b, 2, 54 + dataLen); putI32(b, 10, 54)
    putI32(b, 14, 40); putI32(b, 18, width); putI32(b, 22, height)
    putU16(b, 26, 1); putU16(b, 28, 24); putI32(b, 30, 0)
    putI32(b, 34, dataLen); putI32(b, 38, 2835); putI32(b, 42, 2835)
    var y = 0
    while (y < height) {
      val ro = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val p = rgb(y * width + x)
        val o = ro + 3 * x
        b(o) = (p & 0xff).toByte
        b(o + 1) = ((p >> 8) & 0xff).toByte
        b(o + 2) = ((p >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  // ------------------------------------------------------------- features

  /** Audio features: [rms, zero-crossing rate, per-segment RMS envelope].
    * Mono mix first (mean over channels per frame); fixed op order. */
  def audioFeatures(w: Wav, dims: Int): Array[Float] = {
    require(dims >= 2, s"audioFeatures needs dims >= 2 (rms, zcr); got $dims")
    val nFrames = w.samples.length / w.channels
    val mono = new Array[Float](math.max(nFrames, 1))
    var f = 0
    while (f < nFrames) {
      var c = 0; var acc = 0.0f
      while (c < w.channels) { acc += w.samples(f * w.channels + c); c += 1 }
      mono(f) = acc / w.channels
      f += 1
    }
    val out = new Array[Float](dims)
    var sumSq = 0.0; var crossings = 0
    var i = 0
    while (i < nFrames) {
      sumSq += mono(i).toDouble * mono(i)
      if (i > 0 && (mono(i) >= 0) != (mono(i - 1) >= 0)) crossings += 1
      i += 1
    }
    out(0) = math.sqrt(sumSq / math.max(nFrames, 1)).toFloat
    if (dims > 1) out(1) =
      if (nFrames > 1) crossings.toFloat / (nFrames - 1) else 0.0f
    // envelope: RMS of dims-2 equal time segments
    val nSeg = dims - 2
    var s = 0
    while (s < nSeg) {
      val lo = (s.toLong * nFrames / nSeg).toInt
      val hi = ((s + 1).toLong * nFrames / nSeg).toInt
      var acc = 0.0; var j = lo
      while (j < hi) { acc += mono(j).toDouble * mono(j); j += 1 }
      out(2 + s) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0.0f
      s += 1
    }
    out
  }

  /** Box-average resize (area interpolation): each destination pixel is
    * the mean of its covering source box — the standard downsample for
    * feature pipelines (no aliasing of the nearest-neighbor kind). Exact
    * for integer shrink factors; general sizes use fractional coverage. */
  def resize(img: Bmp, dw: Int, dh: Int): Bmp = {
    require(dw > 0 && dh > 0, "resize target must be positive")
    val out = new Array[Int](dw * dh)
    val sx = img.width.toDouble / dw
    val sy = img.height.toDouble / dh
    var y = 0
    while (y < dh) {
      val y0 = y * sy; val y1 = (y + 1) * sy
      var x = 0
      while (x < dw) {
        val x0 = x * sx; val x1 = (x + 1) * sx
        var r = 0.0; var g = 0.0; var b = 0.0; var area = 0.0
        var iy = math.floor(y0).toInt
        while (iy < math.min(math.ceil(y1), img.height.toDouble)) {
          val wy = math.min(y1, iy + 1.0) - math.max(y0, iy.toDouble)
          var ix = math.floor(x0).toInt
          while (ix < math.min(math.ceil(x1), img.width.toDouble)) {
            val wx = math.min(x1, ix + 1.0) - math.max(x0, ix.toDouble)
            val p = img.rgb(iy * img.width + ix)
            val w = wx * wy
            r += ((p >> 16) & 0xff) * w; g += ((p >> 8) & 0xff) * w
            b += (p & 0xff) * w; area += w
            ix += 1
          }
          iy += 1
        }
        out(y * dw + x) =
          (math.round(r / area).toInt << 16) |
          (math.round(g / area).toInt << 8) | math.round(b / area).toInt
        x += 1
      }
      y += 1
    }
    Bmp(dw, dh, out)
  }

  /** Iterative radix-2 FFT (from the textbook Cooley-Tukey formulation),
    * in-place over (re, im). n must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft length must be a power of two")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Spectral band energies of mono audio: power spectrum over the first
    * 2^⌈log2 n⌉-padded window, folded into `nBands` equal bands of the
    * 0..Nyquist range, mass-normalized. Deterministic; band index of a pure
    * tone f is ⌊f/(sr/2)·nBands⌋ (the analytic check in tests). */
  def spectralBands(w: Wav, nBands: Int, maxFft: Int = 1 << 14): Array[Float] = {
    require(nBands >= 1, s"spectralBands needs nBands >= 1; got $nBands")
    val nFrames = w.samples.length / w.channels
    var n = 1
    while (n < nFrames && n < maxFft) n <<= 1
    val re = new Array[Double](n); val im = new Array[Double](n)
    var i = 0
    while (i < math.min(nFrames, n)) {
      var c = 0; var acc = 0.0
      while (c < w.channels) { acc += w.samples(i * w.channels + c); c += 1 }
      re(i) = acc / w.channels
      i += 1
    }
    fft(re, im)
    val out = new Array[Float](nBands)
    var total = 0.0
    // bins 0..n/2 map to 0..Nyquist
    var k = 1 // skip DC
    while (k <= n / 2) {
      val p = re(k) * re(k) + im(k) * im(k)
      val band = math.min((k.toLong * 2 * nBands / n).toInt, nBands - 1)
      out(band) += p.toFloat
      total += p
      k += 1
    }
    if (total > 0) { var b = 0; while (b < nBands) { out(b) = (out(b) / total).toFloat; b += 1 } }
    out
  }

  // ------------------------------------------------- PNG / JPEG (ImageIO)
  //
  // PNG and JPEG decode via the JDK's built-in javax.imageio readers —
  // still zero external dependencies (the JPEG/PNG/GIF/TIFF plugins ship
  // with the JRE). Decoded pixels land in the same packed-RGB Bmp container
  // the pure-JVM BMP decoder fills, so the whole feature/resize path
  // downstream is format-agnostic. ImageIO decode is deterministic within
  // a JDK (PNG losslessly so; JPEG per its fixed IDCT implementation).

  /** Decode a PNG or JPEG payload via javax.imageio into packed 0xRRGGBB
    * (alpha dropped). None on corrupt/oversized input.
    *
    * Decompression-bomb guard (ADVICE r5): the declared dimensions are read
    * from the HEADER first and rejected above the pixel cap BEFORE
    * ImageIO.read allocates the raster — a tiny crafted file declaring huge
    * dimensions (plausible in crawl-shaped untrusted payloads) must fall
    * back to None, not OOM the executor. The catch also covers
    * OutOfMemoryError/linkage errors from the decoder itself: this is a
    * per-row decode of untrusted bytes, where "skip the row" is the
    * contract and the allocation that failed is confined to the decoder. */
  def decodeImageIO(b: Array[Byte]): Option[Bmp] = {
    val kind = sniff(b)
    if (kind != "png" && kind != "jpeg") return None
    imageIOHeader(b) match {
      case Some((hw, hh))
        if hw <= 0 || hh <= 0 || hw.toLong * hh > Int.MaxValue / 4 => return None
      case None => return None
      case _ =>
    }
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4) return None
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < rgb.length) { rgb(i) &= 0xffffff; i += 1 }
      Some(Bmp(w, h, rgb))
    } catch {
      case _: Exception => None
      case _: OutOfMemoryError => None
      case _: LinkageError => None
    }
  }

  /** Header-only (width, height) for PNG/JPEG: ImageIO readers parse dims
    * from the header without decoding the pixel payload — the right cost
    * for a metadata scan. */
  def imageIOHeader(b: Array[Byte]): Option[(Int, Int)] = {
    val kind = sniff(b)
    if (kind != "png" && kind != "jpeg") return None
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return None
        val r = readers.next()
        try { r.setInput(in); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Encode packed 0xRRGGBB pixels as PNG ("png") or JPEG ("jpeg") via the
    * JDK writers — fixture/synthesis counterpart of decodeImageIO. */
  def encodeImageIO(width: Int, height: Int, rgb: Array[Int],
                    format: String): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width.toLong * height,
      "pixel count mismatch")
    require(format == "png" || format == "jpeg", s"unsupported: $format")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, out))
      sys.error(s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Image features: [meanR, meanG, meanB (0-1), gray histogram (dims-3
    * bins, mass-normalized)]. */
  def imageFeatures(img: Bmp, dims: Int): Array[Float] = {
    require(dims >= 3, s"imageFeatures needs dims >= 3 (meanR/G/B); got $dims")
    val out = new Array[Float](dims)
    val n = img.rgb.length
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    val nBins = dims - 3
    var i = 0
    while (i < n) {
      val p = img.rgb(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      sr += r; sg += g; sb += b
      if (nBins > 0) {
        val gray = (r * 299 + g * 587 + b * 114) / 1000
        out(3 + math.min(gray * nBins / 256, nBins - 1)) += 1.0f
      }
      i += 1
    }
    out(0) = (sr / (255.0 * math.max(n, 1))).toFloat
    if (dims > 1) out(1) = (sg / (255.0 * math.max(n, 1))).toFloat
    if (dims > 2) out(2) = (sb / (255.0 * math.max(n, 1))).toFloat
    var b2 = 0
    while (b2 < nBins) { out(3 + b2) /= math.max(n, 1); b2 += 1 }
    out
  }
}
