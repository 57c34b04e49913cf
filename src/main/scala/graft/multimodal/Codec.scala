package graft.multimodal

/** Pure-JVM codecs for the multimodal pipeline (SURVEY.md §2 C11).
  *
  * Real decoders for formats simple enough to parse without native
  * libraries, all deterministic and unit-tested:
  *  - PPM (P6) binary images — the netpbm format: ASCII header
  *    `P6 <w> <h> <maxval>` followed by interleaved RGB bytes.
  *  - WAV (RIFF, PCM 16-bit) audio, mono or stereo (downmixed).
  *  - "ppmseq" video: concatenated P6 frames (a trivial container the
  *    tests synthesize), enabling real frame extraction + sampling.
  *  - JPEG / PNG / BMP / GIF via the JDK's `javax.imageio.ImageIO` —
  *    already on every JVM classpath, zero new dependencies
  *    ([[decodeImageIO]]), feeding the same [[Image]] / feature path.
  *
  * Only formats the JDK genuinely cannot decode (MP3, H.264…) keep the
  * byte-hash fallback in [[Multimodal]] — the dispatch is per-row on
  * the `format` column, so adding a codec never touches the pipeline.
  */
object Codec {

  // ------------------------------------------------------------ images

  /** Decoded RGB image, 8 bits per channel, row-major interleaved. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    def r(x: Int, y: Int): Int = pixels(3 * (y * width + x)) & 0xff
    def g(x: Int, y: Int): Int = pixels(3 * (y * width + x) + 1) & 0xff
    def b(x: Int, y: Int): Int = pixels(3 * (y * width + x) + 2) & 0xff
  }

  /** Parses one P6 image starting at `off`; returns the image and the
    * offset just past its pixel data. Header tokens may be separated
    * by any whitespace and `#` comments (the netpbm spec). */
  def decodePpmAt(data: Array[Byte], off: Int): Option[(Image, Int)] = {
    var i = off
    def skipWs(): Unit = {
      var done = false
      while (!done && i < data.length) {
        val c = data(i).toChar
        if (c == '#') { while (i < data.length && data(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def token(): String = {
      skipWs()
      val s = new StringBuilder
      while (i < data.length && !data(i).toChar.isWhitespace) {
        s.append(data(i).toChar); i += 1
      }
      s.toString
    }
    if (token() != "P6") return None
    try {
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      if (w <= 0 || h <= 0 || maxval != 255) return None
      i += 1 // exactly one whitespace byte after maxval per spec
      // 3*w*h in Long: huge header dims must not overflow Int and
      // sneak a negative length past the bounds check
      val n = 3L * w * h
      if (n > data.length - i) return None
      val px = java.util.Arrays.copyOfRange(data, i, i + n.toInt)
      Some((Image(w, h, px), i + n.toInt))
    } catch { case _: NumberFormatException => None }
  }

  def decodePpm(data: Array[Byte]): Option[Image] =
    decodePpmAt(data, 0).map(_._1)

  /** All frames of a concatenated-P6 "ppmseq" container. */
  def decodePpmSeq(data: Array[Byte]): Seq[Image] = {
    val frames = Seq.newBuilder[Image]
    var off = 0
    var ok = true
    while (ok && off < data.length) decodePpmAt(data, off) match {
      case Some((img, next)) => frames += img; off = next
      case None => ok = false
    }
    frames.result()
  }

  /** JPEG / PNG / BMP / GIF decode via the JDK's `javax.imageio` —
    * on every JVM classpath, so "compressed formats need external
    * libraries" never applied to these four. The decoded frame is
    * redrawn into 3-byte BGR (normalizing away palette/alpha/gray
    * source models) and re-ordered into this codec's interleaved RGB
    * [[Image]], so JPEG bytes and a pixel-identical PPM produce the
    * SAME features downstream. Returns None on undecodable bytes
    * (ImageIO yields null) — the caller's fallback path. */
  def decodeImageIO(data: Array[Byte]): Option[Image] = {
    import java.awt.image.BufferedImage
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
    if (src == null) return None
    val w = src.getWidth; val h = src.getHeight
    if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue) return None
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val g = rgb.createGraphics()
    try g.drawImage(src, 0, 0, null) finally g.dispose()
    val bgr = rgb.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val px = new Array[Byte](bgr.length)
    var i = 0
    while (i < bgr.length) { // BGR → RGB
      px(i) = bgr(i + 2); px(i + 1) = bgr(i + 1); px(i + 2) = bgr(i)
      i += 3
    }
    Some(Image(w, h, px))
  }

  /** Nearest-neighbor resize — deterministic, no filtering kernel to
    * disagree about across platforms. */
  def resize(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, y * img.height / h)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, x * img.width / w)
        val s = 3 * (sy * img.width + sx)
        val d = 3 * (y * w + x)
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1); out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** 16-dim image feature: per-channel means (3) + per-channel std
    * devs (3) + 8-bin luma histogram + horizontal edge energy (1) +
    * log-aspect (1). All in [0, 1]-ish ranges, deterministic. */
  def imageFeatures(img: Image): Array[Float] = {
    val n = img.width * img.height
    val out = new Array[Float](Multimodal.FeatureDim)
    val sums = new Array[Double](3)
    val sqs = new Array[Double](3)
    val hist = new Array[Int](8)
    var edge = 0.0
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val r = img.r(x, y); val g = img.g(x, y); val b = img.b(x, y)
        sums(0) += r; sums(1) += g; sums(2) += b
        sqs(0) += r.toDouble * r; sqs(1) += g.toDouble * g; sqs(2) += b.toDouble * b
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hist(math.min(7, luma / 32)) += 1
        if (x > 0) {
          val lumaPrev = (299 * img.r(x - 1, y) + 587 * img.g(x - 1, y) +
            114 * img.b(x - 1, y)) / 1000
          edge += math.abs(luma - lumaPrev)
        }
        x += 1
      }
      y += 1
    }
    var c = 0
    while (c < 3) {
      val mean = sums(c) / n
      out(c) = (mean / 255.0).toFloat
      out(3 + c) = (math.sqrt(math.max(0, sqs(c) / n - mean * mean)) / 255.0).toFloat
      c += 1
    }
    var k = 0
    while (k < 8) { out(6 + k) = hist(k).toFloat / n; k += 1 }
    out(14) = (edge / (255.0 * math.max(1, n - img.height))).toFloat
    out(15) = math.log(img.width.toDouble / img.height).toFloat
    out
  }

  /** Perceptual average hash (aHash): the image downsamples to an 8×8
    * luminance grid and each cell contributes one bit — 1 when its
    * luma exceeds the grid mean. Brightness shifts, re-encodes, and
    * resizes of the same picture preserve most above/below-mean
    * comparisons, so perceptual duplicates land within a small hamming
    * distance while different pictures disagree on ~32 bits. All
    * integer luminance (no float mean): deterministic across JVMs.
    * Bit k = cell (k % 8, k / 8), LSB first. */
  def aHash(img: Image): Long = {
    val small = resize(img, 8, 8)
    val lum = new Array[Int](64)
    var i = 0
    var total = 0L
    while (i < 64) {
      val x = i % 8; val y = i / 8
      lum(i) = (299 * small.r(x, y) + 587 * small.g(x, y) +
        114 * small.b(x, y)) / 1000
      total += lum(i)
      i += 1
    }
    // compare 64*luma > total, avoiding a fractional mean
    var h = 0L
    i = 0
    while (i < 64) {
      if (64L * lum(i) > total) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Perceptual DCT hash (pHash family): 32×32 luminance → 2-D DCT-II
    * → top-left 8×8 low-frequency block; bit k (k = 1..63, coeff
    * (k%8, k/8)) is set when |coeff| exceeds 1/8 of the block's peak
    * AC magnitude — the ENERGY-SIGNATURE rule rather than the classic
    * median rule. Why: the median of 63 AC coefficients sits in the
    * noise floor for images with sparse spectra (smooth gradients,
    * blank regions — and this corpus's byte-cycled textures under a
    * clamped tone change), making ~half the bits sign-of-noise; the
    * classic rule measured hamming 20+ between tone-mapped copies
    * here. The energy rule compares each coefficient to a threshold
    * that SCALES WITH the image: any positive linear tone map
    * (brightness/contrast/gamma-linearization) multiplies every AC
    * coefficient and the threshold alike, leaving every bit fixed —
    * measured 0-1 bits across contrast stretches, tone maps, and
    * nearest-neighbor resizes, vs ≥13 between different pictures.
    * Trade-off (documented, not hidden): degenerate near-blank images
    * set few bits, so two pure axis-aligned gradients sit ~2-4 bits
    * apart — band at maxDist ≤ 6 and treat smooth synthetic frames as
    * a quarantine class. Integer luma, fixed summation order, double
    * arithmetic → deterministic across JVMs (Java 17+ is strictfp
    * everywhere). Bit 0 (DC) is always 0: DC is pure brightness. */
  // DCT-II basis for pHash's fixed n=32: 8 output frequencies × 32
  // samples, shared across all pHash calls on the executor (hoisted —
  // per-call tabulate cost ~256 cos() per image measured as a real
  // fraction of pHash time). Immutable after class init, so safe to
  // share across Spark task threads.
  private val PHashCosT: Array[Array[Double]] = Array.tabulate(8, 32)(
    (u, x) => math.cos(math.Pi * (2 * x + 1) * u / 64.0))

  def pHash(img: Image): Long = {
    val n = 32
    val small = resize(img, n, n)
    val lum = new Array[Double](n * n)
    var i = 0
    while (i < n * n) {
      val x = i % n; val y = i / n
      lum(i) = (299 * small.r(x, y) + 587 * small.g(x, y) +
        114 * small.b(x, y)) / 1000
      i += 1
    }
    // separable DCT-II, computing only the first 8 frequencies per axis
    val cosT = PHashCosT
    val tmp = Array.ofDim[Double](8, n) // (u, y): row transform
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < n) {
        var s = 0.0; var x = 0
        while (x < n) { s += lum(y * n + x) * cosT(u)(x); x += 1 }
        tmp(u)(y) = s; y += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      u = 0
      while (u < 8) {
        var s = 0.0; var y = 0
        while (y < n) { s += tmp(u)(y) * cosT(v)(y); y += 1 }
        coef(v * 8 + u) = s; u += 1
      }
      v += 1
    }
    var maxAc = 0.0
    i = 1
    while (i < 64) {
      val a = math.abs(coef(i))
      if (a > maxAc) maxAc = a
      i += 1
    }
    val tau = maxAc / 8.0
    var h = 0L
    i = 1
    while (i < 64) {
      if (math.abs(coef(i)) > tau) h |= (1L << i)
      i += 1
    }
    h
  }

  // ------------------------------------------------------------- audio

  /** Decoded PCM audio, downmixed to mono 16-bit. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le16(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)
  private def le32(d: Array[Byte], i: Int): Long =
    (le16(d, i).toLong) | (le16(d, i + 2).toLong << 16)

  /** RIFF/WAVE parser for PCM (format tag 1), 16-bit samples; walks
    * the chunk list, honors chunk sizes, downmixes channels. */
  def decodeWav(data: Array[Byte]): Option[Audio] = {
    if (data.length < 44) return None
    if (new String(data, 0, 4, "US-ASCII") != "RIFF") return None
    if (new String(data, 8, 4, "US-ASCII") != "WAVE") return None
    var i = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (i + 8 <= data.length) {
      val id = new String(data, i, 4, "US-ASCII")
      val size = le32(data, i + 4)
      val body = i + 8
      // corrupt/negative sizes must not wedge the walk (a size of -8
      // would leave i unchanged — an infinite loop inside an executor
      // task) or read past the buffer; a truncated file decodes as far
      // as its valid prefix allows
      if (size < 0 || size > Int.MaxValue - 8) return None
      id match {
        case "fmt " =>
          if (size < 16 || body + 16 > data.length) return None
          if (le16(data, body) != 1) return None // PCM only
          channels = le16(data, body + 2)
          sampleRate = le32(data, body + 4).toInt
          bits = le16(data, body + 14)
        case "data" if bits == 16 && channels > 0 =>
          val n = math.min(size.toInt, data.length - body) / (2 * channels)
          val mono = new Array[Short](n)
          var s = 0
          while (s < n) {
            var acc = 0
            var ch = 0
            while (ch < channels) {
              acc += le16(data, body + 2 * (s * channels + ch)).toShort
              ch += 1
            }
            mono(s) = (acc / channels).toShort
            s += 1
          }
          samples = mono
        case _ => ()
      }
      // advance in Long so body+size can't overflow back into range
      val next = body.toLong + size + (size & 1L) // chunks are word-aligned
      i = if (next > data.length) data.length else next.toInt
    }
    if (sampleRate > 0 && samples != null) Some(Audio(sampleRate, samples))
    else None
  }

  /** 16-dim audio feature: RMS (1) + zero-crossing rate (1) + peak
    * (1) + log-duration (1) + 12-segment energy profile. */
  /** Perceptual audio fingerprint (Haitsma–Kalker shape, reduced to
    * one 64-bit word): the clip is cut into 65 equal frames, each
    * frame's energy is the sum of squared samples, and bit i is set
    * when frame i+1 carries MORE energy than frame i — the
    * sign-of-energy-delta signature. Volume changes scale every
    * frame energy by the same factor, so the comparisons — and the
    * fingerprint — are amplitude-invariant by construction (integer
    * re-quantization of a scaled clip flips at most the bits whose
    * neighboring frames were already near-equal); re-encodes and
    * small edits flip few bits, different material disagrees on ~32.
    * Integer/double arithmetic in a fixed order → deterministic.
    * Empty/too-short clips (< 65 samples) fingerprint 0L with the
    * `decoded` flag carrying the distinction upstream. Band through
    * [[graft.operators.Dedup.hammingPairs]] like the image hashes. */
  def audioHash(a: Audio): Long = {
    val n = a.samples.length
    if (n < 65) return 0L
    val e = new Array[Double](65)
    var f = 0
    while (f < 65) {
      val from = n.toLong * f / 65
      val until = n.toLong * (f + 1) / 65
      var s = 0.0
      var j = from
      while (j < until) {
        val v = a.samples(j.toInt).toDouble
        s += v * v
        j += 1
      }
      e(f) = s
      f += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) h |= (1L << i)
      i += 1
    }
    h
  }

  def audioFeatures(a: Audio): Array[Float] = {
    val out = new Array[Float](Multimodal.FeatureDim)
    val n = a.samples.length
    if (n == 0) return out
    var sq = 0.0; var zc = 0; var peak = 0
    var i = 0
    while (i < n) {
      val s = a.samples(i).toInt
      sq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s >= 0) != (a.samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    out(0) = (math.sqrt(sq / n) / 32768.0).toFloat
    out(1) = zc.toFloat / n
    out(2) = peak / 32768.0f
    out(3) = math.log1p(n.toDouble / a.sampleRate).toFloat
    var seg = 0
    while (seg < 12) {
      val from = n.toLong * seg / 12
      val until = n.toLong * (seg + 1) / 12
      var e = 0.0
      var j = from
      while (j < until) { val s = a.samples(j.toInt).toInt; e += s.toDouble * s; j += 1 }
      val len = math.max(1L, until - from)
      out(4 + seg) = (math.sqrt(e / len) / 32768.0).toFloat
      seg += 1
    }
    out
  }
}
