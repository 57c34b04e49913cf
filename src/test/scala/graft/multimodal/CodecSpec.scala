package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec specs (no Spark needed): PPM decode/resize/features, WAV
  * decode/features, ppmseq frame extraction, and the format dispatch. */
class CodecSpec extends AnyFunSuite {

  /** Builds a P6 image whose pixel (x, y) is `f(x, y)` = (r, g, b). */
  def ppm(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val i = 3 * (y * w + x)
      px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
    }
    header ++ px
  }

  /** Minimal RIFF/WAVE PCM16 mono file around `samples`. */
  def wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  test("PPM decode recovers dimensions and pixels, with comments") {
    val bytes = ("P6\n# a comment\n4 2\n255\n").getBytes("US-ASCII") ++
      Array.tabulate(24)(_.toByte)
    val img = Codec.decodePpm(bytes).get
    assert(img.width == 4 && img.height == 2)
    assert(img.r(0, 0) == 0 && img.g(0, 0) == 1 && img.b(0, 0) == 2)
    assert(img.r(3, 1) == 21)
    assert(Codec.decodePpm("P5 2 2 255 ....".getBytes("US-ASCII")).isEmpty)
    assert(Codec.decodePpm(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("resize is nearest-neighbor and preserves solid colors") {
    val red = Codec.decodePpm(ppm(8, 4)((_, _) => (200, 10, 10))).get
    val small = Codec.resize(red, 2, 2)
    assert(small.width == 2 && small.height == 2)
    assert(small.r(1, 1) == 200 && small.g(1, 1) == 10)
    val up = Codec.resize(small, 5, 5)
    assert(up.r(4, 4) == 200)
  }

  test("image features separate color and structure") {
    val red = Codec.imageFeatures(Codec.decodePpm(ppm(8, 8)((_, _) => (255, 0, 0))).get)
    val blue = Codec.imageFeatures(Codec.decodePpm(ppm(8, 8)((_, _) => (0, 0, 255))).get)
    assert(red(0) > 0.99f && red(2) < 0.01f)   // red mean high, blue mean low
    assert(blue(2) > 0.99f && blue(0) < 0.01f)
    assert(red(3) < 0.01f)                      // solid → zero stddev
    // striped image has horizontal edge energy, solid has none
    val stripes = Codec.imageFeatures(
      Codec.decodePpm(ppm(8, 8)((x, _) => if (x % 2 == 0) (255, 255, 255) else (0, 0, 0))).get)
    assert(stripes(14) > red(14))
    assert(red(14) == 0.0f)
  }

  test("WAV decode parses PCM16 and features track signal shape") {
    val sr = 8000
    val tone = Array.tabulate(8000) { i =>
      (math.sin(2 * math.Pi * 440 * i / sr) * 16384).toShort
    }
    val a = Codec.decodeWav(wav(sr, tone)).get
    assert(a.sampleRate == sr && a.samples.length == 8000)
    val feat = Codec.audioFeatures(a)
    // sine RMS = amp/sqrt(2) = 16384/1.414 ≈ 11585 → /32768 ≈ 0.3535
    assert(math.abs(feat(0) - 0.3535f) < 0.01f)
    // zero crossings of a 440 Hz tone over 1 s ≈ 880 → rate 0.11
    assert(math.abs(feat(1) - 0.11f) < 0.01f)
    assert(math.abs(feat(2) - 0.5f) < 0.01f) // peak 16384/32768
    val silence = Codec.audioFeatures(Codec.decodeWav(wav(sr, new Array[Short](800))).get)
    assert(silence(0) == 0.0f)
    assert(Codec.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
  }

  test("ppmseq splits concatenated frames; dispatch samples them") {
    val f1 = ppm(4, 4)((_, _) => (255, 0, 0))
    val f2 = ppm(4, 4)((_, _) => (0, 255, 0))
    val f3 = ppm(4, 4)((_, _) => (0, 0, 255))
    val seq = f1 ++ f2 ++ f3
    val frames = Codec.decodePpmSeq(seq)
    assert(frames.length == 3)
    assert(frames(1).g(0, 0) == 255)
    // stride-2 sampling keeps frames 0 and 2 → mean of red and blue
    val feat = Multimodal.decodeFeature("ppmseq", seq)
    assert(math.abs(feat(0) - 0.5f) < 0.01f) // red mean
    assert(feat(1) < 0.01f)                  // no green in sampled frames
    assert(math.abs(feat(2) - 0.5f) < 0.01f) // blue mean
  }

  test("dispatch: real codecs for ppm/wav, labeled fallback otherwise") {
    val p = ppm(4, 4)((_, _) => (10, 20, 30))
    assert(Multimodal.decodeFeature("ppm", p).toSeq ==
      Codec.imageFeatures(Codec.resize(Codec.decodePpm(p).get, 32, 32)).toSeq)
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.decodeFeature("jpeg", junk).toSeq ==
      Multimodal.byteHashFallback(junk).toSeq)
    // corrupt payload under a real-codec format falls back, not throws
    assert(Multimodal.decodeFeature("ppm", junk).toSeq ==
      Multimodal.byteHashFallback(junk).toSeq)
  }

  /** Encodes pixels `f(x, y)` via the JDK into `fmt` (png/jpg/bmp/gif)
    * bytes — the fixture generator for the ImageIO decode path. */
  def encode(fmt: String, w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("PNG/BMP/GIF decode via ImageIO matches a pixel-identical PPM byte-exactly") {
    val grad = (x: Int, y: Int) => (x * 16, y * 16, 128)
    val viaPpm = Codec.decodePpm(ppm(16, 16)(grad)).get
    for (fmt <- Seq("png", "bmp", "gif")) {
      val img = Codec.decodeImageIO(encode(fmt, 16, 16)(grad)).get
      assert(img.width == 16 && img.height == 16, fmt)
      if (fmt == "gif") {
        // GIF palettizes to 256 colors: features close, not byte-equal
        val a = Codec.imageFeatures(img); val b = Codec.imageFeatures(viaPpm)
        (0 until 6).foreach(i => assert(math.abs(a(i) - b(i)) < 0.05f, s"$fmt dim $i"))
      } else {
        assert(img.pixels.toSeq == viaPpm.pixels.toSeq, fmt)
        assert(Codec.imageFeatures(img).toSeq == Codec.imageFeatures(viaPpm).toSeq, fmt)
      }
    }
  }

  test("JPEG decode is real: features track the (lossy) pixel content") {
    val bytes = encode("jpg", 16, 16)((_, _) => (200, 40, 40))
    val img = Codec.decodeImageIO(bytes).get
    assert(img.width == 16 && img.height == 16)
    val feat = Multimodal.decodeFeature("jpeg", bytes)
    // solid color survives JPEG within a small tolerance — and is
    // nothing like the byte-hash fallback
    assert(math.abs(feat(0) - 200 / 255.0f) < 0.03f)
    assert(math.abs(feat(1) - 40 / 255.0f) < 0.03f)
    assert(feat.toSeq != Multimodal.byteHashFallback(bytes).toSeq)
    // jpg and jpeg dispatch identically
    assert(Multimodal.decodeFeature("jpg", bytes).toSeq == feat.toSeq)
  }

  test("decode guards: truncated JPEG, huge PPM header, corrupt WAV chunks") {
    // a JPEG SOI marker followed by garbage makes ImageIO throw — the
    // dispatch guard turns that into the fallback, not a task failure
    val truncated = Array(0xFF, 0xD8, 0xFF, 0xE0, 9, 9, 9, 9).map(_.toByte)
    assert(Multimodal.decodeFeature("jpeg", truncated).toSeq ==
      Multimodal.byteHashFallback(truncated).toSeq)
    // 3*29000*29000 overflows Int to NEGATIVE, which used to slip past
    // the bounds check into a copyOfRange throw → must reject instead
    val huge = "P6\n29000 29000\n255\n".getBytes("US-ASCII") ++ Array.fill(64)(1.toByte)
    assert(Codec.decodePpm(huge).isEmpty)
    // negative chunk size must not loop forever or read out of bounds
    val negChunk = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(-8)
      .array()
    assert(Codec.decodeWav(negChunk).isEmpty)
    // fmt chunk shorter than its 16-byte body → reject, not read past end
    val shortFmt = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(4)
      .array()
    assert(Codec.decodeWav(shortFmt).isEmpty)
  }
}
