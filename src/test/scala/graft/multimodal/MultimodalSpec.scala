package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C11 — multimodal plumbing: schema, featurize batch shape, frame
  * sampling. The codec is a deterministic stub by design. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._
  import Multimodal._

  def media = Seq(
    MediaRow(1L, Array[Byte](1, 2, 3, 4), "jpeg", 640, 480, 1),
    MediaRow(2L, Array[Byte](9, 8, 7), "wav", 0, 0, 1),
    MediaRow(3L, Array.tabulate(64)(_.toByte), "mp4", 1280, 720, 10)
  ).toDS()

  test("featurize: one fixed-size feature row per media row, deterministic") {
    val out = featurize(media).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.forall(_.feature.length == FeatureDim))
    assert(out(0).n_bytes == 4)
    val again = featurize(media).collect().sortBy(_.media_id)
    assert(out(2).feature.toSeq == again(2).feature.toSeq)
  }

  test("C31: aHash is brightness/resize-robust, discriminates pictures") {
    // a smooth gradient: perceptual transforms keep the above/below-
    // mean pattern; a different picture flips ~half the bits
    def gradient(w: Int, h: Int): Codec.Image = Codec.Image(w, h,
      Array.tabulate(3 * w * h) { i =>
        val p = i / 3; (((p % w) * 255) / w).toByte
      })
    def shifted(img: Codec.Image, d: Int): Codec.Image = img.copy(
      pixels = img.pixels.map(b => math.min(255, (b & 0xff) + d).toByte))
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = Codec.aHash(gradient(64, 64))
    assert(dist(base, Codec.aHash(shifted(gradient(64, 64), 16))) <= 3,
      "brightness shift must stay within hamming 3")
    assert(dist(base, Codec.aHash(gradient(32, 32))) <= 3,
      "resize of the same picture must stay within hamming 3")
    val other = Codec.Image(64, 64, Array.tabulate(3 * 64 * 64) { i =>
      val p = i / 3; ((((p / 64) % 2) ^ ((p % 64) % 2)) * 255).toByte
    }) // checkerboard
    assert(dist(base, Codec.aHash(other)) >= 16,
      "different pictures must disagree substantially")
  }

  test("C57: pHash is contrast/tone/resize-invariant, discriminates pictures") {
    // smooth 2-D blob: energy across several low frequencies — the
    // image class the median-rule pHash failed on (noise-floor bits)
    def blob(w: Int, h: Int): Codec.Image = Codec.Image(w, h,
      Array.tabulate(3 * w * h) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        ((x * y * 255 / ((w - 1) * (h - 1)) +
          (x + y) * 127 / (w + h - 2)) / 2).toByte
      })
    def contrast(img: Codec.Image, num: Int, den: Int): Codec.Image = img.copy(
      pixels = img.pixels.map { b =>
        val v = 128 + ((b & 0xff) - 128) * num / den
        math.max(0, math.min(255, v)).toByte
      })
    def lin(img: Codec.Image, num: Int, den: Int, off: Int): Codec.Image = img.copy(
      pixels = img.pixels.map { b =>
        val v = (b & 0xff) * num / den + off
        math.max(0, math.min(255, v)).toByte
      })
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val b64 = blob(64, 64)
    val base = Codec.pHash(b64)
    // linear tone maps scale every AC coefficient AND the threshold
    // together — bits fixed (measured 0, asserted with headroom)
    assert(dist(base, Codec.pHash(contrast(b64, 5, 4))) <= 4,
      "contrast stretch must stay within hamming 4")
    assert(dist(base, Codec.pHash(contrast(b64, 3, 4))) <= 4,
      "contrast reduction must stay within hamming 4")
    assert(dist(base, Codec.pHash(lin(b64, 7, 8, 16))) <= 4,
      "linear tone map must stay within hamming 4")
    assert(dist(base, Codec.pHash(blob(32, 32))) <= 4,
      "resize of the same picture must stay within hamming 4")
    // an 8-px block checkerboard concentrates energy elsewhere
    val other = Codec.Image(64, 64, Array.tabulate(3 * 64 * 64) { i =>
      val p = i / 3; (((((p / 64) / 8) % 2) ^ (((p % 64) / 8) % 2)) * 255).toByte
    })
    assert(dist(base, Codec.pHash(other)) >= 8,
      "different pictures must disagree substantially")
    // textured (rendered-corpus-style) images: strong separation and
    // tone invariance — the class q_mm_phash_dups actually bands
    val tex1 = Codec.decodePpm(Multimodal.renderPpm(
      "first deterministic texture".getBytes("UTF-8"), 16, 16)).get
    val tex2 = Codec.decodePpm(Multimodal.renderPpm(
      "second entirely different".getBytes("UTF-8"), 16, 16)).get
    assert(dist(Codec.pHash(tex1), Codec.pHash(contrast(tex1, 5, 4))) <= 6,
      "clamped contrast on a texture must stay within the banding cut")
    assert(dist(Codec.pHash(tex1), Codec.pHash(tex2)) >= 16,
      "different textures must disagree substantially")
    // determinism: same pixels, same hash
    assert(base == Codec.pHash(blob(64, 64)))
  }

  test("C67: audioHash is volume-invariant, discriminates clips, quarantines junk") {
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    def clip(seed: String): Codec.Audio =
      Codec.decodeWav(Multimodal.renderWavPcm16(seed.getBytes("UTF-8"), 800)).get
    def scaled(a: Codec.Audio, num: Int, den: Int): Codec.Audio =
      a.copy(samples = a.samples.map(s => (s.toInt * num / den).toShort))
    val a = clip("first deterministic audio clip content")
    val base = Codec.audioHash(a)
    // amplitude invariance: energies scale together, delta signs hold
    // (integer re-quantization may flip near-equal neighbors only)
    assert(dist(base, Codec.audioHash(scaled(a, 1, 2))) <= 3,
      "half volume must stay within hamming 3")
    assert(dist(base, Codec.audioHash(scaled(a, 1, 8))) <= 3,
      "eighth volume must stay within hamming 3")
    val b = clip("completely different material entirely")
    assert(dist(base, Codec.audioHash(b)) >= 16,
      "different clips must disagree substantially")
    // determinism + short-clip guard
    assert(base == Codec.audioHash(clip("first deterministic audio clip content")))
    assert(Codec.audioHash(Codec.Audio(8000, new Array[Short](10))) == 0L)
    // end-to-end: planted half-volume dup bands; junk is quarantined
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, Multimodal.renderWavPcm16("clip one payload".getBytes, 800), "wav", 0, 0, 1),
      MediaRow(2L, Array[Byte](1, 2, 3), "wav", 0, 0, 1)).toDS()
    val hs = Multimodal.audioHashes(rows).collect().map(h => h.media_id -> h.decoded).toMap
    assert(hs == Map(1L -> true, 2L -> false))
  }

  test("C31: imageHashes + hammingPairs find the perceptual dup, not the stranger") {
    val w = 16; val h = 16
    def grad(d: Int) = Multimodal.renderPpm(
      Array.tabulate(3 * w * h)(i => math.min(255, ((i / 3) % w) * 16 + d).toByte), w, h)
    val rows = Seq(
      MediaRow(1L, grad(0), "ppm", w, h, 1),
      MediaRow(2L, grad(8), "ppm", w, h, 1),          // brightness-shifted dup
      MediaRow(3L, Multimodal.renderPpm("completely different pixels".getBytes, w, h), "ppm", w, h, 1),
      MediaRow(4L, Array[Byte](1, 2, 3), "ppm", w, h, 1) // undecodable
    ).toDS()
    val hashes = Multimodal.imageHashes(rows).toDF()
    assert(hashes.filter(!col("decoded")).select("media_id")
      .as[Long].collect().toSeq == Seq(4L), "undecodable row accounted, not dropped")
    val pairs = graft.operators.Dedup
      .hammingPairs(hashes.filter(col("decoded")), "media_id", "ahash", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected only the planted dup pair: $pairs")
  }

  test("frame sampling keeps every Nth frame index") {
    val sampled = sampleFrameIndexes(media.toDF(), stride = 3)
      .filter(col("media_id") === 3L)
      .select("sampled_frames").head().getSeq[Long](0)
    assert(sampled == Seq(0L, 3L, 6L, 9L))
    // a zero-frame row samples NOTHING (sequence(0, -1) counts down in
    // Spark — unguarded it reported phantom frame 0)
    import spark.implicits._
    val zero = sampleFrameIndexes(
      Seq((9L, 0L)).toDF("media_id", "n_frames"), stride = 3)
      .select("sampled_frames").head().getSeq[Long](0)
    assert(zero.isEmpty, s"zero-frame row sampled $zero")
    intercept[IllegalArgumentException] {
      sampleFrameIndexes(media.toDF(), stride = 0)
    }
  }

  test("C68: videoHashes decodes, samples, hashes; quarantines junk") {
    val seeds = (0 until 6).map(f =>
      s"frame content number $f of the deterministic clip".getBytes("UTF-8"))
    val vid = renderPpmSeq(seeds, 16, 16)
    val rows = Seq(
      MediaRow(1L, vid, "ppmseq", 16, 16, 6),
      MediaRow(2L, Array[Byte](9, 9, 9), "ppmseq", 16, 16, 1),
      MediaRow(3L, Array.emptyByteArray, "ppmseq", 16, 16, 0)).toDS()
    val all = videoHashes(rows, stride = 1).collect()
      .map(v => v.media_id -> v).toMap
    assert(all(1L).decoded && all(1L).n_frames == 6)
    // sampled hashes ARE the per-frame aHashes, in frame order
    val expected = seeds.map(s =>
      Codec.aHash(Codec.decodePpm(renderPpm(s, 16, 16)).get))
    assert(all(1L).fhashes.toSeq == expected)
    // stride keeps frames 0, 2, 4 but still counts all 6
    val strided = videoHashes(rows.filter(_.media_id == 1L), stride = 2)
      .head()
    assert(strided.n_frames == 6 &&
      strided.fhashes.toSeq == Seq(expected(0), expected(2), expected(4)))
    // junk and empty payloads quarantine, never throw or vanish
    assert(!all(2L).decoded && all(2L).fhashes.isEmpty)
    assert(!all(3L).decoded && all(3L).fhashes.isEmpty)
    intercept[IllegalArgumentException] { videoHashes(rows, stride = 0) }
  }

  test("C68: hammingSetPairs finds the trimmed+toned copy, rejects band collisions") {
    import graft.operators.Dedup
    // video 1: 8 frames; video 2: frames 2..7 brightness-shifted
    // (trimmed + toned — no byte, md5, count or alignment equality);
    // video 3: unrelated; video 4: CRAFTED band collision with 1 —
    // shares one frame's low 16 bits exactly, differs on 40+ high bits
    // (the banding proposes it; the containment verify must kill it)
    def frame(tag: String) = s"distinct frame payload $tag".getBytes("UTF-8")
    val fs1 = (0 until 8).map(f => frame(s"a$f"))
    val fs2 = fs1.drop(2).map(_.map(b => math.min(255, (b & 0xff) + 16).toByte))
    // genuinely different material: a different cycle period (length),
    // not a one-character edit — cycled seeds differing in one char
    // render near-identical rasters, which is exactly what the
    // operator SHOULD pair
    val fs3 = (0 until 8).map(f => Array.tabulate(3 * 16 * 16)(i =>
      (((i / 3) % 16) * 16 + f * 5).toByte))
    val h1 = videoHashes(Seq(
        MediaRow(1L, renderPpmSeq(fs1, 16, 16), "ppmseq", 16, 16, 8)).toDS())
      .head().fhashes
    val collider = (h1(0) & 0xffffL) | (~h1(0) & ~0xffffL)
    val sigs = Seq(
      (1L, h1.toSeq),
      (2L, videoHashes(Seq(MediaRow(2L, renderPpmSeq(fs2, 16, 16),
        "ppmseq", 16, 16, 6)).toDS()).head().fhashes.toSeq),
      (3L, videoHashes(Seq(MediaRow(3L, renderPpmSeq(fs3, 16, 16),
        "ppmseq", 16, 16, 8)).toDS()).head().fhashes.toSeq),
      (4L, Seq(collider))).toDF("media_id", "fhashes")
    val pairs = Dedup.hammingSetPairs(sigs, "media_id", "fhashes",
        maxDist = 3, minOverlap = 0.5)
      .select("id_a", "id_b", "overlap")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected only the planted pair: $pairs")
    // containment direction: all 6 trimmed frames match (6/6 = 1.0),
    // while 1-in-2 is only 6/8 — max keeps the trim-robust direction
    assert(pairs.head._3 == 1.0, s"overlap ${pairs.head._3}")
    // the collider really did get PROPOSED (it reaches the verify with
    // overlap 0 when the threshold is lifted) — (1,4)'s absence above
    // is the verify killing it, not the banding missing it
    val proposed = Dedup.hammingSetPairs(sigs, "media_id", "fhashes",
        maxDist = 3, minOverlap = 0.0)
      .filter(col("id_a") === 1L && col("id_b") === 4L)
      .select("overlap").as[Double].collect().toSeq
    assert(proposed == Seq(0.0),
      s"crafted collision must be proposed then scored 0: $proposed")
  }

  test("C68: q_mm_video_dups recalls every planted trimmed copy at sf0.001") {
    val pairs = graft.queries.DocQueries
      .qMmVideoDups(spark, "/root/testdata/sf0.001")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id")).as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.nonEmpty && planted.subsetOf(pairs),
      s"missing planted pairs: ${planted -- pairs}")
  }

  test("resize target metadata rides along the plan") {
    val r = withResizeTarget(media.toDF(), 224, 224)
      .select("resize_target.width", "resize_target.height").head()
    assert(r.getInt(0) == 224 && r.getInt(1) == 224)
  }

  test("rendered media decode through the REAL codecs, not the fallback") {
    val seed = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val ppm = renderPpm(seed, 16, 16)
    val wav = renderWavPcm16(seed, 800)
    // both containers parse with the production decoders
    val img = Codec.decodePpm(ppm)
    assert(img.exists(i => i.width == 16 && i.height == 16))
    val aud = Codec.decodeWav(wav)
    assert(aud.exists(a => a.samples.length == 800 && a.sampleRate == 8000))
    // ...and the dispatched feature is the codec's, NOT the byte-hash
    assert(decodeFeature("ppm", ppm).toSeq !=
      byteHashFallback(ppm).toSeq)
    assert(decodeFeature("wav", wav).toSeq !=
      byteHashFallback(wav).toSeq)
    // deterministic: same text, same payload, same feature
    assert(renderPpm(seed, 16, 16).toSeq == ppm.toSeq)
    assert(decodeFeature("wav", renderWavPcm16(seed, 800)).toSeq ==
      decodeFeature("wav", wav).toSeq)
  }

  test("q_mm_features drives the codecs distributed and matches local decode") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.DocQueries.qMmFeatures(spark, dir)
    val rows = out.collect()
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.length == 2 * nDocs, s"${rows.length} vs 2*$nDocs")
    // the query emits the harness-hashable signature: FeatureDim
    // fixed-precision floats joined by commas
    def sig(feature: Array[Float]): String =
      feature.map(f => String.format(java.util.Locale.US, "%.4f",
        Double.box(f.toDouble))).mkString(",")
    assert(rows.forall(_.getString(3).split(',').length == FeatureDim))
    // a sampled row's feature equals the local single-row decode of
    // the same rendered payload — the distributed pass adds nothing
    val doc0 = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val seed = doc0.getBytes("UTF-8")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getString(3) ==
      sig(decodeFeature("ppm", renderPpm(seed, 16, 16))))
    assert(byId(1L).getString(3) ==
      sig(decodeFeature("wav", renderWavPcm16(seed, 800))))
  }

  test("C77: scene cuts land at content changes, not at brightness jitter; edges quarantine") {
    import spark.implicits._
    val seed = "scene segmentation drives shot boundary detection".getBytes
    def rot(a: Array[Byte], k: Int): Array[Byte] =
      { val r = k % a.length; a.drop(r) ++ a.take(r) }
    // 3 scenes × 3 frames; intra-scene frames differ by +1 brightness
    val sceneFrames = (0 until 3).flatMap { sc =>
      val base = rot(seed, sc * 13)
      (0 until 3).map(j => base.map(b => (b + j).toByte))
    }
    val media = Seq(
      MediaRow(1L, Multimodal.renderPpmSeq(sceneFrames, 16, 16), "ppmseq", 16, 16, 9),
      // single-frame video: exactly one scene
      MediaRow(2L, Multimodal.renderPpmSeq(Seq(seed), 16, 16), "ppmseq", 16, 16, 1),
      // junk payload: quarantined with empty scenes
      MediaRow(3L, Array[Byte](1, 2, 3), "mp4", 0, 0, 0)
    ).toDS()
    val out = Multimodal.sceneCuts(
        Multimodal.videoHashes(media, stride = 1).toDF())
      .collect().map(r => r.getLong(0) -> r).toMap
    val v1 = out(1L)
    assert(v1.getAs[Int]("n_scenes") == 3, v1.toString)
    assert(v1.getAs[collection.Seq[Int]]("scene_starts").toSeq == Seq(1, 4, 7), v1.toString)
    // keyframes are the hashes at the scene-start frames
    val hs = sceneFrames.map(f =>
      Codec.aHash(Codec.decodePpm(Multimodal.renderPpm(f, 16, 16)).get))
    assert(v1.getAs[collection.Seq[Long]]("keyframes").toSeq == Seq(hs(0), hs(3), hs(6)))
    assert(out(2L).getAs[Int]("n_scenes") == 1 &&
      out(2L).getAs[collection.Seq[Int]]("scene_starts").toSeq == Seq(1))
    val junk = out(3L)
    assert(!junk.getAs[Boolean]("decoded") &&
      junk.getAs[Int]("n_scenes") == 0 &&
      junk.getAs[collection.Seq[Int]]("scene_starts").isEmpty)
  }
}
