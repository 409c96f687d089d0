package graft.multimodal

import java.awt.image.BufferedImage

import graft.SpecBase
import graft.multimodal.Multimodal.{MediaCodec, MediaRow}

class MultimodalSpec extends SpecBase {
  import spark.implicits._

  private def row(id: Long, size: Int): MediaRow =
    MediaRow(id, "bin/opaque", Array.tabulate(size)(i => ((id + i) % 251).toByte))

  /** Real PNG payload: w×h filled with a solid RGB color. */
  private def pngRow(id: Long, w: Int, h: Int, rgb: Int): MediaRow = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    MediaRow(id, "image/png", MediaCodec.encodePng(img))
  }

  test("real PNG decode recovers true dimensions and luminance mass") {
    val rows = Seq(
      pngRow(1L, 17, 9, 0xffffff),  // white → top luma bin
      pngRow(2L, 33, 41, 0x000000), // black → bottom luma bin
      pngRow(3L, 8, 8, 0x808080))   // mid gray → middle bin
    val out = Multimodal.extractFeatures(rows.toDS().repartition(2))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width == 17 && out(1L).height == 9)
    assert(out(2L).width == 33 && out(2L).height == 41)
    assert(out(3L).width == 8 && out(3L).height == 8)
    // solid-color image puts all histogram mass in one bin
    assert(math.abs(out(1L).feature(MediaCodec.FeatureDim - 1) - 1f) < 1e-6)
    assert(math.abs(out(2L).feature(0) - 1f) < 1e-6)
    assert(math.abs(out(3L).feature(0x80 * 16 / 256) - 1f) < 1e-6)
  }

  test("undecodable payloads degrade to byte features, not failures") {
    val rows = (0L until 100L).map(i => row(i, 100 + (i % 7).toInt * 50))
    val ds = rows.toDS().repartition(5)
    val out = Multimodal.extractFeatures(ds).collect()
    assert(out.length == 100)
    val bySize = out.map(f => f.media_id -> f.n_bytes).toMap
    assert(rows.forall(r => bySize(r.media_id) == r.media.length))
    assert(out.forall(_.feature.length == MediaCodec.FeatureDim))
    assert(out.forall(f => f.width == -1 && f.height == -1))
  }

  test("decode is deterministic (same bytes → same features)") {
    val png = pngRow(9L, 5, 4, 0x123456).media
    val a = MediaCodec.decode(png)
    val b = MediaCodec.decode(png)
    assert(a._1 == b._1 && a._2 == b._2 && a._3.toSeq == b._3.toSeq)
    val x = MediaCodec.byteFeatures(Array[Byte](1, 2, 3, 4))
    val y = MediaCodec.byteFeatures(Array[Byte](1, 2, 3, 4))
    assert(x.toSeq == y.toSeq)
  }

  test("resize produces a real PNG with the target dimensions") {
    val rows = Seq(pngRow(1L, 40, 20, 0x336699), row(2L, 64))
    val out = Multimodal.resize(rows.toDS(), 10, 5)
      .collect().map(r => r.media_id -> r).toMap
    val resized = MediaCodec.decodeImage(out(1L).media)
    assert(resized.exists(i => i.getWidth == 10 && i.getHeight == 5))
    // solid color survives bilinear downscale exactly
    assert((resized.get.getRGB(3, 2) & 0xffffff) == 0x336699)
    // undecodable rows pass through byte-identical
    assert(out(2L).media.toSeq == rows(1).media.toSeq)
  }

  test("byte-bounded batching never overshoots by more than one row") {
    // rows of 1 MiB with a 2 MiB target: batches hold ≤3 rows, and the
    // pipeline still emits everything exactly once
    val rows = (0L until 10L).map(i => row(i, 1 << 20))
    val out = Multimodal.extractFeatures(rows.toDS().coalesce(1),
      maxBatchRows = 64, targetBatchBytes = 2L << 20).collect()
    assert(out.map(_.media_id).sorted.toSeq == (0L until 10L))
  }

  test("mediaStats projects metadata without touching payload decode") {
    val df = (0L until 5L).map(i => row(i, 64)).toDS().toDF()
    val stats = Multimodal.mediaStats(df).collect()
    assert(stats.length == 5)
    assert(stats.forall(_.getLong(2) == 64L))
  }

  /** Real WAV payload: 16-bit mono PCM sine at freqHz. */
  private def wavRow(id: Long, rate: Int, freqHz: Double, nSamples: Int,
                     amp: Double = 0.5): MediaRow = {
    val samples = Array.tabulate(nSamples)(i =>
      (amp * 32767 * math.sin(2 * math.Pi * freqHz * i / rate)).toShort)
    MediaRow(id, "audio/wav",
      Multimodal.WavCodec.encode(Multimodal.AudioClip(rate, samples)))
  }

  test("real WAV decode: round trip, duration, RMS and ZCR of a sine") {
    val rate = 8000
    val rows = Seq(wavRow(1L, rate, freqHz = 440.0, nSamples = rate), // 1 s
      row(99L, 128)) // garbage payload degrades
    val feats = Multimodal.extractAudioFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    val sine = feats(1L)
    assert(sine.sample_rate == rate && sine.n_samples == rate)
    assert(math.abs(sine.duration_s - 1.0) < 1e-9)
    // RMS of a 0.5-amplitude sine = 0.5/√2 ≈ 0.3536
    assert(math.abs(sine.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=${sine.rms}")
    // a 440 Hz sine crosses zero ~880 times/s
    assert(math.abs(sine.zero_cross_rate * rate - 880) < 5,
      s"zcr=${sine.zero_cross_rate}")
    assert(feats(99L).sample_rate == -1, "garbage must degrade, not die")
  }

  /** Real MJPEG AVI payload: solid-color frames. */
  private def aviRow(id: Long, fps: Int, colors: Seq[Int], w: Int = 32,
                     h: Int = 24): MediaRow = {
    val frames = colors.map { c =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      img
    }
    MediaRow(id, "video/avi", Multimodal.AviCodec.encode(frames, fps))
  }

  test("real AVI decode: a generated 2-frame MJPEG clip round-trips") {
    val row = aviRow(1L, fps = 25, colors = Seq(0xffffff, 0x000000))
    val clip = Multimodal.AviCodec.decode(row.media)
    assert(clip.isDefined)
    assert(clip.get.width == 32 && clip.get.height == 24)
    assert(clip.get.microSecPerFrame == 40000) // 25 fps
    assert(clip.get.frames.length == 2)
    // each frame payload is a real JPEG the JDK image reader accepts,
    // and pixel content survives (white vs black, JPEG-lossy tolerant)
    val imgs = clip.get.frames.map(MediaCodec.decodeImage(_).get)
    assert(imgs.forall(i => i.getWidth == 32 && i.getHeight == 24))
    assert(((imgs(0).getRGB(16, 12) >> 16) & 0xff) > 200)
    assert(((imgs(1).getRGB(16, 12) >> 16) & 0xff) < 50)
  }

  test("frameSample takes every stride-th frame, skipped frames undecoded") {
    val colors = (0 until 10).map(i => (i * 25) << 16) // 10 frames
    val rows = Seq(aviRow(1L, 30, colors),
      MediaRow(2L, "bin/garbage", Array.fill(500)(7.toByte)))
    val frames = Multimodal.frameSample(rows.toDS(), stride = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.media_id).distinct.toSeq == Seq(1L)) // garbage → 0 rows
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    // sampled payloads are the original JPEG chunk bytes (lazy decode)
    val full = Multimodal.AviCodec.decode(rows.head.media).get.frames
    assert(frames.forall(f => f.frame.toSeq == full(f.frame_idx).toSeq))
  }

  test("frameFeatures reduces video to the image feature path") {
    val rows = Seq(aviRow(5L, 10, Seq(0xffffff, 0x000000, 0xffffff)))
    val feats = Multimodal.frameFeatures(rows.toDS(), stride = 2)
      .collect().sortBy(_.media_id)
    assert(feats.length == 2) // frames 0 and 2
    assert(feats.forall(f => f.width == 32 && f.height == 24))
    // white frames: mass in the top luma bin
    assert(feats.forall(_.feature(MediaCodec.FeatureDim - 1) > 0.9f))
  }

  private def le32a(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("deeply nested LISTs walk iteratively — no StackOverflow, frame found") {
    // 60k nested "rec " LISTs (~720 KB) around one 2-byte frame chunk:
    // a recursive walker would StackOverflow; the iterative walk must
    // still find the innermost frame. Built front-to-back in one pass.
    val depth = 60000
    val nested = new Array[Byte](12 * depth + 10)
    def putTag(o: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, nested, o, 4)
    def put32(o: Int, v: Int): Unit =
      System.arraycopy(le32a(v), 0, nested, o, 4)
    var off = 0
    for (_ <- 0 until depth) {
      putTag(off, "LIST"); put32(off + 4, nested.length - off - 8)
      putTag(off + 8, "rec "); off += 12
    }
    putTag(off, "00dc"); put32(off + 4, 2)
    nested(off + 8) = 1; nested(off + 9) = 2
    val avihBody = new Array[Byte](56)
    System.arraycopy(le32a(40000), 0, avihBody, 0, 4) // usPerFrame
    System.arraycopy(le32a(32), 0, avihBody, 32, 4) // width
    System.arraycopy(le32a(24), 0, avihBody, 36, 4) // height
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = bos.write(b)
    def t(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    t("AVI ")
    t("LIST"); w(le32a(4 + 8 + 56)); t("hdrl")
    t("avih"); w(le32a(56)); w(avihBody)
    t("LIST"); w(le32a(4 + nested.length)); t("movi"); w(nested)
    val body = bos.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32a(body.length))
    out.write(body)
    val clip = Multimodal.AviCodec.decode(out.toByteArray)
    assert(clip.isDefined && clip.get.frames.length == 1)
    assert(clip.get.frames.head.toSeq == Seq[Byte](1, 2))
  }

  test("avih with undersized declared length is rejected, not misread") {
    val good = aviRow(1L, fps = 25, colors = Seq(0xffffff)).media
    assert(Multimodal.AviCodec.decode(good).isDefined)
    // avih chunk size field sits at offset 28 (RIFF 12 + LIST hdr 12 +
    // "avih" 4); declare only 8 body bytes — the width/height reads at
    // body+32/+36 would land in the NEXT chunk's bytes
    val bad = good.clone()
    System.arraycopy(le32a(8), 0, bad, 28, 4)
    assert(Multimodal.AviCodec.decode(bad).isEmpty)
  }

  test("frameFeatures drops frames whose packed id would alias") {
    // media_id past the packable range must yield zero rows, not a
    // silently aliased id
    val big = aviRow(1L, 10, Seq(0xffffff)).copy(media_id = Long.MaxValue / 2)
    val ok = aviRow(2L, 10, Seq(0xffffff))
    val feats = Multimodal.frameFeatures(Seq(big, ok).toDS(), stride = 1)
      .collect()
    assert(feats.map(_.media_id).toSeq == Seq(2L * 1000000L))
  }

  test("WAV decode averages stereo to mono and honors chunk alignment") {
    // hand-build a stereo WAV: L = +1000, R = -1000 → mono = 0
    val n = 100
    val stereo = new Array[Short](2 * n)
    for (i <- 0 until n) { stereo(2 * i) = 1000; stereo(2 * i + 1) = -1000 }
    // encode as stereo by patching a mono container: channels=2,
    // byterate/blockalign follow
    val mono = Multimodal.WavCodec.encode(
      Multimodal.AudioClip(8000, stereo)) // data holds 2n samples
    mono(22) = 2 // channels
    val clip = Multimodal.WavCodec.decode(mono)
    assert(clip.isDefined)
    assert(clip.get.samples.length == n)
    assert(clip.get.samples.forall(_ == 0))
  }

  /** Gradient test image: distinct block structure for the aHash. */
  private def gradRow(id: Long, w: Int, h: Int, fmt: String,
                      invert: Boolean = false): MediaRow = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = (x * 255) / math.max(1, w - 1)
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    MediaRow(id, s"image/$fmt", bos.toByteArray)
  }

  test("perceptual hash survives lossy re-encode, flips on content") {
    val png = gradRow(1L, 64, 64, "png")
    val jpg = gradRow(2L, 64, 64, "jpg") // same frame, lossy bytes
    val inv = gradRow(3L, 64, 64, "png", invert = true)
    assert(!png.media.sameElements(jpg.media)) // genuinely different bytes
    val hPng = MediaCodec.mediaHash(png.media)
    val hJpg = MediaCodec.mediaHash(jpg.media)
    val hInv = MediaCodec.mediaHash(inv.media)
    assert(hPng._2 && hJpg._2 && hInv._2) // all decoded
    assert(hPng._1 == hJpg._1, "lossy re-encode must collide")
    assert(hPng._1 != hInv._1, "inverted content must differ")
    // resolution change preserving block structure collides too
    assert(MediaCodec.mediaHash(gradRow(4L, 128, 128, "png").media)._1
      == hPng._1)
  }

  test("dedupByPhash groups re-encodes; fallback channel stays separate") {
    val blob = row(10L, 100)
    val rows = Seq(
      gradRow(1L, 64, 64, "png"), gradRow(2L, 64, 64, "jpg"),
      gradRow(3L, 64, 64, "png", invert = true),
      blob, blob.copy(media_id = 11L), // identical bytes → md5 family
      row(12L, 101))
    val fams = Multimodal.dedupByPhash(rows.toDS().repartition(3))
      .collect()
    assert(fams.length == 2)
    val byKeep = fams.map(r => r.getLong(3) -> r).toMap
    // image family: the png+jpg pair, keep-id 1, decoded channel
    assert(byKeep(1L).getBoolean(1) &&
      byKeep(1L).getSeq[Long](4) == Seq(1L, 2L))
    // byte family: ids 10,11 (identical payloads), fallback channel
    assert(!byKeep(10L).getBoolean(1) &&
      byKeep(10L).getSeq[Long](4) == Seq(10L, 11L))
  }
}
