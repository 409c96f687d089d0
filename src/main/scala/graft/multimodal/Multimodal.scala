package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** North-star extension — multimodal (image/audio/video) columns for
  * training-data pipelines (BASELINE.json; no reference analog — LSD's
  * BLOB columns are the closest concept, SURVEY.md §1.1).
  *
  * Representation: media as opaque `binary` columns + typed metadata
  * (format/width/height/duration), processed per-partition in bounded
  * batches — the Scala equivalent of `mapInPandas` batch processing.
  *
  * Image decode and resize are REAL: `javax.imageio` (PNG/JPEG/BMP/GIF
  * readers ship in the JDK) + `Graphics2D` bilinear scaling — no
  * external libraries, fully offline. Audio (RIFF/WAVE PCM) and video
  * (RIFF/AVI with MJPEG frames) are parsed by hand-written codecs on
  * the same chunk grammar. Payloads no codec understands fall back to
  * byte-content features (width/height = -1) or zero rows so the
  * pipeline is total over dirty corpora — at 100 TB a corrupt sample
  * must degrade, not kill the stage.
  *
  * At 100 TB: binary payloads dominate row size, so `targetBatchBytes`
  * bounds working memory per task regardless of row width, and
  * repartitioning upstream by a content key keeps tasks even. Feature
  * extraction samples a bounded pixel grid so per-row CPU is O(1) in
  * image dimensions.
  */
object Multimodal {

  /** Typed media row (media: raw bytes; meta: sidecar). */
  case class MediaRow(media_id: Long, format: String, media: Array[Byte])

  /** width/height are -1 when no JDK image reader accepted the bytes
    * (feature is then the byte-content fallback). */
  case class MediaFeatures(media_id: Long, n_bytes: Long,
                           width: Int, height: Int, feature: Array[Float])

  object MediaCodec {
    val FeatureDim = 16

    // in-memory decode only — the default ImageIO disk cache would do
    // a tmp-file write per image, pure overhead in an executor
    ImageIO.setUseCache(false)

    /** Real in-JDK image decode (PNG/JPEG/BMP/GIF/WBMP). None when no
      * registered reader accepts the payload. */
    def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** 16-bin normalized luminance histogram over a ≤64×64 sampled
      * pixel grid — per-image cost is bounded no matter the
      * dimensions, and the sampling stride is deterministic. */
    def imageFeatures(img: BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      val sx = math.max(1, w / 64)
      val sy = math.max(1, h / 64)
      val hist = new Array[Float](FeatureDim)
      var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          // ITU-R BT.601 integer luma
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          hist(math.min(FeatureDim - 1, luma * FeatureDim / 256)) += 1f
          n += 1
          x += sx
        }
        y += sy
      }
      if (n > 0) { var i = 0; while (i < FeatureDim) { hist(i) /= n; i += 1 } }
      hist
    }

    /** Fallback features for payloads no image reader understands:
      * byte-content folding (deterministic, content-sensitive). Keeps
      * the pipeline total over dirty corpora. */
    def byteFeatures(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }

    /** Decode + featurize one payload: (width, height, feature);
      * (-1, -1, byteFeatures) when undecodable. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) =
      decodeImage(bytes) match {
        case Some(img) => (img.getWidth, img.getHeight, imageFeatures(img))
        case None => (-1, -1, byteFeatures(bytes))
      }

    /** Real resize: `Graphics2D` bilinear scale to target dimensions. */
    def resizeImage(img: BufferedImage, targetW: Int,
                    targetH: Int): BufferedImage = {
      val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      out
    }

    /** Re-encode as PNG (lossless, always-available JDK writer). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Perceptual hash (aHash): 8×8 block-mean luma grid, bit i set
      * iff cell mean > grid mean — ALL-INTEGER arithmetic (BT.601
      * milli-luma block sums, cross-multiplied comparisons; no float
      * ever, so the hash is bit-stable across JVMs). Robust to
      * re-encoding (PNG↔JPEG of the same frame hash equal — pinned
      * in spec) and to resolution changes that preserve block means;
      * flips with real content change. */
    def perceptualHash(img: BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      // deterministic ≤64×64 sampling stride like imageFeatures, so
      // per-image cost is bounded no matter the dimensions
      val sx = math.max(1, w / 64)
      val sy = math.max(1, h / 64)
      var y = 0
      while (y < h) {
        val gy = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val gx = math.min(7, x * 8 / w)
          val rgb = img.getRGB(x, y)
          val luma = 299 * ((rgb >> 16) & 0xff) +
            587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
          val g = gy * 8 + gx
          sums(g) += luma
          counts(g) += 1
          x += sx
        }
        y += sy
      }
      var total = 0L
      var n = 0L
      var i = 0
      while (i < 64) { total += sums(i); n += counts(i); i += 1 }
      // bit i set iff cell mean > grid mean, exactly:
      //   sums(i)/counts(i) > total/n  ⇔  sums(i)·n > total·counts(i)
      // (cross-multiplied in Long: sums ≤ 64·64·255000 < 2^31, n ≤ 4096)
      var hash = 0L
      i = 0
      while (i < 64) {
        if (counts(i) > 0 && sums(i) * n > total * counts(i))
          hash |= 1L << i
        i += 1
      }
      hash
    }

    /** Hash a payload: decoded images get [[perceptualHash]];
      * undecodable bytes fall back to a content hash (first 8 bytes
      * of md5, big-endian) so dirty corpora still dedup exactly. */
    def mediaHash(bytes: Array[Byte]): (Long, Boolean) =
      decodeImage(bytes) match {
        case Some(img) => (perceptualHash(img), true)
        case None =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes)
          var v = 0L
          var i = 0
          while (i < 8) { v = (v << 8) | (md(i) & 0xffL); i += 1 }
          (v, false)
      }
  }

  /** Decode/feature-extract media rows in bounded batches per
    * partition. Batch shape (maxRows AND maxBytes caps) mirrors Arrow
    * record-batch sizing in mapInPandas. */
  def extractFeatures(ds: Dataset[MediaRow],
                      maxBatchRows: Int = 64,
                      targetBatchBytes: Long = 4L << 20): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // greedy batching: emit a batch when either cap is hit, so one
      // task never holds more than ~targetBatchBytes of payloads
      new Iterator[Seq[MediaRow]] {
        def hasNext: Boolean = it.hasNext
        def next(): Seq[MediaRow] = {
          val buf = Seq.newBuilder[MediaRow]
          var rows = 0
          var bytes = 0L
          while (it.hasNext && rows < maxBatchRows && bytes < targetBatchBytes) {
            val r = it.next()
            buf += r
            rows += 1
            bytes += r.media.length
          }
          buf.result()
        }
      }.flatMap { batch =>
        // the whole batch is in memory here — the vectorized-chunk
        // boundary a columnar codec (or GPU decoder) would consume
        batch.map { r =>
          val (w, h, feat) = MediaCodec.decode(r.media)
          MediaFeatures(r.media_id, r.media.length.toLong, w, h, feat)
        }
      }
    }
  }

  /** X3d — perceptual-hash image dedup: per-partition decode →
    * 64-bit aHash (bounded batches, media bytes NEVER shuffle — only
    * the (media_id, hash, decoded) triple leaves the scan), then one
    * hash-groupBy for duplicate families. Near-identical images
    * (lossy re-encodes, format changes) collide on the block-mean
    * signature; undecodable payloads dedup exactly via the md5
    * fallback channel (kept separate by the `decoded` flag so a
    * pathological byte-hash can never merge with an image family).
    * The multimodal twin of q_dedup_exact: at 100 TB the shuffle
    * carries 17 bytes/row, not the media. */
  def dedupByPhash(ds: Dataset[MediaRow],
                   maxBatchRows: Int = 64): DataFrame = {
    implicit val enc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaBoolean)
    ds.mapPartitions(_.grouped(maxBatchRows).flatMap(_.map { r =>
      val (h, decoded) = MediaCodec.mediaHash(r.media)
      (r.media_id, h, decoded)
    })).toDF("media_id", "phash", "decoded")
      .groupBy("phash", "decoded")
      .agg(count(lit(1)).as("n_members"),
        min(col("media_id")).as("keep_id"),
        sort_array(collect_list(col("media_id"))).as("members"))
      .filter(col("n_members") > 1)
      .orderBy("phash")
  }

  /** Resize pass over media rows: real decode → bilinear scale → PNG
    * re-encode, in the same bounded batching as extractFeatures.
    * Undecodable payloads pass through unchanged (total pipeline). */
  def resize(ds: Dataset[MediaRow], targetW: Int, targetH: Int,
             maxBatchRows: Int = 64): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0)
    implicit val enc = Encoders.product[MediaRow]
    ds.mapPartitions(_.grouped(maxBatchRows).flatMap(_.map { r =>
      MediaCodec.decodeImage(r.media) match {
        case Some(img) =>
          r.copy(media =
            MediaCodec.encodePng(MediaCodec.resizeImage(img, targetW, targetH)))
        case None => r
      }
    }))
  }

  /** Decoded PCM audio: 16-bit mono samples + rate. */
  case class AudioClip(sampleRate: Int, samples: Array[Short])

  case class AudioFeatures(media_id: Long, sample_rate: Int,
                           n_samples: Long, duration_s: Double,
                           rms: Double, zero_cross_rate: Double)

  /** REAL in-JVM audio codec: RIFF/WAVE PCM (the public WAV container,
    * multimedia programming interface spec IBM/Microsoft 1991). 16-bit
    * PCM is parsed by hand — ~40 lines, no javax.sound service
    * discovery needed in executors; stereo is averaged to mono. Like
    * the image path, anything unparseable returns None and the caller
    * degrades instead of dying. */
  object WavCodec {
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def decode(bytes: Array[Byte]): Option[AudioClip] = {
      if (bytes.length < 44 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var clip: Option[AudioClip] = None
      while (off + 8 <= bytes.length && clip.isEmpty) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        // Long arithmetic: a crafted sz near Int.MaxValue would wrap the
        // Int sum past the guard and reach the allocation below.
        if (sz < 0 || off.toLong + 8L + sz > bytes.length) return None
        id match {
          case "fmt " =>
            if (sz < 16 || le16(bytes, off + 8) != 1) return None // PCM only
            fmt = Some((le16(bytes, off + 10), le32(bytes, off + 12),
              le16(bytes, off + 22)))
          case "data" =>
            val (ch, rate, bits) = fmt.getOrElse(return None)
            if (bits != 16 || ch < 1) return None
            val frames = sz / (2 * ch)
            val mono = new Array[Short](frames)
            var i = 0
            while (i < frames) {
              var acc = 0
              var c = 0
              while (c < ch) {
                acc += le16(bytes, off + 8 + 2 * (i * ch + c)).toShort
                c += 1
              }
              mono(i) = (acc / ch).toShort
              i += 1
            }
            clip = Some(AudioClip(rate, mono))
          case _ => ()
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      clip
    }

    /** Minimal 16-bit mono PCM writer (tests + round trips). */
    def encode(clip: AudioClip): Array[Byte] = {
      val n = clip.samples.length
      val out = new Array[Byte](44 + 2 * n)
      def w32(o: Int, v: Int): Unit = { out(o) = v.toByte
        out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte
        out(o + 3) = (v >> 24).toByte }
      def w16(o: Int, v: Int): Unit = { out(o) = v.toByte
        out(o + 1) = (v >> 8).toByte }
      def wTag(o: Int, s: String): Unit =
        s.getBytes("US-ASCII").copyToArray(out, o)
      wTag(0, "RIFF"); w32(4, 36 + 2 * n); wTag(8, "WAVE")
      wTag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1)
      w32(24, clip.sampleRate); w32(28, clip.sampleRate * 2)
      w16(32, 2); w16(34, 16)
      wTag(36, "data"); w32(40, 2 * n)
      var i = 0
      while (i < n) { w16(44 + 2 * i, clip.samples(i)); i += 1 }
      out
    }

    /** Signal features: RMS (normalized to [0,1] full scale) and
      * zero-crossing rate — the cheap audio quality/speech-vs-noise
      * screens a data pipeline gates on before expensive transcription. */
    def features(id: Long, clip: AudioClip): AudioFeatures = {
      val n = clip.samples.length
      var sumSq = 0.0
      var crossings = 0L
      var i = 0
      while (i < n) {
        val s = clip.samples(i) / 32768.0
        sumSq += s * s
        if (i > 0 && (clip.samples(i) >= 0) != (clip.samples(i - 1) >= 0))
          crossings += 1
        i += 1
      }
      AudioFeatures(id, clip.sampleRate, n.toLong,
        n.toDouble / clip.sampleRate,
        math.sqrt(if (n > 0) sumSq / n else 0.0),
        if (n > 1) crossings.toDouble / (n - 1) else 0.0)
    }
  }

  /** Audio feature pass over media rows, same bounded batching as
    * [[extractFeatures]]. Undecodable payloads emit sample_rate = -1
    * with byte-level stats so dirty corpora degrade, not die. */
  def extractAudioFeatures(ds: Dataset[MediaRow],
                           maxBatchRows: Int = 64): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    ds.mapPartitions(_.grouped(maxBatchRows).flatMap(_.map { r =>
      WavCodec.decode(r.media) match {
        case Some(clip) => WavCodec.features(r.media_id, clip)
        case None => AudioFeatures(r.media_id, -1, r.media.length.toLong,
          0.0, 0.0, 0.0)
      }
    }))
  }

  /** Decoded video container: dimensions, frame interval, and the raw
    * per-frame payloads (JPEG bytes for MJPEG — pixel decode stays
    * lazy so stride sampling never decodes the frames it skips). */
  case class VideoClip(width: Int, height: Int, microSecPerFrame: Int,
                       frames: IndexedSeq[Array[Byte]])

  /** REAL in-JVM video codec: RIFF/AVI with MJPEG video (the public
    * AVI container — Microsoft multimedia file formats spec, RIFF
    * registry 1992 — carrying one JPEG per frame). The RIFF walk
    * mirrors [[WavCodec]] (same chunk grammar, same Long-arithmetic
    * bound checks); per-frame pixel decode reuses the JDK JPEG reader
    * via [[MediaCodec.decodeImage]]. Anything unparseable returns
    * None and callers degrade instead of dying. */
  object AviCodec {
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** Walk one RIFF chunk run in [off, end), collecting stream-0
      * video frame payloads ("00dc"/"00db"); descend into LIST
      * groups ("movi" at top level, "rec " batches inside it).
      * ITERATIVE with an explicit segment stack, not recursive: a
      * crafted payload of deeply nested LISTs costs ~12 bytes per
      * level, so a few hundred KB would StackOverflow a recursive
      * walk and kill the task — violating degrade-don't-die. */
    private def collectFrames(b: Array[Byte], off0: Int, end0: Int,
                              out: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Boolean = {
      var segs: List[(Int, Int)] = (off0, end0) :: Nil
      while (segs.nonEmpty) {
        var (off, end) = segs.head
        segs = segs.tail
        var walking = true
        while (walking && off + 8 <= end) {
          val id = tag(b, off)
          val sz = le32(b, off + 4)
          if (sz < 0 || off.toLong + 8L + sz > end) return false
          if (id == "LIST") {
            if (sz < 4) return false
            // child body first (document order), then this run's rest
            segs = (off + 12, off + 8 + sz) ::
              (off + 8 + sz + (sz & 1), end) :: segs
            walking = false
          } else {
            if (id == "00dc" || id == "00db") {
              out += java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
            }
            off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
          }
        }
      }
      true
    }

    def decode(bytes: Array[Byte]): Option[VideoClip] = {
      if (bytes.length < 24 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "AVI ") return None
      var off = 12
      var wh: Option[(Int, Int, Int)] = None // (w, h, usPerFrame)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      while (off + 8 <= bytes.length) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        if (sz < 0 || off.toLong + 8L + sz > bytes.length) return None
        if (id == "LIST" && sz >= 4) {
          tag(bytes, off + 8) match {
            case "hdrl" =>
              // first child must be avih (56-byte main header):
              // us/frame at +0, width/height at +32/+36. Bound the
              // reads by the avih chunk's OWN declared size, not just
              // bytes.length — a malformed header would otherwise
              // serve the next chunk's bytes as width/height.
              val a = off + 12
              if (a + 8 > bytes.length || tag(bytes, a) != "avih")
                return None
              val asz = le32(bytes, a + 4)
              if (asz < 40 || a.toLong + 8L + asz > off.toLong + 8L + sz)
                return None
              wh = Some((le32(bytes, a + 40), le32(bytes, a + 44),
                le32(bytes, a + 8)))
            case "movi" =>
              if (!collectFrames(bytes, off + 12, off + 8 + sz, frames))
                return None
            case _ => () // strl/odml/INFO — not needed for sampling
          }
        }
        off += 8 + sz + (sz & 1)
      }
      wh.collect { case (w, h, us) if frames.nonEmpty =>
        VideoClip(w, h, us, frames.toIndexedSeq)
      }
    }

    /** Minimal MJPEG-in-AVI writer (tests + round trips): avih + one
      * vids/MJPG stream + movi with one 00dc JPEG chunk per frame. */
    def encode(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps > 0)
      // one writer per encode() call, NOT ImageIO.write per frame: the
      // convenience API walks the service registry and spins up a new
      // writer + stream for every frame, which under a 32-thread
      // mapPartitions turns into registry contention and allocation
      // churn (bytes produced are identical — same writer, default
      // params either way)
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val jpegs =
        try frames.map { img =>
          val bos = new ByteArrayOutputStream()
          // JPEG writer rejects alpha; normalize to RGB first
          val rgb = new BufferedImage(img.getWidth, img.getHeight,
            BufferedImage.TYPE_INT_RGB)
          val g = rgb.createGraphics()
          try g.drawImage(img, 0, 0, null) finally g.dispose()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try {
            writer.setOutput(ios)
            writer.write(rgb)
          } finally ios.close()
          bos.toByteArray
        } finally writer.dispose()
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val bos = new ByteArrayOutputStream()
      def w32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
      def wTag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
      def chunk(id: String, body: Array[Byte]): Unit = {
        wTag(id); w32(body.length); bos.write(body)
        if ((body.length & 1) == 1) bos.write(0)
      }
      def list(kind: String, body: Array[Byte]): Unit = {
        wTag("LIST"); w32(4 + body.length); wTag(kind); bos.write(body)
        if ((body.length & 1) == 1) bos.write(0)
      }
      def build(f: ByteArrayOutputStream => Unit): Array[Byte] = {
        val b = new ByteArrayOutputStream(); f(b); b.toByteArray
      }
      def i32(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val usPerFrame = 1000000 / fps
      val avih = build { b => // 56-byte main header
        Seq(usPerFrame, 0, 0, 0, jpegs.length, 0, 1, 0, w, h, 0, 0, 0, 0)
          .foreach(v => b.write(i32(v)))
      }
      val strh = build { b =>
        b.write("vids".getBytes("US-ASCII")); b.write("MJPG".getBytes("US-ASCII"))
        Seq(0, 0, 0, 1, fps, 0, jpegs.length, 0, -1, 0, 0, 0)
          .foreach(v => b.write(i32(v)))
      }
      val strf = build { b => // BITMAPINFOHEADER
        b.write(i32(40)); b.write(i32(w)); b.write(i32(h))
        b.write(i32(1 | (24 << 16))) // planes=1, bitcount=24
        b.write("MJPG".getBytes("US-ASCII"))
        Seq(w * h * 3, 0, 0, 0, 0).foreach(v => b.write(i32(v)))
      }
      val strl = build { b =>
        b.write("strh".getBytes("US-ASCII")); b.write(i32(strh.length))
        b.write(strh)
        b.write("strf".getBytes("US-ASCII")); b.write(i32(strf.length))
        b.write(strf)
      }
      val hdrl = build { b =>
        b.write("avih".getBytes("US-ASCII")); b.write(i32(avih.length))
        b.write(avih)
        b.write("LIST".getBytes("US-ASCII")); b.write(i32(4 + strl.length))
        b.write("strl".getBytes("US-ASCII")); b.write(strl)
      }
      val movi = build { b =>
        jpegs.foreach { j =>
          b.write("00dc".getBytes("US-ASCII")); b.write(i32(j.length))
          b.write(j); if ((j.length & 1) == 1) b.write(0)
        }
      }
      list("hdrl", hdrl)
      list("movi", movi)
      val body = bos.toByteArray
      val out = new ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII")); out.write(i32(4 + body.length))
      out.write("AVI ".getBytes("US-ASCII")); out.write(body)
      out.toByteArray
    }
  }

  /** Video frame sampling — every `stride`-th frame of each clip, one
    * row per sampled frame (the explode shape). Container parse is the
    * real AVI/MJPEG codec above; skipped frames are never
    * pixel-decoded (payloads pass through as JPEG bytes), so sampling
    * 1-in-N costs 1/N of the decode budget — the property that matters
    * when the stage feeds a GPU captioner at 100 TB. Undecodable
    * payloads emit zero rows (degrade, not die). */
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  def frameSample(ds: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    require(stride > 0)
    implicit val enc = Encoders.product[FrameRow]
    ds.flatMap { r =>
      AviCodec.decode(r.media).toSeq.flatMap { clip =>
        Iterator.range(0, clip.frames.length, stride)
          .map(i => FrameRow(r.media_id, i, clip.frames(i)))
      }
    }
  }

  /** Sampled-frame feature pass: stride-sample, then run the image
    * feature extractor on just the sampled frames — video reduced to
    * the already-tested image path. */
  /** Largest media_id whose packed per-frame id cannot overflow. */
  private val MaxPackableMediaId = (Long.MaxValue - 999999L) / 1000000L

  def frameFeatures(ds: Dataset[MediaRow], stride: Int): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    frameSample(ds, stride).flatMap { fr =>
      // media_id ‖ frame_idx keeps per-frame rows addressable. The
      // packing is only injective for frame_idx < 1e6 and media_id
      // ≤ ~9.2e12 — outside that, a packed id would silently alias a
      // neighboring clip (or overflow Long), so such frames are
      // dropped rather than mislabeled. Clips with ≥1M frames or
      // larger id spaces should use frameSample's unpacked
      // (media_id, frame_idx) columns directly.
      if (fr.frame_idx >= 1000000 || fr.media_id < 0 ||
        fr.media_id > MaxPackableMediaId) None
      else {
        val (w, h, feat) = MediaCodec.decode(fr.frame)
        Some(MediaFeatures(fr.media_id * 1000000L + fr.frame_idx,
          fr.frame.length.toLong, w, h, feat))
      }
    }
  }

  /** Metadata projection over a raw multimodal DataFrame (id, format,
    * media binary): byte sizes + a cheap content fingerprint — the
    * kind of pushdown-friendly scan you run before committing to a
    * full decode pass. */
  def mediaStats(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("format"),
      length(col("media")).cast(LongType).as("n_bytes"),
      md5(col("media")).as("content_hash"))
}
