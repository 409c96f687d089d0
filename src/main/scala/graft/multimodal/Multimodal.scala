package graft.multimodal

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
  * The Spark-side plumbing (schema, partition sizing, batch shape,
  * feature vector schema) is real; the actual codec call is STUBBED
  * (no image/audio libraries in this environment) behind
  * [[MediaCodec.decodeStub]], a deterministic fake with the same
  * signature a libjpeg/ffmpeg binding would have.
  *
  * At 100 TB: binary payloads dominate row size, so `targetBatchBytes`
  * bounds working memory per task regardless of row width, and
  * repartitioning upstream by a content key keeps tasks even.
  */
object Multimodal {

  /** Typed media row (media: raw bytes; meta: sidecar). */
  case class MediaRow(media_id: Long, format: String, media: Array[Byte])
  case class MediaFeatures(media_id: Long, n_bytes: Long,
                           feature: Array[Float])

  object MediaCodec {
    val FeatureDim = 16

    /** STUB ??? — stands in for a real decoder (libjpeg/ffmpeg/PIL
      * equivalent). Deterministic fake: derives a feature vector from
      * byte content so tests can assert exact plumbing behavior.
      * Swap this single function for a JNI/FFI codec binding to make
      * the pipeline real; nothing else changes. */
    def decodeStub(format: String, bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      acc
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
        // the whole batch is in memory here — exactly where a real
        // codec would process a vectorized chunk
        batch.map { r =>
          MediaFeatures(r.media_id, r.media.length.toLong,
            MediaCodec.decodeStub(r.format, r.media))
        }
      }
    }
  }

  /** STUB ??? — image resize. A real implementation decodes, scales
    * and re-encodes; the stub deterministically truncates/pads the
    * payload to the "resized" byte budget so tests can pin the
    * plumbing (schema, per-row transform, size accounting). */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val budget = math.max(1, targetW * targetH / 8)
    if (bytes.length >= budget) bytes.take(budget)
    else bytes ++ Array.fill(budget - bytes.length)(0.toByte)
  }

  /** Resize pass over media rows (same bounded batching as
    * extractFeatures; swap [[resizeStub]] for a codec call). */
  def resize(ds: Dataset[MediaRow], targetW: Int, targetH: Int,
             maxBatchRows: Int = 64): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    ds.mapPartitions(_.grouped(maxBatchRows).flatMap(_.map(r =>
      r.copy(media = resizeStub(r.media, targetW, targetH)))))
  }

  /** STUB ??? — video frame sampling: every `stride`-th fixed-size
    * chunk stands in for every n-th decoded frame. Emits one row per
    * sampled frame with its index — the explode shape a real
    * ffmpeg-backed sampler produces. */
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  def frameSample(ds: Dataset[MediaRow], frameBytes: Int,
                  stride: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0)
    implicit val enc = Encoders.product[FrameRow]
    ds.flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => FrameRow(r.media_id, i, chunk) }
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
