package graft.multimodal

import graft.SpecBase
import graft.multimodal.Multimodal.{MediaCodec, MediaRow}

class MultimodalSpec extends SpecBase {
  import spark.implicits._

  private def row(id: Long, size: Int): MediaRow =
    MediaRow(id, "img/fake", Array.tabulate(size)(i => ((id + i) % 251).toByte))

  test("feature extraction preserves every row with correct sizes") {
    val rows = (0L until 100L).map(i => row(i, 100 + (i % 7).toInt * 50))
    val ds = rows.toDS().repartition(5)
    val out = Multimodal.extractFeatures(ds).collect()
    assert(out.length == 100)
    val bySize = out.map(f => f.media_id -> f.n_bytes).toMap
    assert(rows.forall(r => bySize(r.media_id) == r.media.length))
    assert(out.forall(_.feature.length == MediaCodec.FeatureDim))
  }

  test("decode stub is deterministic (same bytes → same features)") {
    val a = MediaCodec.decodeStub("img/fake", Array[Byte](1, 2, 3, 4))
    val b = MediaCodec.decodeStub("img/fake", Array[Byte](1, 2, 3, 4))
    assert(a.toSeq == b.toSeq)
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
}
