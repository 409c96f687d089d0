package graft.multimodal

import graft.SpecBase
import graft.multimodal.Multimodal.MediaRow

class MultimodalStubsSpec extends SpecBase {
  import spark.implicits._

  private def row(id: Long, size: Int): MediaRow =
    MediaRow(id, "vid/fake", Array.tabulate(size)(i => ((id * 7 + i) % 251).toByte))

  test("resize keeps ids and is deterministic on undecodable payloads") {
    // real-PNG resize is covered in MultimodalSpec; here: the batch
    // pipeline must not drop/reorder/mutate rows the codec can't decode
    val ds = (0L until 20L).map(i => row(i, 5000)).toDS()
    val out = Multimodal.resize(ds, targetW = 64, targetH = 64).collect()
    assert(out.length == 20)
    val again = Multimodal.resize(ds, 64, 64).collect()
      .sortBy(_.media_id).map(_.media.toSeq)
    assert(again.toSeq == out.sortBy(_.media_id).map(_.media.toSeq).toSeq)
  }

  test("frameSample emits zero rows for undecodable payloads") {
    val ds = Seq(row(1L, 1000)).toDS() // random bytes, not an AVI
    assert(Multimodal.frameSample(ds, stride = 3).count() === 0L)
  }

  test("dot_fold is callable from spark.sql after registration") {
    graft.functions.VectorKernels.registerSql(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT dot_fold(a, b) FROM vecs").head.getDouble(0)
    assert(got == 11.0)
  }
}
