package graft.functions

import graft.SpecBase
import org.apache.spark.sql.functions._

class BloomPrefilterSpec extends SpecBase {
  import spark.implicits._

  test("prefilter passes every true match (no false negatives)") {
    val build = (0L until 500L).map(i => i * 7L).toDF("k")
    val probe = (0L until 5000L).toDF("p")
    val kept = BloomPrefilter
      .prefilter(probe, col("p"), build, col("k"), fpp = 0.01)
      .as[Long].collect().toSet
    val truth = (0L until 500L).map(_ * 7L).filter(_ < 5000L).toSet
    assert(truth.subsetOf(kept), "bloom must never drop a true match")
  }

  test("false-positive rate stays near the requested fpp") {
    val build = (0L until 2000L).toDF("k")
    // disjoint probe domain: everything passing is a false positive
    val probe = (1000000L until 1020000L).toDF("p")
    val fp = BloomPrefilter
      .prefilter(probe, col("p"), build, col("k"), fpp = 0.01)
      .count()
    // 20k disjoint probes at 1% nominal → expect ~200; allow 5×
    assert(fp <= 1000, s"fp rate too high: $fp of 20000")
  }

  test("prefilter result is partitioning-invariant") {
    val build = (0L until 300L).map(i => i * 3L).toDF("k")
    val probe = (0L until 2000L).toDF("p")
    val a = BloomPrefilter
      .prefilter(probe.repartition(1), col("p"), build, col("k"))
      .as[Long].collect().sorted.toSeq
    val b = BloomPrefilter
      .prefilter(probe.repartition(13), col("p"), build.repartition(7),
        col("k"))
      .as[Long].collect().sorted.toSeq
    assert(a == b)
  }
}
