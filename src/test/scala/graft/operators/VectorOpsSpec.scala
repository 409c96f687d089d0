package graft.operators

import graft.SpecBase

class VectorOpsSpec extends SpecBase {
  import spark.implicits._

  test("silhouette agrees with the kmeans assignment and bounds hold") {
    val km = VectorOps.qClusterKmeans.fn(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map { case (id, c, d) => id -> ((c, d)) }.toMap
    val sil = VectorOps.qSilhouette.fn(spark, sfDir)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(sil.length == km.size)
    sil.foreach { case (id, cluster, a, b, s) =>
      val (kc, kd) = km(id)
      assert(cluster == kc, s"vec $id: cluster $cluster != kmeans $kc")
      // a_dist is sqrt of the kmeans snapped squared distance (then d6)
      assert(math.abs(a - math.sqrt(kd)) < 2e-6, s"vec $id a=$a kd=$kd")
      assert(b >= a - 2e-6, s"vec $id second-nearest $b < nearest $a")
      assert(s >= -1e-9 && s <= 1.0 + 1e-9, s"vec $id sil $s out of range")
      if (b > 1e-6)
        assert(math.abs(s - (b - a) / b) < 5e-6, s"vec $id sil mismatch")
    }
    // the audit must discriminate between points, not emit a constant
    // (the synthetic embeddings are near-uniform, so ABSOLUTE scores
    // are honestly low — max ~0.19 at sf0.001; that IS the signal a
    // curation pipeline would read as "no real cluster structure")
    val scores = sil.map(_._5)
    assert(scores.max > scores.min + 0.01 && scores.max > 0.05,
      s"degenerate silhouette range [${scores.min}, ${scores.max}]")
  }

  test("pca_power captures more second moment than any coordinate axis") {
    // Rayleigh optimality proxy: after the power rounds, the energy
    // of the PC1 projection Σ(x·v)² must dominate the best single
    // axis Σx_j² = G_jj (the trivial competitor a broken iteration
    // would lose to), and be bounded by the total trace.
    val proj = VectorOps.qPcaPower.fn(spark, sfDir)
      .as[(Long, Double)].collect()
    val gram = VectorOps.qEmbedGram.fn(spark, sfDir)
      .as[(Int, Int, Double)].collect()
    val diag = gram.collect { case (i, j, g) if i == j => g }
    val trace = diag.sum
    val energy = proj.map(p => p._2 * p._2).sum
    assert(energy >= diag.max * 0.999,
      s"PC1 energy $energy below best axis ${diag.max}")
    assert(energy <= trace * 1.001,
      s"PC1 energy $energy exceeds trace $trace")
    // and the direction is genuinely mixed, not a unit axis
    assert(proj.map(_._2).distinct.length > 100,
      "projection collapsed to few distinct values")
  }
}
