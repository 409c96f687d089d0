package graft.operators

import graft.SpecBase

class VectorOpsSpec extends SpecBase {
  import spark.implicits._

  test("q_ndcg_graded matches a brute-force graded NDCG@10") {
    // independent twin: exact cosines in plain Scala, IVF candidate
    // set reproduced from first principles (nearest-centroid
    // assignment, 2-probe buckets), graded DCG with the same bands
    val snap = graft.functions.SnapDecimal6.snap _
    val vecs = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toDouble)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = vecs.filter(_._1 < 8)
    val probes = vecs.filter(v => v._1 >= 8 && v._1 < 18)
    val corp = vecs.filter(_._1 >= 18)
    def grade(c: Double): Int =
      if (c >= 0.30) 3 else if (c >= 0.22) 2 else if (c >= 0.15) 1 else 0
    def dcgTerm(rel: Int, rn: Int): Double =
      snap((math.pow(2.0, rel) - 1.0) * math.log(2.0) / math.log(rn + 1.0))
    val assign = corp.map { case (id, v) =>
      (id, v, cents.maxBy { case (cid, cv) => (cos(cv, v), -cid) }._1)
    }
    val expected = probes.map { case (pid, pv) =>
      val buckets = cents.sortBy { case (cid, cv) => (-cos(cv, pv), cid) }
        .take(2).map(_._1).toSet
      val cand = assign.filter(a => buckets(a._3))
        .map { case (id, v, _) => (id, cos(pv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      val rels = corp.map { case (id, v) => (id, grade(cos(pv, v))) }.toMap
      val dcg = BigDecimal(cand.zipWithIndex.map { case ((id, _), i) =>
        BigDecimal(dcgTerm(rels(id), i + 1)) }.sum.toDouble).toDouble
      val ideal = rels.values.toSeq.filter(_ > 0).sorted.reverse.take(10)
      val idcg = ideal.zipWithIndex.map { case (r, i) =>
        BigDecimal(dcgTerm(r, i + 1)) }.sum.toDouble
      (pid, dcg, idcg, ideal.length.toLong,
        if (ideal.isEmpty) 0.0 else snap(dcg / idcg))
    }
    val got = VectorOps.qNdcgGraded.fn(spark, sfDir)
      .as[(Long, Double, Double, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._2 - e._2) < 1e-5, s"probe ${g._1} dcg")
      assert(math.abs(g._3 - e._3) < 1e-5, s"probe ${g._1} idcg")
      assert(g._4 == e._4, s"probe ${g._1} n_ideal")
      assert(math.abs(g._5 - e._5) < 1e-5, s"probe ${g._1} ndcg")
      assert(g._5 >= 0.0 && g._5 <= 1.0 + 1e-9)
    }
    // the metric must carry signal: some probe ranks imperfectly or
    // perfectly, but not all-zero
    assert(got.exists(_._5 > 0.0))
  }

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
