package graft.vector

import graft.{LsdDb, SpecBase}
import graft.functions.VectorKernels
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PqIndexSpec extends SpecBase {

  private lazy val emb = LsdDb.table(spark, sfDir, "embeddings")

  private def bruteTruth(corpus: org.apache.spark.sql.DataFrame,
                         probeFilter: org.apache.spark.sql.Column,
                         topK: Int): Map[Long, Set[Long]] = {
    val v = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", VectorKernels.norm2(col("v")))
    val p = v.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(p).join(v, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        VectorKernels.cosine(VectorKernels.dot(col("pv"), col("v")),
          col("pn"), col("nrm")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select("probe_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  test("PQ ADC + re-rank recall vs brute force on real embeddings") {
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.ksub == 16 && cb.dsub == 8)
    val encoded = PqIndex.assignCodes(
      emb.select(col("vec_id"), col("embedding")), "embedding", cb)
      .persist()
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    val got = PqIndex.search(cb, encoded, emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", topK = 10, rerank = 50)
      .select("probe_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = bruteTruth(emb, col("vec_id") < 20, 10)
    val recalls = truth.map { case (pid, t) =>
      got.getOrElse(pid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val meanRecall = recalls.sum / recalls.size
    // 16 codewords per 8-dim subspace on random 64-d data is the
    // coarse end of PQ; re-ranking 50/500 (10%) must still recover
    // most of the exact top-10
    assert(meanRecall >= 0.6, s"mean recall@10 = $meanRecall")
    encoded.unpersist()
  }

  test("re-ranking the whole corpus reduces PQ to exact search") {
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val encoded = PqIndex.assignCodes(
      emb.select(col("vec_id"), col("embedding")), "embedding", cb)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
    val got = PqIndex.search(cb, encoded, emb, "vec_id", "embedding",
      probes, "vec_id", "embedding", topK = 10, rerank = 1000)
      .select("probe_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got == bruteTruth(emb, col("vec_id") < 5, 10),
      "rerank = corpus must equal brute force")
  }

  test("q_pq_recall audit covers all 16 probes with usable recall") {
    val rows = graft.operators.VectorOps.qPqRecall.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 16)
    rows.foreach { case (_, nHit, recall) =>
      assert(nHit >= 0 && nHit <= 3 && recall == nHit / 3.0)
    }
    // The query's codebook is the DETERMINISTIC demo one (first-16
    // corpus slices, chosen for oracle-checkability, not quality) —
    // measured mean recall ~0.25 here vs ~0.006 random chance
    // (3/|corpus|). Gate well above chance but below the k-means
    // library recall that the first test in this suite gates.
    val mean = rows.map(_._3).sum / rows.length
    assert(mean >= 0.1, s"mean PQ recall@3 at noise level: $mean")
  }

  test("training is deterministic and codes stay within ksub") {
    val cb1 = PqIndex.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val cb2 = PqIndex.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb1.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq)
    val codes = PqIndex.assignCodes(
      emb.select(col("vec_id"), col("embedding")), "embedding", cb1)
      .select(col("codes")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(cs => cs.length == 8 &&
      cs.forall(c => c >= 0 && c < 16)))
    // compression claim: 64 float dims -> 8 codes
    assert(codes.head.length * 8 < 64 * 32)
  }
}
