package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN index — the memory-scale path for
  * embedding search (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011). The vector is cut into `m`
  * subspaces; each subspace gets its own `ksub`-codeword codebook
  * (Lloyd's k-means, deterministic scattered seeding — the AnnIndex
  * discipline); a vector is stored as `m` small integer codes (e.g.
  * 64 float dims → 8 bytes, 32×), and search scores candidates with
  * an asymmetric-distance lookup table (LUT) built per probe —
  * candidates are ranked reading ONLY the codes, the raw floats are
  * touched just for the final exact re-rank of `rerank` candidates.
  *
  * Distribution shape (the part that matters at 100 TB):
  *  - train: one distributed assign + one groupBy per Lloyd's round,
  *    all subspaces jointly (rows = N×m, key = (subspace, code));
  *    codebook state on the driver is O(m·ksub·dsub) — bounded.
  *  - encode: map-only broadcast pass; the codes table is the only
  *    thing the hot path ever scans, and its approximate norm is
  *    precomputed per row so search does zero per-row codebook math
  *    for the denominator.
  *  - search: probes broadcast WITH their LUT columns; scoring is a
  *    map-only scan of the codes (no shuffle until the per-probe
  *    top-k window); exact re-rank joins the raw vectors only for
  *    probes×rerank rows.
  *
  * The oracle-checkable fixed-codebook variant of the same pipeline
  * is operators/VectorOps.qAnnPq; this is the trained library form,
  * recall-gated in PqIndexSpec against brute force (same contract
  * split as AnnIndex vs q_ann_ivf).
  */
object PqIndex {

  /** Trained codebooks: `cents(j)(c)` = codeword c of subspace j. */
  final case class Codebooks(m: Int, dsub: Int,
                             cents: Array[Array[Array[Float]]]) {
    require(cents.length == m && cents.forall(_.forall(_.length == dsub)))
    def ksub: Int = cents(0).length
  }

  private def l2(a: Seq[Float], b: Array[Float]): Double = {
    // fail loud on dimension mismatch: silently comparing the common
    // prefix would score a truncated/malformed vector as a perfect
    // match (empty slice → distance 0) instead of surfacing the bug
    require(a.length == b.length,
      s"subvector dim ${a.length} != codeword dim ${b.length}")
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train per-subspace codebooks with Lloyd's k-means.
    * Deterministic: seeds are the subvectors of the `ksub` corpus
    * rows first in xxhash64(id) order (scattered, no RNG — the
    * AnnIndex seeding), and every later step is exact arithmetic on
    * deterministic groupings — the centroid mean is a decimal(18,6)
    * sum (order-independent under any partitioning, the repo-standard
    * exact-sum route; a plain double avg would drift by ulps with
    * cluster layout and flip nearest-codeword ties) over an exact
    * count, divided once in double. */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int, iters: Int = 4): Codebooks = {
    val spark = vectors.sparkSession
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val d = v.select(size(col("v"))).head.getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m

    val seeds = v.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(ksub).collect().map(_.getSeq[Float](1).toArray)
    require(seeds.length >= ksub,
      s"corpus has only ${seeds.length} rows; k-means needs ksub=$ksub")
    var cents: Array[Array[Array[Float]]] =
      Array.tabulate(m, ksub)((j, c) =>
        seeds(c).slice(j * dsub, (j + 1) * dsub))

    for (_ <- 1 to iters) {
      val assigned = assignCodes(v, "v", Codebooks(m, dsub, cents))
        .select(col("v"), posexplode(col("codes")).as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("v"), col("j") * dsub + 1, lit(dsub)))
            .as(Seq("pos", "x")))
      val updated = assigned.groupBy("j", "code", "pos")
        .agg((sum(col("x").cast("double").cast("decimal(18,6)"))
          .cast("double") / count(lit(1))).as("mu"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          r.getDouble(3).toFloat)).toMap
      cents = Array.tabulate(m, ksub) { (j, c) =>
        val prev = cents(j)(c)
        Array.tabulate(dsub)(p => updated.getOrElse((j, c, p), prev(p)))
      }
    }
    Codebooks(m, dsub, cents)
  }

  /** Map-only: codes = per-subspace nearest codeword (exact L2, code
    * tiebreak) + the precomputed APPROXIMATE squared norm (sum of
    * codeword norms — the search denominator, paid once at encode). */
  def assignCodes(vectors: DataFrame, vecCol: String,
                  cb: Codebooks): DataFrame = {
    val spark = vectors.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val enc = udf { (vec: Seq[Float]) =>
      val b = bc.value
      Array.tabulate(b.m) { j =>
        val sv = vec.slice(j * b.dsub, (j + 1) * b.dsub)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < b.ksub) {
          val dd = l2(sv, b.cents(j)(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        best
      }
    }
    val n2 = udf { (codes: Seq[Int]) =>
      val b = bc.value
      var s = 0.0; var j = 0
      while (j < b.m) {
        val cw = b.cents(j)(codes(j))
        var i = 0
        while (i < b.dsub) { s += cw(i).toDouble * cw(i).toDouble; i += 1 }
        j += 1
      }
      s
    }
    vectors.withColumn("codes", enc(col(vecCol)))
      .withColumn("vn2_approx", n2(col("codes")))
  }

  /** ADC top-k: rank by approximate cosine over the codes, exact
    * re-rank of the top `rerank`. `encoded` must carry (idCol, codes,
    * vn2_approx) from [[assignCodes]]; `raw` supplies (idCol, vecCol)
    * for the re-rank only. */
  def search(cb: Codebooks, encoded: DataFrame, raw: DataFrame,
             idCol: String, vecCol: String, probes: DataFrame,
             probeIdCol: String, probeVecCol: String,
             topK: Int, rerank: Int): DataFrame = {
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    // per-probe LUT: lut(j)(c) = dot(probe subvector j, codeword c)
    val lutU = udf { (vec: Seq[Float]) =>
      val b = bc.value
      Array.tabulate(b.m, b.ksub) { (j, c) =>
        val cw = b.cents(j)(c)
        var s = 0.0; var i = 0
        while (i < b.dsub) {
          s += vec(j * b.dsub + i).toDouble * cw(i).toDouble; i += 1
        }
        s
      }.map(_.toSeq).toSeq
    }
    val pn2 = (c: Column) => aggregate(
      transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, b) => a + b)
    val p = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).as("pv"))
      .withColumn("lut", lutU(col("pv")))
      .withColumn("pn2", pn2(col("pv")))
    // map-only scan of the codes: approx dot = Σ_j lut[j][code_j]
    val adot = aggregate(
      zip_with(col("codes"), col("lut"),
        (code, l) => element_at(l, code + 1)),
      lit(0.0), (a, b) => a + b)
    val aw = Window.partitionBy("probe_id")
      .orderBy(col("acos").desc, col(idCol).asc)
    val cand = encoded.select(col(idCol), col("codes"), col("vn2_approx"))
      .crossJoin(broadcast(p.select("probe_id", "lut", "pn2")))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("acos",
        adot / (sqrt(col("pn2")) * sqrt(col("vn2_approx"))))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= rerank)
      .select(col("probe_id"), col(idCol))
    val dotE = (a: Column, b: Column) => aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (q, t) => q + t)
    val fw = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col(idCol).asc)
    broadcast(cand)
      .join(p.select(col("probe_id"), col("pv"), col("pn2")), "probe_id")
      .join(raw.select(col(idCol), col(vecCol).as("rv")), idCol)
      .select(col("probe_id"), col(idCol),
        (dotE(col("pv"), col("rv")) /
          (sqrt(col("pn2")) * sqrt(pn2(col("rv"))))).as("cos"))
      .withColumn("rn", row_number().over(fw))
      .filter(col("rn") <= topK)
  }
}
