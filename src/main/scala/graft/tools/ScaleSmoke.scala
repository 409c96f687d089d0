package graft.tools

import graft.functions.Det
import graft.spatial.CrossMatch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: headroom check an order of magnitude past the bench
  * scale — synthesizes multi-million-row inputs (seeded, in-memory)
  * and runs the two operators whose scaling behavior matters most:
  * the spatial cross-match (blocking join) and the decimal-routed
  * aggregation. Prints wall-clock + result sizes.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
    }

    // 2M objects + 4M detections on the sphere (uniform, seeded)
    val objects = spark.range(2000000).select(
      col("id").as("obj_id"),
      (rand(seed = 1) * 360).as("lon"),
      degrees(asin(rand(seed = 2) * 2 - 1)).as("lat"))
    val dets = spark.range(4000000).select(
      col("id").as("det_id"),
      (rand(seed = 3) * 360).as("lon"),
      degrees(asin(rand(seed = 4) * 2 - 1)).as("lat"))
    t("xmatch 4M dets x 2M objs, r=0.01°, nmax=1") {
      CrossMatch(dets, objects, "det_id", "lon", "lat",
        "obj_id", "lon", "lat", 0.01, 1).count() + " matches"
    }

    // 50M-row decimal aggregation (the oracle-exact sum path)
    val big = spark.range(50000000).select(
      (col("id") % 97).as("k"),
      (rand(seed = 5) * 100000).as("x"))
    t("decimal-routed agg over 50M rows, 97 groups") {
      big.groupBy("k").agg(Det.dsum(col("x")).as("s"),
        count(lit(1)).as("c")).count() + " groups"
    }

    // banded range join at 10x the bench fact size
    val cust = spark.range(150000).select(col("id").as("ck"),
      (rand(seed = 6) * 10000).as("bal"))
    val ord = spark.range(1500000).select(col("id").as("ok"),
      (rand(seed = 7) * 500000).as("price"))
    t("banded range join 150k x 1.5M") {
      val bw = 1000
      val c = cust.select(col("ck"), (col("bal") * 30).as("lo"))
        .withColumn("hi", col("lo") + bw)
        .withColumn("bucket",
          explode(sequence(floor(col("lo") / bw), floor(col("hi") / bw))))
      val o = ord.withColumn("bucket", floor(col("price") / bw))
      c.join(o, c("bucket") === o("bucket") &&
          col("price") >= col("lo") && col("price") < col("hi"))
        .groupBy("ck").agg(count(lit(1))).count() + " customers"
    }

    // connected components: 10M nodes, 3M edges forming ~1M small
    // clusters (the dedup-cluster shape: most nodes are singletons,
    // components are shallow) — the active-node restriction means the
    // iteration never touches the 7M edge-free nodes
    val nodes = spark.range(10000000).select(col("id"))
    val edges = spark.range(3000000).select(
      ((col("id") % 1000000) * 10).as("a"),
      ((col("id") % 1000000) * 10 + (col("id") % 9) + 1).as("b"))
    t("connected components 10M nodes, 3M edges") {
      graft.operators.Components.minLabel(nodes, "id", edges, "a", "b")
        .select(countDistinct(col("component"))).head.getLong(0) +
        " components"
    }

    // int8-quantized cosine search: 1M x 64-d corpus, 8 probes — the
    // map-only broadcast pass with the codegen'd double-array DotFold
    val corpus = spark.range(1000000).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => rand(seed = 8) + i * 0.001).as("v"))
      .withColumn("nrm", graft.functions.VectorKernels.norm2(col("v")))
      .persist()
    corpus.count() // materialize: measure the kernel, not the synth
    t("quantized-style cosine top-5, 1M x 64-d, 8 probes") {
      val probes = broadcast(corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"),
          col("nrm").as("pn")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id").asc)
      probes.join(corpus, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          graft.functions.VectorKernels.cosine(
            graft.functions.VectorKernels.dot(col("pv"), col("v")),
            col("pn"), col("nrm")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).count() + " results"
    }
    spark.stop()
  }
}
