package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: one LARGER-SCALE evidence point for optimization claims
  * (r21 verdict item 8 — "the 8c/32c totals proved sf0.1 can't
  * demonstrate scaling"). Synthesizes sf0.1 × N by unioning N
  * key-shifted replicas of every table (offset = replica · 2^40 on
  * every `*key`/`*_id` column, so referential integrity holds within
  * each replica), written as MULTI-FILE parquet — which also exercises
  * the production layout where `LsdDb.spread` must no-op — then times
  * the named queries cold + 2 warm, QueryProfile-style.
  *
  * This is opt-in developer evidence, not part of Bench/Verify; the
  * inflated dataset is an INPUT copy under /tmp, never a cached
  * result.
  *
  * Usage: ScalePoint <N> <query...>  (defaults: 8, the r22 touched set)
  */
object ScalePoint {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_linreg", "q_logreg", "q_dedup_prefix",
        "q_dedup_containment", "q_join_fuzzy", "q_clustering_coeff",
        "q_xmatch_3way")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val dst = s"${sys.props("java.io.tmpdir")}/graft_scale_x$n"
    val marker = java.nio.file.Paths.get(s"$dst/_READY")
    if (!java.nio.file.Files.exists(marker)) {
      for (t <- graft.LsdDb.standardTables) {
        val df = graft.LsdDb.table(spark, src, t)
        val keyCols = df.schema.fieldNames
          .filter(c => c.endsWith("key") || c.endsWith("_id") ||
            c == "id").toSet
        val repl = spark.range(n).select(col("id").as("__r"))
        val out = df.crossJoin(repl).select(df.schema.fieldNames.map {
          c =>
            if (keyCols(c)) (col(c) + col("__r") * (1L << 40)).as(c)
            else col(c)
        }: _*)
        out.repartition(16).write.mode("overwrite")
          .parquet(s"$dst/$t.parquet")
        println(s"inflated $t x$n")
      }
      java.nio.file.Files.createFile(marker)
    }
    for (q <- Registry.specs if names.contains(q.name)) {
      try {
        for (run <- Seq("cold", "warm", "warm")) {
          val t0 = System.nanoTime()
          q.fn(spark, dst).queryExecution.toRdd
            .foreachPartition(it => while (it.hasNext) { it.next(); () })
          println(f"${q.name} x$n $run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } catch {
        case e: Throwable => println(s"FAILED ${q.name}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
