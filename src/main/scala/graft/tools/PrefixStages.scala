package graft.tools

import graft.LsdDb
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: stage-level wall-clock breakdown of the q_dedup_prefix
  * pipeline (mirrors PipelineOps.qDedupPrefix's shape), to locate the
  * dominant cost. Not part of the driver contract. */
object PrefixStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def words(c: org.apache.spark.sql.Column) =
      split(lower(c), "[^\\p{L}\\p{N}]+")
    def shingles3(c: org.apache.spark.sql.Column) = {
      val w = words(c)
      val m = greatest(size(w) - 2, lit(0))
      array_distinct(zip_with(
        zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
          (a, b) => concat_ws("", a, b)),
        slice(w, lit(3), m),
        (ab, cc) => concat_ws("", ab, cc)))
    }

    def t[A](label: String)(f: => A): Unit = {
      for (i <- 0 until 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      }
    }

    val th = LsdDb.table(spark, dir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("sz"),
        explode(transform(col("sh"), x => xxhash64(x))).as("h"))
    t("1 explode th")(th.count())

    val ws = th
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
    t("2 windows ws")(ws.count())

    val pref = ws.filter(col("rn") <=
      col("sz") - expr("(6 * sz + 9) div 10") + 1)
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("bsz") <= 100)
    t("3 pref")(pref.count())

    val cand = pref
      .select(col("h"), struct(col("doc_id"), col("sz")).as("d"))
      .groupBy("h").agg(collect_list(col("d")).as("ds"))
      .select(explode(col("ds")).as("d1"), col("ds"))
      .select(col("d1"), explode(col("ds")).as("d2"))
      .filter(col("d1.doc_id") < col("d2.doc_id"))
      .select(col("d1.doc_id").as("doc_a"), col("d2.doc_id").as("doc_b"),
        col("d1.sz").as("sza"), col("d2.sz").as("szb"))
      .distinct()
    t("4 cand")(cand.count())

    val candDocs = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val toksCand = LsdDb.table(spark, dir, "documents")
      .join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(shingles3(col("text"))).as("s"))
    t("5 toksCand")(toksCand.count())

    val inter = cand
      .join(toksCand.as("t1"), col("doc_a") === col("t1.doc_id"))
      .join(toksCand.as("t2"),
        col("doc_b") === col("t2.doc_id") && col("t1.s") === col("t2.s"))
      .groupBy("doc_a", "doc_b", "sza", "szb")
      .agg(count(lit(1)).as("n_inter"))
    t("6 full inter")(inter.count())

    // NOTE measurement trap (hit live in round 11): timing candidate
    // rewrites with .count() here is MISLEADING — Catalyst prunes
    // projected payloads the count doesn't need (an array_intersect
    // variant measured "2.6× faster" under count() but was 40% SLOWER
    // under Bench's full materialization, because the per-pair token
    // ARRAY payload it shuffles got pruned out of the count plan).
    // Always confirm with QueryProfile, which drains the real plan.

    spark.stop()
  }
}
