package graft.operators

import graft.{LsdDb, SpecBase}
import org.apache.spark.sql.functions._

/** §2D A4 — approximate aggregates (HLL / quantile sketches) are not
  * hash-stable across engines, so they are smoke-tested with exactness
  * bounds instead of a DuckDB oracle (SURVEY.md §2 determinism rules). */
class ApproxOpsSpec extends SpecBase {

  test("approx_count_distinct within 5% of exact") {
    val li = LsdDb.table(spark, sfDir, "lineitem")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("percentile_approx brackets the exact median") {
    val li = LsdDb.table(spark, sfDir, "lineitem")
    val r = li.agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
      expr("median(l_quantity)").as("med")).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }
}
