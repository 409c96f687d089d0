package graft.operators

import graft.{LsdDb, SpecBase}
import graft.functions.Det
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class SurveyOpsSpec extends SpecBase {
  import spark.implicits._

  test("q_xmatch_pm equals the brute-force propagated cross join") {
    // Independent of the DuckDB oracle: re-derive the match relation
    // with a plain crossJoin (no blocking) and compare exactly — this
    // is the proof that the 0.7° blocking radius loses no pair that
    // the 0.5° propagated refine would keep.
    val a = LsdDb.table(spark, sfDir, "orders").select(
      col("o_orderkey").as("a_id"),
      ((col("o_orderkey") * 13) % 3600).cast(DoubleType)./(10.0).as("a_lon"),
      (((col("o_orderkey") * 7) % 600).cast(DoubleType) / 10.0 - 30.0)
        .as("a_lat"),
      (lit(2010) + col("o_orderkey") % 11).cast(DoubleType).as("ep"))
    val b = LsdDb.table(spark, sfDir, "supplier").select(
      col("s_suppkey").as("b_id"),
      ((col("s_suppkey") * 13) % 3600).cast(DoubleType)./(10.0).as("b_lon"),
      (((col("s_suppkey") * 7) % 600).cast(DoubleType) / 10.0 - 30.0)
        .as("b_lat"),
      (((col("s_suppkey") * 11) % 21).cast(DoubleType) - 10)./(2000.0)
        .as("pm_lon"),
      (((col("s_suppkey") * 19) % 21).cast(DoubleType) - 10)./(2000.0)
        .as("pm_lat"))
    val dt = col("ep") - lit(2000.0)
    val w = Window.partitionBy("a_id")
      .orderBy(col("dist_deg").asc, col("b_id").asc)
    val brute = a.crossJoin(b)
      .withColumn("dist_deg", Det.d6(graft.spatial.CrossMatch.distDeg(
        col("a_lon"), col("a_lat"),
        col("b_lon") + col("pm_lon") * dt,
        col("b_lat") + col("pm_lat") * dt)))
      .filter(col("dist_deg") <= 0.5)
      .withColumn("match_rank", row_number().over(w))
      .filter(col("match_rank") <= 2)
      .select("a_id", "b_id", "dist_deg", "match_rank")
      .collect().map(_.toSeq).toSet
    val got = SurveyOps.qXmatchPm.fn(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(got == brute)
    assert(got.nonEmpty, "the fixture should produce matches")
  }

  test("q_event_runs: run lengths partition each series; adjacent runs differ") {
    val runs = SurveyOps.qEventRuns.fn(spark, sfDir).collect()
    val events = LsdDb.table(spark, sfDir, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val byUser = runs.groupBy(_.getLong(0))
    assert(byUser.keySet == events.keySet)
    for ((u, rs) <- byUser) {
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(3)).sum == events(u),
        s"run lengths must sum to the series length for user $u")
      assert(ordered.head.getLong(1) == 1L, "run ids start at 1")
      for (Array(p, n) <- ordered.sliding(2).filter(_.length == 2))
        assert(p.getString(2) != n.getString(2),
          s"adjacent runs must differ in type for user $u")
    }
  }

  test("q_sigma_clip: clipping only ever drops rows, never all of them") {
    val rows = SurveyOps.qSigmaClip.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (total, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= total)
      // 3σ keeps the bulk of any unimodal sample; a clip that drops
      // >half the epochs signals broken μ/σ arithmetic
      if (total > 1) assert(kept * 2 > total, s"user ${r.getLong(0)}")
    }
  }

  test("q_skymap cell ids decode back to the emitted centers' cell") {
    val rows = SurveyOps.qSkymap.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (cellId, lonC, latC) = (r.getLong(0), r.getDouble(3), r.getDouble(4))
      assert((cellId >> 58) == 4L, "level tag")
      // the emitted center must itself fall in the emitted cell
      assert(graft.spatial.SkyPix.cellId(lonC, latC, 4) == cellId)
    }
  }

  test("q_pm_fit recovers the exact per-object track rates") {
    // The moving-object field is exactly linear in integer space, so
    // OLS over any ≥3 unwrapped epochs must return the TRUE rate —
    // not approximately, but to the d6 snap of rate·0.024 exactly.
    // This is ground truth the DuckDB oracle can't provide (it only
    // proves both engines agree, not that the answer is right).
    val rows = SurveyOps.qPmFit.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def d6(v: Double): Double = math.rint(v * 1e6) / 1e6
    for (r <- rows) {
      val id = r.getLong(0)
      val rLon = (id * 7919) % 37 - 18
      val rLat = (id * 104729) % 13 - 6
      assert(r.getDouble(2) == d6(rLon * 0.024),
        s"object $id pm_lon: ${r.getDouble(2)} vs rate $rLon mdeg/hr")
      assert(r.getDouble(3) == d6(rLat * 0.024),
        s"object $id pm_lat: ${r.getDouble(3)} vs rate $rLat mdeg/hr")
    }
  }

  test("q_two_point: uncorrelated fields give w ≈ 0 in every filled bin") {
    // The Landy–Szalay null test: D and R come from different hash
    // scrambles of the same keys, so there is no real clustering and
    // any |w| >> 0 means the pair counting or normalization is wrong.
    val rows = SurveyOps.qTwoPoint.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows if !r.isNullAt(4)) {
      val w = r.getDouble(4)
      assert(math.abs(w) < 1.0, s"bin ${r.getLong(0)}: w_ls $w")
    }
    // annulus geometry: pair counts must grow with bin radius overall
    val dd = rows.map(_.getLong(1))
    assert(dd.last > dd.head, "outer annulus must hold more pairs")
  }

  test("q_skymap_smooth conserves counts and bounds the contrast") {
    val sm = SurveyOps.qSkymapSmooth.fn(spark, sfDir).collect()
    assert(sm.nonEmpty)
    // every source lands in exactly one cell, and every populated
    // cell is in the filter's support (its own 3×3 contains it), so
    // Σ n_own over the output = total input rows
    val total = LsdDb.table(spark, sfDir, "customer").count()
    assert(sm.map(_.getLong(1)).sum == total)
    for (r <- sm) {
      val (own, tot, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(own >= 0 && own <= tot)
      assert(c >= 0.0 && c <= 9.0)
      assert(c == own.toDouble * 9 / tot)
    }
  }
}
