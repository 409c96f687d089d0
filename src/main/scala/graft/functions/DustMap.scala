package graft.functions

import graft.spatial.SkyPix
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2B P10 (second half) — sampled-grid sky lookup, the engine's
  * analog of the reference's `ebv()` dust-map builtin (SFD98-style
  * E(B−V) reddening sampled on a sky grid; ref `lsd/sfd.py`,
  * UNVERIFIED — Schlegel, Finkbeiner & Davis 1998, ApJ 500, 525 is
  * the public source).
  *
  * Shape, which is the part that matters at 100 TB: the map is a
  * TABLE keyed by SkyPix cell, the lookup is a BROADCAST equi-join on
  * the packed cell id of each row's (l, b). A real SFD grid at ~7′
  * resolution is a few million cells × 16 bytes ≈ tens of MB — well
  * inside broadcast range — so a dereddening pass over any corpus is
  * map-side only: zero shuffle of the big side, regardless of scale.
  * In production the grid would be ingested once from the published
  * FITS map into parquet; offline here we synthesize a deterministic
  * stand-in (pure integer arithmetic per cell, so DuckDB computes the
  * identical grid and the lookup is oracle-checkable end to end).
  */
object DustMap {
  /** Grid level for the synthetic map: 4^5 = 1024 equal-area cells.
    * The real-map level (~10) changes only the broadcast size. */
  val Level = 5

  private val n = 1L << Level // grid side
  private val shift = Level   // iy = id >> shift, ix = id & (n-1)

  /** Deterministic synthetic E(B−V) per grid cell: integer mix of
    * (ix, iy) scaled to a plausible 0.00–0.997 mag range. Pure int
    * arithmetic + one double division by a constant → bit-identical
    * in any IEEE engine. */
  private def ebvOf(ix: Column, iy: Column): Column =
    ((ix * 31 + iy * 17) % 997).cast("double") / 1000.0

  /** The SQL twin of the grid, as a DuckDB CTE body producing
    * (cell, ebv) — keep textually in sync with [[grid]]. */
  def gridSql: String = {
    val cell = SkyPix.sql.mortonCell(s"(id & ${n - 1})", s"(id >> $shift)",
      Level)
    s"""SELECT $cell AS cell,
       |    CAST(((id & ${n - 1}) * 31 + (id >> $shift) * 17) % 997
       |      AS DOUBLE) / 1000.0 AS ebv
       |  FROM generate_series(0, ${n * n - 1}) AS t(id)""".stripMargin
  }

  /** The dust-map lookup table: (cell BIGINT, ebv DOUBLE), one row per
    * level-5 cell. Driver-sized by construction (4^level rows). */
  def grid(spark: SparkSession): DataFrame = {
    spark.range(0, n * n)
      .select(
        SkyPix.mortonCell(col("id").bitwiseAND(n - 1),
          shiftright(col("id"), shift), Level).as("cell"),
        ebvOf(col("id").bitwiseAND(n - 1), shiftright(col("id"), shift))
          .as("ebv"))
  }

  /** ebv(l, b): append an `ebv` column looked up from the dust grid at
    * each row's galactic coordinates. Broadcast hash join on the
    * packed cell — the big side never shuffles. Coordinates are
    * d6-snapped before gridding so the cell choice is reproducible
    * across engines (the q_skymap discipline). */
  def withEbv(df: DataFrame, lDeg: Column, bDeg: Column): DataFrame = {
    val spark = df.sparkSession
    // the appended column is part of the API; a pre-existing `ebv`
    // would be silently shadowed — fail loudly instead
    require(!df.columns.contains("ebv"),
      "withEbv appends an 'ebv' column but the input already has one")
    val cell = SkyPix.mortonCell(
      SkyPix.ixSnapped(lDeg, Level), SkyPix.iySnapped(bDeg, Level), Level)
    // grid columns under reserved names: a caller `cell` (or `ebv`)
    // column must not make the join condition ambiguous
    val g = grid(spark).select(col("cell").as("__dust_cell_rhs"),
      col("ebv").as("__dust_ebv"))
    df.withColumn("__dust_cell", cell)
      .join(broadcast(g), col("__dust_cell") === col("__dust_cell_rhs"),
        "left")
      .drop("__dust_cell", "__dust_cell_rhs")
      .withColumnRenamed("__dust_ebv", "ebv")
  }
}
