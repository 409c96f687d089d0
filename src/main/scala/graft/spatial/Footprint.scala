package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query-time spatial bounds — the reference's footprint system
  * (all-sky / rectangle / cone specs intersected with the cell
  * quadtree for partition pruning; SURVEY.md §1.1 "Bounds", ref
  * `lsd/bounds.py`, UNVERIFIED).
  *
  * Two layers, used together on a SpatialWriter-partitioned table:
  *   - an exact row predicate (`cone` / `rect`) — Catalyst pushes it
  *     to the scan;
  *   - a driver-side cell enumeration (`coneCells`) for the partition
  *     column — `col("cell").isin(...)` turns into directory-level
  *     partition pruning, LSD's bounds∩quadtree trick.
  */
object Footprint {

  /** Exact cone membership predicate (great-circle distance ≤ r). */
  def cone(lonCol: Column, latCol: Column,
           lon0: Double, lat0: Double, radiusDeg: Double): Column =
    CrossMatch.distDeg(lonCol, latCol, lit(lon0), lit(lat0)) <= radiusDeg

  /** Rectangle in lon/lat, wraparound-aware in lon. */
  def rect(lonCol: Column, latCol: Column, lonMin: Double, lonMax: Double,
           latMin: Double, latMax: Double): Column = {
    val lon = pmod(lonCol, lit(360.0))
    val lo = ((lonMin % 360) + 360) % 360
    val hi = ((lonMax % 360) + 360) % 360
    val lonPred =
      if (lo <= hi) lon >= lo && lon <= hi
      else lon >= lo || lon <= hi // wraps through 0
    lonPred && latCol >= latMin && latCol <= latMax
  }

  /** Cells at `level` that can contain points within `radiusDeg` of
    * (lon0, lat0): a conservative superset (bounding-box based, polar
    * rows included whole when the cone nears a pole). Small enough to
    * use as `col("cell").isin(coneCells(...): _*)` for directory
    * pruning at the levels used for partitioning (≤ ~10).
    */
  def coneCells(lon0: Double, lat0: Double, radiusDeg: Double,
                level: Int): Seq[Long] = {
    val n = 1L << level
    val latLo = lat0 - radiusDeg
    val latHi = lat0 + radiusDeg
    val southPole = latLo <= -90 + 1e-12
    val northPole = latHi >= 90 - 1e-12
    def iyOf(lat: Double): Long = {
      val fy = (math.sin(math.toRadians(math.max(-90, math.min(90, lat)))) + 1) / 2
      math.min((fy * n).toLong, n - 1).max(0)
    }
    val iyLo = if (southPole) 0L else iyOf(latLo)
    val iyHi = if (northPole) n - 1 else iyOf(latHi)
    val cells = Seq.newBuilder[Long]
    for (iy <- iyLo to iyHi) {
      // widen the lon half-width by the worst (smallest) cos(lat) of
      // the row; a row touching a pole needs every lon column
      val rowLatMax = math.max(math.abs(latOfRowEdge(iy, n)),
        math.abs(latOfRowEdge(iy + 1, n)))
      val cosMin = math.cos(math.toRadians(math.min(89.999, rowLatMax)))
      val halfWidthCells =
        if (rowLatMax >= 89.9) n.toDouble
        else radiusDeg / (360.0 / n) / cosMin + 1
      val ix0 = math.floor((((lon0 % 360) + 360) % 360) / 360.0 * n).toLong
      val w = math.min(n.toDouble, 2 * halfWidthCells + 1).toLong
      if (w >= n) {
        for (ix <- 0L until n) cells += pack(ix, iy, level)
      } else {
        for (d <- -halfWidthCells.toLong to halfWidthCells.toLong)
          cells += pack(((ix0 + d) % n + n) % n, iy, level)
      }
    }
    cells.result().distinct
  }

  private def latOfRowEdge(iy: Long, n: Long): Double = {
    val sinLat = 2.0 * iy / n - 1.0
    math.toDegrees(math.asin(math.max(-1, math.min(1, sinLat))))
  }

  private def pack(ix: Long, iy: Long, level: Int): Long = {
    var m = 0L
    var b = 0
    while (b < level) {
      m |= ((ix >> b) & 1L) << (2 * b)
      m |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    m | (level.toLong << 58)
  }
}
