package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hierarchical equal-area sky pixelization — the engine's analog of
  * the reference's BHpix (butterfly HEALPix) spatial partitioning
  * (SURVEY.md §1.1, ref `lsd/bhpix.py`, UNVERIFIED; HEALPix itself:
  * Górski et al. 2005, ApJ 622, 759).
  *
  * Design: a z-order (Morton) quadtree over the cylindrical equal-area
  * projection (x = lon/360, y = (sin(lat)+1)/2). Like BHpix it is
  * hierarchical (level k+1 subdivides level k into 4), equal-area
  * (cells at a level cover equal sphere area, so row counts stay
  * balanced — the property that matters for partition skew), and
  * supports O(1) neighbor enumeration. Unlike true HEALPix the cells
  * are not iso-latitude diamonds; none of our operators depend on
  * cell shape, only on the grid being hierarchical + equal-area +
  * neighbor-closed, so the simpler math wins (it stays inside
  * whole-stage codegen as plain Catalyst expressions — no UDF).
  *
  * Cell id layout: (level << 58) | morton(ix, iy), supporting levels
  * 0..28. At level k there are 4^k cells (level 6 ≈ 4096 cells ≈ 10
  * deg²/cell; level 10 ≈ 1M cells ≈ 0.04 deg²/cell — the 100 TB
  * partitioning knob).
  */
object SkyPix {
  val MaxLevel = 28

  /** Grid coordinates at a level, as Columns (pure expressions).
    *
    * NULL-COORDINATE CONTRACT (review r20): Spark's least/greatest
    * SKIP null arguments, so this raw grid math maps a NULL lon/lat
    * to grid index n-1 — the top-corner cell — NOT to null. The grid
    * expressions stay null-UNAWARE on purpose: gating inside ix/iy
    * wrapped every subexpression in a CASE that the 9 neighbor slots
    * duplicated (2-4x on the whole xmatch bench family), and even ONE
    * top-level when() makes `cell` nullable, which knocks hot joins
    * and aggregations off codegen's primitive fast paths (measured 2x
    * on q_tracklets). Null handling therefore lives at the
    * BOUNDARIES: [[graft.sources.SpatialWriter]] refuses null
    * coordinates loudly at import (a catalog row needs a position),
    * [[graft.streaming.StreamOps.skymapStream]] filters them before
    * densities, and the cross-match channels are immune regardless —
    * a null-coordinate row's candidate pairs die at the exact
    * haversine refine (NULL distance never passes `<= r`). */
  private def ixy(lon: Column, lat: Column, level: Int): (Column, Column) = {
    val n = 1L << level
    // clamp into [0, n-1] so lon=360 / lat=±90 stay in range
    val fx = pmod(lon, lit(360.0)) / 360.0
    val fy = (sin(radians(lat)) + 1.0) / 2.0
    val ix = least(floor(fx * n).cast(LongType), lit(n - 1))
    val iy = least(floor(fy * n).cast(LongType), lit(n - 1))
    (greatest(ix, lit(0L)), greatest(iy, lit(0L)))
  }

  /** Morton-interleave two level-bit coordinates (expression tree —
    * a shift/or chain, codegen-friendly). */
  private def morton(ix: Column, iy: Column, level: Int): Column =
    (0 until level).map { b =>
      val bx = shiftleft(shiftright(ix, b).bitwiseAND(1L), 2 * b)
      val by = shiftleft(shiftright(iy, b).bitwiseAND(1L), 2 * b + 1)
      bx.bitwiseOR(by)
    }.foldLeft(lit(0L))((acc, c) => acc.bitwiseOR(c))

  /** cell(lon_deg, lat_deg) → packed cell id at `level`. NULL
    * coordinates land in the top-corner cell — see [[ixy]]'s
    * null-coordinate contract (boundaries guard, not the hot path). */
  def cell(lon: Column, lat: Column, level: Int): Column = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    val (ix, iy) = ixy(lon, lat, level)
    morton(ix, iy, level).bitwiseOR(lit(level.toLong << 58))
  }

  /** The ≤9-cell neighborhood (cell + 8 adjacent, lon-wrapped, lat
    * edges clamped) — the query-time equivalent of the reference's
    * neighbor-margin cache: probing all neighbors of a cell makes a
    * radius-bounded spatial join cell-local without replicating rows
    * at write time. Returns an array column (use explode). */
  def neighborCells(lon: Column, lat: Column, level: Int): Column = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    val n = 1L << level
    val (ix, iy) = ixy(lon, lat, level)
    val cells = for (dx <- -1 to 1; dy <- -1 to 1) yield {
      val nx = pmod(ix + dx, lit(n)) // lon wraps
      val ny = iy + dy               // lat clamps (drop out-of-range)
      when(ny >= 0 && ny < n,
        morton(nx, ny, level).bitwiseOR(lit(level.toLong << 58)))
    }
    array_distinct(filter(array(cells: _*), c => c.isNotNull))
  }

  /** The home cell plus only those neighbor cells whose shared
    * boundary lies within `marginDeg` of the point — the margin-strip
    * form of [[neighborCells]], cutting write-time replication (and
    * query-time probe explode) from a flat 9× to ~(1 + strip
    * fraction)×.
    *
    * The per-edge distance tests are exact LOWER bounds on the
    * great-circle distance to the neighbor cell, so pruning on them is
    * conservative (never drops a replica a radius-`marginDeg` match
    * could need):
    *   - meridian (east/west edge): any geodesic into the neighbor
    *     crosses the edge meridian, and the point-to-meridian distance
    *     d satisfies sin d = sin(Δlon)·cos(lat) (cross-track formula,
    *     exact);
    *   - parallel (north/south edge): point-to-parallel distance is
    *     exactly |Δlat|;
    *   - diagonal neighbors must cross BOTH boundaries, so both tests
    *     apply (dist ≥ max of the two lower bounds).
    */
  def neighborCellsWithin(lon: Column, lat: Column, level: Int,
                          marginDeg: Double): Column =
    array_distinct(filter(
      neighborCellsWithinRaw(lon, lat, level, marginDeg), c => c.isNotNull))

  /** Raw 9-slot form of [[neighborCellsWithin]]: strip-pruned or
    * out-of-range neighbors are NULL entries instead of being filtered
    * out, and no de-duplication is applied. This variant contains NO
    * higher-order functions, so it can be injected into plans by
    * optimizer rules (lambda variables need the analyzer, which
    * rule-injected expressions never see — [[graft.plans
    * .AutoSpatialJoin]]). Consumers explode it and equi-join on the
    * cell: null slots never match, and slots are pairwise-distinct
    * for level >= 2 (the 9 (ix±1, iy±1) grid positions are distinct
    * once the grid is wider than 2 cells). */
  def neighborCellsWithinRaw(lon: Column, lat: Column, level: Int,
                             marginDeg: Double): Column = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    require(marginDeg >= 0, s"marginDeg must be >= 0, got $marginDeg")
    val n = 1L << level
    val w = 360.0 / n
    val (ix, iy) = ixy(lon, lat, level)
    val lonNorm = pmod(lon, lit(360.0))
    val cosLat = cos(radians(lat))
    val sinMargin = math.sin(math.toRadians(math.min(90.0, marginDeg)))
    // Δlon (deg) to the east/west cell edges; sin(Δlon)·cos(lat) vs
    // sin(margin) is the exact meridian-distance comparison (both
    // sides of the inequality are in [0°, 90°] for cells ≤ 90° wide;
    // coarser cells make sin non-monotone which only over-replicates)
    val dLonE = (ix + 1).cast("double") * w - lonNorm
    val dLonW = lonNorm - ix.cast("double") * w
    val eastNear = sin(radians(dLonE)) * cosLat <= sinMargin
    val westNear = sin(radians(dLonW)) * cosLat <= sinMargin
    // lat of the north/south cell edges (exact grid geometry)
    val latEdgeN = degrees(asin((iy + 1).cast("double") * (2.0 / n) - 1.0))
    val latEdgeS = degrees(asin(iy.cast("double") * (2.0 / n) - 1.0))
    val northNear = latEdgeN - lat <= marginDeg
    val southNear = lat - latEdgeS <= marginDeg
    val cells = for (dx <- -1 to 1; dy <- -1 to 1) yield {
      val nx = pmod(ix + dx, lit(n)) // lon wraps
      val ny = iy + dy               // lat clamps (drop out-of-range)
      val inRange = ny >= 0 && ny < n
      val strip = (dx, dy) match {
        case (0, 0)   => lit(true)
        case (-1, 0)  => westNear
        case (1, 0)   => eastNear
        case (0, -1)  => southNear
        case (0, 1)   => northNear
        case (-1, -1) => westNear && southNear
        case (-1, 1)  => westNear && northNear
        case (1, -1)  => eastNear && southNear
        case (1, 1)   => eastNear && northNear
        case _        => lit(true) // unreachable
      }
      when(inRange && strip,
        morton(nx, ny, level).bitwiseOR(lit(level.toLong << 58)))
    }
    array(cells: _*)
  }

  /** Oracle-matchable grid coordinate: identical to the internal grid
    * math except the unit-square fraction is d6-snapped BEFORE
    * flooring. `sin` differs by ~1 ulp across libms (Java Math.sin vs
    * DuckDB's libm), so an unsnapped floor could disagree between
    * engines for points within a ulp of a cell boundary; the snap
    * collapses both to the same 1e-6 grid point first (a ≤1e-6 shift
    * of a bin edge is immaterial for density binning — and [[cell]]
    * consumers never compare cell ids across engines, only oracle
    * queries do). Keep textually in sync with [[sql.ixSnapped]]. */
  def ixSnapped(lon: Column, level: Int): Column = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    val n = 1L << level
    val fx = graft.functions.Det.d6(pmod(lon, lit(360.0)) / 360.0)
    greatest(least(floor(fx * n), lit(n - 1)), lit(0L))
  }

  /** See [[ixSnapped]]; sin(lat) axis. */
  def iySnapped(lat: Column, level: Int): Column = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    val n = 1L << level
    val fy = graft.functions.Det.d6((sin(radians(lat)) + 1.0) / 2.0)
    greatest(least(floor(fy * n), lit(n - 1)), lit(0L))
  }

  /** Public packed-cell constructor from grid coordinates — [[cell]]
    * = mortonCell(ixy). Exposed so queries that group by (ix, iy) can
    * emit the packed id without recomputing the projection. */
  def mortonCell(ix: Column, iy: Column, level: Int): Column = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    morton(ix, iy, level).bitwiseOR(lit(level.toLong << 58))
  }

  /** Driver-side (plain Long) twin of [[mortonCell]], for building
    * driver-sized lookup tables (e.g. dust-map ingest) without a
    * Spark job per cell. */
  def mortonCellValue(ix: Long, iy: Long, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    var m = 0L
    var b = 0
    while (b < level) {
      m |= ((ix >> b) & 1L) << (2 * b)
      m |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    m | (level.toLong << 58)
  }

  /** DuckDB SQL twins of the snapped grid + morton packing, for
    * oracle-checked queries that output cell ids. All-integer bit
    * arithmetic after the snap, so the generated SQL is exact. */
  object sql {
    private def d6(e: String): String =
      s"CAST(CAST(($e) AS DECIMAL(18,6)) AS DOUBLE)"

    def ixSnapped(lonExpr: String, level: Int): String = {
      val n = 1L << level
      val fx = d6(s"((($lonExpr) % 360.0 + 360.0) % 360.0) / 360.0")
      s"GREATEST(LEAST(CAST(floor($fx * $n) AS BIGINT), ${n - 1}), 0)"
    }

    def iySnapped(latExpr: String, level: Int): String = {
      val n = 1L << level
      val fy = d6(s"(sin(radians($latExpr)) + 1.0) / 2.0")
      s"GREATEST(LEAST(CAST(floor($fy * $n) AS BIGINT), ${n - 1}), 0)"
    }

    def mortonCell(ixExpr: String, iyExpr: String, level: Int): String = {
      val bits = (0 until level).flatMap { b =>
        Seq(s"(((($ixExpr) >> $b) & 1) << ${2 * b})",
          s"(((($iyExpr) >> $b) & 1) << ${2 * b + 1})")
      }
      (Seq(s"(CAST(${level.toLong} AS BIGINT) << 58)") ++ bits)
        .mkString("(", " | ", ")")
    }
  }

  /** Packed row id — the engine's `_ID` pseudo-column (the
    * reference's packed object id: cell bits ‖ row-within-cell;
    * SURVEY.md §2B P8, ref `lsd/table.py` id assignment, UNVERIFIED).
    * Layout: (level << 58) | (morton << rowBits) | row, so ids sort
    * by cell (spatial locality) and `idCell` recovers the exact
    * SkyPix cell id without a lookup. Overflow of either the morton
    * bits (2·level + rowBits > 58) or the row counter raises at
    * runtime rather than corrupting ids. */
  def packId(cellCol: Column, rowCol: Column, rowBits: Int = 24): Column = {
    require(rowBits >= 1 && rowBits <= 40, s"rowBits $rowBits out of range")
    val mask58 = (1L << 58) - 1
    val level = shiftright(cellCol, 58)
    val morton = cellCol.bitwiseAND(lit(mask58))
    val packed = shiftleft(level, 58)
      .bitwiseOR(shiftleft(morton, rowBits))
      .bitwiseOR(rowCol)
    when(rowCol >= 0 && rowCol < (1L << rowBits) &&
      morton < (1L << (58 - rowBits)), packed)
      .otherwise(raise_error(concat(lit("packId overflow: row="), rowCol,
        lit(s" rowBits=$rowBits cell="), cellCol)))
  }

  /** Recover the SkyPix cell id from a packed `_ID`. */
  def idCell(idCol: Column, rowBits: Int = 24): Column = {
    val mask58 = (1L << 58) - 1
    shiftleft(shiftright(idCol, 58), 58)
      .bitwiseOR(shiftright(idCol.bitwiseAND(lit(mask58)), rowBits))
  }

  /** Recover the row-within-cell counter from a packed `_ID`. */
  def idRow(idCol: Column, rowBits: Int = 24): Column =
    idCol.bitwiseAND(lit((1L << rowBits) - 1))

  /** Scala-side twin of [[neighborCellsWithin]] for tests /
    * driver-side checks (same arithmetic, same conservative per-edge
    * lower-bound tests; SkyPixSpec anchors twin ≡ expression). */
  def stripNeighborIds(lonDeg: Double, latDeg: Double, level: Int,
                       marginDeg: Double): Seq[Long] = {
    val n = 1L << level
    val w = 360.0 / n
    val lonNorm = ((lonDeg % 360) + 360) % 360
    val fy = (math.sin(math.toRadians(latDeg)) + 1.0) / 2.0
    val ix = math.min((lonNorm / 360.0 * n).toLong, n - 1).max(0)
    val iy = math.min((fy * n).toLong, n - 1).max(0)
    val cosLat = math.cos(math.toRadians(latDeg))
    val sinMargin = math.sin(math.toRadians(math.min(90.0, marginDeg)))
    val dLonE = (ix + 1).toDouble * w - lonNorm
    val dLonW = lonNorm - ix.toDouble * w
    val eastNear = math.sin(math.toRadians(dLonE)) * cosLat <= sinMargin
    val westNear = math.sin(math.toRadians(dLonW)) * cosLat <= sinMargin
    val latEdgeN = math.toDegrees(math.asin(
      math.max(-1, math.min(1, (iy + 1).toDouble * (2.0 / n) - 1.0))))
    val latEdgeS = math.toDegrees(math.asin(
      math.max(-1, math.min(1, iy.toDouble * (2.0 / n) - 1.0))))
    val northNear = latEdgeN - latDeg <= marginDeg
    val southNear = latDeg - latEdgeS <= marginDeg
    val out = Seq.newBuilder[Long]
    for (dx <- -1 to 1; dy <- -1 to 1) {
      val ny = iy + dy
      val strip = (dx, dy) match {
        case (0, 0)   => true
        case (-1, 0)  => westNear
        case (1, 0)   => eastNear
        case (0, -1)  => southNear
        case (0, 1)   => northNear
        case (-1, -1) => westNear && southNear
        case (-1, 1)  => westNear && northNear
        case (1, -1)  => eastNear && southNear
        case (1, 1)   => eastNear && northNear
        case _        => true
      }
      if (ny >= 0 && ny < n && strip) {
        val nx = ((ix + dx) % n + n) % n
        var m = 0L
        var b = 0
        while (b < level) {
          m |= ((nx >> b) & 1L) << (2 * b)
          m |= ((ny >> b) & 1L) << (2 * b + 1)
          b += 1
        }
        out += (m | (level.toLong << 58))
      }
    }
    out.result().distinct
  }

  /** Scala-side twin for tests / driver-side checks. */
  def cellId(lonDeg: Double, latDeg: Double, level: Int): Long = {
    val nCells = 1L << level
    val fx = (((lonDeg % 360) + 360) % 360) / 360.0
    val fy = (math.sin(math.toRadians(latDeg)) + 1.0) / 2.0
    val ix = math.min((fx * nCells).toLong, nCells - 1).max(0)
    val iy = math.min((fy * nCells).toLong, nCells - 1).max(0)
    var m = 0L
    var b = 0
    while (b < level) {
      m |= ((ix >> b) & 1L) << (2 * b)
      m |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    m | (level.toLong << 58)
  }

  /** Cell angular size lower bound (deg) at a level — used to pick a
    * level such that a radius-r match only needs the 8 neighbors. */
  def minCellSizeDeg(level: Int): Double = {
    // y-direction: worst case at the equator where Δ(sin lat) is
    // largest per degree; a cell spans 2/n in sin(lat), ≥ (2/n) rad
    // ≈ 114.6/n deg at the equator; x-direction: 360/n deg of lon,
    // which shrinks by cos(lat) in angular terms — but the sin(lat)
    // compression means high-|lat| cells are tall in lat instead.
    // Lower bound used: 360/n * min over the cell of cos(lat) is not
    // bounded below at the poles, so radius-bounded matching uses
    // levels where 360/(1<<level) ≥ 2·radius AND callers must treat
    // |lat| > 85° with a coarser level (documented limitation, same
    // polar-cap caveat the reference's butterfly projection addressed).
    360.0 / (1L << level)
  }

  /** Pick the finest level whose cells are ≥ 2× the radius wide, so
    * any two points within `radiusDeg` land in the same or adjacent
    * cells (capped to keep polar distortion safe; see minCellSizeDeg). */
  def levelForRadius(radiusDeg: Double): Int = {
    var lvl = 0
    while (lvl < 12 && minCellSizeDeg(lvl + 1) >= 2 * radiusDeg) lvl += 1
    lvl
  }
}
