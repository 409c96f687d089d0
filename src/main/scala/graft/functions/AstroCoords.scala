package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** §2B P10 — astro coordinate transforms (reference surface: builtin
  * query functions for gal↔equ conversion, `lsd/builtins/`,
  * UNVERIFIED). Pure spherical rotations from published J2000
  * constants (e.g. Perryman et al. 1997, Hipparcos vol. 1 §1.5.3), as
  * Catalyst expression trees — codegen'd, no UDF.
  *
  * Smoke-only per SURVEY.md §2B: trig makes results libm-sensitive in
  * the last ulp, so these are unit-tested against known anchor points
  * rather than DuckDB-hash-checked.
  */
object AstroCoords {
  /** North galactic pole (J2000) and galactic lon of the NCP, deg. */
  val NgpRaDeg = 192.85948
  val NgpDecDeg = 27.12825
  val LonNcpDeg = 122.93192

  /** Equatorial (ra, dec) → galactic (l, b), degrees. Returns a struct
    * column with fields l, b. */
  def equToGal(ra: Column, dec: Column): Column = {
    val aG = lit(math.toRadians(NgpRaDeg))
    val dG = lit(math.toRadians(NgpDecDeg))
    val lNcp = lit(math.toRadians(LonNcpDeg))
    val a = radians(ra)
    val d = radians(dec)
    val sinb = sin(d) * sin(dG) + cos(d) * cos(dG) * cos(a - aG)
    val y = cos(d) * sin(a - aG)
    val x = sin(d) * cos(dG) - cos(d) * sin(dG) * cos(a - aG)
    val l = degrees(lNcp - atan2(y, x))
    struct(pmod(l, lit(360.0)).as("l"), degrees(asin(sinb)).as("b"))
  }

  /** Galactic (l, b) → equatorial (ra, dec), degrees (inverse
    * rotation). Returns a struct column with fields ra, dec. */
  def galToEqu(l: Column, b: Column): Column = {
    val aG = lit(math.toRadians(NgpRaDeg))
    val dG = lit(math.toRadians(NgpDecDeg))
    val lNcp = lit(math.toRadians(LonNcpDeg))
    val lr = radians(l)
    val br = radians(b)
    val sind = sin(br) * sin(dG) + cos(br) * cos(dG) * cos(lNcp - lr)
    val y = cos(br) * sin(lNcp - lr)
    val x = sin(br) * cos(dG) - cos(br) * sin(dG) * cos(lNcp - lr)
    val ra = degrees(aG + atan2(y, x))
    struct(pmod(ra, lit(360.0)).as("ra"), degrees(asin(sind)).as("dec"))
  }

  /** Scala twins for tests/driver-side use. */
  def equToGalScala(raDeg: Double, decDeg: Double): (Double, Double) = {
    val aG = math.toRadians(NgpRaDeg)
    val dG = math.toRadians(NgpDecDeg)
    val lNcp = math.toRadians(LonNcpDeg)
    val a = math.toRadians(raDeg)
    val d = math.toRadians(decDeg)
    val sinb = math.sin(d) * math.sin(dG) +
      math.cos(d) * math.cos(dG) * math.cos(a - aG)
    val y = math.cos(d) * math.sin(a - aG)
    val x = math.sin(d) * math.cos(dG) -
      math.cos(d) * math.sin(dG) * math.cos(a - aG)
    val l = (math.toDegrees(lNcp - math.atan2(y, x)) % 360 + 360) % 360
    (l, math.toDegrees(math.asin(sinb)))
  }
}
