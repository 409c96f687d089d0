package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Determinism helpers for DuckDB-oracle hash-matching (SURVEY.md §2
  * determinism rules).
  *
  * Floating-point aggregation is order-dependent, and Spark's shuffle
  * order differs from DuckDB's scan order — so a naive `sum(double)`
  * will not hash-match. The fix: route money-like doubles through an
  * exact decimal(18,4) sum (associative, order-independent, identical
  * in both engines) and only then cast back to double. Derived stats
  * (avg/var/stddev/corr) are computed from those exact sums with a
  * fixed double expression tree, which both engines evaluate
  * identically under IEEE-754.
  *
  * This is also the right call at 100 TB: decimal sums are codegen'd,
  * partial-aggregated map-side, and immune to re-ordering under AQE
  * re-partitioning — determinism and scale point the same way.
  *
  * FMA caveat (learned the hard way, q_trend_fit): even with
  * bit-identical inputs, a compound product `a*b - c*d` is NOT
  * engine-identical — DuckDB's compiled kernels may contract the
  * multiply-subtract into a fused-multiply-add, which rounds once
  * where Spark's JVM code rounds twice. Plain single-op chains
  * (x/y, sqrt, a-b, a*const) ARE identical under IEEE-754. Rules:
  * (1) any value built through a mul-add/mul-sub chain must be
  * d6-snapped before it is emitted or compared; (2) zero/sign guards
  * on such expressions must be computed in exact integer or decimal
  * arithmetic instead.
  */
object Det {
  // Scale 8, not 4: money products carry up to 6 true decimal digits
  // (price × discount × tax), which sit EXACTLY on the 1e-8 grid in
  // both engines — so the double→decimal cast never hits a rounding
  // midpoint and half-up (Spark) vs half-even (DuckDB) cannot diverge.
  // Precision 18, not 28: ≤18 keeps Spark's Decimal in its compact
  // unscaled-Long representation through the cast and the partial-sum
  // hot loop (the sum buffer widens to decimal(28,8) but its values
  // stay under 2^63 unscaled, which also stays compact). Data values
  // are ≤ ~1e6 with 8 scale digits → 14 of 18 digits used.
  val M = DecimalType(18, 8)

  /** Wide twin for squared/product terms (x² of a ≤1e6 value carries
    * up to 12 integer digits; scale 8 keeps the grid argument above). */
  val M38 = DecimalType(38, 8)

  /** Exact order-independent sum of a money-like double → double. */
  def dsum(c: Column): Column = sum(c.cast(M)).cast(DoubleType)

  /** Stabilize a transcendental (log/exp/pow/trig) result for oracle
    * compare: snap to the 1e-6 decimal grid via a decimal cast. Unlike
    * `round()`, whose double pathway differs between engines, a
    * double→decimal(18,6)→double trip is identical on both sides
    * except at exact decimal midpoints, which transcendental values
    * never hit. Runs as the codegen'd [[SnapDecimal6]] — bit-identical
    * to the cast chain (property-tested in SnapDecimalSpec) without
    * its per-row BigDecimal detour. */
  def d6(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      SnapDecimal6(org.apache.spark.sql.GraftShims.expression(
        c.cast(DoubleType))))

  /** FLOOR-snap to the 1e-6 grid — the snap for values used as
    * GROUP/BIN KEYS (or feeding exposed per-cell counts) whose raw
    * form is a RATIO OF INTEGERS. Unlike transcendental outputs, an
    * integer ratio CAN land exactly on a 5e-7 rounding midpoint,
    * where Spark's half-up and DuckDB's half-even decimal casts
    * disagree (observed: raw 0.5734375 at sf0.1) — a one-doc flip
    * that an aggregate absorbs but a grouping key does not (it
    * creates/destroys a distinct cell or moves a doc across a bin
    * edge). floor of the IEEE-identical raw double has no tie to
    * disagree on. The q_quality_norm discipline, hoisted. */
  def f6(c: Column): Column =
    floor(c.cast(DoubleType) * 1000000.0).cast(LongType)
      .cast(DoubleType) / 1000000.0

  /** Exact sum of products (x*y is IEEE-deterministic; the decimal cast
    * makes the subsequent summation order-independent). Uses the wide
    * M38 type: a product of two ≤1e6 values carries up to 12 integer
    * digits, which overflows M's 10 — and the oracle twin sums at
    * DECIMAL(38,8), so both sides must keep the term. */
  def dsumProd(x: Column, y: Column): Column =
    sum((x * y).cast(M38)).cast(DoubleType)

  /** Average via exact sum / count — identical double division on both
    * sides. Null-safe: counts only non-null x. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample variance from exact sums: (Σx² − (Σx)²/n) / (n−1), all
    * final arithmetic in double with a fixed parenthesization. */
  def dvarSamp(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val sx = dsum(c)
    val sxx = sum((c * c).cast(DecimalType(38, 8))).cast(DoubleType)
    (sxx - (sx * sx) / n) / (n - lit(1.0))
  }

  def dstddevSamp(c: Column): Column = sqrt(dvarSamp(c))

  /** Pearson correlation from exact sums. */
  def dcorr(x: Column, y: Column): Column = {
    val n = count(x).cast(DoubleType)
    val sx = dsum(x); val sy = dsum(y)
    val sxy = sum((x * y).cast(DecimalType(38, 8))).cast(DoubleType)
    val sxx = sum((x * x).cast(DecimalType(38, 8))).cast(DoubleType)
    val syy = sum((y * y).cast(DecimalType(38, 8))).cast(DoubleType)
    (sxy - (sx * sy) / n) /
      sqrt((sxx - (sx * sx) / n) * (syy - (sy * sy) / n))
  }

  /** Oracle-side (DuckDB SQL) twins of the helpers above. Keep these
    * textually in sync with the Column builders. */
  object sql {
    def dsum(e: String): String =
      s"CAST(sum(CAST(($e) AS DECIMAL(18,8))) AS DOUBLE)"
    def d6(e: String): String =
      s"CAST(CAST(($e) AS DECIMAL(18,6)) AS DOUBLE)"
    def f6(e: String): String =
      s"CAST(CAST(floor(($e) * 1000000.0) AS BIGINT) AS DOUBLE)" +
        " / 1000000.0"
    def davg(e: String): String = s"${dsum(e)} / count($e)"
    def sq(e: String): String =
      s"CAST(sum(CAST((($e) * ($e)) AS DECIMAL(38,8))) AS DOUBLE)"
    def sprod(x: String, y: String): String =
      s"CAST(sum(CAST((($x) * ($y)) AS DECIMAL(38,8))) AS DOUBLE)"
    def dvarSamp(e: String): String = {
      val n = s"CAST(count($e) AS DOUBLE)"
      s"(${sq(e)} - (${dsum(e)} * ${dsum(e)}) / $n) / ($n - 1.0)"
    }
    def dstddevSamp(e: String): String = s"sqrt(${dvarSamp(e)})"
    def dcorr(x: String, y: String): String = {
      val n = s"CAST(count($x) AS DOUBLE)"
      s"(${sprod(x, y)} - (${dsum(x)} * ${dsum(y)}) / $n) / " +
        s"sqrt((${sq(x)} - (${dsum(x)} * ${dsum(x)}) / $n) * " +
        s"(${sq(y)} - (${dsum(y)} * ${dsum(y)}) / $n))"
    }
  }
}
