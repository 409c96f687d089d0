package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd equivalent of the determinism snap
  * `CAST(CAST(x AS DECIMAL(18,6)) AS DOUBLE)` (functions/Det.d6) —
  * bit-identical output, including the ANSI throw on NaN/±Inf/
  * overflow that the sessions' default-ANSI cast produces — ~20×
  * cheaper on the smooth path.
  *
  * Spark's double→decimal cast goes BigDecimal-through-Double.toString
  * per row; profiling showed it as the dominant per-row cost of every
  * d6-heavy projection (q_math spent 2 s of the sf0.1 bench in three
  * of these per row). Fast path (the [[Aggregators.GramUpperTri]]
  * snap6 band argument): r = x·10⁶ in double is within ulp(r)/2 of the
  * exact scaled value, so when r sits farther than a 2-ulp guard band
  * from a .5 midpoint, `rint` names the unique nearest integer k and
  * EVERY rounding mode agrees; k/10⁶ is then one correctly-rounded
  * IEEE division — the same double BigDecimal(k,6).doubleValue
  * produces. Only inside the band (transcendental outputs essentially
  * never) does the answer depend on HALF_UP vs half-even, and there we
  * pay the exact BigDecimal that Spark's cast pays everywhere.
  * The `+ 0.0` normalizes -0.0 to +0.0, matching the cast (decimal
  * has no signed zero).
  * The fast path also requires |r| < 2^51 (band test meaningless
  * beyond ulp ≥ 0.25) — still far under the 1e12 DECIMAL(18,6)
  * overflow line, which the slow path checks exactly. */
case class SnapDecimal6(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"snap6 requires DOUBLE, got ${child.dataType.sql}")
  override def prettyName: String = "snap6"

  override def nullSafeEval(input: Any): Any =
    SnapDecimal6.snap(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val d = ctx.freshName("d")
    val r = ctx.freshName("r")
    val k = ctx.freshName("k")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |double $d = $c;
         |double $r = $d * 1.0E6;
         |double $k = java.lang.Math.rint($r);
         |if (java.lang.Math.abs($r) < 2.251799813685248E15 &&
         |    java.lang.Math.abs($r - $k) <
         |      0.5 - 2.0 * java.lang.Math.ulp($r)) {
         |  ${ev.value} = $k / 1.0E6 + 0.0;
         |} else {
         |  ${ev.value} = graft.functions.SnapDecimal6.snapSlow($d);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SnapDecimal6 {
  /** Interpreted twin of the generated code. */
  def snap(d: Double): Double = {
    val r = d * 1.0e6
    val k = java.lang.Math.rint(r)
    if (java.lang.Math.abs(r) < 2.251799813685248e15 && // 2^51
      java.lang.Math.abs(r - k) < 0.5 - 2.0 * java.lang.Math.ulp(r))
      k / 1.0e6 + 0.0
    else snapSlow(d)
  }

  /** Exact path — byte-identical to Spark's
    * Cast(double → DECIMAL(18,6) → double): BigDecimal via
    * Double.toString (shortest repr), HALF_UP at scale 6. NaN/±Inf
    * and precision-18 overflow THROW, matching the ANSI cast the
    * sessions run with (d6 values never legitimately reach 1e12 —
    * a throw here is a genuine bug surfacing loud, exactly as the
    * cast chain it replaces did). */
  def snapSlow(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(
        s"snap6: $d cannot be represented as DECIMAL(18,6)")
    val bd = java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 18)
      throw new ArithmeticException(
        s"snap6: $d cannot be represented as DECIMAL(18,6)")
    bd.doubleValue
  }

  /** Scalar twin of the FLOOR-snap ([[Det.f6]]): floor to the 1e-6
    * grid. The snap for integer-ratio grouping/bin keys, where a
    * round-half snap can hit an exact midpoint and the engines'
    * tie-break rules (Spark half-up, DuckDB half-even) diverge. */
  def snapFloor(d: Double): Double =
    math.floor(d * 1000000.0).toLong.toDouble / 1000000.0
}
