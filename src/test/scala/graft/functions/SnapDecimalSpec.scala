package graft.functions

import graft.SpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SnapDecimal6 must be BIT-IDENTICAL to the cast chain it replaces
  * (`CAST(CAST(x AS DECIMAL(18,6)) AS DOUBLE)`) — Det.d6 feeds oracle
  * hashes, so a single differing ulp anywhere is a correctness bug.
  * The sessions run ANSI (Spark 4 default), so NaN/±Inf/overflow must
  * THROW like the cast does, not null out. */
class SnapDecimalSpec extends SpecBase {

  /** Right(value) or Left("throws") through the ENGINE's cast. */
  private def castChain(d: Double): Either[String, Double] =
    try Right(spark.range(1).select(
      lit(d).cast(DecimalType(18, 6)).cast(DoubleType))
      .collect().head.getDouble(0))
    catch { case _: Throwable => Left("throws") }

  private def snapped(d: Double): Either[String, Double] =
    try Right(SnapDecimal6.snap(d))
    catch { case _: ArithmeticException => Left("throws") }

  private def bits(x: Either[String, Double]): Either[String, Long] =
    x.map(java.lang.Double.doubleToRawLongBits)

  test("adversarial values match the cast chain exactly") {
    val cases = Seq[Double](0.0, -0.0, 1.0, -1.0, 0.1, -0.1,
      0.0000005, -0.0000005, 0.0000015, 1.9999995, // exact .5 midpoints
      0.49999999999999994, 1e-300, -1e-300, 4.9e-7, 5.1e-7,
      123456.1234565, 123456.1234575, // mid-boundary at scale 6
      1e11, -1e11, 9.999999999999e11, // near the DECIMAL(18,6) edge
      1e12, -1e12, 1e15, 1e18, // overflow → ANSI throw
      2.251799813685248e9, // |r| = 2^51, fast-path boundary
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue)
    for (d <- cases)
      assert(bits(snapped(d)) == bits(castChain(d)),
        s"mismatch at $d: snap=${snapped(d)} cast=${castChain(d)}")
  }

  test("randomized sweep across magnitudes matches the cast chain") {
    val rnd = new scala.util.Random(42)
    // batch through the ENGINE cast (one job) and compare bulk; keep
    // magnitudes inside the non-throwing range so one job covers all
    val vals = (0 until 20000).map { _ =>
      val m = rnd.nextInt(23) - 12
      (rnd.nextDouble() - 0.5) * math.pow(10.0, m)
    } ++ (0 until 2000).map { _ =>
      // values engineered near .5e-6 grid midpoints
      (rnd.nextInt(2000000) - 1000000) / 1e6 + 5e-7 +
        (rnd.nextDouble() - 0.5) * 1e-12
    }
    import spark.implicits._
    val engine = vals.toDF("x")
      .select(col("x").cast(DecimalType(18, 6)).cast(DoubleType))
      .collect().map(_.getDouble(0))
    vals.zip(engine).foreach { case (d, exp) =>
      assert(java.lang.Double.doubleToRawLongBits(SnapDecimal6.snap(d)) ==
        java.lang.Double.doubleToRawLongBits(exp),
        s"mismatch at $d: snap=${SnapDecimal6.snap(d)} cast=$exp")
    }
  }

  test("codegen path (Det.d6) agrees with the engine cast") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (0 until 5000).map(_ =>
      (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(16) - 8))
    val df = vals.toDF("x")
    val viaExpr = df.select(Det.d6(col("x"))).collect().map(_.getDouble(0))
    val viaCast = df
      .select(col("x").cast(DecimalType(18, 6)).cast(DoubleType))
      .collect().map(_.getDouble(0))
    assert(viaExpr.map(java.lang.Double.doubleToRawLongBits).toSeq ==
      viaCast.map(java.lang.Double.doubleToRawLongBits).toSeq)
  }

  test("null input stays null; nullability mirrors the child") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.5), None).toDF("x")
    val out = df.select(Det.d6(col("x"))).collect()
    assert(out(0).getDouble(0) == 1.5 && out(1).isNullAt(0))
  }
}
