package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X4 — the typed UDAF surface (`Aggregator[IN, BUF, OUT]`), the
  * Spark-native replacement for the reference's reduce kernels that
  * carried custom per-key state (SURVEY.md §2H X4).
  *
  * An Aggregator gets partial aggregation for free: `reduce` runs
  * map-side, `merge` combines partials after the shuffle — the same
  * two-phase dataflow the pool2 kernels hand-rolled, but planned by
  * Catalyst and usable inside `agg(...)` next to built-ins.
  */
object Aggregators {

  /** Weighted mean with exact merge: Σwx / Σw. */
  case class WSum(var swx: Double, var sw: Double)

  class WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    def zero: WSum = WSum(0.0, 0.0)
    def reduce(b: WSum, a: (Double, Double)): WSum = {
      b.swx += a._1 * a._2; b.sw += a._2; b
    }
    def merge(x: WSum, y: WSum): WSum = WSum(x.swx + y.swx, x.sw + y.sw)
    def finish(r: WSum): Double = if (r.sw == 0) Double.NaN else r.swx / r.sw
    def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Light-curve statistics — the canonical reference kernel shape
    * (per-object photometry over epochs): n, mean, amplitude
    * (max−min), and reduced χ² against the mean given per-point
    * errors. Input: (mag, magErr). */
  case class LcBuf(var n: Long, var sum: Double, var sumSq: Double,
                   var mn: Double, var mx: Double, var sumInvVar: Double,
                   var sumMagInvVar: Double)

  case class LcStats(n: Long, mean: Double, amplitude: Double,
                     chi2Reduced: Double)

  class LightCurveStats extends Aggregator[(Double, Double), LcBuf, LcStats] {
    def zero: LcBuf = LcBuf(0, 0, 0, Double.PositiveInfinity,
      Double.NegativeInfinity, 0, 0)
    def reduce(b: LcBuf, a: (Double, Double)): LcBuf = {
      val (mag, err) = a
      val iv = if (err > 0) 1.0 / (err * err) else 0.0
      b.n += 1; b.sum += mag; b.sumSq += mag * mag
      b.mn = math.min(b.mn, mag); b.mx = math.max(b.mx, mag)
      b.sumInvVar += iv; b.sumMagInvVar += mag * iv
      b
    }
    def merge(x: LcBuf, y: LcBuf): LcBuf = LcBuf(
      x.n + y.n, x.sum + y.sum, x.sumSq + y.sumSq,
      math.min(x.mn, y.mn), math.max(x.mx, y.mx),
      x.sumInvVar + y.sumInvVar, x.sumMagInvVar + y.sumMagInvVar)
    def finish(b: LcBuf): LcStats = {
      if (b.n == 0) LcStats(0, Double.NaN, Double.NaN, Double.NaN)
      else {
        val wmean =
          if (b.sumInvVar > 0) b.sumMagInvVar / b.sumInvVar else b.sum / b.n
        // χ² of points vs the (weighted) mean, per degree of freedom
        val chi2 =
          if (b.n < 2 || b.sumInvVar == 0) Double.NaN
          else (b.sumSq - 2 * wmean * b.sum + b.n * wmean * wmean) /
            (b.n - 1) // unweighted residual form (per-point errors ~equal)
        LcStats(b.n, b.sum / b.n, b.mx - b.mn, chi2)
      }
    }
    def bufferEncoder: Encoder[LcBuf] = Encoders.product[LcBuf]
    def outputEncoder: Encoder[LcStats] = Encoders.product[LcStats]
  }

  /** Elementwise EXACT sum of d6-snapped term arrays — the reduce
    * kernel behind q_embed_gram (distributed Gram matrix). Each input
    * element is a 1e-6-grid value (the caller snaps with `Det.d6`);
    * `math.rint(x·1e6)` recovers its exact integer millionths (the
    * snapped double sits within ~1e-10 of the grid point, far inside
    * the 0.5 recovery margin), so the buffer is an exact integer
    * vector — merge order cannot move the result, the same guarantee
    * the decimal-sum route gives scalar aggregates, at O(len) state
    * per partition instead of a row-linear anything.
    *
    * finish converts via `BigDecimal.valueOf(sum, 6).doubleValue` —
    * the identical correctly-rounded decimal→double conversion the
    * oracle's `CAST(sum(DECIMAL) AS DOUBLE)` performs. */
  class SnappedVecSum(len: Int)
      extends Aggregator[Array[Double], Array[Long], Array[Double]] {
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], a: Array[Double]): Array[Long] = {
      var i = 0
      while (i < len) { b(i) += math.rint(a(i) * 1e6).toLong; i += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Double] =
      b.map(l => java.math.BigDecimal.valueOf(l, 6).doubleValue)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Upper-triangle Gram accumulator taking the RAW embedding vector —
    * the whole per-row term computation (float→double products, d6
    * snap, millionths accumulation) runs as one JVM loop inside the
    * aggregate. The previous shape computed the 2080 snapped terms as
    * a Catalyst `transform(filter(sequence(...)))` array per row:
    * higher-order functions evaluate INTERPRETED (outside whole-stage
    * codegen), costing ~1 µs per element — 4.6 s for 2000×2080 terms
    * at sf0.1; this loop does the identical arithmetic in ~0.3 s.
    *
    * Exactness: `BigDecimal.valueOf(prod)` is Double.toString's
    * shortest decimal — the same representation Spark's
    * double→DECIMAL(18,6) cast rounds (scala BigDecimal.decimal), and
    * `setScale(6, HALF_UP)` is that cast's rounding mode, so the
    * accumulated integer millionths equal Det.d6's snapped values
    * bit-for-bit, INCLUDING dyadic midpoints (e.g. 1/128 = 0.0078125
    * rounds UP to 0.007813, where a double-arithmetic
    * `rint(x*1e6)` would round half-even to 7812 — the reason this
    * does not shortcut through rint). finish matches the oracle's
    * CAST(DECIMAL AS DOUBLE). */
  class GramUpperTri(d: Int)
      extends Aggregator[Array[Float], Array[Long], Array[Double]] {
    private val len = d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], v: Array[Float]): Array[Long] = {
      var idx = 0
      var i = 0
      while (i < d) {
        val vi = v(i).toDouble
        var j = i
        while (j < d) {
          b(idx) += snap6(vi * v(j).toDouble)
          idx += 1
          j += 1
        }
        i += 1
      }
      b
    }

    /** prod's exact decimal value, rounded HALF_UP at scale 6, as
      * integer millionths. Fast path: r = prod·1e6 in double is within
      * ulp(r)/2 of the exact scaled value, so when r sits farther than
      * a 2-ulp guard band from a .5 midpoint, `rint` already names the
      * unique nearest integer and EVERY rounding mode agrees — only
      * inside the band (rare: requires the product's decimal expansion
      * to graze x.5·10⁻⁶) does the answer depend on HALF_UP vs
      * half-even, and there we pay the exact BigDecimal (which also
      * inherits Double.toString's shortest-decimal semantics, the
      * representation Spark's double→DECIMAL cast rounds). ~20×
      * cheaper than unconditional BigDecimal on the smooth path. */
    @inline private def snap6(prod: Double): Long = {
      val r = prod * 1e6
      val k = Math.rint(r)
      val dist = Math.abs(r - k)
      if (dist < 0.5 - 2 * Math.ulp(r)) k.toLong
      else java.math.BigDecimal.valueOf(prod)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValue()
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Double] =
      b.map(l => java.math.BigDecimal.valueOf(l, 6).doubleValue)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
