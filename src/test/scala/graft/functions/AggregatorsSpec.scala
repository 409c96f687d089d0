package graft.functions

import graft.SpecBase
import org.apache.spark.sql.functions.udaf

class AggregatorsSpec extends SpecBase {
  import spark.implicits._

  test("WeightedMean as a typed aggregator and as an untyped UDAF") {
    val ds = Seq((1.0, 1.0), (3.0, 3.0)).toDS() // Σwx=10, Σw=4 → 2.5
    val typed = ds.select(new Aggregators.WeightedMean().toColumn).head
    assert(typed == 2.5)
    // registered for DataFrame/SQL use
    val wm = udaf(new Aggregators.WeightedMean())
    val df = Seq(("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "x", "w")
    val got = df.groupBy("k").agg(wm($"x", $"w").as("wmean"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", 2.5), ("b", 5.0)))
  }

  test("WeightedMean of zero weight is NaN; empty input too") {
    val ds = Seq((1.0, 0.0)).toDS()
    assert(ds.select(new Aggregators.WeightedMean().toColumn).head.isNaN)
  }

  test("LightCurveStats: partial+merge equals single-pass truth") {
    val rnd = new scala.util.Random(3)
    val mags = (1 to 1000).map(_ => (15.0 + rnd.nextGaussian() * 0.2, 0.2))
    val ds = mags.toDS().repartition(7) // force multi-partition merge
    val got = ds.select(new Aggregators.LightCurveStats().toColumn).head
    assert(got.n == 1000)
    assert(math.abs(got.mean - mags.map(_._1).sum / 1000) < 1e-9)
    assert(math.abs(got.amplitude -
      (mags.map(_._1).max - mags.map(_._1).min)) < 1e-12)
    // unit-variance residuals in units of err=0.2 → χ²/dof ≈ err² scale
    assert(got.chi2Reduced > 0.02 && got.chi2Reduced < 0.06)
  }

  test("grouped light curves via udaf") {
    val lc = udaf(new Aggregators.LightCurveStats())
    val df = Seq((1L, 15.0, 0.1), (1L, 15.4, 0.1), (2L, 12.0, 0.1))
      .toDF("obj_id", "mag", "err")
    val rows = df.groupBy("obj_id").agg(lc($"mag", $"err").as("s"))
      .selectExpr("obj_id", "s.n", "s.amplitude").orderBy("obj_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(rows(0)._3 - 0.4) < 1e-12 && rows(1)._3 == 0.0)
  }
}
