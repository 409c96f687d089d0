package graft.functions

import graft.SpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ExactQuantiles (§2D A9 scale path) vs a driver-side sorted-array
  * reference using the identical interpolation formula — results must
  * be bit-exact, across duplicates, skew, nulls, null group keys and
  * forced multi-pass refinement. */
class ExactQuantilesSpec extends SpecBase {
  import ExactQuantiles.{Req, Stats}

  /** reference: sort + h = p(n-1), lo + (hi-lo)*frac */
  private def ref(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val h = p * (s.length - 1).toDouble
    val kLo = math.floor(h).toInt
    val kHi = math.ceil(h).toInt
    if (kLo == kHi) s(kLo) else s(kLo) + (s(kHi) - s(kLo)) * (h - kLo)
  }

  private def mkDf(rows: Seq[(String, java.lang.Double)]) = {
    val schema = StructType(Seq(StructField("g", StringType, true),
      StructField("v", DoubleType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 7),
      schema)
  }

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 1.0)

  test("matches sorted-array reference bit-exactly on skewed data with duplicates") {
    val rnd = new scala.util.Random(42)
    // heavy duplication + exponential skew + two groups
    val rows: Seq[(String, java.lang.Double)] = (0 until 20000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v: Double =
        if (i % 5 == 0) 7.25 // hot duplicate
        else math.exp(rnd.nextGaussian() * 3) * (if (rnd.nextBoolean()) 1 else -1)
      (g, java.lang.Double.valueOf(v))
    }
    val df = mkDf(rows)
    val reqs = ps.zipWithIndex.map { case (p, i) => Req("v", p, s"q$i") }
    val (out, _) = ExactQuantiles.computeWithStats(df, Seq("g"), reqs,
      bins = 32, collectThreshold = 100)
    val got = out.collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == g).map(_._2.doubleValue())
      for ((p, i) <- ps.zipWithIndex) {
        val want = ref(vs, p)
        val have = got(g).getDouble(1 + i)
        assert(have == want, s"group $g p=$p: $have != $want")
      }
    }
  }

  test("forced multi-pass refinement stays bounded and exact") {
    // 50k rows, one group, threshold 50, bins 8 -> needs >= 3 histogram
    // passes; asserts the collect bound held (the scale contract)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50000).map(i =>
      ("g", java.lang.Double.valueOf(rnd.nextDouble() * 1e9)))
    val (out, stats) = ExactQuantiles.computeWithStats(mkDf(rows),
      Seq("g"), Seq(Req("v", 0.5, "med")), bins = 8, collectThreshold = 50)
    assert(stats.histPasses >= 3, s"expected multi-pass, got $stats")
    assert(stats.maxRangeRows <= 50, s"collect bound violated: $stats")
    val want = ref(rows.map(_._2.doubleValue()), 0.5)
    assert(out.collect().head.getDouble(1) == want)
  }

  test("nulls ignored, null group key is its own group, single-row group") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("a", 1.0), ("a", null), ("a", 3.0),
      (null, 10.0), (null, 20.0), (null, 30.0), (null, 40.0),
      ("solo", 99.5),
      ("allnull", null))
      .map { case (g, v) =>
        (g, if (v == null) null
        else java.lang.Double.valueOf(v.asInstanceOf[Double]))
      }
    val (out, _) = ExactQuantiles.computeWithStats(mkDf(rows), Seq("g"),
      Seq(Req("v", 0.5, "med")), bins = 4, collectThreshold = 2)
    val got = out.collect().map(r => Option(r.getString(0)).getOrElse("NULL")
      -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("a") === Some(2.0)) // nulls ignored: median(1,3)
    assert(got("NULL") === Some(25.0)) // (20+30)/2
    assert(got("solo") === Some(99.5))
    assert(got("allnull") === None) // no non-null values -> NULL
  }

  test("all-duplicate group resolves degenerately (no collect blowup)") {
    val rows = (0 until 10000).map(_ => ("g", java.lang.Double.valueOf(5.5)))
    val (out, stats) = ExactQuantiles.computeWithStats(mkDf(rows), Seq("g"),
      Seq(Req("v", 0.25, "q")), bins = 16, collectThreshold = 10)
    assert(out.collect().head.getDouble(1) == 5.5)
    // lo == hi short-circuits before any histogram or collect pass
    assert(stats == Stats(0, 0L, 0L), s"unexpected work: $stats")
  }

  test("±Inf segregated by rank arithmetic — no whole-group collect") {
    // An infinite range endpoint makes (v-lo)/width degenerate (0 or
    // NaN), so pre-fix every row landed in bin 0, the range never
    // narrowed, and the maxPasses fallback collected the ENTIRE
    // group. Now non-finite values resolve from pass-0 counts and
    // only the finite slice is refined.
    val rnd = new scala.util.Random(5)
    val rows: Seq[(String, java.lang.Double)] = (0 until 30000).map { i =>
      val v: Double =
        if (i % 100 == 0) Double.NegativeInfinity
        else if (i % 100 == 1) Double.PositiveInfinity
        else rnd.nextGaussian() * 100
      ("g", java.lang.Double.valueOf(v))
    }
    val df = mkDf(rows)
    val reqs = ps.zipWithIndex.map { case (p, i) => Req("v", p, s"q$i") }
    val (out, st) = ExactQuantiles.computeWithStats(df, Seq("g"), reqs,
      bins = 32, collectThreshold = 500)
    // the driver-memory contract must HOLD despite the infinities
    assert(st.maxRangeRows <= 500,
      s"collected a range of ${st.maxRangeRows} rows > threshold")
    val vs = rows.map(_._2.doubleValue())
    val got = out.collect().head
    for ((p, i) <- ps.zipWithIndex) {
      val want = ref(vs, p)
      val have = got.getDouble(1 + i)
      assert(have == want || (have.isNaN && want.isNaN),
        s"p=$p: $have != $want")
    }
    // p=0 with 1% -Inf rows and p=1 with 1% +Inf rows hit the rails
    assert(got.getDouble(1).isNegInfinity && got.getDouble(1 + ps.length - 1)
      .isPosInfinity)
  }

  test("agrees with Spark's buffering percentile on lineitem (1e-9 rel)") {
    val li = graft.LsdDb.table(spark, sfDir, "lineitem")
    val want = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.25)).as("p25"),
        percentile(col("l_extendedprice"), lit(0.75)).as("p75"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val got = ExactQuantiles.quantiles(li, Seq("l_returnflag"),
      Seq(Req("l_extendedprice", 0.25, "p25"),
        Req("l_extendedprice", 0.75, "p75")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet) {
      assert(math.abs(got(k)._1 - want(k)._1) <= 1e-9 * math.abs(want(k)._1))
      assert(math.abs(got(k)._2 - want(k)._2) <= 1e-9 * math.abs(want(k)._2))
    }
  }

  test("maxGroups guard fails loud on high-cardinality grouping keys") {
    // The driver-enumerable-groups contract is enforced, not advisory:
    // a per-row key (the q_cadence round-11 flaw) must throw BEFORE any
    // unbounded collect, with an error naming the right alternative.
    val rows: Seq[(String, java.lang.Double)] = (0 until 500).map { i =>
      (s"k$i", java.lang.Double.valueOf(i.toDouble))
    }
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.quantiles(mkDf(rows), Seq("g"),
        Seq(Req("v", 0.5, "med")), maxGroups = 100)
    }
    assert(e.getMessage.contains("maxGroups"))
    assert(e.getMessage.contains("percentile"))
    // at the default cap the same data passes
    val ok = ExactQuantiles.quantiles(mkDf(rows), Seq("g"),
      Seq(Req("v", 0.5, "med")))
    assert(ok.count() == 500)
  }
}
