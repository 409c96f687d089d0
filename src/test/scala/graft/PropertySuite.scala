package graft

import graft.functions.Haversine
import graft.spatial.SkyPix
import org.scalacheck.{Gen, Prop, Properties}

/** Pure-JVM ScalaCheck properties (no SparkSession — sbt runs
  * Properties suites natively via the ScalaCheck framework).
  * SURVEY.md §5 test strategy item 3. */
object PropertySuite extends Properties("graft") {

  private val lon = Gen.choose(-720.0, 720.0)
  private val lat = Gen.choose(-90.0, 90.0)
  private val level = Gen.choose(0, 12)

  property("skypix.levelTag") = Prop.forAll(lon, lat, level) { (lo, la, lv) =>
    (SkyPix.cellId(lo, la, lv) >> 58) == lv.toLong
  }

  property("skypix.lonPeriodic") = Prop.forAll(lon, lat, level) { (lo, la, lv) =>
    SkyPix.cellId(lo, la, lv) == SkyPix.cellId(lo + 360, la, lv)
  }

  property("skypix.quadtreeNesting") = Prop.forAll(lon, lat,
    Gen.choose(1, 12)) { (lo, la, lv) =>
    val mask = ~(31L << 58)
    ((SkyPix.cellId(lo, la, lv) & mask) >> 2) ==
      (SkyPix.cellId(lo, la, lv - 1) & mask)
  }

  property("skypix.cellRange") = Prop.forAll(lon, lat, level) { (lo, la, lv) =>
    val m = SkyPix.cellId(lo, la, lv) & ~(31L << 58)
    m >= 0 && m < (1L << (2 * lv))
  }

  property("haversine.symmetric") = Prop.forAll(lon, lat, lon, lat) {
    (lo1, la1, lo2, la2) =>
      val d1 = Haversine.distanceKm(la1, lo1, la2, lo2)
      val d2 = Haversine.distanceKm(la2, lo2, la1, lo1)
      math.abs(d1 - d2) < 1e-9
  }

  property("haversine.identityAndBounds") = Prop.forAll(lon, lat) { (lo, la) =>
    val self = Haversine.distanceKm(la, lo, la, lo)
    self == 0.0 && Haversine.distanceKm(la, lo, -la, lo + 180) <=
      math.Pi * Haversine.EarthRadiusKm + 1e-6
  }

  property("haversine.triangleOnEquator") = Prop.forAll(
    Gen.choose(0.0, 90.0), Gen.choose(0.0, 90.0)) { (a0, b0) =>
    // clamp: ScalaCheck shrinking can step outside the Gen bounds, and
    // additivity only holds while a+b ≤ 180 (no short-way wraparound)
    val a = math.min(a0.abs, 90.0)
    val b = math.min(b0.abs, 90.0)
    // along the equator distances are additive
    val d1 = Haversine.distanceKm(0, 0, 0, a)
    val d2 = Haversine.distanceKm(0, a, 0, a + b)
    val d3 = Haversine.distanceKm(0, 0, 0, a + b)
    math.abs(d1 + d2 - d3) < 1e-6
  }
}
