package graft.functions

import graft.SpecBase
import org.apache.spark.sql.functions._

import scala.util.Random

class AstroCoordsSpec extends SpecBase {
  import spark.implicits._

  test("north galactic pole maps to b=90") {
    val (_, b) = AstroCoords.equToGalScala(
      AstroCoords.NgpRaDeg, AstroCoords.NgpDecDeg)
    assert(math.abs(b - 90.0) < 1e-9)
  }

  test("galactic center anchor (Sgr A*)") {
    // J2000 of Sgr A*: 17h45m40.04s, -29°00'28.1" → l≈359.944, b≈-0.046
    val (l, b) = AstroCoords.equToGalScala(266.41683, -29.00781)
    assert(math.abs(b - (-0.046)) < 0.01, s"b=$b")
    assert(math.abs(l - 359.944) < 0.01 || math.abs(l - (-0.056 + 360)) < 0.01,
      s"l=$l")
  }

  test("Column path agrees with Scala twin") {
    val rnd = new Random(5)
    val pts = (1 to 200).map(_ => (rnd.nextDouble() * 360,
      math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))))
    val rows = pts.toDF("ra", "dec")
      .select(AstroCoords.equToGal(col("ra"), col("dec")).as("g"))
      .select("g.l", "g.b").collect()
    pts.zip(rows).foreach { case ((ra, dec), r) =>
      val (l, b) = AstroCoords.equToGalScala(ra, dec)
      assert(math.abs(r.getDouble(0) - l) < 1e-9)
      assert(math.abs(r.getDouble(1) - b) < 1e-9)
    }
  }

  test("gal→equ inverts equ→gal over the sphere") {
    val rnd = new Random(6)
    val pts = (1 to 500).map(_ => (rnd.nextDouble() * 360,
      math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))))
      .filter { case (_, d) => math.abs(d) < 89.9 }
    val back = pts.toDF("ra", "dec")
      .select(col("ra"), col("dec"),
        AstroCoords.equToGal(col("ra"), col("dec")).as("g"))
      .select(col("ra"), col("dec"),
        AstroCoords.galToEqu(col("g.l"), col("g.b")).as("e"))
      .select("ra", "dec", "e.ra", "e.dec").collect()
    back.foreach { r =>
      val dRa = math.abs(r.getDouble(0) - r.getDouble(2))
      val wrapRa = math.min(dRa, 360 - dRa)
      assert(wrapRa * math.cos(math.toRadians(r.getDouble(1))) < 1e-8)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-8)
    }
  }
}
