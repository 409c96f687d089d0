package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** X4 — the Scala-UDF extension surface (reference analog: LSD's
  * builtin astro query functions like gal↔equ conversion,
  * `lsd/builtins/`, UNVERIFIED). Haversine great-circle distance is
  * the canonical example: pure double math, usable both as a plain
  * Scala function and a registered UDF.
  *
  * A UDF is a codegen boundary — fine for genuinely scalar math like
  * this, but anything expressible as built-in `functions._` should
  * stay an expression tree (see TextOps/VectorOps, which use none).
  */
object Haversine {
  val EarthRadiusKm = 6371.0

  def distanceKm(lat1: Double, lon1: Double,
                 lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * EarthRadiusKm * math.asin(math.sqrt(a))
  }

  /** Deterministic scalar UDF (no nulls in, no nulls out). */
  val udfKm: UserDefinedFunction = udf(distanceKm _)
}
