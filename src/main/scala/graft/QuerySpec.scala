package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2: a pure DataFrame program plus
  * (when SQL-expressible) a DuckDB oracle twin the driver hash-compares
  * against. Column names and value determinism must match exactly — see
  * `Det` for the discipline (decimal-exact sums, explicit total-order
  * sorts, NULLS FIRST, rounding only for transcendentals).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  /** Non-oracle-able query (driver records a weaker rows-only check). */
  def smoke(name: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
