package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal partitioning — the reference's per-epoch sub-cells
  * (each spatial cell split into MJD-range temporal cells, plus a
  * static t=∞ cell; SURVEY.md §1.1, ref `lsd/table.py`, UNVERIFIED).
  *
  * Spark-native: the time bucket is a directory partition column
  * (`t_bucket=…/`), so time-footprint queries prune directories, and
  * `sortWithinPartitions(ts)` gives row-group min/max pruning inside
  * a bucket. Combine with SpatialWriter's `cell` column for the full
  * (sky × time) grid: `.partitionBy("cell", "t_bucket")`.
  */
object TimeWriter {
  private val granularities = Set("hour", "day", "week", "month", "year")

  def write(df: DataFrame, tsCol: String, granularity: String, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(granularities.contains(granularity),
      s"granularity must be one of $granularities")
    df.withColumn("t_bucket",
        date_trunc(granularity, col(tsCol)).cast("date"))
      .repartition(col("t_bucket"))
      .sortWithinPartitions(tsCol)
      .write.mode(mode)
      .partitionBy("t_bucket")
      .parquet(path)
  }

  /** Time-bounded read: the bucket predicate prunes directories, the
    * exact predicate prunes row groups and rows. `granularity` must
    * match the one the table was written with (a bucket's rows reach
    * back to its truncated start, so the lower directory bound is the
    * bucket of `fromIncl` itself). */
  def readRange(spark: SparkSession, path: String, tsCol: String,
                granularity: String, fromIncl: String,
                toExcl: String): DataFrame = {
    require(granularities.contains(granularity),
      s"granularity must be one of $granularities")
    val from = to_timestamp(lit(fromIncl))
    val to = to_timestamp(lit(toExcl))
    // upper directory bound is INCLUSIVE of toExcl's own bucket: a
    // non-midnight-aligned toExcl (e.g. '…-15 12:00') still has rows
    // in bucket '…-15'; the exact `ts < to` row filter below makes the
    // wider directory bound safe.
    spark.read.parquet(path)
      .filter(col("t_bucket") >= date_trunc(granularity, from).cast("date") &&
        col("t_bucket") <= date_trunc(granularity, to).cast("date"))
      .filter(col(tsCol) >= from && col(tsCol) < to)
  }
}
