package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two places it doesn't:
  *
  *  - [[saltedAggregate]]: a single monster key funnels its whole
  *    group through one reducer in `groupBy(k).agg(...)`. Salting
  *    splits each key into `buckets` sub-groups (partial combine per
  *    sub-group), then merges — turning one hot reducer into
  *    `buckets` even ones. Only algebraic aggregates (re-mergeable)
  *    are supported; pass the partial and merge forms explicitly.
  *
  *  - [[saltedBroadcastJoin]]: replicating the small side `buckets`
  *    times with a salt column lets a skewed large side spread a hot
  *    join key over `buckets` tasks even in a shuffle join.
  *
  * The salt column is derived from a hash of stable columns — NOT
  * rand() — so results stay deterministic/replayable (the same
  * discipline the oracle queries follow).
  */
object Skew {

  /** Two-phase aggregation with deterministic salting.
    *
    * @param saltFrom columns whose hash spreads rows across sub-groups
    *                 (use a high-cardinality stable column)
    * @param partial  aggregates for phase 1 (per key+salt)
    * @param merge    aggregates for phase 2 (re-merging phase-1 rows;
    *                 reference phase-1 output columns by alias)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      saltFrom: Seq[String],
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(buckets >= 1)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(buckets)))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Broadcast-replicate `small` across `buckets` salt values and join
    * `large` (salted deterministically on `saltFrom`) on key+salt. */
  def saltedBroadcastJoin(large: DataFrame, small: DataFrame,
                          keyLarge: String, keySmall: String,
                          buckets: Int, saltFrom: Seq[String]): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedLarge.join(broadcast(replicated),
      saltedLarge(keyLarge) === replicated(keySmall) &&
        saltedLarge("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
