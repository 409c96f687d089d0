package graft.operators

import graft.{LsdDb, QuerySpec}
import graft.functions.Det
import graft.functions.Det.{sql => D}
import org.apache.spark.sql.functions._

/** §2D — keyed/global aggregation. The reference had no GROUP BY in its
  * query language; all aggregation ran through map/reduce kernel chains
  * (SURVEY.md §2D, ref `lsd/pool2.py` map_reduce_chain, UNVERIFIED).
  * Spark-native equivalent is `groupBy().agg()`: Catalyst plans
  * partial (map-side) + final aggregation automatically, which is the
  * same partial-combine-then-regroup dataflow pool2 implemented with
  * temp pickle files — but codegen'd and spill-aware, and it scales to
  * a real cluster shuffle.
  */
object Aggregates {

  /** Flagship: TPC-H-Q1-style pricing summary. Scan → filter →
    * hash-agg (partial+final) → small sort. At 100 TB this is the
    * canonical map-side-combine pattern: the shuffle carries only
    * |groups| × partitions rows.
    */
  val qAggBasic: QuerySpec = QuerySpec(
    "q_agg_basic",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${D.dsum("l_quantity")} AS sum_qty,
       |  ${D.dsum("l_extendedprice")} AS sum_base_price,
       |  ${D.dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${D.dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${D.davg("l_quantity")} AS avg_qty,
       |  ${D.davg("l_extendedprice")} AS avg_price,
       |  ${D.davg("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2 — global (keyless) aggregate. */
  val qAggGlobal: QuerySpec = QuerySpec(
    "q_agg_global",
    s"""SELECT count(*) AS n_rows,
       |  ${D.dsum("l_extendedprice")} AS sum_price,
       |  CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       |  CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       |  min(l_shipdate) AS min_ship,
       |  max(l_shipdate) AS max_ship
       |FROM lineitem""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        Det.dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
  }

  def specs: Seq[QuerySpec] = Seq(qAggBasic, qAggGlobal)
}
