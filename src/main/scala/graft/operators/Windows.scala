package graft.operators

import graft.{LsdDb, QuerySpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** §2F — window functions.
  *
  * Absent from the reference's query language; its moral equivalent
  * was per-object ordered processing inside map/reduce kernels
  * (light-curve analysis over detections sorted by epoch; SURVEY.md
  * §2F, UNVERIFIED). Spark-native: `Window.partitionBy(key).orderBy
  * (time)` — one shuffle by key, then a sorted in-partition scan,
  * which is exactly the regroup-then-iterate dataflow the kernels
  * hand-rolled.
  *
  * Determinism: window ORDER BY always ends in a unique tie-break
  * column, and windowed float sums go through decimal(28,8) because
  * DuckDB evaluates frame aggregates with a segment tree (different
  * addition order than Spark's running accumulator).
  */
object Windows {

  /** W1 — ranking functions. */
  val qWindowRank: QuerySpec = QuerySpec(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  CAST(rank() OVER w2 AS INT) AS rnk,
      |  CAST(dense_rank() OVER w2 AS INT) AS drnk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
      |       w2 AS (PARTITION BY o_custkey ORDER BY year(o_orderdate))
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val w2 = Window.partitionBy("o_custkey").orderBy(year(col("o_orderdate")))
    LsdDb.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w2).as("rnk"),
        dense_rank().over(w2).as("drnk"))
      .orderBy("o_custkey", "rn")
  }

  /** W2 — lag/lead (reference analog: detection-to-detection deltas
    * along a light curve). */
  val qWindowLag: QuerySpec = QuerySpec(
    "q_window_lag",
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |  lag(value) OVER w AS prev_value,
      |  lead(value) OVER w AS next_value,
      |  value - lag(value) OVER w AS delta,
      |  CAST(datediff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
      |                CAST(ts AS TIMESTAMP)) AS BIGINT) AS gap_sec
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    LsdDb.table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_sec"))
      .orderBy("event_id")
  }

  /** W3 — frame aggregates: running total + moving average. */
  val qWindowFrame: QuerySpec = QuerySpec(
    "q_window_frame",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |       AS DOUBLE) AS running_total,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |    AS moving_avg3
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val ord = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wRun = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = ord.rowsBetween(-2, Window.currentRow)
    val dec = col("o_totalprice").cast(DecimalType(28, 8))
    LsdDb.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum(dec).over(wRun).cast(DoubleType).as("running_total"),
        (sum(dec).over(wMov).cast(DoubleType) / count(lit(1)).over(wMov))
          .as("moving_avg3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W1b — distribution window functions (ntile / percent_rank /
    * cume_dist): exact integer-ratio doubles, oracle-stable. */
  val qWindowNtile: QuerySpec = QuerySpec(
    "q_window_ntile",
    """SELECT o_orderkey, o_custkey,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY year(o_orderdate)
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    // partitioned by year: a global (unpartitioned) window funnels the
    // whole table through one task — the anti-pattern at scale
    val w = Window.partitionBy(year(col("o_orderdate")))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    LsdDb.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy("o_orderkey")
  }

  /** W3b — RANGE frame (value peers, not row counts): per customer,
    * count and exact-sum the orders whose key lies within 5 of the
    * current order's key — the frame is defined by the ORDER BY
    * VALUE, so ties and gaps behave differently from a ROWS frame
    * (peers enter together; missing values shrink the frame). Integer
    * range bounds on a BIGINT ordering — exact in both engines. */
  val qWindowRange: QuerySpec = QuerySpec(
    "q_window_range",
    """SELECT o_custkey, o_orderkey,
      |  count(*) OVER w AS n_near,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8))) OVER w AS DOUBLE)
      |    AS sum_near
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |             RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
      .rangeBetween(-5, 5)
    LsdDb.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_near"),
        sum(col("o_totalprice").cast(DecimalType(28, 8))).over(w)
          .cast(DoubleType).as("sum_near"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** W5 — rolling MEDIAN (order-statistic smoothing): per-user value
    * median over the trailing 5-row frame ordered by time — the
    * median-filter detrending pass survey photometry runs before
    * variability statistics (robust to single-epoch outliers where a
    * rolling mean is not). Spark evaluates the aggregate `percentile`
    * over the moving frame with bounded per-frame buffering; for
    * even frames DuckDB's quantile_cont returns (lo+hi)/2,
    * bit-identical to Percentile's 0.5·lo + 0.5·hi — NOT the
    * textbook lerp lo + (hi−lo)·0.5, which is 1 ulp off on ~6% of
    * pairs (measured; the q_cadence precedent) — so no snapping is
    * needed. One shuffle on the partition key, frames never exceed
    * 5 rows. */
  val qRollingMedian: QuerySpec = QuerySpec(
    "q_rolling_median",
    """SELECT user_id, event_id, value,
      |  quantile_cont(value, 0.5) OVER (PARTITION BY user_id
      |    ORDER BY CAST(ts AS TIMESTAMP), event_id
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    LsdDb.table(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("med5", percentile(col("value"), lit(0.5)).over(w))
      .select("user_id", "event_id", "value", "med5")
      .orderBy("user_id", "event_id")
  }

  /** W1-W3 through the QL surface — the same OVER clauses users write
    * in [[graft.ql.LsdQL]] queries, proving the QL window path
    * (SQL-over-temp-view, exact SQL evaluation order) end-to-end
    * under the oracle, not just in specs. The QL text IS SQL-shaped,
    * so the oracle is near-verbatim; the thing under test is that the
    * QL evaluator routes it through Catalyst identically. Decimal
    * frame sum per the file-level determinism note. Plan: identical
    * to the DataFrame twins — one shuffle on o_custkey serves both
    * window specs (same partition key), no extra exchange from QL. */
  val qQlWindow: QuerySpec = QuerySpec(
    "q_ql_window",
    """SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS running_total
      |FROM orders
      |WHERE o_totalprice > 50000
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val ql = graft.ql.LsdQL.forDb(graft.LsdDb(s, dir))
    ql.query(
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_total
        |FROM orders
        |WHERE o_totalprice > 50000
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** QL QUALIFY under the oracle — top-2 orders per customer through
    * the named-WINDOW + QUALIFY surface (the top-k-per-group idiom a
    * survey user writes daily). The QL evaluator lowers QUALIFY to a
    * projection + filter (Spark has no native clause); the oracle is
    * DuckDB's NATIVE QUALIFY, so the lowering is hash-checked against
    * a reference implementation of the clause, not against itself.
    * Plan (pinned in PlanQualitySpec): Spark's InferWindowGroupLimit
    * recognizes the lowered Filter-over-row_number shape and inserts
    * Partial+Final WindowGroupLimit — per-group top-k runs MAP-SIDE
    * before the one o_custkey shuffle, so at 100 TB the exchange
    * carries ≤ k rows per group per input partition, not the table. */
  val qQlTopk: QuerySpec = QuerySpec(
    "q_ql_topk",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER w AS INT) AS rn
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey)
      |QUALIFY rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val ql = graft.ql.LsdQL.forDb(graft.LsdDb(s, dir))
    ql.query(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin)
  }

  /** QL derived tables under the oracle: an inline subquery joined to
    * a base table through a JoinDef naming its alias, then aggregated
    * — the FROM-subquery spelling a SQL user reaches for before
    * learning WITH. The oracle is DuckDB's native derived-table join.
    * Plan: the derived filter pushes into the orders scan
    * (PushedFilters), the join broadcasts customer — identical
    * physical shape to the CTE spelling. */
  val qQlDerived: QuerySpec = QuerySpec(
    "q_ql_derived",
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE) AS tot
      |FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |      WHERE o_totalprice > 150000) big
      |JOIN customer ON big.o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val db = graft.LsdDb(s, dir)
    val ql = graft.ql.LsdQL(db, graft.ql.LsdQL.standardJoins :+
      graft.ql.JoinDef("big", "o_custkey", "customer", "c_custkey"))
    ql.query(
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE) AS tot
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |      WHERE o_totalprice > 150000) big, customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  def specs: Seq[QuerySpec] = Seq(qWindowRank, qWindowLag, qWindowFrame,
    qWindowNtile, qWindowRange, qRollingMedian, qQlWindow, qQlTopk,
    qQlDerived)
}
