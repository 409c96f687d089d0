package graft.operators

import graft.{LsdDb, QuerySpec}
import graft.functions.Det
import graft.functions.Det.{sql => D}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.sql.Column

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

  /** Split-INT64 exact sums for products of cent-scaled measures —
    * the decimal-free determinism path shared by q_corr_matrix and
    * q_agg_stats. A product of two ≤2^24 cent values is ≤2^48; summed
    * naively it overflows INT64 within ~2^15 rows, so each term is
    * split `p = a·2^40 + b·2^20 + c` into three INT64 sums (headroom
    * n < 2^43 rows, well past 100 TB of lineitem; beyond that fall
    * back to decimal sums) and recombined in double with power-of-two
    * multipliers, which both engines evaluate identically.
    *
    * NON-NEGATIVE terms only: Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, so the split identity diverges below
    * zero. Every current term is a product of cent-scaled TPC-H
    * measures (all ≥ 0); a signed reuse must offset first. */
  private object SplitSums {
    val hiDiv: Long = 1L << 40
    val midDiv: Long = 1L << 20
    def aggsSql(prodE: String, pfx: String): Seq[String] = Seq(
      s"SUM(($prodE) // $hiDiv) AS ${pfx}h",
      s"SUM((($prodE) // $midDiv) % $midDiv) AS ${pfx}m",
      s"SUM(($prodE) % $midDiv) AS ${pfx}l")
    def aggs(prodE: String, pfx: String): Seq[Column] = Seq(
      sum(expr(s"($prodE) div $hiDiv")).as(s"${pfx}h"),
      sum(expr(s"(($prodE) div $midDiv) % $midDiv")).as(s"${pfx}m"),
      sum(expr(s"($prodE) % $midDiv")).as(s"${pfx}l"))
    def totalSql(pfx: String): String =
      s"(${hiDiv.toDouble} * CAST(${pfx}h AS DOUBLE) + " +
        s"${midDiv.toDouble} * CAST(${pfx}m AS DOUBLE) + " +
        s"CAST(${pfx}l AS DOUBLE))"
    def total(pfx: String): Column =
      lit(hiDiv.toDouble) * col(s"${pfx}h").cast(DoubleType) +
        lit(midDiv.toDouble) * col(s"${pfx}m").cast(DoubleType) +
        col(s"${pfx}l").cast(DoubleType)
  }

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

  /** A3 — count distinct (expands to a two-phase distinct aggregate;
    * exact, unlike HLL, so it stays oracle-checkable). */
  val qAggDistinct: QuerySpec = QuerySpec(
    "q_agg_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** A5 — histogram / binning, the canonical reference kernel use-case
    * (CMD and sky-density maps were built exactly this way). 2-D
    * binning: price bucket × order year. */
  val qHistogram: QuerySpec = QuerySpec(
    "q_histogram",
    s"""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket,
       |  year(o_orderdate) AS y,
       |  count(*) AS cnt,
       |  ${D.dsum("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY 1, 2
       |ORDER BY price_bucket, y""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "orders")
      .groupBy(
        floor(col("o_totalprice") / 50000).as("price_bucket"),
        year(col("o_orderdate")).cast(LongType).as("y"))
      .agg(count(lit(1)).as("cnt"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("price_bucket", "y")
  }

  /** A6 — rollup with grouping id (subtotal rows have NULL keys →
    * NULLS FIRST ordering spelled out on both sides). */
  val qRollup: QuerySpec = QuerySpec(
    "q_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast(LongType).as("gid"), count(lit(1)).as("cnt"))
      .select("l_returnflag", "l_linestatus", "gid", "cnt")
      .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** A7 — stddev/variance/correlation from exact order-independent
    * sums rather than the engines' streaming moment kernels (whose
    * merge order differs between Spark and DuckDB). Sums run on the
    * [[SplitSums]] integer-cents path (see q_corr_matrix: measures
    * are exact 2-decimal values, so round(x·100) is an exact BIGINT
    * and the whole partial+final pass is primitive-long codegen — the
    * decimal(38,8) form cost 2.4 s of the sf0.1 bench in per-row
    * BigDecimal casts). Variance de-scales by the exact factor 10⁴
    * (one double division, engine-identical); corr is scale-
    * invariant; every output is d6-snapped per the FMA rule. */
  val qAggStats: QuerySpec = {
    val aggsSql = (Seq("SUM(x0) AS s0", "SUM(x1) AS s1") ++
      SplitSums.aggsSql("x0 * x0", "q0") ++
      SplitSums.aggsSql("x1 * x1", "q1") ++
      SplitSums.aggsSql("x0 * x1", "p0")).mkString(",\n       |    ")
    val (nD, s0, s1) = ("CAST(n AS DOUBLE)", "CAST(s0 AS DOUBLE)",
      "CAST(s1 AS DOUBLE)")
    val (q0, q1, p0) = (SplitSums.totalSql("q0"), SplitSums.totalSql("q1"),
      SplitSums.totalSql("p0"))
    val varCents = s"(($q0 - ($s0 * $s0) / $nD) / ($nD - 1.0))"
    QuerySpec(
      "q_agg_stats",
      s"""WITH c AS (SELECT l_returnflag,
         |    CAST(round(l_quantity * 100) AS BIGINT) AS x0,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x1
         |  FROM lineitem),
         |s AS (SELECT l_returnflag, count(*) AS n,
         |    $aggsSql
         |  FROM c GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  ${D.d6(s"$varCents / 10000.0")} AS var_qty,
         |  ${D.d6(s"sqrt($varCents) / 100.0")} AS std_qty,
         |  ${D.d6(s"($p0 - ($s0 * $s1) / $nD) / " +
            s"sqrt(($q0 - ($s0 * $s0) / $nD) * ($q1 - ($s1 * $s1) / $nD))")}
         |    AS corr_qty_price,
         |  n AS n_rows
         |FROM s ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val aggs = Seq(count(lit(1)).as("n"),
        sum(col("x0")).as("s0"), sum(col("x1")).as("s1")) ++
        SplitSums.aggs("x0 * x0", "q0") ++
        SplitSums.aggs("x1 * x1", "q1") ++
        SplitSums.aggs("x0 * x1", "p0")
      def d(c: Column) = c.cast(DoubleType)
      val (nD, s0, s1) = (d(col("n")), d(col("s0")), d(col("s1")))
      val (q0, q1, p0) = (SplitSums.total("q0"), SplitSums.total("q1"),
        SplitSums.total("p0"))
      val varCents = (q0 - (s0 * s0) / nD) / (nD - lit(1.0))
      LsdDb.table(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast(LongType).as("x0"),
          round(col("l_extendedprice") * 100).cast(LongType).as("x1"))
        .groupBy("l_returnflag")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("l_returnflag"),
          Det.d6(varCents / lit(10000.0)).as("var_qty"),
          Det.d6(sqrt(varCents) / lit(100.0)).as("std_qty"),
          Det.d6((p0 - (s0 * s1) / nD) /
            sqrt((q0 - (s0 * s0) / nD) * (q1 - (s1 * s1) / nD)))
            .as("corr_qty_price"),
          col("n").as("n_rows"))
        .orderBy("l_returnflag")
    }
  }

  /** A8 — collect_list (reference analog: per-object detection lists
    * from kernel regrouping). array_sort makes the list canonical, and
    * the list is serialized to a comma-joined string because the
    * driver's comparator cannot hash array cells.
    *
    * Bench envelope: floor 0.43 s; an r15 full-bench run measured
    * 1.18 s (2.7× flag) but the isolation A/B (QueryProfile, cold+2
    * warm) came back 0.60–0.70 s warm on identical code — inside the
    * 1.5×+0.3 s gate, so the flag was sibling-load variance on this
    * ObjectHashAggregate line (list buffers are allocation-heavy and
    * GC-sensitive to co-running JVMs). */
  val qAggCollect: QuerySpec = QuerySpec(
    "q_agg_collect",
    """SELECT o_custkey,
      |  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(array_join(transform(array_sort(collect_list(col("o_orderkey"))),
          _.cast(StringType)), ",").as("orderkeys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  /** A9 — exact median. NOT Spark's `median` aggregate: that buffers
    * each group's whole value multiset in executor memory, which on a
    * 3-value grouping key is per-group state linear in table size —
    * the one plan in the registry that would OOM at 100×. Instead the
    * scale-safe iterative histogram rank-select
    * ([[graft.functions.ExactQuantiles]]): O(bins) executor state per
    * group, 2–3 scans, bit-identical interpolation (h = p(n−1),
    * lo + (hi−lo)·frac — DuckDB's own formula). */
  val qAggMedian: QuerySpec = QuerySpec(
    "q_agg_median",
    """SELECT l_returnflag,
      |  median(l_quantity) AS med_qty,
      |  median(l_extendedprice) AS med_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import graft.functions.ExactQuantiles
    ExactQuantiles.quantiles(
      LsdDb.table(s, dir, "lineitem"), Seq("l_returnflag"),
      Seq(ExactQuantiles.Req("l_quantity", 0.5, "med_qty"),
        ExactQuantiles.Req("l_extendedprice", 0.5, "med_price")))
      .orderBy("l_returnflag")
  }

  /** A6b — cube (all grouping-set combinations). */
  val qCube: QuerySpec = QuerySpec(
    "q_cube",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast(LongType).as("gid"), count(lit(1)).as("cnt"))
      .select("l_returnflag", "l_linestatus", "gid", "cnt")
      .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Pivot — keyed aggregation spread across columns (kernel-
    * expressible in the reference; Spark `groupBy().pivot()`, oracle
    * via conditional aggregation). Pivot values are pinned explicitly
    * so the plan needs no discovery pass and stays scale-stable. */
  val qPivot: QuerySpec = QuerySpec(
    "q_pivot",
    s"""SELECT l_returnflag,
       |  ${D.dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
       |  ${D.dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O,
       |  ${D.dsum("CASE WHEN l_linestatus = 'P' THEN l_quantity END")} AS P
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O", "P"))
      .agg(Det.dsum(col("l_quantity")))
      .orderBy("l_returnflag")
  }

  /** Unpivot / melt — wide→long reshaping (Dataset.unpivot; oracle via
    * UNION ALL). */
  val qUnpivot: QuerySpec = QuerySpec(
    "q_unpivot",
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
      |FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
      |FROM part
      |ORDER BY p_partkey, metric""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "value")
      .orderBy("p_partkey", "metric")
  }

  /** Deterministic content-addressed sampling: md5-prefix threshold
    * instead of RNG — reproducible across engines, partitionings and
    * reruns (rand()-based TABLESAMPLE is none of those), and exactly
    * the pattern for sampling a 100 TB corpus without coordination
    * (~10%: first two hex digits < '1a' ⇔ 26/256). */
  val qSample: QuerySpec = QuerySpec(
    "q_sample",
    s"""SELECT count(*) AS n_sampled,
       |  ${D.dsum("l_extendedprice")} AS sum_price,
       |  count(DISTINCT l_orderkey) AS n_orders
       |FROM lineitem
       |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
       |             CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "lineitem")
      .filter(substring(md5(concat(
        col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).cast("binary")), 1, 2) < "1a")
      .agg(count(lit(1)).as("n_sampled"),
        Det.dsum(col("l_extendedprice")).as("sum_price"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** A9b — exact quartiles via the same scale-safe rank-select engine
    * as [[qAggMedian]] (one stats scan + one histogram scan covers all
    * three quartiles of the column; Spark's buffering `percentile`
    * would hold each group's multiset in memory). d6-snap covers the
    * final interpolation ulp, as before. */
  val qPercentiles: QuerySpec = QuerySpec(
    "q_percentiles",
    s"""SELECT l_returnflag,
       |  ${D.d6("quantile_cont(l_extendedprice, 0.25)")} AS p25,
       |  ${D.d6("quantile_cont(l_extendedprice, 0.50)")} AS p50,
       |  ${D.d6("quantile_cont(l_extendedprice, 0.75)")} AS p75
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import graft.functions.ExactQuantiles
    ExactQuantiles.quantiles(
      LsdDb.table(s, dir, "lineitem"), Seq("l_returnflag"),
      Seq(ExactQuantiles.Req("l_extendedprice", 0.25, "p25"),
        ExactQuantiles.Req("l_extendedprice", 0.50, "p50"),
        ExactQuantiles.Req("l_extendedprice", 0.75, "p75")))
      .select(col("l_returnflag"), Det.d6(col("p25")).as("p25"),
        Det.d6(col("p50")).as("p50"), Det.d6(col("p75")).as("p75"))
      .orderBy("l_returnflag")
  }

  /** A9c — robust per-group outlier screen via MAD (median absolute
    * deviation): med = median(v), mad = median(|v − med|), outlier ⇔
    * |v − med| > 3σ-equivalent (3 × 1.4826 = 4.4478 × mad). The
    * survey's variability/artifact cut where mean/stddev clipping
    * (q_sigma_clip) is itself dragged by the outliers it should
    * reject. Both medians run through ExactQuantiles — O(bins)
    * executor state, never a row-linear buffer — and attach back as
    * broadcast O(groups) maps, so the corpus passes map-only except
    * the final keyed agg. Exactness: medians are bit-identical to
    * quantile_cont (ExactQuantiles contract), |v−med| and the 4.4478
    * product are single-op IEEE chains — no FMA hazard — so the
    * outlier comparison is engine-identical; emitted med/mad are
    * d6-snapped for the hash. */
  val qOutlierMad: QuerySpec = QuerySpec(
    "q_outlier_mad",
    s"""WITH t AS (SELECT l_returnflag AS flag, l_extendedprice AS v
       |  FROM lineitem),
       |m AS (SELECT flag, median(v) AS med FROM t GROUP BY flag),
       |d AS (SELECT t.flag, v, med, abs(v - med) AS ad
       |  FROM t JOIN m USING (flag)),
       |md AS (SELECT flag, median(ad) AS mad FROM d GROUP BY flag)
       |SELECT d.flag, count(*) AS n,
       |  ${D.d6("max(d.med)")} AS med,
       |  ${D.d6("max(md.mad)")} AS mad,
       |  count(CASE WHEN ad > 4.4478 * mad THEN 1 END) AS n_out
       |FROM d JOIN md USING (flag)
       |GROUP BY d.flag ORDER BY d.flag""".stripMargin) { (s, dir) =>
    import graft.functions.ExactQuantiles
    val t = LsdDb.table(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
    val med = ExactQuantiles.quantiles(t, Seq("flag"),
      Seq(ExactQuantiles.Req("v", 0.5, "med")))
    val d = t.join(broadcast(med), Seq("flag"))
      .withColumn("ad", abs(col("v") - col("med")))
    val mad = ExactQuantiles.quantiles(d, Seq("flag"),
      Seq(ExactQuantiles.Req("ad", 0.5, "mad")))
    d.join(broadcast(mad), Seq("flag"))
      .groupBy("flag")
      .agg(count(lit(1)).as("n"),
        Det.d6(max(col("med"))).as("med"),
        Det.d6(max(col("mad"))).as("mad"),
        count(when(col("ad") > lit(4.4478) * col("mad"), 1)).as("n_out"))
      .orderBy("flag")
  }

  /** A8b — string aggregation (sorted for canonical form). */
  val qStringAgg: QuerySpec = QuerySpec(
    "q_string_agg",
    """SELECT n_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names,
      |  count(*) AS n_cust
      |FROM nation JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "nation")
      .join(LsdDb.table(s, dir, "customer"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_nationkey")
      .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("names"),
        count(lit(1)).as("n_cust"))
      .orderBy("n_nationkey")
  }

  /** A1b — SALTED two-phase aggregation (Skew.saltedAggregate) under
    * the oracle gate: lineitem grouped by l_returnflag — 3 keys over
    * 60k+ rows, a genuinely hot-key aggregation — with a 16-way
    * deterministic salt spreading phase 1. The phase-1 partials stay
    * DECIMAL (exact, associative), so the phase-2 merge is provably
    * salt-independent and hash-matches the oracle's plain GROUP BY —
    * demonstrating that the skew-mitigation path changes the shuffle
    * layout, never the answer. */
  val qAggSalted: QuerySpec = QuerySpec(
    "q_agg_salted",
    s"""SELECT l_returnflag,
       |  ${D.dsum("l_extendedprice")} AS sum_price,
       |  count(*) AS n
       |FROM lineitem GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    Skew.saltedAggregate(
      LsdDb.table(s, dir, "lineitem"),
      keys = Seq("l_returnflag"), buckets = 16,
      saltFrom = Seq("l_orderkey"),
      partial = Seq(
        // decimal(18,8) per Det's scale rules; partials NOT cast back
        // to double — exactness through the merge is the point
        sum(col("l_extendedprice").cast(DecimalType(18, 8))).as("ps"),
        count(lit(1)).as("pc")),
      merge = Seq(
        sum(col("ps")).cast(DoubleType).as("sum_price"),
        sum(col("pc")).as("n")))
      .orderBy("l_returnflag")
  }

  /** A5b — EQUI-DEPTH histogram (quartile buckets): the statistics a
    * planner or data-profiler actually wants — bucket BOUNDARIES from
    * the data's own quantiles, then per-bucket count + exact mass.
    * Complements q_histogram's fixed-width bins: equal-width bins go
    * empty/overfull under skew, equal-depth bins adapt.
    *
    * Cuts come from ExactQuantiles (O(bins) executor state, the
    * quantile_cont-bit-identical contract q_percentiles pins) and
    * attach back as a broadcast O(groups) dimension; bucket
    * assignment is a CASE chain over identical doubles, so bucket
    * membership is engine-identical and the UNSNAPPED cuts do the
    * comparing while only the EMITTED cuts are d6-snapped. Two corpus
    * passes (quantile refinement + bucketing) — the price of exact
    * equi-depth at any scale; nothing is row-linear on any executor. */
  val qHistogramEqdepth: QuerySpec = QuerySpec(
    "q_histogram_eqdepth",
    s"""WITH c AS (SELECT l_returnflag AS flag,
       |    quantile_cont(l_extendedprice, 0.25) AS p25,
       |    quantile_cont(l_extendedprice, 0.50) AS p50,
       |    quantile_cont(l_extendedprice, 0.75) AS p75
       |  FROM lineitem GROUP BY 1),
       |b AS (SELECT c.flag,
       |    CASE WHEN l_extendedprice <= p25 THEN 0
       |         WHEN l_extendedprice <= p50 THEN 1
       |         WHEN l_extendedprice <= p75 THEN 2 ELSE 3 END AS bucket,
       |    l_extendedprice AS v, p25, p50, p75
       |  FROM lineitem t JOIN c ON t.l_returnflag = c.flag)
       |SELECT flag, bucket, count(*) AS n, ${D.dsum("v")} AS total,
       |  ${D.d6("min(p25)")} AS cut25, ${D.d6("min(p50)")} AS cut50,
       |  ${D.d6("min(p75)")} AS cut75
       |FROM b GROUP BY flag, bucket ORDER BY flag, bucket""".stripMargin) {
    (s, dir) =>
    import graft.functions.ExactQuantiles
    val cuts = ExactQuantiles.quantiles(
      LsdDb.table(s, dir, "lineitem"), Seq("l_returnflag"),
      Seq(ExactQuantiles.Req("l_extendedprice", 0.25, "p25"),
        ExactQuantiles.Req("l_extendedprice", 0.50, "p50"),
        ExactQuantiles.Req("l_extendedprice", 0.75, "p75")))
    val v = col("l_extendedprice")
    val bucket = when(v <= col("p25"), 0)
      .when(v <= col("p50"), 1)
      .when(v <= col("p75"), 2).otherwise(3)
    LsdDb.table(s, dir, "lineitem")
      .join(broadcast(cuts), "l_returnflag")
      .select(col("l_returnflag").as("flag"), bucket.as("bucket"),
        v.as("v"), col("p25"), col("p50"), col("p75"))
      .groupBy("flag", "bucket")
      .agg(count(lit(1)).as("n"), Det.dsum(col("v")).as("total"),
        Det.d6(min(col("p25"))).as("cut25"),
        Det.d6(min(col("p50"))).as("cut50"),
        Det.d6(min(col("p75"))).as("cut75"))
      .orderBy("flag", "bucket")
  }

  /** A10 — full pairwise correlation MATRIX in ONE scan: all 6 pairs
    * of 4 lineitem measures through a single aggregation (the sums,
    * squares and cross-products partial-aggregate map-side together),
    * reshaped to (col_a, col_b, corr) rows by `stack` over the one
    * aggregated row. A per-pair-query formulation would scan the
    * table six times for the same answer.
    *
    * Exactness WITHOUT decimal: every measure is an exact 2-decimal
    * value (cents), so `round(x*100)` is an exact BIGINT and every
    * sum/square/cross-product is pure integer arithmetic — order-
    * independent under any shuffle (the determinism decimal sums buy)
    * at primitive-long codegen speed (the decimal(38,8) form spent
    * 4.6 s of the sf0.1 bench in per-row BigDecimal casts; this is
    * sub-second). Squares/products of cents reach ~1.1e14 ≈ 2^47 per
    * term, so row sums would overflow INT64 — each is SPLIT three
    * ways, `p = a·2^40 + b·2^20 + c`, and the three partial sums
    * recombine in double with power-of-two multipliers. Overflow
    * headroom: a ≤ 2^7, b,c < 2^20, so every split sum stays in
    * INT64 up to n < 2^43 rows (~8.8e12 — three orders past the
    * 100 TB lineitem); beyond that this operator must fall back to
    * decimal sums, which is the documented trade. Pearson is scale-
    * invariant, so corr over cents = corr over units up to IEEE
    * rounding, and the output is d6-snapped like every mul-add chain
    * (FMA rule, functions/Det.scala). Generated from the column list
    * so the pair set and both engines' expressions cannot drift. */
  val qCorrMatrix: QuerySpec = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    def cIdx(c: String): Int = cols.indexOf(c)
    // SQL side: cents CTE, split integer sums, double recombination
    val centsSql = cols.zipWithIndex
      .map { case (c, i) => s"CAST(round($c * 100) AS BIGINT) AS x$i" }
      .mkString(", ")
    val colAggsSql = cols.indices.flatMap { i =>
      s"SUM(x$i) AS s$i" +: SplitSums.aggsSql(s"x$i * x$i", s"q$i")
    }
    val pairAggsSql = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val (i, j) = (cIdx(a), cIdx(b))
      SplitSums.aggsSql(s"x$i * x$j", s"p$k")
    }
    def dSql(e: String) = s"CAST($e AS DOUBLE)"
    def corrSql(k: Int, a: String, b: String): String = {
      val (i, j) = (cIdx(a), cIdx(b))
      val n = dSql("n")
      val (sa, sb) = (dSql(s"s$i"), dSql(s"s$j"))
      val sp = SplitSums.totalSql(s"p$k")
      val qa = SplitSums.totalSql(s"q$i")
      val qb = SplitSums.totalSql(s"q$j")
      D.d6(s"($sp - ($sa * $sb) / $n) / " +
        s"sqrt(($qa - ($sa * $sa) / $n) * ($qb - ($sb * $sb) / $n))")
    }
    val sqlRows = pairs.zipWithIndex.map { case ((a, b), k) =>
      s"SELECT '$a' AS col_a, '$b' AS col_b, ${corrSql(k, a, b)} AS corr FROM s" }
      .mkString("\n       |  UNION ALL ")
    QuerySpec(
      "q_corr_matrix",
      s"""WITH c AS (SELECT $centsSql FROM lineitem),
         |s AS (SELECT count(*) AS n,
         |    ${(colAggsSql ++ pairAggsSql).mkString(",\n         |    ")}
         |  FROM c)
         |SELECT col_a, col_b, corr FROM (
         |  $sqlRows)
         |ORDER BY col_a, col_b""".stripMargin) { (s, dir) =>
      val cents = cols.zipWithIndex.map { case (c, i) =>
        round(col(c) * 100).cast(LongType).as(s"x$i") }
      def x(i: Int) = col(s"x$i")
      val colAggs = cols.indices.flatMap { i =>
        sum(x(i)).as(s"s$i") +: SplitSums.aggs(s"x$i * x$i", s"q$i")
      }
      val pairAggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
        val (i, j) = (cIdx(a), cIdx(b))
        SplitSums.aggs(s"x$i * x$j", s"p$k")
      }
      def d(c: Column) = c.cast(DoubleType)
      def corrCol(k: Int, a: String, b: String): Column = {
        val (i, j) = (cIdx(a), cIdx(b))
        val n = d(col("n"))
        val (sa, sb) = (d(col(s"s$i")), d(col(s"s$j")))
        val sp = SplitSums.total(s"p$k")
        val qa = SplitSums.total(s"q$i")
        val qb = SplitSums.total(s"q$j")
        Det.d6((sp - (sa * sb) / n) /
          sqrt((qa - (sa * sa) / n) * (qb - (sb * sb) / n)))
      }
      val allAggs = count(lit(1)).as("n") +: (colAggs ++ pairAggs)
      val stackArgs = pairs.zipWithIndex.map { case ((a, b), k) =>
        s"'$a', '$b', c$k" }.mkString(", ")
      LsdDb.table(s, dir, "lineitem")
        .select(cents: _*)
        .agg(allAggs.head, allAggs.tail: _*)
        .select(pairs.zipWithIndex.map { case ((a, b), k) =>
          corrCol(k, a, b).as(s"c$k") }: _*)
        .select(expr(s"stack(${pairs.length}, $stackArgs) " +
          "AS (col_a, col_b, corr)"))
        .orderBy("col_a", "col_b")
    }
  }

  def specs: Seq[QuerySpec] = Seq(qAggBasic, qAggGlobal, qAggDistinct,
    qHistogram, qRollup, qAggStats, qAggCollect, qAggMedian, qCube,
    qPivot, qUnpivot, qSample, qPercentiles, qStringAgg, qAggSalted,
    qOutlierMad, qHistogramEqdepth, qCorrMatrix)
}
