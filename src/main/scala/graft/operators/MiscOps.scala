package graft.operators

import graft.{LsdDb, QuerySpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Capability-parity operators beyond the round-1 inventory: the
  * remaining join shapes, subquery forms, grouping sets, arg-min/max
  * aggregates, distribution windows, regex, bitwise, null handling and
  * table-generating explode. The reference reached all of these
  * through its kernel dataflow surface (SURVEY.md §2D note: arbitrary
  * keyed map/reduce, UNVERIFIED); in Spark each is a first-class
  * Catalyst operator, so they codegen and scale like everything else.
  */
object MiscOps {

  /** J2b — full outer join: customers and suppliers per nation, both
    * sides preserved. Sort keys can be NULL → NULLS FIRST oracle sort. */
  val qJoinFull: QuerySpec = QuerySpec(
    "q_join_full",
    """SELECT cn.nationkey AS c_nation, cn.n_cust, sn.nationkey AS s_nation,
      |       sn.n_supp
      |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
      |      FROM customer WHERE c_acctbal > 9000 GROUP BY 1) cn
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nationkey, count(*) AS n_supp
      |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) sn
      |ON cn.nationkey = sn.nationkey
      |ORDER BY c_nation NULLS FIRST, s_nation NULLS FIRST""".stripMargin) { (s, dir) =>
    val cn = LsdDb.table(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = LsdDb.table(s, dir, "supplier").filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, cn("nationkey") === sn("nationkey"), "full_outer")
      .select(cn("nationkey").as("c_nation"), col("n_cust"),
        sn("nationkey").as("s_nation"), col("n_supp"))
      .orderBy(col("c_nation").asc_nulls_first, col("s_nation").asc_nulls_first)
  }

  /** J8 — cross join (cartesian product of the two smallest dims). */
  val qJoinCross: QuerySpec = QuerySpec(
    "q_join_cross",
    """SELECT r_regionkey, n_nationkey
      |FROM region CROSS JOIN nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "region").select("r_regionkey")
      .crossJoin(LsdDb.table(s, dir, "nation").select("n_nationkey"))
      .orderBy("r_regionkey", "n_nationkey")
  }

  /** Correlated EXISTS subquery — customers with at least one
    * high-value order (plans as a left-semi join; Catalyst decorrelates). */
  val qExistsSubq: QuerySpec = QuerySpec(
    "q_exists_subq",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = LsdDb.table(s, dir, "customer")
    val o = LsdDb.table(s, dir, "orders")
      .filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** A6c — explicit GROUPING SETS (the general form behind
    * rollup/cube); Spark side through spark.sql on a registered view. */
  val qGroupingSets: QuerySpec = QuerySpec(
    "q_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |                        (l_returnflag, l_linestatus))
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    // query-scoped view name: registering plain "lineitem" on the shared
    // session would leak and shadow any other spec's spark.sql usage
    LsdDb.table(s, dir, "lineitem")
      .createOrReplaceTempView("q_grouping_sets_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS cnt
        |FROM q_grouping_sets_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** A10 — arg-max/arg-min aggregates (max_by/min_by): per nation, the
    * customer with the extreme balance. The ordering key must be
    * deterministic under balance ties AND portable (DuckDB's
    * max_by has no struct-key overload), so the (balance, custkey)
    * pair is packed into one exact BIGINT: balance-cents ×1e7 +
    * custkey. round() before the cast avoids the 123.45*100 =
    * 12344.999… truncation trap — identical in both engines.
    *
    * Packing-injectivity bound: valid while c_custkey < 1e7 AND
    * |cents| < ~9.2e11 (Long.MaxValue / 1e7); beyond that custkey
    * overflows into the cents digits and the arg-min/max silently
    * changes. TPC-H custkeys stay < 1e7 up to SF ≈ 66 — widen the
    * multiplier (and re-check the overflow headroom) before running
    * this query at larger scale factors. */
  val qAggMinmaxBy: QuerySpec = QuerySpec(
    "q_agg_minmax_by",
    """SELECT c_nationkey,
      |  max(c_acctbal) AS max_bal,
      |  min(c_acctbal) AS min_bal,
      |  max_by(c_custkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
      |    AS top_cust,
      |  min_by(c_custkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 - c_custkey)
      |    AS bottom_cust
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val cents = round(col("c_acctbal") * 100).cast(LongType)
    LsdDb.table(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(max(col("c_acctbal")).as("max_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max_by(col("c_custkey"), cents * 10000000L + col("c_custkey"))
          .as("top_cust"),
        min_by(col("c_custkey"), cents * 10000000L - col("c_custkey"))
          .as("bottom_cust"))
      .orderBy("c_nationkey")
  }

  /** W4 — distribution windows: cume_dist / percent_rank (which demand
    * the default RANGE frame) plus first/last value over an explicit
    * running ROWS frame — two windows over one shuffle (same
    * partitioning+ordering, Catalyst plans a single Window exec per
    * frame over one sort). */
  val qWindowCume: QuerySpec = QuerySpec(
    "q_window_cume",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  cume_dist() OVER wr AS cd,
      |  percent_rank() OVER wr AS pr,
      |  first_value(o_orderkey) OVER wf AS first_ok,
      |  last_value(o_orderkey) OVER wf AS last_ok
      |FROM orders
      |WINDOW wr AS (PARTITION BY o_custkey
      |              ORDER BY o_totalprice, o_orderkey),
      |       wf AS (PARTITION BY o_custkey
      |              ORDER BY o_totalprice, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin) { (s, dir) =>
    val wr = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wf = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    LsdDb.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        cume_dist().over(wr).as("cd"),
        percent_rank().over(wr).as("pr"),
        first(col("o_orderkey")).over(wf).as("first_ok"),
        last(col("o_orderkey")).over(wf).as("last_ok"))
      .orderBy("o_custkey", "o_totalprice", "o_orderkey")
  }

  /** P11 — regex surface: extract / replace / count over documents. */
  val qRegex: QuerySpec = QuerySpec(
    "q_regex",
    """SELECT doc_id,
      |  regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
      |  regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "documents")
      .select(col("doc_id"),
        regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
        regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .cast(LongType).as("n_numbers"))
      .orderBy("doc_id")
  }

  /** P12 — bitwise expressions (packed-id manipulation is how the
    * reference addressed cells: id = cell<<k | row; SURVEY.md §1.1). */
  val qBitwise: QuerySpec = QuerySpec(
    "q_bitwise",
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS low_byte,
      |  o_orderkey | 15 AS with_low,
      |  xor(o_orderkey, 255) AS flipped,
      |  o_orderkey << 2 AS shifted_up,
      |  o_orderkey >> 3 AS shifted_down
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val ok = col("o_orderkey")
    LsdDb.table(s, dir, "orders")
      .select(ok,
        ok.bitwiseAND(255L).as("low_byte"),
        ok.bitwiseOR(15L).as("with_low"),
        ok.bitwiseXOR(255L).as("flipped"),
        shiftleft(ok, 2).as("shifted_up"),
        shiftright(ok, 3).as("shifted_down"))
      .orderBy("o_orderkey")
  }

  /** P13 — null-handling expressions over the outer-join null surface
    * (sentinel-free missing data is the engine's improvement over the
    * reference's NaN/-1 sentinels; SURVEY.md §1.2). */
  val qNullOps: QuerySpec = QuerySpec(
    "q_null_ops",
    """SELECT c_custkey,
      |  COALESCE(o_cnt, 0) AS cnt_or_zero,
      |  o_cnt IS NULL AS has_none,
      |  NULLIF(COALESCE(o_cnt, 0), 0) AS cnt_or_null,
      |  CASE WHEN o_cnt IS NOT NULL THEN 'buyer' ELSE 'dormant' END AS kind
      |FROM customer c LEFT JOIN
      |  (SELECT o_custkey, count(*) AS o_cnt FROM orders GROUP BY 1) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = LsdDb.table(s, dir, "customer").select("c_custkey")
    val o = LsdDb.table(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("o_cnt"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("o_cnt"), lit(0L)).as("cnt_or_zero"),
        col("o_cnt").isNull.as("has_none"),
        nullif(coalesce(col("o_cnt"), lit(0L)), lit(0L)).as("cnt_or_null"),
        when(col("o_cnt").isNotNull, lit("buyer")).otherwise(lit("dormant"))
          .as("kind"))
      .orderBy("c_custkey")
  }

  /** P14 — table-generating explode (sequence → rows), the lateral
    * row-multiplying surface (reference analog: kernels yielding
    * multiple rows per input row). */
  val qSeqExplode: QuerySpec = QuerySpec(
    "q_seq_explode",
    """SELECT n_nationkey, CAST(u.x AS BIGINT) AS x
      |FROM nation, unnest(range(1, CAST(n_nationkey % 5 AS BIGINT) + 2)) AS u(x)
      |ORDER BY n_nationkey, x""".stripMargin) { (s, dir) =>
    LsdDb.table(s, dir, "nation")
      .select(col("n_nationkey"),
        explode(sequence(lit(1L), (col("n_nationkey") % 5).cast(LongType) + 1))
          .as("x"))
      .orderBy("n_nationkey", "x")
  }

  /** §3 entry point 2 — the kernel-chain dataflow under the oracle
    * gate: two chained typed map/reduce stages (KernelChain.mapReduce
    * ≅ the reference's `Query.execute([(mapper,), (reducer,)])`
    * pool2 chain). Stage 1 reduces (flag, status) partials, stage 2
    * re-keys by flag and merges them — LSD's mapper→reducer→reducer
    * shape. Group iterators arrive in NON-deterministic order after
    * the shuffle, so the reducers fold in exact BigDecimal (l_quantity
    * is integral → bit-equal to the oracle's decimal sum). The
    * declarative twin of this query is one `groupBy.agg` — the
    * Scaladoc on KernelChain says when to prefer which; this entry
    * proves the imperative surface produces oracle-identical results. */
  val qKernelChain: QuerySpec = QuerySpec(
    "q_kernel_chain",
    s"""SELECT l_returnflag, count(*) AS n,
       |  ${graft.functions.Det.sql.dsum("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import s.implicits._
    val rows = LsdDb.table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .as[(String, String, Double)]
    val partials = KernelChain.mapReduce[
      (String, String, Double), (String, String), Double,
      ((String, String), Long, BigDecimal)](
      rows,
      r => Iterator.single(((r._1, r._2), r._3)),
      (k, it) => {
        var n = 0L
        var sum = BigDecimal(0)
        it.foreach { q => n += 1; sum += BigDecimal(q) }
        Iterator.single((k, n, sum))
      })
    val merged = KernelChain.mapReduce[
      ((String, String), Long, BigDecimal), String, (Long, BigDecimal),
      (String, Long, Double)](
      partials,
      p => Iterator.single((p._1._1, (p._2, p._3))),
      (flag, it) => {
        var n = 0L
        var sum = BigDecimal(0)
        it.foreach { case (pn, ps) => n += pn; sum += ps }
        Iterator.single((flag, n, sum.toDouble))
      })
    merged.toDF("l_returnflag", "n", "sum_qty").orderBy("l_returnflag")
  }

  /** X3b — multimodal metadata scan under the oracle: binary payload
    * columns summarized (byte size + content fingerprint) WITHOUT
    * decoding — the pushdown-friendly pass a media pipeline runs
    * before committing to a decode stage. Payloads here are the
    * documents' text bytes cast to binary (the testdata ships no
    * media blobs; the path under test — binary column in, md5/size
    * projection out through [[graft.multimodal.Multimodal
    * .mediaStats]] — is exactly the production one). Spark md5 over
    * the UTF-8 bytes == DuckDB md5 over the VARCHAR (both hash UTF-8),
    * the q_sample-proven cross-engine pair. */
  val qMediaStats: QuerySpec = QuerySpec(
    "q_media_stats",
    """SELECT doc_id AS media_id, 'text/plain' AS format,
      |  octet_length(encode(text)) AS n_bytes, md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
    val media = LsdDb.table(s, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("text/plain").as("format"),
        col("text").cast("binary").as("media"))
    graft.multimodal.Multimodal.mediaStats(media).orderBy("media_id")
  }

  /** Ext — one-pass table profiling (the ANALYZE/data-profiler
    * utility): null count, exact distinct count and min/max for a
    * column list, in a SINGLE scan. The multi-column count-distincts
    * plan through one Expand (k-way row multiplication, still one
    * scan + one shuffle — the q_agg_distinct machinery); the per-
    * column rows come from `stack` over the single aggregated row.
    * n_nulls is count(*) − count(col) (both engines' SUM-of-CASE
    * would disagree on result type); the double column's min/max is
    * decimal(18,2)-formatted so both engines print identical
    * strings. */
  val qProfileTable: QuerySpec = QuerySpec(
    "q_profile_table",
    """WITH s AS (SELECT count(*) AS n,
      |    count(o_custkey) AS c1, count(DISTINCT o_custkey) AS d1,
      |    CAST(min(o_custkey) AS VARCHAR) AS mn1,
      |    CAST(max(o_custkey) AS VARCHAR) AS mx1,
      |    count(o_orderstatus) AS c2,
      |    count(DISTINCT o_orderstatus) AS d2,
      |    min(o_orderstatus) AS mn2, max(o_orderstatus) AS mx2,
      |    count(o_totalprice) AS c3, count(DISTINCT o_totalprice) AS d3,
      |    CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn3,
      |    CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx3
      |  FROM orders)
      |SELECT col, n_nulls, n_distinct, min_val, max_val FROM (
      |  SELECT 'o_custkey' AS col, n - c1 AS n_nulls, d1 AS n_distinct,
      |    mn1 AS min_val, mx1 AS max_val FROM s
      |  UNION ALL
      |  SELECT 'o_orderstatus', n - c2, d2, mn2, mx2 FROM s
      |  UNION ALL
      |  SELECT 'o_totalprice', n - c3, d3, mn3, mx3 FROM s)
      |ORDER BY col""".stripMargin) { (s, dir) =>
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val agg = LsdDb.table(s, dir, "orders").agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("c1"),
      countDistinct(col("o_custkey")).as("d1"),
      min(col("o_custkey")).cast("string").as("mn1"),
      max(col("o_custkey")).cast("string").as("mx1"),
      count(col("o_orderstatus")).as("c2"),
      countDistinct(col("o_orderstatus")).as("d2"),
      min(col("o_orderstatus")).as("mn2"),
      max(col("o_orderstatus")).as("mx2"),
      count(col("o_totalprice")).as("c3"),
      countDistinct(col("o_totalprice")).as("d3"),
      min(col("o_totalprice")).cast(dec).cast("string").as("mn3"),
      max(col("o_totalprice")).cast(dec).cast("string").as("mx3"))
    agg.select(expr(
      """stack(3,
        |  'o_custkey', n - c1, d1, mn1, mx1,
        |  'o_orderstatus', n - c2, d2, mn2, mx2,
        |  'o_totalprice', n - c3, d3, mn3, mx3)
        |  AS (col, n_nulls, n_distinct, min_val, max_val)""".stripMargin))
      .orderBy("col")
  }

  def specs: Seq[QuerySpec] = Seq(qJoinFull, qJoinCross, qExistsSubq,
    qGroupingSets, qAggMinmaxBy, qWindowCume, qRegex, qBitwise, qNullOps,
    qSeqExplode, qKernelChain, qMediaStats, qProfileTable)
}
