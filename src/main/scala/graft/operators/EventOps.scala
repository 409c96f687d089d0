package graft.operators

import graft.{LsdDb, QuerySpec}
import graft.functions.Det
import graft.functions.{Det => D}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Product-analytics classics over the `events` stream — the funnel /
  * retention / transition-matrix trio every clickstream warehouse
  * ships. All three are one-or-two-shuffle shapes on `user_id` (the
  * natural event partitioning key), so at 100 TB they ride a single
  * hash partitioning end to end: the first groupBy shuffles, every
  * later per-user step reuses the exchange. Nothing here is float —
  * timestamps are exact µs BIGINTs and probabilities are single
  * BIGINT-ratio divisions, identical on both engines. */
object EventOps {

  /** E1 — conversion FUNNEL view → click → purchase: per user, the
    * first 'view', the first 'click' strictly after it, the first
    * 'purchase' strictly after that, and the stage reached (0–3).
    * Strict-sequence first-occurrence semantics — the standard
    * product-funnel definition. Three keyed aggregates joined on
    * user_id: left joins keep users who never converted (stage
    * counts need them), and every join key is the same user_id hash
    * partitioning. */
  val qFunnel: QuerySpec = QuerySpec(
    "q_funnel",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
      |    event_type FROM events),
      |v AS (SELECT user_id, min(tsu) AS t_view FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.tsu) AS t_click
      |  FROM e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.tsu > v.t_view
      |  GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.tsu) AS t_purchase
      |  FROM e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.tsu > c.t_click
      |  GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM e)
      |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
      |  CASE WHEN p.user_id IS NOT NULL THEN 3
      |       WHEN c.user_id IS NOT NULL THEN 2
      |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |  LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val e = LsdDb.table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    e.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1).otherwise(0)
          .cast("int").as("stage"))
      .orderBy("user_id")
  }

  /** E2 — cohort RETENTION matrix: users grouped by first-activity
    * week (Monday-truncated on both engines), counted in each later
    * active week as an integer week offset. Two keyed aggregates on
    * user_id + one dimension-scale groupBy — the matrix is
    * O(weeks²) rows regardless of corpus size. Offsets are exact µs
    * arithmetic (epoch difference / 604800e6 is an exact integer for
    * week-truncated timestamps). */
  val qRetention: QuerySpec = QuerySpec(
    "q_retention",
    """WITH e AS (SELECT user_id,
      |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
      |cohort AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT c.cw AS cohort_week,
      |  CAST((epoch_us(a.wk) - epoch_us(c.cw)) / 604800000000 AS BIGINT)
      |    AS week_offset,
      |  count(*) AS n_users
      |FROM cohort c JOIN active a USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val e = LsdDb.table(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohort = e.groupBy("user_id").agg(min(col("wk")).as("cw"))
    val active = e.distinct()
    cohort.join(active, "user_id")
      .groupBy(col("cw").as("cohort_week"),
        ((unix_micros(col("wk")) - unix_micros(col("cw")))
          / 604800000000L).cast(LongType).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** E3 — event TRANSITION matrix (first-order Markov): consecutive
    * event-type pairs per user (ordered by ts with event_id
    * tie-break), with the empirical transition probability. One lag
    * window + one groupBy; the per-from normalizer is a window over
    * the 25-row matrix, not the corpus. p is one BIGINT-ratio
    * division — engine-identical, no snap. */
  val qTransition: QuerySpec = QuerySpec(
    "q_transition",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
      |    event_type FROM events),
      |pairs AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY tsu, event_id) AS to_type
      |  FROM e),
      |m AS (SELECT from_type, to_type, count(*) AS n FROM pairs
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM m ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val nw = Window.partitionBy("from_type")
    LsdDb.table(s, dir, "events")
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(nw))
      .orderBy("from_type", "to_type")
  }

  /** Hot-basket cap for [[qCooccur]], part of the operator algebra
    * (both engines): an order with more than this many distinct parts
    * contributes NO pairs — so per-order pair fan-out is provably ≤
    * C(cap,2) and the join scales with orders even on a pathological
    * mega-basket corpus (the TextOps minhash maxBucket / PPJoin
    * maxPrefixBucket pattern). TPC-H baskets are ≤7 lineitems, so the
    * cap never binds at any bench SF; capped baskets still count in
    * n_orders and the per-part totals (they exist, they just aren't
    * pair-enumerated — exactly how minhash keeps capped-bucket docs
    * in the corpus). */
  private val maxBasket = 64

  /** E4 — market-basket CO-OCCURRENCE with lift: part pairs bought in
    * the same order, ranked by support, with
    * lift = n_ab·N / (n_a·n_b). The self-join key is the order — a
    * bounded-cardinality basket (≤7 lineitems in TPC-H shape, and
    * hard-bounded by [[maxBasket]] in the algebra), so pair fan-out
    * is ≤ C(maxBasket,2) per order and the join scales with orders,
    * never parts². Per-part order counts attach by broadcast (the
    * part dimension is corpus-sublinear). Lift is one double
    * division of exact integer products — no snap needed. */
  val qCooccur: QuerySpec = QuerySpec(
    "q_cooccur",
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
      |pc AS (SELECT l_partkey, count(*) AS n_part FROM b GROUP BY 1),
      |ok AS (SELECT l_orderkey FROM b GROUP BY 1
      |  HAVING count(*) <= $maxBasket),
      |pairs AS (SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
      |    count(*) AS n_ab
      |  FROM b a JOIN ok USING (l_orderkey)
      |    JOIN b c ON a.l_orderkey = c.l_orderkey
      |    AND a.l_partkey < c.l_partkey
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, n_ab,
      |  CAST(n_ab * n.n_orders AS DOUBLE)
      |    / CAST(pa.n_part * pb.n_part AS DOUBLE) AS lift
      |FROM pairs JOIN pc pa ON pa.l_partkey = part_a
      |  JOIN pc pb ON pb.l_partkey = part_b, n
      |WHERE n_ab >= 2
      |ORDER BY n_ab DESC, part_a, part_b LIMIT 100""".stripMargin) {
    (s, dir) =>
    // spread (r21): the one-row-group lineitem scan ran the distinct's
    // map-side partial aggregation on ≤3 tasks; conditional exchange
    // parallelizes it (no-op on parallel layouts)
    val b = LsdDb.spread(LsdDb.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")), col("l_orderkey"))
      .distinct()
    // n_orders folded into the plan as a broadcast scalar (r21): the
    // eager count() was a second full scan+distinct JOB per run; as a
    // cross-joined one-row aggregate it reuses b's distinct exchange
    // and the lift arithmetic is unchanged (long × long, cast double)
    val nn = b.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val pc = b.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
    val ok = b.groupBy("l_orderkey").agg(count(lit(1)).as("bn_"))
      .filter(col("bn_") <= maxBasket).select("l_orderkey")
    val pairs = b.join(ok, "l_orderkey").as("a")
      .join(b.as("c"), col("a.l_orderkey") === col("c.l_orderkey") &&
        col("a.l_partkey") < col("c.l_partkey"))
      .select(col("a.l_partkey").as("part_a"),
        col("c.l_partkey").as("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(broadcast(pc.select(col("l_partkey").as("part_a"),
        col("n_part").as("na"))), "part_a")
      .join(broadcast(pc.select(col("l_partkey").as("part_b"),
        col("n_part").as("nb"))), "part_b")
      .crossJoin(broadcast(nn))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("na") * col("nb")).cast("double")).as("lift"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  /** E5 — AUTOCORRELATION function of the daily event-count series
    * (lags 1–7): the weekly-seasonality detector a pipeline runs
    * before choosing resampling windows. The heavy part is the daily
    * count — one partial-aggregated groupBy over the corpus; the
    * series itself is calendar-scale (30 rows here, always
    * #days-bounded), so the lag self-join and the window that indexes
    * it are dimension-side no-ops at any corpus size.
    *
    * Exactness: the ACF is computed WITHOUT the rational mean —
    * multiply the centered form through by n²:
    *   r_k = (n²·C_k − n·S·(H_k+T_k) + (n−k)·S²) / (n²·Q − n·S²)
    * with C_k = Σ x_t·x_{t+k}, H/T the head/tail sums, S = Σx,
    * Q = Σx². Every term is exact DECIMAL arithmetic on integer
    * daily counts (decimal, not BIGINT, so the identity survives
    * counts up to ~1e9/day where n²·C would overflow INT64), and the
    * single double division at the end is engine-identical. */
  val qAcf: QuerySpec = QuerySpec(
    "q_acf",
    """WITH s0 AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    count(*) AS x0 FROM events GROUP BY 1),
      |s AS (SELECT row_number() OVER (ORDER BY day) - 1 AS t,
      |    CAST(x0 AS DECIMAL(19,0)) AS x FROM s0),
      |tot AS (SELECT CAST(count(*) AS DECIMAL(19,0)) AS n,
      |    sum(x) AS sv, sum(x * x) AS q FROM s),
      |lagd AS (SELECT g.k, sum(a.x * b.x) AS c,
      |    sum(a.x) AS h, sum(b.x) AS tl
      |  FROM s a, generate_series(1, 7) g(k), s b
      |  WHERE b.t = a.t + g.k GROUP BY g.k)
      |SELECT k AS lag,
      |  CAST(n * n * c - n * sv * (h + tl) + (n - k) * sv * sv AS DOUBLE)
      |    / CAST(n * n * q - n * sv * sv AS DOUBLE) AS acf
      |FROM lagd, tot ORDER BY lag""".stripMargin) { (s, dir) =>
    val ss = s
    val s0 = LsdDb.table(ss, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x0"))
    // global row_number: single-partition window over a #days-sized
    // relation — the documented dimension-side exception
    val series = s0.select(
      (row_number().over(Window.orderBy(col("day"))) - 1)
        .cast(LongType).as("t"),
      col("x0").cast("decimal(19,0)").as("x"))
    val tot = series.agg(
      count(lit(1)).cast("decimal(19,0)").as("n"),
      sum(col("x")).as("sv"),
      sum(col("x") * col("x")).as("q"))
    val ks = ss.range(1, 8).select(col("id").as("k"))
    val lagd = series.as("a")
      .crossJoin(broadcast(ks))
      .join(series.as("b"), col("b.t") === col("a.t") + col("k"))
      .groupBy("k")
      .agg(sum(col("a.x") * col("b.x")).as("c"),
        sum(col("a.x")).as("h"), sum(col("b.x")).as("tl"))
    lagd.crossJoin(broadcast(tot))
      .select(col("k").as("lag"),
        ((col("n") * col("n") * col("c")
          - col("n") * col("sv") * (col("h") + col("tl"))
          + (col("n") - col("k")) * col("sv") * col("sv")).cast("double")
          / (col("n") * col("n") * col("q")
            - col("n") * col("sv") * col("sv")).cast("double")).as("acf"))
      .orderBy("lag")
  }

  /** E6 — CUSUM changepoint scan over the daily event-count series:
    * where did the level shift? The statistic is the cumulative sum
    * of deviations from the global mean, scaled by n to stay
    * integer:  n·c_t = n·Σ_{i≤t} x_i − t·S  (same argmax as c_t, no
    * rational mean anywhere). The flagged day maximizes |n·c_t| with
    * earliest-day tie-break — the classic single-changepoint CUSUM
    * estimate. Corpus-scale work is the daily count; the prefix sum,
    * the argmax rank, everything after is calendar-bounded
    * dimension-side (single-partition windows over #days rows). Pure
    * BIGINT end to end — nothing to snap. */
  val qChangepoint: QuerySpec = QuerySpec(
    "q_changepoint",
    """WITH s0 AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    count(*) AS x FROM events GROUP BY 1),
      |s AS (SELECT day, x,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |    sum(x) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px
      |  FROM s0),
      |tot AS (SELECT count(*) AS n, sum(x) AS sv FROM s0),
      |c AS (SELECT day, x, t, n * px - t * sv AS nc FROM s, tot),
      |r AS (SELECT *, row_number() OVER (ORDER BY abs(nc) DESC, day)
      |    AS rk FROM c)
      |SELECT day, CAST(x AS BIGINT) AS n_events, CAST(nc AS BIGINT)
      |    AS cusum_n, rk = 1 AS is_changepoint
      |FROM r ORDER BY day""".stripMargin) { (s, dir) =>
    val s0 = LsdDb.table(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val wOrd = Window.orderBy(col("day"))
    val ser = s0.select(col("day"), col("x"),
      row_number().over(wOrd).cast(LongType).as("t"),
      sum(col("x")).over(wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("px"))
    val tot = s0.agg(count(lit(1)).as("n"), sum(col("x")).as("sv"))
    val c = ser.crossJoin(broadcast(tot))
      .withColumn("nc", col("n") * col("px") - col("t") * col("sv"))
    c.withColumn("rk",
        row_number().over(Window.orderBy(abs(col("nc")).desc, col("day"))))
      .select(col("day"), col("x").cast(LongType).as("n_events"),
        col("nc").cast(LongType).as("cusum_n"),
        (col("rk") === 1).as("is_changepoint"))
      .orderBy("day")
  }

  /** E7 — day-of-week SEASONAL decomposition of the daily series:
    * each day's count against its weekday mean, the residual being
    * the deseasonalized signal (the companion read to q_acf's lag-7
    * spike). Weekday means are exact BIGINT ratios (one division —
    * engine-identical), residual is one subtraction of identical
    * doubles; corpus work is the one daily count, everything after
    * is calendar-scale. ISO weekday on both engines (DuckDB isodow,
    * Spark dayofweek remapped). */
  val qSeasonal: QuerySpec = QuerySpec(
    "q_seasonal",
    """WITH s AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
      |    count(*) AS x FROM events GROUP BY 1),
      |w AS (SELECT day, x, CAST(isodow(day) AS BIGINT) AS dow FROM s),
      |m AS (SELECT dow, sum(x) AS sx, count(*) AS nd FROM w GROUP BY dow)
      |SELECT day, CAST(x AS BIGINT) AS n_events, w.dow,
      |  CAST(m.sx AS DOUBLE) / m.nd AS dow_mean,
      |  x - CAST(m.sx AS DOUBLE) / m.nd AS residual
      |FROM w JOIN m USING (dow) ORDER BY day""".stripMargin) { (s, dir) =>
    val ser = LsdDb.table(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    // Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday
    val w = ser.withColumn("dow",
      (pmod(dayofweek(col("day")) + 5, lit(7)) + 1).cast(LongType))
    val m = w.groupBy("dow")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("nd"))
    val mean = col("sx").cast(DoubleType) / col("nd")
    w.join(broadcast(m), "dow")
      .select(col("day"), col("x").cast(LongType).as("n_events"),
        col("dow"), mean.as("dow_mean"),
        (col("x") - mean).as("residual"))
      .orderBy("day")
  }

  /** E6 — trailing-window RATE ANOMALY detection: per (event_type,
    * day), the z-score of the daily count against the preceding
    * 7 days' mean/σ — the ops alarm ("did sign-ups crater today?" /
    * "is this a bot spike?") that a pipeline runs per ingest batch.
    * Only days with a FULL 7-day trailing window score (np = 7), so
    * the series' first week never produces half-baked alarms.
    *
    * Exactness: the trailing sums s1 = Σx and s2 = Σx² are BIGINT
    * window sums over integer daily counts — exact in both engines;
    * μ = s1/7 and the sample variance (s2 − s1²/7)/6 are then fixed
    * double expressions, σ is one sqrt, z one subtract-divide, all
    * d6-snapped at the output. The corpus-scale work is ONE daily
    * partial-aggregated count; everything after runs on the
    * calendar-×-types grid (dimension-sized at any corpus size). */
  val qRateAnomaly: QuerySpec = QuerySpec(
    "q_rate_anomaly",
    s"""WITH daily AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP))
       |    AS day, event_type, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |w AS (SELECT day, event_type, cnt,
       |    count(*) OVER win AS np,
       |    sum(cnt) OVER win AS s1,
       |    sum(cnt * cnt) OVER win AS s2
       |  FROM daily WINDOW win AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
       |sc AS (SELECT day, event_type, cnt,
       |    CAST(s1 AS DOUBLE) / 7.0 AS mu,
       |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
       |      * CAST(s1 AS DOUBLE) / 7.0) / 6.0) AS sigma
       |  FROM w WHERE np = 7)
       |SELECT day, event_type, CAST(cnt AS BIGINT) AS cnt,
       |  ${D.sql.d6("mu")} AS mu, ${D.sql.d6("sigma")} AS sigma,
       |  CASE WHEN sigma > 0.0
       |    THEN ${D.sql.d6("(cnt - mu) / sigma")} END AS z,
       |  CASE WHEN sigma > 0.0
       |    THEN abs((cnt - mu) / sigma) >= 3.0 ELSE false END
       |    AS is_anomaly
       |FROM sc ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val win = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    val daily = LsdDb.table(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val mu = col("s1").cast(DoubleType) / 7.0
    val sigma = sqrt((col("s2").cast(DoubleType) -
      col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / 7.0) / 6.0)
    daily
      .withColumn("np", count(lit(1)).over(win))
      .withColumn("s1", sum(col("cnt")).over(win))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(win))
      .filter(col("np") === 7)
      .select(col("day"), col("event_type"), col("cnt"),
        mu.as("mu_"), sigma.as("sigma_"))
      .select(col("day"), col("event_type"), col("cnt"),
        Det.d6(col("mu_")).as("mu"), Det.d6(col("sigma_")).as("sigma"),
        when(col("sigma_") > 0.0,
          Det.d6((col("cnt") - col("mu_")) / col("sigma_"))).as("z"),
        when(col("sigma_") > 0.0,
          abs((col("cnt") - col("mu_")) / col("sigma_")) >= 3.0)
          .otherwise(lit(false)).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  def specs: Seq[QuerySpec] = Seq(qFunnel, qRetention, qTransition,
    qCooccur, qAcf, qChangepoint, qSeasonal, qRateAnomaly)
}
