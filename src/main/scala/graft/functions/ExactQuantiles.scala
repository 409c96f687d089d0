package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact per-group quantiles by iterative histogram rank-select —
  * the scale-safe replacement for Spark's buffering `percentile` /
  * `median` aggregates (SURVEY.md §2D row A9).
  *
  * Spark's exact `percentile(col, p)` holds each group's entire value
  * multiset in executor memory (an OpenHashMap per aggregation
  * buffer). With a 3-value grouping key over a 100 TB table that is
  * per-group state linear in table size — the canonical hot-group
  * OOM. The classic distributed fix (BigQuery-style exact quantiles;
  * also the selection step of external quickselect) is rank-select by
  * range refinement:
  *
  *   pass 0  one scan: per-group `count / min / max` (O(1) state);
  *   pass k  one scan: fixed-width histogram of the candidate range —
  *           `groupBy(range, bin).agg(count, min, max)` — so executor
  *           state is O(ranges × bins) counters, NEVER row-linear;
  *           the driver walks the cumulative counts, finds the one
  *           bin containing each wanted rank, and narrows the range
  *           to that bin's observed [min, max];
  *   final   the surviving ranges hold ≤ collectThreshold rows each;
  *           collect exactly those rows, sort driver-side, index.
  *
  * Because bin assignment `floor((v-lo)/width)` is monotone in v,
  * a bin's rows are exactly the rows with v in its observed closed
  * interval [bmin, bmax], earlier bins hold strictly smaller values,
  * and the rank arithmetic stays exact — no fp-boundary row can
  * migrate between a histogram pass and the next filter. A range
  * whose bmin == bmax is resolved immediately (all duplicates), so
  * heavy duplication CONVERGES rather than defeating the refinement;
  * ranges with ≥2 distinct values always split. Uniform data resolves
  * in one histogram pass (bin population n/bins); adversarial data in
  * O(log_bins n) passes.
  *
  * Interpolation matches `quantile_cont` (and Spark's `percentile`):
  * h = p·(n−1), v = v_floor(h) + (v_ceil(h) − v_floor(h))·(h − ⌊h⌋),
  * evaluated in driver doubles — the same IEEE expression DuckDB's
  * interpolator uses, so results are bit-identical to the oracle.
  *
  * Driver-side state is O(groups × bins) histogram counters plus the
  * ≤ collectThreshold final values per range — the group set must be
  * driver-enumerable, which is exactly the hot-group regime this
  * exists for (few groups × unbounded rows). The many-groups ×
  * few-rows regime is the one Spark's buffering aggregate already
  * handles. NULL values are ignored (SQL semantics); NULL group keys
  * form their own group (null-safe `<=>` join).
  */
object ExactQuantiles {

  /** One requested quantile: `p` of `valueCol`, emitted as `outName`. */
  final case class Req(valueCol: String, p: Double, outName: String) {
    require(p >= 0.0 && p <= 1.0, s"quantile p out of [0,1]: $p")
  }

  /** Run metrics for scale assertions: `histPasses` = histogram scans
    * taken by the slowest column; `maxRangeRows` = largest row count
    * any final range was collected with; `totalCollected` = total
    * rows ever brought to the driver. */
  final case class Stats(histPasses: Int, maxRangeRows: Long,
      totalCollected: Long)

  def quantiles(df: DataFrame, groupCols: Seq[String], reqs: Seq[Req],
      bins: Int = 1024, collectThreshold: Long = 1L << 16,
      maxPasses: Int = 20, maxGroups: Int = 4096): DataFrame =
    computeWithStats(df, groupCols, reqs, bins, collectThreshold,
      maxPasses, maxGroups)._1

  def computeWithStats(df: DataFrame, groupCols: Seq[String],
      reqs: Seq[Req], bins: Int = 1024,
      collectThreshold: Long = 1L << 16, maxPasses: Int = 20,
      maxGroups: Int = 4096)
      : (DataFrame, Stats) = {
    require(reqs.nonEmpty, "at least one quantile request")
    require(bins >= 2, "bins >= 2")
    require(maxGroups >= 1, "maxGroups >= 1")
    val spark = df.sparkSession
    val valueCols = reqs.map(_.valueCol).distinct
    val nG = groupCols.length

    // ---- pass 0: one scan for every column's per-group count/min/max.
    // Non-finite values are COUNTED here and resolved by rank
    // arithmetic alone, never entering histogram refinement: an
    // infinite endpoint makes the bin width infinite ((v-lo)/width is
    // 0 or NaN for every row), so the range would never narrow and
    // the maxPasses fallback would collect the whole group — exactly
    // the O(collectThreshold) driver-memory contract this class
    // exists to keep. Sort order used: -Inf < finite < +Inf < NaN
    // (Spark's and DuckDB's double ordering).
    val statAggs = valueCols.flatMap { c =>
      val v = col(c).cast(DoubleType)
      val finite = !isnan(v) &&
        v =!= Double.NegativeInfinity && v =!= Double.PositiveInfinity
      Seq(count(v).as(s"__n_$c"),
        count(when(v === Double.NegativeInfinity, 1)).as(s"__ni_$c"),
        count(when(v === Double.PositiveInfinity, 1)).as(s"__pi_$c"),
        count(when(isnan(v), 1)).as(s"__nan_$c"),
        min(when(finite, v)).as(s"__lo_$c"),
        max(when(finite, v)).as(s"__hi_$c"))
    }
    // The collect is capped BEFORE it happens: `limit(maxGroups+1)`
    // bounds driver intake to maxGroups+1 rows no matter the true
    // cardinality, and one extra row proves the contract violation.
    // Callers in the many-groups regime (per-object/per-row keys)
    // must use Spark's buffering `percentile` aggregate instead —
    // that is the regime it already handles; this class exists for
    // the opposite one (few hot groups × unbounded rows).
    val statRows =
      df.groupBy(groupCols.map(col): _*).agg(statAggs.head, statAggs.tail: _*)
        .limit(maxGroups + 1)
        .collect()
    require(statRows.length <= maxGroups,
      s"ExactQuantiles: group cardinality exceeds maxGroups=$maxGroups " +
        s"for groupCols=${groupCols.mkString(",")}. Driver state is " +
        "O(groups x bins); this operator is for driver-enumerable " +
        "(hot-group) key sets. Use percentile()/median() aggregates " +
        "for high-cardinality grouping keys.")
    val groups: Array[Seq[Any]] =
      statRows.map(r => (0 until nG).map(r.get))
    // per-(valueCol, group): counts by class + finite min/max
    final case class GStat(n: Long, ni: Long, pi: Long, nan: Long,
        lo: Double, hi: Double) {
      def finCnt: Long = n - ni - pi - nan
    }
    val stat = mutable.Map.empty[(String, Int), GStat]
    for ((r, gi) <- statRows.zipWithIndex; c <- valueCols) {
      val n = r.getAs[Long](s"__n_$c")
      if (n > 0) {
        val lo = if (r.isNullAt(r.fieldIndex(s"__lo_$c"))) 0.0
          else r.getAs[Double](s"__lo_$c")
        val hi = if (r.isNullAt(r.fieldIndex(s"__hi_$c"))) 0.0
          else r.getAs[Double](s"__hi_$c")
        stat((c, gi)) = GStat(n, r.getAs[Long](s"__ni_$c"),
          r.getAs[Long](s"__pi_$c"), r.getAs[Long](s"__nan_$c"), lo, hi)
      }
    }

    // group-typed schema for the broadcast range relations
    val rangeSchema = StructType(
      groupCols.zipWithIndex.map { case (c, i) =>
        df.schema(c).copy(name = s"__g$i")
      } ++ Seq(StructField("__rid", IntegerType, nullable = false),
        StructField("__rlo", DoubleType, nullable = false),
        StructField("__rhi", DoubleType, nullable = false)))

    /** Rows of `valueCol` falling in each task's [lo,hi], tagged with
      * the task id — a broadcast join against the O(tasks) range
      * relation, so the big side never shuffles. */
    def joined(valueCol: String,
        tasks: Seq[(Int, Int, Double, Double)]): DataFrame = {
      val rRows = tasks.map { case (rid, gi, lo, hi) =>
        // Seq[Any], NOT Seq(...): inference would numeric-widen the
        // Int rid to Double and break the row<->schema correspondence
        Row.fromSeq(groups(gi) ++ Seq[Any](rid, lo, hi))
      }
      val rdf = spark.createDataFrame(
        spark.sparkContext.parallelize(rRows, 1), rangeSchema)
      val base = df
        .select(groupCols.map(col) :+
          col(valueCol).cast(DoubleType).as("__v"): _*)
        .where(col("__v").isNotNull)
      val cond = groupCols.zipWithIndex
        .map { case (c, i) => base(c) <=> rdf(s"__g$i") }
        .reduce(_ && _) &&
        col("__v") >= col("__rlo") && col("__v") <= col("__rhi")
      base.join(broadcast(rdf), cond)
    }

    // A candidate range: rows of one group with value in [lo, hi];
    // `offset` = how many of the group's rows sort strictly below lo;
    // `ranks` = the global 0-based ranks still to be located inside.
    final case class Task(gi: Int, lo: Double, hi: Double, offset: Long,
        cnt: Long, ranks: Set[Long])

    // (valueCol, groupIdx, rank) -> value
    val resolved = mutable.Map.empty[(String, Int, Long), Double]
    var histPasses = 0
    var maxRangeRows = 0L
    var totalCollected = 0L

    // KNOWN COST: refinement runs per valueCol sequentially — a
    // multi-column request pays (1 + passes + 1) scans PER COLUMN.
    // Folding all columns' active tasks into one (rid, colId, lo, hi)
    // range relation would share each pass's scan across columns;
    // worth doing if multi-column exact quantiles ever dominate a
    // pipeline (today's callers ask for 1-2 columns).
    for (c <- valueCols) {
      // ranks needed for this column: floor/ceil of h = p(n-1)
      val needed = mutable.Map.empty[Int, mutable.Set[Long]]
      for (r <- reqs if r.valueCol == c; gi <- groups.indices) {
        stat.get((c, gi)).foreach { st =>
          val h = r.p * (st.n - 1).toDouble
          val s = needed.getOrElseUpdate(gi, mutable.Set.empty[Long])
          s += math.floor(h).toLong
          s += math.ceil(h).toLong
        }
      }
      val collectable = mutable.Buffer.empty[Task]
      def triage(t: Task): Option[Task] =
        if (t.lo == t.hi) { // all duplicates of one value
          t.ranks.foreach(k => resolved((c, t.gi, k)) = t.lo); None
        } else if (t.cnt <= collectThreshold) { collectable += t; None }
        else Some(t)

      var active: Seq[Task] = needed.toSeq.flatMap { case (gi, ranks) =>
        val st = stat((c, gi))
        // resolve non-finite ranks directly from the class counts
        // (rank order: ni × -Inf, finite, pi × +Inf, nan × NaN)
        val finiteRanks = ranks.toSet.filter { k =>
          if (k < st.ni) {
            resolved((c, gi, k)) = Double.NegativeInfinity; false
          } else if (k >= st.n - st.nan) {
            resolved((c, gi, k)) = Double.NaN; false
          } else if (k >= st.n - st.nan - st.pi) {
            resolved((c, gi, k)) = Double.PositiveInfinity; false
          } else true
        }
        if (finiteRanks.isEmpty) None
        else triage(Task(gi, st.lo, st.hi, st.ni, st.finCnt, finiteRanks))
      }
      var passes = 0
      while (active.nonEmpty && passes < maxPasses) {
        passes += 1
        val ids = active.zipWithIndex.map { case (t, i) =>
          (i, t.gi, t.lo, t.hi)
        }
        val width = (col("__rhi") - col("__rlo")) / bins
        // clamp in LONG space BEFORE the Int cast: a subnormal-width
        // range underflows `width` to 0.0, (v-lo)/0.0 → Inf, floor →
        // Long.MaxValue — casting that to Int first would throw
        // CAST_OVERFLOW under Spark 4's default ANSI mode. Clamped,
        // the degenerate range just stops narrowing and lands in the
        // maxPasses collect fallback (correct, bounded by the range
        // count), instead of crashing the job.
        val bin = when(col("__rhi") === col("__rlo"), 0)
          .otherwise(least(lit((bins - 1).toLong), greatest(lit(0L),
            floor((col("__v") - col("__rlo")) / width))).cast(IntegerType))
        val hist = joined(c, ids)
          .groupBy(col("__rid"), bin.as("__bin"))
          .agg(count(lit(1)).as("__c"), min("__v").as("__bmin"),
            max("__v").as("__bmax"))
          .collect()
          .groupBy(_.getAs[Int]("__rid"))
        // narrow every wanted rank to its bin's observed [bmin, bmax]
        val children = mutable.Map.empty[(Int, Double, Double), Task]
        // Every pass RE-SCANS the input; the rank bookkeeping is only
        // valid when each range re-scans to the same rows. A
        // nondeterministic input (rand()/uuid() columns, a source
        // mutated mid-query) breaks that — fail with the diagnosis
        // instead of silently returning a wrong quantile.
        def scanDrift(what: String) = new IllegalStateException(
          s"exact-quantile refinement saw $what between passes — the " +
            "input is not scan-stable (nondeterministic columns or a " +
            "concurrently-mutated source); cache() or materialize the " +
            "input first")
        for ((t, i) <- active.zipWithIndex) {
          val bs = hist.getOrElse(i, throw scanDrift(
            s"a ${t.cnt}-row range re-scan to zero rows"))
            .map(r => (r.getAs[Int]("__bin"),
            r.getAs[Long]("__c"), r.getAs[Double]("__bmin"),
            r.getAs[Double]("__bmax"))).sortBy(_._1)
          var cum = 0L
          val cums = bs.map { b => val below = cum; cum += b._2; (b, below) }
          for (k <- t.ranks) {
            val j = k - t.offset // local 0-based rank inside this range
            val ((_, bc, bmin, bmax), below) =
              cums.find { case ((_, c0, _, _), below0) =>
                j < below0 + c0
              }.getOrElse(throw scanDrift(
                s"rank $k outside its range's histogram (range count " +
                  s"${t.cnt}, re-scanned total $cum)"))
            val key = (t.gi, bmin, bmax)
            val child = children.get(key) match {
              case Some(prev) => prev.copy(ranks = prev.ranks + k)
              case None =>
                Task(t.gi, bmin, bmax, t.offset + below, bc, Set(k))
            }
            children(key) = child
          }
        }
        active = children.values.toSeq.flatMap(triage)
      }
      // fp narrowing is ~bins× per pass, so maxPasses is unreachable
      // in practice; if hit, fall back to collecting what remains
      collectable ++= active
      histPasses = math.max(histPasses, passes)

      if (collectable.nonEmpty) {
        val ids = collectable.zipWithIndex.map { case (t, i) =>
          (i, t.gi, t.lo, t.hi)
        }
        val vals = joined(c, ids.toSeq)
          .select(col("__rid"), col("__v")).collect()
          .groupBy(_.getInt(0))
          .map { case (rid, rows) =>
            rid -> rows.map(_.getDouble(1)).sorted
          }
        for ((t, i) <- collectable.zipWithIndex) {
          val sortedVals = vals(i)
          maxRangeRows = math.max(maxRangeRows, sortedVals.length.toLong)
          totalCollected += sortedVals.length
          t.ranks.foreach { k =>
            resolved((c, t.gi, k)) = sortedVals((k - t.offset).toInt)
          }
        }
      }
    }

    // ---- assemble: one output row per group, DuckDB's interpolation
    val outRows = groups.indices.map { gi =>
      val qs = reqs.map { r =>
        stat.get((r.valueCol, gi)) match {
          case None => null
          case Some(st) =>
            val h = r.p * (st.n - 1).toDouble
            val kLo = math.floor(h).toLong
            val kHi = math.ceil(h).toLong
            val vLo = resolved((r.valueCol, gi, kLo))
            val v = if (kLo == kHi) vLo
            else vLo + (resolved((r.valueCol, gi, kHi)) - vLo) * (h - kLo)
            java.lang.Double.valueOf(v)
        }
      }
      Row.fromSeq(groups(gi) ++ qs)
    }
    val outSchema = StructType(groupCols.map(df.schema(_)) ++
      reqs.map(r => StructField(r.outName, DoubleType, nullable = true)))
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1), outSchema)
    (out, Stats(histPasses, maxRangeRows, totalCollected))
  }
}
