package graft.plans

import graft.SpecBase
import graft.plans.sky.skyDist
import org.apache.spark.sql.functions._

import scala.util.Random

/** The optimizer rule must turn the naive cross join + sky_dist filter
  * into the blocked two-channel plan WITHOUT changing a single result
  * row — verified against a driver-side brute force on a fixture with
  * polar points (the cap-channel case). */
class AutoSpatialJoinSpec extends SpecBase {
  import spark.implicits._

  private val rnd = new Random(11)
  private val as: Seq[(Long, Double, Double)] = ((0L until 250L).map { i =>
    (i, rnd.nextDouble() * 360,
      math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1)))
  }) ++ Seq((900L, 10.0, 89.6), (901L, 200.0, -89.3))
  private val bs: Seq[(Long, Double, Double)] = as.map { case (i, lon, lat) =>
    (i + 1000, lon + 0.02 * rnd.nextDouble(),
      math.max(-89.9, math.min(89.9, lat + 0.02 * rnd.nextDouble())))
  } ++ Seq((2000L, 180.0, 0.0))

  private def hav(l1: Double, b1: Double, l2: Double, b2: Double): Double = {
    val dLat = math.toRadians(b2 - b1); val dLon = math.toRadians(l2 - l1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(b1)) * math.cos(math.toRadians(b2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    math.toDegrees(2 * math.asin(math.sqrt(a)))
  }

  private def brute(r: Double): Set[(Long, Long)] =
    (for {
      (ai, alon, alat) <- as
      (bi, blon, blat) <- bs
      if hav(alon, alat, blon, blat) <= r
    } yield (ai, bi)).toSet

  private lazy val aDf = as.toDF("a_id", "a_lon", "a_lat")
  private lazy val bDf = bs.toDF("b_id", "b_lon", "b_lat")

  private def naive(r: Double) =
    aDf.crossJoin(bDf).where(skyDist(col("a_lon"), col("a_lat"),
      col("b_lon"), col("b_lat")) <= r)

  test("sky_dist evaluates standalone (no rule): matches brute force") {
    val got = naive(0.05).select("a_id", "b_id").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(got == brute(0.05))
  }

  test("rule rewrites the cross join away and preserves every row") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AutoSpatialJoin
    // Codegen must genuinely compile — fallback=false turns the silent
    // interpreted-eval fallback (r15: the 9-slot neighbor tree blew
    // Janino's 64 KB method limit inside generate_doConsume) into a
    // hard test failure. NeighborCells keeps the generated code to one
    // static call, so the blocked plan compiles.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      for (r <- Seq(0.05, 0.5)) {
        val df = naive(r)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"r=$r: cartesian must be rewritten away:\n${plan.take(2000)}")
        assert(plan.contains("Generate explode") || plan.contains("Explode"),
          "blocked plan must carry the neighbor-cell explode")
        val got = df.select("a_id", "b_id").collect()
          .map(row => (row.getLong(0), row.getLong(1))).toSet
        assert(got == brute(r), s"r=$r result mismatch")
      }
      // extra conjuncts survive the rewrite
      val extra = aDf.crossJoin(bDf)
        .where(skyDist(col("a_lon"), col("a_lat"),
          col("b_lon"), col("b_lat")) <= 0.5 && col("a_id") % 2 === 0)
      val got = extra.select("a_id", "b_id").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(got == brute(0.5).filter(_._1 % 2 == 0))
      // an INCIDENTAL cross-side equality must not suppress the
      // rewrite (the r16-advice case: a low-cardinality key like
      // source=source makes the hash join near-cartesian, so the
      // blocked plan is still the right one; the guard only skips
      // the rule's OWN generated signature)
      val aP = aDf.withColumn("a_par", col("a_id") % 2)
      val bP = bDf.withColumn("b_par", col("b_id") % 2)
      val withEq = aP.crossJoin(bP)
        .where(skyDist(col("a_lon"), col("a_lat"),
          col("b_lon"), col("b_lat")) <= 0.5 &&
          col("a_par") === col("b_par"))
      val eqPlan = withEq.queryExecution.executedPlan.toString
      assert(eqPlan.contains("Generate explode") || eqPlan.contains("Explode"),
        "incidental equality must still get the blocked rewrite:\n" +
          eqPlan.take(2000))
      val gotEq = withEq.select("a_id", "b_id").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(gotEq == brute(0.5).filter(p => p._1 % 2 == p._2 % 2))
      // out-of-scope shapes are left alone (radius > 1 degree)
      val big = naive(5.0)
      assert(big.queryExecution.optimizedPlan.toString.contains("Join Cross") ||
        big.queryExecution.executedPlan.toString.contains("CartesianProduct") ||
        big.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(big.select("a_id", "b_id").collect().length == brute(5.0).size)
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AutoSpatialJoin)
    }
  }

  test("incidental signum()=signum() equality still gets the rewrite") {
    // the r17-advice false positive: the old guard treated ANY
    // signum=signum conjunct as the rule's own cap-channel signature,
    // so a user spatial join carrying an unrelated signum equality
    // silently lost the blocked rewrite and ran as a cartesian. The
    // precise guard matches signum over the sky_dist conjunct's OWN
    // lat expressions only.
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AutoSpatialJoin
    try {
      val aP = aDf.withColumn("a_src", col("a_id") % 3 - 1)
      val bP = bDf.withColumn("b_src", col("b_id") % 3 - 1)
      val df = aP.crossJoin(bP).where(
        skyDist(col("a_lon"), col("a_lat"),
          col("b_lon"), col("b_lat")) <= 0.5 &&
          signum(col("a_src")) === signum(col("b_src")))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"user signum equality suppressed the rewrite:\n${plan.take(2000)}")
      assert(plan.contains("Generate explode") || plan.contains("Explode"))
      val got = df.select("a_id", "b_id").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      val want = brute(0.5).filter { case (ai, bi) =>
        math.signum((ai % 3 - 1).toDouble) ==
          math.signum((bi % 3 - 1).toDouble)
      }
      assert(got == want, s"row mismatch (${got.size} vs ${want.size})")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AutoSpatialJoin)
    }
  }

  test("property: repeated optimization stabilizes, never re-rewrites") {
    // The guard in AutoSpatialJoin.rewrite must prevent the rule from
    // re-matching its own output on LATER optimizer executes (cached
    // plan re-optimization; and within the injected fixed-point batch,
    // property-checked the same way in tools.ExtensionsSmoke, forked
    // by ExtensionsForkSpec). Via extraOptimizations the rewrite lands
    // AFTER the main batches, so a second execute legitimately pushes
    // the refine filter into the generated joins (a real plan change);
    // the property is therefore:
    //  (a) the rewrite count (neighbor-cell Generates) never grows —
    //      a re-match would double it; and
    //  (b) a third execute is an exact fixed point of the second.
    // Shapes sweep radius, an incidental cross-side equality, an
    // extra local conjunct, and both join orientations.
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AutoSpatialJoin
    try {
      val rnd = new Random(23)
      for (i <- 0 until 20) {
        val r = 0.01 + rnd.nextDouble() * 0.9
        val base = if (i % 2 == 0) aDf.crossJoin(bDf) else bDf.crossJoin(aDf)
        var cond = skyDist(col("a_lon"), col("a_lat"),
          col("b_lon"), col("b_lat")) <= r
        if (i % 3 == 0) cond = cond && (col("a_id") % 2 === col("b_id") % 2)
        if (i % 4 == 0) cond = cond && col("a_id") > 0
        def generates(p: org.apache.spark.sql.catalyst.plans.logical
            .LogicalPlan): Int = p.collect {
          case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
        }.size
        val p1 = base.where(cond).queryExecution.optimizedPlan
        val p2 = spark.sessionState.optimizer.execute(p1)
        val p3 = spark.sessionState.optimizer.execute(p2)
        assert(generates(p1) == 1,
          s"i=$i r=$r: expected exactly one rewrite, got:\n$p1")
        assert(generates(p2) == 1 && generates(p3) == 1,
          s"i=$i r=$r: re-rewrite detected (Generate count grew):\n$p2")
        assert(p3.canonicalized == p2.canonicalized,
          s"i=$i r=$r: not a fixed point after pushdown:\n$p3\nvs\n$p2")
      }
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == AutoSpatialJoin)
  }
}
