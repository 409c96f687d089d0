package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Guardrails on physical-plan shape — the properties that decide
  * whether a query survives a 100× scale-up (SURVEY.md §4): filters
  * and projections must reach the Parquet scan, dims must broadcast,
  * aggregates must partial-aggregate map-side, and shuffle counts must
  * not exceed what the operator semantically needs.
  */
class PlanQualitySpec extends SpecBase {

  private def planOf(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def initialPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
  private def countShuffles(df: DataFrame): Int =
    initialPlan(df).collect { case _: ShuffleExchangeExec => 1 }.sum

  test("q_filter pushes predicates into the parquet scan") {
    val plan = planOf(Core.qFilter.fn(spark, sfDir))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("l_returnflag"), "filter column must be pushed")
  }

  test("q_project prunes the scan to referenced columns only") {
    val df = Core.qProject.fn(spark, sfDir)
    val scanSchema = planOf(df)
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // 11-column lineitem pruned to the 5 referenced columns
    assert(scanSchema.contains("l_orderkey"))
    assert(!scanSchema.contains("l_shipdate"),
      s"unreferenced column not pruned: $scanSchema")
  }

  test("q_agg_basic plans two-phase hash aggregation (map-side partial)") {
    val df = Aggregates.qAggBasic.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("partial_sum"), "expected map-side partial agg")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final HashAggregate")
    // codegen stage markers (*(n)) appear once AQE finalizes the plan;
    // count() would build a different query, so execute df itself
    df.collect()
    assert(planOf(df).contains("*("), "agg must stay codegen'd")
  }

  test("q_join_multi broadcasts dims — the fact side never shuffles") {
    val df = Joins.qJoinMulti.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"))
    // shuffles: only the final 25-group aggregate exchange + sort (≤3),
    // never a fact-table join shuffle (which would add exchanges on
    // l_orderkey)
    assert(countShuffles(df) <= 3, s"too many shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "fact join must be broadcast, not sort-merge")
  }

  test("q_join_inner joins without shuffling the large side (broadcast)") {
    val plan = planOf(Joins.qJoinInner.fn(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q_scan/q_agg_global read lineitem with exactly zero pre-agg shuffles") {
    assert(countShuffles(Aggregates.qAggGlobal.fn(spark, sfDir)) <= 1)
  }

  test("q_topk plans TakeOrderedAndProject, not a full sort") {
    val plan = planOf(SetOps.qTopk.fn(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("q_cosine_topk: probe side broadcast, corpus scan shuffle-free before window") {
    val df = VectorOps.qCosineTopk.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(plan.contains("dot_fold"), "codegen'd kernel must appear in plan")
  }

  test("q_pruned_scan pushes the time-range predicate to parquet") {
    val plan = planOf(Core.qPrunedScan.fn(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(ts)") ||
      plan.contains("GreaterThanOrEqual(ts"),
      s"ts range must be pushed:\n${plan.linesIterator.filter(_.contains("Pushed")).mkString("\n")}")
  }

  test("q_footprint_cells gets DIRECTORY-level PartitionFilters on cell") {
    val plan = planOf(Joins.qFootprintCells.fn(spark, sfDir))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("cell"),
      s"polygonCells must prune sky directories:\n$pf")
  }

  test("q_ql_bounds: the QL bound prunes cell directories") {
    // the bounds argument must surface as PartitionFilters on the
    // layout scan — the whole point of query-time bounds is that
    // untouched sky is never opened, at the QL surface too
    val df = Joins.qQlBounds.fn(spark, sfDir)
    val pf = planOf(df).linesIterator
      .filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("cell"),
      s"bounded QL read must prune cell= directories:\n$pf")
  }

  test("q_ql_bounds_poly: the polygon bound prunes cell directories") {
    val df = Joins.qQlBoundsPoly.fn(spark, sfDir)
    val pf = planOf(df).linesIterator
      .filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("cell"),
      s"polygon-bounded QL read must prune cell= directories:\n$pf")
  }

  test("q_ql_bounds_pair: cone prunes cells AND the interval pushes to the scan") {
    // discriminating forms only: a no-pruning plan still prints
    // "PartitionFilters: []" with cell in the output attribute list,
    // and the scan line always CONTAINS "ts" (output attrs/ReadSchema)
    // whether or not the filter pushed — prefix-match the filter list
    // itself (the line-522 idiom)
    val df = Joins.qQlBoundsPair.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters: [cell"),
      s"space half must prune cell= directories:\n${plan.take(3000)}")
    // one discriminating pushed predicate is the evidence (the plan
    // string TRUNCATES long PushedFilters lists, so the LessThan twin
    // may be cut off even when pushed)
    assert(plan.contains("GreaterThanOrEqual(ts"),
      s"time half must push to the scan:\n${plan.take(3000)}")
  }

  test("q_ql_survey: bounded + xmatch + agg composition keeps every shape") {
    // the flagship composition must inherit all three pins at once:
    // the cone prunes the layout's cell directories, the declared
    // relation stays cell-blocked (no cartesian), and the per-object
    // aggregate is partial+final (map-side combine before the shuffle)
    val df = Joins.qQlSurvey.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters: [cell"),
      s"bound lost directory pruning:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"),
      s"relation lowered to a cartesian:\n${plan.take(2000)}")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"aggregate lost the partial phase:\n${plan.take(2000)}")
  }

  test("q_ql_xmatch: the QL spatial join is cell-blocked, no cartesian") {
    // the declared radius relation must lower to the blocked
    // CrossMatch shape — an equi-join on the blocking cell plus the
    // rank window, never a cartesian of the two catalogs
    for (q <- Seq(Joins.qQlXmatch, Joins.qQlXmatchOuter)) {
      val plan = planOf(q.fn(spark, sfDir))
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} lowered to a cartesian:\n${plan.take(2000)}")
      assert(plan.contains("Window"), s"${q.name} lost the rank window")
    }
  }

  test("q_ql_bounds_time: the QL time bound prunes t_bucket directories") {
    val df = Core.qQlBoundsTime.fn(spark, sfDir)
    val pf = planOf(df).linesIterator
      .filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("t_bucket"),
      s"time-bounded QL read must prune t_bucket= directories:\n$pf")
  }

  test("q_ql_xmatch_margin routes through the stored margin cache: " +
    "no explode, no exchange under the corpus scan") {
    val df = Joins.qQlXmatchMargin.fn(spark, sfDir)
    val plan = planOf(df)
    // the margin layout is actually in the plan (route fired, not a
    // silent fallback — rows would be identical either way)
    assert(plan.contains("supplier_sky"),
      s"stored margin layout missing from the scan set:\n${plan.take(2000)}")
    // no query-time neighbor explode: the on-the-fly blocking path
    // shows Generate(explode(neighbor_cells_within(...))); the margin
    // route must not (the replication happened at write time)
    assert(!plan.contains("Generate"),
      s"margin route must not explode the catalog at query time:\n" +
        plan.linesIterator.filter(_.contains("Generate"))
          .mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
    // LSD's economics: the STORED catalog is never shuffled — every
    // ShuffleExchange in the plan sits above a join (pair-table rank
    // window, attach joins), never directly over the corpus scan
    val rawCorpusShuffles = initialPlan(df).collect {
      case e: ShuffleExchangeExec
        if e.toString.contains("supplier_sky") &&
          !e.toString.contains("Join") => e
    }
    assert(rawCorpusShuffles.isEmpty,
      s"stored catalog rows were shuffled pre-join:\n" +
        rawCorpusShuffles.map(_.toString.take(800)).mkString("\n---\n"))
  }

  test("q_ql_snapshot_margin routes through the LIVE catalog's " +
    "point-in-time cache: _margincache scan, no explode") {
    val df = Joins.qQlSnapshotMargin.fn(spark, sfDir)
    val plan = planOf(df)
    // the stamped point-in-time cache is the scan set (route fired —
    // a silent fallback to blocking over the commit-log read would
    // still hash-match, so the PLAN is the test)
    assert(plan.contains("_margincache"),
      s"point-in-time margin cache missing from the scan set:\n" +
        plan.take(2000))
    assert(!plan.contains("Generate"),
      "the declared xmatch must not explode the snapshot catalog at " +
        "query time")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_ql_survey_margin: BOTH write-time tricks live in one plan — " +
    "cell-dir pruning AND margin routing") {
    val df = Joins.qQlSurveyMargin.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters: [cell"),
      s"the cone bound lost directory pruning:\n${plan.take(2000)}")
    assert(!plan.contains("Generate"),
      "the declared xmatch must route through the stored margin cache")
    assert(!plan.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "the survey aggregate lost its partial phase")
  }

  test("q_xmatch_margin scans the cache as flat files (no cell= dirs)") {
    val (path, _) = Joins.ensureXmatchMarginCache(spark, sfDir)
    val entries = new java.io.File(path).listFiles()
    assert(entries != null && !entries.exists(f =>
      f.isDirectory && f.getName.startsWith("cell=")),
      "margin cache must be clustered plain parquet, not directory-per-cell")
  }

  test("q_xmatch_temporal: broadcast probe, no cartesian, no dedup pass") {
    val df = Joins.qXmatchTemporal.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"),
      "bounded probe batch must broadcast")
    assert(!plan.contains("HashAggregate(keys=[a_id"),
      "product-grid blocking must not need a dedup aggregation")
  }

  test("q_xmatch_auto: the optimizer rule removes the cartesian") {
    val df = Joins.qXmatchAuto.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"AutoSpatialJoin must have rewritten the cross join:\n" +
        plan.linesIterator.take(15).mkString("\n"))
  }

  test("q_quantize_embed keeps the codegen'd dot kernel on double arrays") {
    val plan = planOf(VectorOps.qQuantizeEmbed.fn(spark, sfDir))
    assert(plan.contains("dot_fold"),
      "quantized search must use the codegen kernel, not a boxed fold")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), "probe side must broadcast")
  }

  test("q_pack_sequences: one window shuffle + output sort, nothing more") {
    val df = TextOps.qPackSequences.fn(spark, sfDir)
    assert(countShuffles(df) <= 2, s"packing must be one cumsum shuffle:\n" +
      planOf(df))
  }

  test("q_ql_derived: derived-table filter pushes to the scan, dim broadcasts") {
    // the inline-subquery spelling must optimize exactly like the CTE
    // spelling: Catalyst sees through the scope splice, so the
    // subquery's WHERE reaches the orders parquet scan and customer
    // stays on the broadcast side
    val plan = planOf(Windows.qQlDerived.fn(spark, sfDir))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(o_totalprice,150000"),
      s"derived-table filter must reach the scan:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"customer must broadcast:\n${plan.take(3000)}")
  }

  test("q_ql_topk: QUALIFY lowering gets map-side WindowGroupLimit") {
    // the QL QUALIFY rn <= k rewrite must stay recognizable to
    // Spark's InferWindowGroupLimit: Partial WindowGroupLimit below
    // the exchange caps what shuffles at <= k rows per group per
    // input partition — the property that makes QL top-k-per-group
    // scale. A lowering change that obscures the Filter-over-
    // row_number shape would silently lose this.
    val plan = planOf(Windows.qQlTopk.fn(spark, sfDir))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected Partial+Final WindowGroupLimit:\n${plan.take(3000)}")
    assert(plan.contains("Partial"),
      s"partial (map-side) group limit missing:\n${plan.take(3000)}")
  }

  test("q_pipeline_e2e: one corpus FileScan, 2 semantic shuffles, no joins") {
    // 4 composed stages (gate → keep-best dedup → split → packing)
    // must not introduce re-scans or join-backs: the corpus is read
    // ONCE, the dedup groupBy and the packing window are the only
    // shuffles (plus the presentation sort), and no join operator
    // appears anywhere (max_by carries the kept member's attributes).
    val df = PipelineOps.qPipelineE2e.fn(spark, sfDir)
    val plan = planOf(df)
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"composition must read the corpus exactly once:\n${plan.take(3000)}")
    assert(countShuffles(df) <= 3, // dedup agg + packing window + sort
      s"stage composition added shuffles:\n${plan.take(3000)}")
    assert(!plan.contains("Join"),
      s"no stage needs a join; a join means a re-scan sneaked in:\n" +
        plan.take(3000))
  }

  test("q_object_catalog: cell-blocked FoF, no cartesian, broadcast labels") {
    // the FoF pair generation must stay the blocked CrossMatch shape
    // (equi-join on SkyPix cells) — a cartesian self-join of the
    // detection table is the failure mode that cannot survey-scale —
    // and at this SF the component labels must come back as a
    // broadcast relation (Components small-graph fast path), so the
    // only semantic shuffle is the per-object mean aggregation.
    val df = operators.SurveyOps.qObjectCatalog.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"FoF pairs must be cell-blocked, not cartesian:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"labels must broadcast at this SF:\n${plan.take(3000)}")
  }

  test("q_dedup_clusters plans no cartesian products") {
    val plan = planOf(TextOps.qDedupClusters.fn(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      "cluster assignment must stay equi-join shaped")
  }

  test("q_bpe_train: corpus read once, rounds reuse the pair-agg exchange, top-1 is TakeOrdered") {
    // the pin targets the TRAINING plan (what ensureBpeArtifact's
    // build executes); qBpeTrain.fn itself now reads the materialized
    // rule table — see the q_bpe_encode pin for the serve-side shape
    val df = PipelineOps.bpeTrainFrame(spark, sfDir)
    df.collect() // finalize AQE: ReusedExchange only exists at runtime
    val plan = planOf(df)
    // the corpus parquet never appears: the word-frequency table is
    // localCheckpointed once and every round scans the RDD
    assert(!plan.contains("FileScan") && plan.contains("Scan ExistingRDD"),
      "rounds must scan the checkpointed vocab, not re-read the corpus")
    assert(plan.contains("TakeOrderedAndProject(limit=1"),
      "per-round argmax must be top-1, not a full sort")
    assert(plan.contains("partial_sum"),
      "pair counts must partial-aggregate map-side")
    assert(plan.contains("ReusedExchange"),
      "the merges branch and the w-chain must share the pair-agg exchange")
    assert(!plan.contains("CartesianProduct"),
      "the 1-row rule join must broadcast")
  }

  test("q_bpe_encode: corpus side is join-free map-only — one FileScan, partial agg") {
    val df = PipelineOps.qBpeEncode.fn(spark, sfDir)
    df.collect()
    val plan = planOf(df)
    // exactly one corpus read: the encode stream (rules fold in as
    // LITERALS off the trained artifact); count in the FINAL plan
    // only — AQE's toString repeats the tree as "== Initial Plan =="
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("FileScan".r.findAllIn(finalPlan).size == 1,
      s"expected exactly 1 FileScan:\n${finalPlan.take(3000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "per-doc counts must partial-aggregate map-side")
    // the serve side must stay JOIN-FREE: a regression reintroducing
    // per-round rule joins (broadcast or otherwise) re-couples every
    // corpus pass to training
    assert(!finalPlan.contains("Join"),
      s"literal-rule encode must plan no joins:\n${finalPlan.take(3000)}")
  }

  test("q_bpe_vocab: reads the trained artifact, never the corpus; top-50 is TakeOrdered") {
    val df = PipelineOps.qBpeVocab.fn(spark, sfDir)
    df.collect()
    val plan = planOf(df)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // exactly one scan and it is the vocab artifact — the corpus
    // parquet never appears (training amortized into ensureBpeArtifact)
    assert("FileScan".r.findAllIn(finalPlan).size == 1 &&
      finalPlan.contains("vocab.parquet") &&
      !finalPlan.contains("documents.parquet"),
      s"vocab must run off the trained artifact only:\n${finalPlan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-50 must be TakeOrdered, not a full sort")
  }

  test("q_pq_recall: both arms broadcast the probe side — corpus never shuffles pre-window") {
    val df = VectorOps.qPqRecall.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "probe/candidate sides must broadcast against the corpus")
    assert(!plan.contains("CartesianProduct"),
      "brute-force arm must be a broadcast pass, not a shuffled cartesian")
  }

  test("q_decontaminate broadcasts the eval shingles — corpus side never shuffles pre-agg") {
    val df = PipelineOps.qDecontaminate.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      "eval shingle set must broadcast (corpus side stays in place)")
    assert(plan.contains("partial_count"),
      "hit counts must partial-aggregate map-side")
    // shuffles: eval-distinct (tiny), final per-doc agg, output sort —
    // the exploded CORPUS must never shuffle before its aggregate
    assert(countShuffles(df) <= 3, s"unexpected shuffles:\n$plan")
  }

  test("q_lightcurve is one two-phase hash aggregate on the object key") {
    val df = PipelineOps.qLightcurve.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("partial_count") && plan.contains("partial_min"),
      "flux stats must partial-aggregate map-side")
    assert(countShuffles(df) <= 2, // agg exchange + output sort
      s"light curves need exactly one agg shuffle:\n$plan")
  }

  test("q_tfidf broadcasts the term-df dimension") {
    val plan = planOf(PipelineOps.qTfidf.fn(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "df-per-term must broadcast against the tf side")
    assert(!plan.contains("CartesianProduct"),
      "the 1-row n_docs factor must broadcast, not cartesian")
  }

  test("q_partition_prune gets DIRECTORY-level PartitionFilters on t_bucket") {
    val plan = planOf(Core.qPartitionPrune.fn(spark, sfDir))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("t_bucket"),
      s"t_bucket range must prune directories, not just rows:\n$pf")
    // the exact ts predicate must ALSO reach the row-group reader
    assert(plan.contains("GreaterThanOrEqual(ts") ||
      plan.contains("PushedFilters: [IsNotNull(ts)"), "ts pushdown lost")
  }

  test("q_join_bucketed: bucket layout replaces the join+agg shuffles") {
    val df = Joins.qJoinBucketed.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // both scans carry HashPartitioning(custkey, 8) from the buckets:
    // the join consumes it, the groupBy reuses it — the only exchange
    // in the whole plan is the presentation sort's range partition
    assert(countShuffles(df) <= 1,
      s"bucketed join+agg must not exchange data:\n$plan")
  }

  test("q_snapshot_delta scans only the increment's snap directory") {
    val df = Core.qSnapshotDelta.fn(spark, sfDir)
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("snap=3")),
      s"incremental read must touch only the delta:\n${files.mkString("\n")}")
  }

  test("q_incremental_agg refresh cost is O(delta)+O(state): no history scan") {
    val df = Core.qIncrementalAgg.fn(spark, sfDir)
    df.collect()
    val files = df.inputFiles
    assert(files.exists(_.contains("graft_agg_state")),
      s"must read the materialized state:\n${files.mkString("\n")}")
    assert(files.exists(_.contains("snap=3")),
      s"must read the delta commit:\n${files.mkString("\n")}")
    assert(!files.exists(f => f.contains("snap=1/") || f.contains("snap=2/")),
      s"history snaps must NOT be rescanned:\n${files.mkString("\n")}")
  }

  test("q_snapshot_prune drops the low-range snap dirs via the zone map") {
    val df = Core.qSnapshotPrune.fn(spark, sfDir)
    val files = df.inputFiles
    // quartile appends 1..4; the top-half range needs only 3 and 4
    assert(files.nonEmpty &&
      files.forall(f => f.contains("snap=3") || f.contains("snap=4")),
      s"zone-map read must skip snap=1,2:\n${files.mkString("\n")}")
  }

  test("q_snapshot_bloom prunes dirs the zone map provably cannot") {
    val df = Core.qSnapshotBloom.fn(spark, sfDir)
    val path = Core.ensureKeyedSnapshotEvents(spark, sfDir)
    val es = graft.sources.Snapshots.entries(spark, path)
    val key = es.flatMap(_.stats.get("user_id")).map(_._2).max.toLong / 2
    // zone maps are useless here BY CONSTRUCTION: the probed key is
    // inside every directory's recorded [min, max]
    assert(es.forall(_.stats.get("user_id").exists { case (mn, mx) =>
      mn <= key && key <= mx }))
    // the bloom-predicted scan set is exactly what the read touches —
    // and it's a strict subset of the 4 appends (the key lives in one
    // dir; deterministic false positives may add, never remove)
    val predicted = es.filter(_.blooms("user_id")
      .mightContain(key.toString)).map(e => s"snap=${e.id}").toSet
    val touched = df.inputFiles
      .map(f => "snap=" + f.split("/snap=")(1).takeWhile(_ != '/')).toSet
    assert(touched == predicted, s"$touched vs $predicted")
    assert(predicted.size < es.size,
      s"bloom must prune at least one of ${es.size} dirs")
  }

  test("q_redact_pii is map-only: no shuffle except the output sort") {
    val df = PipelineOps.qRedactPii.fn(spark, sfDir)
    // the redaction pass itself must add no exchange: the only
    // shuffle in the whole plan is the presentation orderBy's range
    // exchange — at 100 TB you drop the sort and it's scan→write
    assert(countShuffles(df) <= 1,
      s"redaction must not shuffle:\n${planOf(df)}")
    assert(!planOf(df).contains("CartesianProduct"))
  }

  test("q_skymap is one two-phase hash aggregate on the packed cell") {
    val df = SurveyOps.qSkymap.fn(spark, sfDir)
    val plan = planOf(df)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate:\n$plan")
    // one agg exchange + the presentation sort — the 100-TB shape
    // (reduce side bounded by 4^level cells regardless of input rows)
    assert(countShuffles(df) <= 2, s"too many shuffles:\n$plan")
  }

  test("q_sigma_clip: stats window and clipped agg share one hash partitioning") {
    val df = SurveyOps.qSigmaClip.fn(spark, sfDir)
    // window on user_id + groupBy user_id + output sort: the window's
    // exchange is REUSED by the aggregate (same key), so ≤2 total
    assert(countShuffles(df) <= 2,
      s"clip must not re-shuffle between window and agg:\n${planOf(df)}")
  }

  test("q_xmatch_pm: blocked two-channel join, no cartesian on the big side") {
    val df = SurveyOps.qXmatchPm.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"pm xmatch must stay cell-blocked:\n$plan")
    // the only nested-loop allowed is the (empty-here) polar-cap
    // channel, which broadcasts the small side
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      !plan.contains("NestedLoop"))
  }

  test("q_dedup_prefix: candidates come from equi-joins only") {
    val df = PipelineOps.qDedupPrefix.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"prefix join must not plan a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join must not plan a nested-loop join:\n$plan")
  }

  test("q_url_normalize: Expand-free aggregation ladder, map-side combined") {
    val df = PipelineOps.qUrlNormalize.fn(spark, sfDir)
    val plan = planOf(df)
    // the ladder (domain,url,canon)→(domain,canon)→(domain) + output
    // sort = 4 exchanges of strictly shrinking data, each preceded by
    // a partial aggregate; the anti-shape it replaced is ONE fewer
    // shuffle but an Expand (×3 row multiplication through the first
    // aggregate — the 100 TB killer)
    assert(countShuffles(df) <= 4, s"too many shuffles:\n$plan")
    assert(!plan.contains("Expand"),
      s"multi-distinct Expand must not reappear:\n$plan")
    assert(plan.contains("partial_"),
      s"every ladder shuffle must be map-side combined:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_ann_disk reads only probed cell= directories of the layout") {
    val df = VectorOps.qAnnDisk.fn(spark, sfDir)
    df.collect()
    val layoutFiles = df.inputFiles.filter(_.contains("/vectors/"))
    assert(layoutFiles.nonEmpty, "search must read the materialized layout")
    assert(layoutFiles.forall(_.contains("cell=")),
      s"every layout read must be cell-pruned:\n${layoutFiles.mkString("\n")}")
    // the probed union is ≤ 8 cells by construction; the pin is that
    // pruning REACHED the scan (PartitionFilters), so a cell the
    // probes don't route to is never opened
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected directory-level cell pruning:\n$plan")
  }

  test("q_ndcg_graded: candidate arm reads only probed cell= dirs") {
    // the rank-sensitive eval must inherit q_ann_disk's physics: the
    // IVF candidates come off the pruned materialized layout, not a
    // full corpus scan
    val df = VectorOps.qNdcgGraded.fn(spark, sfDir)
    df.collect()
    val layoutFiles = df.inputFiles.filter(_.contains("/vectors/"))
    assert(layoutFiles.nonEmpty, "candidates must read the layout")
    assert(layoutFiles.forall(_.contains("cell=")),
      s"layout reads must be cell-pruned:\n${layoutFiles.mkString("\n")}")
    assert(!planOf(df).contains("CartesianProduct"),
      "grading arm is broadcast×corpus, never a cartesian")
  }

  test("q_mrr: probe side broadcasts in both arms, no cartesian") {
    val df = VectorOps.qMrr.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"probes must broadcast against the corpus:\n$plan")
  }

  test("q_isotonic: one corpus scan; minimax runs on the cell relation") {
    val df = PipelineOps.qIsotonic.fn(spark, sfDir)
    val plan = planOf(df)
    // the corpus feeds exactly one parquet scan (into the O(bins)
    // groupBy, then localCheckpointed); every join in the plan is
    // over the <=10-row cell relation (ExistingRDD), never parquet
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") <= 1, s"at most one corpus scan:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "minimax must run off the checkpointed cell relation")
  }

  test("q_dedup_lshcos: banded equi-join, never a cartesian") {
    val df = VectorOps.qDedupLshCos.fn(spark, sfDir)
    val plan = planOf(df)
    // the whole point of the LSH bands: corpus×corpus cosine dedup
    // with NO all-pairs operator anywhere in the plan
    assert(!plan.contains("CartesianProduct"),
      s"LSH dedup must not plan a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"LSH dedup must not plan a nested-loop join:\n$plan")
    // the codegen'd dot kernel carries both signature and verify math
    assert(plan.contains("dot_fold"), "expected DotFold kernel in plan")
  }

  test("q_cadence: one executor-side aggregate, no driver-collected relation") {
    val df = SurveyOps.qCadence.fn(spark, sfDir)
    val plan = planOf(df)
    // The per-object median must be Spark's buffering percentile inside
    // the same groupBy — NOT a driver-side ExactQuantiles pass. A
    // LocalTableScan would betray a collected per-object relation being
    // re-broadcast (the round-11 scale flaw: O(objects) driver state).
    assert(!plan.contains("LocalTableScan"),
      s"q_cadence must not embed a driver-collected relation:\n$plan")
    assert(plan.contains("percentile"),
      "median must be the executor-side percentile aggregate")
    // lag window shuffle + groupBy agg on the same user_id hash
    // partitioning + output sort: nothing beyond those
    assert(countShuffles(df) <= 3, s"too many shuffles:\n$plan")
  }

  test("q_join_bloom: codegen'd might_contain gates the probe scan") {
    val df = Joins.qJoinBloom.fn(spark, sfDir)
    val plan = planOf(df)
    // the bloom gate must be Spark's native BloomFilterMightContain
    // (codegen'd), not a Scala UDF
    assert(plan.contains("might_contain"),
      s"expected native bloom predicate in plan:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("UDF("),
      "bloom gate must not be a UDF")
    // and it must sit on the lineitem (probe) side BEFORE the join:
    // the Filter containing might_contain appears below the join node
    // in the same subtree as the lineitem scan
    val lines = plan.linesIterator.toVector
    val bloomLine = lines.indexWhere(_.contains("might_contain"))
    val scanLine = lines.indexWhere(l =>
      l.contains("FileScan") && l.contains("lineitem"))
    assert(bloomLine >= 0 && scanLine > bloomLine,
      "might_contain must gate the probe-side scan")
  }

  test("q_join_fuzzy: candidates from bucketed pairs, never a cartesian") {
    val df = CurationOps.qJoinFuzzy.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must not plan an all-pairs join:\n$plan")
  }

  test("q_skew_profile: heavy hitters via TakeOrderedAndProject, not a full sort") {
    val df = CurationOps.qSkewProfile.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 keys must be a bounded top-k, got:\n$plan")
    assert(plan.contains("partial_count"), "key counts must partial-agg")
  }

  test("q_gini / q_drift_ks: corpus scan pruned to the value columns") {
    // both diagnostics reduce the corpus to value-domain counts — the
    // scan must read ONLY the involved columns, and no corpus-wide
    // rank/sort may exist (the windows run post-aggregation on the
    // value domain)
    val gini = planOf(CurationOps.qGini.fn(spark, sfDir))
    val giniScan = gini.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(giniScan.contains("n_chars") && !giniScan.contains("text"),
      s"q_gini must scan only n_chars:\n$giniScan")
    val ks = planOf(CurationOps.qDriftKs.fn(spark, sfDir))
    val ksScan = ks.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(ksScan.contains("n_chars") && ksScan.contains("source") &&
      !ksScan.contains("text"),
      s"q_drift_ks must scan only (source, n_chars):\n$ksScan")
    assert(gini.contains("partial_count") && ks.contains("partial_sum"),
      "value-domain counts must partial-aggregate map-side")
  }

  test("q_join_interval: bucketed equi-join, never a theta join") {
    val df = Joins.qJoinInterval.fn(spark, sfDir)
    val plan = planOf(df)
    // interval × interval overlap must ride the day-bucket equi-join;
    // a BroadcastNestedLoopJoin would be the quadratic theta plan
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must not plan all-pairs:\n$plan")
    assert(plan.contains("bucket"), s"expected bucket join key:\n$plan")
  }

  test("q_cluster_kmeans: assignment is map-only — no join, centroids folded") {
    val df = VectorOps.qClusterKmeans.fn(spark, sfDir)
    val plan = planOf(df)
    // centroids are driver literals folded into the dot-product fold:
    // the per-point pass must plan as scan→project→sort with NO join
    // of any kind (the in-engine crossJoin+window alternative would
    // shuffle the corpus per iteration)
    assert(!plan.contains("Join"),
      s"kmeans assignment must not join centroids:\n$plan")
    assert(plan.contains("dot_fold"),
      "assignment must use the codegen'd dot kernel")
    // one range-partition exchange for the output sort, nothing else
    assert(countShuffles(df) <= 1, s"too many shuffles:\n$plan")
  }

  test("q_silhouette: scoring pass is map-only like the kmeans assignment") {
    val df = VectorOps.qSilhouette.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"silhouette scoring must not join centroids:\n$plan")
    assert(plan.contains("dot_fold"),
      "distances must use the codegen'd dot kernel")
    assert(countShuffles(df) <= 1, s"too many shuffles:\n$plan")
  }

  test("q_logreg: scoring pass is map-only off the checkpointed features") {
    // GD rounds run eagerly at build (O(d) collects); the returned
    // plan is scan → constant-folded sigmoid → output sort
    val df = PipelineOps.qLogreg.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"scoring must not join the weight row:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "scoring must run off the checkpointed feature relation")
    assert(countShuffles(df) <= 1, s"too many shuffles:\n$plan")
  }

  test("q_auc: value-domain form — one corpus scan, no join") {
    // corpus touched once (map-only into the score groupBy); the
    // window + final agg run over the bounded distinct-score relation
    val df = PipelineOps.qAuc.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"AUC must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 3, s"too many shuffles:\n$plan")
  }

  test("q_calibration: one scan into an O(bins) agg") {
    val df = PipelineOps.qCalibration.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"calibration must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 2, // bin agg exchange + output sort
      s"too many shuffles:\n$plan")
  }

  test("q_confusion: one scan into an O(1) agg, no join") {
    val df = PipelineOps.qConfusion.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"confusion must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 1, s"too many shuffles:\n$plan")
  }

  test("q_feature_auc: one scan, d-way explode, value-domain AUC per feature") {
    val df = PipelineOps.qFeatureAuc.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"feature AUC must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 4, s"too many shuffles:\n$plan")
  }

  test("q_ndcg: broadcast stats, no cartesian, per-term windows") {
    val df = PipelineOps.qNdcg.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"stats/df must broadcast:\n$plan")
    assert(plan.contains("Broadcast"),
      s"df/stats sides must broadcast:\n$plan")
    assert(countShuffles(df) <= 8, s"too many shuffles:\n$plan")
  }

  test("q_pr_curve: one scan into O(bins) windows, no join") {
    val df = PipelineOps.qPrCurve.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"PR curve must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 3, s"too many shuffles:\n$plan")
  }

  test("q_mutual_info: one scan into O(cells) windows, no join") {
    val df = PipelineOps.qMutualInfo.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"MI must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 6, s"too many shuffles:\n$plan")
  }

  test("q_cv_auc: one scan, per-fold value-domain AUC, no join") {
    val df = PipelineOps.qCvAuc.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"CV AUC must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 4, s"too many shuffles:\n$plan")
  }

  test("q_stump_split: one scan, split search on bin windows, no join") {
    val df = PipelineOps.qStumpSplit.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"stump search must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 5, s"too many shuffles:\n$plan")
  }

  test("q_bootstrap_mean: replicate means checkpoint; no corpus rescan") {
    // the exploded corpus pass runs ONCE at build (localCheckpoint of
    // the 21-row means relation); the returned plan assembles the CI
    // from that tiny relation only
    val df = PipelineOps.qBootstrapMean.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Scan parquet"),
      s"CI assembly must not rescan the corpus:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "CI assembly must run off the checkpointed replicate means")
  }

  test("q_bpe_fertility: corpus side map-only, one FileScan, O(langs) agg") {
    val df = PipelineOps.qBpeFertility.fn(spark, sfDir)
    df.collect()
    val plan = planOf(df)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("FileScan".r.findAllIn(finalPlan).size == 1,
      s"expected exactly 1 FileScan:\n${finalPlan.take(3000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "per-lang counts must partial-aggregate map-side")
  }

  test("q_dup_split_leakage: digest-keyed two-level agg, no join") {
    val df = PipelineOps.qDupSplitLeakage.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"leakage audit must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
  }

  test("q_pareto_front: frontier broadcasts back; no shuffle join") {
    val df = PipelineOps.qParetoFront.fn(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounded frontier must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"corpus must not shuffle for the frontier join:\n$plan")
  }

  test("q_quality_norm: one scan into per-lang value-domain windows") {
    val df = PipelineOps.qQualityNorm.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"norm map must not join:\n$plan")
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"exactly one corpus scan:\n$plan")
    assert(countShuffles(df) <= 3, s"too many shuffles:\n$plan")
  }

  test("q_linreg: scoring pass is map-only off the checkpointed features") {
    val df = PipelineOps.qLinreg.fn(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Join"),
      s"scoring must not join the weight row:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "scoring must run off the checkpointed feature relation")
    assert(countShuffles(df) <= 1, s"too many shuffles:\n$plan")
  }

  test("q_pca_power: projection pass is map-only over one corpus scan") {
    // the Gram pass + d²-sized iterations run eagerly at build time
    // (bounded O(d) collect); the RETURNED plan must be just
    // scan → constant-folded dot → output sort
    val df = VectorOps.qPcaPower.fn(spark, sfDir)
    val plan = planOf(df)
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"expected exactly 1 FileScan:\n$plan")
    assert(!plan.contains("Join"),
      s"projection must not join the eigenvector:\n$plan")
    assert(plan.contains("dot_fold"),
      "projection must use the codegen'd dot kernel")
    // one range-partition exchange for the output sort, nothing else
    assert(countShuffles(df) <= 1, s"too many shuffles:\n$plan")
  }

  test("LsdDb.spread: exchange added on a 1-row-group layout, NO-OP " +
    "on an already-parallel one, exchange-bearing inputs rejected") {
    val dir = java.nio.file.Files.createTempDirectory("spread_spec")
      .toString
    val base = spark.range(0, 1000, 1, 4)
      .selectExpr("id", "id % 7 AS k")
    // 1-row-group file: scans as ONE task → spread must repartition
    base.coalesce(1).write.parquet(s"$dir/one")
    val one = spark.read.parquet(s"$dir/one")
    assert(one.rdd.getNumPartitions == 1, "precondition: 1 scan split")
    val spreadOne = LsdDb.spread(one,
      org.apache.spark.sql.functions.col("k"))
    assert(spreadOne.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "spread must widen a 1-split scan to the cluster parallelism")
    assert(countShuffles(spreadOne) == 1 &&
      initialPlan(spreadOne).toString.contains("REPARTITION_BY_NUM"),
      s"expected one AQE-pinned exchange:\n${planOf(spreadOne)}")
    // multi-split layout (≥ parallelism/2 splits): spread must leave
    // the plan alone — the production no-op contract. Eight files +
    // zeroed open-cost packing give the scan 8 splits on 4 cores.
    base.repartition(8).write.parquet(s"$dir/many")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
      spark.conf.set("spark.sql.files.openCostInBytes", "1048576")
      val many = spark.read.parquet(s"$dir/many")
      assert(many.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism,
        "precondition: already-parallel scan")
      val spreadMany = LsdDb.spread(many,
        org.apache.spark.sql.functions.col("k"))
      assert(countShuffles(spreadMany) == 0,
        s"spread must be a NO-OP on a parallel layout:\n" +
          planOf(spreadMany))
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
    // exchange-bearing input: the split probe would materialize the
    // upstream shuffle (Dataset.rdd under AQE) — must throw, loudly
    val agged = one.groupBy("k").count()
    val e = intercept[IllegalArgumentException] {
      LsdDb.spread(agged, org.apache.spark.sql.functions.col("k"))
    }
    assert(e.getMessage.contains("exchange-free"), e.getMessage)
  }
}
