package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation — the shared engine behind friends-of-friends object
  * grouping (spatial/ObjectCatalog) and near-duplicate cluster
  * assignment (TextOps q_dedup_clusters).
  *
  * `label := min(label, min over neighbors' labels)` to fixpoint:
  * each round is one shuffle join + one aggregation, and the fixpoint
  * is unique — iteration order cannot change the answer, so results
  * stay oracle-deterministic.
  *
  * Worst-case round bound: plain min-propagation needs rounds =
  * component diameter, fine for the intended workloads (detections of
  * one source sit within ~radius; near-dup clusters are boilerplate-
  * capped) but a pathological chain-shaped component would blow the
  * round budget. After [[jumpAfter]] rounds the loop therefore turns
  * on POINTER JUMPING (label := min(label, label(label)) — the
  * path-halving step of classic PRAM CC and the MapReduce small-star
  * algorithms): reach more than doubles per round, so convergence is
  * O(log diameter) with zero extra cost in the common few-round case.
  * Exactness is unchanged — a label is always the id of some node
  * reachable from its holder (initial: itself; neighbor-min: reach
  * via one edge; jump: reachability is transitive), so the unique
  * fixpoint is still the component's min id.
  *
  * The per-round `count()` is a convergence check on a persisted
  * frame (bounded work), not a driver-side data path.
  */
object Components {

  /** Rounds of plain delta-propagation before pointer jumping turns
    * on. Typical workloads converge within this budget and never pay
    * the extra label self-join; a long chain escalates to the
    * logarithmic regime from round 4. */
  private val jumpAfter = 3

  /** Edge-count ceiling for the driver union-find fast path — the
    * broadcast-join-threshold pattern applied to CC: below it the
    * RAW edge relation (as supplied, pre-dedup/pre-symmetrization —
    * gated by a limit-capped collect, so the pipeline is evaluated
    * exactly once and never shuffled) is ≤ ~8 MB of id pairs, a
    * single collect + union-find replaces 2-20 shuffle-round jobs,
    * and the labels go back as a broadcast relation (the corpus-scale
    * node table never shuffles). Above it the delta-iterated/
    * pointer-jumped loop runs unchanged — the cap is what makes the
    * shortcut 100-TB-safe, the same way a broadcast join degrades to
    * shuffle past its threshold. */
  val defaultSmallGraphEdges: Long = 500000L

  /** @param nodes one row per node
    * @param idCol  node id column in `nodes` (numeric/orderable)
    * @param edges  undirected edge list, ONE row per edge (symmetry is
    *               added internally)
    * @return (idCol, "component") — component = min node id reachable
    */
  def minLabel(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String, dstCol: String,
               maxIter: Int = 30,
               smallGraphEdges: Long = defaultSmallGraphEdges): DataFrame =
    minLabelWithRounds(nodes, idCol, edges, srcCol, dstCol, maxIter,
      smallGraphEdges)._1

  /** [[minLabel]] plus the number of rounds taken (0 = small-graph
    * fast path) — for scale smokes asserting the logarithmic
    * worst-case bound. */
  def minLabelWithRounds(nodes: DataFrame, idCol: String,
                         edges: DataFrame, srcCol: String, dstCol: String,
                         maxIter: Int = 30,
                         smallGraphEdges: Long = defaultSmallGraphEdges)
      : (DataFrame, Int) = {
    val n = nodes.select(col(idCol).as("__cc_id"))
    // null-keyed edges connect nothing in the iterative path (equi-
    // joins never match null) — drop them up front so the small-graph
    // fast path sees the same graph instead of NPEing in its typed
    // collect (paths must stay bit-identical on BOTH sides of the
    // edge-count gate)
    val e1 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

    // Small-graph fast path: ONE limit-capped collect of the RAW edge
    // relation (the ExactQuantiles bounded-collect pattern), zero
    // shuffles, zero re-evaluation — union-find is direction- and
    // duplicate-insensitive, so it needs neither the symmetrizing
    // union (which evaluates the edge pipeline TWICE as two union
    // branches) nor the distinct (a 2|E| shuffle). The cap therefore
    // gates RAW rows, pre-dedup: a caller with heavily duplicated
    // edge rows crosses to the iterative path earlier — a routing
    // change only, both paths reach the same min-label fixpoint
    // (measured on q_object_catalog: assign 3.0 s -> 1.3 s warm at
    // sf0.1, 273k edges). Only for integral ids — both current
    // callers (FoF det_id, dedup doc_id) are LongType.
    val integralIds = e1.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    if (integralIds && smallGraphEdges < Int.MaxValue) {
      val spark0 = nodes.sparkSession
      import spark0.implicits._
      val raw = e1.select(col("src").cast("long"), col("dst").cast("long"))
        .limit(smallGraphEdges.toInt + 1).as[(Long, Long)].collect()
      if (raw.length <= smallGraphEdges)
        return (smallGraphLabels(n, raw, idCol), 0)
      // over the cap: fall through to the iterative path (the capped
      // collect is discarded; the limit stopped it at cap+1 rows)
    }
    val sym = e1.unionByName(
      e1.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .persist()
    sym.count() // materialize the persist (first round pays it anyway)

    // only nodes with at least one edge iterate; every other node is
    // trivially its own component and unions back in at the end. In a
    // deduped corpus the edge-touched set is a small fraction of the
    // table, so the loop's joins run over candidates, not the corpus.
    val active = n.join(
      sym.select(col("src").as("__cc_id")).distinct(),
      Seq("__cc_id"), "left_semi")

    // localCheckpoint (eager), not a bare persist: each round's plan
    // references the previous round's, so without lineage TRUNCATION
    // the logical plan compounds per iteration and analysis itself
    // OOMs after ~10 rounds. On a cluster with lossy executors, swap
    // for reliable checkpoint().
    var labels = active.select(col("__cc_id"), col("__cc_id").as("label"))
      .localCheckpoint(true)
    // the round's checkpointed frame whose blocks the NEXT round may
    // still read; freed explicitly once the round after it has
    // materialized (relying on GC to reap checkpoint blocks lets k
    // rounds of labels pile up in the block manager at scale)
    var prevCkpt = labels
    // DELTA ITERATION: only labels that IMPROVED last round are pushed.
    // Monotone-min argument for exactness: a node's label can only
    // improve via a neighbor whose label improved the round before —
    // an unchanged neighbor's label was already pushed (round 1 pushes
    // everything, since every identity label is "new"). Pointer-jump
    // improvements enter the same frontier (delta = "changed this
    // round", whatever the mechanism), so every improvement is still
    // eventually pushed across every edge and the fixpoint test below
    // remains sound. The per-round edge join runs edges⋈frontier —
    // at corpus scale most components settle in 1-2 rounds and drop
    // out of the join, the difference between O(E) and O(E_frontier)
    // per round.
    var delta = labels
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(delta, sym("src") === delta("__cc_id"))
        .groupBy(col("dst").as("__cc_id2"))
        .agg(min(col("label")).as("nbr_min"))
      // one edge join per round: `base` carries the old label and the
      // neighbor-min merged, so the convergence count, next labels AND
      // next frontier all read one frame without a second edge join.
      val base = labels
        .join(neighborMin, col("__cc_id") === col("__cc_id2"), "left_outer")
        .select(col("__cc_id"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("lbl1"))
      val next =
        if (it < jumpAfter)
          base.select(col("__cc_id"), col("label"),
            col("lbl1").as("new_label"))
        else {
          // pointer jump: new_label = min(lbl1, lbl1(lbl1)). The label
          // relation is closed over active node ids (a label IS a
          // reachable node's id), so the lookup is a self equi-join;
          // left_outer + coalesce covers a label whose holder row sits
          // in another partition of the same frame.
          val hop = base.select(col("__cc_id").as("__h_id"),
            col("lbl1").as("__h_lbl"))
          base.join(hop, col("lbl1") === col("__h_id"), "left_outer")
            .select(col("__cc_id"), col("label"),
              least(col("lbl1"), coalesce(col("__h_lbl"), col("lbl1")))
                .as("new_label"))
        }
      // The checkpoint is LAZY — the convergence count below is the
      // action that materializes it, so each round runs exactly one
      // job.
      val ck = next.localCheckpoint(false)
      // Stats-inheritance reset (GraftShims.resetStats scaladoc): a
      // checkpoint carries its origin plan's computed sizeInBytes, so
      // without this re-wrap each round's join-stats product compounds
      // the previous round's BigInts — by round ~10 the driver spends
      // MINUTES multiplying 100k-digit integers inside stats
      // estimation while the cluster sits idle. The re-wrap reuses the
      // checkpointed RDD; only the logical leaf (and its default
      // stats) is fresh.
      val fresh = org.apache.spark.sql.GraftShims.resetStats(ck)
      val changed = fresh.filter(col("new_label") < col("label")).count()
      // `ck` is materialized now — the previous round's blocks can no
      // longer be referenced by anything downstream
      prevCkpt.unpersist()
      prevCkpt = ck
      delta = fresh.filter(col("new_label") < col("label"))
        .select(col("__cc_id"), col("new_label").as("label"))
      labels = fresh.select(col("__cc_id"), col("new_label").as("label"))
      converged = changed == 0
      it += 1
    }
    // Deep-graph escalation instead of failure: pointer jumping's
    // log-ish convergence leans on id-locality (label(label(x)) only
    // doubles GRAPH reach when low ids sit along low-id paths — true
    // for ingest-ordered chains, false for id-random graphs, where
    // measured rounds track the component diameter). When the round
    // budget runs out, contract the graph by the labels learned so
    // far (strictly fewer nodes, exact: every label is a reachable
    // id) and finish with large-star/small-star — proven O(log n)
    // rounds on ANY graph shape — then compose. The loop can no
    // longer die on a deep component; it just switches algorithms.
    var lssRounds = 0
    if (!converged) {
      val l1 = labels.select(col("__cc_id").as("src"),
        col("label").as("lsrc"))
      val l2 = labels.select(col("__cc_id").as("dst"),
        col("label").as("ldst"))
      val contracted = sym.join(l1, "src").join(l2, "dst")
        .select(col("lsrc").as("u"), col("ldst").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val (roots, r) = largeSmallStar(contracted)
      lssRounds = r
      labels = labels.join(roots, labels("label") === roots("u"),
          "left_outer")
        .select(col("__cc_id"),
          coalesce(col("root"), col("label")).as("label"))
    }
    sym.unpersist()
    val singletons = n.join(labels, Seq("__cc_id"), "left_anti")
      .select(col("__cc_id"), col("__cc_id").as("label"))
    (labels.unionByName(singletons)
      .select(col("__cc_id").as(idCol), col("label").as("component")),
      it + lssRounds)
  }

  /** Alternating large-star/small-star connected components (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii: "Connected
    * Components in MapReduce and Beyond", SoCC 2014): each round
    * rewrites the edge set so strictly-larger neighbors (large-star)
    * then not-larger neighbors (small-star) hook onto the
    * neighborhood minimum. Converges to per-component stars around
    * the minimum id in O(log n) rounds REGARDLESS of graph shape —
    * the guarantee the neighbor-min loop lacks on deep id-random
    * graphs. Per round: two groupBy-min + join passes over the
    * (shrinking) edge set, every shuffle an equi-join on node id.
    *
    * @param edges directed or undirected edge rows (u, v), self-loops
    *              tolerated; node ids orderable
    * @return ((u, root) one row per non-isolated node — roots
    *         included, pointing to themselves —, rounds taken) */
  def largeSmallStar(edges: DataFrame,
                     maxIter: Int = 50): (DataFrame, Int) = {
    var e = edges.select(col("u"), col("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var prev = e
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // large-star: sym neighborhoods; every neighbor v > u hooks to
      // m(u) = min(N(u) ∪ {u})
      val sym = e.unionByName(
        e.select(col("v").as("u"), col("u").as("v")))
      val lm = sym.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(lm, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: orient edges big→small, hook all smaller
      // neighbors AND u itself to the minimum
      val nrm = large.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val sm = nrm.groupBy("u").agg(min(col("v")).as("m"))
      val small = nrm.join(sm, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(sm.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      val ck = small.localCheckpoint(false)
      val fresh = org.apache.spark.sql.GraftShims.resetStats(ck)
      // exact convergence: the edge SET is stable (both counts equal
      // and no new-side row missing from the old side)
      val stable = fresh.count() == e.count() &&
        fresh.join(e, Seq("u", "v"), "left_anti").isEmpty
      prev.unpersist()
      prev = ck
      e = fresh
      converged = stable
      it += 1
    }
    require(converged,
      s"large-star/small-star did not converge in $maxIter rounds — " +
        "not reachable for any graph with < 2^50 nodes (O(log n) bound)")
    // stars: every non-root u carries exactly one (u, root) edge;
    // roots get a self row
    val roots = e.select(col("v")).distinct()
      .join(e.select(col("u")).distinct(),
        col("v") === col("u"), "left_anti")
      .select(col("v").as("u"), col("v").as("root"))
    (e.select(col("u"), col("v").as("root")).unionByName(roots), it)
  }

  /** Driver union-find over a capped edge list. Exactness contract
    * matches the iterative path bit-for-bit: only edges whose BOTH
    * endpoints exist in `nodes` can merge components (in the loop, an
    * endpoint with no label row neither receives nor forwards labels),
    * and each component's label is its minimum member id — the same
    * unique fixpoint, independent of union order.
    *
    * The node-membership filter costs one broadcast semi-join SCAN of
    * the node table (the touched-id set is bounded by 2×edges — it
    * broadcasts; the node table itself never shuffles), mirroring how
    * the iterative path's `active` semi-join touches nodes exactly
    * once. */
  private def smallGraphLabels(n: DataFrame, raw: Array[(Long, Long)],
                               idCol: String): DataFrame = {
    val spark = n.sparkSession
    import spark.implicits._
    val idType = n.schema("__cc_id").dataType

    val touched = raw.iterator.flatMap(p => Iterator(p._1, p._2)).toArray
      .distinct.sorted
    // which touched ids are real nodes — broadcast semi-join, bounded
    // result (≤ |touched|)
    val present = n.join(
      broadcast(touched.toSeq.toDF("__cc_id")
        .select(col("__cc_id").cast(idType))),
      Seq("__cc_id"), "left_semi")
      .select(col("__cc_id").cast("long")).as[Long].collect().toSet

    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    present.foreach(id => parent(id) = id)
    raw.foreach { case (a, b) =>
      if (present(a) && present(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(rb) = ra
      }
    }
    // component label = min member id (sorted ids → first hit per root
    // is the min; map every member to it)
    val minOfRoot = scala.collection.mutable.HashMap[Long, Long]()
    val presentSorted = present.toArray.sorted
    presentSorted.foreach { id =>
      val r = find(id)
      if (!minOfRoot.contains(r)) minOfRoot(r) = id
    }
    val labels = presentSorted.map(id => (id, minOfRoot(find(id)))).toSeq
      .toDF("__cc_id", "label")
      .select(col("__cc_id").cast(idType).as("__cc_id"),
        col("label").cast(idType).as("label"))

    val singletons = n.join(broadcast(labels.select("__cc_id")),
      Seq("__cc_id"), "left_anti")
      .select(col("__cc_id"), col("__cc_id").as("label"))
    labels.unionByName(singletons)
      .select(col("__cc_id").as(idCol), col("label").as("component"))
  }
}
