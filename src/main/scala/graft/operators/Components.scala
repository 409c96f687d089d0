package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation — the shared engine behind friends-of-friends object
  * grouping (spatial/ObjectCatalog) and near-duplicate cluster
  * assignment (TextOps q_dedup_clusters).
  *
  * `label := min(label, min over neighbors' labels)` to fixpoint:
  * each round is one shuffle join + one aggregation, the round count
  * is the component diameter (small for both use cases: detections of
  * one source sit within ~radius; near-dup clusters are
  * boilerplate-capped), and the fixpoint is unique — iteration order
  * cannot change the answer, so results stay oracle-deterministic.
  * The per-round `count()` is a convergence check on a persisted
  * frame (bounded work), not a driver-side data path.
  */
object Components {

  /** @param nodes one row per node
    * @param idCol  node id column in `nodes` (numeric/orderable)
    * @param edges  undirected edge list, ONE row per edge (symmetry is
    *               added internally)
    * @return (idCol, "component") — component = min node id reachable
    */
  def minLabel(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String, dstCol: String,
               maxIter: Int = 30): DataFrame = {
    val n = nodes.select(col(idCol).as("__cc_id"))
    val e1 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = e1.unionByName(
      e1.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .persist()

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
    // everything, since every identity label is "new"). Rounds stay
    // = component diameter, but the per-round edge join shrinks from
    // edges⋈ALL-labels to edges⋈frontier — at corpus scale most
    // components settle in 1-2 rounds and drop out of the join, which
    // is the difference between O(E) per round and O(E_frontier).
    var delta = labels
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighborMin = sym
        .join(delta, sym("src") === delta("__cc_id"))
        .groupBy(col("dst").as("__cc_id2"))
        .agg(min(col("label")).as("nbr_min"))
      // one join per round: the checkpointed frame carries both the
      // old label and the neighbor minimum, so the convergence count,
      // the next labels AND the next frontier all read it without a
      // second join. The checkpoint is LAZY — the convergence count
      // below is the action that materializes it, so each round runs
      // exactly one job.
      val joined = labels
        .join(neighborMin, col("__cc_id") === col("__cc_id2"), "left_outer")
        .select(col("__cc_id"), col("label"),
          coalesce(col("nbr_min"), col("label")).as("nbr_min"))
        .localCheckpoint(false)
      val changed = joined.filter(col("nbr_min") < col("label")).count()
      // `joined` is materialized now — the previous round's blocks
      // can no longer be referenced by anything downstream
      prevCkpt.unpersist()
      prevCkpt = joined
      delta = joined.filter(col("nbr_min") < col("label"))
        .select(col("__cc_id"), col("nbr_min").as("label"))
      labels = joined
        .select(col("__cc_id"),
          least(col("label"), col("nbr_min")).as("label"))
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    require(converged,
      s"component propagation did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter — raise it)")
    val singletons = n.join(labels, Seq("__cc_id"), "left_anti")
      .select(col("__cc_id"), col("__cc_id").as("label"))
    labels.unionByName(singletons)
      .select(col("__cc_id").as(idCol), col("label").as("component"))
  }
}
