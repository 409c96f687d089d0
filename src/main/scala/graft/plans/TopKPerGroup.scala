package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}

/** Per-group top-k as a FIRST-CLASS physical operator — the rung of
  * the custom-operator ladder (SURVEY.md §4) above expressions and
  * optimizer rules: a custom `LogicalPlan` node, a `SparkStrategy`
  * planning it into partial+final `SparkPlan`s, registered per-session
  * via `spark.experimental.extraStrategies`.
  *
  * Why Spark needs it: the built-in way to take the k best rows per
  * group is a window `row_number` + filter, which SORTS every
  * partition of the full input (even with k=3, the sort is over ALL
  * rows per group). Globally Spark has the right operator —
  * `TakeOrderedAndProject` — but no grouped version. This operator is
  * that grouped version: the PARTIAL phase scans each input partition
  * once, keeping a bounded k-row heap per group seen (no sort, no
  * shuffle of dropped rows); only those ≤ k·groups survivors shuffle
  * on the group key; the FINAL phase re-heaps per group. Shuffle
  * volume drops from |input| to k·|groups| — at 100 TB that is the
  * whole game, and it is exactly the partial/final contract hash
  * aggregation uses. Partial-phase state is HARD-BOUNDED: past 128k
  * distinct groups in one partition the current survivors flush and
  * the map restarts (partial output is advisory — the final phase
  * re-heaps), so a near-unique group key degrades to less map-side
  * reduction instead of an executor OOM — the moral twin of
  * hash-agg's spill fallback.
  *
  * Rows are kept as copied UnsafeRows in a JDK PriorityQueue whose
  * head is the WORST kept row under the requested order (codegen'd
  * `RowOrdering` comparator), so each arriving row costs one compare
  * in the common reject path. Output order within a group is heap
  * order — undefined, like hash-agg output; callers re-sort the tiny
  * survivor relation (k·groups rows) as q_topk_group_fast does.
  */
object TopKPerGroup {

  /** k best rows of `df` per `groupCols`, best = first under `order`
    * as (columnName, descending) pairs. Catalyst SortOrders are built
    * directly from the child's resolved attributes — the public
    * Column DSL's `.desc` carries `sql.internal` nodes that only the
    * analyzer converts, and this node bypasses analysis (it is
    * injected into an already-analyzed plan). Registers the strategy
    * on the session idempotently.
    *
    * Determinism contract (same as every row_number dedup in this
    * repo): `order` must be a TOTAL order within each group — append
    * a unique tie-break column. On order-equal rows the heaps keep
    * first arrivals, so a non-total order makes the surviving row
    * set depend on partitioning, exactly as `row_number` over a
    * non-total ORDER BY would. */
  def apply(df: DataFrame, groupCols: Seq[String],
            order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    build(df, groupCols, order, k, None)
  }

  /** Variable-k variant: each group's bound comes from `kCol`, an
    * integer column of `df` that must be CONSTANT within a group (the
    * per-doc prefix length in a PPJoin, a per-tenant quota, …) — the
    * first-seen value wins, mirroring the heap's first-arrival tie
    * rule. Rows in groups with k ≤ 0 are dropped. Same partial/final
    * contract as the fixed-k form: shuffle volume is Σ min(k_g, |g|)
    * instead of |input|. */
  def varK(df: DataFrame, groupCols: Seq[String],
           order: Seq[(String, Boolean)], kCol: String): DataFrame =
    build(df, groupCols, order, 0, Some(kCol))

  private def build(df: DataFrame, groupCols: Seq[String],
                    order: Seq[(String, Boolean)], k: Int,
                    kCol: Option[String]): DataFrame = {
    // fail HERE, not as a ClusteredDistribution(Nil) require deep in
    // EnsureRequirements (empty groups) or as silently partition-
    // dependent survivors (empty order — every row compares equal)
    require(groupCols.nonEmpty,
      "groupCols must be non-empty — global top-k is orderBy().limit(k)" +
        " (Spark's TakeOrderedAndProject), not this operator")
    require(order.nonEmpty,
      "order must be non-empty (and total within each group), or the" +
        " kept rows would be arbitrary first arrivals per partition")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val child = GraftShims.analyzed(df)
    val out = child.output
    def attr(name: String): Attribute = out
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$name' not in ${out.map(_.name).mkString(",")}"))
    val kAttr = kCol.map { name =>
      val a = attr(name)
      require(a.dataType == org.apache.spark.sql.types.IntegerType ||
        a.dataType == org.apache.spark.sql.types.LongType,
        s"k column '$name' must be int/bigint, got ${a.dataType}")
      a
    }
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(attr(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftShims.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), sortOrders, k, kAttr, child))
  }
}

case class TopKPerGroupNode(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            kAttr: Option[Attribute],
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroupNode = copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, kAttr, child) =>
      TopKPerGroupExec(g, o, k, kAttr, partial = false,
        TopKPerGroupExec(g, o, k, kAttr, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            kAttr: Option[Attribute], partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"
  // Float/double group keys normalize (-0.0 → 0.0, canonical NaN)
  // BEFORE both the exchange hash and the heap-map key: the optimizer
  // rule that does this for Aggregate/Window/Join grouping keys
  // (NormalizeFloatingNumbers) does not know this custom node, and
  // without it 0.0 and -0.0 would land in different partitions AND
  // different heaps — two k-heaps for one SQL group.
  private def normalizedGroupExprs: Seq[Expression] =
    groupExprs.map(GraftShims.normalizeFloats)
  // the partial phase runs anywhere; the final phase demands
  // co-location by group key — EnsureRequirements inserts the
  // (k·groups)-row exchange between the two, exactly like partial →
  // final hash aggregation
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(normalizedGroupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = normalizedGroupExprs
    val orderE = order
    val kk = k
    val kE = kAttr // group-constant per-row bound (varK form)
    val childOut = output
    child.execute().mapPartitions { it =>
      val toUnsafe = UnsafeProjection.create(childOut, childOut)
      val grp = UnsafeProjection.create(groupE, childOut)
      val ord = RowOrdering.create(orderE, childOut)
      val kBound = kE.map(a => org.apache.spark.sql.catalyst.expressions
        .BindReferences.bindReference(a: Expression, childOut))
      val rev = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(b, a) // head = worst kept row
      }
      // varK: each group's heap carries its own bound (from the first
      // row seen — kCol is group-constant by contract); k <= 0 groups
      // map to a tombstone so later rows of the group stay dropped
      // without re-evaluating the bound.
      // Initial capacity is capped at 64: `bound` can be a per-row k
      // value (a LongType clamps to Int.MaxValue), and eagerly sizing
      // the backing array to it would allocate gigabytes for a tiny
      // group. The heap grows on demand; `bound` stays the size LIMIT.
      final class Heap(val bound: Int) extends
        java.util.PriorityQueue[UnsafeRow](
          math.max(1, math.min(bound, 64)), rev)
      val dropped = new Heap(0)
      var heaps = new java.util.HashMap[UnsafeRow, Heap]()
      def insert(raw: InternalRow): Unit = {
        val row = toUnsafe(raw)
        val key = grp(row)
        var h = heaps.get(key)
        if (h == null) {
          val bound = kBound match {
            case None => kk
            case Some(e) => e.eval(row) match {
              case i: java.lang.Integer => i.intValue()
              case l: java.lang.Long => math.min(l.longValue(),
                Int.MaxValue.toLong).toInt
              case null => 0
            }
          }
          h = if (bound > 0) new Heap(bound) else dropped
          heaps.put(key.copy(), h)
        }
        if (h.bound > 0) {
          if (h.size < h.bound) h.add(row.copy())
          else if (ord.compare(row, h.peek()) < 0) {
            h.poll(); h.add(row.copy())
          }
        }
      }
      // PARTIAL phase: group state is BOUNDED. When distinct groups in
      // this partition exceed flushGroups, the current survivors are
      // emitted and the map restarts — correct because partial output
      // is advisory (the final phase re-heaps after the shuffle); the
      // only cost is less map-side reduction, the same graceful
      // degradation hash aggregation gets from its spill fallback, so
      // a near-unique group key cannot OOM the executor the way an
      // unbounded map would. The FINAL phase never flushes: its input
      // is co-located per group, and a mid-stream flush would emit
      // more than k rows for a group.
      val flushGroups = if (partial) 1 << 17 else Int.MaxValue
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && (it.hasNext || !heaps.isEmpty)) {
            while (it.hasNext && heaps.size <= flushGroups) insert(it.next())
            val old = heaps
            heaps = new java.util.HashMap[UnsafeRow, Heap]()
            out = old.values().iterator().asScala
              .flatMap(_.iterator().asScala)
              .map(_.asInstanceOf[InternalRow])
          }
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}
