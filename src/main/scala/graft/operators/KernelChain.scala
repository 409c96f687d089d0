package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Map/reduce kernel-chain parity — the reference's general dataflow
  * surface (`Query.execute([(mapper,), (reducer,)])`, `lsd/pool2.py`
  * map_reduce_chain, UNVERIFIED; SURVEY.md §3 entry point 2).
  *
  * LSD ran a user mapper per cell, regrouped emitted (key, value)
  * pairs through temp pickle files, then ran a reducer per key —
  * i.e. exactly Spark's `groupByKey().flatMapGroups` dataflow, with
  * pool2's file-based regroup replaced by the sort-based shuffle
  * (spill-aware, codegen'd key extraction, cluster-scalable).
  *
  * These helpers exist for API parity and for genuinely imperative
  * kernels. Anything expressible as Column expressions should use
  * `groupBy().agg()` instead (Catalyst gets partial aggregation and
  * whole-stage codegen; `flatMapGroups` is a black box to the
  * optimizer and shuffles unaggregated rows — same tradeoff LSD had,
  * where kernels always paid the full regroup).
  */
object KernelChain {

  /** One map/reduce stage: mapper emits (key, value) pairs per input
    * row (flatMap ≅ per-cell kernel emit), reducer folds each key
    * group. Chain stages by calling again on the result. */
  def mapReduce[T, K: Encoder, V, R: Encoder](
      ds: Dataset[T],
      mapper: T => IterableOnce[(K, V)],
      reducer: (K, Iterator[V]) => IterableOnce[R])(
      implicit kvEnc: Encoder[(K, V)]): Dataset[R] =
    ds.flatMap(mapper)(kvEnc)
      .groupByKey(_._1)
      .flatMapGroups((k: K, it: Iterator[(K, V)]) => reducer(k, it.map(_._2)))

  /** Per-partition kernel (≅ per-cell mapper with no regroup): the
    * mapPartitions escape hatch, kept last-resort per SURVEY.md. */
  def perPartition[T, R: Encoder](ds: Dataset[T])(
      kernel: Iterator[T] => Iterator[R]): Dataset[R] =
    ds.mapPartitions(kernel)
}
