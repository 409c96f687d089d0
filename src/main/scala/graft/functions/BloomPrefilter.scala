package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Runtime Bloom-filter join pruning — the pattern behind every
  * "filtered dim ⋈ huge fact" join at 100 TB.
  *
  * When the build side of a join is too big to broadcast as ROWS
  * (100M+ keys) but its KEY SET fits a Bloom filter (~1.2 bytes/key at
  * 1% fpp), prefiltering the probe side before the shuffle join drops
  * probe shuffle volume to (join selectivity + fpp) of the input —
  * usually the difference between shuffling 100 TB and shuffling 1 TB.
  * Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` does
  * this automatically only when the build side already carries a
  * selective filter it can see through a shuffle boundary; this helper
  * is the explicit form for when the build side is a computed relation
  * (a dedup survivor set, an xmatch id list, a footprint page) that
  * the optimizer cannot introspect.
  *
  * Mechanics: one pass over the build side collects an
  * `org.apache.spark.util.sketch.BloomFilter` of xxhash64(key) on the
  * driver (same sketch class Spark's injected runtime filters use);
  * the serialized bits ship to executors as a foldable Binary literal
  * inside Spark's own codegen'd `BloomFilterMightContain` predicate —
  * no Scala UDF, the probe-side filter stays inside whole-stage
  * codegen exactly like an optimizer-injected runtime filter. The
  * filter is a SUPERSET gate (false positives pass), so callers must
  * still run the exact join afterwards; results are therefore
  * identical to the unfiltered join, which is what makes the operator
  * oracle-checkable.
  *
  * Determinism: BloomFilter bits depend only on the inserted value
  * set (bit-OR is commutative, seed is fixed in the sketch impl), so
  * partitioning/order changes cannot alter which rows pass.
  *
  * Driver/broadcast budget: the filter is sized from an exact count
  * of the build side (one lightweight agg). At 1% fpp the bits are
  * ~1.2 bytes/key → 100M keys ≈ 115 MiB: set `fpp` to 0.05 (~0.75
  * bytes/key) or pre-distinct the keys when pushing that boundary.
  */
object BloomPrefilter {

  /** Serialized Bloom filter of `xxhash64(key)` over `build`. */
  def buildBits(build: DataFrame, key: Column, fpp: Double): Array[Byte] = {
    val hashed = build.select(xxhash64(key).as("h"))
    // Exact row count (not distinct — duplicates only oversize the
    // filter, and counting plain rows is a cheaper scan than a
    // distinct shuffle on what may be a non-tiny build side).
    val n = math.max(hashed.count(), 1L)
    val bf = hashed.stat.bloomFilter("h", n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `probe` rows whose `probeKey` is POSSIBLY in `build`'s `buildKey`
    * set (superset semantics — follow with the exact join). */
  def prefilter(probe: DataFrame, probeKey: Column,
                build: DataFrame, buildKey: Column,
                fpp: Double = 0.01): DataFrame = {
    val bits = buildBits(build, buildKey, fpp)
    probe.filter(GraftShims.column(BloomFilterMightContain(
      Literal(bits, BinaryType),
      GraftShims.expression(xxhash64(probeKey)))))
  }
}
