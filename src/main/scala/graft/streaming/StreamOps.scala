package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2G — Structured Streaming surface.
  *
  * The reference is batch-only; its multi-epoch detection tables are
  * the closest analog of a stream (SURVEY.md §2G). This module hosts
  * the streaming-only semantics (watermarks, stateful dedup) that the
  * DuckDB oracle cannot check — they are covered by MemoryStream
  * micro-batch tests in StreamOpsSpec instead (golden-file strategy,
  * SURVEY.md §5).
  *
  * Every transform takes a DataFrame so the identical plan fragment
  * runs in batch (TimeWindows queries) and streaming (`readStream`)
  * — the Structured Streaming unification. State stores are keyed by
  * the grouping key, so at scale these shard exactly like the batch
  * shuffles do.
  */
object StreamOps {

  /** S1/S4 — tumbling-window aggregate with watermark-bounded state:
    * rows later than `watermark` behind the max event time are
    * dropped; window state is evicted once the watermark passes. */
  def tumblingAgg(events: DataFrame, windowLen: String,
                  watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("cnt"), col("sum_value"))

  /** S3 (streaming form) — session windows per user with watermark. */
  def sessionAgg(events: DataFrame, gap: String,
                 watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("cnt"))

  /** S5 — stateful stream dedup: drops rows whose key was already seen
    * within the watermark horizon (state self-expires, unlike plain
    * dropDuplicates whose state grows forever on a stream). */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
