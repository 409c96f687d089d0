package graft.streaming

import graft.SpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** S4/S5 — streaming-only semantics, golden-checked via MemoryStream
  * micro-batches (not DuckDB-oracle-able; SURVEY.md §2G). */
class StreamOpsSpec extends SpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Ev(ts: Timestamp, user_id: Long, value: Double)

  test("watermark drops late rows from tumbling aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamOps.tumblingAgg(input.toDF(), "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two on-time rows; advance event time far ahead so the
      // watermark passes the first window
      input.addData(Ev(ts("2024-01-01 00:01:00"), 1, 1.0),
        Ev(ts("2024-01-01 00:04:00"), 1, 2.0))
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-01 01:00:00"), 1, 9.0))
      q.processAllAvailable()
      // batch 3: a LATE row for the already-closed 00:00 window → dropped
      input.addData(Ev(ts("2024-01-01 00:02:00"), 1, 100.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("wstart", "cnt", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1),
          r.getDouble(2))).toSet
      // the 00:00 window was emitted with the two on-time rows only
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L, 3.0)))
      assert(!rows.exists(_._3 == 103.0))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val dedup = StreamOps.dedupWithinWatermark(
      input.toDF(), "10 minutes", Seq("user_id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(ts("2024-01-01 00:00:00"), 7, 1.0),
        Ev(ts("2024-01-01 00:01:00"), 7, 2.0)) // dup key within horizon
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 1)
      // advance the watermark past the horizon with a DIFFERENT key
      // (watermarks only move between micro-batches), expiring key 7's
      // dedup state ...
      input.addData(Ev(ts("2024-01-01 02:00:00"), 8, 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2)
      // ... so key 7 is admitted again afterwards
      input.addData(Ev(ts("2024-01-01 02:30:00"), 7, 4.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 3)
    } finally q.stop()
  }

  test("session windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sess = StreamOps.sessionAgg(input.toDF(), "30 minutes", "5 minutes")
    val q = sess.writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(ts("2024-01-01 00:00:00"), 1, 1.0),
        Ev(ts("2024-01-01 00:10:00"), 1, 1.0),  // same session
        Ev(ts("2024-01-01 03:00:00"), 1, 1.0))  // far future → closes it
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-01 06:00:00"), 1, 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .select("session_start", "cnt").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L)))
    } finally q.stop()
  }
}
