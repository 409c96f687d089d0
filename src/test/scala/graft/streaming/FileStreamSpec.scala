package graft.streaming

import graft.SpecBase
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end file-source streaming: parquet files land in a
  * directory (the realistic ingest shape — at scale, an object-store
  * prefix fed by an upstream writer), readStream picks them up in
  * arrival order, the same windowed plan from TimeWindows aggregates
  * them incrementally. */
class FileStreamSpec extends SpecBase {
  import spark.implicits._

  test("readStream over a parquet directory feeds the tumbling-window plan") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("value", DoubleType)))

    def land(batch: Seq[(String, Long, Double)], name: String): Unit =
      batch.map { case (t, u, v) => (Timestamp.valueOf(t), u, v) }
        .toDF("ts", "user_id", "value")
        .coalesce(1).write.mode("append").parquet(dir)

    land(Seq(("2024-01-01 00:05:00", 1L, 1.0),
      ("2024-01-01 00:20:00", 2L, 2.0)), "b0")

    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamOps.tumblingAgg(stream, "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("file_stream_test")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // window still open → nothing emitted in append mode yet
      assert(spark.table("file_stream_test").count() == 0)
      // second file arrives, far enough ahead to close the 00:00 window
      land(Seq(("2024-01-01 02:00:00", 1L, 9.0)), "b1")
      q.processAllAvailable()
      val rows = spark.table("file_stream_test")
        .select("wstart", "cnt", "sum_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
      assert(rows.toSet == Set(("2024-01-01 00:00:00.0", 2L, 3.0)))
    } finally q.stop()
  }
}
