package graft.sources

import graft.{LsdDb, SpecBase}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class TimeWriterSpec extends SpecBase {

  test("day-partitioned write prunes directories and preserves results") {
    val path = Files.createTempDirectory("graft_tw").toString + "/events"
    val events = LsdDb.table(spark, sfDir, "events")
    TimeWriter.write(events, "ts", "day", path)

    val (from, to) = ("2024-01-10 00:00:00", "2024-01-15 00:00:00")
    val pruned = TimeWriter.readRange(spark, path, "ts", "day", from, to)
    val want = events.filter(
      col("ts") >= to_timestamp(lit(from)) && col("ts") < to_timestamp(lit(to)))
    assert(pruned.count() == want.count())
    assert(pruned.count() > 0)

    // directory layout is t_bucket=YYYY-MM-DD and pruning is visible
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("t_bucket="))
    assert(dirs.length >= 29) // ~a month of days
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("t_bucket"))
  }

  test("bucket boundary rows are not lost (lower bound = bucket of from)") {
    val path = Files.createTempDirectory("graft_tw2").toString + "/events"
    val events = LsdDb.table(spark, sfDir, "events")
    TimeWriter.write(events, "ts", "month", path)
    // range starting mid-month must still read the month bucket
    val got = TimeWriter.readRange(spark, path, "ts", "month",
      "2024-01-15 00:00:00", "2024-02-01 00:00:00")
    val want = events.filter(col("ts") >= "2024-01-15" && col("ts") < "2024-02-01")
    assert(got.count() == want.count() && got.count() > 0)
  }

  test("ensure-site rebuild heals a layout that lost its sidecar") {
    // review r18: _TEMPORAL lands after Spark's _SUCCESS; a crash in
    // that window must not leave a permanently "complete" cache that
    // every time-bounded read rejects. The ensure site re-checks the
    // sidecar, so deleting it (the crash's observable state) heals.
    val path = graft.operators.Core.ensureTimePartitionedEvents(spark, sfDir)
    assert(TimeWriter.temporalMeta(spark, path).isDefined)
    new java.io.File(path, "_TEMPORAL").delete()
    assert(TimeWriter.temporalMeta(spark, path).isEmpty)
    val again = graft.operators.Core.ensureTimePartitionedEvents(spark, sfDir)
    assert(again == path &&
      TimeWriter.temporalMeta(spark, path).isDefined,
      "ensure site must rebuild when the sidecar is missing")
  }

  test("inverted TimeInterval fails at construction") {
    intercept[IllegalArgumentException] {
      graft.spatial.TimeInterval("2024-02-01 00:00:00",
        "2024-01-01 00:00:00")
    }
    intercept[IllegalArgumentException] { // date-only spelling too
      graft.spatial.TimeInterval("2024-02-02", "2024-02-01")
    }
    // a ZERO-WIDTH half-open interval is a legitimate empty query for
    // programmatic callers (incremental "since last run" with no
    // elapsed time) — it must CONSTRUCT; only inversion is rejected
    // (review r19, ADVICE). The CLI layer adds the strict check.
    graft.spatial.TimeInterval("2024-02-01", "2024-02-01")
    graft.spatial.TimeInterval("2024-02-01 00:00:00",
      "2024-02-01 00:00:00")
    // valid forms construct; exotic forms defer to the engine
    graft.spatial.TimeInterval("2024-01-01", "2024-02-01")
    graft.spatial.TimeInterval("jan 1", "feb 1")
  }
}
