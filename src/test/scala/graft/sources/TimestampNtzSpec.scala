package graft.sources

import graft.{LsdDb, SpecBase}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 postmortem regression: the driver's regenerated testdata
  * wrote `events.ts` as parquet TIMESTAMP(isAdjustedToUTC=false),
  * which Spark surfaces as TIMESTAMP_NTZ — a type `unix_micros()`
  * rejects at analysis, which killed all 7 time-series queries.
  * LsdDb.table must normalize every NTZ column to TimestampType
  * (value-preserving under the UTC session) alongside the older
  * nanos-as-Long channel, so epoch arithmetic works no matter which
  * physical timestamp form the writer chose. */
class TimestampNtzSpec extends SpecBase {
  import spark.implicits._

  test("LsdDb.table normalizes TIMESTAMP_NTZ columns to TimestampType") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    val micros = Seq(0L, 1000000L, 1755100000000000L)
    micros.toDF("us")
      .select(col("us"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("other_ntz"))
      .write.mode("overwrite").parquet(s"$dir/tntz.parquet")
    // written frame really is NTZ on disk
    val raw = spark.read.parquet(s"$dir/tntz.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)

    val df = LsdDb.table(spark, dir, "tntz")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("other_ntz").dataType == TimestampType)
    // unix_micros (the expression that failed in round 10) resolves
    // AND round-trips the original epoch values exactly
    val got = df.select(unix_micros(col("ts")).as("us2"), col("us"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(micros.forall(u => got(u) == u))
  }

  test("events table loads with TimestampType ts and epoch arithmetic works") {
    val df = LsdDb.table(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).limit(1).count() == 1)
  }
}
