package graft.operators

import graft.SpecBase
import graft.functions.Det
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

class SkewSpec extends SpecBase {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 20000).map { i =>
    (if (i % 10 == 0) s"k${i % 50}" else "HOT", i.toDouble, i.toLong)
  }.toDF("k", "x", "id")

  test("saltedAggregate equals plain aggregation") {
    val dec = col("x").cast(DecimalType(18, 8))
    val got = Skew.saltedAggregate(skewed, Seq("k"), buckets = 8,
      saltFrom = Seq("id"),
      partial = Seq(sum(dec).as("s"), count(lit(1)).as("c")),
      merge = Seq(sum(col("s")).cast(DoubleType).as("total"),
        sum(col("c")).as("cnt")))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = skewed.groupBy("k")
      .agg(Det.dsum(col("x")).as("total"), count(lit(1)).as("cnt"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
    // the hot key is actually split in phase 1
    val phase1Groups = skewed.withColumn("_salt",
      pmod(xxhash64(col("id")), lit(8)))
      .filter(col("k") === "HOT").select("_salt").distinct().count()
    assert(phase1Groups > 1)
  }

  test("saltedBroadcastJoin equals plain join") {
    val dim = Seq(("HOT", "hot dim"), ("k0", "cold dim")).toDF("dk", "label")
    val got = Skew.saltedBroadcastJoin(skewed, dim, "k", "dk",
      buckets = 8, saltFrom = Seq("id"))
    val want = skewed.join(dim, col("k") === col("dk"))
    assert(got.count() == want.count())
    assert(got.agg(sum("x")).head.getDouble(0) ==
      want.agg(sum("x")).head.getDouble(0))
  }
}
