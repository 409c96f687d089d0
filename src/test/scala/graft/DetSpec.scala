package graft

import graft.functions.Det
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

class DetSpec extends SpecBase {
  import spark.implicits._

  test("dsum is exact and order-independent") {
    // 0.1 is inexact in binary; naive double summation is order-
    // dependent, decimal-routed summation must not be
    val vals = (1 to 10000).map(_ => 0.1)
    val df = vals.toDF("x")
    val s = df.agg(Det.dsum(col("x"))).head.getDouble(0)
    assert(s == 1000.0)
    val shuffled = scala.util.Random.shuffle(vals).toDF("x").repartition(7)
    assert(shuffled.agg(Det.dsum(col("x"))).head.getDouble(0) == s)
  }

  test("dsum ignores nulls, davg divides by non-null count") {
    val schema = StructType(Seq(StructField("x", DoubleType, nullable = true)))
    val rows = Seq(Row(1.0), Row(null), Row(3.0)).asJava
    val df = spark.createDataFrame(rows, schema)
    assert(df.agg(Det.dsum(col("x"))).head.getDouble(0) == 4.0)
    assert(df.agg(Det.davg(col("x"))).head.getDouble(0) == 2.0)
  }

  test("dvarSamp/dstddev match closed form") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val v = df.agg(Det.dvarSamp(col("x"))).head.getDouble(0)
    assert(math.abs(v - 32.0 / 7) < 1e-12)
  }

  test("dcorr of a perfectly linear relation is 1") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 3)).toDF("x", "y")
    val c = df.agg(Det.dcorr(col("x"), col("y"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("d6 snaps to the 1e-6 grid") {
    val df = Seq(1.23456789).toDF("x")
    assert(df.select(Det.d6(col("x"))).head.getDouble(0) == 1.234568)
  }

  test("empty input: dsum null, count zero") {
    val df = Seq.empty[Double].toDF("x")
    val r = df.agg(Det.dsum(col("x")), count(col("x"))).head
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
  }
}
