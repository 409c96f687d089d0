package graft.functions

import graft.SpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins [[IntersectCount]] against `size(array_intersect(a, b))` —
  * the builtin it replaces in the PPJoin verify phase. Must agree on
  * duplicates (set semantics), empties, disjoint/identical arrays and
  * nulls, or the dedup family's verified pairs change. Inputs carry
  * containsNull=false element types — the contract the expression's
  * type check enforces (r22: nullable elements are REJECTED at
  * analysis, because a null element would silently count as a match). */
class IntersectCountSpec extends SpecBase {

  /** (id, a, b) rows with non-null-element array columns — the only
    * shape the kernel accepts; the array itself may still be null. */
  private def pairsDf(rows: Seq[(Long, Seq[String], Seq[String])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", ArrayType(StringType, containsNull = false)),
      StructField("b", ArrayType(StringType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)
  }

  test("kernel == size(array_intersect) incl. duplicates and empties") {
    val cases: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq(), Seq("a")),
      (Seq(), Seq()),
      (Seq("a", "a", "b"), Seq("a")), // dup on build side
      (Seq("a"), Seq("a", "a", "b")), // dup on probe side
      (Seq("x"), Seq("y")),
      (Seq("same"), Seq("same")),
      (Seq("é", "汉", "🙂"), Seq("汉", "é")),
      ((1 to 200).map(i => s"w$i"), (100 to 300).map(i => s"w$i")))
    val df = pairsDf(cases.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) })
    val got = df.select(col("id"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("x"),
        IntersectCount.intersectCount(col("a"), col("b")).as("y"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r))
  }

  test("random arrays agree with the builtin") {
    val word = Gen.oneOf((1 to 30).map(i => s"t$i"))
    val arr = Gen.choose(0, 40).flatMap(Gen.listOfN(_, word))
    val pairs = (0 until 200).flatMap { i =>
      (for { a <- arr; b <- arr } yield (a, b))(
        Gen.Parameters.default, Seed(77L + i)).toSeq
    }
    val df = pairsDf(pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) })
    val got = df.select(
        size(array_intersect(col("a"), col("b"))).cast("long").as("x"),
        IntersectCount.intersectCount(col("a"), col("b")).as("y"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("null arrays propagate null; codegen engaged on live input") {
    val df = pairsDf(Seq((1L, Seq("a"), Seq("a")), (2L, null, Seq("a")),
        (3L, Seq("a"), null)))
      .select(col("id"),
        IntersectCount.intersectCount(col("a"), col("b")).as("n"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(1) == 1L)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
    val live = spark.range(4).select(IntersectCount.intersectCount(
      array(concat(lit("a"), col("id").cast("string")), lit("b")),
      array(lit("b"), lit("c"))).as("n"))
    assert(live.queryExecution.executedPlan.toString
      .contains("*(1) Project"), live.queryExecution.executedPlan)
    assert(live.collect().forall(_.getLong(0) == 1L))
  }

  test("nullable-element arrays are rejected at analysis time") {
    import spark.implicits._
    // toDF's Seq[String] encoder yields containsNull=true — exactly
    // the shape the type check must refuse
    val df = Seq((1L, Seq("a"), Seq("a"))).toDF("id", "a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(IntersectCount.intersectCount(col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.contains("containsNull"), e.getMessage)
  }
}
