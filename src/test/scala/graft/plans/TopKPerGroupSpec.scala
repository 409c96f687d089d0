package graft.plans

import graft.SpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SpecBase {
  import spark.implicits._

  private def windowTwin(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("matches the window row_number form on random-ish data") {
    val df = spark.range(5000).select(
      col("id"), (col("id") % 97).as("g"),
      (xxhash64(col("id")) % 1000).cast("double").as("v"))
    val fast = TopKPerGroup(df, Seq("g"),
      Seq("v" -> true, "id" -> false), 3)
    assert(canon(fast) == canon(windowTwin(df, 3)))
  }

  test("k larger than every group keeps all rows; ties break by order") {
    val df = Seq((1L, 1L, 5.0), (2L, 1L, 5.0), (3L, 2L, 1.0))
      .toDF("id", "g", "v")
    val fast = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 10)
    assert(fast.count() == 3)
    // exact-tie group at k=1: the id tiebreak decides, like row_number
    val one = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 1)
    assert(canon(one) == canon(windowTwin(df, 1)))
  }

  test("empty input and unknown column") {
    val df = Seq.empty[(Long, Long, Double)].toDF("id", "g", "v")
    assert(TopKPerGroup(df, Seq("g"), Seq("v" -> true), 2).count() == 0)
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("nope"), Seq("v" -> true), 2).count()
    }
  }

  test("plans partial+final heaps with one exchange, no pre-shuffle sort") {
    val df = spark.range(1000).select(
      col("id"), (col("id") % 10).as("g"), col("id").cast("double").as("v"))
    val top = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 3)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial") &&
      plan.contains("TopKPerGroupFinal"), s"missing operator nodes:\n$plan")
    // the whole point: the input is never sorted — only heaps + the
    // k-per-group exchange
    assert(!plan.contains("Sort "), s"unexpected sort in plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(g"),
      s"expected group-key exchange between partial and final:\n$plan")
  }

  test("float group keys normalize: -0.0 and 0.0 are ONE group") {
    val df = Seq((1L, 0.0, 1.0), (2L, -0.0, 2.0), (3L, -0.0, 3.0))
      .toDF("id", "g", "v")
    val top = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
    // one group of three rows → k=2 survivors, the v-desc best two
    val got = top.select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L),
      s"-0.0/0.0 must share one heap, got ids $got")
  }

  test("varK matches a per-group-k window form; k<=0 groups drop") {
    val df = spark.range(4000).select(
      col("id"), (col("id") % 53).as("g"),
      (xxhash64(col("id")) % 1000).cast("double").as("v"))
      // per-group bound: g%7 - 1 in [-1, 5]; group-constant, some <= 0
      .withColumn("kb", ((col("g") % 7) - 1).cast("int"))
    val fast = TopKPerGroup.varK(df, Seq("g"),
      Seq("v" -> true, "id" -> false), "kb")
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val twin = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("kb")).drop("rn")
    assert(canon(fast) == canon(twin))
    // invariance under partitioning (partial heaps see different rows)
    assert(canon(TopKPerGroup.varK(df.repartition(1), Seq("g"),
      Seq("v" -> true, "id" -> false), "kb")) ==
      canon(TopKPerGroup.varK(df.repartition(17), Seq("g"),
        Seq("v" -> true, "id" -> false), "kb")))
  }

  test("partitioning-invariant results") {
    val df = spark.range(3000).select(
      col("id"), (col("id") % 31).as("g"),
      (xxhash64(col("id") + 5) % 500).cast("double").as("v"))
    val a = canon(TopKPerGroup(df.repartition(1), Seq("g"),
      Seq("v" -> true, "id" -> false), 4))
    val b = canon(TopKPerGroup(df.repartition(17), Seq("g"),
      Seq("v" -> true, "id" -> false), 4))
    assert(a == b)
  }

  test("empty groupCols / empty order are rejected at the API") {
    val df = spark.range(10).select(col("id"), (col("id") % 3).as("g"),
      col("id").cast("double").as("v"))
    val e1 = intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq.empty, Seq("v" -> true), 3)
    }
    assert(e1.getMessage.contains("orderBy().limit"))
    val e2 = intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("g"), Seq.empty, 3)
    }
    assert(e2.getMessage.contains("order must be non-empty"))
  }

  test("partial-phase flush: >128k groups in one partition stays correct") {
    // 300k near-unique groups forced into ONE input partition crosses
    // the 1<<17 flush bound twice; each group has 2 rows so the flush
    // can split a group across emissions — the final phase must still
    // re-heap them into one correct survivor per group
    val n = 300000
    val df = spark.range(2L * n).select(
      (col("id") % n).as("g"),
      col("id"),
      (col("id") % 7).cast("double").as("v"))
      .repartition(1)
    val got = TopKPerGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 1)
    assert(got.count() == n.toLong, "one survivor per group")
    // spot-check: group g keeps the row with max v (tie: lower id);
    // rows of group g are id=g (v=g%7) and id=g+n (v=(g+n)%7)
    val sample = got.filter(col("g") < 1000)
      .select("g", "id").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (g <- 0L until 1000L) {
      val v1 = g % 7
      val v2 = (g + n) % 7
      val expect = if (v1 > v2) g else if (v2 > v1) g + n else g
      assert(sample(g) == expect, s"group $g kept ${sample(g)}")
    }
  }
}
