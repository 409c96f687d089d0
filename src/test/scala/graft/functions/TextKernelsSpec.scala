package graft.functions

import graft.SpecBase
import org.apache.spark.sql.functions._

class TextKernelsSpec extends SpecBase {
  import spark.implicits._

  private val alphabet = ('a' to 'z') :+ ' '

  test("charCounts equals the translate-based count on any input") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog",
      "",
      "   ",
      "ALL CAPS IGNORED",
      "unicode: héllo wörld ß — 汉字 and emoji 🙂 mixed in",
      "aaaaaaaaaabbbbbbbbbb",
      "punctuation!@#$%^&*()_+{}|:\"<>?~`",
      (0 until 1000).map(i => ('a' + i % 27).toChar).mkString)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    def cnt(c: Char) =
      length(col("text")) - length(translate(col("text"), c.toString, ""))
    val viaTranslate = rows.select(col("id") +:
      alphabet.map(c => cnt(c).cast("long").as(s"c_$c")): _*)
    val viaKernel = rows.select(col("id") +:
      alphabet.indices.map(i =>
        element_at(TextKernels.charCounts(col("text")), i + 1)
          .as(s"c_${alphabet(i)}")): _*)
    val a = viaTranslate.orderBy("id").collect()
    val b = viaKernel.orderBy("id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("charCounts stays inside whole-stage codegen") {
    val df = spark.range(10).select(
      TextKernels.charCounts(concat(lit("abc xyz "),
        col("id").cast("string"))).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(N)" stage prefix is the whole-stage-codegen marker; the
    // Project carrying char_counts must sit inside one
    assert(plan.contains("*(1) Project"), plan)
    // interpreted path agrees with codegen (nullSafeEval twin)
    val viaEval = CharCounts(org.apache.spark.sql.catalyst.expressions
      .Literal.create("abc xyz abc")).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(viaEval.toLongArray()(0) == 2L) // 'a' twice
    assert(viaEval.toLongArray()(26) == 2L) // two spaces
    assert(df.collect().length == 10)
  }

  test("null text yields null counts, not a crash") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("ab")))
      .toDF("id", "text")
      .select(col("id"), TextKernels.charCounts(col("text")).as("c"))
      .orderBy("id").collect()
    assert(df(0).isNullAt(1))
    assert(df(1).getSeq[Long](1).take(2) == Seq(1L, 1L))
  }
}
