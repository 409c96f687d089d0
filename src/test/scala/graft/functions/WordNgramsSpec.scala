package graft.functions

import graft.SpecBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins [[WordNgrams]] byte-for-byte against the builtin form it
  * replaced (filter(split)+zip_with-slice ladder+array_distinct) —
  * the kernel must be a pure performance substitution, or every
  * shingle-keyed dedup query changes its answer. */
class WordNgramsSpec extends SpecBase {
  import spark.implicits._

  private def words(c: Column): Column =
    filter(split(c, "\\s+"), w => w =!= "")

  /** The replaced builtin: distinct? ∘ sliding(n) ∘ words, as the
    * aligned-slice zip_with ladder (guarded m, so total on any
    * input). */
  private def builtin(c: Column, n: Int, sep: String,
                      distinct: Boolean): Column = {
    val w = words(c)
    val m = greatest(size(w) - (n - 1), lit(0))
    var acc = slice(w, lit(1), m)
    for (k <- 2 to n)
      acc = zip_with(acc, slice(w, lit(k), m),
        (a, b) => concat_ws(sep, a, b))
    if (distinct) array_distinct(acc) else acc
  }

  private val edgeTexts = Seq(
    "", " ", "a", "a b", "a b c", "a b c d e f",
    "  leading and   multiple   spaces  ",
    "tabs\tand\nnewlines\r\nmixed\u000bvt\u000cff",
    "repeat repeat repeat repeat",
    "a b a b a b", // distinct matters
    "unicode héllo wörld 汉字 🙂 mixed",
    "\u00a0nbsp is not \\s\u00a0so this is three-ish words\u00a0",
    "x", "x y", "trailing space ",
    ("w " * 300).trim) // force the offset-array growth path

  private def checkAll(n: Int, sep: String, distinct: Boolean): Unit = {
    val df = edgeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val a = df.select(col("id"),
        builtin(col("text"), n, sep, distinct).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val b = df.select(col("id"),
        WordNgrams.wordNgrams(col("text"), n, sep, distinct).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(a.toSeq == b.toSeq, s"n=$n sep=${sep.getBytes.toSeq}")
  }

  test("kernel == builtin ladder on edge texts (all three shapes)") {
    checkAll(3, "\u0001", distinct = true) // PipelineOps.shingles3
    checkAll(5, "\u0001", distinct = false) // CurationOps.spans5
    checkAll(2, " ", distinct = true) // TextOps.shingleSet
  }

  test("kernel == builtin on random whitespace-heavy strings") {
    val wordGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.const("dup"), Gen.const("x"))
    val sepGen = Gen.nonEmptyListOf(
      Gen.oneOf(' ', '\t', '\n', '\r')).map(_.mkString)
    val textGen = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, wordGen)
      seps <- Gen.listOfN(k + 1, sepGen)
    } yield seps.head + ws.zip(seps.tail)
      .map { case (w, s) => w + s }.mkString
    val texts = (0 until 120).flatMap { i =>
      textGen(Gen.Parameters.default, Seed(0xb0a7 + i)).toSeq
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for ((n, sep, d) <- Seq((3, "\u0001", true), (5, "\u0001", false),
        (2, " ", true))) {
      val a = df.select(col("id"), builtin(col("text"), n, sep, d))
        .orderBy("id").collect().map(_.getSeq[String](1))
      val b = df.select(col("id"),
          WordNgrams.wordNgrams(col("text"), n, sep, d))
        .orderBy("id").collect().map(_.getSeq[String](1))
      assert(a.toSeq == b.toSeq)
    }
  }

  test("null text maps to null, and codegen is engaged") {
    val df = Seq((1L, "a b c d"), (2L, null))
      .toDF("id", "text")
      .select(col("id"),
        WordNgrams.wordNgrams(col("text"), 3, "\u0001",
          distinct = true).as("g"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[String](1) ==
      Seq("a\u0001b\u0001c", "b\u0001c\u0001d"))
    assert(rows(1).isNullAt(1))
    // the Project carrying word_ngrams must sit inside a whole-stage
    // codegen span (the kernel's reason to exist); a non-foldable
    // input keeps it from constant-folding into a LocalTableScan
    val live = spark.range(4).select(WordNgrams.wordNgrams(
      concat(lit("a b c "), col("id").cast("string")), 3, "\u0001",
      distinct = true).as("g"))
    assert(live.queryExecution.executedPlan.toString
      .contains("*(1) Project"), live.queryExecution.executedPlan)
    assert(live.collect().length == 4)
  }

  test("interpreted eval agrees with the dataframe path") {
    val e = WordNgrams(org.apache.spark.sql.catalyst.expressions.Literal
      .create("a b a b c"), 2, " ", distinct = true)
    val out = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until out.numElements())
      .map(i => out.getUTF8String(i).toString)
    assert(got == Seq("a b", "b a", "b c"))
  }
}
