package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass word n-gram shingler:
  * `word_ngrams(text, n, sep, distinct)` ≡
  *
  * {{{
  *   val w = filter(split(text, "\\s+"), _ =!= "")       // words
  *   [array_distinct](zip_with-ladder of n aligned slices // n-grams
  *     joined with `sep`)
  * }}}
  *
  * WHY an expression and not the composed builtins (the CharCounts /
  * DotFold measured-hot-spot promotion rule): the zip_with ladder is
  * a higher-order function — a CodegenFallback — so wherever the
  * optimizer lands it in a non-codegen operator (it collapses the
  * shingle projection INTO the Generate that explodes it), it
  * evaluates INTERPRETED, where subexpression elimination does not
  * exist; and the `val w = words(c)` Column reuse duplicates the
  * split subtree once per slice, so each ladder evaluation re-ran the
  * regex split SIX times per row (observed live in q_dedup_prefix's
  * executed plan; the tokenize stage carried 6 × `split(text, \s+)`
  * inside one Generate). This kernel is one byte scan + one output
  * array per row, inside whole-stage codegen.
  *
  * Exactness vs the builtin form (spec-pinned in WordNgramsSpec):
  *  - word boundaries: Java `\s` is exactly the ASCII set
  *    {space, \t, \n, , \f, \r} (Pattern without
  *    UNICODE_CHARACTER_CLASS), and none of those bytes can occur
  *    inside a multi-byte UTF-8 sequence (continuation bytes ≥ 0x80),
  *    so maximal non-\s byte runs == the split+filter word list on
  *    any input, unicode included;
  *  - n-grams: consecutive windows (sliding(n)), i.e. the aligned
  *    slice ladder with its greatest(size−(n−1), 0) guard;
  *  - distinct keeps the FIRST occurrence order, like array_distinct
  *    (UTF8String equality is byte equality, same as Spark's string
  *    semantic equality);
  *  - null text → null. One deliberate divergence: on a ZERO-word
  *    input the un-guarded slice form of some call sites (slice(w, 1,
  *    size−1) with size = 0) would throw on the negative length —
  *    this kernel returns the empty array instead (strictly total;
  *    no live row exercises the throwing path).
  */
case class WordNgrams(child: Expression, n: Int, sep: String,
                      distinct: Boolean) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string input, got ${child.dataType.sql}")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private lazy val sepBytes: Array[Byte] =
    UTF8String.fromString(sep).getBytes

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n, sepBytes,
      distinct)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = graft.functions.WordNgrams.compute(
         |  $s, $n, $sepRef, $distinct);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WordNgrams {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** One pass: word runs → consecutive n-gram byte concatenations.
    * Called from both the interpreted eval and the generated code. */
  def compute(s: UTF8String, n: Int, sep: Array[Byte],
              distinct: Boolean): GenericArrayData = {
    val bytes = s.getBytes
    // word boundaries as (start, end) offset pairs
    var nw = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (nw == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nw * 2)
          ends = java.util.Arrays.copyOf(ends, nw * 2)
        }
        starts(nw) = st; ends(nw) = i; nw += 1
      }
    }
    val m = nw - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val out = new java.util.ArrayList[AnyRef](m)
    val seen: java.util.HashSet[UTF8String] =
      if (distinct) new java.util.HashSet[UTF8String](m * 2) else null
    var g = 0
    while (g < m) {
      var sz = sep.length * (n - 1)
      var k = 0
      while (k < n) { sz += ends(g + k) - starts(g + k); k += 1 }
      val buf = new Array[Byte](sz)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) {
          System.arraycopy(sep, 0, buf, pos, sep.length)
          pos += sep.length
        }
        val wl = ends(g + k) - starts(g + k)
        System.arraycopy(bytes, starts(g + k), buf, pos, wl)
        pos += wl
        k += 1
      }
      val gram = UTF8String.fromBytes(buf)
      if (seen == null || seen.add(gram)) out.add(gram)
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** `word_ngrams(text, n, sep, distinct)` as a Column. */
  def wordNgrams(text: Column, n: Int, sep: String,
                 distinct: Boolean): Column =
    GraftShims.column(WordNgrams(GraftShims.expression(text), n, sep,
      distinct))
}
