package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass character histogram over the fixed 27-symbol
  * alphabet a–z + space: returns array<bigint>[27] (index 0–25 = a–z,
  * 26 = space).
  *
  * The composed-builtin form — 27 × `length(text) −
  * length(translate(text, c, ''))` — COPIES the string once per
  * alphabet symbol per use site (the entropy query touched each count
  * three times → ~81 string materializations per row; 11 s of the
  * sf0.1 bench). This is the same measured-hot-spot promotion rule as
  * [[DotFold]]: one tight byte loop inside whole-stage codegen, no
  * copies.
  *
  * Byte-scan correctness on UTF-8: ASCII bytes never occur inside a
  * multi-byte UTF-8 sequence (continuation bytes are ≥ 0x80), so
  * counting ASCII bytes equals counting code points — identical to
  * the `translate`-based count on any input, unicode included.
  */
case class CharCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_counts requires a string input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_counts"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val counts = new Array[Long](27)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      else if (b == ' ') counts(26) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |long[] $counts = new long[27];
         |int $n = $s.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $s.getByte($i);
         |  if ($b >= 'a' && $b <= 'z') $counts[$b - 'a']++;
         |  else if ($b == ' ') $counts[26]++;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  /** char_counts(text) → array<bigint>[27] (a–z, space). */
  def charCounts(text: Column): Column =
    GraftShims.column(CharCounts(GraftShims.expression(text)))
}
