package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd `|set(a) ∩ set(b)|` for two string arrays — the verify
  * kernel of the PPJoin dedup family. `size(array_intersect(a, b))`
  * computes the same number but materializes the intersection ARRAY
  * and re-dedups both inputs per row; over hundreds of thousands of
  * candidate pairs the count-only probe (hash set of `a`, membership
  * scan of `b`) does a fraction of the allocation for the only thing
  * the caller reads. Set semantics on both sides (duplicates in
  * either input count once), byte-equality like Spark's string
  * comparisons, null arrays propagate null (IntersectCountSpec pins
  * all of it against the builtin). Array ELEMENTS must be non-null:
  * the type check REJECTS containsNull=true inputs at analysis time
  * (r21 advisor: getUTF8String returns null for a null element and
  * HashSet accepts it, so a nullable input would silently count null
  * as a matching value instead of failing — the check makes the
  * non-null contract structural; shingle arrays are built with
  * containsNull=false, so it is free at every call site). */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, false), ArrayType(StringType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "intersect_count requires non-null array elements " +
            "(containsNull=false): a null element would be counted " +
            "as a matching value instead of failing loud")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count requires two array<string> inputs, got " +
          s"${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    // build on the smaller side, probe with the larger
    val (build, probe) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = build.numElements()
    val set = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) { set.add(build.getUTF8String(i)); i += 1 }
    var cnt = 0L
    val m = probe.numElements()
    i = 0
    while (i < m) {
      // remove-on-hit = set semantics even when the probe side
      // carries duplicates (each common value counts once)
      if (set.remove(probe.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  /** `intersect_count(a, b)` as a Column. */
  def intersectCount(a: Column, b: Column): Column =
    GraftShims.column(IntersectCount(GraftShims.expression(a),
      GraftShims.expression(b)))
}
