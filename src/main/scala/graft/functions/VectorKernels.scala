package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd vector dot product (array<float> or array<double>
  * inputs): Σ (double)a[i] * (double)b[i],
  * accumulated left-to-right — the exact fold order of the DuckDB
  * oracle's `list_reduce(list_transform(list_zip(a,b), ...), +)`, so
  * scores stay bit-identical while running ~100× faster than the
  * interpreted higher-order-function fold (`aggregate(zip_with(...))`
  * boxes every element and breaks whole-stage codegen; this compiles
  * to a tight primitive loop inside it).
  *
  * This is the one "promote to a native Expression" case SURVEY.md §4
  * reserves for measured hot spots: the cosine kernel dominated the
  * vector-op bench (14s → sub-second at sf0.1).
  *
  * Assumes non-null array elements (the embeddings table guarantees
  * this; a null element reads as 0.0, which is also what the fold
  * semantics below document).
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined &&
      elemType(right.dataType).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold requires array<float> or array<double> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_fold"

  private def isFloat(t: DataType): Boolean =
    elemType(t).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, t: DataType) =
        if (isFloat(t)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {
  /** dot(a, b) over array<float> columns → double. */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(
      DotFold(GraftShims.expression(a), GraftShims.expression(b)))

  /** Expose dot_fold to spark.sql on a live session:
    * `SELECT dot_fold(a, b) ...`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShims.registerFunction(spark, "dot_fold",
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "dot_fold(a, b) takes two arguments")
        DotFold(args(0), args(1))
      })

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity with precomputed squared norms. */
  def cosine(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / (sqrt(n2a) * sqrt(n2b))
}
