package graft

import graft.functions.VectorKernels
import org.apache.spark.sql.functions._

class VectorKernelsSpec extends SpecBase {
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(4.0f, 5.0f, 6.0f)

  test("DotFold matches the manual left-to-right double fold") {
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(VectorKernels.dot(col("a"), col("b"))).head.getDouble(0)
    val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble
    }
    assert(got == want)
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((a, b)).toDF("a", "b")
    val cg = df.select(VectorKernels.dot(col("a"), col("b"))).head.getDouble(0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp =
        df.select(VectorKernels.dot(col("a"), col("b"))).head.getDouble(0)
      assert(interp == cg)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("null array yields null") {
    val df = Seq((Option(a), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(VectorKernels.dot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("empty arrays yield 0.0; mismatched lengths use the shorter") {
    val df = Seq((Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    assert(df.select(VectorKernels.dot(col("a"), col("b"))).head.getDouble(0) == 0.0)
    val df2 = Seq((Array(2.0f, 9.0f), Array(3.0f))).toDF("a", "b")
    assert(df2.select(VectorKernels.dot(col("a"), col("b"))).head.getDouble(0) == 6.0)
  }

  test("double arrays fold exactly; mixed float/double works") {
    val df = Seq((Array(0.1, 0.2, 0.3), Array(2.0, 3.0, 4.0)))
      .toDF("a", "b")
    val got = df.select(VectorKernels.dot(col("a"), col("b")))
      .head.getDouble(0)
    assert(got == 0.1 * 2.0 + 0.2 * 3.0 + 0.3 * 4.0) // same fold order
    val mixed = Seq((Array(1.5f, 2.5f), Array(2.0, 4.0))).toDF("a", "b")
    assert(mixed.select(VectorKernels.dot(col("a"), col("b")))
      .head.getDouble(0) == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("wrong input type is rejected at analysis") {
    val df = Seq((Array(1, 2), Array(1, 2))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorKernels.dot(col("a"), col("b"))).head
    }
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((a, a)).toDF("a", "b")
    val c = df.select(VectorKernels.cosine(
      VectorKernels.dot(col("a"), col("b")),
      VectorKernels.norm2(col("a")), VectorKernels.norm2(col("b"))))
      .head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-15)
  }
}
