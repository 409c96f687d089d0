package graft.sources

import graft.SpecBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SpecBase {
  import spark.implicits._

  // 64×64 integer grid, one row per (x, y) — every file's box is a
  // tight z-curve segment
  private lazy val grid = {
    val tmp = Files.createTempDirectory("graft_zorder").toString
    val df = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y").withColumn("v", col("x") * 64 + col("y"))
    ZOrderLayout.write(df, "x", "y", tmp, files = 16)
    tmp
  }

  test("box read returns exactly the rows of the direct filter") {
    val got = ZOrderLayout.read(spark, grid, 10, 20, 30, 40)
      .filter(col("x").between(10, 20) && col("y").between(30, 40))
      .select("v").as[Int].collect().sorted.toSeq
    val want = (for (x <- 10 to 20; y <- 30 to 40) yield x * 64 + y).sorted
    assert(got == want)
  }

  test("a small box prunes most files; full box keeps all") {
    val (sel, total) = ZOrderLayout.selectFiles(spark, grid, 4, 11, 4, 11)
    assert(total == 16)
    // an 8×8 box of a 64×64 z-clustered grid touches a handful of
    // z-segments, never all of them
    assert(sel.length < total / 2,
      s"expected real pruning, read ${sel.length} of $total files")
    val (all, _) = ZOrderLayout.selectFiles(spark, grid, 0, 63, 0, 63)
    assert(all.length == total)
  }

  test("disjoint box selects nothing and read returns zero rows") {
    val (sel, _) = ZOrderLayout.selectFiles(spark, grid, 100, 200, 100, 200)
    assert(sel.isEmpty)
    assert(ZOrderLayout.read(spark, grid, 100, 200, 100, 200).count() == 0)
  }

  test("boundary rows are never skipped (superset contract)") {
    // boxes hugging every file-box edge: compare against direct filter
    for ((xlo, xhi, ylo, yhi) <- Seq((0, 0, 0, 63), (63, 63, 0, 63),
        (0, 63, 0, 0), (0, 63, 63, 63), (31, 32, 31, 32))) {
      val got = ZOrderLayout.read(spark, grid, xlo, xhi, ylo, yhi)
        .filter(col("x").between(xlo, xhi) && col("y").between(ylo, yhi))
        .count()
      val want = (xhi - xlo + 1).toLong * (yhi - ylo + 1)
      assert(got == want, s"box ($xlo,$xhi,$ylo,$yhi)")
    }
  }
}
