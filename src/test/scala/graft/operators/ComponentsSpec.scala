package graft.operators

import graft.SpecBase

class ComponentsSpec extends SpecBase {
  import spark.implicits._

  test("min-label propagation finds exact components, incl. singletons") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20} (singleton),
    // {30,31,32} (triangle with a redundant edge)
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 30L, 31L, 32L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (30L, 31L), (31L, 32L), (30L, 32L)).toDF("a", "b")
    val got = Components.minLabel(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L)
    assert(got == want)
  }

  test("long chain needs diameter rounds; tight maxIter raises") {
    val n = 12
    val nodes = (0L until n.toLong).toDF("id")
    val chain = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.minLabel(nodes, "id", chain, "a", "b")
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(0L))
    intercept[IllegalArgumentException] {
      Components.minLabel(nodes, "id", chain, "a", "b", maxIter = 2)
    }
  }
}
