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

  test("long chain converges logarithmically via pointer jumping") {
    // Diameter 199 ≫ maxIter 30: plain min-propagation would fail to
    // converge; pointer jumping (on from round 4) must finish in
    // ~3 + log2(199) rounds and still produce the exact single
    // component.
    val n = 200
    val nodes = (0L until n.toLong).toDF("id")
    val chain = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("a", "b")
    val (df, rounds) =
      Components.minLabelWithRounds(nodes, "id", chain, "a", "b")
    val got = df.collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(0L))
    assert(rounds <= 12, s"expected logarithmic convergence, took $rounds")
    // a genuinely too-small budget still fails loud
    intercept[IllegalArgumentException] {
      Components.minLabel(nodes, "id", chain, "a", "b", maxIter = 2)
    }
  }

  test("pointer jumping changes rounds, not answers (random graph)") {
    // A denser random graph where jumping actually engages (several
    // rounds): results must equal a plain driver-side union-find.
    val rnd = new scala.util.Random(11)
    val n = 400
    val edges = (0 until 350).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }
    val nodes = (0L until n.toLong).toDF("id")
    val got = Components.minLabel(nodes, "id", edges.toDF("a", "b"),
      "a", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    assert(got == want)
  }
}
