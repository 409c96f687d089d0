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
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L)
    // default = small-graph union-find fast path
    val got = Components.minLabel(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // iterative path (fast path disabled) must agree exactly
    val gotIter = Components.minLabel(nodes, "id", edges, "a", "b",
      smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotIter == want)
  }

  test("long chain converges logarithmically via pointer jumping") {
    // Diameter 199 ≫ maxIter 30: plain min-propagation would fail to
    // converge; pointer jumping (on from round 4) must finish in
    // ~3 + log2(199) rounds and still produce the exact single
    // component.
    val n = 200
    val nodes = (0L until n.toLong).toDF("id")
    val chain = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("a", "b")
    val (df, rounds) = Components.minLabelWithRounds(nodes, "id", chain,
      "a", "b", smallGraphEdges = 0L)
    val got = df.collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(0L))
    assert(rounds <= 12, s"expected logarithmic convergence, took $rounds")
    // a too-small neighbor-min budget no longer fails: the loop
    // escalates to large-star/small-star and stays exact
    val esc = Components.minLabel(nodes, "id", chain, "a", "b",
      maxIter = 2, smallGraphEdges = 0L)
      .collect().map(r => r.getLong(1)).distinct
    assert(esc.toSeq == Seq(0L))
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
      "a", "b", smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
    // the fast path answers identically on the same graph
    val gotFast = Components.minLabel(nodes, "id", edges.toDF("a", "b"),
      "a", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotFast == want)
  }

  test("edges through ids absent from the node table do not connect (both paths)") {
    // 1-99-2: 99 is not a node, so 1 and 2 must stay separate; the
    // dangling edge (3,100) must leave 3 a singleton.
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 99L), (99L, 2L), (3L, 100L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val fast = Components.minLabel(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    val iter = Components.minLabel(nodes, "id", edges, "a", "b",
      smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iter == want)
  }

  test("null-keyed edges connect nothing — identical on both paths") {
    // the iterative path's equi-joins silently drop null src/dst; the
    // fast path's typed collect used to NPE on them, diverging the
    // two sides of the edge-count gate (round-13 advice fix)
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((Some(1L), Some(2L)), (None, Some(3L)),
      (Some(3L), None), (None: Option[Long], None: Option[Long]))
      .toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
    val fast = Components.minLabel(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    val iter = Components.minLabel(nodes, "id", edges, "a", "b",
      smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iter == want)
  }

  test("large-star/small-star alone finds exact components on a random graph") {
    val rnd = new scala.util.Random(23)
    val n = 300
    val edges = (0 until 280).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter(p => p._1 != p._2)
    val (roots, rounds) = Components.largeSmallStar(
      edges.toDF("u", "v"))
    assert(rounds <= 12, s"O(log n) bound blown: $rounds rounds")
    val got = roots.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find (min-id labels)
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
    val minOf = (0 until n).groupBy(find).map { case (r, xs) =>
      r -> xs.min.toLong }
    val touched = edges.flatMap(p => Seq(p._1, p._2)).distinct
    touched.foreach { id =>
      assert(got(id) == minOf(find(id.toInt)), s"node $id")
    }
  }

  test("fast path reports 0 rounds, iterative reports > 0") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    assert(Components.minLabelWithRounds(nodes, "id", edges, "a", "b")._2 == 0)
    assert(Components.minLabelWithRounds(nodes, "id", edges, "a", "b",
      smallGraphEdges = 0L)._2 > 0)
  }
}
