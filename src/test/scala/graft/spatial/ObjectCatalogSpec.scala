package graft.spatial

import graft.SpecBase
import org.apache.spark.sql.functions._

import scala.util.Random

class ObjectCatalogSpec extends SpecBase {
  import spark.implicits._

  // ground truth: 100 well-separated cluster centers, 1-6 detections
  // each scattered within 0.02° of the center; separation (≥3°) is far
  // beyond the 0.05° link radius, so components == clusters
  private val rnd = new Random(21)
  private lazy val truth: Seq[(Long, Long, Double, Double)] = {
    val centers = (0 until 100).map { c =>
      (c, (c % 20) * 18.0 + 1.0 + rnd.nextDouble(),
        math.toDegrees(math.asin(((c / 20) - 2) / 2.6)) * 0.8)
    }
    var detId = -1L
    centers.flatMap { case (c, lon, lat) =>
      (0 to (c % 6)).map { _ =>
        detId += 1
        (detId, c.toLong, lon + (rnd.nextDouble() - 0.5) * 0.02,
          lat + (rnd.nextDouble() - 0.5) * 0.02)
      }
    }
  }

  test("friends-of-friends recovers the true clusters exactly") {
    val dets = truth.map { case (d, _, lo, la) => (d, lo, la) }
      .toDF("det_id", "lon", "lat")
    val (assign, objects) = ObjectCatalog.build(
      dets, "det_id", "lon", "lat", radiusDeg = 0.05)
    val got = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same component ⇔ same truth cluster
    val byCluster = truth.groupBy(_._2).values
    for (members <- byCluster) {
      val labels = members.map(m => got(m._1)).toSet
      assert(labels.size == 1, s"cluster split: $members -> $labels")
      assert(labels.head == members.map(_._1).min, "obj_id = min det_id")
    }
    assert(objects.count() == 100)
    // object positions sit within the scatter radius of the true center
    val centers = truth.groupBy(_._2).map { case (c, ms) =>
      c -> (ms.map(_._3).sum / ms.size, ms.map(_._4).sum / ms.size)
    }
    objects.collect().foreach { r =>
      val objId = r.getLong(0)
      val cluster = truth.find(_._1 == objId).get._2
      val (clon, clat) = centers(cluster)
      assert(math.abs(r.getDouble(1) - clon) < 0.05)
      assert(math.abs(r.getDouble(2) - clat) < 0.05)
    }
  }

  test("summarize snap/exactSum path agrees with the plain path") {
    // the oracle-gated q_object_catalog uses summarize(snap=Det.d6,
    // exactSum=true); the library default is plain double math. Both
    // must land on the same positions to well within the snap grid's
    // resolution (1e-6 per-term snaps perturb a mean of n terms by
    // ≤ 5e-7, and the atan2 output by the same order).
    val dets = truth.map { case (d, _, lo, la) => (d, lo, la) }
      .toDF("det_id", "lon", "lat")
    val (assign, plain) = ObjectCatalog.build(
      dets, "det_id", "lon", "lat", radiusDeg = 0.05)
    val snapped = ObjectCatalog.summarize(
      dets.select(col("det_id"), col("lon"), col("lat")), assign,
      snap = graft.functions.Det.d6, exactSum = true)
    val p = plain.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    snapped.collect().foreach { r =>
      val (lo, la) = p(r.getLong(0))
      assert(math.abs(r.getDouble(1) - lo) < 1e-4, s"lon ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - la) < 1e-4, s"lat ${r.getLong(0)}")
    }
  }

  test("a detection chain links transitively (single linkage)") {
    // chain of 5 dets, each 0.04° apart — pairwise radius 0.05 links
    // neighbors only, the component must still be one object
    val dets = (0 until 5).map(i => (i.toLong, 10.0 + i * 0.04, 0.0))
      .toDF("det_id", "lon", "lat")
    val (assign, objects) = ObjectCatalog.build(
      dets, "det_id", "lon", "lat", radiusDeg = 0.05)
    assert(objects.count() == 1)
    assert(assign.select("obj_id").distinct().head.getLong(0) == 0L)
  }
}
