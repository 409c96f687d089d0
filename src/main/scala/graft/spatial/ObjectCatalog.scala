package graft.spatial

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Object-catalog construction — group multi-epoch detections into
  * static-sky objects, the reference's `lsd-make-object-catalog`
  * (SURVEY.md §2C J7 / §0 item 5, [H]).
  *
  * Semantics: single-linkage (friends-of-friends) clustering of
  * detections within `radiusDeg`; each connected component becomes one
  * object whose id is the smallest member detection id and whose
  * position is the spherical mean of its members.
  *
  * Spark-native algorithm, no driver-side state:
  *   1. candidate edges from [[CrossMatch.allPairs]] (cell-blocked,
  *      shuffle-bounded);
  *   2. distributed label propagation to the component minimum —
  *      iterate `label := min(label, neighbors' labels)` to fixpoint.
  *      Iteration count is the graph diameter (small for physical
  *      objects: detections of one source all sit within ~radius), and
  *      each round is one shuffle join — the standard scalable
  *      connected-components recipe;
  *   3. one aggregation for per-object summaries (mean position via
  *      3-D unit vectors, so lon wraparound and pole clustering are
  *      handled correctly).
  */
object ObjectCatalog {

  /** @return (assignments, objects):
    *   assignments: det_id, obj_id
    *   objects: obj_id, lon, lat, n_det
    */
  def build(dets: DataFrame, idCol: String, lonCol: String, latCol: String,
            radiusDeg: Double, maxIter: Int = 20): (DataFrame, DataFrame) = {
    val d = dets.select(col(idCol).as("det_id"), col(lonCol).as("lon"),
      col(latCol).as("lat"))

    // candidate edges (cell-blocked, shuffle-bounded), then the shared
    // min-label component engine (graft.operators.Components)
    val pairs = CrossMatch.allPairs(d, d, "det_id", "lon", "lat",
      "det_id", "lon", "lat", radiusDeg)
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val assignments = graft.operators.Components
      .minLabel(d, "det_id", pairs, "src", "dst", maxIter)
      .select(col("det_id"), col("component").as("obj_id"))
    // spherical mean via unit-vector average
    val withXyz = d.join(assignments, "det_id")
      .select(col("obj_id"),
        (cos(radians(col("lat"))) * cos(radians(col("lon")))).as("x"),
        (cos(radians(col("lat"))) * sin(radians(col("lon")))).as("y"),
        sin(radians(col("lat"))).as("z"))
    val objects = withXyz.groupBy("obj_id")
      .agg(avg("x").as("mx"), avg("y").as("my"), avg("z").as("mz"),
        count(lit(1)).as("n_det"))
      .select(col("obj_id"),
        pmod(degrees(atan2(col("my"), col("mx"))), lit(360.0)).as("lon"),
        degrees(atan2(col("mz"),
          sqrt(col("mx") * col("mx") + col("my") * col("my")))).as("lat"),
        col("n_det"))
    (assignments, objects)
  }
}
