package graft.spatial

import graft.SpecBase
import graft.sources.SpatialWriter
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.util.Random

class FootprintSpec extends SpecBase {
  import spark.implicits._

  private val rnd = new Random(9)
  private lazy val cat = (0L until 5000L).map { i =>
    (i, rnd.nextDouble() * 360,
      math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1)))
  }.toDF("obj_id", "lon", "lat")

  test("cone predicate matches haversine membership") {
    val inside = cat.filter(Footprint.cone(col("lon"), col("lat"),
      120.0, 30.0, 10.0))
    val check = inside.withColumn("d",
      CrossMatch.distDeg(col("lon"), col("lat"), lit(120.0), lit(30.0)))
    assert(inside.count() > 0)
    assert(check.filter(col("d") > 10.0).count() == 0)
  }

  test("rect handles lon wraparound") {
    val wrapped = cat.filter(Footprint.rect(col("lon"), col("lat"),
      350, 10, -20, 20))
    assert(wrapped.count() > 0)
    assert(wrapped.filter(col("lon") > 10 && col("lon") < 350).count() == 0)
  }

  test("coneCells is a superset of the cells of matching points") {
    for ((lon0, lat0, r) <- Seq((120.0, 30.0, 5.0), (0.5, -45.0, 2.0),
      (359.0, 88.0, 3.0), (180.0, -89.5, 1.0))) {
      val level = 5
      val cells = Footprint.coneCells(lon0, lat0, r, level).toSet
      val pointCells = cat
        .filter(Footprint.cone(col("lon"), col("lat"), lon0, lat0, r))
        .select(SkyPix.cell(col("lon"), col("lat"), level))
        .collect().map(_.getLong(0)).toSet
      assert(pointCells.subsetOf(cells),
        s"cone($lon0,$lat0,$r): missing ${pointCells -- cells}")
      assert(cells.size < (1 << (2 * level)),
        "enumeration must actually prune")
    }
  }

  test("cell pruning + exact predicate ≡ exact predicate alone") {
    val path = Files.createTempDirectory("graft_fp").toString + "/cat"
    SpatialWriter.write(cat, "lon", "lat", level = 4, path = path)
    val t = SpatialWriter.readPrimary(spark, path)
    val (lon0, lat0, r) = (200.0, -10.0, 8.0)
    val cells = Footprint.coneCells(lon0, lat0, r, 4)
    val pruned = t.filter(col("cell").isin(cells: _*))
      .filter(Footprint.cone(col("lon"), col("lat"), lon0, lat0, r))
    val full = t.filter(Footprint.cone(col("lon"), col("lat"), lon0, lat0, r))
    assert(pruned.count() == full.count())
  }
}
