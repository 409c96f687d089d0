package graft.sources

import graft.SpecBase
import graft.spatial.SkyPix
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SpatialWriterSpec extends SpecBase {
  import spark.implicits._

  private lazy val cat = (0L until 2000L).map { i =>
    val rnd = new scala.util.Random(i)
    (i, rnd.nextDouble() * 360,
      math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1)))
  }.toDF("obj_id", "lon", "lat")

  test("partitioned write round-trips and prunes by cell") {
    val path = Files.createTempDirectory("graft_sw").toString + "/cat"
    SpatialWriter.write(cat, "lon", "lat", level = 3, path = path)
    val back = SpatialWriter.readPrimary(spark, path)
    assert(back.count() == 2000)
    // partition pruning: a single-cell filter must scan one directory
    val one = back.filter(col("cell") ===
      SkyPix.cellId(10.0, 10.0, 3)).queryExecution.executedPlan.toString
    assert(one.contains("PartitionFilters") || one.contains("partitionFilters"))
    // directory layout is cell=<id>
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("cell="))
    assert(dirs.nonEmpty && dirs.length <= 64)
  }

  test("margin replication: primaries unique, margins flagged, probe view complete") {
    val path = Files.createTempDirectory("graft_swm").toString + "/cat"
    SpatialWriter.write(cat, "lon", "lat", level = 3, path = path,
      margin = Some(0.5))
    val primary = SpatialWriter.readPrimary(spark, path)
    val all = SpatialWriter.readWithMargins(spark, path)
    assert(primary.count() == 2000)          // each row once as primary
    assert(all.count() > primary.count())    // replicas exist
    // each primary row sits in its home cell
    val misplaced = primary.filter(
      SkyPix.cell(col("lon"), col("lat"), 3) =!= col("cell")).count()
    assert(misplaced == 0)
    // every replica's cell is one of its row's 9 neighbor cells
    val badReplica = all.filter(col("is_margin"))
      .filter(!array_contains(
        SkyPix.neighborCells(col("lon"), col("lat"), 3), col("cell"))).count()
    assert(badReplica == 0)
  }
}
