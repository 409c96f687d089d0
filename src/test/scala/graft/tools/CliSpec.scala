package graft.tools

import graft.SpecBase

import java.nio.file.Files

class CliSpec extends SpecBase {
  import spark.implicits._

  test("QueryCli runs an LsdQL query end to end") {
    // must not throw; rendering goes to stdout
    QueryCli.main(Array(sfDir,
      "SELECT o_orderkey, c_name FROM orders, customer WHERE o_totalprice > 400000",
      "5"))
  }

  test("QueryCli handles aggregation, multi-hop paths and LIMIT") {
    QueryCli.main(Array(sfDir,
      """SELECT r_name, count(*) AS n FROM lineitem, region
        |GROUP BY r_name HAVING count(*) > 0
        |ORDER BY n DESC LIMIT 3""".stripMargin, "5"))
  }

  test("ImportCli + XmatchCli round trip") {
    val root = Files.createTempDirectory("graft_cli").toString
    val csv = s"$root/objs.csv"
    val rows = (0L until 200L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, rnd.nextDouble() * 360,
        math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1)))
    }
    rows.toDF("obj_id", "lon", "lat").coalesce(1)
      .write.option("header", "true").csv(csv)

    ImportCli.main(Array(csv, s"$root/objects.parquet", "lon", "lat", "4"))
    val imported = spark.read.parquet(s"$root/objects.parquet")
    assert(imported.count() == 200)
    assert(imported.columns.contains("cell"))

    XmatchCli.main(Array(root, "objects", "obj_id,lon,lat",
      "objects", "obj_id,lon,lat", "0.5", "2", "obj_x_obj"))
    val pairs = spark.read.parquet(s"$root/obj_x_obj.parquet")
    // every object matches itself at rank 1, distance 0
    assert(pairs.filter("a_id = b_id AND match_rank = 1").count() == 200)
  }
}
