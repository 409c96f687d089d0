package graft.tools

import graft.LsdDb
import graft.ql.LsdQL
import graft.sources.SpatialWriter
import graft.spatial.CrossMatch
import org.apache.spark.sql.SparkSession

/** CLI entry points mirroring the reference's tool surface
  * (`lsd-query`, `lsd-import`, `lsd-xmatch`; SURVEY.md §0 item 5,
  * [H]). Thin mains over the library — all logic lives in graft.*.
  */
private[tools] object Cli {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** lsd-query analog: run an LsdQL string against a database directory.
  *
  * Usage: QueryCli <dbRoot> <query> [maxRows]
  * `INTO t` inside the query materializes t under dbRoot.
  */
object QueryCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryCli <dbRoot> <query> [maxRows]")
    val spark = Cli.session()
    val df = LsdQL.forDb(LsdDb(spark, args(0))).query(args(1))
    df.show(if (args.length > 2) args(2).toInt else 20, truncate = false)
  }
}

/** lsd-import analog: bulk-load a CSV file or a FITS binary-table
  * directory into a cell-partitioned Parquet table (with optional
  * neighbor-margin replication). The format is picked by extension:
  * `.fits` dirs/files go through graft.sources.Fits, anything else
  * through the CSV reader.
  *
  * Usage: ImportCli <csv|fitsDir> <out> <lonCol> <latCol> <level> [marginDeg]
  */
object ImportCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: ImportCli <csv|fitsDir> <out> <lonCol> <latCol> <level> [marginDeg]")
    val spark = Cli.session()
    val df =
      if (args(0).endsWith(".fits") ||
        new java.io.File(args(0)).isDirectory &&
          Option(new java.io.File(args(0)).list())
            .exists(_.exists(_.endsWith(".fits"))))
        graft.sources.Fits.read(spark, args(0))
      else spark.read.option("header", "true").option("inferSchema", "true")
        .csv(args(0))
    SpatialWriter.write(df, args(2), args(3), args(4).toInt, args(1),
      margin = args.lift(5).map(_.toDouble))
    println(s"imported ${args(0)} -> ${args(1)}")
  }
}

/** lsd-make-object-catalog analog: friends-of-friends group a
  * detection table into objects; writes `<outName>` (object summaries)
  * and `<outName>_assign` (det_id → obj_id) under dbRoot.
  *
  * Usage: MakeObjectCatalogCli <dbRoot> <detTable> <idCol,lonCol,latCol>
  *                             <radiusDeg> <outName>
  */
object MakeObjectCatalogCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 5, "usage: MakeObjectCatalogCli <dbRoot> " +
      "<detTable> <idCol,lonCol,latCol> <radiusDeg> <outName>")
    val spark = Cli.session()
    val db = LsdDb(spark, args(0))
    val Array(id, lon, lat) = args(2).split(",").map(_.trim)
    val (assign, objects) = graft.spatial.ObjectCatalog.build(
      db.table(args(1)), id, lon, lat, args(3).toDouble)
    objects.write.mode("overwrite").parquet(s"${args(0)}/${args(4)}.parquet")
    assign.write.mode("overwrite")
      .parquet(s"${args(0)}/${args(4)}_assign.parquet")
    println(s"object catalog ${args(1)} -> ${args(4)} " +
      s"(${objects.count()} objects)")
  }
}

/** lsd-xmatch analog: materialize a cross-match pair table between two
  * catalogs — the artifact the reference stored as a join definition.
  * Register the result as a JoinDef through its id columns to use it
  * from LsdQL.
  *
  * Usage: XmatchCli <dbRoot> <tableA> <aId,aLon,aLat>
  *                  <tableB> <bId,bLon,bLat> <radiusDeg> <nmax> <outName>
  */
object XmatchCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 8, "usage: XmatchCli <dbRoot> <tableA> " +
      "<aId,aLon,aLat> <tableB> <bId,bLon,bLat> <radiusDeg> <nmax> <outName>")
    val spark = Cli.session()
    val db = LsdDb(spark, args(0))
    val Array(aId, aLon, aLat) = args(2).split(",").map(_.trim)
    val Array(bId, bLon, bLat) = args(4).split(",").map(_.trim)
    val pairs = CrossMatch(db.table(args(1)), db.table(args(3)),
      aId, aLon, aLat, bId, bLon, bLat, args(5).toDouble, args(6).toInt)
    pairs.write.mode("overwrite").parquet(s"${args(0)}/${args(7)}.parquet")
    println(s"xmatch ${args(1)}x${args(3)} -> ${args(7)} " +
      s"(${pairs.count()} pairs)")
  }
}
