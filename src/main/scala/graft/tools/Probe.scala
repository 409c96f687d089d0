package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema/read sanity checks (e.g. nanosecond
  * parquet timestamps in `events`). Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "documents", "embeddings")) {
      val df = graft.LsdDb.table(spark, dir, t)
      println(s"== $t ==")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
