package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke of the driver's t1 path: entry(spark) on a plain session
  * (the driver builds its own session — entry must not depend on any
  * graft-configured conf being preset). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY rows = $n")
    assert(n > 0, "driver t1 smoke would fail")
    spark.stop()
  }
}
