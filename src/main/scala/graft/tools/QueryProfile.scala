package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev tool: time one declared query (cold + warm) and print its final
  * adaptive plan. Usage: QueryProfile <name> [sfDir] */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Registry.specs.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    // Mirror Bench's generic warmup so "cold" here = the query's own
    // first-run cost under bench conditions, not JVM bring-up.
    graft.LsdDb.standardTables
      .foreach(t => graft.LsdDb.table(spark, dir, t).count())
    graft.operators.Aggregates.qAggBasic.fn(spark, dir).count()
    for (run <- Seq("cold", "warm", "warm")) {
      val t0 = System.nanoTime()
      // Bench's measurement: drain the executed plan so every output
      // column is materialized (count() lets Catalyst prune them)
      q.fn(spark, dir).queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) { it.next(); () })
      println(f"$name $run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = q.fn(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
