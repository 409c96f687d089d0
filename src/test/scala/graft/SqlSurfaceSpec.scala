package graft

import org.apache.spark.sql.functions._

/** The `spark.sql` surface over registered views — users of the
  * engine can run plain SQL against LsdDb tables (LsdDb.registerAll),
  * and it must agree with the DataFrame programs. */
class SqlSurfaceSpec extends SpecBase {

  test("registerAll + spark.sql agrees with the DataFrame path") {
    val db = LsdDb(spark, sfDir)
    db.registerAll()
    val sqlRes = spark.sql(
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 200000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val dfRes = db.table("lineitem")
      .join(db.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_totalprice") > 200000)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sqlRes.toSeq == dfRes.toSeq && sqlRes.nonEmpty)
  }

  test("events view carries the normalized µs timestamp") {
    LsdDb(spark, sfDir).registerAll(Seq("events"))
    val t = spark.sql("SELECT min(ts) FROM events").head.getTimestamp(0)
    assert(t.toString.startsWith("2024-01-01"))
  }
}
