package graft.ql

import graft.{LsdDb, SpecBase}
import java.nio.file.Files

class LsdQLSpec extends SpecBase {

  private lazy val db = LsdDb(spark, sfDir)
  private lazy val ql = LsdQL.forDb(db)

  test("SELECT/FROM/WHERE basic query") {
    val df = ql.query(
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000")
    val direct = db.table("orders")
      .filter("o_totalprice > 400000").count()
    assert(df.count() == direct && df.columns.toSeq ==
      Seq("o_orderkey", "o_totalprice"))
  }

  test("implicit join along declared relations (FROM a, b)") {
    val df = ql.query(
      "SELECT o_orderkey, c_name FROM orders, customer")
    assert(df.count() == db.table("orders").count())
  }

  test("multi-table join path with expressions and aliases") {
    val df = ql.query(
      """SELECT n_name, r_name, c_acctbal * 2 AS bal2
        |FROM customer, nation, region WHERE c_acctbal > 0""".stripMargin)
    val direct = db.table("customer").filter("c_acctbal > 0").count()
    assert(df.count() == direct)
    assert(df.columns.contains("bal2"))
  }

  test("(outer) join keeps unmatched left rows") {
    // every customer row survives a left join to orders
    val df = ql.query("SELECT c_custkey, o_orderkey FROM customer, orders(outer)")
    assert(df.count() >= db.table("customer").count())
  }

  test("INTO materializes a new table") {
    val tmp = Files.createTempDirectory("graft_ql").toString
    val q = LsdQL(db, LsdQL.standardJoins, intoRoot = Some(tmp))
    q.query("SELECT o_orderkey FROM orders WHERE o_totalprice > 450000 INTO big_orders")
    val written = spark.read.parquet(s"$tmp/big_orders.parquet")
    assert(written.count() ==
      db.table("orders").filter("o_totalprice > 450000").count())
  }

  test("keywords and commas inside string literals don't break parsing") {
    val df = ql.query(
      """SELECT concat(o_orderpriority, ' from, where ') AS tagged, o_orderkey
        |FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin)
    assert(df.count() == db.table("orders")
      .filter("o_orderpriority = '5-LOW'").count())
    assert(df.columns.toSeq == Seq("tagged", "o_orderkey"))
    assert(df.head.getString(0).endsWith(" from, where "))
  }

  test("unknown join relation raises a clear error") {
    val ex = intercept[IllegalArgumentException] {
      ql.query("SELECT 1 FROM orders, events")
    }
    assert(ex.getMessage.contains("no join relation"))
  }
}
