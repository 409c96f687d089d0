package graft.ql

import graft.LsdDb
import org.apache.spark.sql.DataFrame

/** The reference's SQL-ish query language, re-hosted on Catalyst:
  *
  *   SELECT expr [AS name], ... FROM t1, t2[(outer)], ...
  *     [WHERE expr] [INTO newtable]
  *
  * (SURVEY.md §0.2/§3 entry point 1; ref `lsd/query_parser.py` — a
  * clause splitter, not a grammar — and `lsd/join_ops.py` join-path
  * resolution through declared JoinRelations, UNVERIFIED.)
  *
  * Differences by design (Spark-first, documented not emulated):
  *  - expressions are Spark SQL expressions, not NumPy fragments —
  *    same capability (vectorized column math), richer function set;
  *  - join relations are declared as equi-key JoinDefs instead of
  *    materialized xmatch-pair tables (a materialized pair table is
  *    just another JoinDef through its id columns; build one with
  *    graft.spatial.CrossMatch and register it);
  *  - INTO materializes Parquet via the write path rather than a
  *    tablet tree.
  *
  * The clause parse is deliberately the same shape as the reference's
  * (split on top-level keywords, expressions passed through opaque),
  * because Catalyst is the real parser/analyzer underneath.
  */
final case class JoinDef(left: String, leftKey: String,
                         right: String, rightKey: String)

final case class LsdQL(db: LsdDb, joins: Seq[JoinDef],
                       intoRoot: Option[String] = None) {

  private case class FromItem(table: String, outer: Boolean)

  /** Run a QL string → DataFrame (and materialize if INTO given). */
  def query(q: String): DataFrame = {
    val (selectList, fromItems, whereOpt, intoOpt) = parse(q)
    var df = db.table(fromItems.head.table)
    var joined = Set(fromItems.head.table)
    for (item <- fromItems.tail) {
      val jd = joins.find(j =>
        (joined.contains(j.left) && j.right == item.table) ||
          (joined.contains(j.right) && j.left == item.table))
        .getOrElse(throw new IllegalArgumentException(
          s"no join relation declared between {${joined.mkString(",")}} " +
            s"and ${item.table}"))
      val (lk, rk) =
        if (joined.contains(jd.left)) (jd.leftKey, jd.rightKey)
        else (jd.rightKey, jd.leftKey)
      val right = db.table(item.table)
      val how = if (item.outer) "left_outer" else "inner"
      df = df.join(right, df(lk) === right(rk), how)
      joined += item.table
    }
    whereOpt.foreach(w => df = df.filter(w))
    if (selectList.nonEmpty && selectList != Seq("*"))
      df = df.selectExpr(selectList: _*)
    intoOpt.foreach { name =>
      val root = intoRoot.getOrElse(db.root)
      df.write.mode("overwrite").parquet(s"$root/$name.parquet")
    }
    df
  }

  /** Positions inside single-quoted SQL string literals ('' escapes). */
  private def quotedSpans(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var open = false
    for (i <- s.indices) {
      if (s.charAt(i) == '\'') { open = !open; in(i) = true }
      else in(i) = open
    }
    in
  }

  /** Split clauses on top-level keywords; expressions stay opaque
    * strings for Catalyst to parse. Keywords and commas inside string
    * literals (e.g. WHERE name LIKE 'from,where') are ignored. */
  private def parse(q: String)
      : (Seq[String], Seq[FromItem], Option[String], Option[String]) = {
    val text = q.trim.stripSuffix(";")
    val quoted = quotedSpans(text)
    val kw = "(?i)\\b(SELECT|FROM|WHERE|INTO)\\b".r
    val marks = kw.findAllMatchIn(text).toList.filterNot(m => quoted(m.start))
    require(marks.nonEmpty && marks.head.matched.equalsIgnoreCase("SELECT"),
      "query must start with SELECT")
    val sections = marks.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < marks.length) marks(i + 1).start else text.length
      m.matched.toUpperCase -> text.substring(m.end, end).trim
    }.toMap
    require(sections.contains("FROM"), "query must have a FROM clause")

    val selectList = splitTopLevel(sections("SELECT")).map(_.trim)
    val fromItems = splitTopLevel(sections("FROM")).map(_.trim).map { t =>
      val outer = "(?i)^(\\w+)\\s*\\(\\s*outer\\s*\\)$".r
      t match {
        case outer(name) => FromItem(name, outer = true)
        case name => FromItem(name, outer = false)
      }
    }
    (selectList, fromItems, sections.get("WHERE"), sections.get("INTO"))
  }

  /** Split on commas not nested inside parens or string literals. */
  private def splitTopLevel(s: String): Seq[String] = {
    val quoted = quotedSpans(s)
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    for (i <- s.indices) s.charAt(i) match {
      case _ if quoted(i) =>
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.result().filter(_.trim.nonEmpty)
  }
}

object LsdQL {
  /** Join relations for the standard test schema (the analog of the
    * `.join` files in an LSD database directory). */
  val standardJoins: Seq[JoinDef] = Seq(
    JoinDef("nation", "n_regionkey", "region", "r_regionkey"),
    JoinDef("customer", "c_nationkey", "nation", "n_nationkey"),
    JoinDef("supplier", "s_nationkey", "nation", "n_nationkey"),
    JoinDef("orders", "o_custkey", "customer", "c_custkey"),
    JoinDef("lineitem", "l_orderkey", "orders", "o_orderkey"),
    JoinDef("lineitem", "l_partkey", "part", "p_partkey"))

  def forDb(db: LsdDb): LsdQL = LsdQL(db, standardJoins)
}
