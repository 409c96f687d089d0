package graft.operators

import graft.SpecBase
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SpecBase {
  import spark.implicits._

  private def docs = graft.LsdDb.table(spark, sfDir, "documents")

  private def tokenized: Array[(Long, Array[String])] =
    docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty) }

  test("substring-dup profile matches brute force 5-gram df counting") {
    val tok = tokenized
    val spans = tok.map { case (id, w) =>
      id -> w.sliding(5).filter(_.length == 5)
        .map(_.mkString("\u0001")).toArray
    }
    val df = spans.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.length }
    val dup = df.filter(_._2 >= 3).keySet
    val expected = spans.map { case (id, ss) =>
      id -> ((ss.length.toLong, ss.count(dup.contains).toLong))
    }.toMap
    val out = CurationOps.qDedupSubstring.fn(spark, sfDir)
      .select("doc_id", "n_spans", "n_dup_spans", "dup_span_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == tok.length)
    out.foreach { case (id, n, nd, frac) =>
      val (en, end) = expected(id)
      assert((n, nd) == ((en, end)), s"doc $id")
      val want = if (n > 0) end.toDouble / n else 0.0
      assert(math.abs(frac - want) < 1e-5, s"doc $id frac")
    }
  }

  test("boilerplate top-k spans all have brute-force df >= 3, ranked correctly") {
    val tok = tokenized
    val df = tok.flatMap { case (id, w) =>
      w.sliding(5).filter(_.length == 5).map(_.mkString(" ")).distinct
        .map(_ -> id)
    }.groupBy(_._1).map { case (s, xs) => s -> xs.length }
    val out = CurationOps.qBoilerplateTopk.fn(spark, sfDir)
      .as[(String, Long, Long)].collect()
    out.foreach { case (span, d, _) =>
      assert(df(span) == d && d >= 3, s"span '$span'")
    }
    // ranking: df non-increasing
    assert(out.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("dsir weight matches brute-force two-LM log-ratio within snap tolerance") {
    val tok = tokenized
    val langs = docs.select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect().toMap
    val all = tok.flatMap(_._2)
    val cr = all.groupBy(identity).map { case (w, xs) => w -> xs.length }
    val ct = tok.filter(t => langs(t._1) == "en").flatMap(_._2)
      .groupBy(identity).map { case (w, xs) => w -> xs.length }
    val nr = all.length.toDouble
    val nt = tok.filter(t => langs(t._1) == "en").map(_._2.length).sum.toDouble
    val v = cr.size.toDouble
    val out = CurationOps.qDsirWeight.fn(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(out.length == tok.count(_._2.nonEmpty))
    val byId = tok.toMap
    out.foreach { case (id, n, wgt) =>
      val w = byId(id)
      assert(n == w.length.toLong)
      val want = w.map { x =>
        math.log(((ct.getOrElse(x, 0) + 1.0) / (nt + v)) *
          ((nr + v) / (cr(x) + 1.0)))
      }.sum / w.length
      assert(math.abs(wgt - want) < 1e-4, s"doc $id: $wgt vs $want")
    }
  }

  test("chunks tile every token with the declared size/stride and honest sigs") {
    val out = CurationOps.qChunkOverlap.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    tokenized.filter(_._2.nonEmpty).foreach { case (id, w) =>
      val chunks = out(id).sortBy(_._2)
      // starts are 1, 1+stride, ... and cover the last token
      chunks.zipWithIndex.foreach { case ((_, idx, st, n, sig), i) =>
        assert(idx == i.toLong && st == 1L + 24L * i)
        val expectTokens = math.min(32, w.length - (st.toInt - 1))
        assert(n == expectTokens.toLong, s"doc $id chunk $i")
        val text = w.slice(st.toInt - 1, st.toInt - 1 + 32).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(sig == md, s"doc $id chunk $i sig")
      }
      val lastStart = chunks.last._3.toInt
      assert(lastStart <= w.length && lastStart + 24 > w.length)
    }
  }

  test("kanon suppresses exactly the under-k groups") {
    val counts = docs.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    val byId = docs.select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val out = CurationOps.qKanon.fn(spark, sfDir)
      .as[(Long, String, String, Boolean, Long)].collect()
    assert(out.length == byId.size)
    out.foreach { case (id, lp, sp, suppressed, n) =>
      val (l, s) = byId(id)
      assert(n == counts((l, s)))
      assert(suppressed == (n < 5))
      if (suppressed) assert(lp == "*" && sp == "*")
      else assert(lp == l && sp == s)
    }
    // every published (lang_pub, source_pub) != ('*','*') group has >= 5 members
    out.filter(!_._4).groupBy(r => (r._2, r._3)).foreach { case (_, rs) =>
      assert(rs.length >= 5)
    }
  }
}
