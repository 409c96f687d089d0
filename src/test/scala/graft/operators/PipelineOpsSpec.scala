package graft.operators

import graft.SpecBase
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SpecBase {
  import spark.implicits._

  private def docs = graft.LsdDb.table(spark, sfDir, "documents")

  test("decontaminate flags exactly the docs sharing a 3-gram with the eval set") {
    val out = PipelineOps.qDecontaminate.fn(spark, sfDir)
      .select("doc_id", "n_contaminated").as[(Long, Long)].collect().toMap
    // brute force: word trigram sets per doc via slide()
    val grams = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect()
      .map { case (id, text) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        id -> w.sliding(3).filter(_.length == 3)
          .map(_.mkString("\u0001")).toSet
      }
    val evalShingles = grams.filter(_._1 % 97 == 0).flatMap(_._2).toSet
    val expected = grams.filter(_._1 % 97 != 0)
      .map { case (id, g) => id -> g.count(evalShingles.contains).toLong }
      .filter(_._2 > 0).toMap
    assert(out == expected)
  }

  test("decontaminate shuffled fallback (maxBroadcastRows=0) is row-identical to broadcast") {
    val bcast = PipelineOps.decontaminate(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val shuffled = PipelineOps.decontaminate(spark, sfDir, maxBroadcastRows = 0L)
      .as[(Long, Long)].collect().toSeq
    assert(bcast.nonEmpty && bcast == shuffled)
    // the fallback plan must NOT contain a broadcast exchange on the join
    val plan = PipelineOps.decontaminate(spark, sfDir, maxBroadcastRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"fallback still broadcasts:\n${plan.take(2000)}")
  }

  /** Greedy left-to-right merge of one rule in a symbol sequence. */
  private def bpeMerge(l: String, r: String)(
      syms: Vector[String]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** From-scratch sequential BPE trainer over the sf docs: 8 rounds of
    * (count adjacent pairs, take (count DESC, pair) argmax, merge). */
  private def bruteBpeRules(): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = docs.select("text").as[String]
      .collect()
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toVector -> g.length.toLong
      }
    (1 to 8).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.groupMapReduce { case (sy, _) =>
        bpeMerge(l, rr)(sy) }(_._2)(_ + _)
      (r, l, rr, c)
    }
  }

  test("bpe_train matches a from-scratch sequential BPE trainer") {
    val out = PipelineOps.qBpeTrain.fn(spark, sfDir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(out == bruteBpeRules())
  }

  test("bpe_encode token counts equal applying the brute rules per document") {
    val rules = bruteBpeRules()
    val expected = docs.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, text) =>
        val tokens = text.split("\\s+").filter(_.nonEmpty).map { w =>
          rules.foldLeft(w.map(_.toString).toVector) {
            case (syms, (_, l, r, _)) => bpeMerge(l, r)(syms)
          }.length.toLong
        }
        id -> ((tokens.length.toLong, tokens.sum))
      }.toMap
    val got = PipelineOps.qBpeEncode.fn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, nWords, nTokens, fert) =>
      assert((nWords, nTokens) == expected(id), s"doc $id")
      // merges only ever shrink a word's token count into [1, |word|]
      assert(nTokens >= nWords && math.abs(
        fert - nTokens.toDouble / nWords) < 2e-6)
    }
  }

  test("bpe_vocab frequencies conserve the corpus symbol mass") {
    val rows = PipelineOps.qBpeVocab.fn(spark, sfDir)
      .as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // sorted by freq desc, sym asc; merged symbols are present
    assert(rows.sortBy { case (s, f) => (-f, s) }.toSeq == rows.toSeq)
    assert(rows.exists(_._1.length > 1),
      "top-50 must contain at least one merged multi-char symbol")
  }

  test("quality gate signals are in range and the verdict is threshold-consistent") {
    val rows = PipelineOps.qQualityGopher.fn(spark, sfDir)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, dup, alpha, mean, keep) =>
      assert(n > 0 && dup >= 0 && dup <= 1 && alpha >= 0 && alpha <= 1)
      // recompute the verdict from the (d6-snapped) outputs; skip rows
      // whose signal sits within snap distance of a threshold
      val clear = math.abs(dup - 0.3) > 1e-5 &&
        math.abs(alpha - 0.8) > 1e-5 &&
        math.abs(mean - 2) > 1e-5 && math.abs(mean - 12) > 1e-5
      if (clear)
        assert(keep == (n >= 5 && dup <= 0.3 && alpha >= 0.8 &&
          mean >= 2 && mean <= 12))
    }
  }

  test("stratified sample takes ceil(10%) of every stratum, a subset of it") {
    val sample = PipelineOps.qStratifiedSample.fn(spark, sfDir)
    val perSource = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val got = sample.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(got.keySet == perSource.keySet)
    got.foreach { case (src, n) =>
      assert(n == math.ceil(0.10 * perSource(src)).toLong,
        s"stratum $src: got $n of ${perSource(src)}")
    }
    // subset: every sampled (doc_id, source) exists in the table
    assert(sample.join(docs, Seq("doc_id", "source"), "left_anti")
      .isEmpty)
  }

  test("inverted index postings match brute force for every term") {
    val out = PipelineOps.qInvertedIndex.fn(spark, sfDir)
      .as[(String, Long, String)].collect()
    assert(out.nonEmpty)
    val byDoc = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect()
    val postings = byDoc
      .flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2).sorted }
    out.foreach { case (term, df, p) =>
      val exp = postings(term)
      assert(df >= 2 && df == exp.length)
      assert(p == exp.mkString(","))
    }
    // completeness: every df>=2 term is present
    assert(out.length == postings.count(_._2.length >= 2))
  }

  test("tfidf emits <= 3 terms per doc, ranked by (tf desc, df asc, term)") {
    val out = PipelineOps.qTfidf.fn(spark, sfDir)
      .as[(Long, String, Long, Long, Double)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 3))
    // independent recompute for one doc
    val someDoc = byDoc.keys.min
    val toks = docs.filter(col("doc_id") === someDoc).as[(Long, String, String, String, Long)]
      .collect().head._2.split("\\s+").filter(_.nonEmpty)
    val tf = toks.groupBy(identity).map { case (w, a) => w -> a.length }
    val dfMap = byDoc(someDoc).map(r => r._2 -> r._4).toMap
    val expTop = byDoc(someDoc)
      .sortBy(r => (-r._3, r._4, r._2)).map(_._2)
    expTop.foreach(t => assert(tf(t.toString) == byDoc(someDoc)
      .find(_._2 == t).get._3))
    assert(dfMap.values.forall(_ >= 1))
  }

  test("lightcurve stats are internally consistent") {
    val out = PipelineOps.qLightcurve.fn(spark, sfDir)
      .selectExpr("object_id", "n_obs", "span_s", "mean_flux",
        "min_flux", "max_flux", "amplitude")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, n, span, mean, mn, mx, amp) =>
      assert(n >= 3 && span >= 0)
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9)
      assert(math.abs(amp - (mx - mn)) < 1e-12)
    }
  }
}
