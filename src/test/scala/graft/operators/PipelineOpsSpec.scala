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

  test("bpe_fertility per-lang totals equal the per-doc encode sums") {
    val perDoc = PipelineOps.qBpeEncode.fn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val langOf = docs.select("doc_id", "lang").as[(Long, String)]
      .collect().toMap
    val expected = perDoc.toSeq.groupBy { case (id, _) => langOf(id) }
      .map { case (lang, rs) =>
        lang -> ((rs.map(_._2._1).sum, rs.map(_._2._2).sum)) }
    val got = PipelineOps.qBpeFertility.fn(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    // langs with zero words are absent from both sides by contract
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (lang, nw, nt, fert) =>
      assert((nw, nt) == expected(lang), s"lang $lang")
      assert(nt >= nw, "merges never split a word")
      assert(math.abs(fert - nt.toDouble / nw) < 2e-6)
    }
  }

  test("dup_split_leakage matches brute-force text-group accounting") {
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    def split(id: Long): String = {
      val b = ((id % 2147483647L) * 1103515245L + 12345L) % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val groups = rows.groupBy(_._2).values.map { g =>
      (g.length.toLong, g.map(r => split(r._1)).distinct.length)
    }.toSeq
    val got = PipelineOps.qDupSplitLeakage.fn(spark, sfDir)
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 == groups.length.toLong)
    assert(got._2 == groups.count(_._1 > 1).toLong)
    assert(got._3 == groups.count(_._2 > 1).toLong)
    assert(got._4 == groups.filter(_._2 > 1).map(_._1).sum)
    // structural sanity: leaking groups are a subset of dup groups
    assert(got._3 <= got._2 && got._4 >= 2 * got._3)
  }

  test("pareto_front equals the brute-force skyline") {
    // quality is the f6 FLOOR-snapped composite (a grouping key)
    val snap = graft.functions.SnapDecimal6.snapFloor _
    val pts = docs.select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          Some((id, w.length.toLong,
            snap((0.4 * math.min(nw / 50.0, 1.0)) +
              (0.3 * (w.distinct.length.toDouble / nw)) +
              (0.3 * (stop / nw)))))
        }
      }
    // skyline: no other point with (tokens <=, quality >=) and one strict
    val front = pts.filter { case (_, t, q) =>
      !pts.exists { case (_, t2, q2) =>
        (t2 <= t && q2 >= q) && (t2 < t || q2 > q) }
    }
    val expected = front.groupBy(p => (p._2, p._3))
      .map { case ((t, q), g) => (g.map(_._1).min, t, q) }
      .toSeq.sortBy(_._2)
    val got = PipelineOps.qParetoFront.fn(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected, s"skyline mismatch:\n got $got\n exp $expected")
    // frontier quality strictly increases with token count
    assert(got.map(_._3).sliding(2).forall(s =>
      s.length < 2 || s(1) > s(0)))
  }

  test("quality_norm percentiles match brute-force midranks per language") {
    val rows = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          val raw = (0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw))
          Some((lang, math.floor(raw * 1000000.0).toLong / 1000000.0))
        }
      }
    val got = PipelineOps.qQualityNorm.fn(spark, sfDir)
      .as[(String, Double, Long, Long, Double)].collect()
    // sorted, and percentiles strictly increase within a language
    got.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).toSeq == g.map(_._2).toSeq.sorted)
      assert(g.map(_._5).toSeq == g.map(_._5).toSeq.sorted)
    }
    got.foreach { case (lang, score, cnt, pctMicro, pct) =>
      val inLang = rows.filter(_._1 == lang).map(_._2)
      val below = inLang.count(_ < score).toLong
      val at = inLang.count(_ == score).toLong
      assert(cnt == at, s"$lang/$score cell count")
      val expMicro = (2 * below + at) * 1000000L / (2 * inLang.length)
      assert(pctMicro == expMicro, s"$lang/$score pct_micro")
      assert(pct == pctMicro.toDouble / 1000000.0)
    }
    // every language's cells sum back to its doc count
    val perLang = rows.groupBy(_._1).map { case (l, g) => l -> g.length }
    got.groupBy(_._1).foreach { case (l, g) =>
      assert(g.map(_._3).sum == perLang(l).toLong) }
  }

  test("contrastive triplets: positives = minhash pairs, negatives clean") {
    val triplets = TextOps.qContrastivePairs.fn(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val pairs = TextOps.qDedupMinhash.fn(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val n = docs.count()
    assert(triplets.map(t => (t._1, t._2)).toSet == pairs,
      "positive side must be exactly the capped MinHash candidates")
    triplets.foreach { case (a, p, neg) =>
      assert(neg >= 0 && neg < n, s"negative $neg outside the id domain")
      assert(neg != a && neg != p, s"negative $neg collides for ($a,$p)")
    }
    // the sampler must actually spread (not a constant negative)
    assert(triplets.map(_._3).distinct.length > triplets.length / 10)
  }

  test("q_iv: WoE/IV match brute force with half-smoothing") {
    val snap = graft.functions.SnapDecimal6.snap _
    // features are FLOOR-snapped (bin keys); woe/iv stay d6
    val fsnap = graft.functions.SnapDecimal6.snapFloor _
    val feats = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          Some((Map(
            "f1" -> fsnap(math.min(nw / 50.0, 1.0)),
            "f2" -> fsnap(w.distinct.length.toDouble / nw),
            "f3" -> fsnap(
              w.count(Set("the", "a", "of", "and", "in")).toDouble / nw),
            "f4" -> fsnap(text.length.toDouble / nw / 10.0)),
            lang == "en"))
        }
      }
    val got = PipelineOps.qIv.fn(spark, sfDir)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    got.groupBy(_._1).foreach { case (f, rows) =>
      val binned = feats.map { case (m, y) =>
        (math.min(math.max(math.floor(m(f) * 10).toLong, 0L), 9L), y) }
      val tp = binned.count(_._2).toDouble
      val tn = binned.length - tp
      val nb = rows.length.toDouble
      var ivSum = BigDecimal(0)
      rows.sortBy(_._2).foreach { case (_, bin, pos, neg, woe, ivT, _) =>
        val bp = binned.count(r => r._1 == bin && r._2).toLong
        val bn = binned.count(r => r._1 == bin && !r._2).toLong
        assert(pos == bp && neg == bn, s"$f/$bin cells")
        val ps = (bp + 0.5) / (tp + 0.5 * nb)
        val ns = (bn + 0.5) / (tn + 0.5 * nb)
        val expWoe = snap(math.log(ps / ns))
        assert(math.abs(woe - expWoe) < 1e-6, s"$f/$bin woe $woe != $expWoe")
        assert(math.abs(ivT - snap((ps - ns) * expWoe)) < 1e-6)
        ivSum += BigDecimal(snap((ps - ns) * expWoe))
      }
      val iv = rows.head._7
      assert(rows.forall(r => math.abs(r._7 - iv) < 1e-9),
        "per-feat IV must repeat identically on every bin row")
      assert(math.abs(iv - snap(ivSum.toDouble)) < 1e-5, s"$f iv")
      assert(iv >= -1e-6, "IV is nonnegative up to snap error")
    }
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

  test("logreg training beats the p=0.5 baseline and scores are sane") {
    val out = PipelineOps.qLogreg.fn(spark, sfDir)
      .as[(Long, Double, Int, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, score, pred, label) =>
      assert(score > 0.0 && score < 1.0, s"score $score out of (0,1)")
      assert(pred == (if (score >= 0.5) 1 else 0))
      assert(label == 0.0 || label == 1.0)
    }
    // 8 GD rounds must reduce mean log-loss below the untrained
    // w=0 model (p=0.5 for every doc → loss = ln 2)
    val logloss = out.map { case (_, p, _, y) =>
      -(y * math.log(p) + (1 - y) * math.log(1 - p)) }.sum / out.length
    assert(logloss < math.log(2.0) - 0.01,
      s"training did not beat the 0.5 baseline: logloss $logloss")
    // and the model genuinely separates: score spread is real
    val scores = out.map(_._2)
    assert(scores.max - scores.min > 0.05, "degenerate score range")
  }

  test("q_auc matches the brute-force pairwise AUC") {
    // independent twin: recompute doc-level (score, y) in plain Scala
    // (same formula, same left-assoc double chain, same d6 snap) and
    // evaluate the Mann-Whitney definition over ALL pos×neg pairs
    val rows = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          val raw = (0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw))
          Some((graft.functions.SnapDecimal6.snapFloor(raw), lang == "en"))
        }
      }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.length.toDouble * neg.length)
    val got = PipelineOps.qAuc.fn(spark, sfDir)
      .as[(Double, Double, Long, Long, Long)].head()
    assert(got._3 == pos.length && got._4 == neg.length)
    assert(math.abs(got._1 - expected) < 1e-6,
      s"auc ${got._1} != brute $expected")
    assert(math.abs(got._2 - (2.0 * got._1 - 1.0)) < 1e-6)
    assert(got._5 > 1, "degenerate score domain")
  }

  test("q_confusion matches brute-force cells and derived scores") {
    val rows = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          val raw = (0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw))
          Some((graft.functions.SnapDecimal6.snapFloor(raw) >= 0.5,
            lang == "en"))
        }
      }
    val tp = rows.count(r => r._1 && r._2).toLong
    val fp = rows.count(r => r._1 && !r._2).toLong
    val tn = rows.count(r => !r._1 && !r._2).toLong
    val fn = rows.count(r => !r._1 && r._2).toLong
    val got = PipelineOps.qConfusion.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Double)]
      .head()
    assert((got._1, got._2, got._3, got._4) == ((tp, fp, tn, fn)))
    val n = (tp + fp + tn + fn).toDouble
    assert(math.abs(got._5 - (tp + tn) / n) < 1e-6)
    if (tp + fp > 0) assert(math.abs(got._6 - tp.toDouble / (tp + fp)) < 1e-6)
    if (tp + fn > 0) assert(math.abs(got._7 - tp.toDouble / (tp + fn)) < 1e-6)
    if (got._6 + got._7 > 0)
      assert(math.abs(got._8 -
        2.0 * got._6 * got._7 / (got._6 + got._7)) < 1e-6)
    assert(got._9 >= -1.0 - 1e-9 && got._9 <= 1.0 + 1e-9)
  }

  test("q_feature_auc: per-feature AUCs match brute force; f3 carries signal") {
    val feats = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val snap = graft.functions.SnapDecimal6.snapFloor _
          Some((Map(
            "f1" -> snap(math.min(nw / 50.0, 1.0)),
            "f2" -> snap(w.distinct.length.toDouble / nw),
            "f3" -> snap(
              w.count(Set("the", "a", "of", "and", "in")).toDouble / nw),
            "f4" -> snap(text.length.toDouble / nw / 10.0)),
            lang == "en"))
        }
      }
    val got = PipelineOps.qFeatureAuc.fn(spark, sfDir)
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got.keySet == Set("f1", "f2", "f3", "f4"))
    for (f <- got.keySet) {
      val pos = feats.filter(_._2).map(_._1(f))
      val neg = feats.filterNot(_._2).map(_._1(f))
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val expected = wins / (pos.length.toDouble * neg.length)
      assert(math.abs(got(f) - expected) < 1e-6,
        s"$f: auc ${got(f)} != brute $expected")
    }
    // at least one feature must carry real ranking signal — in
    // EITHER direction (honest finding: on the synthetic corpus the
    // stopword ratio ranks en BELOW non-en, AUC ~0.44 at sf0.001 —
    // an inverted but real signal, which is exactly what this audit
    // exists to reveal)
    assert(got.values.exists(v => math.abs(v - 0.5) > 0.01),
      s"all features rank at chance: $got")
  }

  test("q_ndcg matches a brute-force BM25 + NDCG@10 computation") {
    val snap = graft.functions.SnapDecimal6.snap _
    val terms = Seq("data", "model", "the")
    val k1 = 1.2; val b = 0.75
    val corpus = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").filter(_.nonEmpty)) }
    val n = corpus.length
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / n
    val disc = (1 to 10).map(i =>
      snap(1.0 / (math.log(i + 1.0) / math.log(2.0))))
    val expected = terms.flatMap { term =>
      val cand = corpus.flatMap { case (id, w) =>
        val tf = w.count(_ == term)
        if (tf > 0) Some((id, tf.toDouble, w.length.toLong)) else None
      }
      if (cand.isEmpty) None
      else {
        val df = cand.length.toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val scored = cand.map { case (id, tf, dl) =>
          (id, tf, snap(idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * dl / avgdl))))
        }
        def gains(sorted: Seq[(Long, Double)]): Double =
          sorted.take(10).zipWithIndex.map { case ((_, tf), i) =>
            BigDecimal(snap(tf * disc(i)))
          }.sum.toDouble
        val dcg = gains(scored.sortBy(r => (-r._3, r._1)).map(r => (r._1, r._2)))
        val idcg = gains(scored.sortBy(r => (-r._2, r._1)).map(r => (r._1, r._2)))
        Some((term, cand.length.toLong, dcg, idcg, snap(dcg / idcg)))
      }
    }
    val got = PipelineOps.qNdcg.fn(spark, sfDir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == expected.map(_._1))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._2 == e._2, s"${g._1} n_candidates ${g._2} != ${e._2}")
      assert(math.abs(g._3 - e._3) < 1e-6, s"${g._1} dcg ${g._3} != ${e._3}")
      assert(math.abs(g._4 - e._4) < 1e-6, s"${g._1} idcg ${g._4} != ${e._4}")
      assert(math.abs(g._5 - e._5) < 1e-6, s"${g._1} ndcg ${g._5} != ${e._5}")
      assert(g._5 <= 1.0 + 1e-9 && g._5 > 0.0)
    }
  }

  test("q_pr_curve matches brute force and recall is monotone") {
    val snap = graft.functions.SnapDecimal6.snap _
    val fsnap = graft.functions.SnapDecimal6.snapFloor _
    val rows = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          val raw = (0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw))
          val bin = math.min(math.max(
            math.floor(fsnap(raw) * 100).toLong, 0L), 99L)
          Some((bin, lang == "en"))
        }
      }
    val nPos = rows.count(_._2).toLong
    val byBin = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var cp = 0L; var cn = 0L
    val expected = byBin.map { case (bin, rs) =>
      cp += rs.count(_._2); cn += rs.count(!_._2)
      (snap(bin.toDouble / 100.0), cp, cn,
        snap(cp.toDouble / (cp + cn)), snap(cp.toDouble / nPos))
    }.sortBy(_._1)
    val got = PipelineOps.qPrCurve.fn(spark, sfDir)
      .as[(Double, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      expected.map(r => (r._1, r._2, r._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-6 && math.abs(g._5 - e._5) < 1e-6)
      if (g._4 + g._5 > 0)
        assert(math.abs(g._6 -
          snap(2.0 * g._4 * g._5 / (g._4 + g._5))) < 1e-6)
    }
    // recall from the best threshold down accumulates monotonically
    assert(got.map(_._5).toSeq == got.map(_._5).toSeq.sorted.reverse)
    // the lowest threshold accepts everything: recall exactly 1
    assert(got.head._5 == 1.0)
  }

  test("q_mutual_info matches brute force; MI bounded by entropies") {
    val snap = graft.functions.SnapDecimal6.snap _
    // features FLOOR-snapped (bin keys); MI/entropy terms stay d6
    val fsnap = graft.functions.SnapDecimal6.snapFloor _
    val feats = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          Some((Map(
            "f1" -> fsnap(math.min(nw / 50.0, 1.0)),
            "f2" -> fsnap(w.distinct.length.toDouble / nw),
            "f3" -> fsnap(
              w.count(Set("the", "a", "of", "and", "in")).toDouble / nw),
            "f4" -> fsnap(text.length.toDouble / nw / 10.0)),
            if (lang == "en") 1L else 0L))
        }
      }
    val got = PipelineOps.qMutualInfo.fn(spark, sfDir)
      .as[(String, Double, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("f1", "f2", "f3", "f4"))
    def log2(x: Double) = math.log(x) / math.log(2.0)
    got.foreach { case (f, mi, hx, hy, nmi) =>
      val cells = feats.groupBy { case (m, y) =>
        (math.min(math.max(math.floor(m(f) * 10).toLong, 0L), 9L), y)
      }.map { case (k, v) => (k, v.length.toLong) }
      val n = cells.values.sum.toDouble
      val nxm = cells.groupBy(_._1._1).map { case (k, v) =>
        (k, v.values.sum) }
      val nym = cells.groupBy(_._1._2).map { case (k, v) =>
        (k, v.values.sum) }
      def dsum(ts: Iterable[Double]): Double =
        ts.map(BigDecimal(_)).sum.toDouble
      val miB = dsum(cells.map { case ((x, y), c) =>
        snap((c / n) * log2((c * n) / (nxm(x).toDouble * nym(y)))) })
      val hxB = -dsum(cells.map { case ((x, _), c) =>
        snap((c / n) * log2(nxm(x) / n)) })
      val hyB = -dsum(cells.map { case ((_, y), c) =>
        snap((c / n) * log2(nym(y) / n)) })
      assert(math.abs(mi - miB) < 1e-5, s"$f mi $mi != $miB")
      assert(math.abs(hx - hxB) < 1e-5 && math.abs(hy - hyB) < 1e-5)
      assert(mi >= -1e-6 && mi <= math.min(hx, hy) + 1e-6)
      if (math.min(hx, hy) > 0)
        assert(math.abs(nmi - snap(mi / math.min(hx, hy))) < 1e-6)
    }
    // at least one feature shares real information with the label
    assert(got.map(_._2).max > 1e-3)
  }

  test("q_cv_auc: per-fold AUCs match brute force over balanced folds") {
    // score is the f6 FLOOR-snapped composite (a grouping key)
    val snap = graft.functions.SnapDecimal6.snapFloor _
    val rows = docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
      .flatMap { case (id, text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          val raw = (0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw))
          val fold = ((id % 2147483647L) * 16807L + 12345L) % 5
          Some((fold, snap(raw), lang == "en"))
        }
      }
    val got = PipelineOps.qCvAuc.fn(spark, sfDir)
      .as[(Long, Double, Double, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L),
      "all five folds must be populated")
    got.foreach { case (fold, auc, gini, np, nn, _) =>
      val inFold = rows.filter(_._1 == fold)
      val pos = inFold.filter(_._3).map(_._2)
      val neg = inFold.filterNot(_._3).map(_._2)
      assert(np == pos.length && nn == neg.length)
      val wins = (for (p <- pos; n <- neg) yield
        if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val expected = wins / (pos.length.toDouble * neg.length)
      assert(math.abs(auc - expected) < 1e-6,
        s"fold $fold: auc $auc != brute $expected")
      assert(math.abs(gini - (2.0 * auc - 1.0)) < 1e-6)
    }
    // folds are roughly balanced (LCG with a multiplier coprime to 5)
    val sizes = got.map(r => r._4 + r._5)
    assert(sizes.max <= 2L * sizes.min,
      s"fold sizes badly skewed: ${sizes.toSeq}")
  }

  test("q_stump_split finds the brute-force Gini-optimal cut per feature") {
    val snap = graft.functions.SnapDecimal6.snap _
    // features FLOOR-snapped (bin keys); gini/gain stay d6
    val fsnap = graft.functions.SnapDecimal6.snapFloor _
    val feats = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          Some((Map(
            "f1" -> fsnap(math.min(nw / 50.0, 1.0)),
            "f2" -> fsnap(w.distinct.length.toDouble / nw),
            "f3" -> fsnap(
              w.count(Set("the", "a", "of", "and", "in")).toDouble / nw),
            "f4" -> fsnap(text.length.toDouble / nw / 10.0)),
            lang == "en"))
        }
      }
    val got = PipelineOps.qStumpSplit.fn(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq("f1", "f2", "f3", "f4"))
    def gini(p: Long, n: Long): Double = {
      val t = (p + n).toDouble
      1.0 - ((p / t) * (p / t) + (n / t) * (n / t))
    }
    got.foreach { case (f, bestBin, thr, gain, giniRoot, nl, nr) =>
      val binned = feats.map { case (m, y) =>
        (math.min(math.max(math.floor(m(f) * 10).toLong, 0L), 9L), y) }
      val tp = binned.count(_._2).toLong
      val tn = binned.length - tp
      val n = binned.length.toDouble
      assert(math.abs(giniRoot - snap(gini(tp, tn))) < 1e-6)
      val cand = (0L to 8L).flatMap { b =>
        val lposc = binned.count(r => r._1 <= b && r._2).toLong
        val lnegc = binned.count(r => r._1 <= b && !r._2).toLong
        val (rposc, rnegc) = (tp - lposc, tn - lnegc)
        if (lposc + lnegc == 0 || rposc + rnegc == 0) None
        else Some((b, snap(gini(tp, tn) -
          (((lposc + lnegc) / n) * gini(lposc, lnegc) +
            ((rposc + rnegc) / n) * gini(rposc, rnegc))),
          lposc + lnegc, rposc + rnegc))
      }
      val best = cand.minBy(c => (-c._2, c._1))
      assert(bestBin == best._1, s"$f best bin $bestBin != ${best._1}")
      assert(math.abs(gain - best._2) < 1e-6)
      assert(nl == best._3 && nr == best._4)
      assert(math.abs(thr - (bestBin + 1) / 10.0) < 1e-9)
      assert(gain >= -1e-9 && gain <= giniRoot + 1e-9)
    }
  }

  test("q_bootstrap_mean matches the brute-force Poisson bootstrap") {
    val snap = graft.functions.SnapDecimal6.snap _
    // score FLOOR-snapped (shared f6 composite); wmean stays d6
    val fsnap = graft.functions.SnapDecimal6.snapFloor _
    val cdf = Seq(0.367879, 0.735759, 0.919699, 0.981012,
      0.996340, 0.999406, 0.999917, 0.999990)
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          Some((id, fsnap((0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw)))))
        }
      }
    def weight(id: Long, b: Long): Long = {
      val h2 = (((((id % 2147483647L) * 16807L) % 2147483647L + b)
        * 16807L) % 2147483647L) * 16807L % 2147483647L
      val u = h2.toDouble / 2147483647.0
      val k = cdf.indexWhere(u < _)
      if (k < 0) 8L else k.toLong
    }
    def wmean(b: Long): Double = {
      val ws = rows.map { case (id, s) =>
        (if (b == 0) 1L else weight(id, b), s) }
      val tot = ws.map(_._1).sum
      snap(ws.map { case (w, s) => BigDecimal(w * s) }.sum.toDouble / tot)
    }
    val reps = (1L to 20L).map(b => (b, wmean(b)))
    val sorted = reps.sortBy(r => (r._2, r._1)).map(_._2)
    val got = PipelineOps.qBootstrapMean.fn(spark, sfDir)
      .as[(Double, Double, Double, Double, Long)].head()
    assert(math.abs(got._1 - wmean(0L)) < 1e-6)
    assert(math.abs(got._2 - sorted(1)) < 1e-6, "boot_lo is the 2nd order stat")
    assert(math.abs(got._3 - sorted(18)) < 1e-6, "boot_hi is the 19th")
    assert(got._5 == 20L)
    assert(got._2 <= got._3 && got._4 >= 0.0)
    // the interval should bracket the point estimate (Poisson(1)
    // weights are mean-1, so replicate means scatter around it)
    assert(got._2 <= got._1 + 5 * math.max(got._4, 1e-6) &&
      got._3 >= got._1 - 5 * math.max(got._4, 1e-6))
  }

  test("q_calibration bins partition the corpus and ratios are exact") {
    val out = PipelineOps.qCalibration.fn(spark, sfDir)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
    assert(out.forall { case (bin, n, np, ms, fp, gap) =>
      bin >= 0 && bin <= 9 && np <= n &&
        ms >= 0.0 && ms <= 1.0 && fp >= 0.0 && fp <= 1.0 &&
        math.abs(gap - math.abs(ms - fp)) < 1e-6
    })
    // bin populations sum to the docs-with-words count
    val nDocs = docs.filter(size(split(trim(col("text")), "\\s+")) > 0)
      .filter(length(trim(col("text"))) > 0).count()
    assert(out.map(_._2).sum == nDocs)
    // mean score must actually lie inside its bin (width-0.1 bins,
    // except clamping at the edges)
    out.foreach { case (bin, _, _, ms, _, _) =>
      assert(ms >= bin / 10.0 - 1e-6 && ms <= (bin + 1) / 10.0 + 1e-6) }
  }

  test("q_isotonic equals a brute-force PAV loop and is monotone") {
    val fsnap = graft.functions.SnapDecimal6.snapFloor _
    // brute-force cells: (bin, n, pos) from the raw corpus
    val cells = docs.select("text", "lang").as[(String, String)].collect()
      .flatMap { case (text, lang) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        if (w.isEmpty) None
        else {
          val nw = w.length.toDouble
          val stop = w.count(Set("the", "a", "of", "and", "in")).toDouble
          val raw = (0.4 * math.min(nw / 50.0, 1.0)) +
            (0.3 * (w.distinct.length.toDouble / nw)) +
            (0.3 * (stop / nw))
          val bin = math.min(math.max(
            math.floor(fsnap(raw) * 10).toLong, 0L), 9L)
          Some((bin, if (lang == "en") 1L else 0L))
        }
      }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, g) => (b, g.length.toLong, g.map(_._2).sum) }
    // classic pool-adjacent-violators: merge while a pool's rate
    // drops below its predecessor's
    case class Pool(n: Long, pos: Long)
    // exact rational comparison (cross-multiplied): a tie-or-violation
    // merges; double rates could misorder ties
    def geq(a: Pool, b: Pool): Boolean = a.pos * b.n >= b.pos * a.n
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Pool, Int)]
    cells.foreach { case (_, n, pos) =>
      pools += ((Pool(n, pos), 1))
      while (pools.length >= 2 &&
        geq(pools(pools.length - 2)._1, pools.last._1)) {
        val (a, ca) = pools.remove(pools.length - 1)
        val (b, cb) = pools.remove(pools.length - 1)
        pools += ((Pool(a.n + b.n, a.pos + b.pos), ca + cb))
      }
    }
    val pav: Seq[(Long, Long)] = pools.toSeq.flatMap { case (p, c) =>
      Seq.fill(c)((p.pos, p.n)) } // exact rational per bin
    val got = PipelineOps.qIsotonic.fn(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == cells.map(_._1))
    got.zip(cells).zip(pav).foreach {
      case (((bin, n, pos, rateM, isoM, isoR), (_, en, epos)), (pp, pn)) =>
        assert(n == en && pos == epos, s"bin $bin cells")
        assert(rateM == pos * 1000000L / n)
        // minimax micro == floor(1e6 * exact PAV rational)
        assert(isoM == pp * 1000000L / pn,
          s"bin $bin iso $isoM != PAV ${pp * 1000000L / pn}")
        assert(isoR == isoM.toDouble / 1000000.0)
    }
    // the defining property: monotone non-decreasing
    assert(got.map(_._5).toSeq == got.map(_._5).toSeq.sorted)
  }

  test("linreg training reduces variance vs the mean-only baseline") {
    val out = PipelineOps.qLinreg.fn(spark, sfDir)
      .as[(Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, pred, label, resid) =>
      assert(label > 0.0, "log1p of a positive count")
      assert(math.abs(resid - (label - pred)) < 2e-6)
    }
    val labels = out.map(_._3)
    val mean = labels.sum / labels.length
    val ssTot = labels.map(y => (y - mean) * (y - mean)).sum
    val ssRes = out.map(_._4).map(r => r * r).sum
    // 24 GD rounds must explain a real share of the variance
    val r2 = 1.0 - ssRes / ssTot
    assert(r2 > 0.0, s"training failed to beat the mean baseline: r2 $r2")
    // and predictions genuinely vary with the features
    assert(out.map(_._2).distinct.length > 10, "degenerate predictions")
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

  test("fused GD equals the per-round distributed loop, bit for bit") {
    // The r22 fusion claim (q_linreg/q_logreg): replaying the GD
    // rounds driver-side over the value-domain-compressed matrix
    // yields EXACTLY the weights of the per-round Spark aggregation —
    // same p/z chain, same DECIMAL(38,8) term cast, same d6 snap.
    // Checked on a synthetic feature relation whose values exercise
    // the decimal rounding (many digits after the double ops), for
    // both the logistic and the linear link.
    val snap = graft.functions.SnapDecimal6.snap _
    val feat = spark.range(0, 400).selectExpr(
      "CAST(id % 2 AS DOUBLE) AS y",
      "CAST(CAST(floor((id % 17) * 1000000.0 / 17) AS BIGINT) AS DOUBLE)" +
        " / 1000000.0 AS f1",
      "CAST(CAST(floor((id % 5) * 1000000.0 / 7) AS BIGINT) AS DOUBLE)" +
        " / 1000000.0 AS f2")
      .localCheckpoint()
    val iters = 6
    for ((eta, logistic) <- Seq((2.0, true), (1.0, false))) {
      def zCol(w: Seq[Double]) = graft.functions.Det.d6(
        lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2"))
      def pCol(w: Seq[Double]) =
        if (logistic)
          graft.functions.Det.d6(lit(1.0) / (lit(1.0) + exp(-zCol(w))))
        else zCol(w)
      // reference: the per-round distributed loop (the pre-r22 shape)
      var ref: Seq[Double] = Seq.fill(3)(0.0)
      for (_ <- 1 to iters) {
        val terms = Seq(lit(1.0), col("f1"), col("f2"))
        val g = feat.withColumn("p", pCol(ref))
          .agg(count(lit(1)).as("n"),
            terms.zipWithIndex.map { case (x, i) =>
              sum(((col("y") - col("p")) * x)
                .cast(graft.functions.Det.M38))
                .cast("double").as(s"g$i") }: _*)
          .head()
        val n = g.getLong(0)
        ref = ref.zipWithIndex.map { case (wv, i) =>
          snap(wv + eta * g.getDouble(i + 1) / n) }
      }
      val groups = feat.groupBy("y", "f1", "f2")
        .agg(count(lit(1)).as("cnt")).collect()
      val fused = PipelineOps.fusedGdWeights(groups, 2, iters, eta,
        (w, x) => {
          val z = snap(w(0) + w(1) * x(0) + w(2) * x(1))
          if (logistic) snap(1.0 / (1.0 + math.exp(-z))) else z
        })
      assert(fused.toSeq == ref,
        s"logistic=$logistic: fused=$fused ref=$ref")
    }
  }
}
