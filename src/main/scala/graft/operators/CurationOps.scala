package graft.operators

import graft.{LsdDb, QuerySpec}
import graft.functions.{Det => D}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** North-star extension, round 12 — the curation passes that sit
  * between the existing dedup/quality family and shard-writing in an
  * LLM-training-data pipeline:
  *
  *  - exact SUBSTRING-level duplication (Lee et al. 2021
  *    "Deduplicating Training Data Makes Language Models Better",
  *    arXiv:2107.06499) at word-5-gram granularity: per-doc duplicated
  *    -span fractions plus the corpus-level boilerplate span ranking;
  *  - DSIR-style importance weighting (Xie et al. 2023, arXiv:
  *    2302.03169): per-doc mean log-ratio of a target-domain unigram
  *    LM over the raw-corpus LM — the score used to importance-sample
  *    raw crawl toward a target distribution;
  *  - RAG/packing chunking: fixed-size overlapping token windows with
  *    deterministic chunk signatures;
  *  - k-anonymity metadata suppression: generalize (lang, source)
  *    combinations rarer than k before release.
  *
  * Determinism discipline as everywhere in this repo: pure Catalyst
  * expression trees (no UDFs), md5 for cross-engine signatures,
  * xxhash64 only for Spark-internal shuffle keys whose values never
  * reach the output, d6 snapping before decimal sums for
  * transcendentals. Every query is whole-stage-codegen'd and
  * DuckDB-hash-checked.
  */
object CurationOps {

  /** Whitespace tokens, empties dropped — contract shared with
    * TextOps.words / PipelineOps.words (SQL twin must stay textually
    * in sync). */
  private def words(c: Column): Column =
    filter(split(c, "\\s+"), w => w =!= "")
  private val wordsSql =
    "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"

  /** POSITIONAL word-5-gram spans (NOT distinct — multiplicity is the
    * point: a span repeated inside one doc still counts once per
    * occurrence toward that doc's duplicated-span fraction). */
  // Served by the codegen'd graft.functions.WordNgrams kernel (r21):
  // the old zip_with-over-aligned-slices ladder re-ran the regex
  // split once per slice wherever the optimizer landed it inside an
  // interpreted Generate -- see the shingles3 note in PipelineOps.
  private def spans5(c: Column): Column =
    graft.functions.WordNgrams.wordNgrams(c, 5, "\u0001",
      distinct = false)
  private val spans5Sql = {
    val w = wordsSql
    s"""list_transform(range(1, len($w) - 3),
       |    i -> concat_ws(chr(1), $w[i], $w[i+1], $w[i+2], $w[i+3], $w[i+4]))""".stripMargin
  }

  /** A span is boilerplate when it occurs in at least this many
    * DISTINCT docs. */
  private val dupDocThreshold = 3

  /** X2 ext — exact substring-duplication profile per document: how
    * much of each doc is made of word-5-gram spans that also appear
    * in ≥ [[dupDocThreshold]] distinct documents. The per-doc
    * `dup_span_frac` is the signal substring-dedup pipelines cut on
    * (a doc that is 80% cross-corpus spans is boilerplate even when
    * no single whole-doc duplicate exists).
    *
    * Scale shape, the PPJoin candidate/verify discipline
    * (PipelineOps q_dedup_prefix): the xxhash64(span) is ONLY a
    * candidate gate, never an output-visible count key. Phase 1
    * (candidates): explode → distinct(doc, span-hash) → hash df ≥
    * threshold (two shuffles on the well-distributed 64-bit hash,
    * partial aggregation absorbs the fan-out map-side; strings never
    * shuffle here). Hash-df overcounts under collision, so this set
    * is a SUPERSET of the true dups — no false negatives. Phase 2
    * (exact verify): re-explode with the span STRING, equi-join the
    * candidate hashes (only candidate occurrences survive), recount
    * df and per-doc hits on the REAL strings — a 64-bit collision,
    * expected at the ~1e10-span corpus scale, can now only cost a
    * few extra verify rows, never a wrong count. Only candidate
    * spans' strings ever shuffle (the boilerplate subset, the same
    * bytes PPJoin's verify moves). At 100 TB every stage is linear
    * in token count on a corpus-cardinality key. */
  val qDedupSubstring: QuerySpec = QuerySpec(
    "q_dedup_substring",
    s"""WITH base AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
       |    i -> concat_ws(chr(1), w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
       |    AS s FROM base),
       |df AS (SELECT s, count(DISTINCT doc_id) AS df FROM g GROUP BY s),
       |dup AS (SELECT s FROM df WHERE df >= $dupDocThreshold),
       |hits AS (SELECT g.doc_id, count(*) AS n_dup
       |  FROM g JOIN dup USING (s) GROUP BY g.doc_id)
       |SELECT b.doc_id,
       |  CAST(greatest(len(b.w) - 4, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup_spans,
       |  CASE WHEN len(b.w) > 4 THEN
       |    ${D.sql.d6("CAST(coalesce(h.n_dup, 0) AS DOUBLE) / (len(b.w) - 4)")}
       |  ELSE 0.0 END AS dup_span_frac
       |FROM base b LEFT JOIN hits h USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = LsdDb.table(s, dir, "documents")
    // ONE explode, materialized once with the span strings aboard
    // (A/B r13: re-deriving the explode for the verify phase to keep
    // the checkpoint hash-only measured 3.4 s warm vs 2.4 s for this
    // form at sf0.1 — the second tokenize pass costs more than the
    // string bytes; both are linear at 100 TB, this one trades one
    // corpus re-read for ~5× checkpoint bytes)
    // spread (r21): parallelizes the span explode + hash off the
    // one-row-group scan, and gives the checkpoint (consumed by both
    // phases below) cluster-wide partitions instead of one
    val g = LsdDb.spread(docs.select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"), explode(spans5(col("text"))).as("sp"))
      .withColumn("h", xxhash64(col("sp")))
      .localCheckpoint()
    // phase 1 — candidate gate on the 64-bit hash only (the span
    // strings do not shuffle through the df aggregate)
    val cand = g.select("doc_id", "h").distinct().groupBy("h")
      .agg(count(lit(1)).as("dfh"))
      .filter(col("dfh") >= dupDocThreshold)
      .select("h")
    // phase 2 — exact verify: candidate occurrences keep their
    // strings; df and per-doc hits recount on the real span text
    val gs = g.join(cand, "h")
      .select("doc_id", "sp")
      .localCheckpoint()
    val dup = gs.distinct().groupBy("sp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= dupDocThreshold)
      .select("sp")
    val hits = gs.join(dup, "sp")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    val nSpans = greatest(size(words(col("text"))) - 4, lit(0))
    docs.select(col("doc_id"), nSpans.as("n_spans"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_spans").cast(LongType).as("n_spans"),
        coalesce(col("n_dup"), lit(0L)).cast(LongType).as("n_dup_spans"),
        when(col("n_spans") > 0,
          D.d6(coalesce(col("n_dup"), lit(0L)).cast(DoubleType) /
            col("n_spans")))
          .otherwise(lit(0.0)).as("dup_span_frac"))
      .orderBy("doc_id")
  }

  /** X2 ext — the corpus-level view of the same signal: the most
    * widely duplicated spans themselves (the boilerplate ranking a
    * pipeline turns into a removal list). Here the span STRING is the
    * output, so the groupBy key is the string — one shuffle, partial
    * aggregation map-side, then a top-k (TakeOrderedAndProject, no
    * global sort materialization). Deterministic total order:
    * df desc, occurrences desc, span text asc. */
  val qBoilerplateTopk: QuerySpec = QuerySpec(
    "q_boilerplate_topk",
    s"""WITH base AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
       |    i -> concat_ws(chr(1), w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
       |    AS s FROM base)
       |SELECT replace(s, chr(1), ' ') AS span,
       |  count(DISTINCT doc_id) AS df, count(*) AS n_occur
       |FROM g GROUP BY s HAVING count(DISTINCT doc_id) >= $dupDocThreshold
       |ORDER BY df DESC, n_occur DESC, span LIMIT 20""".stripMargin) {
    (s, dir) =>
      LsdDb.table(s, dir, "documents")
        .select(col("doc_id"), explode(spans5(col("text"))).as("s"))
        .groupBy("s")
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("n_occur"))
        .filter(col("df") >= dupDocThreshold)
        .select(regexp_replace(col("s"), "\u0001", " ").as("span"),
          col("df"), col("n_occur"))
        .orderBy(col("df").desc, col("n_occur").desc, col("span"))
        .limit(20)
  }

  /** X2 ext — DSIR importance weight (target = English docs, raw =
    * whole corpus): per-doc mean over tokens of
    * ln(p_target(w) / p_raw(w)) with add-1 smoothing over the shared
    * corpus vocabulary. Docs that look like the target domain score
    * high; importance resampling keeps raw docs with probability ∝
    * exp(weight). Both LMs are dictionary-scale → BROADCAST; the
    * corpus-side explode never shuffles (the q_unigram_lm rule). Each
    * token's log-ratio is d6-snapped BEFORE the decimal sum so the
    * per-doc total is partition-order-free; the mean is the exact
    * decimal sum over the exact count (unsnapped — the q_stetson
    * midpoint lesson). */
  val qDsirWeight: QuerySpec = QuerySpec(
    "q_dsir_weight",
    s"""WITH toks AS (SELECT doc_id, lang, unnest($wordsSql) AS w
       |  FROM documents),
       |lmr AS (SELECT w, count(*) AS cr FROM toks GROUP BY w),
       |lmt AS (SELECT w, count(*) AS ct FROM toks WHERE lang = 'en'
       |  GROUP BY w),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nr,
       |    CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE) AS nt,
       |    CAST(count(DISTINCT w) AS DOUBLE) AS v FROM toks),
       |scored AS (SELECT t.doc_id,
       |    ${D.sql.d6("ln(((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / (nt + v)) * ((nr + v) / (CAST(cr AS DOUBLE) + 1.0)))")}
       |      AS lr
       |  FROM toks t JOIN lmr USING (w) LEFT JOIN lmt USING (w)
       |  CROSS JOIN tot)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CAST(lr AS DECIMAL(18,6))) AS DOUBLE) / count(*)
       |    AS dsir_logratio
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      val toks = LsdDb.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(words(col("text"))).as("w"))
      val lmr = toks.groupBy("w").agg(count(lit(1)).as("cr"))
      val lmt = toks.filter(col("lang") === "en")
        .groupBy("w").agg(count(lit(1)).as("ct"))
      val tot = toks.agg(
        count(lit(1)).cast(DoubleType).as("nr"),
        count(when(col("lang") === "en", 1)).cast(DoubleType).as("nt"),
        countDistinct(col("w")).cast(DoubleType).as("v"))
      val lr = log(
        ((coalesce(col("ct"), lit(0L)).cast(DoubleType) + 1.0) /
          (col("nt") + col("v"))) *
          ((col("nr") + col("v")) / (col("cr").cast(DoubleType) + 1.0)))
      toks.join(broadcast(lmr), "w")
        .join(broadcast(lmt), Seq("w"), "left")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), D.d6(lr).as("lr"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (sum(col("lr").cast(
            org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast(DoubleType) / count(lit(1))).as("dsir_logratio"))
        .orderBy("doc_id")
  }

  private val chunkSize = 32
  private val chunkStride = 24

  /** X2 ext — overlapping fixed-size token chunking (the RAG /
    * context-packing pass): windows of [[chunkSize]] tokens every
    * [[chunkStride]], last partial window kept, with a deterministic
    * md5 signature per chunk. Map-only — sequence + explode + slice;
    * zero shuffles before the presentation sort. Fan-out is
    * size/stride ≈ 1.33× the corpus, independent of corpus size. */
  val qChunkOverlap: QuerySpec = QuerySpec(
    "q_chunk_overlap",
    s"""WITH base AS (SELECT doc_id, $wordsSql AS w FROM documents
       |  WHERE len($wordsSql) >= 1),
       |ch AS (SELECT doc_id, w,
       |    unnest(range(1, len(w) + 1, $chunkStride)) AS st FROM base)
       |SELECT doc_id, CAST((st - 1) // $chunkStride AS BIGINT) AS chunk_idx,
       |  CAST(st AS BIGINT) AS start_tok,
       |  CAST(len(list_slice(w, st, least(st + ${chunkSize - 1}, len(w))))
       |    AS BIGINT) AS n_tokens,
       |  md5(array_to_string(
       |    list_slice(w, st, least(st + ${chunkSize - 1}, len(w))), ' '))
       |    AS chunk_sig
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
    val w = words(col("text"))
    val chunk = slice(col("w"), col("st"), lit(chunkSize))
    LsdDb.table(s, dir, "documents")
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")), lit(chunkStride)))
          .as("st"))
      .select(col("doc_id"),
        ((col("st") - 1) / chunkStride).cast(LongType).as("chunk_idx"),
        col("st").cast(LongType).as("start_tok"),
        size(chunk).cast(LongType).as("n_tokens"),
        md5(array_join(chunk, " ").cast("binary")).as("chunk_sig"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Minimum group size below which a (lang, source) combination is
    * generalized away. */
  private val kAnonThreshold = 5

  /** X2 ext — k-anonymity metadata suppression: any (lang, source)
    * combination carried by fewer than [[kAnonThreshold]] documents
    * is generalized to '*' before the corpus is released (the
    * quasi-identifier pass of a privacy-scrubbing pipeline; the
    * direct-identifier pass is q_redact_pii). Group census is one
    * partial-aggregating shuffle on a ~|langs|×|sources| key; the
    * census is dimension-scale → BROADCAST back onto the corpus, so
    * the documents themselves never shuffle. */
  val qKanon: QuerySpec = QuerySpec(
    "q_kanon",
    s"""WITH grp AS (SELECT lang, source, count(*) AS n FROM documents
       |  GROUP BY lang, source)
       |SELECT d.doc_id,
       |  CASE WHEN g.n >= $kAnonThreshold THEN d.lang ELSE '*' END
       |    AS lang_pub,
       |  CASE WHEN g.n >= $kAnonThreshold THEN d.source ELSE '*' END
       |    AS source_pub,
       |  g.n < $kAnonThreshold AS suppressed,
       |  CAST(g.n AS BIGINT) AS group_n
       |FROM documents d JOIN grp g USING (lang, source)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = LsdDb.table(s, dir, "documents")
    val grp = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
    docs.join(broadcast(grp), Seq("lang", "source"))
      .select(col("doc_id"),
        when(col("n") >= kAnonThreshold, col("lang")).otherwise("*")
          .as("lang_pub"),
        when(col("n") >= kAnonThreshold, col("source")).otherwise("*")
          .as("source_pub"),
        (col("n") < kAnonThreshold).as("suppressed"),
        col("n").cast(LongType).as("group_n"))
      .orderBy("doc_id")
  }

  /** Hot-bucket cap for the fuzzy-join deletion-variant buckets — same
    * role and same caveat as q_dedup_prefix's maxPrefixBucket: a scale
    * guard far above any bucket size the test SFs produce (observed
    * max ≈ tens at sf0.1: a bucket is a one-edit family), so both
    * engines keep every candidate and the capped plan stays
    * output-identical to the oracle. */
  private val fuzzyBucketCap = 65536

  /** Ext — fuzzy string join (record linkage): all DISTINCT name pairs
    * within edit distance 1, without the quadratic cross join.
    * Blocking is the DELETION NEIGHBORHOOD (FastSS, Bocek et al. 2007;
    * the SymSpell symmetric-delete scheme): with
    * D(x) = {x} ∪ {x minus one character}, ed(a,b) ≤ 1 ⟺
    * D(a) ∩ D(b) ≠ ∅ — substitution at i matches the two del_i
    * variants, insertion/deletion matches the shorter string against
    * a del variant of the longer, equality matches the strings
    * themselves. Unlike the q-gram prefix filter this is an EXACT
    * characterization, not a necessary condition: candidates ≈ true
    * pairs (replacing the q-gram blocker cut candidates 7.4 M → 307 k
    * on the digit-keyed sf0.1 corpus, 7.4 s → measured below), there
    * is no min-length regime (the old length ≤ 4 all-pairs fallback
    * is gone), and completeness needs no gram-count argument. Exact
    * `levenshtein` verifies in-bucket pairs — hash-coincidence or
    * cross-position variant collisions drop there — so the output
    * equals the oracle's plain quadratic form, which is the point:
    * the oracle IS the cross join, the Spark side never is. Index
    * blowup is (len+1)× rows of 8-byte hashes — the ed ≤ 1 instance
    * of FastSS's len^ed growth; a general-threshold join would fall
    * back to the q-gram prefix machinery (q_dedup_prefix). */
  /** Verified edit-distance-≤1 pairs of `names` (columns: k, name) —
    * the complete blocking+verify pipeline shared by q_join_fuzzy and
    * q_graph_triangles (one definition so the hot-bucket cap and the
    * length filter cannot drift between them). Returns
    * (ka, kb, na, nb, dist) with ka < kb, one row per distinct KEY
    * pair. */
  private[operators] def fuzzyPairs(names: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // deletion variants, hashed to 8 bytes: element 0 is the string
    // itself, element i its copy with character i removed.
    // r22: the r21 spread(names, k) was REMOVED after an isolation A/B
    // (3 interleaved QueryProfile reps per variant, quiet machine):
    // unlike the other spread sites, the downstream exchange here is
    // the bucket groupBy on h, so a spread on k does not replace an
    // exchange the plan wanted — it adds one. Measured warm-best:
    // q_clustering_coeff 3.24/3.49/4.32 with vs 3.08/3.43/3.49
    // without; q_join_fuzzy 2.55/3.16 with vs 2.28/2.39 without;
    // q_graph_triangles neutral. This also adjudicates the r21
    // driver's q_clustering_coeff 2.77→3.30 read (verdict item 2):
    // partially real, caused by this exchange, now removed.
    val dv = names
      .select(col("k"), explode(expr(
        "transform(sequence(0, length(name)), i -> CASE WHEN i = 0 " +
          "THEN name ELSE concat(substring(name, 1, i - 1), " +
          "substring(name, i + 1, length(name) - i)) END)")).as("v"))
      .select(col("k"), xxhash64(col("v")).as("h"))
    // in-bucket pair generation from ONE evaluation of the bucket
    // (collect_list bounded by the cap); only 8-byte keys ride the
    // shuffle — names attach at verify. The distinct collapses
    // multi-variant multiplicity (a substitution pair shares 2
    // variants) and hands AQE a materialized exchange whose measured
    // size drives broadcast planning of the name-attach joins (the
    // q-gram version measured 29 s without it).
    val cand = dv
      .groupBy("h").agg(collect_list(col("k")).as("ks"))
      .filter(size(col("ks")).between(2, fuzzyBucketCap))
      .select(explode(col("ks")).as("ka"), col("ks"))
      .select(col("ka"), explode(col("ks")).as("kb"))
      .filter(col("ka") < col("kb"))
      // r22 negative A/B, not shipped: pinning the distinct's
      // parallelism with repartition(par, ka, kb) — AQE coalesces the
      // pair exchange to ~2 tasks by BYTES while its dedup is
      // CPU-heavy — measured WORSE and unstable (2.0–16.5 s vs
      // 2.2–3.2 s across order-controlled reps): the explicit
      // repartition defeats the map-side partial dedup, shipping the
      // full in-bucket fan-out through the exchange.
      .distinct()
    // verify: attach names (AQE broadcasts the dim at test scale; at
    // 100 TB these are two shuffle joins on 8-byte keys), exact
    // levenshtein, pair ordered by NAME like the oracle — identical
    // names (distance 0) drop at name_a < name_b
    val na = names.select(col("k").as("ka"), col("name").as("na"))
    val nb = names.select(col("k").as("kb"), col("name").as("nb"))
    cand
      .join(na, "ka").join(nb, "kb")
      .filter(abs(length(col("na")) - length(col("nb"))) <= 1)
      .withColumn("dist",
        levenshtein(col("na"), col("nb")).cast(LongType))
      .filter(col("dist") <= 1)
  }

  val qJoinFuzzy: QuerySpec = QuerySpec(
    "q_join_fuzzy",
    """SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a, customer b
      |WHERE a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
    // pair identity by NAME (oracle's a.c_name < b.c_name): reorder
    // the key-paired rows by name; identical names (distance 0) drop
    // at name_a < name_b
    fuzzyPairs(LsdDb.table(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("name")))
      .select(least(col("na"), col("nb")).as("name_a"),
        greatest(col("na"), col("nb")).as("name_b"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast(LongType))
      .distinct()
      .orderBy("name_a", "name_b")
  }

  /** Ext — key-skew profile: the diagnostic you run BEFORE deciding to
    * salt a join or aggregate. Per-key frequencies reduce map-side
    * (partial count), the top-10 heavy hitters come back through
    * TakeOrderedAndProject (never a full sort), and each gets its
    * corpus share plus the running cumulative share — the curve whose
    * knee tells you whether skew is a one-key problem (salt that key)
    * or a long-head problem (repartition). The only window runs over
    * the 10 surviving rows; the total is a broadcast single-row cross
    * join, so nothing here grows with the corpus except the one
    * partial-aggregated groupBy. Shares are exact: BIGINT counts and
    * cumulative sums divided once in double — no rounding needed for
    * the oracle hash. */
  val qSkewProfile: QuerySpec = QuerySpec(
    "q_skew_profile",
    """WITH c AS (SELECT user_id, count(*) AS n FROM events
      |           GROUP BY user_id),
      |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM events),
      |top AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id LIMIT 10)
      |SELECT user_id, n,
      |  CAST(n AS DOUBLE) / total AS share,
      |  CAST(sum(n) OVER (ORDER BY n DESC, user_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / total AS cum_share
      |FROM top, t
      |ORDER BY n DESC, user_id""".stripMargin) { (s, dir) =>
    val ev = LsdDb.table(s, dir, "events")
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(10)
    val t = ev.agg(count(lit(1)).cast(DoubleType).as("total"))
    // window over exactly 10 rows — single-partition by construction,
    // deliberately AFTER the limit so the sort never sees the key set
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("user_id"))
      .rowsBetween(Long.MinValue, 0)
    top.crossJoin(broadcast(t))
      .select(col("user_id"), col("n"),
        (col("n").cast(DoubleType) / col("total")).as("share"),
        (sum(col("n")).over(w).cast(DoubleType) / col("total"))
          .as("cum_share"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** Ext — distribution DRIFT between corpus sources via the
    * Population Stability Index: reference population = even-numbered
    * sources, candidate = odd, binned by document length (50-char
    * bins). Per bin, psi = (p−q)·ln(p/q); the grand total rides every
    * row (the analyst's single drift number; >0.2 is the classic
    * "significant shift" line).
    *
    * Determinism: counts are integers; p, q and p/q are single exact-
    * integer-ratio divisions (ln(p/q) computed from n_a·tot_b /
    * n_b·tot_a — one division, not a quotient of quotients); the
    * (p−q)·ln term is a mul chain → d6-snapped; and the TOTAL is a
    * decimal(18,6)-exact sum of the snapped on-grid terms (a float
    * window sum would be order-dependent). Bins missing from either
    * population drop (the standard sparse-bin practice — merge or
    * epsilon-smooth upstream if they matter). One partial-aggregated
    * groupBy over the corpus; everything after is bin-scale. */
  val qDriftPsi: QuerySpec = QuerySpec(
    "q_drift_psi",
    s"""WITH d AS (SELECT CAST(substr(source, 4) AS INT) % 2 AS pop,
       |    n_chars // 50 AS bin FROM documents),
       |a AS (SELECT bin, count(*) AS n_ref FROM d WHERE pop = 0
       |  GROUP BY bin),
       |b AS (SELECT bin, count(*) AS n_new FROM d WHERE pop = 1
       |  GROUP BY bin),
       |tot AS (SELECT (SELECT count(*) FROM d WHERE pop = 0) AS ta,
       |  (SELECT count(*) FROM d WHERE pop = 1) AS tb),
       |terms AS (SELECT a.bin, a.n_ref, b.n_new,
       |    ${D.sql.d6(
          "(CAST(a.n_ref AS DOUBLE) / ta - CAST(b.n_new AS DOUBLE) / tb)" +
            " * ln(CAST(a.n_ref * tb AS DOUBLE)" +
            " / CAST(b.n_new * ta AS DOUBLE))")} AS psi_term
       |  FROM a JOIN b USING (bin), tot)
       |SELECT bin, n_ref, n_new, psi_term,
       |  CAST(sum(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE)
       |    AS psi_total
       |FROM terms ORDER BY bin""".stripMargin) { (s, dir) =>
    val d = LsdDb.table(s, dir, "documents")
      .select((regexp_extract(col("source"), "\\d+", 0).cast("int") % 2)
        .as("pop"), expr("n_chars div 50").as("bin"))
    val a = d.filter(col("pop") === 0).groupBy("bin")
      .agg(count(lit(1)).as("n_ref"))
    val b = d.filter(col("pop") === 1).groupBy("bin")
      .agg(count(lit(1)).as("n_new"))
    val tot = d.agg(
      sum(when(col("pop") === 0, 1L).otherwise(0L)).as("ta"),
      sum(when(col("pop") === 1, 1L).otherwise(0L)).as("tb"))
    val term = D.d6(
      (col("n_ref").cast(DoubleType) / col("ta")
        - col("n_new").cast(DoubleType) / col("tb"))
        * log((col("n_ref") * col("tb")).cast(DoubleType)
          / (col("n_new") * col("ta")).cast(DoubleType)))
    a.join(b, "bin").crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_new"),
        term.as("psi_term"))
      .withColumn("psi_total",
        sum(col("psi_term").cast(org.apache.spark.sql.types
          .DecimalType(18, 6)))
          .over(Window.partitionBy()).cast(DoubleType))
      .orderBy("bin")
  }

  /** Ext — two-sample KOLMOGOROV–SMIRNOV drift statistic between the
    * same source populations as q_drift_psi: D = max_x |F_a(x) −
    * F_b(x)| over the document-length distribution — the rank-based
    * drift test that needs no binning choice (PSI's weakness).
    *
    * Exact integer form: at every distinct length value,
    * |cum_a·tot_b − cum_b·tot_a| is an exact BIGINT; the max and its
    * argmax location (smallest length on ties) are integer
    * comparisons, and D itself is ONE final division by tot_a·tot_b.
    * The corpus-scale work is one groupBy(length, pop) count; the
    * cumulative window runs over the ≤#distinct-lengths relation
    * (value-domain-bounded, not corpus-bounded). */
  val qDriftKs: QuerySpec = QuerySpec(
    "q_drift_ks",
    """WITH d AS (SELECT CAST(substr(source, 4) AS INT) % 2 AS pop,
      |    n_chars FROM documents),
      |g AS (SELECT n_chars, count(*) FILTER (WHERE pop = 0) AS c_a,
      |    count(*) FILTER (WHERE pop = 1) AS c_b
      |  FROM d GROUP BY n_chars),
      |cum AS (SELECT n_chars,
      |    sum(c_a) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |    sum(c_b) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      |  FROM g),
      |tot AS (SELECT sum(c_a) AS ta, sum(c_b) AS tb FROM g),
      |dev AS (SELECT n_chars, abs(ca * tb - cb * ta) AS num FROM cum, tot),
      |best AS (SELECT n_chars, num,
      |    row_number() OVER (ORDER BY num DESC, n_chars) AS rk FROM dev)
      |SELECT b.n_chars AS ks_at, CAST(b.num AS BIGINT) AS ks_num,
      |  CAST(t.ta * t.tb AS BIGINT) AS ks_den,
      |  CAST(b.num AS DOUBLE) / CAST(t.ta * t.tb AS DOUBLE) AS ks_d
      |FROM best b, tot t WHERE b.rk = 1""".stripMargin) { (s, dir) =>
    val d = LsdDb.table(s, dir, "documents")
      .select((regexp_extract(col("source"), "\\d+", 0).cast("int") % 2)
        .as("pop"), col("n_chars"))
    val g = d.groupBy("n_chars")
      .agg(sum(when(col("pop") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("pop") === 1, 1L).otherwise(0L)).as("c_b"))
    val wc = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.select(col("n_chars"),
      sum(col("c_a")).over(wc).as("ca"),
      sum(col("c_b")).over(wc).as("cb"))
    val tot = g.agg(sum(col("c_a")).as("ta"), sum(col("c_b")).as("tb"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_chars"),
        abs(col("ca") * col("tb") - col("cb") * col("ta")).as("num"),
        (col("ta") * col("tb")).as("den"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("num").desc, col("n_chars"))))
      .filter(col("rk") === 1)
      .select(col("n_chars").as("ks_at"),
        col("num").cast(LongType).as("ks_num"),
        col("den").cast(LongType).as("ks_den"),
        (col("num").cast(DoubleType) / col("den").cast(DoubleType))
          .as("ks_d"))
  }

  /** Ext — GINI coefficient of the document-length distribution: the
    * single inequality number behind a token-budget audit (is the
    * corpus mass concentrated in a few giant documents?).
    *
    * Exact value-domain form of the sorted-positions identity
    * Gini = Σ_i (2i − n − 1)·x_(i) / (n·Σx): positions of a tied
    * value v (count c, predecessors cp) contribute
    * v·(2·c·cp + c·(c+1) − c·(n+1)) — every term exact DECIMAL, so
    * no corpus-scale sort and no per-row rank exist anywhere: the
    * corpus-scale work is one groupBy(length) count, the cumulative
    * window runs over the value domain (≤ max length rows), and Gini
    * is one final double division. */
  val qGini: QuerySpec = QuerySpec(
    "q_gini",
    """WITH g AS (SELECT n_chars AS v, count(*) AS c FROM documents
      |  GROUP BY 1),
      |cum AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp
      |  FROM g),
      |tot AS (SELECT sum(c) AS n,
      |    sum(CAST(v AS DECIMAL(38,0)) * c) AS s FROM g),
      |agg AS (SELECT sum(CAST(v AS DECIMAL(38,0)) *
      |      (2 * CAST(c AS DECIMAL(38,0)) * cp
      |       + CAST(c AS DECIMAL(38,0)) * (c + 1)
      |       - CAST(c AS DECIMAL(38,0)) * (n + 1))) AS num
      |  FROM cum, tot)
      |SELECT CAST(n AS BIGINT) AS n_docs, CAST(s AS BIGINT) AS total_chars,
      |  CAST(num AS DOUBLE) / CAST(CAST(n AS DECIMAL(38,0)) * s AS DOUBLE)
      |    AS gini
      |FROM agg, tot""".stripMargin) { (s, dir) =>
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = LsdDb.table(s, dir, "documents")
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = g.select(col("v"), col("c"),
      coalesce(sum(col("c")).over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("cp"))
    val tot = g.agg(sum(col("c")).as("n"),
      sum(col("v").cast(dec) * col("c")).as("s"))
    val agg = cum.crossJoin(broadcast(tot))
      .agg(sum(col("v").cast(dec) *
        (lit(2) * col("c").cast(dec) * col("cp")
          + col("c").cast(dec) * (col("c") + 1)
          - col("c").cast(dec) * (col("n") + 1))).as("num"))
    agg.crossJoin(broadcast(tot))
      .select(col("n").cast(LongType).as("n_docs"),
        col("s").cast(LongType).as("total_chars"),
        (col("num").cast(DoubleType) /
          (col("n").cast(dec) * col("s")).cast(DoubleType)).as("gini"))
  }

  def specs: Seq[QuerySpec] = Seq(
    qDedupSubstring, qBoilerplateTopk, qDsirWeight, qChunkOverlap, qKanon,
    qSkewProfile, qJoinFuzzy, qDriftPsi, qDriftKs, qGini)
}
