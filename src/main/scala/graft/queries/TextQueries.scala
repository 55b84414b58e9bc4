package graft.queries

import graft.Tables
import graft.functions.MathFunctions.{floorRound => fr, floorRoundSql => frs}
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.immutable.ListMap

/** Text-analysis + dedup coverage over the `documents` fixture: corpus stats,
  * exact dedup, token counting, language-ID, quality scoring, fingerprinting,
  * n-gram Jaccard near-dup, MinHash-LSH and SimHash (SURVEY.md §2.8 X-F/X-D
  * and the training-data-pipeline extensions).
  *
  * The direct pair-join Jaccard query (q22) is the *exact verifier* and oracle
  * anchor; the LSH variants (q22b/q22c) are the scale path — candidate
  * generation via banding join instead of O(n²) pairs.
  */
object TextQueries {

  // ---- DuckDB oracle fragments (mirror TextFunctions exactly) ----
  private def hitsSql(word: String): String =
    s"len(list_filter(string_split(text,' '), t -> t = '$word'))"
  private def scoreSql(markers: Seq[String]): String =
    markers.map(hitsSql).mkString("(", " + ", ")")

  private val langScoreCols = langMarkers.map { case (lang, ms) => s"s_$lang" -> scoreSql(ms) }
  private val langIdOracle: String = {
    val scoreSelect = langScoreCols.map { case (c, e) => s"$e AS $c" }.mkString(", ")
    val best        = langScoreCols.map(_._1).mkString("greatest(", ", ", ")")
    val cases = langMarkers.map { case (lang, _) =>
      s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""SELECT doc_id, CASE $cases ELSE 'und' END AS lang_guess,
       |  s_en, s_de, s_es, s_fr, s_zh
       |FROM (SELECT doc_id, $scoreSelect, $best AS best FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB mirror of the byte-level BPE token count
    * ([[graft.functions.bpe.BpeTokenizer.default]]) as a recursive-CTE merge
    * loop. The merge table is interpolated FROM the Scala tokenizer at
    * registration time (raw-byte form, rank = list position), so both engines
    * share one source of truth.
    *
    * Two deliberate reductions, both verified:
    *
    *  - Pre-tokenization: the fixture corpus is lowercase words joined by
    *    single spaces (no digits, punctuation, multi-space runs, or leading/
    *    trailing space — asserted over every SF), on which the full GPT-2
    *    pattern reduces to its `' ?\p{L}+'` branch; RE2/DuckDB cannot express
    *    the pattern's `(?!\S)` lookahead in general.
    *  - Merge order: the CTE merges ONE pair per step — the leftmost
    *    occurrence of the lowest-rank pair — where the tokenizer merges every
    *    occurrence of that pair before rescanning. For a TRAINED table these
    *    converge identically: a merge of rank r only creates pairs involving
    *    its product symbol, whose ranks are necessarily > r, so the chosen
    *    pair stays the minimum until all its occurrences are consumed
    *    left-to-right in both formulations (property-tested in BpeSpec).
    *
    * Since the corpus is ASCII, the GPT-2 byte↔unicode mapping is a token-
    * count-invariant bijection, so the SQL works on raw characters with the
    * merge keys decoded to raw form ("Ġthe" -> " the").
    */
  /** The recursive merge-loop CTE chain, ending at `bpetc` (doc_id, n_tok =
    * BPE token count; docs whose pre-tokenization yields nothing — none in
    * the fixtures — would be absent, so consumers LEFT JOIN + coalesce 0).
    * Shared by q18b and the BPE-budgeted packing/export oracles
    * (q215b/q221b), so every BPE-denominated budget is checked against the
    * same single source of truth.
    */
  private lazy val bpeCountCtes: String = {
    import graft.functions.bpe.BpeTokenizer
    val keys = BpeTokenizer.default.merges
      .map { case (a, b) =>
        // "\u001f" (chr(31)) separates the pair's sides: it appears in
        // neither symbol, so (a,bc) and (ab,c) stay distinct keys
        val raw = BpeTokenizer.symbolToRaw(a) + "\u001f" + BpeTokenizer.symbolToRaw(b)
        "'" + raw.replace("'", "''") + "'"
      }
      .mkString("[", ",", "]")
    s"""WITH RECURSIVE mk AS (SELECT $keys AS keys),
       |pre AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, ' ?[a-z]+')) AS tok
       |  FROM documents),
       |init AS (
       |  SELECT doc_id, list_transform(range(1, length(tok)+1), i -> tok[i]) AS syms
       |  FROM pre),
       |bpe AS (
       |  SELECT doc_id, syms, FALSE AS done FROM init
       |  UNION ALL
       |  SELECT doc_id,
       |    CASE WHEN best IS NULL THEN syms
       |         ELSE list_slice(syms, 1, best.i - 1) || [syms[best.i] || syms[best.i+1]] ||
       |              list_slice(syms, best.i + 2, len(syms)) END AS syms,
       |    best IS NULL AS done
       |  FROM (
       |    SELECT doc_id, syms,
       |      list_sort(list_filter(
       |        list_transform(range(1, len(syms)),
       |          i -> {'r': list_position(keys, syms[i] || chr(31) || syms[i+1]), 'i': i}),
       |        x -> x.r IS NOT NULL AND x.r > 0))[1] AS best
       |    FROM bpe, mk WHERE NOT done)),
       |bpetc AS (
       |  SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS n_tok
       |  FROM bpe WHERE done GROUP BY doc_id)""".stripMargin
  }

  private lazy val bpeOracle: String =
    s"""$bpeCountCtes
       |SELECT doc_id, n_tok AS n_bpe_tokens FROM bpetc ORDER BY doc_id""".stripMargin

  /** `documents` with BPE token counts — the `tc` head the q221/q215 oracle
    * tails expect, here denominated in the unit a training loader budgets.
    */
  private lazy val bpeTcCtes: String =
    s"""$bpeCountCtes,
       |tc AS (
       |  SELECT d.doc_id, d.source, d.text, coalesce(b.n_tok, 0) AS n_tok
       |  FROM documents d LEFT JOIN bpetc b USING (doc_id))""".stripMargin

  /** One RRF term: 1/(60 + rank), 0 when the leg missed the doc. */
  private val rrfTermSql = (r: String) =>
    s"coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST($r AS DOUBLE)), CAST(0.0 AS DOUBLE))"

  /** Query-independent corpus CTEs of the hybrid family: the
    * hashing-embedder bucket-count vectors + norms every vector leg shares.
    */
  private lazy val hybridCorpusCtes: String =
    """v_tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      |v_b AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(w)),
      |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS bucket
      |  FROM v_tok),
      |v_c AS (SELECT doc_id, bucket, count(*) AS n FROM v_b GROUP BY 1, 2),
      |v_norms AS (SELECT doc_id, sqrt(CAST(sum(n * n) AS DOUBLE)) AS nrm FROM v_c GROUP BY 1)""".stripMargin

  /** Per-query-doc hybrid leg CTEs, suffixed `sfx`: `lex$sfx` (doc_id,
    * r_lex — BM25 top-20 for `terms`), `vec$sfx` (doc_id, r_vec — cosine
    * top-20 for query doc `qid`), and their full-outer rank join `f$sfx`.
    */
  private def hybridQueryCtes(qid: Long, terms: Seq[String], sfx: String): String = {
    val bmSql = graft.operators.Retrieval.bm25Sql(
      "documents", "doc_id", "text", terms, topK = 20)
    s"""lex$sfx AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_lex
       |  FROM ($bmSql)),
       |v_q$sfx AS (SELECT bucket, n FROM v_c WHERE doc_id = $qid),
       |v_qn$sfx AS (SELECT nrm AS qnrm FROM v_norms WHERE doc_id = $qid),
       |v_dots$sfx AS (
       |  SELECT c.doc_id, CAST(sum(c.n * q.n) AS DOUBLE) AS dot
       |  FROM v_c c JOIN v_q$sfx q USING (bucket) WHERE c.doc_id <> $qid GROUP BY 1),
       |v_sc$sfx AS (
       |  SELECT n.doc_id,
       |    ${frs(s"coalesce(d.dot, CAST(0 AS DOUBLE)) / (n.nrm * v_qn$sfx.qnrm)", 6)} AS score
       |  FROM v_norms n LEFT JOIN v_dots$sfx d ON n.doc_id = d.doc_id, v_qn$sfx
       |  WHERE n.doc_id <> $qid AND n.nrm > 0),
       |vec$sfx AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_vec
       |  FROM (SELECT * FROM v_sc$sfx ORDER BY score DESC, doc_id LIMIT 20)),
       |f$sfx AS (
       |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec
       |  FROM lex$sfx l FULL OUTER JOIN vec$sfx v ON l.doc_id = v.doc_id)""".stripMargin
  }

  /** Shared CTE chain of the single-query hybrid family (q112/q231):
    * query doc 0, q96's terms, unsuffixed CTE names.
    */
  private lazy val hybridLegCtes: String =
    s"""WITH $hybridCorpusCtes,
       |${hybridQueryCtes(0L, Seq("dup", "vector", "query"), "")}""".stripMargin

  /** The multi-query hybrid eval's query set (q237/q238): five query docs,
    * each with a FIXED lexical term triple — literals, so the oracle bakes
    * them into its per-query BM25 CTEs; all terms are fixture vocabulary.
    */
  private val hybridQueryDefs: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("dup", "vector", "query"),
    1L -> Seq("scan", "filter", "sort"),
    2L -> Seq("table", "window", "key"),
    3L -> Seq("merge", "stream", "group"),
    4L -> Seq("order", "part", "value"))

  /** q231's leg-vs-truth eval for EVERY query in [[hybridQueryDefs]], one
    * relation keyed `leg#qid`. Shared by q237 (per-row report) and q238
    * (per-leg macro) so the two queries read identical inputs.
    */
  private def hybridEvalMulti(s: SparkSession, dir: String): DataFrame =
    // standing artifact (the verdict pattern): q237 and the q238 macro read
    // one materialized eval relation instead of re-running 5 BM25 passes +
    // 5 top-k scans each; the name bakes a digest of the FULL query-def
    // list (ids AND term triples), so editing any term invalidates the key
    graft.pipeline.ArtifactStore.loadOrBuild(s,
      graft.pipeline.ArtifactStore.rootFor(dir,
        s"hybrid_eval_multi_$hybridQueryDefsDigest-k10_t20_rrf60_v1")) {
      hybridEvalMultiBuild(s, dir)
    }.orderBy("qkey")

  /** Content digest of [[hybridQueryDefs]] for the artifact key. */
  private lazy val hybridQueryDefsDigest: String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(hybridQueryDefs.map { case (q, ts) => s"$q:${ts.mkString(",")}" }
        .mkString(";").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  /** The shared leg construction of the multi-query hybrid family: system
    * rankings for all legs × queries under the `leg#qid` key, plus the
    * exact-cosine truth carrying its own rank (`vrank`) so graded consumers
    * can band gains from it — binary consumers drop the column.
    */
  private def hybridLegsRanked(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val emb = graft.pipeline.HashingEmbedder(64)
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); every query's vector leg reads the same embedded corpus
    val dv = docs.select(col("doc_id"), emb.embedRaw(col("text")).as("vec")).cache()
    val perQ = hybridQueryDefs.map { case (qid, terms) =>
      val lex = graft.operators.Retrieval.bm25(docs, "doc_id", "text", terms, topK = 20)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
        .select("doc_id", "rank")
      val qv = dv.filter(col("doc_id") === qid).select(col("vec")).head().getSeq[Double](0)
      val vec = graft.operators.TopK.topK(
          dv.filter(col("doc_id") =!= qid), "vec", "doc_id", qv, k = 20)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
        .select("doc_id", "rank")
      val hyb = graft.operators.Retrieval.rrfFuse(
          Seq("lex" -> lex, "vec" -> vec), "doc_id", kRrf = 60, topK = 10)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("rrf"), col("doc_id"))))
        .select("doc_id", "rank")
      def keyed(leg: String, r: org.apache.spark.sql.DataFrame) =
        r.select(concat_ws("#", lit(leg), lit(qid.toString)).as("qkey"),
          col("doc_id"), col("rank"))
      val ranked = keyed("lex", lex).unionByName(keyed("vec", vec))
        .unionByName(keyed("hybrid", hyb))
      val truth = Seq("hybrid", "lex", "vec").toDF("leg")
        .crossJoin(vec.filter(col("rank") <= 10).select(col("doc_id"), col("rank").as("vrank")))
        .select(concat_ws("#", col("leg"), lit(qid.toString)).as("qkey"),
          col("doc_id"), col("vrank"))
      (ranked, truth)
    }
    (perQ.map(_._1).reduce(_ unionByName _), perQ.map(_._2).reduce(_ unionByName _))
  }

  private def hybridEvalMultiBuild(s: SparkSession, dir: String): DataFrame = {
    val (ranked, truth) = hybridLegsRanked(s, dir)
    graft.operators.Retrieval.rankingEval(
      ranked, truth.drop("vrank"), "qkey", "doc_id", "rank", k = 10)
  }

  /** GRADED multi-query hybrid eval (r15 verdict task 5 — q232 × q237):
    * the same 15 leg×query rankings, gains banded from the exact-cosine
    * truth rank (3 for the top-2, 2 for 3–5, 1 for 6–10 — q232's integer
    * CASE, bit-identical across engines). One standing artifact, read by
    * the q240 per-leg macro.
    */
  private def hybridEvalMultiGraded(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.ArtifactStore.loadOrBuild(s,
      graft.pipeline.ArtifactStore.rootFor(dir,
        s"hybrid_eval_multi_graded_$hybridQueryDefsDigest-k10_t20_rrf60_v1")) {
      val (ranked, truth) = hybridLegsRanked(s, dir)
      graft.operators.Retrieval.rankingEvalGraded(
        ranked,
        truth.withColumn("grade",
          when(col("vrank") <= 2, 3L).when(col("vrank") <= 5, 2L).otherwise(1L)),
        "qkey", "doc_id", "rank", "grade", k = 10)
    }.orderBy("qkey")

  /** q237's oracle: the shared corpus CTEs once, per-query leg CTEs
    * suffixed `_q<id>`, the 15 system rankings and 15 truth blocks unioned
    * under the `leg#qid` key, and q228's metric tail verbatim.
    */
  private def hybridEvalMultiOracleBody(graded: Boolean): String = {
    val legCtes = hybridQueryDefs.map { case (qid, terms) =>
      hybridQueryCtes(qid, terms, s"_q$qid")
    }.mkString(",\n")
    val hybCtes = hybridQueryDefs.map { case (qid, _) =>
      s"""hyb_q$qid AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
         |  FROM (
         |    SELECT doc_id,
         |      ${frs(rrfTermSql("r_lex") + " + " + rrfTermSql("r_vec"), 6)} AS rrf
         |    FROM f_q$qid ORDER BY rrf DESC, doc_id LIMIT 10))""".stripMargin
    }.mkString(",\n")
    val sysr = hybridQueryDefs.map { case (qid, _) =>
      s"""  SELECT 'lex#$qid' AS qkey, doc_id, r_lex AS rn FROM lex_q$qid WHERE r_lex <= 10
         |  UNION ALL SELECT 'vec#$qid', doc_id, r_vec FROM vec_q$qid WHERE r_vec <= 10
         |  UNION ALL SELECT 'hybrid#$qid', doc_id, rank FROM hyb_q$qid""".stripMargin
    }.mkString("\n  UNION ALL\n")
    // graded truth bands gains from the exact-cosine rank (q232's CASE)
    val gradeSel = if (graded)
      ",\n    CASE WHEN v.r_vec <= 2 THEN 3 WHEN v.r_vec <= 5 THEN 2 ELSE 1 END AS grade"
    else ""
    val vCols = if (graded) "doc_id, r_vec" else "doc_id"
    val tru = hybridQueryDefs.map { case (qid, _) =>
      s"""  SELECT l.leg || '#$qid' AS qkey, v.doc_id$gradeSel
         |  FROM (SELECT unnest(['hybrid', 'lex', 'vec']) AS leg) l
         |  CROSS JOIN (SELECT $vCols FROM vec_q$qid WHERE r_vec <= 10) v""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val tail =
      if (graded) graft.operators.Retrieval.rankingEvalGradedTailSql(10, "qkey", "doc_id")
      else graft.operators.Retrieval.rankingEvalTailSql(10, "qkey", "doc_id")
    s"""WITH $hybridCorpusCtes,
       |$legCtes,
       |$hybCtes,
       |sysr AS (
       |$sysr),
       |tru AS (
       |$tru),
       |$tail""".stripMargin
  }

  private lazy val hybridEvalMultiOracle: String = hybridEvalMultiOracleBody(graded = false)
  private lazy val hybridEvalMultiGradedOracle: String = hybridEvalMultiOracleBody(graded = true)

  /** SQL mirror of TextFunctions.qualityScore — shared by q20 and the q57
    * curation chain. */
  private val qualityExprSql: String = {
    val n     = "CAST(len(string_split(text,' ')) AS DOUBLE)"
    val stops = "CAST((" + Seq("the", "and", "of", "is", "a").map(hitsSql).mkString(" + ") + ") AS DOUBLE)"
    s"""least(CAST(1.0 AS DOUBLE),
       |  CAST(0.1 AS DOUBLE)
       |  + CAST(0.6 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), $n / CAST(100.0 AS DOUBLE))
       |  + CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), ($stops / greatest($n, CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE)))""".stripMargin
  }

  private val qualityOracle: String =
    s"""SELECT doc_id, ${frs(qualityExprSql, 4)} AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  private val rollHashOracle: String =
    """SELECT doc_id, substr(md5(text),1,16) AS fp16,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text,' '),
      |        w -> CAST(ascii(substr(w,1,1))*10000 + length(w)*100 + ascii(substr(reverse(w),1,1)) AS BIGINT))),
      |    (acc, x) -> (acc*31 + x) % 1000000007) AS roll_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  val JaccardThreshold = 0.5

  /** Semantic-axis exact-cosine threshold (q212/q213): fixture-calibrated —
    * raw bucket-count cosine of planted near-dup texts sits ≥ 0.95 while the
    * same-topic (non-dup) mass stays below 0.90 (28 vs 267 candidate pairs
    * at sf0.01), so 0.95 plays the role a 0.95-0.99 band plays on a real
    * corpus embedded with a production model.
    */
  val SemCosThreshold = 0.95

  /** Probe-sample size of the sampled semantic recall audit (q245b): the
    * truth side costs SemSampleProbes × corpus exact cosines — fixed, so
    * the audit stays linear at any corpus scale. 1024 (raised from 128,
    * r17 verdict item 6): 128 probes caught ~14 true losers at sf0.1 —
    * wilson_lo 0.778, too loose to alarm on; 1024 catches ~112 (measured
    * n_true 56 at 512, linear in probes), which at the measured recall
    * 0.964 puts wilson_lo ≈ 0.905 — the bound now certifies recall ≥ 0.9
    * at ~97.7% one-sided confidence, a gate strong enough to alarm on.
    * Probe side stays broadcast-sized; truth stays |probes| × corpus.
    */
  val SemSampleProbes = 1024

  // ---- MinHash-LSH / SimHash oracle SQL (mirrors the PolyHash family) ----
  // Every hash in Dedup's LSH pipelines is modular arithmetic below 2⁶³
  // (graft.functions.expressions.PolyHash), so the WHOLE pipeline — token
  // hash, shingle fold, affine min-hashes, band keys, candidate join, Jaccard
  // verify — is re-derived here in DuckDB SQL. Constants mirror PolyHash:
  // P=1000000007, R=1000003, a_j=((j+1)·1103515245+12345)%P,
  // b_j=((j+1)·69069+1)%P. Token order is preserved by zipped unnest
  // (tokens ∥ generate_series), the q35-proven per-character hashing pattern.
  private val HP = "1000000007"
  private val HR = "1000003"

  /** Shared CTE chain of the cross-corpus contamination family
    * (q189/q191/q192): brute-force per-position longest cross-side match on
    * the capped corpus (train = doc_id < 8, test = 8..11, first 128 chars).
    * Ends at `best` (doc_id, pos, lcp) — UNFILTERED; each query applies its
    * own minLen cut.
    *
    * `nullif(list_position(...), 0)` is load-bearing: when a match runs
    * clean to the length cap the compare list contains NO false, and
    * DuckDB's list_position returns 0 (not NULL) for not-found — without
    * the nullif the coalesce never fires and the lcp reads −1 instead of
    * the full length. sf0.01 never produces a full-to-boundary match, so
    * only the sf0.1 sweep caught it (q183 14 vs 12 rows).
    */
  /** ONE brute-force LCP CTE builder behind every suffix-family oracle
    * (q183/q189/q191/q192/q195 — round-11 verdict task 8: the q183 copy
    * diverging from this chain is how the `nullif` boundary bug had to be
    * hunted twice). `docFilter` bounds the corpus, `pairCond` selects which
    * (a, b) suffix pairs compete (self-dedup excludes the identity pair;
    * cross-corpus restricts to test×train).
    */
  private def lcpBruteCtes(docFilter: String, pairCond: String): String =
    s"""d AS (
       |  SELECT doc_id, substr(text, 1, 128) AS t FROM documents WHERE $docFilter),
       |p AS (
       |  SELECT doc_id, t, unnest(generate_series(0, length(t) - 1)) AS pos FROM d),
       |pr AS (
       |  SELECT a.doc_id AS da, a.pos AS pa, a.t AS ta,
       |         b.doc_id AS db, b.pos AS pb, b.t AS tb
       |  FROM p a JOIN p b ON $pairCond),
       |l AS (
       |  SELECT da, pa,
       |    coalesce(nullif(list_position(list_transform(
       |        generate_series(1, least(length(ta) - pa, length(tb) - pb)),
       |        i -> substr(ta, CAST(pa + i AS INTEGER), 1) = substr(tb, CAST(pb + i AS INTEGER), 1)),
       |      false), 0) - 1,
       |      least(length(ta) - pa, length(tb) - pb)) AS lcp
       |  FROM pr),
       |best AS (
       |  SELECT da AS doc_id, CAST(pa AS BIGINT) AS pos, CAST(max(lcp) AS BIGINT) AS lcp
       |  FROM l GROUP BY 1, 2)""".stripMargin

  private val crossCorpusCtes: String =
    lcpBruteCtes("doc_id < 12", "a.doc_id >= 8 AND b.doc_id < 8")

  /** The q192/q195 rate-report oracle: full-rebuild brute force → island
    * walk → per-doc mass, fraction, verdict. Shared verbatim by the batch
    * rebuild (q192) and the incrementally-maintained artifact (q195) — the
    * maintained path matching THIS rebuild oracle is the maintenance ≡
    * rebuild check.
    */
  private def contamRateOracleFor(docFilter: String, testWhere: String): String =
    s"""WITH ${lcpBruteCtes(docFilter, "a.doc_id >= 8 AND b.doc_id < 8")},
       |$maskSpanCtes,
       |spans AS (
       |  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |    CAST(max(e) - min(pos) AS BIGINT) AS span_len
       |  FROM isl2 GROUP BY doc_id, island),
       |mk AS (
       |  SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS masked_chars,
       |    CAST(count(*) AS BIGINT) AS n_spans
       |  FROM spans GROUP BY doc_id),
       |alldocs AS (
       |  SELECT doc_id, CAST(length(substr(text, 1, 128)) AS BIGINT) AS doc_len
       |  FROM documents WHERE $testWhere)
       |SELECT a.doc_id, a.doc_len,
       |  coalesce(mk.masked_chars, 0) AS masked_chars,
       |  coalesce(mk.n_spans, 0) AS n_spans,
       |  ${frs("CAST(coalesce(mk.masked_chars, 0) AS DOUBLE) / CAST(a.doc_len AS DOUBLE)", 4)} AS frac,
       |  CAST(${frs("CAST(coalesce(mk.masked_chars, 0) AS DOUBLE) / CAST(a.doc_len AS DOUBLE)", 4)} > CAST(0.3 AS DOUBLE) AS BIGINT) AS drop_doc
       |FROM alldocs a LEFT JOIN mk ON mk.doc_id = a.doc_id
       |ORDER BY a.doc_id""".stripMargin

  private lazy val contamRateOracle: String =
    contamRateOracleFor("doc_id < 12", "doc_id >= 8 AND doc_id < 12")

  /** The 128-char capped corpus split every contamination query shares:
    * train = doc_id < 8, test = 8..11. */
  private def contamCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), substring(col("text"), 1, 128).as("t"))

  /** Materialized SELF-corpus suffix array + adjacent-LCP table shared by
    * q183 and q185 (backlog r12 item 1): the doubling build runs once per
    * input dir; both finishes consume the arrays. Same determinism/keying
    * contract as [[contamHits]].
    */
  private def selfSuffixArrays(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import graft.pipeline.ArtifactStore
    lazy val built = graft.operators.SuffixRank.suffixArrays(s,
      contamCorpus(s, dir).filter(col("doc_id") < 8), "doc_id", "t")
    (ArtifactStore.loadOrBuild(s,
        ArtifactStore.rootFor(dir, "suffix_sa_d8_c128_v1"))(built._1),
      ArtifactStore.loadOrBuild(s,
        ArtifactStore.rootFor(dir, "suffix_lcp_d8_c128_v1"))(built._2))
  }

  /** MATERIALIZED contamination hits — the generalized suffix-rank overlap
    * table (doc_id, pos, lcp over test ids) built ONCE per input dir and
    * consumed by all three finishes (q189 spans, q191 mask, q192 rate):
    * round-11 verdict task 1. Whichever query runs first pays the
    * O(n log L) suffix-rank build and stages the parquet artifact; the
    * other two load it. Content is deterministic in (dir, params) — the
    * key bakes in corpus split, char cap, and minLen, with a version tag
    * to bump on semantic change — so load-vs-build can never change a
    * result, only its cost (ArtifactStore contract).
    */
  private def contamHits(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.ArtifactStore
    ArtifactStore.loadOrBuild(s,
      ArtifactStore.rootFor(dir, "contam_hits_tr8_te8-12_c128_m12_v1")) {
      val d = contamCorpus(s, dir)
      graft.operators.SuffixRank.crossCorpusOverlap(s,
        d.filter(col("doc_id") < 8),
        d.filter(col("doc_id") >= 8 && col("doc_id") < 12),
        "doc_id", "t", minLen = 12)
    }
  }

  /** The island walk over `best` (q191/q192): positions with lcp ≥ 12 span
    * [pos, pos+lcp); running per-doc max of ends marks island starts. Ends
    * at `isl2` (doc_id, pos, e, island).
    */
  private val maskSpanCtes: String =
    """sp AS (
      |  SELECT doc_id, pos, pos + lcp AS e FROM best WHERE lcp >= 12),
      |isl AS (
      |  SELECT doc_id, pos, e,
      |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |         OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS nw
      |  FROM sp),
      |isl2 AS (
      |  SELECT doc_id, pos, e,
      |    sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl)""".stripMargin
  private def affineSql(hashExpr: String, jExpr: String): String =
    s"((((($jExpr)+1)*1103515245 + 12345) % $HP) * $hashExpr + ((($jExpr)+1)*69069 + 1) % $HP) % $HP"

  /** Shared CTE chain: documents → ordered token hashes (th) → trigram
    * shingle hashes (shl) → per-doc distinct shingle sets (sh) → 32 affine
    * min-hashes (mh) → 16 band keys of 2 rows (bk) → candidate pairs (cand)
    * → Jaccard-verified pairs (pairs). Mirrors Dedup.minhashLshPairs with
    * shingleSize=3, numHashes=32, bands=16.
    */
  /** tok → th → shl prefix alone (per-doc ordered trigram shingle hashes) —
    * also the base of the novelty oracle (q93). */
  private val shingleCtes: String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
       |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, pos,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, length(w)),
       |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $HP) AS h
       |  FROM tok),
       |shl AS (
       |  SELECT a.doc_id,
       |    (((a.h * $HR + b.h) % $HP) * $HR + c.h) % $HP AS sh
       |  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2)""".stripMargin

  /** [[shingleCtes]] extended through shingle sets, signatures and band keys
    * — the prefix every LSH oracle shares; candidate joins differ per query
    * (symmetric id<id for the pair family, corpus-vs-delta for q99). */
  private val minhashBkCtes: String =
    s"""WITH $shingleCtes,
       |sh AS (SELECT doc_id, list_distinct(list(sh)) AS s FROM shl GROUP BY doc_id),
       |mh AS (
       |  SELECT doc_id, j, min(${affineSql("sh", "j")}) AS mh
       |  FROM shl, (SELECT unnest(generate_series(0, 31)) AS j)
       |  GROUP BY 1, 2),
       |bk AS (
       |  SELECT e.doc_id, e.j // 2 AS band,
       |    ((((e.j // 2 + 1) * $HR + e.mh) % $HP) * $HR + o.mh) % $HP AS band_key
       |  FROM mh e JOIN mh o ON e.doc_id = o.doc_id AND o.j = e.j + 1
       |  WHERE e.j % 2 = 0)""".stripMargin

  /** [[minhashBkCtes]] plus the symmetric (id_a < id_b) candidate join —
    * shared by the pair verify (q22b/q45/q92) and the sketch-accuracy audit
    * (q94), which needs `mh` and `cand` but not the Jaccard tail. */
  private val minhashCandCtes: String =
    s"""$minhashBkCtes,
       |cand AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bk x JOIN bk y
       |    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** Exact-Jaccard expression over the attached shingle sets — shared by the
    * pairs tail and the q94 audit oracle. */
  private val jacExpr: String =
    """CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      |      / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE)""".stripMargin

  private val minhashPairsCtes: String =
    s"""$minhashCandCtes,
       |pairs AS (
       |  SELECT id_a, id_b, ${frs(jacExpr, 4)} AS jac
       |  FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
       |            JOIN sh sb ON cand.id_b = sb.doc_id)""".stripMargin

  /** q194/q200's shared full-rebuild oracle: cross-sided band-key candidate
    * join + exact-Jaccard verify. q200's incrementally-maintained artifact
    * path matching THIS two-sided rebuild is its maintenance ≡ rebuild
    * check.
    */
  private[queries] lazy val crossNearDupCtes: String =
    s"""$minhashBkCtes,
       |cand AS (
       |  SELECT x.doc_id AS test_id, y.doc_id AS train_id
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.band_key = y.band_key
       |  WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT test_id, train_id, ${frs(jacExpr, 4)} AS jac
       |  FROM cand JOIN sh sa ON cand.test_id = sa.doc_id
       |            JOIN sh sb ON cand.train_id = sb.doc_id)""".stripMargin

  private lazy val crossNearDupOracle: String =
    s"""$crossNearDupCtes
       |SELECT test_id, train_id, jac FROM pairs
       |WHERE jac >= $JaccardThreshold ORDER BY 1, 2""".stripMargin

  /** q261/q266's shared purge oracle: the q194 two-sided rebuild with the
    * tombstoned ids (doc_id ≡ 1 mod 7) excluded from BOTH sides — the
    * rebuild-on-survivors both the one-shot and the streamed purge must
    * hash-equal.
    */
  private lazy val hitsPurgeOracle: String =
    s"""$crossNearDupCtes
       |SELECT test_id, train_id, jac FROM pairs
       |WHERE jac >= $JaccardThreshold
       |  AND test_id % 7 <> 1 AND train_id % 7 <> 1
       |ORDER BY 1, 2""".stripMargin

  /** Fusion CTE chain (q204/q205): [[minhashPairsCtes]] (tok → th → shl →
    * sh/mh/bk → cand → pairs) extended with the containment verifier over
    * the SAME candidates, the exact-hash losers, the SimHash chain reusing
    * `th` (same per-token hashes; the extra `pos` column is inert), and the
    * per-doc verdict `ver` under the documented precedence. Thresholds are
    * q22b's Jaccard (0.5), q81's containment (0.6), q22c's hamming (8).
    */
  private lazy val fusionAxesCtes: String =
    s"""$minhashPairsCtes,
       |cont AS (
       |  SELECT id_a, id_b,
       |    ${frs("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / CAST(least(len(sa.s), len(sb.s)) AS DOUBLE)", 4)} AS containment
       |  FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
       |            JOIN sh sb ON cand.id_b = sb.doc_id),
       |exl AS (
       |  SELECT d.doc_id FROM documents d
       |  JOIN (SELECT md5(text) AS h, min(doc_id) AS keeper
       |        FROM documents GROUP BY 1) k
       |    ON md5(d.text) = k.h
       |  WHERE d.doc_id > k.keeper),
       |sv AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN (${affineSql("h", "j")}) % 2 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM th, (SELECT unnest(generate_series(0, 59)) AS j)
       |  GROUP BY 1, 2),
       |ssim AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS sim
       |  FROM sv GROUP BY 1),
       |sbk AS (
       |  SELECT doc_id, sim, b, (sim >> CAST(b * 15 AS INTEGER)) & 32767 AS chunk
       |  FROM ssim, (SELECT unnest(generate_series(0, 3)) AS b)),
       |scand AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |    min(x.sim) AS sim_a, min(y.sim) AS sim_b
       |  FROM sbk x JOIN sbk y
       |    ON x.b = y.b AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |sp AS (
       |  SELECT id_a, id_b FROM scand WHERE bit_count(xor(sim_a, sim_b)) <= 8)""".stripMargin

  /** The cross-modal SEMANTIC axis (q212/q213): per-doc raw bucket-count
    * embeddings (q35's poly-hash buckets, reusing `th`'s token hashes),
    * corpus-mean-CENTERED banded sign-random-projection over the q27/q28
    * integer-hash hyperplanes (16 bands × corpus-derived width — exact-
    * match band candidates, the AND-OR amplification), exact RAW-cosine
    * verify. Mirrors [[graft.operators.AnnIndex.cosineNearDupPairsBandedCentered]]
    * over HashingEmbedder.embedRaw; see that scaladoc for why centering +
    * banding is the 100 TB shape (the raw positive-orthant baseline makes
    * every pair a near-candidate of any single sign table).
    *
    * Scopes must mirror the Scala side exactly: `nScopeSql` counts the
    * bucketed relation (distinct-text reps for the batch family, the
    * standing static corpus for the streamed gate) for the per-band width;
    * `muWhereSql` restricts the floored-mean centering to the SAME
    * relation. Mean arithmetic is all-BIGINT (sum // count), so both
    * engines center identically.
    */
  private def semEmbedCtes(nScopeSql: String, muWhereSql: String): String =
    s"""sparams AS (
       |  SELECT greatest(4, coalesce((
       |    SELECT min(b) FROM (SELECT unnest(generate_series(0, 30)) AS b) bs
       |    WHERE (CAST(16 AS BIGINT) << CAST(b AS INTEGER)) >= ($nScopeSql)), 30)) AS srb),
       |scv AS (SELECT doc_id, h % 64 AS bucket, count(*) AS n FROM th GROUP BY 1, 2),
       |sdense AS (
       |  SELECT d.doc_id, g.i, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM (SELECT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
       |  LEFT JOIN scv c ON c.doc_id = d.doc_id AND c.bucket = g.i),
       |smu AS (
       |  SELECT i, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
       |  FROM sdense $muWhereSql GROUP BY i),
       |semb AS (
       |  SELECT doc_id, list(CAST(x AS DOUBLE) ORDER BY sdense.i) AS v,
       |    list(CAST(x - m AS DOUBLE) ORDER BY sdense.i) AS vc
       |  FROM sdense JOIN smu ON smu.i = sdense.i GROUP BY doc_id),
       |splanes AS (
       |  SELECT list(list_transform(generate_series(0, 63), d ->
       |      CAST(((j*64+d+1)*(j*64+d+1) * 2654435761 + 97*(j*64+d+1) + 12345) % 1000003
       |        - 501001 AS DOUBLE)) ORDER BY j) AS ws
       |  FROM (SELECT unnest(generate_series(0, 16 * (SELECT srb FROM sparams) - 1)) AS j)),
       |sebuck AS (
       |  SELECT doc_id, v, bb.b AS band,
       |    list_sum(list_transform(generate_series(1, sparams.srb),
       |      j -> CASE WHEN list_inner_product(vc, splanes.ws[bb.b * sparams.srb + j]) >= CAST(0.0 AS DOUBLE)
       |           THEN (CAST(1 AS BIGINT) << (j-1)) ELSE CAST(0 AS BIGINT) END)) AS bucket
       |  FROM semb, splanes, sparams, (SELECT unnest(generate_series(0, 15)) AS b) bb)""".stripMargin

  /** Batch fusion family's scopes: the distinct-text representatives —
    * exactly `Dedup.exactDedup(...)` on the Scala side (count for the band
    * width, membership for the centering mean). */
  private val semNScopeBatch = "SELECT count(DISTINCT md5(text)) FROM documents"
  private val semMuWhereBatch =
    "WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))"

  /** Streamed gate's scopes: the standing static corpus the index buckets. */
  private val semNScopeStream = "SELECT count(*) FROM documents WHERE doc_id % 10 <> 0"
  private val semMuWhereStream = "WHERE doc_id % 10 <> 0"

  private lazy val semanticAxisCtes: String =
    s"""${semEmbedCtes(semNScopeBatch, semMuWhereBatch)},
       |sepairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${frs("list_cosine_similarity(a.v, b.v)", 6)} AS score
       |  FROM sebuck a JOIN sebuck b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE list_sum(list_transform(a.v, x -> x*x)) > CAST(0.0 AS DOUBLE)
       |    AND list_sum(list_transform(b.v, x -> x*x)) > CAST(0.0 AS DOUBLE)),
       |sel AS (SELECT DISTINCT id_b FROM sepairs WHERE score >= CAST($SemCosThreshold AS DOUBLE))""".stripMargin

  /** fl + ver tail of the fusion chain, generated for any ordered axis
    * list — the SQL twin of Dedup.fuseVerdicts. Each axis name maps to its
    * loser-membership predicate over the CTEs the caller assembled.
    */
  private def fusionVerdictTail(axes: Seq[String]): String = {
    val flagSrc = Map(
      "exact" -> "d.doc_id IN (SELECT doc_id FROM exl)",
      "containment" -> "d.doc_id IN (SELECT id_b FROM cont WHERE containment >= CAST(0.6 AS DOUBLE))",
      "jaccard" -> s"d.doc_id IN (SELECT id_b FROM pairs WHERE jac >= $JaccardThreshold)",
      "semantic" -> "d.doc_id IN (SELECT id_b FROM sel)",
      "perceptual" -> "d.doc_id IN (SELECT id_b FROM pel)",
      "simhash" -> "d.doc_id IN (SELECT id_b FROM sp)")
    val flagCols = axes.map(a =>
      s"    CAST(CASE WHEN ${flagSrc(a)} THEN 1 ELSE 0 END AS BIGINT) AS f_$a")
      .mkString(",\n|")
    val flags = axes.map(a => s"f_$a")
    val reasons = axes.map(a => s"         WHEN f_$a = 1 THEN '$a'").mkString("\n|")
    s"""fl AS (
       |  SELECT d.doc_id,
       |$flagCols
       |  FROM documents d),
       |ver AS (
       |  SELECT doc_id, ${flags.mkString(", ")},
       |    CAST(CASE WHEN ${flags.mkString(" + ")} > 0
       |      THEN 1 ELSE 0 END AS BIGINT) AS drop_doc,
       |    CASE
       |$reasons
       |         ELSE 'keep' END AS reason
       |  FROM fl)""".stripMargin
  }

  private lazy val fusionVerdictCtes: String =
    s"""$fusionAxesCtes,
       |${fusionVerdictTail(Seq("exact", "containment", "jaccard", "simhash"))}""".stripMargin

  private lazy val crossModalVerdictCtes: String =
    s"""$fusionAxesCtes,
       |$semanticAxisCtes,
       |${fusionVerdictTail(Seq("exact", "containment", "jaccard", "semantic", "simhash"))}""".stripMargin

  /** The PERCEPTUAL axis over per-doc media renditions (id = doc_id, m =
    * simulated reused footage): group-keyed md5-hex fill — docs in the same
    * (source, doc_id % 25) group share footage (the q169 PerceptualTrailer
    * trick) — with 6 per-doc digit bytes, so BYTE-EXACT media dedup misses
    * every pair while dHash sits at hamming 0 within a group and ≥ 9
    * across (measured at sf0.01). The q159 dHash chain + 4×15-band
    * candidates, keep-first losers within `maxHamming`.
    */
  // single line: a leading `||` on a continuation line would be eaten by
  // the enclosing CTE string's stripMargin
  private[queries] val perceptualMediaSql: String =
    "substr(repeat(md5(source || '#' || CAST(doc_id % 25 AS VARCHAR)), 8), 1, 250) || lpad(CAST(doc_id % 100 AS VARCHAR), 6, '0')"
  private def perceptualAxisCtes(maxHamming: Int): String =
    s"""pmedia0 AS (SELECT doc_id AS id, $perceptualMediaSql AS m FROM documents),
       |${MultimodalQueries.dhashCtes.replace("FROM media", "FROM pmedia0")},
       |pbk AS (
       |  SELECT id, dhash, b, (dhash >> CAST(b * 15 AS INTEGER)) & 32767 AS chunk
       |  FROM dh, (SELECT unnest(generate_series(0, 3)) AS b)),
       |pcand AS (
       |  SELECT x.id AS id_a, y.id AS id_b, min(x.dhash) AS ha, min(y.dhash) AS hb
       |  FROM pbk x JOIN pbk y ON x.b = y.b AND x.chunk = y.chunk AND x.id < y.id
       |  GROUP BY 1, 2),
       |pel AS (
       |  SELECT DISTINCT id_b FROM pcand WHERE bit_count(xor(ha, hb)) <= $maxHamming)""".stripMargin

  /** The full six-axis stack: text × embedding × byte-perceptual. */
  private lazy val fullStackVerdictCtes: String =
    s"""$fusionAxesCtes,
       |$semanticAxisCtes,
       |${perceptualAxisCtes(maxHamming = 3)},
       |${fusionVerdictTail(Seq("exact", "containment", "jaccard", "semantic", "perceptual", "simhash"))}""".stripMargin

  /** The q217 six-axis verdict as a reusable relation — four text axes +
    * semantic (embedding space) + perceptual (each doc's media rendition,
    * the [[perceptualMediaSql]] reused-footage simulation) fused on the
    * doc_id spine. Shared by q217 and the q219 end-to-end chain so the
    * capstone curates under exactly the verdict the fusion queries audit.
    */
  /** The q212 five-axis cross-modal verdict as a standing artifact —
    * q212/q213/q216 all read ONE materialized relation instead of each
    * re-running the fusion chain (measured: the three queries were the
    * round-15 slow tail at 3.2/4.7/4.6 s). Name bakes every parameter.
    */
  /** The q251 multi-domain five-axis verdict as a standing artifact —
    * the partitioned capstone (q252) reads the same materialized relation
    * (the crossModalVerdictOf pattern; name bakes every parameter incl.
    * the partition column).
    */
  private def multiDomainVerdictOf(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.ArtifactStore.loadOrBuild(s,
      graft.pipeline.ArtifactStore.rootFor(dir,
        "multi_domain_verdict_s3_h32_b16_j05_c06_hm8_d64_bsrp16_c095_psource_v1")) {
      Dedup.crossModalVerdictPartitioned(Tables.documents(s, dir), "doc_id", "text",
        "source", shingleSize = 3, numHashes = 32, bands = 16,
        jacThreshold = JaccardThreshold, containThreshold = 0.6, maxHamming = 8,
        embDim = 64, cosThreshold = SemCosThreshold)
    }.orderBy("doc_id")

  private def crossModalVerdictOf(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.ArtifactStore.loadOrBuild(s,
      graft.pipeline.ArtifactStore.rootFor(dir,
        "cross_modal_verdict_s3_h32_b16_j05_c06_hm8_d64_bsrp16_c095_v3")) {
      Dedup.crossModalVerdict(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16,
        jacThreshold = JaccardThreshold, containThreshold = 0.6, maxHamming = 8,
        embDim = 64, nbits = 0, cosThreshold = SemCosThreshold)
    }.orderBy("doc_id")

  private[graft] def fullStackVerdictOf(s: SparkSession, dir: String): DataFrame =
    // standing artifact (the frame-index pattern): q217 AND the q219
    // capstone read one materialized verdict instead of re-running the
    // six-axis fusion chain per query; the name bakes every fusion
    // parameter, the store's fingerprint covers the fixture
    graft.pipeline.ArtifactStore.loadOrBuild(s,
      graft.pipeline.ArtifactStore.rootFor(dir,
        "full_stack_verdict_s3_h32_b16_j05_c06_hm8_d64_bsrp16_c095_pm3_v3")) {
      fullStackVerdictBuild(s, dir)
    }.orderBy("doc_id")

  private def fullStackVerdictBuild(s: SparkSession, dir: String): DataFrame = {
    val media = concat(
      substring(repeat(md5(concat(col("source"), lit("#"),
        (col("doc_id") % 25).cast("string"))), 8), 1, 250),
      lpad((col("doc_id") % 100).cast("string"), 6, "0"))
    // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"), media.as("__m")).cache()
    val text = Dedup.textAxisLosers(base, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16,
      jacThreshold = JaccardThreshold, containThreshold = 0.6, maxHamming = 8)
    val sem = Dedup.semanticAxisLosers(base, "doc_id", "text",
      embDim = 64, nbits = 0, cosThreshold = SemCosThreshold)
    // mediaDupLosers, not pairLosers(mediaDupPairs(...)): identical-footage
    // groups grow with the corpus, and the pair materialization is
    // quadratic in group size (ScaleStress r15: 23× shuffle at 10× docs);
    // the hash-collapsed loser set is keep-first-identical and linear
    val per = "perceptual" -> graft.multimodal.Multimodal.mediaDupLosers(
      base.select(col("doc_id"), col("__m").as("m")),
      "doc_id", "m", maxHamming = 3, flag = "f_perceptual")
    Dedup.fuseVerdicts(base, "doc_id", text.take(3) ++ Seq(sem, per) ++ text.drop(3))
  }

  /** SQL twin of [[Dedup.detectorAgreement]] for any axis list over a
    * verdict CTE chain ending in relation `ver` — shared by q216 and the
    * streamed-gate agreement q220 so the kappa arithmetic cannot drift.
    */
  private def kappaTailSql(axes: Seq[String], verName: String): String = {
    val pairs = for { i <- axes.indices; j <- (i + 1) until axes.size }
      yield (axes(i), axes(j))
    val sums = axes.map(a => s"CAST(sum(f_$a) AS BIGINT) AS s_$a").mkString(", ")
    val co = pairs.map { case (a, b) =>
      s"CAST(sum(f_$a * f_$b) AS BIGINT) AS s_${a}_$b" }.mkString(", ")
    val rows = pairs.map { case (a, b) =>
      s"SELECT '$a' AS axis_a, '$b' AS axis_b, s_$a AS n_a, s_$b AS n_b, s_${a}_$b AS n_both, n FROM tot"
    }.mkString(" UNION ALL ")
    val peNum = "n_a*n_b + (n - n_a)*(n - n_b)"
    val poNum = "n - n_a - n_b + 2*n_both"
    s"""tot AS (SELECT CAST(count(*) AS BIGINT) AS n, $sums, $co FROM $verName),
       |pr AS ($rows)
       |SELECT axis_a, axis_b, n_a, n_b, n_both,
       |  ${frs(s"CAST($poNum AS DOUBLE) / CAST(n AS DOUBLE)", 4)} AS po,
       |  ${frs(s"CAST($peNum AS DOUBLE) / CAST(n*n AS DOUBLE)", 4)} AS pe,
       |  CASE WHEN n*n = $peNum THEN NULL
       |       ELSE ${frs(s"CAST(($poNum)*n - ($peNum) AS DOUBLE) / CAST(n*n - ($peNum) AS DOUBLE)", 4)} END AS kappa
       |FROM pr ORDER BY axis_a, axis_b""".stripMargin
  }

  private val minhashLshOracle: String =
    s"""$minhashPairsCtes
       |SELECT id_a, id_b, jac FROM pairs
       |WHERE jac >= $JaccardThreshold ORDER BY 1, 2""".stripMargin

  /** Curation-chain CTEs (base → scored → gated → deduped → bad), shared by
    * the composite result check (q57) and the per-stage funnel (q106);
    * mirrors Curation.stages with the q57 fixture split. */
  private val curateCtes: String = {
    val repCase = "CASE WHEN r.total > 0 THEN CAST(1.0 AS DOUBLE) - CAST(r.nd AS DOUBLE) / CAST(r.total AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    val g5 = "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]"
    s"""base AS (
       |  SELECT doc_id, lang, source, text, string_split(text,' ') AS toks
       |  FROM documents WHERE doc_id % 20 <> 7),
       |rep AS (
       |  SELECT doc_id, greatest(len(toks)-2, 0) AS total,
       |    len(list_distinct(list_transform(
       |      generate_series(1, greatest(len(toks)-2, 0)),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS nd
       |  FROM base),
       |scored AS (
       |  SELECT b.doc_id, b.lang, b.source, b.text,
       |    ${frs(qualityExprSql, 4)} AS quality,
       |    ${frs(repCase, 4)} AS rep_ratio
       |  FROM base b JOIN rep r ON b.doc_id = r.doc_id),
       |gated AS (SELECT * FROM scored WHERE quality >= 0.5 AND rep_ratio <= 0.2),
       |deduped AS (
       |  SELECT * FROM gated
       |  WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY md5(text))),
       |btoks AS (SELECT string_split(text,' ') AS toks FROM documents WHERE doc_id % 20 = 7),
       |bs AS (
       |  SELECT DISTINCT unnest(list_transform(
       |    generate_series(1, greatest(len(toks)-4, 0)), $g5)) AS g
       |  FROM btoks),
       |ds AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(len(toks)-4, 0)), $g5)) AS g
       |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM deduped)),
       |bad AS (SELECT DISTINCT ds.doc_id FROM ds JOIN bs USING (g))""".stripMargin
  }

  /** The q57 stratified-sampling predicate (en 80%, default 60%). */
  private val curateSampleCond: String =
    s"""${graft.operators.Sampling.hashBucketSql("doc_id")} <
       |    CASE WHEN lang = 'en' THEN 80 ELSE 60 END""".stripMargin

  /** Incremental-dedup oracle — shared verbatim by the batch (q99) and
    * streaming (q102) forms: delta docs (id % 10 = 0) survive unless a
    * corpus doc (any id order) or an earlier delta doc near-duplicates them.
    */
  private val deltaDedupOracle: String =
    s"""$minhashBkCtes,
       |cand AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.band_key = y.band_key
       |  WHERE y.doc_id % 10 = 0 AND x.doc_id <> y.doc_id
       |    AND (x.doc_id % 10 <> 0 OR x.doc_id < y.doc_id)
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b, ${frs(jacExpr, 4)} AS jac
       |  FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
       |            JOIN sh sb ON cand.id_b = sb.doc_id)
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id % 10 = 0
       |  AND doc_id NOT IN (SELECT id_b FROM pairs WHERE jac >= $JaccardThreshold)
       |ORDER BY doc_id""".stripMargin

  private val dedupCorpusLshOracle: String =
    s"""$minhashPairsCtes
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id NOT IN (SELECT id_b FROM pairs WHERE jac >= $JaccardThreshold)
       |ORDER BY doc_id""".stripMargin

  /** SimHashPoly mirror: 60 parity-voted bits per doc, 4×15-bit band buckets,
    * hamming ≤ maxHamming. Matches Dedup.simhashPairs.
    */
  private def simhashOracle(maxHamming: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, length(w)),
       |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % $HP) AS h
       |  FROM tok),
       |v AS (
       |  SELECT doc_id, j,
       |    sum(CASE WHEN (${affineSql("h", "j")}) % 2 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM th, (SELECT unnest(generate_series(0, 59)) AS j)
       |  GROUP BY 1, 2),
       |sim AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS sim
       |  FROM v GROUP BY 1),
       |bk AS (
       |  SELECT doc_id, sim, b, (sim >> CAST(b * 15 AS INTEGER)) & 32767 AS chunk
       |  FROM sim, (SELECT unnest(generate_series(0, 3)) AS b)),
       |cand AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |    min(x.sim) AS sim_a, min(y.sim) AS sim_b
       |  FROM bk x JOIN bk y
       |    ON x.b = y.b AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= $maxHamming
       |ORDER BY 1, 2""".stripMargin

  /** The exact O(n²) pair-join (q22) runs on a fixed doc_id sample so its cost
    * is scale-invariant — it exists as the oracle anchor / exact verifier.
    * The LSH variants (q22b/q22c) cover the full corpus at every scale.
    */
  val ExactPairSample = 500

  /** Shared recursive-CTE prefix: exact-Jaccard near-dup pairs on the fixed
    * sample → undirected edges → transitive closure (`reach`). q60 derives
    * min-label components from it; q119 additionally picks a representative
    * per component.
    */
  private lazy val clusterCtes: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(toks)-2, 0)),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents
       |        WHERE doc_id < $ExactPairSample)),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(a.s) > 0 AND len(b.s) > 0
       |    AND ${frs("""CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)""".stripMargin, 4)} >= $JaccardThreshold),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM p
       |  UNION SELECT id_b, id_a FROM p),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)""".stripMargin

  /** PageRank CTE chain over an `edges(src, dst)` CTE defined upstream:
    * nodes, degree, uniform r0, then `iters` unrolled power iterations —
    * mirrors [[graft.operators.Graph.pageRank]] (damping 0.85, teleport
    * 0.15, every node with out-degree ≥ 1). Used by q144 (LSH graph) and
    * q145 (capped exact-pair graph).
    */
  private def pageRankCtes(iters: Int): String = {
    val stages = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS id,
         |    CAST(0.15 AS DOUBLE) / any_value(nn.n)
         |      + CAST(0.85 AS DOUBLE) * sum(r.r / CAST(d.deg AS DOUBLE)) AS r
         |  FROM edges e JOIN r${i - 1} r ON r.id = e.src
         |               JOIN deg d ON d.id = e.src, nn
         |  GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""prnodes AS (SELECT DISTINCT src AS id FROM edges),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM prnodes),
       |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS r FROM prnodes, nn),
       |$stages"""
  }

  /** Brute-force exact-Jaccard pair oracle; `capped` restricts to the fixed
    * q22 sample, uncapped verifies full-corpus algorithms (q125).
    */
  private def jaccardPairsOracle(capped: Boolean): String = {
    val jacExpr = """CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)""".stripMargin
    val capSql = if (capped) s"\n       |        WHERE doc_id < $ExactPairSample" else ""
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(toks)-2, 0)),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents$capSql))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  ${frs(jacExpr, 4)} AS jac
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(a.s) > 0 AND len(b.s) > 0
       |  AND ${frs(jacExpr, 4)} >= $JaccardThreshold
       |ORDER BY 1, 2""".stripMargin
  }

  private lazy val jaccardOracle: String = jaccardPairsOracle(capped = true)

  /** Exact-substring span pipeline as a CTE chain ending in `{prefix}spans`
    * (doc_id, span_start, span_len) — mirrors [[Dedup.exactSubstrSpans]]
    * (`anchored = false`: consecutive-position islands) or
    * [[Dedup.anchorSubstrSpans]] (`anchored = true`: content-defined
    * 8-char-fingerprint anchors, running-max interval merge). Shared by
    * q149, q154 and the q155 coverage audit, which embeds BOTH chains.
    */
  /** The content-defined anchor predicate's hash terms — CAST the
    * coefficients: 31^5 fits INT32, so DuckDB would otherwise multiply in
    * 32-bit and overflow on ascii * 31^5. Shared by q154/q155/q157.
    */
  private val anchorTermsSql: String = (0 until 8).map(j =>
    s"ascii(substr(text, CAST(i AS BIGINT) + $j, 1)) * CAST(${math.pow(31.0, j).toLong} AS BIGINT)")
    .mkString(" + ")

  /** Anchored-window island merge from a `{prefix}marked (doc_id, pos)`
    * relation to `{prefix}spans` — the running-max interval union of
    * [[graft.operators.Dedup.mergeWindowIntervals]]. Shared by the q154 and
    * q157 oracles.
    */
  private def anchorSpanTail(p: String): String =
    s"""${p}isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN max(pos + 50) OVER pw IS NULL OR pos > max(pos + 50) OVER pw
       |         THEN 1 ELSE 0 END AS nw
       |  FROM ${p}marked
       |  WINDOW pw AS (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |${p}grp AS (
       |  SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |  FROM ${p}isl),
       |${p}spans AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos + 50) - min(pos) AS span_len
       |  FROM ${p}grp GROUP BY doc_id, g)"""

  private def substrSpanCtes(anchored: Boolean, prefix: String = ""): String = {
    val p = prefix
    val anchorTerms = anchorTermsSql
    val anchorFilter =
      if (anchored) s"\n       |  WHERE (($anchorTerms) % 1000000007) % 8 = 0".stripMargin
      else ""
    val spanTail =
      if (!anchored)
        s"""${p}islands AS (
           |  SELECT doc_id, pos,
           |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
           |  FROM ${p}marked),
           |${p}spans AS (
           |  SELECT doc_id, min(pos) AS span_start, max(pos) - min(pos) + 50 AS span_len
           |  FROM ${p}islands GROUP BY doc_id, g)"""
      else anchorSpanTail(p)
    s"""${p}d AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $ExactPairSample),
       |${p}w AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(text, CAST(i AS BIGINT), 50) AS win
       |  FROM ${p}d, UNNEST(range(1, greatest(length(text) - 49, 0) + 1)) AS t(i)$anchorFilter),
       |${p}dup AS (
       |  SELECT win FROM ${p}w GROUP BY win HAVING count(DISTINCT doc_id) >= 2),
       |${p}marked AS (
       |  SELECT w.doc_id, w.pos FROM ${p}w w JOIN ${p}dup USING (win)),
       |$spanTail""".stripMargin
  }

  /** Shared oracle CTE prefix of the semantic recall audits (q245/q245b):
    * distinct-text reps → bucket-count embeddings → corpus-floored-mean
    * centering → banded SRP buckets → candidate pairs → exact-cosine
    * verified losers (`bsel`). The audits differ only in their TRUTH side
    * (all-pairs vs sampled probes) and the report row.
    */
  private lazy val semRecallCtePrefix: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, length(w)),
       |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
       |  FROM tok),
       |scv AS (SELECT doc_id, h % 64 AS bucket, count(*) AS n FROM th GROUP BY 1, 2),
       |qreps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |sdense AS (
       |  SELECT d.doc_id, g.i, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM qreps d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
       |  LEFT JOIN scv c ON c.doc_id = d.doc_id AND c.bucket = g.i),
       |rmu AS (
       |  SELECT i, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
       |  FROM sdense GROUP BY i),
       |rv AS (
       |  SELECT s.doc_id, list(CAST(x AS DOUBLE) ORDER BY s.i) AS v,
       |    list(CAST(x - m AS DOUBLE) ORDER BY s.i) AS vc
       |  FROM sdense s JOIN rmu ON rmu.i = s.i GROUP BY s.doc_id),
       |sparams AS (
       |  SELECT greatest(4, coalesce((
       |    SELECT min(b) FROM (SELECT unnest(generate_series(0, 30)) AS b) bs
       |    WHERE (CAST(16 AS BIGINT) << CAST(b AS INTEGER)) >= (SELECT count(*) FROM qreps)), 30)) AS srb),
       |splanes AS (
       |  SELECT list(list_transform(generate_series(0, 63), d ->
       |      CAST(((j*64+d+1)*(j*64+d+1) * 2654435761 + 97*(j*64+d+1) + 12345) % 1000003
       |        - 501001 AS DOUBLE)) ORDER BY j) AS ws
       |  FROM (SELECT unnest(generate_series(0, 16 * (SELECT srb FROM sparams) - 1)) AS j)),
       |sbuck AS (
       |  SELECT doc_id, v, bb.b AS band,
       |    list_sum(list_transform(generate_series(1, sparams.srb),
       |      j -> CASE WHEN list_inner_product(vc, splanes.ws[bb.b * sparams.srb + j]) >= CAST(0.0 AS DOUBLE)
       |           THEN (CAST(1 AS BIGINT) << (j-1)) ELSE CAST(0 AS BIGINT) END)) AS bucket
       |  FROM rv, splanes, sparams, (SELECT unnest(generate_series(0, 15)) AS b) bb),
       |cpair AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sbuck a JOIN sbuck b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |bsel AS (
       |  SELECT DISTINCT p.id_b FROM cpair p
       |  JOIN rv x ON x.doc_id = p.id_a JOIN rv y ON y.doc_id = p.id_b
       |  WHERE list_sum(list_transform(x.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
       |    AND list_sum(list_transform(y.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
       |    AND ${frs("list_cosine_similarity(x.v, y.v)", 6)} >= CAST($SemCosThreshold AS DOUBLE))""".stripMargin


  /** q243's full oracle — the trained-cell semantic dedup chain mirrored
    * in SQL (training, assignment, integer cell means, band buckets,
    * verify). Shared VERBATIM by the batch entry (q243) and its streamed
    * twin (q250): one truth, two execution topologies.
    */
  /** WITH-prefix of the q243 trained-cell chain (tokens → embeddings →
    * k-means training → assignment → per-cell floored means → cell-scoped
    * band buckets `sbuck`) — shared by the dedup oracle (q243/q250) and
    * the band-index erasure-repair rebuild (q253).
    */
  private def semCellChainCtes(stratifiedInit: Boolean = false,
                               kSql: String = "16"): String = {
    val kinit =
      if (!stratifiedInit)
        s"""kinit AS (
           |  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS ci, v AS cv
           |  FROM rv ORDER BY doc_id LIMIT $kSql)""".stripMargin
      else
        s"""khash AS (
           |  SELECT r.doc_id, CAST(${graft.operators.Export.hex4ValSql("md5(d.text)")} AS BIGINT) AS hh
           |  FROM qreps r JOIN documents d USING (doc_id)),
           |kinit AS (
           |  SELECT row_number() OVER (ORDER BY kh.hh, rv.doc_id) - 1 AS ci, rv.v AS cv
           |  FROM rv JOIN khash kh ON kh.doc_id = rv.doc_id
           |  ORDER BY kh.hh, rv.doc_id LIMIT $kSql)""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, length(w)),
       |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
       |  FROM tok),
       |scv AS (SELECT doc_id, h % 64 AS bucket, count(*) AS n FROM th GROUP BY 1, 2),
       |sdense AS (
       |  SELECT d.doc_id, g.i, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM (SELECT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
       |  LEFT JOIN scv c ON c.doc_id = d.doc_id AND c.bucket = g.i),
       |semb AS (SELECT doc_id, list(CAST(x AS DOUBLE) ORDER BY i) AS v
       |         FROM sdense GROUP BY doc_id),
       |qreps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |rv AS (SELECT s.doc_id, s.v FROM semb s JOIN qreps USING (doc_id)),
       |$kinit,
       |ka AS (
       |  SELECT doc_id, v, cell FROM (
       |    SELECT r.doc_id, r.v, k.ci AS cell,
       |      row_number() OVER (PARTITION BY r.doc_id
       |        ORDER BY k.c2 - CAST(2.0 AS DOUBLE) * list_inner_product(r.v, k.cv), k.ci) AS rn
       |    FROM rv r CROSS JOIN (
       |      SELECT ci, cv,
       |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(cv, x -> x*x)), (a, x) -> a + x) AS c2
       |      FROM kinit) k)
       |  WHERE rn = 1),
       |km AS (
       |  SELECT cell, pos, ${frs("avg(comp)", 9)} AS mc
       |  FROM (SELECT cell, unnest(v) AS comp, generate_subscripts(v, 1) AS pos FROM ka)
       |  GROUP BY cell, pos),
       |cents AS (
       |  SELECT i.ci, coalesce(m.ms, i.cv) AS cv,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(coalesce(m.ms, i.cv), x -> x*x)), (a, x) -> a + x) AS c2
       |  FROM kinit i LEFT JOIN (
       |    SELECT cell, list(mc ORDER BY pos) AS ms FROM km GROUP BY cell) m
       |  ON m.cell = i.ci),
       |asg AS (
       |  SELECT doc_id, cell FROM (
       |    SELECT r.doc_id, c.ci AS cell,
       |      row_number() OVER (PARTITION BY r.doc_id
       |        ORDER BY c.c2 - CAST(2.0 AS DOUBLE) * list_inner_product(r.v, c.cv), c.ci) AS rn
       |    FROM rv r CROSS JOIN cents c)
       |  WHERE rn = 1),
       |cmu AS (
       |  SELECT a.cell, s.i,
       |    CAST(sum(s.x) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
       |  FROM sdense s JOIN asg a USING (doc_id) GROUP BY 1, 2),
       |sparams AS (
       |  SELECT greatest(4, coalesce((
       |    SELECT min(b) FROM (SELECT unnest(generate_series(0, 30)) AS b) bs
       |    WHERE (CAST(16 AS BIGINT) << CAST(b AS INTEGER)) >= (SELECT count(*) FROM qreps)), 30)) AS srb),
       |splanes AS (
       |  SELECT list(list_transform(generate_series(0, 63), d ->
       |      CAST(((j*64+d+1)*(j*64+d+1) * 2654435761 + 97*(j*64+d+1) + 12345) % 1000003
       |        - 501001 AS DOUBLE)) ORDER BY j) AS ws
       |  FROM (SELECT unnest(generate_series(0, 16 * (SELECT srb FROM sparams) - 1)) AS j)),
       |cvec AS (
       |  SELECT s.doc_id, a.cell, list(CAST(s.x - c.m AS DOUBLE) ORDER BY s.i) AS vc
       |  FROM sdense s JOIN asg a USING (doc_id)
       |    JOIN cmu c ON c.cell = a.cell AND c.i = s.i
       |  GROUP BY s.doc_id, a.cell),
       |sbuck AS (
       |  SELECT doc_id, cell, bb.b AS band,
       |    list_sum(list_transform(generate_series(1, sparams.srb),
       |      j -> CASE WHEN list_inner_product(vc, splanes.ws[bb.b * sparams.srb + j]) >= CAST(0.0 AS DOUBLE)
       |           THEN (CAST(1 AS BIGINT) << (j-1)) ELSE CAST(0 AS BIGINT) END)) AS bucket
       |  FROM cvec, splanes, sparams, (SELECT unnest(generate_series(0, 15)) AS b) bb)""".stripMargin
  }

  private def semCellDedupOracleOf(stratifiedInit: Boolean,
                                   kSql: String = "16"): String =
    s"""${semCellChainCtes(stratifiedInit, kSql)},
       |cpair AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sbuck a JOIN sbuck b
       |    ON a.cell = b.cell AND a.band = b.band AND a.bucket = b.bucket
       |      AND a.doc_id < b.doc_id),
       |cscore AS (
       |  SELECT p.id_a, p.id_b,
       |    ${frs("list_cosine_similarity(x.v, y.v)", 6)} AS score
       |  FROM cpair p JOIN rv x ON x.doc_id = p.id_a JOIN rv y ON y.doc_id = p.id_b
       |  WHERE list_sum(list_transform(x.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
       |    AND list_sum(list_transform(y.v, e -> e*e)) > CAST(0.0 AS DOUBLE)),
       |csel AS (SELECT DISTINCT id_b FROM cscore WHERE score >= CAST($SemCosThreshold AS DOUBLE)),
       |dupz AS (
       |  SELECT s.doc_id FROM semb s
       |  WHERE s.doc_id NOT IN (SELECT doc_id FROM qreps)
       |    AND list_sum(list_transform(s.v, e -> e*e)) > CAST(0.0 AS DOUBLE))
       |SELECT d.doc_id,
       |  CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM csel)
       |         OR d.doc_id IN (SELECT doc_id FROM dupz) THEN 1 ELSE 0 END AS BIGINT) AS f_semantic
       |FROM documents d ORDER BY doc_id""".stripMargin

  private lazy val semCellDedupOracle: String = semCellDedupOracleOf(false)

  /** The PARTITION-SCOPED semantic axis CTEs (q244's machinery): reps per
    * (source, text), per-SOURCE floored-mean centering, banded candidates
    * within the source, exact RAW-cosine verify; `sel` = verified losers ∪
    * nonzero non-reps (the dup-inheritance rule). Requires `tok`/`th`
    * upstream (q244 supplies its own; the multi-domain verdict reuses
    * fusionAxesCtes'). Shared verbatim by q244, q251 and q252.
    */
  private lazy val semPartitionAxisCtes: String =
    s"""scv AS (SELECT doc_id, h % 64 AS bucket, count(*) AS n FROM th GROUP BY 1, 2),
       |sdense AS (
       |  SELECT d.doc_id, g.i, CAST(coalesce(c.n, 0) AS BIGINT) AS x
       |  FROM (SELECT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
       |  LEFT JOIN scv c ON c.doc_id = d.doc_id AND c.bucket = g.i),
       |semb AS (SELECT doc_id, list(CAST(x AS DOUBLE) ORDER BY i) AS v
       |         FROM sdense GROUP BY doc_id),
       |qreps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY source, md5(text)),
       |asg AS (SELECT r.doc_id, d.source AS cell
       |        FROM qreps r JOIN documents d USING (doc_id)),
       |rv AS (SELECT s.doc_id, s.v FROM semb s JOIN qreps USING (doc_id)),
       |cmu AS (
       |  SELECT a.cell, s.i,
       |    CAST(sum(s.x) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
       |  FROM sdense s JOIN asg a USING (doc_id) GROUP BY 1, 2),
       |sparams AS (
       |  SELECT greatest(4, coalesce((
       |    SELECT min(b) FROM (SELECT unnest(generate_series(0, 30)) AS b) bs
       |    WHERE (CAST(16 AS BIGINT) << CAST(b AS INTEGER)) >= (SELECT count(*) FROM qreps)), 30)) AS srb),
       |splanes AS (
       |  SELECT list(list_transform(generate_series(0, 63), d ->
       |      CAST(((j*64+d+1)*(j*64+d+1) * 2654435761 + 97*(j*64+d+1) + 12345) % 1000003
       |        - 501001 AS DOUBLE)) ORDER BY j) AS ws
       |  FROM (SELECT unnest(generate_series(0, 16 * (SELECT srb FROM sparams) - 1)) AS j)),
       |cvec AS (
       |  SELECT s.doc_id, a.cell, list(CAST(s.x - c.m AS DOUBLE) ORDER BY s.i) AS vc
       |  FROM sdense s JOIN asg a USING (doc_id)
       |    JOIN cmu c ON c.cell = a.cell AND c.i = s.i
       |  GROUP BY s.doc_id, a.cell),
       |sbuck AS (
       |  SELECT doc_id, cell, bb.b AS band,
       |    list_sum(list_transform(generate_series(1, sparams.srb),
       |      j -> CASE WHEN list_inner_product(vc, splanes.ws[bb.b * sparams.srb + j]) >= CAST(0.0 AS DOUBLE)
       |           THEN (CAST(1 AS BIGINT) << (j-1)) ELSE CAST(0 AS BIGINT) END)) AS bucket
       |  FROM cvec, splanes, sparams, (SELECT unnest(generate_series(0, 15)) AS b) bb),
       |cpair AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sbuck a JOIN sbuck b
       |    ON a.cell = b.cell AND a.band = b.band AND a.bucket = b.bucket
       |      AND a.doc_id < b.doc_id),
       |cscore AS (
       |  SELECT p.id_a, p.id_b,
       |    ${frs("list_cosine_similarity(x.v, y.v)", 6)} AS score
       |  FROM cpair p JOIN rv x ON x.doc_id = p.id_a JOIN rv y ON y.doc_id = p.id_b
       |  WHERE list_sum(list_transform(x.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
       |    AND list_sum(list_transform(y.v, e -> e*e)) > CAST(0.0 AS DOUBLE)),
       |csel AS (SELECT DISTINCT id_b FROM cscore WHERE score >= CAST($SemCosThreshold AS DOUBLE)),
       |dupz AS (
       |  SELECT s.doc_id FROM semb s
       |  WHERE s.doc_id NOT IN (SELECT doc_id FROM qreps)
       |    AND list_sum(list_transform(s.v, e -> e*e)) > CAST(0.0 AS DOUBLE)),
       |sel AS (SELECT id_b FROM csel UNION SELECT doc_id AS id_b FROM dupz)""".stripMargin


  /** The q219 curate→mix→pack chain tail in SQL — keeps of `ver` →
    * temperature-mix quotas → hash-ranked takeQuota → 128-token packing
    * manifest. Generated once; q219 (six-axis verdict) and q252 (the
    * multi-domain partitioned verdict) splice their own verdict CTEs in
    * front, so the chain arithmetic cannot drift between capstones.
    */
  private lazy val curateMixPackTailSql: String =
    s"""keeps AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d JOIN ver v ON d.doc_id = v.doc_id
       |  WHERE v.drop_doc = 0),
       |ksrc AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM keeps GROUP BY source),
       |ks2 AS (
       |  SELECT source, n,
       |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
       |  FROM ksrc WHERE n > 0),
       |kt AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM ks2),
       |kb AS (
       |  SELECT source, n,
       |    CAST(100 * w AS DOUBLE) / CAST(tw AS DOUBLE) AS ideal
       |  FROM ks2 CROSS JOIN kt),
       |kc AS (
       |  SELECT source, n, CAST(floor(ideal) AS BIGINT) AS base,
       |    ideal - floor(ideal) AS frac
       |  FROM kb),
       |kd AS (SELECT CAST(100 - sum(base) AS BIGINT) AS deficit FROM kc),
       |kr AS (
       |  SELECT source, base,
       |    row_number() OVER (ORDER BY frac DESC, source) AS rk
       |  FROM kc),
       |kq AS (
       |  SELECT source,
       |    CAST(base + (CASE WHEN rk <= deficit THEN 1 ELSE 0 END) AS BIGINT) AS quota
       |  FROM kr CROSS JOIN kd),
       |krnk AS (
       |  SELECT doc_id, text, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ${graft.operators.Sampling.hashShardSql("doc_id", 1000003)}, doc_id) AS rk
       |  FROM keeps),
       |ksample AS (
       |  SELECT krnk.doc_id, krnk.text
       |  FROM krnk JOIN kq USING (source) WHERE krnk.rk <= kq.quota),
       |ktc AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM ksample),
       |kcs AS (
       |  SELECT doc_id, n_tok,
       |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM ktc),
       |kdo AS (
       |  SELECT doc_id, n_tok, cum - n_tok AS start_off, cum - 1 AS end_off FROM kcs),
       |kspans AS (
       |  SELECT doc_id, start_off, end_off,
       |    unnest(generate_series(start_off // 128, end_off // 128)) AS seq_id
       |  FROM kdo)
       |SELECT seq_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN start_off >= seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
       |  CAST(sum(least(end_off, (seq_id + 1) * 128 - 1)
       |    - greatest(start_off, seq_id * 128) + 1) AS BIGINT) AS n_tokens,
       |  ${frs("CAST(sum(least(end_off, (seq_id + 1) * 128 - 1) - greatest(start_off, seq_id * 128) + 1) AS DOUBLE) / CAST(128.0 AS DOUBLE)", 4)} AS fill
       |FROM kspans GROUP BY 1 ORDER BY 1""".stripMargin

  def all: ListMap[String, Q] = ListMap(
    "q16_doc_stats" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            fr(avg("n_chars"), 2).as("avg_chars"))
          .orderBy("lang", "source")
      },
      Some(s"""SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  ${frs("avg(n_chars)", 2)} AS avg_chars
             |FROM documents GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    "q17_dedup_exact" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
          .orderBy("text_md5")
      },
      Some("""SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS keep_id
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // NORMALIZATION-aware exact dedup: q17 keyed on md5 of the Unicode NFC
    // form (UAX #15, the codegen'd NfcNormalize kernel) over a corpus where
    // every document exists in two canonically-equivalent, byte-DISTINCT
    // renditions — one ending precomposed (U+00E9), one with a combining
    // acute (e + U+0301). Byte-exact dedup keeps all renditions apart
    // (n_byte_distinct = 2 per group); NFC-keyed dedup merges exactly the
    // equivalent pairs — checked against DuckDB's own UAX #15 implementation
    // (nfc_normalize), so the cross-engine equivalence of the normal forms
    // is itself part of the oracle check.
    "q190_nfc_dedup" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select((col("doc_id") * 2).as("rid"),
            concat(col("text"), lit(" caf\u00e9")).as("t")) // precomposed
          .unionByName(d.select((col("doc_id") * 2 + 1).as("rid"),
            concat(col("text"), lit(" cafe\u0301")).as("t"))) // combining
        corpus.groupBy(md5(graft.functions.TextFunctions.nfc(col("t"))).as("norm_hash"))
          .agg(count(lit(1)).as("n_renditions"),
            countDistinct(md5(col("t"))).as("n_byte_distinct"),
            min("rid").as("keep_rid"))
          .orderBy("norm_hash")
      },
      Some("""WITH r AS (
             |  SELECT doc_id * 2 AS rid, text || ' caf' || chr(233) AS t FROM documents
             |  UNION ALL
             |  SELECT doc_id * 2 + 1, text || ' cafe' || chr(769) FROM documents)
             |SELECT md5(nfc_normalize(t)) AS norm_hash,
             |  count(*) AS n_renditions,
             |  CAST(count(DISTINCT md5(t)) AS BIGINT) AS n_byte_distinct,
             |  min(rid) AS keep_rid
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q18_token_count" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tokens"),
            subwordCount(col("text")).cast("long").as("n_subwords"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(text,' '),
             |      w -> CAST(greatest(1, CAST(ceil(length(w) / CAST(4.0 AS DOUBLE)) AS INTEGER)) AS BIGINT))),
             |    (acc, x) -> acc + x) AS n_subwords
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // BPE token counts — the reference's actual token model (tiktoken length
    // guard), oracle-checked against a recursive-CTE DuckDB merge loop whose
    // merge table is generated from the Scala tokenizer (see [[bpeOracle]]).
    // The BPE engine itself is additionally property-tested (lossless
    // round-trip, determinism, merge monotonicity).
    "q18b_bpe_token_count" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(bpeOracle)),

    "q19_lang_id" -> Q(
      (s, dir) => {
        // stage the token array once: 20 marker probes over raw text would
        // re-split it 20x per row
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("__toks"))
        val scores = langMarkers.map { case (lang, ms) =>
          langScoreIn(col("__toks"), ms).cast("long").as(s"s_$lang")
        }
        d.select(Seq(col("doc_id"), langIdIn(col("__toks")).as("lang_guess")) ++ scores: _*)
          .orderBy("doc_id")
      },
      Some(langIdOracle)),

    "q20_quality_score" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), fr(qualityScore(col("text")), 4).as("quality"))
          .orderBy("doc_id")
      },
      Some(qualityOracle)),

    "q21_fingerprint" -> Q(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            fingerprintMd5(col("text")).as("fp16"),
            rollingHash(col("text")).as("roll_hash"))
          .orderBy("doc_id")
      },
      Some(rollHashOracle)),

    "q22_trigram_jaccard" -> Q(
      (s, dir) => Dedup.jaccardPairsExact(
        Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample), "doc_id", "text",
        shingleSize = 3, threshold = JaccardThreshold),
      Some(jaccardOracle)),

    // Scale path: MinHash-LSH candidate generation (banding join, no O(n^2)
    // pair enumeration). The PolyHash family makes the ENTIRE pipeline —
    // candidates included — oracle-checkable: the SQL re-derives token
    // hashes, shingle folds, affine min-hashes, band keys, the candidate
    // join, and the Jaccard verify, token for token.
    "q22b_minhash_lsh_pairs" -> Q(
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16, threshold = JaccardThreshold),
      Some(minhashLshOracle)),

    // Containment near-dup (Broder's asymmetric measure): |A∩B|/min(|A|,|B|)
    // over the same banded candidates — catches a short doc embedded in a
    // long one where symmetric Jaccard stays low.
    "q81_containment_pairs" -> Q(
      (s, dir) => Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.6),
      Some(s"""$minhashPairsCtes
             |SELECT id_a, id_b, containment FROM (
             |  SELECT id_a, id_b,
             |    ${frs("CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / CAST(least(len(sa.s), len(sb.s)) AS DOUBLE)", 4)} AS containment
             |  FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
             |            JOIN sh sb ON cand.id_b = sb.doc_id)
             |WHERE containment >= CAST(0.6 AS DOUBLE) ORDER BY 1, 2""".stripMargin)),

    // Deterministic stratified sampling: language-dependent keep rates via a
    // SQL-expressible multiplicative hash (reproducible, shuffle-free).
    "q53_stratified_sample" -> Q(
      (s, dir) => graft.operators.Sampling.stratifiedSample(
          Tables.documents(s, dir), "doc_id", "lang",
          ratePercent = Map("en" -> 50, "de" -> 20), defaultPercent = 10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, source FROM documents
             |WHERE ${graft.operators.Sampling.hashBucketSql("doc_id")} <
             |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 20 ELSE 10 END
             |ORDER BY doc_id""".stripMargin)),

    // Pivot: doc counts by source × language (fixed pivot values => stable
    // schema; empty cells coalesced to 0 to match the CASE-count oracle).
    "q50_pivot_lang" -> Q(
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val p = Tables.documents(s, dir)
          .groupBy("source")
          .pivot("lang", langs)
          .agg(count(lit(1)))
        p.select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
          .orderBy("source")
      },
      Some("""SELECT source,
             |  count(CASE WHEN lang = 'de' THEN 1 END) AS de,
             |  count(CASE WHEN lang = 'en' THEN 1 END) AS en,
             |  count(CASE WHEN lang = 'es' THEN 1 END) AS es,
             |  count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
             |  count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Corpus TF-IDF: top-5 terms per language by tf·ln(N/df). Exact integer
    // tf/df/N feed identical double math in both engines => floorRound-stable.
    "q41_tfidf_top_terms" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs  = Tables.documents(s, dir)
        val terms = docs.select(col("lang"), col("doc_id"), explode(tokens(col("text"))).as("term"))
        val tf    = terms.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
        val df_   = terms.distinct().groupBy("lang", "term").agg(count(lit(1)).as("df"))
        val nDocs = docs.groupBy("lang").agg(countDistinct("doc_id").as("n_docs"))
        val scored = tf.join(df_, Seq("lang", "term")).join(broadcast(nDocs), Seq("lang"))
          .withColumn("score", fr(col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")), 6))
        val w = Window.partitionBy("lang").orderBy(desc("score"), col("term"))
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select("lang", "term", "tf", "df", "score", "rn")
          .orderBy("lang", "rn")
      },
      Some(s"""WITH terms AS (
             |  SELECT lang, doc_id, unnest(string_split(text,' ')) AS term FROM documents),
             |tf AS (SELECT lang, term, count(*) AS tf FROM terms GROUP BY 1,2),
             |df AS (SELECT lang, term, count(*) AS df
             |       FROM (SELECT DISTINCT lang, doc_id, term FROM terms) GROUP BY 1,2),
             |nd AS (SELECT lang, count(DISTINCT doc_id) AS n_docs FROM documents GROUP BY 1),
             |scored AS (
             |  SELECT tf.lang, tf.term, tf.tf, df.df,
             |    ${frs("CAST(tf.tf AS DOUBLE) * ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))", 6)} AS score
             |  FROM tf JOIN df ON tf.lang = df.lang AND tf.term = df.term
             |  JOIN nd ON tf.lang = nd.lang)
             |SELECT lang, term, tf, df, score, rn FROM (
             |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rn
             |  FROM scored)
             |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin)),

    // Chunking — the reference's acknowledged TODO (main.py:177): long docs
    // become overlapping 64-token windows (stride 48). Map-only explode.
    "q38_chunk_documents" -> Q(
      (s, dir) => graft.operators.Chunker.chunk(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 64, overlap = 16).orderBy("doc_id", "chunk_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |c AS (SELECT doc_id, toks,
             |  unnest(generate_series(0,
             |    CAST(floor((greatest(0, len(toks)-64) + 47) / CAST(48 AS DOUBLE)) AS BIGINT))) AS chunk_id
             |  FROM t)
             |SELECT doc_id, chunk_id,
             |  array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text,
             |  CAST(len(toks[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // Corpus-level dedup: documents surviving greedy keep-first near-dup
    // removal. Exact-pair semantics on the fixed sample => oracle-checkable.
    "q44_dedup_corpus" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample)
        Dedup.keepFirst(docs, "doc_id",
            Dedup.jaccardPairsExact(docs, "doc_id", "text", 3, JaccardThreshold))
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    generate_series(1, greatest(len(toks)-2, 0)),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
             |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents
             |        WHERE doc_id < $ExactPairSample)),
             |dups AS (
             |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(a.s) > 0 AND len(b.s) > 0
             |  AND ${frs("""CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)""".stripMargin, 4)} >= $JaccardThreshold)
             |SELECT doc_id, lang, source, n_chars FROM documents
             |WHERE doc_id < $ExactPairSample AND doc_id NOT IN (SELECT doc_id FROM dups)
             |ORDER BY doc_id""".stripMargin)),

    // Full-corpus LSH variant of the same policy — oracle re-derives the full
    // MinHash pipeline then anti-joins the higher-id pair members (recall
    // bounded by the banding scheme, exact policy verified by q44).
    "q45_dedup_corpus_lsh" -> Q(
      (s, dir) => Dedup.dropNearDuplicates(Tables.documents(s, dir), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16, threshold = JaccardThreshold)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some(dedupCorpusLshOracle)),

    // SimHash near-dup: 60-bit parity-voted signature; pairs within hamming
    // distance 8 via band-bucket candidates (4x15-bit bands => guaranteed
    // recall for d<=3, heuristic beyond). Oracle-checked via SimHashPoly.
    "q22c_simhash_pairs" -> Q(
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 8),
      Some(simhashOracle(maxHamming = 8))),

    // Near-dup clusters: connected components over the exact-pair graph of
    // the fixed 500-doc sample (min-label propagation, checkpointed). The
    // oracle computes the same components via a recursive-CTE transitive
    // closure — the one operator that was previously only unit-tested.
    "q60_dedup_clusters" -> Q(
      (s, dir) => {
        val pairs = Dedup.jaccardPairsExact(
          Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample), "doc_id", "text",
          shingleSize = 3, threshold = JaccardThreshold)
        Dedup.clusters(pairs, maxIter = 20)
          .select(col("id").cast("long").as("id"), col("cluster").cast("long").as("cluster"))
          .orderBy("id")
      },
      Some(s"""$clusterCtes
             |SELECT src AS id, least(src, min(dst)) AS cluster
             |FROM reach GROUP BY src ORDER BY id""".stripMargin)),

    // KMV distinct-count sketch over corpus trigram hashes — the sketch
    // VALUE itself is oracle-checked (poly hashes reproduce in SQL), not
    // just sanity-bounded like an HLL would be.
    "q64_kmv_distinct" -> Q(
      (s, dir) => graft.operators.Sketches.kmvDistinctNgrams(
        Tables.documents(s, dir), "text", n = 3, k = 1024),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
             |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
             |  FROM documents),
             |th AS (
             |  SELECT doc_id, pos,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % $HP) AS h
             |  FROM tok),
             |shl AS (
             |  SELECT (((a.h * $HR + b.h) % $HP) * $HR + c.h) % $HP AS sh
             |  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             |            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
             |d AS (SELECT DISTINCT sh FROM shl),
             |kth AS (SELECT max(sh) AS h_k FROM (SELECT sh FROM d ORDER BY sh LIMIT 1024)),
             |ex AS (SELECT count(*) AS exact_distinct FROM d)
             |SELECT CAST(1024 AS BIGINT) AS k, h_k,
             |  CASE WHEN exact_distinct < 1024 THEN CAST(exact_distinct AS DOUBLE)
             |       ELSE ${frs(s"CAST(1023 AS DOUBLE) * $HP / h_k", 4)} END AS est_distinct,
             |  exact_distinct,
             |  CASE WHEN exact_distinct < 1024 THEN CAST(0 AS DOUBLE)
             |       ELSE ${frs(s"abs(CAST(1023 AS DOUBLE) * $HP / h_k - exact_distinct) / exact_distinct", 4)} END AS rel_err
             |FROM kth, ex""".stripMargin)),

    // Sequence packing: fill 512-token training bins per source shard
    // (contiguous greedy, windowed cumsum — one shuffle on the shard key,
    // never a global sort).
    "q61_pack_sequences" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.operators.Packing.packBins(docs, "source", "doc_id", "n_tokens", capacity = 512)
          .orderBy("source", "doc_id")
      },
      Some("""SELECT doc_id, source, n_tokens,
             |  CAST(floor(start / 512) AS BIGINT) AS bin_id,
             |  CAST(start % 512 AS BIGINT) AS bin_offset
             |FROM (
             |  SELECT doc_id, source, n_tokens,
             |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
             |  FROM (SELECT doc_id, source,
             |          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
             |        FROM documents))
             |ORDER BY source, doc_id""".stripMargin)),

    // PII scrub: regex redaction (emails -> IPv4 -> phone runs, fixed order).
    // Patterns are RE2-safe so the oracle runs the LITERAL same regexes.
    "q54_pii_scrub" -> Q(
      (s, dir) => graft.operators.Cleaning.piiScrub(
        Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id"),
      Some {
        val Seq((email, _), (ip, _), (phone, _)) = graft.operators.Cleaning.PiiRules
        s"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
           |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$phone', '<PHONE>', 'g') AS clean_text
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Benchmark decontamination: drop corpus docs sharing any 5-gram with
    // the (small, broadcast) benchmark subset — the GPT-3-style n-gram
    // collision rule (trigrams over the fixture's small vocabulary would
    // flag nearly every doc). Oracle re-derives with literal string 5-grams.
    "q55_decontaminate" -> Q(
      (s, dir) => {
        val docs   = Tables.documents(s, dir)
        val bench  = docs.filter(col("doc_id") % 20 === 7)
        val corpus = docs.filter(col("doc_id") % 20 =!= 7)
        graft.operators.Decontaminate.decontaminate(corpus, "doc_id", "text", bench, "text", n = 5)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (
             |  SELECT string_split(text,' ') AS toks FROM documents WHERE doc_id % 20 = 7),
             |bs AS (
             |  SELECT DISTINCT unnest(list_transform(
             |    generate_series(1, greatest(len(toks)-4, 0)),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
             |  FROM b),
             |c AS (
             |  SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id % 20 <> 7),
             |cs AS (
             |  SELECT doc_id, unnest(list_transform(
             |    generate_series(1, greatest(len(toks)-4, 0)),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
             |  FROM c),
             |bad AS (SELECT DISTINCT cs.doc_id FROM cs JOIN bs USING (g))
             |SELECT doc_id, lang, source FROM documents
             |WHERE doc_id % 20 <> 7 AND doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)),

    // The composite curation chain a pre-training pipeline runs end-to-end:
    // quality gate -> repetition gate -> exact dedup (keep-first) ->
    // benchmark decontamination -> stratified sample. One oracle verifies
    // the COMPOSITION (stage order included), not just the parts.
    "q57_curate" -> Q(
      (s, dir) => {
        val docs   = Tables.documents(s, dir)
        val bench  = docs.filter(col("doc_id") % 20 === 7)
        val corpus = docs.filter(col("doc_id") % 20 =!= 7)
        graft.operators.Curation.curate(corpus, "doc_id", "text", bench, "text", "lang")
          .select("doc_id", "lang", "source", "quality", "rep_ratio")
          .orderBy("doc_id")
      },
      Some(s"""WITH $curateCtes
           |SELECT doc_id, lang, source, quality, rep_ratio FROM deduped
           |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
           |  AND $curateSampleCond
           |ORDER BY doc_id""".stripMargin)),

    // Per-stage attrition of the q57 curation chain — the pipeline-health
    // report: one row per stage with survivors and fraction retained vs raw.
    "q106_curation_funnel" -> Q(
      (s, dir) => {
        val docs   = Tables.documents(s, dir)
        val bench  = docs.filter(col("doc_id") % 20 === 7)
        val corpus = docs.filter(col("doc_id") % 20 =!= 7)
        graft.operators.Curation.funnel(corpus, "doc_id", "text", bench, "text", "lang")
      },
      Some(s"""WITH $curateCtes,
           |funnel AS (
           |  SELECT 0 AS stage_idx, 'raw' AS stage,
           |    (SELECT count(*) FROM base) AS n_docs
           |  UNION ALL SELECT 1, 'gated', (SELECT count(*) FROM gated)
           |  UNION ALL SELECT 2, 'deduped', (SELECT count(*) FROM deduped)
           |  UNION ALL SELECT 3, 'decontaminated',
           |    (SELECT count(*) FROM deduped
           |     WHERE doc_id NOT IN (SELECT doc_id FROM bad))
           |  UNION ALL SELECT 4, 'sampled',
           |    (SELECT count(*) FROM deduped
           |     WHERE doc_id NOT IN (SELECT doc_id FROM bad) AND $curateSampleCond))
           |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
           |  CAST(n_docs AS BIGINT) AS n_docs,
           |  ${frs("CAST(n_docs AS DOUBLE) / CAST((SELECT count(*) FROM base) AS DOUBLE)", 6)} AS retained
           |FROM funnel ORDER BY stage_idx""".stripMargin)),

    // Repetition filter: duplicate-trigram fraction per document (the Gopher
    // quality rule family) — map-only over the fused shingle kernel.
    "q56_repetition" -> Q(
      (s, dir) => {
        val total    = greatest(tokenCount(col("text")) - 2, lit(0))
        val distinct = size(shingleHashesFused(col("text"), 3))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            total.cast("long").as("n_trigrams"),
            distinct.cast("long").as("n_distinct"),
            fr(repetitionScore(col("text"), 3), 4).as("rep_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |s AS (
             |  SELECT doc_id, greatest(len(toks)-2, 0) AS total,
             |    len(list_distinct(list_transform(
             |      generate_series(1, greatest(len(toks)-2, 0)),
             |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS nd
             |  FROM t)
             |SELECT doc_id, CAST(total AS BIGINT) AS n_trigrams, CAST(nd AS BIGINT) AS n_distinct,
             |  ${frs("CASE WHEN total > 0 THEN CAST(1.0 AS DOUBLE) - CAST(nd AS DOUBLE) / CAST(total AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END", 4)} AS rep_ratio
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Per-domain cap: at most 15 docs per source, longest first — the
    // web-corpus balancing step. Spark side is a plain rank window that
    // Catalyst's InferWindowGroupLimit pre-reduces map-side (see
    // Curation.capPerKey + ScaleSpec); the oracle is the same window.
    "q65_domain_cap" -> Q(
      (s, dir) => graft.operators.Curation.capPerKey(
          Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
          "source", Seq(col("n_chars").desc, col("doc_id")), n = 15)
        .orderBy("source", "rank"),
      Some("""SELECT doc_id, source, n_chars, rank FROM (
             |  SELECT doc_id, source, n_chars,
             |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
             |  FROM documents)
             |WHERE rank <= 15 ORDER BY source, rank""".stripMargin)),

    // Weighted sample: 100 docs, selection probability ∝ n_chars, fully
    // deterministic (A-ES-style priority u(key)/weight, log-free so the
    // priorities themselves are oracle-checked bit-exactly).
    "q66_weighted_sample" -> Q(
      (s, dir) => graft.operators.Sampling.weightedSample(
        Tables.documents(s, dir).select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 100),
      Some(s"""SELECT doc_id, n_chars, priority FROM (
             |  SELECT doc_id, n_chars,
             |    ${frs(graft.operators.Sampling.hashUniformSql("doc_id") + " / CAST(n_chars AS DOUBLE)", 12)} AS priority
             |  FROM documents WHERE n_chars > 0)
             |ORDER BY priority, doc_id LIMIT 100""".stripMargin)),

    // Per-language weighted reservoir: 10 weighted winners within each lang
    // (the per-language rebalancing step; same log-free A-ES priority as
    // q66, ranked inside a per-stratum window with map-side group limits).
    "q69_weighted_stratified" -> Q(
      (s, dir) => graft.operators.Sampling.weightedSamplePerStratum(
          Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
          "doc_id", "n_chars", "lang", k = 10)
        .orderBy("lang", "rank"),
      Some(s"""WITH p AS (
             |  SELECT doc_id, lang, n_chars,
             |    ${frs(graft.operators.Sampling.hashUniformSql("doc_id") + " / CAST(n_chars AS DOUBLE)", 12)} AS priority
             |  FROM documents WHERE n_chars > 0)
             |SELECT doc_id, lang, n_chars, priority, rank FROM (
             |  SELECT doc_id, lang, n_chars, priority,
             |    row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rank
             |  FROM p)
             |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin)),

    // Corpus vocabulary heavy hitters: top-20 tokens by frequency. Partial
    // (map-side) aggregation bounds the shuffle at the distinct-token count
    // per partition; TakeOrderedAndProject merges P·20 slim rows — the
    // exact-counting shape that replaces a Misra–Gries sketch when the
    // domain (a vocabulary) is shuffle-safe.
    "q71_heavy_hitters" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("w")).limit(20),
      Some("""SELECT w, n FROM (
             |  SELECT w, count(*) AS n FROM (
             |    SELECT unnest(string_split(text,' ')) AS w FROM documents)
             |  GROUP BY w)
             |ORDER BY n DESC, w LIMIT 20""".stripMargin)),

    // Count–min sketch over corpus tokens, audited against exact counts for
    // the 20 heavy hitters — like q64's KMV, the sketch ESTIMATES themselves
    // are oracle-checked (pure modular arithmetic in the PolyHash family).
    "q72_count_min" -> Q(
      (s, dir) => graft.operators.Sketches.countMinTokens(
        Tables.documents(s, dir), "text", depth = 4, width = 1024, topK = 20),
      Some(s"""WITH tok AS (
             |  SELECT unnest(string_split(text,' ')) AS w FROM documents),
             |th AS (
             |  SELECT w,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % $HP) AS h
             |  FROM tok WHERE w <> ''),
             |js AS (SELECT unnest(generate_series(0, 3)) AS j),
             |cms AS (
             |  SELECT j, (${affineSql("h", "j")}) % 1024 AS bucket, count(*) AS cnt
             |  FROM th, js GROUP BY 1, 2),
             |hh AS (
             |  SELECT w, h, count(*) AS n FROM th GROUP BY 1, 2
             |  ORDER BY n DESC, w LIMIT 20)
             |SELECT w, n, est, est - n AS overcount FROM (
             |  SELECT hh.w, hh.n, min(cms.cnt) AS est
             |  FROM hh JOIN js ON true
             |       JOIN cms ON cms.j = js.j
             |        AND cms.bucket = (${affineSql("hh.h", "js.j")}) % 1024
             |  GROUP BY 1, 2)
             |ORDER BY n DESC, w""".stripMargin)),

    // Cross-source similarity matrix: trigram Jaccard between every pair of
    // sources' distinct shingle sets — the "are these two corpora
    // near-copies?" report, computed by shingle-key equi-join, never
    // all-pairs docs.
    "q79_source_similarity" -> Q(
      (s, dir) => Dedup.corpusSimilarity(
        Tables.documents(s, dir), "text", "source", shingleSize = 3),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
             |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
             |  FROM documents),
             |th AS (
             |  SELECT doc_id, pos,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % $HP) AS h
             |  FROM tok),
             |shl AS (
             |  SELECT a.doc_id, (((a.h * $HR + b.h) % $HP) * $HR + c.h) % $HP AS sh
             |  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             |            JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
             |ss AS (
             |  SELECT DISTINCT d.source, s.sh
             |  FROM shl s JOIN documents d USING (doc_id)),
             |sz AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
             |ix AS (
             |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
             |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT a.source AS source_a, b.source AS source_b, a.n AS n_a, b.n AS n_b
             |  FROM sz a JOIN sz b ON a.source < b.source)
             |SELECT source_a, source_b, n_a, n_b,
             |  CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
             |  ${frs("CAST(coalesce(n_common, 0) AS DOUBLE) / CAST(n_a + n_b - coalesce(n_common, 0) AS DOUBLE)", 6)} AS jaccard
             |FROM pairs LEFT JOIN ix USING (source_a, source_b)
             |ORDER BY 1, 2""".stripMargin)),

    // Per-language winsorization of document lengths (outlier clipping
    // before length stats feed a sampler): clip n_chars to the language's
    // exact [p05, p95] band; band edges rounded first so both engines clip
    // at identical thresholds.
    "q77_winsorize" -> Q(
      (s, dir) => graft.operators.Curation.winsorize(
          Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
          "n_chars", "lang", pLo = 0.05, pHi = 0.95)
        .select("doc_id", "lang", "n_chars", "lo", "hi", "clipped")
        .orderBy("doc_id"),
      Some(s"""WITH s AS (
             |  SELECT lang,
             |    ${frs("quantile_cont(n_chars, 0.05)", 4)} AS lo,
             |    ${frs("quantile_cont(n_chars, 0.95)", 4)} AS hi
             |  FROM documents GROUP BY lang)
             |SELECT doc_id, lang, n_chars, lo, hi,
             |  least(greatest(CAST(n_chars AS DOUBLE), lo), hi) AS clipped
             |FROM documents JOIN s USING (lang) ORDER BY doc_id""".stripMargin)),

    // Corpus-trained bigram LM score — the perplexity-style fluency filter
    // (kept in probability space: integer counts + IEEE divisions, so the
    // score value itself is oracle-checked).
    "q68_bigram_lm" -> Q(
      (s, dir) => graft.operators.LanguageModel.bigramScore(
        Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id"),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
             |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
             |  FROM documents),
             |bg AS (
             |  SELECT a.doc_id, a.w AS w1, b.w AS w2
             |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
             |db AS (
             |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
             |  FROM bg GROUP BY 1, 2, 3),
             |pc AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
             |cc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pc GROUP BY 1)
             |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
             |  ${frs("sum(CAST(k AS DOUBLE) * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) / CAST(sum(k) AS DOUBLE)", 6)} AS lm_score
             |FROM db JOIN pc USING (w1, w2) JOIN cc USING (w1)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bloom-filter decontamination audit: the benchmark's 5-gram set folded
    // into a 65536-bit / 4-probe broadcast filter, corpus probes it as a
    // PURE MAP (no join, no shuffle on the corpus side) — next to q55's
    // exact-join rule this is the 100 TB path, and the output audits the
    // filter (bloom_hit vs exact_hit => visible false-positive rate). All
    // probes are PolyHash modular arithmetic, so the filter CONTENTS are
    // re-derived in SQL and the audit is oracle-checked.
    "q84_bloom_decontaminate" -> Q(
      (s, dir) => {
        val docs   = Tables.documents(s, dir)
        val bench  = docs.filter(col("doc_id") % 20 === 7)
        val corpus = docs.filter(col("doc_id") % 20 =!= 7)
        graft.operators.Decontaminate.bloomAudit(corpus, "doc_id", "text", bench, "text",
          n = 5, mBits = 65536, kHash = 4).orderBy("doc_id")
      },
      Some {
        val g5 = s"i -> (((((((hs[i]*$HR + hs[i+1]) % $HP) * $HR + hs[i+2]) % $HP) * $HR + hs[i+3]) % $HP) * $HR + hs[i+4]) % $HP"
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
           |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
           |  FROM documents),
           |th AS (
           |  SELECT doc_id, pos,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(generate_series(1, length(w)),
           |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
           |      (acc, x) -> (acc * 31 + x) % $HP) AS h
           |  FROM tok),
           |hl AS (SELECT doc_id, list(h ORDER BY pos) AS hs FROM th GROUP BY doc_id),
           |g5 AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, greatest(len(hs)-4, 0)), $g5))) AS g
           |  FROM hl),
           |bgrams AS (SELECT DISTINCT g FROM g5 WHERE doc_id % 20 = 7),
           |js AS (SELECT unnest(generate_series(0, 3)) AS j),
           |bits AS (SELECT DISTINCT (${affineSql("g", "j")}) % 65536 AS p FROM bgrams, js),
           |cg AS (SELECT doc_id, g FROM g5 WHERE doc_id % 20 <> 7),
           |probe AS (
           |  SELECT cg.doc_id, cg.g, count(*) AS k_set
           |  FROM cg CROSS JOIN js
           |  JOIN bits ON bits.p = (${affineSql("cg.g", "js.j")}) % 65536
           |  GROUP BY 1, 2),
           |bloom AS (
           |  SELECT doc_id, max(CASE WHEN k_set = 4 THEN 1 ELSE 0 END) AS bh
           |  FROM probe GROUP BY 1),
           |exact AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bgrams USING (g))
           |SELECT d.doc_id, CAST(coalesce(b.bh, 0) AS BIGINT) AS bloom_hit,
           |  CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_hit
           |FROM documents d
           |LEFT JOIN bloom b ON d.doc_id = b.doc_id
           |LEFT JOIN exact e ON d.doc_id = e.doc_id
           |WHERE d.doc_id % 20 <> 7
           |ORDER BY d.doc_id""".stripMargin
      }),

    // DSIR importance weights: mean target/raw likelihood ratio over hashed
    // bigram features (8192 buckets, Laplace-smoothed) — the domain-matching
    // sampler score, with lang='en' standing in as the target domain. Count
    // tables are bounded by the bucket count (broadcast back), the corpus
    // never self-joins.
    "q85_dsir_weights" -> Q(
      (s, dir) => graft.operators.Importance.importanceWeights(
          Tables.documents(s, dir), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 8192)
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
             |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
             |  FROM documents),
             |th AS (
             |  SELECT doc_id, pos,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % $HP) AS h
             |  FROM tok),
             |bgt AS (
             |  SELECT a.doc_id, ((a.h * $HR + b.h) % $HP) % 8192 AS f,
             |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS t
             |  FROM th a JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             |       JOIN documents d ON a.doc_id = d.doc_id),
             |db AS (
             |  SELECT doc_id, f, CAST(count(*) AS BIGINT) AS k, max(t) AS t
             |  FROM bgt GROUP BY 1, 2),
             |tc AS (SELECT f, CAST(sum(k) AS BIGINT) AS ct FROM db WHERE t = 1 GROUP BY 1),
             |rc AS (SELECT f, CAST(sum(k) AS BIGINT) AS cr FROM db GROUP BY 1),
             |tot AS (SELECT CAST(sum(t * k) AS BIGINT) AS nt, CAST(sum(k) AS BIGINT) AS nr FROM db)
             |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
             |  ${frs("sum(CAST(k AS DOUBLE) * (CAST((coalesce(ct, 0) + 1) * (nr + 8192) AS DOUBLE) / CAST((cr + 1) * (nt + 8192) AS DOUBLE))) / CAST(sum(k) AS DOUBLE)", 6)} AS dsir_weight
             |FROM db LEFT JOIN tc USING (f) JOIN rc USING (f) CROSS JOIN tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Robust per-language length outliers: Hampel MAD rule (median ± 3·
    // 1.4826·MAD) — thresholds immune to the outliers they detect, unlike a
    // mean/stddev z-score on a heavy-tailed length distribution.
    "q86_mad_outliers" -> Q(
      (s, dir) => graft.operators.Curation.madOutliers(
          Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
          "n_chars", "lang", zMax = 3.0)
        .select("doc_id", "lang", "n_chars", "med", "mad", "robust_z", "is_outlier")
        .orderBy("doc_id"),
      Some {
        val rz = "ad / (CAST(1.4826 AS DOUBLE) * mad)"
        s"""WITH m AS (SELECT lang, median(n_chars) AS med FROM documents GROUP BY 1),
           |d AS (
           |  SELECT doc_id, lang, n_chars, med, abs(n_chars - med) AS ad
           |  FROM documents JOIN m USING (lang)),
           |md AS (SELECT lang, median(ad) AS mad FROM d GROUP BY 1)
           |SELECT doc_id, lang, n_chars, ${frs("med", 4)} AS med, ${frs("mad", 4)} AS mad,
           |  CASE WHEN mad > 0 THEN ${frs(rz, 4)} END AS robust_z,
           |  CAST(CASE WHEN mad > 0 AND ${frs(rz, 4)} > CAST(3.0 AS DOUBLE)
           |    THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
           |FROM d JOIN md USING (lang) ORDER BY doc_id""".stripMargin
      }),

    // Vocabulary richness: type-token ratio + hapax fraction per document —
    // the lexical-diversity quality signals (low TTR = boilerplate/spam).
    // Pure integer ratios, two partial-aggregated shuffles.
    "q87_vocab_richness" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id")
        .agg(sum("__c").cast("long").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("__c") === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"))
        .withColumn("ttr", fr(col("n_types").cast("double") / col("n_tokens").cast("double"), 4))
        .withColumn("hapax_ratio", fr(col("n_hapax").cast("double") / col("n_types").cast("double"), 4))
        .orderBy("doc_id"),
      Some(s"""WITH c AS (
             |  SELECT doc_id, w, count(*) AS c FROM (
             |    SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
             |  GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             |  ${frs("CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)", 4)} AS ttr,
             |  ${frs("CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS hapax_ratio
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Sub-document exact dedup audit: 50-token windows, global keep-first,
    // per-doc duplicated-window fraction — the boilerplate signal that
    // document-level dedup (q17/q44) cannot see.
    "q88_chunk_dedup" -> Q(
      (s, dir) => Dedup.chunkDupStats(
          Tables.documents(s, dir), "doc_id", "text", chunkTokens = 50)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |ch AS (
             |  SELECT doc_id, i AS chunk_id,
             |    array_to_string(toks[(50*i+1):(50*i+50)], ' ') AS chunk_text
             |  FROM (SELECT doc_id, toks,
             |          unnest(generate_series(0,
             |            CAST(floor((greatest(len(toks)-50, 0)+49) / 50.0) AS BIGINT))) AS i
             |        FROM t)),
             |rk AS (
             |  SELECT doc_id, chunk_id,
             |    row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn
             |  FROM ch)
             |SELECT doc_id, count(*) AS n_chunks,
             |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |  ${frs("CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS dup_ratio
             |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Canonical deterministic train/val/test split (80/10/10 by key hash):
    // stable across runs and machines, disjoint+exhaustive by construction,
    // map-only — the split every training pipeline applies before anything
    // else touches the data.
    "q91_train_split" -> Q(
      (s, dir) => graft.operators.Sampling.assignSplit(
          Tables.documents(s, dir).select("doc_id", "lang"), "doc_id")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang,
             |  ${graft.operators.Sampling.hashBucketSql("doc_id")} AS bucket,
             |  CASE WHEN ${graft.operators.Sampling.hashBucketSql("doc_id")} < 80 THEN 'train'
             |       WHEN ${graft.operators.Sampling.hashBucketSql("doc_id")} < 90 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Split-leakage audit: near-duplicate pairs (MinHash-LSH candidates,
    // exact-Jaccard-verified) that CROSS a train/val/test boundary — the
    // contamination a deterministic split cannot prevent and every
    // benchmark-honest pipeline must report. Composition of q91's split and
    // q22b's LSH pairs; the whole chain is oracle-checked.
    "q92_split_leakage" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16, threshold = JaccardThreshold)
        val splits = graft.operators.Sampling.assignSplit(
          docs.select("doc_id"), "doc_id").select("doc_id", "split")
        pairs
          .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
          .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
          .filter(col("split_a") =!= col("split_b"))
          .select("id_a", "id_b", "jac", "split_a", "split_b")
          .orderBy("id_a", "id_b")
      },
      Some {
        def splitCase(k: String): String =
          s"""CASE WHEN ${graft.operators.Sampling.hashBucketSql(k)} < 80 THEN 'train'
             |       WHEN ${graft.operators.Sampling.hashBucketSql(k)} < 90 THEN 'val'
             |       ELSE 'test' END""".stripMargin
        s"""$minhashPairsCtes
           |SELECT id_a, id_b, jac,
           |  ${splitCase("id_a")} AS split_a,
           |  ${splitCase("id_b")} AS split_b
           |FROM pairs
           |WHERE jac >= $JaccardThreshold
           |  AND ${splitCase("id_a")} <> ${splitCase("id_b")}
           |ORDER BY 1, 2""".stripMargin
      }),

    // Per-doc n-gram novelty: fraction of a doc's distinct trigram shingles
    // first seen (min doc_id) in that doc — the redundancy-contribution
    // score; shingle-granular keep-first, where q44/q45 are doc-granular.
    "q93_novelty" -> Q(
      (s, dir) => Dedup.noveltyScores(
          Tables.documents(s, dir), "doc_id", "text", shingleSize = 3)
        .orderBy("doc_id"),
      Some(s"""WITH $shingleCtes,
             |sh0 AS (SELECT DISTINCT doc_id, sh FROM shl),
             |fst AS (SELECT sh, min(doc_id) AS first_id FROM sh0 GROUP BY 1)
             |SELECT doc_id, count(*) AS n_shingles,
             |  CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |  ${frs("CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS novelty
             |FROM sh0 JOIN fst USING (sh)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // MinHash estimator accuracy audit over the LSH candidates: estimated
    // Jaccard (signature agreement fraction) vs exact shingle-set Jaccard —
    // the sketch-error twin of the ANN recall audits (q76/q78).
    "q94_sketch_jaccard_audit" -> Q(
      (s, dir) => Dedup.sketchJaccardAudit(
        Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16),
      Some(s"""$minhashCandCtes,
             |est AS (
             |  SELECT c.id_a, c.id_b,
             |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS nm
             |  FROM cand c JOIN mh a ON a.doc_id = c.id_a
             |              JOIN mh b ON b.doc_id = c.id_b AND b.j = a.j
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT e.id_a, e.id_b,
             |    ${frs("CAST(nm AS DOUBLE) / 32", 4)} AS est_jac,
             |    ${frs(jacExpr, 4)} AS exact_jac
             |  FROM est e JOIN sh sa ON e.id_a = sa.doc_id
             |             JOIN sh sb ON e.id_b = sb.doc_id)
             |SELECT id_a, id_b, est_jac, exact_jac,
             |  ${frs("abs(est_jac - exact_jac)", 4)} AS abs_err
             |FROM r ORDER BY 1, 2""".stripMargin)),

    // Okapi BM25 ranking for a fixed query-term set — lexical retrieval next
    // to the vector search family; 'dup' is the one rare term in the fixture
    // vocabulary (df≈5% vs ≈78%), so idf actually differentiates.
    "q96_bm25" -> Q(
      (s, dir) => graft.operators.Retrieval.bm25(
        Tables.documents(s, dir), "doc_id", "text", Seq("dup", "vector", "query")),
      Some(graft.operators.Retrieval.bm25Sql(
        "documents", "doc_id", "text", Seq("dup", "vector", "query")))),

    // Incremental ingestion dedup: delta docs (doc_id % 10 = 0) that survive
    // LSH near-dup checks against the standing corpus (corpus always wins,
    // regardless of id order) and earlier delta docs — the daily-ingest path
    // where the corpus is never re-deduped.
    "q99_delta_dedup" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.dedupDeltaAgainstCorpus(
            corpus = docs.filter(col("doc_id") % 10 =!= 0),
            delta  = docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
            threshold = JaccardThreshold)
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some(deltaDedupOracle)),

    // The SAME delta-dedup semantics through the streaming engine: arriving
    // delta docs band map-side and probe the standing corpus index via a
    // stream-static join (zero streaming state; post-drain reconciliation).
    // Checked against the identical oracle as the batch q99.
    "q102_stream_delta_dedup" -> Q(
      (s, dir) => graft.streaming.StreamingDedup.deltaDedup(s, dir,
          shingleSize = 3, numHashes = 32, bands = 16, threshold = JaccardThreshold)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some(deltaDedupOracle)),

    // CCNet-style boilerplate scrub: 5-token segments occurring in > 1
    // distinct docs are deleted EVERYWHERE and documents are rebuilt from
    // the surviving segments in order — removal, where q88 only measures.
    "q100_boilerplate_scrub" -> Q(
      (s, dir) => graft.operators.Cleaning.stripBoilerplate(
          Tables.documents(s, dir), "doc_id", "text",
          windowTokens = 5, maxDocs = 1)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
             |ch AS (
             |  SELECT doc_id, i AS chunk_id,
             |    array_to_string(toks[(5*i+1):(5*i+5)], ' ') AS chunk_text
             |  FROM (SELECT doc_id, toks,
             |          unnest(generate_series(0,
             |            CAST(floor((greatest(len(toks)-5, 0)+4) / 5.0) AS BIGINT))) AS i
             |        FROM t)),
             |hot AS (
             |  SELECT chunk_text FROM (
             |    SELECT chunk_text, count(DISTINCT doc_id) AS d FROM ch GROUP BY 1)
             |  WHERE d > 1),
             |fl AS (
             |  SELECT ch.doc_id, ch.chunk_id, ch.chunk_text,
             |    CASE WHEN hot.chunk_text IS NOT NULL THEN 1 ELSE 0 END AS h
             |  FROM ch LEFT JOIN hot USING (chunk_text))
             |SELECT doc_id, count(*) AS n_chunks,
             |  CAST(sum(h) AS BIGINT) AS n_dropped,
             |  coalesce(array_to_string(list(chunk_text ORDER BY chunk_id) FILTER (WHERE h = 0), ' '), '') AS clean_text
             |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Curriculum phase assignment: per-language length quartiles (ntile over
    // the per-group window, id tie-break) — the shortest-first ordering a
    // curriculum-training schedule feeds from.
    "q109_curriculum" -> Q(
      (s, dir) => graft.operators.Curation.curriculumPhases(
          Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
          "doc_id", "n_chars", "lang", phases = 4)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars,
             |  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS phase
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Temperature-0.5 mixture reweighting across languages: current share,
    // target π_d ∝ √p_d, and the per-domain resampling rate — the GPT-3-
    // style rebalance that upweights small domains. The √n normalizer sums
    // via a deterministic sequential fold (oracle: list_reduce), so the
    // float result is engine-reproducible.
    "q104_mixture_weights" -> Q(
      (s, dir) => graft.operators.Importance.mixtureWeights(
        Tables.documents(s, dir), "lang"),
      Some(s"""WITH c AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents GROUP BY 1),
             |t AS (
             |  SELECT CAST(sum(n_docs) AS BIGINT) AS n,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang)),
             |      (acc, x) -> acc + x) AS sw
             |  FROM c)
             |SELECT lang, n_docs,
             |  ${frs("CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS share,
             |  ${frs("sqrt(CAST(n_docs AS DOUBLE)) / sw", 6)} AS mix_weight,
             |  ${frs("sqrt(CAST(n_docs AS DOUBLE)) / sw * CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE)", 6)} AS target_rate
             |FROM c CROSS JOIN t ORDER BY lang""".stripMargin)),

    // Split-drift audit: exact-integer total-variation distance between the
    // unigram distributions of every train/val/test pair — proof (not
    // assumption) that the hash split is distributionally neutral.
    "q101_split_drift" -> Q(
      (s, dir) => graft.operators.Sampling.splitDrift(
        Tables.documents(s, dir), "doc_id", "text"),
      Some {
        val bucket = graft.operators.Sampling.hashBucketSql("doc_id")
        s"""WITH tok AS (
           |  SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
           |              ELSE 'test' END AS split, w
           |  FROM (SELECT $bucket AS b, unnest(string_split(text,' ')) AS w
           |        FROM documents)
           |  WHERE w <> ''),
           |c AS (SELECT split, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
           |t AS (SELECT split, CAST(count(*) AS BIGINT) AS t FROM tok GROUP BY 1),
           |p AS (SELECT * FROM (VALUES ('train','val'), ('train','test'), ('val','test')) AS v(sa, sb)),
           |v AS (SELECT DISTINCT w FROM tok),
           |j AS (
           |  SELECT p.sa, p.sb, v.w, coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
           |  FROM p CROSS JOIN v
           |  LEFT JOIN c ca ON ca.split = p.sa AND ca.w = v.w
           |  LEFT JOIN c cb ON cb.split = p.sb AND cb.w = v.w
           |  WHERE coalesce(ca.c, 0) > 0 OR coalesce(cb.c, 0) > 0),
           |agg AS (
           |  SELECT sa, sb, count(*) AS n_words,
           |    CAST(sum(abs(ca * tb.t - cb * ta.t)) AS BIGINT) AS num,
           |    max(ta.t) AS ta, max(tb.t) AS tb
           |  FROM j JOIN t ta ON ta.split = j.sa JOIN t tb ON tb.split = j.sb
           |  GROUP BY 1, 2)
           |SELECT sa AS split_a, sb AS split_b, n_words,
           |  ${frs("CAST(num AS DOUBLE) / (CAST(2.0 AS DOUBLE) * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))", 6)} AS tv_dist
           |FROM agg ORDER BY split_a, split_b""".stripMargin
      }),

    // Hybrid retrieval: BM25 (q96's lexical ranker) and embedding-cosine
    // search (q62's vector ranker) fused by reciprocal-rank fusion — the
    // standard two-tower retrieval combiner. Ranks are computed on
    // floor-rounded scores with id tiebreaks, so both engines agree on every
    // rank and therefore on every fused score exactly.
    "q112_hybrid_rrf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val lex = graft.operators.Retrieval.bm25(
            docs, "doc_id", "text", Seq("dup", "vector", "query"), topK = 20)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
          .select("doc_id", "rank")
        val emb = graft.pipeline.HashingEmbedder(64)
        val dv = docs.select(col("doc_id"), emb.embedRaw(col("text")).as("vec"))
        val qv = dv.filter(col("doc_id") === 0).select(col("vec")).head().getSeq[Double](0)
        val vec = graft.operators.TopK.topK(
            dv.filter(col("doc_id") =!= 0), "vec", "doc_id", qv, k = 20)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
          .select("doc_id", "rank")
        graft.operators.Retrieval.rrfFuse(
          Seq("lex" -> lex, "vec" -> vec), "doc_id", kRrf = 60, topK = 10)
      },
      Some(s"""$hybridLegCtes
             |SELECT doc_id, r_lex, r_vec,
             |  ${frs(rrfTermSql("r_lex") + " + " + rrfTermSql("r_vec"), 6)} AS rrf
             |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // THE HYBRID REPORT CARD (r13 verdict task 4): q228 evaluates the
    // vector index and q229 the streamed one, but the hybrid RRF ranking
    // (q112) and its BM25 lexical leg (q96) had no eval row. Here all three
    // legs — lexical, vector, fused — are scored by the SAME rankingEval
    // against exact-cosine truth (the semantic top-10 for query doc 0), so
    // the published row answers the deployment question directly: what does
    // the lexical leg alone miss, and how much of it does fusion recover?
    // The vector leg IS the truth ranking by construction (its row is the
    // sanity anchor: p@10 = mrr = ndcg = 1); the leg name plays the query
    // key, so one relation carries the lexical-vs-vector-vs-hybrid
    // comparison. Shares q112's leg CTEs and q228's metric tail verbatim.
    "q231_hybrid_retrieval_eval" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val lex = graft.operators.Retrieval.bm25(
            docs, "doc_id", "text", Seq("dup", "vector", "query"), topK = 20)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
          .select("doc_id", "rank")
        val emb = graft.pipeline.HashingEmbedder(64)
        val dv = docs.select(col("doc_id"), emb.embedRaw(col("text")).as("vec"))
        val qv = dv.filter(col("doc_id") === 0).select(col("vec")).head().getSeq[Double](0)
        val vec = graft.operators.TopK.topK(
            dv.filter(col("doc_id") =!= 0), "vec", "doc_id", qv, k = 20)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
          .select("doc_id", "rank")
        val hyb = graft.operators.Retrieval.rrfFuse(
            Seq("lex" -> lex, "vec" -> vec), "doc_id", kRrf = 60, topK = 10)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("rrf"), col("doc_id"))))
          .select("doc_id", "rank")
        val ranked = lex.select(lit("lex").as("leg"), col("doc_id"), col("rank"))
          .unionByName(vec.select(lit("vec").as("leg"), col("doc_id"), col("rank")))
          .unionByName(hyb.select(lit("hybrid").as("leg"), col("doc_id"), col("rank")))
        val truth = Seq("hybrid", "lex", "vec").toDF("leg")
          .crossJoin(vec.filter(col("rank") <= 10).select("doc_id"))
        graft.operators.Retrieval.rankingEval(
          ranked, truth, "leg", "doc_id", "rank", k = 10)
      },
      Some(s"""$hybridLegCtes,
             |hyb AS (
             |  SELECT doc_id,
             |    CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
             |  FROM (
             |    SELECT doc_id,
             |      ${frs(rrfTermSql("r_lex") + " + " + rrfTermSql("r_vec"), 6)} AS rrf
             |    FROM f ORDER BY rrf DESC, doc_id LIMIT 10)),
             |sysr AS (
             |  SELECT 'lex' AS leg, doc_id, r_lex AS rn FROM lex WHERE r_lex <= 10
             |  UNION ALL SELECT 'vec', doc_id, r_vec FROM vec WHERE r_vec <= 10
             |  UNION ALL SELECT 'hybrid', doc_id, rank FROM hyb),
             |tru AS (
             |  SELECT l.leg, v.doc_id
             |  FROM (SELECT unnest(['hybrid', 'lex', 'vec']) AS leg) l
             |  CROSS JOIN (SELECT doc_id FROM vec WHERE r_vec <= 10) v),
             |${graft.operators.Retrieval.rankingEvalTailSql(10, "leg", "doc_id")}""".stripMargin)),

    // q231 ACROSS A QUERY SET: five query docs, each with its own fixed
    // lexical term triple (literals, drawn from the fixture vocabulary) and
    // its own exact-cosine truth; the eval key is leg#query, so one
    // relation carries all 15 report rows. Corpus-side vector CTEs are
    // shared across queries (the per-query legs differ only in the probe).
    "q237_hybrid_eval_multi" -> Q(
      (s, dir) => hybridEvalMulti(s, dir),
      Some(hybridEvalMultiOracle)),

    // The per-LEG macro dashboard over q237 (the q230 pattern grouped by
    // leg): mean p@10 / MRR / nDCG per retrieval strategy across the query
    // set — the one table a deployment reads to pick lexical vs vector vs
    // hybrid. Means are ordered folds per group, so even the averages
    // hash-match.
    "q238_hybrid_eval_by_leg" -> Q(
      (s, dir) => graft.operators.Retrieval.rankingEvalSummaryBy(
        hybridEvalMulti(s, dir)
          .withColumn("leg", element_at(split(col("qkey"), "#"), 1)),
        "leg"),
      Some {
        def m(c: String) = frs(
          s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list($c))), (a, x) -> a + x)" +
            " / CAST(count(*) AS DOUBLE)", 6)
        s"""WITH ev AS (
           |$hybridEvalMultiOracle
           |)
           |SELECT split_part(qkey, '#', 1) AS leg,
           |  CAST(count(*) AS BIGINT) AS n_queries,
           |  ${m("p_at_k")} AS mean_p_at_k,
           |  ${m("mrr")} AS mean_mrr,
           |  ${m("ndcg")} AS mean_ndcg
           |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // q238 WITH GRADED GAINS (r15 verdict task 5 — the q232 × q237
    // consolidation): the same 15 leg×query rankings scored by graded nDCG
    // (gain 2^g − 1, grades banded from the exact-cosine truth rank), then
    // macro-averaged per leg. This is the dashboard that separates "finds
    // the truth set" from "finds the HEAD of the truth set": a leg that
    // surfaces only tail-grade truth docs scores visibly below one that
    // keeps the top-2. Means are ordered folds per group (q230's rule).
    "q240_hybrid_eval_graded_by_leg" -> Q(
      (s, dir) => graft.operators.Retrieval.rankingEvalSummaryBy(
        hybridEvalMultiGraded(s, dir)
          .withColumn("leg", element_at(split(col("qkey"), "#"), 1)),
        "leg", metrics = Seq("ndcg")),
      Some {
        def m(c: String) = frs(
          s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list($c))), (a, x) -> a + x)" +
            " / CAST(count(*) AS DOUBLE)", 6)
        s"""WITH ev AS (
           |$hybridEvalMultiGradedOracle
           |)
           |SELECT split_part(qkey, '#', 1) AS leg,
           |  CAST(count(*) AS BIGINT) AS n_queries,
           |  ${m("ndcg")} AS mean_ndcg
           |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // PMI collocation mining — adjacent-pair pointwise mutual information
    // against the positional marginals, the phrase-detection pass of
    // tokenizer/vocabulary construction. Counts stay exact BIGINTs; the only
    // FP is one division + one ln per surviving pair.
    "q114_pmi_collocations" -> Q(
      (s, dir) => graft.operators.LanguageModel.collocations(
        Tables.documents(s, dir), "text", minCount = 5, topK = 25),
      Some(graft.operators.LanguageModel.collocationsSql(
        "documents", "text", minCount = 5, topK = 25))),

    // Per-document unigram token entropy H = ln(n) − Σ c·ln(c) / n — the
    // degenerate-text detector orthogonal to q56's repetition score (a doc
    // of one repeated token has H = 0; natural prose sits near ln(n_types)).
    // Counts are exact; the ln/divide tail is identical in both engines.
    "q118_token_entropy" -> Q(
      (s, dir) => {
        val counts = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("doc_id", "w").agg(count(lit(1)).as("__c"))
        counts.groupBy("doc_id")
          .agg(sum("__c").cast("long").as("n_tokens"),
            count(lit(1)).as("n_types"),
            fr(log(sum("__c").cast("double")) -
              sum(col("__c").cast("double") * log(col("__c").cast("double"))) /
                sum("__c").cast("double"), 6).as("entropy"))
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (
             |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
             |  WHERE w <> '' GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_types,
             |  ${frs("ln(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE)", 6)} AS entropy
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Canonicalization after clustering: q60's connected components, each
    // reduced to the member with the most content (max n_chars, min-id tie)
    // — the keep-one-per-duplicate-group step, with group sizes audited.
    "q119_cluster_reps" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.jaccardPairsExact(
          docs.filter(col("doc_id") < ExactPairSample), "doc_id", "text",
          shingleSize = 3, threshold = JaccardThreshold)
        val labels = Dedup.clusters(pairs, maxIter = 20)
          .select(col("id").cast("long").as("id"), col("cluster").cast("long").as("cluster"))
        Dedup.clusterRepresentatives(labels, docs, "doc_id", "n_chars")
      },
      Some(s"""$clusterCtes,
             |cl AS (
             |  SELECT src AS id, least(src, min(dst)) AS cluster
             |  FROM reach GROUP BY src),
             |jn AS (
             |  SELECT cl.cluster, cl.id, d.n_chars
             |  FROM cl JOIN documents d ON cl.id = d.doc_id),
             |r AS (
             |  SELECT cluster, id, n_chars,
             |    row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, id) AS rn,
             |    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members
             |  FROM jn)
             |SELECT cluster, id AS rep_id, n_chars AS rep_weight, n_members
             |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // Near-dup graph degree distribution — the audit run before clustering:
    // a heavy-tailed degree histogram (template/boilerplate hub documents)
    // predicts giant components and connected-components blowup.
    "q124_dupgraph_degrees" -> Q(
      (s, dir) => {
        val pairs = Dedup.jaccardPairsExact(
          Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample),
          "doc_id", "text", shingleSize = 3, threshold = JaccardThreshold)
        val deg = pairs.select(col("id_a").as("id"))
          .union(pairs.select(col("id_b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("degree"))
        deg.groupBy("degree").agg(count(lit(1)).as("n_nodes")).orderBy("degree")
      },
      Some(s"""$clusterCtes,
             |d AS (
             |  SELECT id, CAST(count(*) AS BIGINT) AS degree
             |  FROM (SELECT id_a AS id FROM p UNION ALL SELECT id_b FROM p)
             |  GROUP BY 1)
             |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PageRank centrality over the LSH near-dup graph (3 fixed iterations,
    // symmetrized pairs): q124's degrees say how CONNECTED a document is,
    // PageRank says how CENTRAL — the principled representative-selection
    // signal for a duplicate community. The oracle unrolls the iterations
    // over the same in-SQL LSH pair derivation.
    "q144_dupgraph_pagerank" -> Q(
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
            shingleSize = 3, numHashes = 32, bands = 16, threshold = JaccardThreshold)
          .select(col("id_a"), col("id_b"))
        val edges = pairs.unionByName(
          pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        graft.operators.Graph.pageRank(edges, "id_a", "id_b", iters = 3)
          .withColumnRenamed("id", "doc_id")
      },
      Some(s"""$minhashPairsCtes,
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jac >= $JaccardThreshold
             |  UNION ALL
             |  SELECT id_b, id_a FROM pairs WHERE jac >= $JaccardThreshold),
             |${pageRankCtes(3)}
             |SELECT id AS doc_id, ${frs("r", 6)} AS pr FROM r3 ORDER BY doc_id""".stripMargin)),

    // PageRank-weighted canonicalization: q119 keeps each duplicate
    // cluster's LONGEST member (max n_chars); this keeps its most CENTRAL
    // one — the member most similar to the rest of its community, which is
    // what "the canonical copy" usually means. Same capped exact-pair graph
    // as q60/q119/q124, so clustering and centrality are computed over one
    // edge set.
    "q145_cluster_reps_pagerank" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.jaccardPairsExact(
          docs.filter(col("doc_id") < ExactPairSample), "doc_id", "text",
          shingleSize = 3, threshold = JaccardThreshold)
        val labels = Dedup.clusters(pairs, maxIter = 20)
          .select(col("id").cast("long").as("id"), col("cluster").cast("long").as("cluster"))
        val edges = pairs.select(col("id_a"), col("id_b")).unionByName(
          pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        val pr = graft.operators.Graph.pageRank(edges, "id_a", "id_b", iters = 3)
        Dedup.clusterRepresentatives(labels, pr, "id", "pr")
      },
      Some(s"""$clusterCtes,
             |cl AS (
             |  SELECT src AS id, least(src, min(dst)) AS cluster
             |  FROM reach GROUP BY src),
             |${pageRankCtes(3)},
             |jn AS (
             |  SELECT cl.cluster, cl.id, ${frs("r3.r", 6)} AS pr
             |  FROM cl JOIN r3 ON cl.id = r3.id),
             |rr AS (
             |  SELECT cluster, id, pr,
             |    row_number() OVER (PARTITION BY cluster ORDER BY pr DESC, id) AS rn,
             |    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_members
             |  FROM jn)
             |SELECT cluster, id AS rep_id, pr AS rep_weight, n_members
             |FROM rr WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // Prefix-filtered EXACT similarity join over the FULL corpus — the
    // algorithmic alternative to both q22 (brute force, capped sample) and
    // q22b (LSH banding, approximate recall): candidates from a prefix-token
    // posting join + length filter, then exact verification. The oracle is
    // the brute-force join, so recall = 1 is VERIFIED, not assumed.
    "q125_prefix_jaccard_join" -> Q(
      (s, dir) => Dedup.prefixJaccardJoin(
        Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, threshold = JaccardThreshold),
      Some(jaccardPairsOracle(capped = false))),

    // Exact-substring dedup (Lee et al. 2022's ExactSubstr family): maximal
    // per-doc character spans whose every 50-char window appears verbatim
    // in another document — the one dedup family (doc-level / chunk /
    // near-dup / semantic all exist) that was missing. Capped to the q22
    // sample so the stride-1 window set stays oracle-sized; the operator
    // doc records the suffix-array / anchor-sampling 100 TB path.
    // UNBOUNDED-length duplicate mining (verdict r10 task 2): for every
    // position, the length of the longest substring starting there that
    // occurs anywhere else — NO fixed minLen window, the quantity the
    // fixed-window family (q149/q163) approximates from below. Computed by
    // distributed prefix-doubling suffix ranks + a rank-table LCP walk
    // (SuffixRank: O(n log L) slim shuffles, no suffix text moves); the
    // oracle brute-forces every position pair on the capped corpus, so the
    // exactness claim is hash-checked against the definition itself.
    // q183/q185 share ONE materialized SA + adjacent-LCP artifact
    // (selfSuffixArrays): whichever runs first pays the doubling build,
    // the other loads parquet — the contamHits pattern on the self corpus.
    "q183_unbounded_dup_prefix" -> Q(
      (s, dir) => graft.operators.SuffixRank.longestDupPrefixFromLcp(
        selfSuffixArrays(s, dir)._2, minLen = 12),
      Some(s"""WITH ${lcpBruteCtes("doc_id < 8",
                 "NOT (a.doc_id = b.doc_id AND a.pos = b.pos)")}
             |SELECT doc_id, pos, lcp FROM best WHERE lcp >= 12
             |ORDER BY doc_id, pos""".stripMargin)),

    // The REPEAT LEXICON (round-11 backlog 2, the second SuffixRank finish):
    // every MAXIMAL repeat (Gusfield §7.12 — ≥ 2 occurrences, extendable
    // neither left nor right without losing one) with its length, occurrence
    // count, and document spread. Computed as the LCP-interval enumeration
    // over the distributed suffix ranks (doubling sparse-min tables + a
    // binary-descent extent walk — only slim longs shuffle; document text is
    // read once per surviving repeat). The oracle brute-forces EVERY
    // substring of the capped corpus and applies the textbook definition
    // directly — distinct preceding and following characters ≥ 2, with
    // document boundaries as per-occurrence sentinels — so the suffix-tree
    // interval construction is hash-checked against the definition itself.
    // Same 8×128 cap as q183: the oracle is O(n²·L), the operator is not.
    "q185_repeat_lexicon" -> Q(
      (s, dir) => {
        val (sa, lcpPairs) = selfSuffixArrays(s, dir)
        graft.operators.SuffixRank.maximalRepeatsFromArrays(
          contamCorpus(s, dir).filter(col("doc_id") < 8), "doc_id", "t",
          sa, lcpPairs, minLen = 6)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, substr(text, 1, 128) AS t FROM documents WHERE doc_id < 8),
             |ls AS (
             |  SELECT doc_id, t, unnest(generate_series(6, length(t))) AS len FROM d),
             |occ AS (
             |  SELECT doc_id, t, len, unnest(generate_series(0, length(t) - len)) AS pos
             |  FROM ls),
             |feat AS (
             |  SELECT substr(t, CAST(pos + 1 AS INTEGER), CAST(len AS INTEGER)) AS s,
             |    doc_id,
             |    CASE WHEN pos = 0 THEN '^' || doc_id
             |         ELSE substr(t, CAST(pos AS INTEGER), 1) END AS prev,
             |    CASE WHEN pos + len = length(t) THEN '$' || doc_id || ':' || pos
             |         ELSE substr(t, CAST(pos + len + 1 AS INTEGER), 1) END AS nxt
             |  FROM occ),
             |grp AS (
             |  SELECT s, count(*) AS n_occ, count(DISTINCT prev) AS np,
             |         count(DISTINCT nxt) AS nn, count(DISTINCT doc_id) AS n_docs
             |  FROM feat GROUP BY s)
             |SELECT s AS repeat, CAST(length(s) AS BIGINT) AS len,
             |       CAST(n_occ AS BIGINT) AS n_occ, CAST(n_docs AS BIGINT) AS n_docs
             |FROM grp WHERE n_occ >= 2 AND np >= 2 AND nn >= 2
             |ORDER BY repeat""".stripMargin)),

    // CROSS-CORPUS contamination spans (the third SuffixRank finish): for
    // every position of every TEST document, the length of the longest
    // substring starting there that appears anywhere in the TRAIN corpus —
    // unbounded length, exact. The fixed-n Bloom decontamination (q101
    // family) answers "does any n-gram collide"; this answers "how LONG is
    // the longest shared span", the quantity that separates a quoted
    // benchmark answer from an incidental n-gram. Computed on the union
    // suffix array: each test suffix probes its nearest train neighbor on
    // each SA side (two Scan.runningLast prefix scans) and walks the rank
    // tables — the matching-statistics argument, so recall is structural,
    // not sampled. Oracle: the q183 brute force restricted to cross-side
    // pairs, same 128-char cap (the oracle is O(n²·L); the operator isn't).
    // The three finishes (q189/q191/q192) consume ONE materialized hits
    // artifact (contamHits): whichever runs first pays the suffix-rank
    // build, the others load parquet — the build-once/finish-many shape a
    // standing pipeline actually runs (r11 verdict task 1).
    "q189_cross_corpus_contamination" -> Q(
      (s, dir) => contamHits(s, dir).orderBy("doc_id", "pos"),
      Some(s"""WITH $crossCorpusCtes
             |SELECT doc_id, pos, lcp FROM best WHERE lcp >= 12
             |ORDER BY doc_id, pos""".stripMargin)),

    // The decontamination DECISION layer (q189's consumer): qualifying
    // positions contaminate [pos, pos + lcp); overlapping intervals union
    // into maximal mask spans per test doc — the ranges a pipeline blanks
    // before training. Island walk: per-doc running max of span ends marks
    // island starts; window partitions by document, so partition size is
    // bounded by DOCUMENT length, never corpus size.
    "q191_contamination_mask" -> Q(
      (s, dir) => graft.operators.SuffixRank.maskSpansFromHits(contamHits(s, dir)),
      Some(s"""WITH $crossCorpusCtes,
             |$maskSpanCtes
             |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             |  CAST(max(e) - min(pos) AS BIGINT) AS span_len
             |FROM isl2 GROUP BY doc_id, island
             |ORDER BY doc_id, span_start""".stripMargin)),

    // The corpus-health REPORT over the mask: per test doc the masked
    // character mass, contamination fraction, and the drop/keep verdict —
    // clean docs included with zero mass (left join), because a gate that
    // only lists offenders can't certify the rest.
    "q192_contamination_rate" -> Q(
      (s, dir) => graft.operators.SuffixRank.rateFromHits(
        contamHits(s, dir),
        contamCorpus(s, dir).filter(col("doc_id") >= 8 && col("doc_id") < 12),
        "doc_id", "t", maxFrac = 0.3),
      Some(contamRateOracle)),

    // INCREMENTAL maintenance of the contamination index (r11 verdict task
    // 1's second half — the q181 maintenance-equals-rebuild algebra on the
    // heaviest index in the repo): test batches arrive separately (docs
    // 8-9, then 10-11), each is decontaminated against the STANDING train
    // corpus and its hits APPENDED to the parquet-backed artifact; the
    // rate report runs over the maintained union. The decomposition is
    // exact, not approximate: a test suffix's nearest TRAIN neighbors in
    // the generalized SA order depend only on that suffix and the train
    // set (other test docs between them never change which train suffix
    // is nearest), so overlap(train, A ∪ B) = overlap(train, A) ∪
    // overlap(train, B) — and the oracle is q192's FULL-REBUILD brute
    // force verbatim, which is what makes maintained ≡ rebuilt a checked
    // hash, not a claim. Per-batch cost is O((|train|+|batch|) log L);
    // batch appends are staged, atomic, and idempotent (skip-if-live),
    // the reference's mtime short-circuit applied to a suffix index.
    "q195_contamination_incremental" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = contamCorpus(s, dir)
        val train = d.filter(col("doc_id") < 8)
        val root = ArtifactStore.rootFor(dir, "contam_hits_inc_tr8_c128_m12_v1")
        def batch(id: Long, lo: Int, hi: Int): Unit =
          ArtifactStore.appendBatchIfAbsent(s, root, id) {
            graft.operators.SuffixRank.crossCorpusOverlap(s, train,
              d.filter(col("doc_id") >= lo && col("doc_id") < hi),
              "doc_id", "t", minLen = 12)
          }
        batch(0, 8, 10)
        batch(1, 10, 12)
        graft.operators.SuffixRank.rateFromHits(
          ArtifactStore.readBatches(s, root),
          d.filter(col("doc_id") >= 8 && col("doc_id") < 12),
          "doc_id", "t", maxFrac = 0.3)
      },
      Some(contamRateOracle)),

    // ERASURE through the contamination-spans artifact (r17 verdict item
    // 4 — the one id-referencing artifact family without a purge query):
    // q195's incrementally-maintained hits table references TEST doc ids,
    // so a GDPR deletion of test docs purges their hit rows from every
    // live batch (IndexErasure.purgeBatches; tombstones {9, 10} touch BOTH
    // batches — 9 lives in b0, 10 in b1). Each hit row depends only on
    // (its test doc, the standing train corpus) — the same decomposition
    // that makes q195's appends exact — so purge ≡ rebuild-on-survivors,
    // and the oracle is q192's full brute-force rebuild with the
    // tombstoned docs excluded: the q195 oracle shape on the survivor set.
    "q265_contamination_hits_purge" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = contamCorpus(s, dir)
        val train = d.filter(col("doc_id") < 8)
        val root = ArtifactStore.rootFor(dir, "contam_hits_erz_tr8_c128_m12_v1")
        def batch(id: Long, lo: Int, hi: Int): Unit =
          ArtifactStore.appendBatchIfAbsent(s, root, id) {
            graft.operators.SuffixRank.crossCorpusOverlap(s, train,
              d.filter(col("doc_id") >= lo && col("doc_id") < hi),
              "doc_id", "t", minLen = 12)
          }
        batch(0, 8, 10)
        batch(1, 10, 12)
        val tomb = d.filter(col("doc_id") === 9 || col("doc_id") === 10)
          .select("doc_id")
        graft.pipeline.IndexErasure.purgeBatches(s, root,
          refCols = Seq("doc_id"), tombstones = tomb, idCol = "doc_id")
        graft.operators.SuffixRank.rateFromHits(
          ArtifactStore.readBatches(s, root),
          d.filter(col("doc_id") >= 8 && col("doc_id") < 12 &&
            col("doc_id") =!= 9 && col("doc_id") =!= 10),
          "doc_id", "t", maxFrac = 0.3)
      },
      Some(contamRateOracleFor(
        "doc_id < 12 AND doc_id NOT IN (9, 10)",
        "doc_id >= 8 AND doc_id < 12 AND doc_id NOT IN (9, 10)"))),

    // TRAIN-SIDE erasure of the contamination artifact — the DERIVED-
    // artifact case of the GDPR taxonomy: hit rows reference only TEST
    // ids, so erasing a TRAIN doc cannot purge rows (nothing references
    // it) — yet the recorded lcp values were computed AGAINST it, so the
    // correct repair is RE-DERIVATION against the surviving train set, not
    // a row filter. This query publishes the per-test-doc IMPACT delta:
    // contamination mass/spans/verdict before (the standing artifact) vs
    // after (rebuilt on train − {3, 7}) — which test docs' drop verdicts
    // flip when a train doc is forgotten. Taxonomy now complete and
    // hash-checked: id-reference artifacts purge rows (q261/q265),
    // content artifacts rewrite touched partitions (q248/q257), derived
    // artifacts recompute (here).
    "q270_contamination_train_erasure" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = contamCorpus(s, dir)
        val test = d.filter(col("doc_id") >= 8 && col("doc_id") < 12)
        val before = contamHits(s, dir)
        val after = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "contam_hits_tr8x37_c128_m12_v1")) {
          graft.operators.SuffixRank.crossCorpusOverlap(s,
            d.filter(col("doc_id") < 8 && col("doc_id") =!= 3 && col("doc_id") =!= 7),
            test, "doc_id", "t", minLen = 12)
        }
        def rate(h: org.apache.spark.sql.DataFrame, suffix: String) =
          graft.operators.SuffixRank.rateFromHits(h, test, "doc_id", "t", maxFrac = 0.3)
            .select(col("doc_id"),
              col("masked_chars").as(s"masked_$suffix"),
              col("n_spans").as(s"n_spans_$suffix"),
              col("drop_doc").as(s"drop_$suffix"))
        rate(before, "before").join(rate(after, "after"), Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT b.doc_id,
             |  b.masked_chars AS masked_before, b.n_spans AS n_spans_before,
             |  b.drop_doc AS drop_before,
             |  a.masked_chars AS masked_after, a.n_spans AS n_spans_after,
             |  a.drop_doc AS drop_after
             |FROM (${contamRateOracleFor("doc_id < 12",
                      "doc_id >= 8 AND doc_id < 12")}) b
             |JOIN (${contamRateOracleFor("doc_id < 12 AND doc_id NOT IN (3, 7)",
                      "doc_id >= 8 AND doc_id < 12")}) a
             |  ON a.doc_id = b.doc_id
             |ORDER BY b.doc_id""".stripMargin)),

    // The NEAR-DUP leg of the decontamination matrix: test docs (doc_id %
    // 5 = 0) whose shingle-Jaccard against ANY train doc clears the q22b
    // threshold — catches contamination that was lightly EDITED on the way
    // into the corpus, which the verbatim legs (fixed-n Bloom q101,
    // unbounded suffix spans q189) structurally miss. Same banded-MinHash
    // pipeline as q22b with the candidate join ACROSS sides; signatures
    // are per-doc, so the oracle reuses the q22b CTE prefix verbatim and
    // only the candidate join changes.
    "q194_cross_corpus_neardup" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Dedup.crossCorpusNearDupPairs(
          d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
          threshold = JaccardThreshold)
      },
      Some(crossNearDupOracle)),

    // The q194 claim made checkable (backlog item 2): "at 100 TB the train
    // side is a precomputed index" — here the train band-key + signature
    // tables are MATERIALIZED artifacts (built once per input dir, loaded
    // thereafter), and the test side arrives as two batches (doc_id % 10 =
    // 0, then = 5), each probing the standing index and appending its
    // pairs. Per-test-doc results depend only on that doc and the train
    // index, so batch probing composes exactly — and the oracle is q194's
    // full two-sided rebuild VERBATIM, which is what makes maintained ≡
    // rebuilt a hash, not a claim. Per-batch cost: the batch's own
    // shingling + bands + candidate join; the train corpus is never
    // rescanned after the first build.
    "q200_neardup_index_incremental" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = Tables.documents(s, dir)
        lazy val idx = graft.operators.Dedup.trainNearDupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        val trainBands = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_bands_s3_h32_b16_v1"))(idx._1)
        val trainSigs = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_sigs_s3_h32_b16_v1"))(idx._2)
        val resRoot = ArtifactStore.rootFor(dir, "neardup_hits_inc_s3_h32_b16_v1")
        def batch(id: Long, m: Int): Unit =
          ArtifactStore.appendBatchIfAbsent(s, resRoot, id) {
            graft.operators.Dedup.crossCorpusNearDupFromIndex(
              trainBands, trainSigs, d.filter(col("doc_id") % 10 === m),
              "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
              threshold = JaccardThreshold)
          }
        batch(0, 0)
        batch(1, 5)
        ArtifactStore.readBatches(s, resRoot).orderBy("test_id", "train_id")
      },
      Some(crossNearDupOracle)),

    // q200's maintenance driven by the STREAMING ENGINE (r12 verdict task
    // 2): test docs arrive as file-source micro-batches, foreachBatch
    // probes each against the standing train artifacts and appends
    // content-keyed batches to the hits artifact — stream-maintained ≡
    // batch-maintained ≡ rebuilt, all three against q194's full two-sided
    // oracle VERBATIM. The last cell of the maintenance matrix: who drives
    // the append (driver calls in q195/q200, the streaming engine here).
    "q203_neardup_stream_maintained" -> Q(
      (s, dir) => graft.streaming.StreamingDedup.streamMaintainedNearDupHits(
        s, dir, shingleSize = 3, numHashes = 32, bands = 16,
        threshold = JaccardThreshold),
      Some(crossNearDupOracle)),

    // The fusion × STREAMING matrix cell: delta docs stream in and probe
    // the standing corpus on the exact-hash AND banded-Jaccard axes as two
    // stateless branches of one streaming source; the drained evidence
    // fuses into one verdict row per delta doc under the q204 precedence.
    // Stream ≡ the batch two-axis probe the oracle computes — the ingest-
    // time form of the verdict fusion decision layer.
    "q210_stream_verdict_gate" -> Q(
      (s, dir) => graft.streaming.StreamingDedup.streamVerdictGate(
        s, dir, shingleSize = 3, numHashes = 32, bands = 16,
        threshold = JaccardThreshold),
      Some(s"""$minhashBkCtes,
             |vex AS (
             |  SELECT DISTINCT d.doc_id FROM documents d
             |  JOIN documents c ON md5(c.text) = md5(d.text) AND c.doc_id % 10 <> 0
             |  WHERE d.doc_id % 10 = 0),
             |vcand AS (
             |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
             |  FROM bk x JOIN bk y ON x.band = y.band AND x.band_key = y.band_key
             |  WHERE y.doc_id % 10 = 0 AND x.doc_id % 10 <> 0
             |  GROUP BY 1, 2),
             |vpairs AS (
             |  SELECT id_a, id_b, ${frs(jacExpr, 4)} AS jac
             |  FROM vcand JOIN sh sa ON vcand.id_a = sa.doc_id
             |             JOIN sh sb ON vcand.id_b = sb.doc_id),
             |vjc AS (SELECT DISTINCT id_b FROM vpairs WHERE jac >= $JaccardThreshold),
             |vfl AS (
             |  SELECT d.doc_id,
             |    CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM vex) THEN 1 ELSE 0 END AS BIGINT) AS f_exact,
             |    CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM vjc) THEN 1 ELSE 0 END AS BIGINT) AS f_jaccard
             |  FROM documents d WHERE d.doc_id % 10 = 0)
             |SELECT doc_id, f_exact, f_jaccard,
             |  CAST(CASE WHEN f_exact + f_jaccard > 0 THEN 1 ELSE 0 END AS BIGINT) AS drop_doc,
             |  CASE WHEN f_exact = 1 THEN 'exact'
             |       WHEN f_jaccard = 1 THEN 'jaccard'
             |       ELSE 'keep' END AS reason
             |FROM vfl ORDER BY doc_id""".stripMargin)),

    // q210 extended with the CROSS-MODAL axis (q212 × streaming): arriving
    // docs also embed map-side and probe a standing SRP semantic index of
    // the corpus — multiprobe expansion on the STATIC side, one bucket
    // evaluation per stream row (see StreamingDedup.streamCrossModalGate).
    // Stream ≡ the batch three-axis probe the oracle computes.
    "q214_stream_cross_modal_gate" -> Q(
      (s, dir) => graft.streaming.StreamingDedup.streamCrossModalGate(
        s, dir, shingleSize = 3, numHashes = 32, bands = 16,
        threshold = JaccardThreshold, embDim = 64, nbits = 0,
        cosThreshold = SemCosThreshold),
      Some(s"""$minhashBkCtes,
             |vex AS (
             |  SELECT DISTINCT d.doc_id FROM documents d
             |  JOIN documents c ON md5(c.text) = md5(d.text) AND c.doc_id % 10 <> 0
             |  WHERE d.doc_id % 10 = 0),
             |vcand AS (
             |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
             |  FROM bk x JOIN bk y ON x.band = y.band AND x.band_key = y.band_key
             |  WHERE y.doc_id % 10 = 0 AND x.doc_id % 10 <> 0
             |  GROUP BY 1, 2),
             |vpairs AS (
             |  SELECT id_a, id_b, ${frs(jacExpr, 4)} AS jac
             |  FROM vcand JOIN sh sa ON vcand.id_a = sa.doc_id
             |             JOIN sh sb ON vcand.id_b = sb.doc_id),
             |vjc AS (SELECT DISTINCT id_b FROM vpairs WHERE jac >= $JaccardThreshold),
             |${semEmbedCtes(semNScopeStream, semMuWhereStream)},
             |xse AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    ${frs("list_cosine_similarity(a.v, b.v)", 6)} AS score
             |  FROM sebuck a JOIN sebuck b
             |    ON a.band = b.band AND a.bucket = b.bucket
             |      AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |  WHERE list_sum(list_transform(a.v, x -> x*x)) > CAST(0.0 AS DOUBLE)
             |    AND list_sum(list_transform(b.v, x -> x*x)) > CAST(0.0 AS DOUBLE)),
             |xsel AS (SELECT DISTINCT id_b FROM xse WHERE score >= CAST($SemCosThreshold AS DOUBLE)),
             |vfl AS (
             |  SELECT d.doc_id,
             |    CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM vex) THEN 1 ELSE 0 END AS BIGINT) AS f_exact,
             |    CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM vjc) THEN 1 ELSE 0 END AS BIGINT) AS f_jaccard,
             |    CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM xsel) THEN 1 ELSE 0 END AS BIGINT) AS f_semantic
             |  FROM documents d WHERE d.doc_id % 10 = 0)
             |SELECT doc_id, f_exact, f_jaccard, f_semantic,
             |  CAST(CASE WHEN f_exact + f_jaccard + f_semantic > 0 THEN 1 ELSE 0 END AS BIGINT) AS drop_doc,
             |  CASE WHEN f_exact = 1 THEN 'exact'
             |       WHEN f_jaccard = 1 THEN 'jaccard'
             |       WHEN f_semantic = 1 THEN 'semantic'
             |       ELSE 'keep' END AS reason
             |FROM vfl ORDER BY doc_id""".stripMargin)),

    // MULTI-DETECTOR VERDICT FUSION (r12 verdict task 3): the library's four
    // text dup detectors composed into ONE per-doc decision relation —
    // evidence flag per axis, drop/keep, and a precedence-attributed reason
    // (exact > containment > jaccard > simhash, strongest evidence first).
    // Thresholds are the detectors' own registered ones (q22b/q81/q22c), so
    // the fusion oracle is left-joins of those queries' CTEs — the DECISION
    // layer, not just the parts, is hash-checked.
    "q204_dedup_verdict_fusion" -> Q(
      (s, dir) => Dedup.verdictFusion(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16,
        jacThreshold = JaccardThreshold, containThreshold = 0.6, maxHamming = 8),
      Some(s"""$fusionVerdictCtes
             |SELECT doc_id, f_exact, f_containment, f_jaccard, f_simhash,
             |  drop_doc, reason
             |FROM ver ORDER BY doc_id""".stripMargin)),

    // The fusion ATTRITION FUNNEL: per axis the flagged count (overlapping),
    // the precedence-ATTRIBUTED count (sums to total drops), and survivors
    // as axes apply in order — what a curation run publishes so a detector
    // suddenly attributing 40% of drops is visible, not buried.
    "q205_dedup_verdict_funnel" -> Q(
      (s, dir) => Dedup.verdictFunnel(
        Dedup.verdictFusion(Tables.documents(s, dir), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16,
          jacThreshold = JaccardThreshold, containThreshold = 0.6, maxHamming = 8),
        "doc_id"),
      Some(s"""$fusionVerdictCtes,
             |ax AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'exact'),
             |  (CAST(1 AS BIGINT), 'containment'), (CAST(2 AS BIGINT), 'jaccard'),
             |  (CAST(3 AS BIGINT), 'simhash')) AS t(axis_idx, axis))
             |SELECT a.axis_idx, a.axis,
             |  CAST(sum(CASE a.axis WHEN 'exact' THEN v.f_exact
             |    WHEN 'containment' THEN v.f_containment
             |    WHEN 'jaccard' THEN v.f_jaccard
             |    ELSE v.f_simhash END) AS BIGINT) AS n_flagged,
             |  CAST(sum(CASE WHEN v.reason = a.axis THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
             |  CAST(sum(CASE a.axis_idx
             |    WHEN 0 THEN CASE WHEN v.reason IN ('exact') THEN 0 ELSE 1 END
             |    WHEN 1 THEN CASE WHEN v.reason IN ('exact', 'containment') THEN 0 ELSE 1 END
             |    WHEN 2 THEN CASE WHEN v.reason IN ('exact', 'containment', 'jaccard') THEN 0 ELSE 1 END
             |    ELSE CASE WHEN v.reason IN ('exact', 'containment', 'jaccard', 'simhash') THEN 0 ELSE 1 END
             |  END) AS BIGINT) AS n_surviving,
             |  (SELECT CAST(count(*) AS BIGINT) FROM ver) AS n_docs
             |FROM ax a CROSS JOIN ver v
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // CROSS-MODALITY VERDICT FUSION (r12 backlog: fusion × modality): the
    // four text axes of q204 plus a SEMANTIC axis computed in embedding
    // space — the corpus embedded by the deterministic HashingEmbedder
    // (q35's pluggable embed step), SRP-LSH bucketed (q27/q28's integer
    // hyperplanes), exact-cosine verified at the fixture-calibrated 0.95.
    // The shared id space IS doc_id: a curation run embeds its own corpus,
    // so every axis keys on the document spine and the five-axis decision
    // is one hash-checked relation. Precedence: exact > containment >
    // jaccard > semantic > simhash (see Dedup.crossModalVerdict).
    "q212_cross_modal_verdict" -> Q(
      (s, dir) => crossModalVerdictOf(s, dir),
      Some(s"""$crossModalVerdictCtes
             |SELECT doc_id, f_exact, f_containment, f_jaccard, f_semantic,
             |  f_simhash, drop_doc, reason
             |FROM ver ORDER BY doc_id""".stripMargin)),

    // q205's attrition funnel over the five-axis cross-modal verdict — the
    // report that shows what the semantic axis catches that the four text
    // axes miss (its n_attributed is exactly the docs ONLY embedding-space
    // evidence flagged).
    "q213_cross_modal_funnel" -> Q(
      (s, dir) => Dedup.verdictFunnel(crossModalVerdictOf(s, dir), "doc_id",
        axes = Seq("exact", "containment", "jaccard", "semantic", "simhash")),
      Some(s"""$crossModalVerdictCtes,
             |ax AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'exact'),
             |  (CAST(1 AS BIGINT), 'containment'), (CAST(2 AS BIGINT), 'jaccard'),
             |  (CAST(3 AS BIGINT), 'semantic'), (CAST(4 AS BIGINT), 'simhash')) AS t(axis_idx, axis))
             |SELECT a.axis_idx, a.axis,
             |  CAST(sum(CASE a.axis WHEN 'exact' THEN v.f_exact
             |    WHEN 'containment' THEN v.f_containment
             |    WHEN 'jaccard' THEN v.f_jaccard
             |    WHEN 'semantic' THEN v.f_semantic
             |    ELSE v.f_simhash END) AS BIGINT) AS n_flagged,
             |  CAST(sum(CASE WHEN v.reason = a.axis THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
             |  CAST(sum(CASE a.axis_idx
             |    WHEN 0 THEN CASE WHEN v.reason IN ('exact') THEN 0 ELSE 1 END
             |    WHEN 1 THEN CASE WHEN v.reason IN ('exact', 'containment') THEN 0 ELSE 1 END
             |    WHEN 2 THEN CASE WHEN v.reason IN ('exact', 'containment', 'jaccard') THEN 0 ELSE 1 END
             |    WHEN 3 THEN CASE WHEN v.reason IN ('exact', 'containment', 'jaccard', 'semantic') THEN 0 ELSE 1 END
             |    ELSE CASE WHEN v.reason IN ('exact', 'containment', 'jaccard', 'semantic', 'simhash') THEN 0 ELSE 1 END
             |  END) AS BIGINT) AS n_surviving,
             |  (SELECT CAST(count(*) AS BIGINT) FROM ver) AS n_docs
             |FROM ax a CROSS JOIN ver v
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // THE FULL-STACK VERDICT (fusion × every modality the library detects
    // in): six axes on one doc spine — the four text detectors, the
    // embedding-space semantic axis (q212), and the PERCEPTUAL MEDIA axis
    // (q159's dHash banding over each doc's media rendition — simulated
    // reused footage keyed by (source, doc_id % 25) with per-doc byte
    // noise, so byte-exact media dedup misses every pair the axis catches;
    // id = doc_id, the spine is shared by construction). This is the
    // multimodal dup phenomenon text detectors cannot see: same footage
    // under different articles. Precedence: exact > containment > jaccard
    // > semantic > perceptual > simhash (hamming ≤ 3 of 60 is tighter
    // evidence than simhash's ≤ 8). Composed from the shared axis
    // primitives — the same loser relations the smaller fusions use.
    "q217_full_stack_verdict" -> Q(
      (s, dir) => fullStackVerdictOf(s, dir),
      Some(s"""$fullStackVerdictCtes
             |SELECT doc_id, f_exact, f_containment, f_jaccard, f_semantic,
             |  f_perceptual, f_simhash, drop_doc, reason
             |FROM ver ORDER BY doc_id""".stripMargin)),

    // PAIRWISE DETECTOR AGREEMENT (Cohen's kappa) over the five-axis
    // cross-modal verdict: the inter-detector structure report next to the
    // attrition funnel — kappa ≈ 1 flags a redundant detector, kappa ≈ 0
    // means the axes catch different duplication phenomena. All statistics
    // reduce to ONE integer-exact division (see Dedup.detectorAgreement),
    // so the whole report is hash-checkable.
    "q216_detector_agreement" -> Q(
      (s, dir) => Dedup.detectorAgreement(crossModalVerdictOf(s, dir),
        axes = Seq("exact", "containment", "jaccard", "semantic", "simhash")),
      Some(
        s"""$crossModalVerdictCtes,
           |${kappaTailSql(Seq("exact", "containment", "jaccard", "semantic", "simhash"), "ver")}""".stripMargin)),

    // SEQUENCE PACKING, the per-SEQUENCE view: q61 assigns docs to bins per
    // source shard (windowed cumsum, one shuffle on the shard key); this is
    // the complementary GLOBAL pack — the corpus cut into 128-token
    // sequences in doc_id order, reporting per sequence the docs it mixes,
    // the doc boundaries falling in it, and its fill (1.0 everywhere but
    // the tail, asserted by the oracle hash). The global token offset is
    // the two-pass Blelloch prefix scan (Scan.cumSums); the oracle's
    // data-sized `sum() OVER (ORDER BY doc_id)` is exactly the
    // single-partition window the Spark side must NOT use (q173's contrast).
    "q215_sequence_packing" -> Q(
      (s, dir) => graft.operators.Packing.packSequences(
        Tables.documents(s, dir), "doc_id", "text", seqLen = 128),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cs AS (
             |  SELECT doc_id, n_tok,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM tc),
             |d AS (
             |  SELECT doc_id, n_tok, cum - n_tok AS start_off, cum - 1 AS end_off FROM cs),
             |spans AS (
             |  SELECT doc_id, start_off, end_off,
             |    unnest(generate_series(start_off // 128, end_off // 128)) AS seq_id
             |  FROM d)
             |SELECT seq_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN start_off >= seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
             |  CAST(sum(least(end_off, (seq_id + 1) * 128 - 1)
             |    - greatest(start_off, seq_id * 128) + 1) AS BIGINT) AS n_tokens,
             |  ${frs("CAST(sum(least(end_off, (seq_id + 1) * 128 - 1) - greatest(start_off, seq_id * 128) + 1) AS DOUBLE) / CAST(128.0 AS DOUBLE)", 4)} AS fill
             |FROM spans GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q215 DENOMINATED IN BPE TOKENS (r13 verdict task 2): the sequence
    // capacity a real training loader fills is counted by its tokenizer,
    // not by whitespace — the reference's own length guard is tiktoken-
    // based (vectrekker/main.py:170,175). Same two-pass Blelloch prefix
    // scan, same per-sequence report; the only change is the token model
    // (the vendored byte-level BPE, q18b's engine), and the oracle derives
    // its counts from the SAME recursive-CTE merge loop as q18b — so a
    // drift anywhere between the Scala tokenizer and the merge table lands
    // in this hash too.
    "q215b_sequence_packing_bpe" -> Q(
      (s, dir) => graft.operators.Packing.packSequences(
        Tables.documents(s, dir), "doc_id", "text", seqLen = 128,
        countTokens = bpeTokenCount),
      Some(s"""$bpeTcCtes,
             |cs AS (
             |  SELECT doc_id, n_tok,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM tc),
             |d AS (
             |  SELECT doc_id, n_tok, cum - n_tok AS start_off, cum - 1 AS end_off FROM cs),
             |spans AS (
             |  SELECT doc_id, start_off, end_off,
             |    unnest(generate_series(start_off // 128, end_off // 128)) AS seq_id
             |  FROM d)
             |SELECT seq_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN start_off >= seq_id * 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
             |  CAST(sum(least(end_off, (seq_id + 1) * 128 - 1)
             |    - greatest(start_off, seq_id * 128) + 1) AS BIGINT) AS n_tokens,
             |  ${frs("CAST(sum(least(end_off, (seq_id + 1) * 128 - 1) - greatest(start_off, seq_id * 128) + 1) AS DOUBLE) / CAST(128.0 AS DOUBLE)", 4)} AS fill
             |FROM spans GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q215's packing MAINTAINED FROM A STREAM (packing × streaming): docs
    // land as contiguous-range micro-batches; each batch appends its
    // within-batch exclusive cumsum + batch total (content-keyed, replay-
    // idempotent), and the read-side reconciliation sums lower-keyed batch
    // totals — the Blelloch two-pass prefix scan at ingest granularity,
    // independent of arrival order. Stream-maintained ≡ the batch global
    // pack under the same window-cumsum oracle.
    "q218_stream_packing" -> Q(
      (s, dir) => graft.streaming.StreamingPacking.streamPackedOffsets(
        s, dir, seqLen = 128),
      Some("""WITH tc AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cs AS (
             |  SELECT doc_id, n_tok,
             |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
             |  FROM tc)
             |SELECT doc_id, n_tok, start_off,
             |  start_off // 128 AS bin_id, start_off % 128 AS bin_offset
             |FROM cs ORDER BY doc_id""".stripMargin)),

    // THE END-TO-END CAPSTONE — curate → mix → pack in ONE declarative
    // chain, the composition a training-data run actually executes:
    //   1. the q217 SIX-axis verdict (text × embedding × perceptual media)
    //      decides keeps;
    //   2. temperatureMix(α=0.5, budget=100) allocates over the surviving
    //      per-source counts (quotas react to what curation REMOVED — the
    //      reason allocation must follow the verdict, not precede it);
    //   3. takeQuota executes the allocation (hash-priority top-quota,
    //      literal-capped window);
    //   4. packSequences cuts the final sample into 128-token training
    //      sequences (global two-pass prefix scan) and reports each
    //      sequence's mix/boundaries/fill.
    // The WHOLE chain carries one oracle (q57/q208-style): a wrong verdict
    // flag, a misallocated quota, a mis-ranked selection, or an off-by-one
    // pack boundary each lands in the final hash.
    "q219_curate_mix_pack" -> Q(
      (s, dir) => {
        // cache-lifetime: pinned by the returned plan — caller releases (see
        // Caching). Downstream actions execute keeps repeatedly (the mix's
        // per-source counts, takeQuota's max-quota fetch + data pass, the
        // prefix scan's partials, the final write) — uncached, EACH re-runs
        // the six-axis verdict subtree
        val keeps = Tables.documents(s, dir).select("doc_id", "source", "text")
          .join(fullStackVerdictOf(s, dir).filter(col("drop_doc") === 0)
            .select("doc_id"), Seq("doc_id"))
          .cache()
        val quotas = graft.operators.Sampling.temperatureMix(
          keeps.groupBy(col("source")).agg(count(lit(1)).as("n")),
          "source", "n", alpha = 0.5, budget = 100L)
        val sample = graft.operators.Sampling.takeQuota(
          keeps, "doc_id", "source", quotas)
        graft.operators.Packing.packSequences(
          sample.select("doc_id", "text"), "doc_id", "text", seqLen = 128)
      },
      Some(s"""$fullStackVerdictCtes,
             |$curateMixPackTailSql""".stripMargin)),

    // DETECTOR AGREEMENT × STREAMING: Cohen's kappa between the three axes
    // of the streamed cross-modal ingest gate (q214) — the agreement
    // structure of the DEPLOYED gate's detectors over arriving documents,
    // not the batch corpus's. Composition: the gate's drained verdict
    // relation feeds the same integer-exact kappa aggregate as q216; the
    // report stays parameter-sized (one row per axis pair).
    "q220_stream_agreement" -> Q(
      (s, dir) => Dedup.detectorAgreement(
        graft.streaming.StreamingDedup.streamCrossModalGate(
          s, dir, shingleSize = 3, numHashes = 32, bands = 16,
          threshold = JaccardThreshold, embDim = 64, nbits = 0,
          cosThreshold = SemCosThreshold),
        axes = Seq("exact", "jaccard", "semantic")),
      Some(s"""$minhashBkCtes,
             |vex AS (
             |  SELECT DISTINCT d.doc_id FROM documents d
             |  JOIN documents c ON md5(c.text) = md5(d.text) AND c.doc_id % 10 <> 0
             |  WHERE d.doc_id % 10 = 0),
             |vcand AS (
             |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
             |  FROM bk x JOIN bk y ON x.band = y.band AND x.band_key = y.band_key
             |  WHERE y.doc_id % 10 = 0 AND x.doc_id % 10 <> 0
             |  GROUP BY 1, 2),
             |vpairs AS (
             |  SELECT id_a, id_b, ${frs(jacExpr, 4)} AS jac
             |  FROM vcand JOIN sh sa ON vcand.id_a = sa.doc_id
             |             JOIN sh sb ON vcand.id_b = sb.doc_id),
             |vjc AS (SELECT DISTINCT id_b FROM vpairs WHERE jac >= $JaccardThreshold),
             |${semEmbedCtes(semNScopeStream, semMuWhereStream)},
             |xse AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    ${frs("list_cosine_similarity(a.v, b.v)", 6)} AS score
             |  FROM sebuck a JOIN sebuck b
             |    ON a.band = b.band AND a.bucket = b.bucket
             |      AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |  WHERE list_sum(list_transform(a.v, x -> x*x)) > CAST(0.0 AS DOUBLE)
             |    AND list_sum(list_transform(b.v, x -> x*x)) > CAST(0.0 AS DOUBLE)),
             |xsel AS (SELECT DISTINCT id_b FROM xse WHERE score >= CAST($SemCosThreshold AS DOUBLE)),
             |vfl AS (
             |  SELECT d.doc_id,
             |    CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM vex) THEN 1 ELSE 0 END AS BIGINT) AS f_exact,
             |    CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM vjc) THEN 1 ELSE 0 END AS BIGINT) AS f_jaccard,
             |    CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM xsel) THEN 1 ELSE 0 END AS BIGINT) AS f_semantic
             |  FROM documents d WHERE d.doc_id % 10 = 0),
             |${kappaTailSql(Seq("exact", "jaccard", "semantic"), "vfl")}""".stripMargin)),

    // EXPORT MANIFEST — the last mile: the corpus cut into ≈4096-token
    // shards (whole documents, shard = floor(global_start_offset/budget)
    // over the two-pass prefix scan; a shard overflows by at most one doc —
    // file boundaries must never cut a document) with the per-shard
    // manifest a training loader verifies: counts, token mass, id range,
    // source breadth, and an ORDER-SENSITIVE checksum (md5 over per-doc
    // md5(text) concatenated in doc_id order) — any reorder/drop/dup/
    // mutation inside a shard names the shard. The oracle's string_agg
    // ORDER BY is exactly the bounded-by-budget concatenation the Spark
    // side builds via sort_array over the shard group.
    "q221_export_manifest" -> Q(
      (s, dir) => graft.operators.Export.shardManifest(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cs AS (
             |  SELECT doc_id, source, text, n_tok,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |sh2 AS (SELECT *, start_off // 4096 AS shard_id FROM cs)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q221 BUDGETED IN BPE TOKENS (r13 verdict task 2): the shard mass a
    // training loader verifies is denominated by its tokenizer — whitespace
    // budgets drift from the real cost by the corpus's words-per-token mix.
    // Identical manifest pipeline (prefix scan → shard_id → order-sensitive
    // checksum); the token model is the vendored byte-level BPE, and the
    // oracle's counts come from the SAME recursive-CTE merge loop as q18b.
    "q221b_export_manifest_bpe" -> Q(
      (s, dir) => graft.operators.Export.shardManifest(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L, countTokens = bpeTokenCount),
      Some(s"""$bpeTcCtes,
             |cs AS (
             |  SELECT doc_id, source, text, n_tok,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |sh2 AS (SELECT *, start_off // 4096 AS shard_id FROM cs)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The export ROUNDTRIP: writeShards physically lands one hive-style
    // directory per shard, auditShards re-derives the manifest FROM the
    // shipped files (the consumer's integrity check) — and that re-derived
    // manifest must pass the SAME oracle as q221. Divergence anywhere in
    // write → read → re-manifest (lost rows, split docs, mangled text,
    // wrong shard membership) lands in a checksum mismatch.
    "q222_export_roundtrip" -> Q(
      (s, dir) => {
        val out = java.nio.file.Files.createTempDirectory("graft_export").toString
        graft.operators.Export.writeShards(
          Tables.documents(s, dir), "doc_id", "text", "source",
          shardTokenBudget = 4096L, outDir = out)
        val audited = graft.operators.Export.auditShards(
          s, out, "doc_id", "text", "source", shardTokenBudget = 4096L)
        // the audited manifest is parameter-sized (one row per shard, shard
        // count = corpus_tokens / budget) — materialize it on the driver,
        // then DELETE the corpus-sized scratch shard dir instead of leaking
        // one per harness run (ADVICE r13 item 5)
        import scala.jdk.CollectionConverters._
        val manifest = s.createDataFrame(
          audited.collect().toSeq.asJava, audited.schema)
        graft.streaming.StreamingDrift.deleteTempDir(java.nio.file.Paths.get(out))
        manifest
      },
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cs AS (
             |  SELECT doc_id, source, text, n_tok,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |sh2 AS (SELECT *, start_off // 4096 AS shard_id FROM cs)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q221's manifest MAINTAINED FROM A STREAM (export × streaming): each
    // micro-batch appends its docs' (source, md5, n_tok) + within-batch
    // cumsum to the content-keyed artifact (the q218 two-pass trick); the
    // read side reconciles offsets, assigns shards, and finishes through
    // the SAME manifest aggregate as the batch path — stream ≡ batch by
    // construction, checked against q221's oracle verbatim.
    "q223_stream_export_manifest" -> Q(
      (s, dir) => graft.streaming.StreamingExport.streamShardManifest(
        s, dir, shardTokenBudget = 4096L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cs AS (
             |  SELECT doc_id, source, text, n_tok,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |sh2 AS (SELECT *, start_off // 4096 AS shard_id FROM cs)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // INCREMENTAL RE-EXPORT PLANNING: the manifest delta between the corpus
    // BEFORE append-only growth (doc_id < 80% of max — ids only grow, the
    // shard assignment's contract) and after. Because offsets of
    // already-full shards are untouched by appended ids, the delta is
    // exactly the old TAIL shard (partial window gained docs) + the added
    // shards — what a shipper re-ships vs skips, quantified per shard. The
    // oracle computes both manifests and full-outer joins them; the
    // unchanged-majority is the measured incremental-export win.
    "q224_export_delta" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        // bounded parameter fetch; integer math on the driver (Spark's `/`
        // on columns is double division)
        val cutoff = docs.agg(max("doc_id")).head.getLong(0) * 8 / 10
        val oldM = graft.operators.Export.shardManifest(
          docs.filter(col("doc_id") < cutoff), "doc_id", "text", "source", 4096L)
        val newM = graft.operators.Export.shardManifest(
          docs, "doc_id", "text", "source", 4096L)
        graft.operators.Export.manifestDelta(oldM, newM)
      },
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |cut AS (SELECT max(doc_id) * 8 // 10 AS c FROM documents),
             |oldc AS (
             |  SELECT doc_id, n_tok, text,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) // 4096 AS shard_id
             |  FROM tc, cut WHERE doc_id < c),
             |oldm AS (
             |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs_old,
             |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum_old
             |  FROM oldc GROUP BY 1),
             |newc AS (
             |  SELECT doc_id, n_tok, text,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) // 4096 AS shard_id
             |  FROM tc),
             |newm AS (
             |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs_new,
             |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum_new
             |  FROM newc GROUP BY 1)
             |SELECT shard_id,
             |  CASE WHEN checksum_old IS NULL THEN 'added'
             |       WHEN checksum_new IS NULL THEN 'removed'
             |       WHEN checksum_old = checksum_new THEN 'unchanged'
             |       ELSE 'changed' END AS status,
             |  n_docs_old, n_docs_new, checksum_old, checksum_new
             |FROM oldm FULL OUTER JOIN newm USING (shard_id)
             |ORDER BY 1""".stripMargin)),

    // CONTENT-DEFINED shard boundaries (the CDC trade q224 motivates): a
    // boundary falls before every doc whose md5 prefix is < '10' (prob
    // 16/256 → geometric gaps, mean 16 docs), shard = running cut count
    // over the prefix scan. Fixed-length lowercase hex compares
    // lexicographically ⇔ numerically — the predicate is bit-identical
    // across engines, so even the boundary DECISION is oracle-checked.
    "q225_export_manifest_cdc" -> Q(
      (s, dir) => graft.operators.Export.shardManifestCdc(
        Tables.documents(s, dir), "doc_id", "text", "source",
        cutThresholdHex = "10"),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CASE WHEN substr(md5(text), 1, 2) < '10' THEN 1 ELSE 0 END AS cut
             |  FROM documents),
             |sh3 AS (
             |  SELECT *, CAST(sum(cut) OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |  FROM tc)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh3 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The payoff measured: remove ONE mid-corpus (non-boundary) document
    // and diff the CDC manifests — exactly one shard changes, nothing
    // ripples (q224's offset-based delta changes every downstream shard on
    // the same edit). The removed doc is picked deterministically in both
    // engines: the smallest doc_id that is not a boundary doc.
    "q226_export_delta_cdc" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        val victim = docs
          .filter(substring(md5(col("text")), 1, 2) >= lit("10"))
          .agg(min("doc_id")).head.getLong(0) // bounded parameter fetch
        val before = graft.operators.Export.shardManifestCdc(
          docs, "doc_id", "text", "source", "10")
        val after = graft.operators.Export.shardManifestCdc(
          docs.filter(col("doc_id") =!= victim), "doc_id", "text", "source", "10")
        graft.operators.Export.manifestDelta(before, after)
      },
      Some(s"""WITH vic AS (
             |  SELECT min(doc_id) AS v FROM documents
             |  WHERE substr(md5(text), 1, 2) >= '10'),
             |tc0 AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CASE WHEN substr(md5(text), 1, 2) < '10' THEN 1 ELSE 0 END AS cut
             |  FROM documents),
             |bsh AS (
             |  SELECT *, CAST(sum(cut) OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |  FROM tc0),
             |bm AS (
             |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs_old,
             |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum_old
             |  FROM bsh GROUP BY 1),
             |ash AS (
             |  SELECT *, CAST(sum(cut) OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |  FROM tc0, vic WHERE doc_id <> v),
             |am AS (
             |  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs_new,
             |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum_new
             |  FROM ash GROUP BY 1)
             |SELECT shard_id,
             |  CASE WHEN checksum_old IS NULL THEN 'added'
             |       WHEN checksum_new IS NULL THEN 'removed'
             |       WHEN checksum_old = checksum_new THEN 'unchanged'
             |       ELSE 'changed' END AS status,
             |  n_docs_old, n_docs_new, checksum_old, checksum_new
             |FROM bm FULL OUTER JOIN am USING (shard_id)
             |ORDER BY 1""".stripMargin)),

    // TOKEN-AWARE CDC boundaries (the q225 refinement): cut probability
    // scales with doc length — P(boundary) = min(1, n_tok/4096) via the
    // exact integer comparison hv·budget < n_tok·65536 (hv = strpos-decoded
    // first four md5 hex chars; the SAME expression string runs in Spark
    // and DuckDB), so the boundary rate per TOKEN is constant and MEAN
    // shard mass equals the budget regardless of the doc-length mix (the
    // flat threshold's mean drifts with average length). Gap variance
    // stays exponential — plain CDC; see the operator scaladoc for the
    // measured numbers and the TTTD tightening. Keeps q225's edit
    // locality (content-only decision).
    "q227_export_manifest_cdc_tok" -> Q(
      (s, dir) => graft.operators.Export.shardManifestCdcTokenAware(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |tcc AS (
             |  SELECT *, CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cut
             |  FROM tc),
             |sh4 AS (
             |  SELECT *, CAST(sum(cut) OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |  FROM tcc)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh4 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TTTD MIN-GAP BOUND over the token-aware CDC boundaries (r13 verdict
    // task 5): q227's cuts give exponential gaps (CV ≈ 1 — the plain-CDC
    // trade); Eshghi & Tang's min threshold suppresses any cut candidate
    // closer than 2048 tokens to its previous candidate, hard-flooring
    // every surviving shard at 2048 tokens and cutting the short-gap mass
    // out of the variance. Suppression keys on the previous CANDIDATE (not
    // the previous surviving cut), so it never cascades — that is what
    // makes it one lag + two prefix scans instead of a sequential walk,
    // and what the oracle mirrors as a lag window over the candidates.
    // The max-side TTTD bound stays unimplemented (sequential state by
    // construction — see the operator scaladoc for the honest residual).
    "q235_export_manifest_cdc_tttd" -> Q(
      (s, dir) => graft.operators.Export.shardManifestCdcTokenAwareMinGap(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L, minGapTokens = 2048L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |cs AS (
             |  SELECT *,
             |    CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |ci AS (
             |  SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS cidx
             |  FROM cs),
             |cands AS (SELECT cidx, start_off AS coff FROM ci WHERE cand = 1),
             |surv AS (
             |  SELECT cidx,
             |    CASE WHEN coff - coalesce(lag(coff) OVER (ORDER BY cidx), 0) >= 2048
             |         THEN 1 ELSE 0 END AS sv
             |  FROM cands),
             |srank AS (
             |  SELECT cidx, CAST(sum(sv) OVER (ORDER BY cidx) AS BIGINT) AS sr
             |  FROM surv),
             |sh5 AS (
             |  SELECT ci.*, coalesce(srank.sr, 0) AS shard_id
             |  FROM ci LEFT JOIN srank ON ci.cidx = srank.cidx)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh5 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // BOTH-SIDED TTTD BOUNDS (r15 verdict task 8 — the max-side DECISION,
    // resolved by building the declarative composition instead of a
    // wontfix): q235's min-gap floor plus fixed-offset sub-splitting WITHIN
    // each content-defined shard (sub_id from the shard-local offset), so a
    // (shard_id, sub_id) piece is HARD-bounded above by 8192 tokens + one
    // document while boundaries stay content-defined at shard heads and
    // deletion locality survives (sub-cuts are shard-local by
    // construction). Differs from Eshghi & Tang's backup divisor honestly:
    // their forced cut is content-positioned relative to the last surviving
    // cut (sequential state); this is the bound a declarative engine can
    // give — see the operator scaladoc.
    "q242_export_manifest_cdc_bounded" -> Q(
      (s, dir) => graft.operators.Export.shardManifestCdcTokenAwareBounded(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L, minGapTokens = 2048L, maxShardTokens = 8192L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |cs AS (
             |  SELECT *,
             |    CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |ci AS (
             |  SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS cidx
             |  FROM cs),
             |cands AS (SELECT cidx, start_off AS coff FROM ci WHERE cand = 1),
             |surv AS (
             |  SELECT cidx,
             |    CASE WHEN coff - coalesce(lag(coff) OVER (ORDER BY cidx), 0) >= 2048
             |         THEN 1 ELSE 0 END AS sv
             |  FROM cands),
             |srank AS (
             |  SELECT cidx, CAST(sum(sv) OVER (ORDER BY cidx) AS BIGINT) AS sr
             |  FROM surv),
             |sh5 AS (
             |  SELECT ci.*, coalesce(srank.sr, 0) AS shard_id
             |  FROM ci LEFT JOIN srank ON ci.cidx = srank.cidx),
             |sh6 AS (
             |  SELECT *,
             |    (start_off - min(start_off) OVER (PARTITION BY shard_id)) // 8192 AS sub_id
             |  FROM sh5)
             |SELECT shard_id, CAST(sub_id AS BIGINT) AS sub_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh6 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // CONTENT-DEFINED sub-cuts — q242's fixed offsets replaced by Eshghi &
    // Tang's BACKUP DIVISOR (cut probability doubled; every main candidate
    // is also a backup candidate), window-approximated: each non-tail
    // maxShardTokens window of a shard contributes its LAST backup
    // candidate as the sub-boundary (window end as content-blind
    // fallback). Bound: consecutive boundaries land in consecutive
    // windows, so a (shard, sub) piece holds doc starts spanning <
    // 2·maxShardTokens — a 2× bound traded for declarative shape (E&T's
    // exact Tmax needs the sequential last-surviving-cut scan; divergence
    // stated at the operator). Sub-boundaries are content-aligned wherever
    // a backup candidate exists, so intra-shard edits move pieces only
    // from the edited candidate onward.
    "q246_export_manifest_cdc_tttd_backup" -> Q(
      (s, dir) => graft.operators.Export.shardManifestCdcTokenAwareTttd(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L, minGapTokens = 2048L, maxShardTokens = 8192L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |cs AS (
             |  SELECT *,
             |    CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |ci AS (
             |  SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS cidx
             |  FROM cs),
             |cands AS (SELECT cidx, start_off AS coff FROM ci WHERE cand = 1),
             |surv AS (
             |  SELECT cidx,
             |    CASE WHEN coff - coalesce(lag(coff) OVER (ORDER BY cidx), 0) >= 2048
             |         THEN 1 ELSE 0 END AS sv
             |  FROM cands),
             |srank AS (
             |  SELECT cidx, CAST(sum(sv) OVER (ORDER BY cidx) AS BIGINT) AS sr
             |  FROM surv),
             |sh5 AS (
             |  SELECT ci.*, coalesce(srank.sr, 0) AS shard_id
             |  FROM ci LEFT JOIN srank ON ci.cidx = srank.cidx),
             |shst AS (SELECT shard_id, min(start_off) AS sstart FROM sh5 GROUP BY 1),
             |d2 AS (
             |  SELECT sh5.*, start_off - sstart AS loff,
             |    (start_off - sstart) // 8192 AS win,
             |    CASE WHEN hv * 4096 < n_tok * 131072 THEN 1 ELSE 0 END AS bkp
             |  FROM sh5 JOIN shst USING (shard_id)),
             |mw AS (SELECT shard_id, max(win) AS mwin FROM d2 GROUP BY 1),
             |wins AS (
             |  SELECT shard_id, unnest(generate_series(0, mwin - 1)) AS win
             |  FROM mw WHERE mwin > 0),
             |bb AS (
             |  SELECT shard_id, win, max(loff) AS bpos
             |  FROM d2 WHERE bkp = 1 AND loff > 0 GROUP BY 1, 2),
             |ab AS (
             |  SELECT DISTINCT w.shard_id, coalesce(bb.bpos, (w.win + 1) * 8192) AS bpos
             |  FROM wins w LEFT JOIN bb ON bb.shard_id = w.shard_id AND bb.win = w.win),
             |d3 AS (
             |  SELECT d2.doc_id, d2.n_tok, d2.source, d2.text, d2.shard_id,
             |    CAST(sum(CASE WHEN ab.bpos IS NOT NULL AND ab.bpos <= d2.loff
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS sub_id
             |  FROM d2 LEFT JOIN ab ON ab.shard_id = d2.shard_id
             |  GROUP BY 1, 2, 3, 4, 5)
             |SELECT shard_id, sub_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM d3 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q246's FULL TTTD manifest MAINTAINED FROM A STREAM: pass 1 adds the
    // content-pure backup flag to the min-gap twin's projection; the read
    // side runs the BATCH operator's own survivor-cut and piece tails over
    // the stream-maintained rows (the q239 shared-tail pattern) — streamed
    // ≡ batch by construction, checked against q246's oracle verbatim.
    "q247_stream_export_cdc_tttd_backup" -> Q(
      (s, dir) => graft.streaming.StreamingExport.streamShardManifestCdcTokenAwareTttd(
        s, dir, shardTokenBudget = 4096L, minGapTokens = 2048L,
        maxShardTokens = 8192L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |cs AS (
             |  SELECT *,
             |    CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |ci AS (
             |  SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS cidx
             |  FROM cs),
             |cands AS (SELECT cidx, start_off AS coff FROM ci WHERE cand = 1),
             |surv AS (
             |  SELECT cidx,
             |    CASE WHEN coff - coalesce(lag(coff) OVER (ORDER BY cidx), 0) >= 2048
             |         THEN 1 ELSE 0 END AS sv
             |  FROM cands),
             |srank AS (
             |  SELECT cidx, CAST(sum(sv) OVER (ORDER BY cidx) AS BIGINT) AS sr
             |  FROM surv),
             |sh5 AS (
             |  SELECT ci.*, coalesce(srank.sr, 0) AS shard_id
             |  FROM ci LEFT JOIN srank ON ci.cidx = srank.cidx),
             |shst AS (SELECT shard_id, min(start_off) AS sstart FROM sh5 GROUP BY 1),
             |d2 AS (
             |  SELECT sh5.*, start_off - sstart AS loff,
             |    (start_off - sstart) // 8192 AS win,
             |    CASE WHEN hv * 4096 < n_tok * 131072 THEN 1 ELSE 0 END AS bkp
             |  FROM sh5 JOIN shst USING (shard_id)),
             |mw AS (SELECT shard_id, max(win) AS mwin FROM d2 GROUP BY 1),
             |wins AS (
             |  SELECT shard_id, unnest(generate_series(0, mwin - 1)) AS win
             |  FROM mw WHERE mwin > 0),
             |bb AS (
             |  SELECT shard_id, win, max(loff) AS bpos
             |  FROM d2 WHERE bkp = 1 AND loff > 0 GROUP BY 1, 2),
             |ab AS (
             |  SELECT DISTINCT w.shard_id, coalesce(bb.bpos, (w.win + 1) * 8192) AS bpos
             |  FROM wins w LEFT JOIN bb ON bb.shard_id = w.shard_id AND bb.win = w.win),
             |d3 AS (
             |  SELECT d2.doc_id, d2.n_tok, d2.source, d2.text, d2.shard_id,
             |    CAST(sum(CASE WHEN ab.bpos IS NOT NULL AND ab.bpos <= d2.loff
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS sub_id
             |  FROM d2 LEFT JOIN ab ON ab.shard_id = d2.shard_id
             |  GROUP BY 1, 2, 3, 4, 5)
             |SELECT shard_id, sub_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM d3 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // DELETION PROPAGATION through the export delta (r13 verdict task 8) —
    // the whole chain a GDPR-style removal actually executes: the q43
    // tombstone anti-join (Delta.deleted) names the vanished documents, the
    // surviving corpus is re-manifested under BOTH boundary schemes, and
    // the CONTENT-addressed delta (checksum membership, what a
    // deduplicating shipper compares) quantifies the re-ship mass. The row
    // counts make the CDC claim hash-checked: offset shards change from
    // the first deletion onward (every later offset shifts), token-aware
    // CDC boundaries re-ship only the shards that actually contained a
    // deleted doc — ordinal ids renumber, bytes don't.
    "q234_export_delta_deletions" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        // the ingest's new scan: docs with id ≡ 255 (mod 500) vanished — a
        // SPARSE removal set (1 doc at sf0.01, 10 at sf0.1), because the
        // localization claim is only measurable when deletions are rarer
        // than shards: a dense set touches every shard under any scheme
        val scan = docs.filter(col("doc_id") % 500 =!= 255).select(col("doc_id").as("key"))
        val cache = docs.select(col("doc_id").as("key"))
        val tomb = graft.pipeline.Delta.deleted(scan, cache, keyCol = "key")
          .select(col("key").as("doc_id"))
        val surviving = docs.join(tomb, Seq("doc_id"), "left_anti")
        import graft.operators.Export
        def byScheme(scheme: String,
                     m: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
          Export.manifestDeltaByContent(m(docs), m(surviving))
            .select(lit(scheme).as("scheme"), col("*"))
        byScheme("cdc_tok",
            d => Export.shardManifestCdcTokenAware(d, "doc_id", "text", "source", 4096L))
          .unionByName(byScheme("offset",
            d => Export.shardManifest(d, "doc_id", "text", "source", 4096L)))
          .orderBy("scheme", "checksum")
      },
      Some {
        val mOff = (src: String) =>
          s"""SELECT shard_id, min(doc_id) AS first_doc,
             |      md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |    FROM (SELECT doc_id, text,
             |        CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) // 4096 AS shard_id
             |      FROM $src) GROUP BY 1""".stripMargin
        val mCdc = (src: String) =>
          s"""SELECT shard_id, min(doc_id) AS first_doc,
             |      md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |    FROM (SELECT doc_id, text,
             |        CAST(sum(CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END)
             |          OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |      FROM $src) GROUP BY 1""".stripMargin
        val delta = (scheme: String, oldSql: String, newSql: String) =>
          s"""SELECT '$scheme' AS scheme, coalesce(o.checksum, n.checksum) AS checksum,
             |  CASE WHEN o.checksum IS NULL THEN 'reship'
             |       WHEN n.checksum IS NULL THEN 'drop' ELSE 'keep' END AS status,
             |  o.n_shards_old, n.n_shards_new, o.first_doc_old, n.first_doc_new
             |FROM (SELECT checksum, CAST(count(*) AS BIGINT) AS n_shards_old,
             |        min(first_doc) AS first_doc_old FROM ($oldSql) GROUP BY 1) o
             |FULL OUTER JOIN (SELECT checksum, CAST(count(*) AS BIGINT) AS n_shards_new,
             |        min(first_doc) AS first_doc_new FROM ($newSql) GROUP BY 1) n
             |ON o.checksum = n.checksum""".stripMargin
        s"""WITH tc AS (
           |  SELECT doc_id, source, text,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
           |  FROM documents),
           |surv AS (SELECT * FROM tc WHERE doc_id % 500 <> 255)
           |SELECT * FROM (
           |  ${delta("cdc_tok", mCdc("tc"), mCdc("surv"))}
           |  UNION ALL
           |  ${delta("offset", mOff("tc"), mOff("surv"))})
           |ORDER BY scheme, checksum""".stripMargin
      }),

    // q227 BUDGETED IN BPE TOKENS (the CDC × token-model matrix cell): the
    // cut probability min(1, n_tok/budget) and the per-shard token mass are
    // both denominated by the vendored byte-level BPE — the unit a real
    // loader budgets — while the boundary hash value stays content-only
    // (md5 of the raw text). Every budget-denominated operator now accepts
    // the token model; the oracle derives BPE counts from q18b's shared
    // recursive-CTE merge loop, so the cut DECISION itself is hash-checked
    // in the BPE unit.
    "q236_export_manifest_cdc_bpe" -> Q(
      (s, dir) => graft.operators.Export.shardManifestCdcTokenAware(
        Tables.documents(s, dir), "doc_id", "text", "source",
        shardTokenBudget = 4096L, countTokens = bpeTokenCount),
      Some(s"""$bpeTcCtes,
             |tch AS (
             |  SELECT tc.*, CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM tc),
             |tcc AS (
             |  SELECT *, CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cut
             |  FROM tch),
             |sh4 AS (
             |  SELECT *, CAST(sum(cut) OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |  FROM tcc)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh4 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q227's token-aware CDC manifest MAINTAINED FROM A STREAM (the CDC ×
    // streaming matrix cell, r13 verdict task 6): the cut decision is pure
    // per-document content — an arriving batch needs NO cross-batch offset
    // state; only the cumulative cut count (the shard id) reconciles at
    // read, riding the same content-keyed two-pass prefix scan as q223's
    // offsets but summing the 0/1 cut indicator. Checked against q227's
    // BATCH oracle verbatim — streamed ≡ batch by construction.
    "q233_stream_export_cdc_tok" -> Q(
      (s, dir) => graft.streaming.StreamingExport.streamShardManifestCdcTokenAware(
        s, dir, shardTokenBudget = 4096L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |tcc AS (
             |  SELECT *, CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cut
             |  FROM tc),
             |sh4 AS (
             |  SELECT *, CAST(sum(cut) OVER (ORDER BY doc_id) AS BIGINT) AS shard_id
             |  FROM tcc)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh4 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q235's TTTD MIN-GAP manifest MAINTAINED FROM A STREAM (r15 verdict
    // task 4): pass 1 streams the same content-pure candidate flag as q233
    // (plus the token cumsum); the survivor cut lives entirely on the
    // candidate relation, so the read side calls the BATCH operator's own
    // minGapSurvivorShardIds tail over the stream-maintained rows —
    // streamed ≡ batch by shared construction, checked against q235's
    // batch oracle verbatim.
    "q239_stream_export_cdc_tttd" -> Q(
      (s, dir) => graft.streaming.StreamingExport.streamShardManifestCdcTokenAwareMinGap(
        s, dir, shardTokenBudget = 4096L, minGapTokens = 2048L),
      Some(s"""WITH tc AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |cs AS (
             |  SELECT *,
             |    CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM tc),
             |ci AS (
             |  SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS cidx
             |  FROM cs),
             |cands AS (SELECT cidx, start_off AS coff FROM ci WHERE cand = 1),
             |surv AS (
             |  SELECT cidx,
             |    CASE WHEN coff - coalesce(lag(coff) OVER (ORDER BY cidx), 0) >= 2048
             |         THEN 1 ELSE 0 END AS sv
             |  FROM cands),
             |srank AS (
             |  SELECT cidx, CAST(sum(sv) OVER (ORDER BY cidx) AS BIGINT) AS sr
             |  FROM surv),
             |sh5 AS (
             |  SELECT ci.*, coalesce(srank.sr, 0) AS shard_id
             |  FROM ci LEFT JOIN srank ON ci.cidx = srank.cidx)
             |SELECT shard_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum
             |FROM sh5 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ERASURE PROPAGATION THROUGH PACKING (r15 verdict task 6): q234 traces
    // a GDPR removal through EXPORT shards; the packed-sequence artifact
    // (q215/q218) had no deletion story — an erased doc's tokens sit inside
    // fixed-length training sequences. The whole chain: the q43 tombstone
    // anti-join names the erased docs, both packing layouts fingerprint
    // every sequence's composition pre/post erasure, and the delta counts
    // sequences by (status, physically-contained-erased-tokens). The rows
    // make the layout argument measured: global concat-and-chunk marks
    // everything downstream of the first erasure `changed` while only an
    // erasure-sized handful `contains_erased`; packing WITHIN token-aware
    // CDC shards (content-stable first-doc shard keys) collapses `changed`
    // to the affected shards — the erasure-friendly layout a 100 TB
    // training pipeline should ship.
    "q241_erasure_packed_delta" -> Q(
      (s, dir) => {
        import graft.operators.Packing
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        val scan = docs.filter(col("doc_id") % 500 =!= 255).select(col("doc_id").as("key"))
        val cache = docs.select(col("doc_id").as("key"))
        val tomb = graft.pipeline.Delta.deleted(scan, cache, keyCol = "key")
          .select(col("key").as("doc_id"))
        val surviving = docs.join(tomb, Seq("doc_id"), "left_anti")
        def scheme(name: String, budget: Long) =
          Packing.packedErasureDelta(
            Packing.packedSeqSpans(docs, "doc_id", "text", seqLen = 128,
              shardTokenBudget = budget),
            Packing.packedSeqSpans(surviving, "doc_id", "text", seqLen = 128,
              shardTokenBudget = budget),
            tomb, "doc_id")
            .select(lit(name).as("scheme"), col("*"))
        scheme("global", 0L).unionByName(scheme("shard_local", 4096L))
          .orderBy("scheme", "status", "contains_erased")
      },
      Some(s"""WITH tc AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv,
             |    CASE WHEN doc_id % 500 = 255 THEN 1 ELSE 0 END AS erased
             |  FROM documents),
             |base AS (
             |  SELECT *, CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand
             |  FROM tc WHERE n_tok > 0),
             |go AS (
             |  SELECT doc_id, erased, n_tok, CAST(0 AS BIGINT) AS shard_key,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS off
             |  FROM base),
             |gn AS (
             |  SELECT doc_id, n_tok, CAST(0 AS BIGINT) AS shard_key,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS off
             |  FROM base WHERE erased = 0),
             |so AS (
             |  SELECT doc_id, erased, n_tok,
             |    min(doc_id) OVER (PARTITION BY shard_ord) AS shard_key,
             |    CAST(sum(n_tok) OVER (PARTITION BY shard_ord ORDER BY doc_id) - n_tok AS BIGINT) AS off
             |  FROM (SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS shard_ord FROM base)),
             |sn AS (
             |  SELECT doc_id, n_tok,
             |    min(doc_id) OVER (PARTITION BY shard_ord) AS shard_key,
             |    CAST(sum(n_tok) OVER (PARTITION BY shard_ord ORDER BY doc_id) - n_tok AS BIGINT) AS off
             |  FROM (SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS shard_ord
             |        FROM base WHERE erased = 0)),
             |sp AS (
             |  SELECT 'global' AS scheme, 'old' AS side, doc_id, erased, shard_key, off, n_tok FROM go
             |  UNION ALL SELECT 'global', 'new', doc_id, 0, shard_key, off, n_tok FROM gn
             |  UNION ALL SELECT 'shard_local', 'old', doc_id, erased, shard_key, off, n_tok FROM so
             |  UNION ALL SELECT 'shard_local', 'new', doc_id, 0, shard_key, off, n_tok FROM sn),
             |spans AS (
             |  SELECT scheme, side, doc_id, erased, shard_key,
             |    unnest(generate_series(off // 128, (off + n_tok - 1) // 128)) AS seq_id,
             |    off, n_tok
             |  FROM sp),
             |sq AS (
             |  SELECT scheme, side, doc_id, erased, shard_key, seq_id,
             |    greatest(off, seq_id * 128) - seq_id * 128 AS s,
             |    least(off + n_tok - 1, (seq_id + 1) * 128 - 1) - seq_id * 128 AS e
             |  FROM spans),
             |fp AS (
             |  SELECT scheme, side, shard_key, seq_id,
             |    md5(string_agg(doc_id || ':' || s || ':' || e, ',' ORDER BY doc_id)) AS fp,
             |    max(erased) AS any_erased
             |  FROM sq GROUP BY 1, 2, 3, 4),
             |dl AS (
             |  SELECT coalesce(o.scheme, n.scheme) AS scheme,
             |    CASE WHEN o.fp IS NULL THEN 'added'
             |         WHEN n.fp IS NULL THEN 'removed'
             |         WHEN o.fp = n.fp THEN 'kept' ELSE 'changed' END AS status,
             |    CAST(coalesce(o.any_erased, 0) AS BIGINT) AS contains_erased
             |  FROM (SELECT * FROM fp WHERE side = 'old') o
             |  FULL OUTER JOIN (SELECT * FROM fp WHERE side = 'new') n
             |    ON o.scheme = n.scheme AND o.shard_key = n.shard_key AND o.seq_id = n.seq_id)
             |SELECT scheme, status, contains_erased,
             |  CAST(count(*) AS BIGINT) AS n_seqs
             |FROM dl GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // CELL-SCOPED SEMANTIC DEDUP — the MULTI-DOMAIN scale path (the one
    // residual PERF_r16 §2 left open, closed in-round): a corpus of
    // disjoint vocabulary domains keeps each domain's token profile after
    // GLOBAL-mean centering, so within-domain pairs stay sign-correlated
    // and banded-SRP candidates grow super-linearly (measured: 1564 MiB at
    // 10× remap). SemDeDup's composition fixes the geometry: Lloyd-trained
    // cells (k=16, one step, lowest-id init — 0.97 domain purity on the 3×
    // disjoint-vocab fixture), PER-CELL floored-mean centering (within-cell
    // unrelated cosine drops 0.5+ → 0.106), banded candidates within the
    // cell, exact RAW-cosine ≥ τ verify. The whole chain — training,
    // assignment, integer cell means, band buckets, verify — is mirrored in
    // SQL, so the trained multi-domain path itself is hash-checked.
    "q243_semantic_cell_dedup" -> Q(
      // standing artifact (the verdict-relation pattern): the chain trains
      // k-means per run otherwise — 5.0 s in the r16 slow tail; content is
      // deterministic in (dir, params), the store's fingerprint covers the
      // fixture
      (s, dir) => graft.pipeline.ArtifactStore.loadOrBuild(s,
        graft.pipeline.ArtifactStore.rootFor(dir,
          "semantic_cell_dedup_d64_k16_i1_b16_c095_v1")) {
        Dedup.semanticCellDedupFlags(Tables.documents(s, dir),
          "doc_id", "text", embDim = 64, k = 16, cosThreshold = SemCosThreshold)
      }.orderBy("doc_id"),
      Some(semCellDedupOracle)),

    // q243 DRIVEN BY THE STREAMING ENGINE (r16 verdict task 3): the trained
    // geometry — centroids, per-cell means, the cell-scoped banded rep
    // index — stands as content-keyed artifacts; documents arrive as
    // micro-batches and probe it statelessly with id_a < id_b (keep-first
    // as an arrival-order-free predicate); hits append to a content-keyed
    // artifact (the q203 idempotence contract). Per-doc results depend only
    // on (doc, standing artifacts), so streamed ≡ batch — checked against
    // q243's oracle VERBATIM.
    "q250_stream_semantic_cell_dedup" -> Q(
      (s, dir) => graft.streaming.StreamingDedup.streamSemanticCellDedup(
        s, dir, embDim = 64, k = 16, cosThreshold = SemCosThreshold),
      Some(semCellDedupOracle)),

    // q243 with HASH-STRATIFIED Lloyd init — the measured fix for the
    // trained-cell domain-collapse residual (PERF_r17 §2): lowest-id init
    // seeds every centroid from the id-range head, so domains arriving at
    // HIGHER ids (a growing crawl's new languages) collapse into few cells
    // and within-cell candidates inflate. Seeding by hex4(md5(text)) order
    // is arrival-order-free — the k init reps spread uniformly over the
    // corpus content no matter when each domain arrived. Same trainer,
    // same one Lloyd step, same banded tail; only kinit's ORDER BY moves,
    // mirrored in SQL.
    "q258_semantic_cell_stratified" -> Q(
      (s, dir) => graft.pipeline.ArtifactStore.loadOrBuild(s,
        graft.pipeline.ArtifactStore.rootFor(dir,
          "semantic_cell_dedup_strat_d64_k16_i1_b16_c095_v1")) {
        Dedup.semanticCellDedupFlags(Tables.documents(s, dir),
          "doc_id", "text", embDim = 64, k = 16, cosThreshold = SemCosThreshold,
          stratifiedInit = true)
      }.orderBy("doc_id"),
      Some(s"""${semCellDedupOracleOf(true)}""".stripMargin)),

    // k AUTO-SCALING for the trained-cell dedup (r17 verdict item 5 —
    // q258's stated remaining knob): instead of hand-picking k, size it
    // from the data — k = 2 × count(DISTINCT source), the domain-proxy
    // cardinality (2× headroom for domains that split internally; one
    // partial-aggregate distinct, cheap at any corpus size). Everything
    // downstream is q258's machinery verbatim — stratified hash-order
    // init, one Lloyd step, banded within-cell candidates — and the oracle
    // computes the SAME k from the same column (a scalar-subquery LIMIT),
    // so the auto-k path is hash-checked end to end, not just plumbed.
    "q267_semantic_cell_autok" -> Q(
      (s, dir) => graft.pipeline.ArtifactStore.loadOrBuild(s,
        graft.pipeline.ArtifactStore.rootFor(dir,
          "semantic_cell_dedup_autok_d64_i1_b16_c095_v1")) {
        val docs = Tables.documents(s, dir)
        Dedup.semanticCellDedupFlags(docs, "doc_id", "text", embDim = 64,
          k = Dedup.autoCellK(docs, "source"),
          cosThreshold = SemCosThreshold, stratifiedInit = true)
      }.orderBy("doc_id"),
      Some(semCellDedupOracleOf(true,
        kSql = "(SELECT 2 * count(DISTINCT source) FROM documents)"))),

    // MULTI-DOMAIN VERDICT (r16 verdict task 4): the five-axis cross-modal
    // stack with the SEMANTIC axis partition-scoped by `source` — global
    // centering is exactly what q243/q244 proved insufficient on
    // disjoint-vocabulary domains, so the embedding axis runs q244's
    // machinery (per-(source, text) reps, per-source floored-mean
    // centering, within-source banded candidates) while the four text axes
    // stay global. One whole-stack oracle: fusionAxesCtes + the shared
    // partition-axis CTEs + the fuseVerdicts tail.
    "q251_multi_domain_verdict" -> Q(
      (s, dir) => multiDomainVerdictOf(s, dir),
      Some(s"""$fusionAxesCtes,
             |$semPartitionAxisCtes,
             |${fusionVerdictTail(Seq("exact", "containment", "jaccard", "semantic", "simhash"))}
             |SELECT doc_id, f_exact, f_containment, f_jaccard, f_semantic,
             |  f_simhash, drop_doc, reason
             |FROM ver ORDER BY doc_id""".stripMargin)),

    // The q219 capstone ON THE MULTI-DOMAIN VERDICT: keeps of the
    // partitioned five-axis verdict → temperature-mix quotas by source →
    // hash-ranked takeQuota → 128-token packed-sequence manifest, under ONE
    // whole-chain oracle (the shared curateMixPackTailSql spliced onto the
    // q251 verdict CTEs) — the end-to-end multi-domain curation run,
    // hash-checked from verdict to packing.
    "q252_multi_domain_curate_chain" -> Q(
      (s, dir) => {
        // cache-lifetime: pinned by the returned plan — caller releases
        // (see Caching); the mix's counts, takeQuota's passes, the prefix
        // scan and the final write all re-read keeps
        val keeps = Tables.documents(s, dir).select("doc_id", "source", "text")
          .join(multiDomainVerdictOf(s, dir).filter(col("drop_doc") === 0)
            .select("doc_id"), Seq("doc_id"))
          .cache()
        val quotas = graft.operators.Sampling.temperatureMix(
          keeps.groupBy(col("source")).agg(count(lit(1)).as("n")),
          "source", "n", alpha = 0.5, budget = 100L)
        val sample = graft.operators.Sampling.takeQuota(
          keeps, "doc_id", "source", quotas)
        graft.operators.Packing.packSequences(
          sample.select("doc_id", "text"), "doc_id", "text", seqLen = 128)
      },
      Some(s"""$fusionAxesCtes,
             |$semPartitionAxisCtes,
             |${fusionVerdictTail(Seq("exact", "containment", "jaccard", "semantic", "simhash"))},
             |$curateMixPackTailSql""".stripMargin)),

    // ERASURE through the SRP BAND-TABLE artifact — the "bands" limb of the
    // index-erasure story (q248/q249 covered cells+codes): the cell-scoped
    // banded rep index (q250's standing artifact construction, shared via
    // semCellStanding) is laid out cell-PARTITIONED, a tombstone set names
    // its touched cells map-side, and IndexErasure rewrites only those
    // directories. The oracle REBUILDS the surviving reps' band rows from
    // scratch under the standing geometry (trained centroids, per-cell
    // means — the parameters-stand contract), so repaired ≡ rebuilt is a
    // hash here too.
    "q253_band_index_erasure" -> Q(
      (s, dir) => {
        import graft.operators.AnnIndex
        import graft.pipeline.{ArtifactStore, IndexErasure}
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val reps = Dedup.exactDedup(d, "doc_id", "text")
        val (repVecs, rbits, cents, _, _, bandIdx) =
          graft.streaming.StreamingDedup.semCellStanding(s, dir, reps, embDim = 64, k = 16)
        val root = ArtifactStore.rootFor(dir,
          s"semcell_bands_part_d64_k16_b16_r${rbits}_v1")
        IndexErasure.ensurePartitioned(s, root, "cell") {
          bandIdx.select(col("doc_id"), col("cell"),
            col("__band").as("band"), col("__bucket").as("bucket"))
        }
        val tomb = repVecs.filter(col("doc_id") % 20 === 7)
        val touched = AnnIndex.ivfAssignTrained(tomb, "doc_id", "v", cents)
          .select("cell").distinct().collect().map(_.getLong(0)).toSeq // ≤ k rows
        IndexErasure.repairErased(s, root, "cell", touched, "doc_id", tomb)
        IndexErasure.readPartitioned(s, root, "cell")
          .select(col("doc_id"), col("cell"), col("band"), col("bucket"))
          .orderBy("doc_id", "band")
      },
      Some(s"""${semCellChainCtes()}
             |SELECT doc_id, CAST(cell AS BIGINT) AS cell,
             |  CAST(band AS BIGINT) AS band, CAST(bucket AS BIGINT) AS bucket
             |FROM sbuck
             |WHERE NOT (doc_id % 20 = 7)
             |ORDER BY doc_id, band""".stripMargin)),

    // GDPR CAPSTONE — one erasure request traced through EVERY deployed
    // artifact family in one report: given the tombstone set (doc_id ≡ 7
    // mod 20, q253's), name the units each family must rewrite to
    // physically purge — export SHARDS containing a tombstoned doc
    // (min-gap CDC manifest, the re-ship set), packed training SEQUENCES
    // spanned by a tombstoned doc's tokens (shard-local layout — the
    // q241-measured erasure-friendly one), and the banded ANN index CELLS
    // holding a tombstoned rep (the q253 repair set). Each family's repair
    // mechanics are separately hash-checked (q234/q241/q248/q253/q254);
    // this row set is what the deletion run PUBLISHES: the blast radius,
    // per artifact, before any rewrite runs.
    "q256_gdpr_capstone" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        val tombP = col("doc_id") % 20 === 7
        def report(name: String, units: org.apache.spark.sql.DataFrame,
                   unit: org.apache.spark.sql.Column) =
          units.agg(
            countDistinct(unit).as("n_units"),
            countDistinct(when(tombP, unit)).as("n_affected"))
            .select(lit(name).as("family"), col("n_units"), col("n_affected"))
        val shards = graft.operators.Export.assignShardsCdcTokenAwareMinGap(
          docs, "doc_id", "text", shardTokenBudget = 4096L, minGapTokens = 2048L)
        val spans = graft.operators.Packing.packedSeqSpans(docs, "doc_id", "text",
          seqLen = 128, shardTokenBudget = 4096L)
        val reps = Dedup.exactDedup(docs, "doc_id", "text")
        val (_, _, _, _, _, bandIdx) =
          graft.streaming.StreamingDedup.semCellStanding(s, dir, reps, embDim = 64, k = 16)
        report("ann_index_cells", bandIdx, col("cell"))
          .unionByName(report("export_shards", shards, col("shard_id")))
          .unionByName(report("packed_sequences", spans,
            struct(col("shard_key"), col("seq_id"))))
          .orderBy("family")
      },
      Some(s"""${semCellChainCtes()},
             |etc AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             |    CAST(${graft.operators.Export.hex4ValSql("md5(text)")} AS BIGINT) AS hv
             |  FROM documents),
             |ecs AS (
             |  SELECT *,
             |    CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand,
             |    CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS BIGINT) AS start_off
             |  FROM etc),
             |eci AS (
             |  SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS cidx
             |  FROM ecs),
             |ecands AS (SELECT cidx, start_off AS coff FROM eci WHERE cand = 1),
             |esurv AS (
             |  SELECT cidx,
             |    CASE WHEN coff - coalesce(lag(coff) OVER (ORDER BY cidx), 0) >= 2048
             |         THEN 1 ELSE 0 END AS sv
             |  FROM ecands),
             |esrank AS (
             |  SELECT cidx, CAST(sum(sv) OVER (ORDER BY cidx) AS BIGINT) AS sr
             |  FROM esurv),
             |esh AS (
             |  SELECT eci.doc_id, coalesce(esrank.sr, 0) AS shard_id
             |  FROM eci LEFT JOIN esrank ON eci.cidx = esrank.cidx),
             |pbase AS (
             |  SELECT *, CASE WHEN hv * 4096 < n_tok * 65536 THEN 1 ELSE 0 END AS cand
             |  FROM etc),
             |pso AS (
             |  SELECT doc_id, n_tok,
             |    min(doc_id) OVER (PARTITION BY shard_ord) AS shard_key,
             |    CAST(sum(n_tok) OVER (PARTITION BY shard_ord ORDER BY doc_id) - n_tok AS BIGINT) AS off
             |  FROM (SELECT *, CAST(sum(cand) OVER (ORDER BY doc_id) AS BIGINT) AS shard_ord FROM pbase)),
             |pspans AS (
             |  SELECT doc_id, shard_key,
             |    unnest(generate_series(off // 128, (off + n_tok - 1) // 128)) AS seq_id
             |  FROM pso WHERE n_tok > 0)
             |SELECT * FROM (
             |  SELECT 'ann_index_cells' AS family,
             |    (SELECT CAST(count(DISTINCT cell) AS BIGINT) FROM sbuck) AS n_units,
             |    (SELECT CAST(count(DISTINCT cell) AS BIGINT) FROM sbuck WHERE doc_id % 20 = 7) AS n_affected
             |  UNION ALL
             |  SELECT 'export_shards',
             |    (SELECT CAST(count(DISTINCT shard_id) AS BIGINT) FROM esh),
             |    (SELECT CAST(count(DISTINCT shard_id) AS BIGINT) FROM esh WHERE doc_id % 20 = 7)
             |  UNION ALL
             |  SELECT 'packed_sequences',
             |    (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT shard_key, seq_id FROM pspans)),
             |    (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT shard_key, seq_id FROM pspans WHERE doc_id % 20 = 7)))
             |ORDER BY family""".stripMargin)),

    // Erasure for ID-REFERENCE artifacts — the hits tables: a content
    // artifact partitions by a coarse key, but the stream/batch-maintained
    // near-dup HITS artifact scatters a doc id across arbitrary pair rows,
    // so the purge reads every live batch (IndexErasure.purgeBatches —
    // ONE tagged union-read + broadcast flag + one staged partitioned
    // write of the touched batches' survivors). Each hit row
    // depends only on its two referenced docs, so purge ≡ rebuild on the
    // survivors — the oracle is the q194 two-sided rebuild with the
    // tombstoned ids excluded from BOTH sides, hash-checked.
    "q261_hits_artifact_purge" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = Tables.documents(s, dir).select("doc_id", "text")
        lazy val idx = graft.operators.Dedup.trainNearDupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        val trainBands = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_bands_s3_h32_b16_v1"))(idx._1)
        val trainSigs = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_sigs_s3_h32_b16_v1"))(idx._2)
        val root = ArtifactStore.rootFor(dir, "neardup_hits_erz_s3_h32_b16_v1")
        def batch(id: Long, m: Int): Unit =
          ArtifactStore.appendBatchIfAbsent(s, root, id) {
            graft.operators.Dedup.crossCorpusNearDupFromIndex(
              trainBands, trainSigs, d.filter(col("doc_id") % 10 === m),
              "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
              threshold = JaccardThreshold)
          }
        batch(0, 0)
        batch(1, 5)
        val tomb = d.filter(col("doc_id") % 7 === 1).select("doc_id")
        graft.pipeline.IndexErasure.purgeBatches(s, root,
          refCols = Seq("test_id", "train_id"), tombstones = tomb, idCol = "doc_id")
        ArtifactStore.readBatches(s, root).orderBy("test_id", "train_id")
      },
      Some(hitsPurgeOracle)),

    // The hits-purge MANIFEST — q249's shape on the BATCH axis: one row
    // per batch of q261's hits artifact with (n_before, n_removed,
    // n_after) under the q261 tombstone set. Like q249 this is the PLAN,
    // a pure function of corpus + tombstone predicate (stable across
    // purge re-runs — the applied record purgeBatches returns on a virgin
    // artifact equals this plan, pinned in IndexErasureSpec); each batch's
    // content is re-derived from the standing train index, never read from
    // the (possibly already-purged) artifact. The row set is what the
    // deletion run PUBLISHES: which batches rewrite, and how much.
    "q264_hits_purge_manifest" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = Tables.documents(s, dir).select("doc_id", "text")
        lazy val idx = graft.operators.Dedup.trainNearDupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        val trainBands = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_bands_s3_h32_b16_v1"))(idx._1)
        val trainSigs = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_sigs_s3_h32_b16_v1"))(idx._2)
        def batchDf(name: String, m: Int) =
          graft.operators.Dedup.crossCorpusNearDupFromIndex(
            trainBands, trainSigs, d.filter(col("doc_id") % 10 === m),
            "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
            threshold = JaccardThreshold)
            .withColumn("batch", lit(name))
        batchDf("b0", 0).unionByName(batchDf("b1", 5))
          .withColumn("__hit",
            when(col("test_id") % 7 === 1 || col("train_id") % 7 === 1, 1L)
              .otherwise(0L))
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("n_before"), sum(col("__hit")).as("n_removed"))
          .withColumn("n_after", col("n_before") - col("n_removed"))
          .orderBy("batch")
      },
      Some(s"""$crossNearDupCtes
             |SELECT CASE WHEN test_id % 10 = 0 THEN 'b0' ELSE 'b1' END AS batch,
             |  CAST(count(*) AS BIGINT) AS n_before,
             |  CAST(sum(CASE WHEN test_id % 7 = 1 OR train_id % 7 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             |  CAST(count(*) - sum(CASE WHEN test_id % 7 = 1 OR train_id % 7 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_after
             |FROM pairs WHERE jac >= $JaccardThreshold
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAM-DRIVEN hits purge — q254's ingest topology on the
    // id-reference artifact family (r17 verdict item 7): GDPR deletion
    // requests arrive as tombstone micro-batches (the q261 tombstone set
    // split in two), each driving IndexErasure.purgeBatches over the
    // standing hits artifact in foreachBatch. Purge is content-idempotent
    // and each micro-batch removes exactly the rows referencing its ids,
    // so the final artifact depends only on the tombstone SET: streamed ≡
    // one-shot (q261) ≡ rebuild-on-survivors — the same oracle, the same
    // hash.
    "q266_stream_hits_purge" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = Tables.documents(s, dir).select("doc_id", "text")
        lazy val idx = graft.operators.Dedup.trainNearDupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        val trainBands = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_bands_s3_h32_b16_v1"))(idx._1)
        val trainSigs = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_sigs_s3_h32_b16_v1"))(idx._2)
        val root = ArtifactStore.rootFor(dir, "neardup_hits_erzs_s3_h32_b16_v1")
        def batch(id: Long, m: Int): Unit =
          ArtifactStore.appendBatchIfAbsent(s, root, id) {
            graft.operators.Dedup.crossCorpusNearDupFromIndex(
              trainBands, trainSigs, d.filter(col("doc_id") % 10 === m),
              "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
              threshold = JaccardThreshold)
          }
        batch(0, 0)
        batch(1, 5)
        val tomb = d.filter(col("doc_id") % 7 === 1).select("doc_id")
        graft.streaming.StreamingErasure.streamPurge(s, root,
          refCols = Seq("test_id", "train_id"), idCol = "doc_id",
          tomb = tomb, nBatches = 2)
        ArtifactStore.readBatches(s, root).orderBy("test_id", "train_id")
      },
      Some(hitsPurgeOracle)),

    // ERASE WINS for the BATCH LAYOUT — the q263 adversarial order on the
    // hits artifact: appendBatchIfAbsent's skip-if-present idempotence
    // protects only replays of the SAME batch id; an at-least-once
    // pipeline re-delivering under a FRESH id — or a probe batch computed
    // BEFORE the purge and landing after — would resurrect purged
    // references. Here the test side arrives as three batches (test_id ≡
    // 0/5/10 mod 15): two land, the purge runs, then the THIRD arrives
    // late through appendBatchPurged, which anti-joins its content against
    // the persisted tombstone log — so its pairs referencing purged train
    // docs never land, and the final artifact hash-equals the
    // rebuild-on-survivors over the WHOLE test side (q261's oracle shape).
    "q272_hits_erase_wins_late_batch" -> Q(
      (s, dir) => {
        import graft.pipeline.ArtifactStore
        val d = Tables.documents(s, dir).select("doc_id", "text")
        lazy val idx = graft.operators.Dedup.trainNearDupIndex(
          d.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        val trainBands = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_bands_s3_h32_b16_v1"))(idx._1)
        val trainSigs = ArtifactStore.loadOrBuild(s,
          ArtifactStore.rootFor(dir, "neardup_train_sigs_s3_h32_b16_v1"))(idx._2)
        val root = ArtifactStore.rootFor(dir, "neardup_hits_erzl_s3_h32_b16_v1")
        def probe(m: Int) =
          graft.operators.Dedup.crossCorpusNearDupFromIndex(
            trainBands, trainSigs, d.filter(col("doc_id") % 15 === m),
            "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16,
            threshold = JaccardThreshold)
        ArtifactStore.appendBatchIfAbsent(s, root, 0L)(probe(0))
        ArtifactStore.appendBatchIfAbsent(s, root, 1L)(probe(5))
        val tomb = d.filter(col("doc_id") % 7 === 1).select("doc_id")
        graft.pipeline.IndexErasure.purgeBatches(s, root,
          refCols = Seq("test_id", "train_id"), tombstones = tomb, idCol = "doc_id")
        // the LATE batch: computed against the standing train index
        // (including purged docs), delivered under a fresh id AFTER the
        // purge — the log must keep its purged references out
        graft.pipeline.IndexErasure.appendBatchPurged(s, root, 2L,
          refCols = Seq("test_id", "train_id"))(probe(10))
        ArtifactStore.readBatches(s, root).orderBy("test_id", "train_id")
      },
      Some(hitsPurgeOracle)),

    // PARTITION-SCOPED semantic dedup — q243's production twin (the shape
    // curation pipelines actually run: "semantic dedup WITHIN source/
    // language"): cells come from the `source` column, so the per-cell
    // floored mean removes each domain's profile EXACTLY (no training),
    // and candidates never cross partitions by contract. Collapse is per
    // (source, text): the same text in two sources is two reps, each
    // judged in its own domain.
    "q244_semantic_source_dedup" -> Q(
      (s, dir) => graft.pipeline.ArtifactStore.loadOrBuild(s,
        graft.pipeline.ArtifactStore.rootFor(dir,
          "semantic_source_dedup_d64_b16_c095_v1")) {
        Dedup.semanticPartitionDedupFlags(Tables.documents(s, dir),
          "doc_id", "text", "source", embDim = 64, cosThreshold = SemCosThreshold)
      }.orderBy("doc_id"),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
             |th AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(generate_series(1, length(w)),
             |        i -> CAST(ascii(substr(w, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
             |  FROM tok),
             |$semPartitionAxisCtes
             |SELECT d.doc_id,
             |  CAST(CASE WHEN d.doc_id IN (SELECT id_b FROM sel) THEN 1 ELSE 0 END AS BIGINT) AS f_semantic
             |FROM documents d ORDER BY doc_id""".stripMargin)),

    // SEMANTIC-AXIS RECALL AUDIT, FIXTURE-ONLY — the approximation quality
    // of the banded-centered candidate policy as a standing hash-checked
    // metric: banded-verified losers vs the BRUTE-FORCE truth (all-pairs
    // exact cosine ≥ τ over distinct-text reps). Found ⊆ true by
    // construction (verification is exact cosine on candidates), so the
    // one-row report is (n_true, n_found, recall). Ground truth here is
    // all-pairs — QUADRATIC BY DEFINITION — so this exact form is for
    // fixtures and samples only (r16 verdict item 1); the variant that
    // stands at any scale is q245b below: hash-stratified fixed-size probe
    // sample, truth = probes × corpus (linear), Wilson-bounded recall.
    "q245_semantic_recall_audit" -> Q(
      (s, dir) => {
        import graft.functions.VectorFunctions.{cosineFromNormSq, l2NormSq}
        import graft.operators.AnnIndex
        val emb = graft.pipeline.HashingEmbedder(64)
        val reps = Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
        // cache-lifetime: pinned by the returned plan — caller releases
        // (see Caching); the width count, both pair paths, and the brute
        // truth read the embedded reps
        val rv = reps.select(col("doc_id"), emb.embedRaw(col("text")).as("v")).cache()
        val found = AnnIndex.cosineNearDupPairsBandedCentered(rv, "doc_id", "v",
            threshold = SemCosThreshold,
            rbits = AnnIndex.autoBandBits(rv.count()), bands = Dedup.SemBands, dim = 64)
          .select(col("id_b")).distinct()
        val a = rv.select(col("doc_id").as("ia"), col("v").as("va"))
          .withColumn("na", l2NormSq(col("va"))).filter(col("na") > 0.0)
        val b = rv.select(col("doc_id").as("ib"), col("v").as("vb"))
          .withColumn("nb", l2NormSq(col("vb"))).filter(col("nb") > 0.0)
        val truth = a.join(b, col("ia") < col("ib"))
          .filter(fr(cosineFromNormSq(col("va"), col("vb"), col("na"), col("nb")), 6)
            >= SemCosThreshold)
          .select(col("ib").as("id_b")).distinct()
        truth.withColumn("__t", lit(1L))
          .join(found.withColumn("__f", lit(1L)), Seq("id_b"), "left")
          .agg(count(lit(1)).as("n_true"), sum(coalesce(col("__f"), lit(0L))).as("n_found"))
          .select(col("n_true"), col("n_found"),
            fr(col("n_found").cast("double") / col("n_true").cast("double"), 6)
              .as("recall"))
      },
      Some(s"""$semRecallCtePrefix,
             |btrue AS (
             |  SELECT DISTINCT b.doc_id AS id_b
             |  FROM rv a JOIN rv b ON a.doc_id < b.doc_id
             |  WHERE list_sum(list_transform(a.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
             |    AND list_sum(list_transform(b.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
             |    AND ${frs("list_cosine_similarity(a.v, b.v)", 6)} >= CAST($SemCosThreshold AS DOUBLE))
             |SELECT CAST(count(*) AS BIGINT) AS n_true,
             |  CAST(sum(CASE WHEN t.id_b IN (SELECT id_b FROM bsel) THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
             |  ${frs("CAST(sum(CASE WHEN t.id_b IN (SELECT id_b FROM bsel) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS recall
             |FROM btrue t""".stripMargin)),

    // SAMPLED SEMANTIC RECALL AUDIT — the q245 audit at ANY scale (r16
    // verdict task 2): q245's all-pairs truth is quadratic by definition,
    // so the standing form restricts the truth to a HASH-STRATIFIED
    // FIXED-SIZE probe sample — the SemSampleProbes lowest reps by
    // hex4(md5(text)) (content-uniform, id-order-free) — making the truth
    // join |sample| × corpus, LINEAR. Found ⊆ true still holds (the found
    // side is the unchanged banded path, intersected with the sample), and
    // the one-row report adds a two-sigma WILSON LOWER BOUND on the recall
    // estimate (Wilson 1927, z = 2 — exactly representable, so the bound
    // mirrors bit-for-bit in DuckDB): at sample size n_true with point
    // estimate p̂, recall ≥ wilson_lo with ~97.7% one-sided confidence.
    "q245b_semantic_recall_sampled" -> Q(
      (s, dir) => {
        import graft.functions.VectorFunctions.{cosineFromNormSq, l2NormSq}
        import graft.operators.AnnIndex
        val emb = graft.pipeline.HashingEmbedder(64)
        val reps = Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
        // cache-lifetime: pinned by the returned plan — caller releases
        // (see Caching); width count, probe sample, banded path, and truth
        // all read the embedded reps
        val rv = reps.select(col("doc_id"), emb.embedRaw(col("text")).as("v"),
          expr(graft.operators.Export.hex4ValSql("md5(text)")).cast("long").as("__h"))
          .cache()
        val found = AnnIndex.cosineNearDupPairsBandedCentered(
            rv.select("doc_id", "v"), "doc_id", "v",
            threshold = SemCosThreshold,
            rbits = AnnIndex.autoBandBits(rv.count()), bands = Dedup.SemBands,
            dim = 64)
          .select(col("id_b")).distinct()
        val probes = rv.orderBy(col("__h"), col("doc_id")).limit(SemSampleProbes)
          .select(col("doc_id").as("ib"), col("v").as("vb"))
        val a = rv.select(col("doc_id").as("ia"), col("v").as("va"))
          .withColumn("na", l2NormSq(col("va"))).filter(col("na") > 0.0)
        val b = probes.withColumn("nb", l2NormSq(col("vb"))).filter(col("nb") > 0.0)
        val truth = a.join(b, col("ia") < col("ib"))
          .filter(fr(cosineFromNormSq(col("va"), col("vb"), col("na"), col("nb")), 6)
            >= SemCosThreshold)
          .select(col("ib").as("id_b")).distinct()
        val nProbes = probes.agg(count(lit(1)).as("n_probes"))
        val agg = truth.withColumn("__t", lit(1L))
          .join(found.withColumn("__f", lit(1L)), Seq("id_b"), "left")
          .agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("__f"), lit(0L))).as("n_found"))
        // Wilson score interval lower bound, z = 2 (all literals exactly
        // representable; op order mirrored token-for-token in the oracle)
        val z = lit(2.0)
        val nT = col("n_true").cast("double")
        val ph = col("n_found").cast("double") / nT
        val den = lit(1.0) + z * z / nT
        val ctr = ph + z * z / (lit(2.0) * nT)
        val rad = z * sqrt(ph * (lit(1.0) - ph) / nT + z * z / (lit(4.0) * nT * nT))
        agg.crossJoin(nProbes)
          .select(col("n_probes"), col("n_true"), col("n_found"),
            when(col("n_true") > 0, fr(ph, 6))
              .otherwise(lit(null).cast("double")).as("recall"),
            when(col("n_true") > 0, fr((ctr - rad) / den, 6))
              .otherwise(lit(null).cast("double")).as("wilson_lo"))
      },
      Some {
        val phS = "(CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE))"
        val ntS = "CAST(n_true AS DOUBLE)"
        val zS = "CAST(2.0 AS DOUBLE)"
        val wilsonSql =
          s"(($phS + (($zS * $zS) / (CAST(2.0 AS DOUBLE) * $ntS)))" +
          s" - ($zS * sqrt((($phS * (CAST(1.0 AS DOUBLE) - $phS)) / $ntS)" +
          s" + (($zS * $zS) / ((CAST(4.0 AS DOUBLE) * $ntS) * $ntS)))))" +
          s" / (CAST(1.0 AS DOUBLE) + (($zS * $zS) / $ntS))"
        s"""$semRecallCtePrefix,
           |hh AS (
           |  SELECT r.doc_id, CAST(${graft.operators.Export.hex4ValSql("md5(d.text)")} AS BIGINT) AS h
           |  FROM qreps r JOIN documents d USING (doc_id)),
           |probes AS (SELECT doc_id FROM hh ORDER BY h, doc_id LIMIT $SemSampleProbes),
           |btrue AS (
           |  SELECT DISTINCT b.doc_id AS id_b
           |  FROM rv a JOIN rv b ON a.doc_id < b.doc_id
           |  JOIN probes p ON p.doc_id = b.doc_id
           |  WHERE list_sum(list_transform(a.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
           |    AND list_sum(list_transform(b.v, e -> e*e)) > CAST(0.0 AS DOUBLE)
           |    AND ${frs("list_cosine_similarity(a.v, b.v)", 6)} >= CAST($SemCosThreshold AS DOUBLE)),
           |rep AS (
           |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probes,
           |    CAST(count(*) AS BIGINT) AS n_true,
           |    CAST(sum(CASE WHEN t.id_b IN (SELECT id_b FROM bsel) THEN 1 ELSE 0 END) AS BIGINT) AS n_found
           |  FROM btrue t)
           |SELECT n_probes, n_true, n_found,
           |  CASE WHEN n_true > 0 THEN ${frs(phS, 6)} ELSE NULL END AS recall,
           |  CASE WHEN n_true > 0 THEN ${frs(wilsonSql, 6)} ELSE NULL END AS wilson_lo
           |FROM rep""".stripMargin
      }),

    "q149_exact_substr_spans" -> Q(
      (s, dir) => Dedup.exactSubstrSpans(
        Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample),
        "doc_id", "text", minLen = 50),
      Some(s"""WITH ${substrSpanCtes(anchored = false)}
             |SELECT doc_id, span_start, span_len FROM spans
             |ORDER BY doc_id, span_start""".stripMargin)),

    // q149's contract with the production shuffle key: every position ships
    // a 16-byte Rabin–Karp fingerprint pair (two independent 61-bit rolling
    // hashes, one O(n) map pass each) instead of the 50-char window string.
    // The oracle is q149's string-keyed SQL VERBATIM — fingerprint ≡ string
    // is checked on the fixture, not assumed (collision budget ~2e-9
    // expected colliding pairs at 1e14 windows, see RollingWindowHashes).
    "q163_fp_substr_spans" -> Q(
      (s, dir) => Dedup.fpSubstrSpans(
        Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample),
        "doc_id", "text", minLen = 50),
      Some(s"""WITH ${substrSpanCtes(anchored = false)}
             |SELECT doc_id, span_start, span_len FROM spans
             |ORDER BY doc_id, span_start""".stripMargin)),

    // The corpus-scale path for q149: windows only at CONTENT-DEFINED
    // anchor positions (8-char fingerprint ≡ 0 mod 8) — ~8× fewer window
    // rows through the shuffle. Identical content anchors identically in
    // every document, so sampled windows still collide exactly; q155
    // audits what the sampling costs in span coverage.
    "q154_anchor_substr_spans" -> Q(
      (s, dir) => Dedup.anchorSubstrSpans(
        Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample),
        "doc_id", "text", minLen = 50, anchorEvery = 8),
      Some(s"""WITH ${substrSpanCtes(anchored = true)}
             |SELECT doc_id, span_start, span_len FROM spans
             |ORDER BY doc_id, span_start""".stripMargin)),

    // Incremental maintenance of the anchored-window index (the q156
    // delta-assignment pattern applied to the substring family): the
    // standing index (docs % 10 != 0) is NOT recomputed — the delta docs'
    // anchored windows are appended to it, and the spans from the merged
    // index must equal the full-corpus rebuild, which is exactly what the
    // oracle computes. Documents are immutable, so append IS the complete
    // maintenance algebra; the delta pass costs O(delta bytes/anchorEvery).
    "q166_substr_index_incremental" -> Q(
      (s, dir) => {
        val capped = Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample)
        val standing = Dedup.anchoredWindows(
          capped.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          minLen = 50, anchorEvery = 8)
        val deltaWins = Dedup.anchoredWindows(
          capped.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          minLen = 50, anchorEvery = 8)
        Dedup.spansFromAnchorIndex(standing.unionByName(deltaWins), "doc_id", minLen = 50)
      },
      Some(s"""WITH ${substrSpanCtes(anchored = true)}
             |SELECT doc_id, span_start, span_len FROM spans
             |ORDER BY doc_id, span_start""".stripMargin)),

    // Recall audit of the anchor-sampled spans against the exact spans:
    // duplicated-character coverage ratio over the capped corpus — the
    // honest price of the ~8× shuffle cut, measured (the q76/q78/q136
    // pattern: the approximation AND its audit are both oracle-checked).
    "q155_anchor_substr_recall" -> Q(
      (s, dir) => {
        val capped = Tables.documents(s, dir).filter(col("doc_id") < ExactPairSample)
        val exact = Dedup.exactSubstrSpans(capped, "doc_id", "text", minLen = 50)
          .agg(sum("span_len").cast("long").as("exact_chars"))
        val anch = Dedup.anchorSubstrSpans(capped, "doc_id", "text", minLen = 50, anchorEvery = 8)
          .agg(sum("span_len").cast("long").as("anchored_chars"))
        exact.crossJoin(broadcast(anch))
          .select(col("exact_chars"), col("anchored_chars"),
            fr(col("anchored_chars").cast("double") / col("exact_chars").cast("double"), 4)
              .as("coverage"))
      },
      Some(s"""WITH ${substrSpanCtes(anchored = false, prefix = "e_")},
             |${substrSpanCtes(anchored = true, prefix = "a_")},
             |ec AS (SELECT CAST(sum(span_len) AS BIGINT) AS exact_chars FROM e_spans),
             |ac AS (SELECT CAST(sum(span_len) AS BIGINT) AS anchored_chars FROM a_spans)
             |SELECT exact_chars, anchored_chars,
             |  ${frs("CAST(anchored_chars AS DOUBLE) / CAST(exact_chars AS DOUBLE)", 4)} AS coverage
             |FROM ec CROSS JOIN ac""".stripMargin)),

    // Streaming ingest substring probe — the third stream-static probe
    // (LSH q102, IVF-PQ q151, verbatim substrings here): delta docs
    // (id % 10 = 0) stream in, their anchored windows probe the standing
    // corpus's window index, and the drained hits interval-merge into the
    // delta docs' duplicated spans. The oracle is the equivalent batch
    // join, so stream ≡ batch is hash-proven.
    "q157_stream_substr_probe" -> Q(
      (s, dir) => graft.streaming.StreamingSubstr.deltaSubstrSpans(
        s, dir, cap = ExactPairSample),
      Some(s"""WITH cw AS (
             |  SELECT substr(text, CAST(i AS BIGINT), 50) AS win
             |  FROM (SELECT text FROM documents
             |        WHERE doc_id < $ExactPairSample AND doc_id % 10 <> 0),
             |       UNNEST(range(1, greatest(length(text) - 49, 0) + 1)) AS t(i)
             |  WHERE (($anchorTermsSql) % 1000000007) % 8 = 0),
             |dw AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
             |    substr(text, CAST(i AS BIGINT), 50) AS win
             |  FROM (SELECT doc_id, text FROM documents
             |        WHERE doc_id < $ExactPairSample AND doc_id % 10 = 0),
             |       UNNEST(range(1, greatest(length(text) - 49, 0) + 1)) AS t(i)
             |  WHERE (($anchorTermsSql) % 1000000007) % 8 = 0),
             |marked AS (
             |  SELECT DISTINCT dw.doc_id, dw.pos
             |  FROM dw JOIN (SELECT DISTINCT win FROM cw) c USING (win)),
             |${anchorSpanTail("")}
             |SELECT doc_id, span_start, span_len FROM spans
             |ORDER BY doc_id, span_start""".stripMargin)),

    // Skip-gram pair extraction (the word2vec/GloVe co-occurrence pass):
    // (center, context) pairs at token distances 1 and 2, top-10 per
    // distance — next to q114's adjacency-only PMI this is the windowed
    // co-occurrence table embedding trainers actually consume. Map-only
    // double explode, one vocab-bounded count shuffle, rank per distance.
    "q127_skipgram_pairs" -> Q(
      (s, dir) => {
        val toks = split(col("text"), " ")
        // ONE scan + tokenization emits both distances: each position i
        // yields the d=1 struct and a d=2 struct whose w2 reads past the
        // array end on the last position — try_element_at returns null there
        // (ANSI element_at throws), filtered after the explode. Half the
        // I/O of a per-distance union.
        val pairAt = (d: Int) => (i: org.apache.spark.sql.Column) =>
          struct(lit(d.toLong).as("d"),
            element_at(col("__t"), i).as("w1"),
            try_element_at(col("__t"), i + d).as("w2"))
        val counts = Tables.documents(s, dir)
          .select(toks.as("__t"))
          .filter(size(col("__t")) >= 2)
          .select(explode(concat(
            transform(sequence(lit(1), size(col("__t")) - 1), pairAt(1)),
            transform(sequence(lit(1), size(col("__t")) - 1), pairAt(2)))).as("bg"))
          .select(col("bg.d").as("d"), col("bg.w1"), col("bg.w2"))
          .filter(col("w2").isNotNull)
          .groupBy("d", "w1", "w2").agg(count(lit(1)).as("n"))
        // Only the top-10 per distance is consumed, and d has 2 distinct
        // values — a rank window partitioned by d would funnel the whole
        // vocab²-bounded pair-count table through 2 tasks. The bounded
        // top-k aggregate (ObjectHashAggregate with a map-side partial
        // pass) forwards at most 10 rows per distance per partition, the
        // same (n desc, w1, w2) order as the window formulation.
        import graft.functions.expressions.TopKGramsAgg
        import org.apache.spark.sql.{GraftSqlBridge => B}
        val topk = B.column(TopKGramsAgg(
          B.expression(col("n")), B.expression(col("w1")), B.expression(col("w2")), 10)
          .toAggregateExpression())
        counts.groupBy("d").agg(topk.as("__top"))
          .select(col("d"), posexplode(col("__top")))
          .select(col("d"), col("col.w1"), col("col.w2"), col("col.n").as("n"),
            (col("pos") + 1).cast("long").as("rn"))
          .orderBy("d", "rn")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
             |    unnest(generate_series(1, len(string_split(text,' ')))) AS pos
             |  FROM documents),
             |pairs AS (
             |  SELECT v.d, a.w AS w1, b.w AS w2
             |  FROM tok a
             |  CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))) v(d)
             |  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + v.d),
             |c AS (
             |  SELECT d, w1, w2, CAST(count(*) AS BIGINT) AS n
             |  FROM pairs GROUP BY 1, 2, 3),
             |r AS (
             |  SELECT d, w1, w2, n,
             |    CAST(row_number() OVER (PARTITION BY d ORDER BY n DESC, w1, w2) AS BIGINT) AS rn
             |  FROM c)
             |SELECT d, w1, w2, n, rn FROM r WHERE rn <= 10 ORDER BY d, rn""".stripMargin)),

    // Per-language quality percentile ranks — the CDF transform that turns
    // q20's raw quality score into the per-stratum relative cutoffs quality
    // gates actually use (an absolute threshold penalizes whole languages).
    // percent_rank = (rank-1)/(n-1) over exact integer ranks: ties share a
    // rank in both engines, so partition order is irrelevant.
    "q130_quality_percentile" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val q = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), fr(qualityScore(col("text")), 4).as("quality"))
        // Two-pass exact rank-by-aggregation: a per-lang percent_rank window
        // buffers a whole language's ROWS in one task; instead rank the
        // (lang, quality) COUNT table — its window input is bounded by the
        // distinct 4-dp quality values per lang (≤ 10⁴+1), independent of
        // corpus size — and a keyed join carries ranks back to rows.
        // percent_rank = (rank-1)/(n-1) with rank = 1 + count strictly below
        // (ties share the min rank, exactly the window function's contract).
        val vc = q.groupBy("lang", "quality").agg(count(lit(1)).as("__c"))
        val below = Window.partitionBy("lang").orderBy("quality")
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = vc.withColumn("__below", coalesce(sum("__c").over(below), lit(0L)))
        val totals = vc.groupBy("lang").agg(sum("__c").as("__n"))
        q.join(ranked.select("lang", "quality", "__below"), Seq("lang", "quality"))
          .join(totals, Seq("lang"))
          .withColumn("pct_rank", fr(
            when(col("__n") > 1,
              col("__below").cast("double") / (col("__n") - 1).cast("double"))
              .otherwise(lit(0.0)), 6))
          .select("doc_id", "lang", "quality", "pct_rank")
          .orderBy("lang", "doc_id")
      },
      Some(s"""WITH q AS (
             |  SELECT doc_id, lang, ${frs(qualityExprSql, 4)} AS quality
             |  FROM documents)
             |SELECT doc_id, lang, quality,
             |  ${frs("percent_rank() OVER (PARTITION BY lang ORDER BY quality)", 6)} AS pct_rank
             |FROM q ORDER BY lang, doc_id""".stripMargin)),

    // Per-source KL divergence from the corpus unigram distribution — the
    // domain-shift diagnostic next to q101's split-level TV distance:
    // KL(source || corpus) with add-one smoothing over the corpus vocab,
    // every term ln((cs+1)/(ns+V) · (n+V)/(c+1)) of exact BIGINTs. Sources
    // that diverge most from the mixture get flagged for reweighting.
    "q133_source_kl" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
        val corpus = toks.groupBy("w").agg(count(lit(1)).as("__c"))
        val vocab = corpus.agg(count(lit(1)).as("__v"), sum("__c").as("__n"))
        val bySource = toks.groupBy("source", "w").agg(count(lit(1)).as("__cs"))
        val srcTotals = bySource.groupBy("source").agg(sum("__cs").as("__ns"))
        // smoothed probabilities: p_s = (cs+1)/(ns+V), p_c = (c+1)/(n+V);
        // absent-in-source terms contribute nothing to the sum over the
        // source's OWN tokens (KL is an expectation under p_s — zero-count
        // vocab terms have zero weight in the plug-in estimator)
        bySource
          .join(corpus, Seq("w"))
          .join(srcTotals, Seq("source"))
          .crossJoin(vocab)
          .withColumn("__term",
            col("__cs").cast("double") / col("__ns").cast("double") *
              log((col("__cs") + 1).cast("double") / (col("__ns") + col("__v")).cast("double") *
                  ((col("__n") + col("__v")).cast("double") / (col("__c") + 1).cast("double"))))
          .groupBy("source")
          .agg(count(lit(1)).as("n_terms"), fr(sum("__term"), 6).as("kl_bits"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (
             |  SELECT source, w FROM (
             |    SELECT source, unnest(string_split(text,' ')) AS w FROM documents)
             |  WHERE w <> ''),
             |corpus AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
             |vocab AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(c) AS BIGINT) AS n FROM corpus),
             |bys AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cs FROM tok GROUP BY 1, 2),
             |st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM bys GROUP BY 1)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
             |  ${frs("""sum(CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE) *
             |    ln(CAST(cs + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE) *
             |       (CAST(n + v AS DOUBLE) / CAST(c + 1 AS DOUBLE))))""".stripMargin, 6)} AS kl_bits
             |FROM bys JOIN corpus USING (w) JOIN st USING (source) CROSS JOIN vocab
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // N-gram coverage curve: the share of total trigram MASS covered by the
    // top-k most frequent trigrams, k ∈ {10, 100, 1000} — the Zipf-mass
    // audit behind vocabulary/cache sizing (how much of the corpus do the
    // head grams explain). Exact integer counts; rank ties broken by gram.
    "q134_ngram_coverage" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // raw trigram OCCURRENCES (no per-doc dedup — this is a mass curve)
        val grams = Tables.documents(s, dir)
          .select(split(col("text"), " ").as("__t"))
          .filter(size(col("__t")) >= 3)
          .select(explode(transform(sequence(lit(1), size(col("__t")) - 2),
            i => concat_ws(" ", element_at(col("__t"), i),
              element_at(col("__t"), i + 1), element_at(col("__t"), i + 2)))).as("g"))
          .groupBy("g").agg(count(lit(1)).as("__c"))
        // Only ranks {10, 100, 1000} are consumed, so take the head with
        // TakeOrderedAndProject (a parallel partial top-k, NOT a global
        // sort) and rank/cumsum over the resulting <= 1000 rows. The window
        // below is single-partition by construction — over a GlobalLimit of
        // 1000 rows, not the billions-row distinct-gram table.
        val top = grams.orderBy(desc("__c"), col("g")).limit(1000)
        val ranked = top
          .withColumn("__rk", row_number().over(Window.orderBy(desc("__c"), col("g"))).cast("long"))
          .withColumn("__cum", sum("__c").over(
            Window.orderBy(desc("__c"), col("g"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val totals = grams.agg(sum("__c").as("__tot"), count(lit(1)).as("n_distinct"))
        import s.implicits._
        val ks = Seq(10L, 100L, 1000L).toDF("k")
        ranked
          .crossJoin(totals)
          .join(broadcast(ks), col("__rk") === col("k"))
          .select(col("k"), col("n_distinct"), col("__cum").as("mass_covered"),
            col("__tot").as("total_mass"),
            fr(col("__cum").cast("double") / col("__tot").cast("double"), 6).as("coverage"))
          .orderBy("k")
      },
      Some(s"""WITH g AS (
             |  SELECT g, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT unnest(list_transform(
             |      generate_series(1, greatest(len(toks)-2, 0)),
             |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
             |    FROM (SELECT string_split(text,' ') AS toks FROM documents))
             |  GROUP BY 1),
             |r AS (
             |  SELECT g, c,
             |    CAST(row_number() OVER (ORDER BY c DESC, g) AS BIGINT) AS rk,
             |    CAST(sum(c) OVER (ORDER BY c DESC, g
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM g),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS n_distinct FROM g)
             |SELECT k, n_distinct, cum AS mass_covered, tot AS total_mass,
             |  ${frs("CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)", 6)} AS coverage
             |FROM r CROSS JOIN t
             |JOIN (VALUES (CAST(10 AS BIGINT)), (CAST(100 AS BIGINT)), (CAST(1000 AS BIGINT))) v(k)
             |  ON rk = k
             |ORDER BY k""".stripMargin)),

    // Token-budget mixing plan: ~1000 proxy-tokens per source domain,
    // selected in deterministic pseudo-random order by a prefix-greedy
    // cumulative window — the "assemble N tokens per domain" step of
    // training-corpus mixing, with the fill-rate audit per domain.
    "q131_token_budget_mix" -> Q(
      (s, dir) => graft.operators.Sampling.tokenBudgetMix(
        Tables.documents(s, dir), "source", "doc_id", "n_chars",
        targetTokensPerDomain = 1000L),
      Some(graft.operators.Sampling.tokenBudgetMixSql(
        "documents", "source", "doc_id", "n_chars", targetTokensPerDomain = 1000L))),

    // TEMPERATURE-weighted source mixing (r11 verdict task 7): per-source
    // quotas ∝ n_s^α for a 1000-doc budget at α = 0.5 — the knob that
    // up-samples tail sources without drowning the head (q131 fills a flat
    // per-domain budget; this PICKS the budgets). Largest-remainder
    // allocation makes the quotas exact integers summing to the budget;
    // weights are integerized (⌊√n·10⁶⌋) so no float total can disagree
    // between engines (see Sampling.temperatureMix). PropertySpec pins
    // sum-to-budget and size-monotonicity across random size profiles.
    "q199_temperature_mix" -> Q(
      (s, dir) => graft.operators.Sampling.temperatureMix(
        Tables.documents(s, dir).groupBy(col("source")).agg(count(lit(1)).as("n")),
        "source", "n", alpha = 0.5, budget = 1000L),
      Some("""WITH src AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY source),
             |s2 AS (
             |  SELECT source, n,
             |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
             |  FROM src WHERE n > 0),
             |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM s2),
             |b AS (
             |  SELECT source, n,
             |    CAST(1000 * w AS DOUBLE) / CAST(tw AS DOUBLE) AS ideal
             |  FROM s2 CROSS JOIN t),
             |c AS (
             |  SELECT source, n, CAST(floor(ideal) AS BIGINT) AS base,
             |    ideal - floor(ideal) AS frac
             |  FROM b),
             |d AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS deficit FROM c),
             |r AS (
             |  SELECT source, n, base,
             |    row_number() OVER (ORDER BY frac DESC, source) AS rk
             |  FROM c)
             |SELECT source, n,
             |  CAST(base + (CASE WHEN rk <= deficit THEN 1 ELSE 0 END) AS BIGINT) AS quota
             |FROM r CROSS JOIN d ORDER BY source""".stripMargin)),

    // TEMPERATURE-INTEGRATED CURATION (r12 verdict task 7): q199 allocated
    // quotas but nothing consumed them — this is the full executed chain:
    // quality/repetition gates → exact dedup → decontamination (the q57
    // stages) → per-source counts → temperatureMix(α=0.5) → takeQuota
    // (per-source top-quota by deterministic hash priority, shuffle bounded
    // by the literal max quota before the exact per-key filter). The WHOLE
    // composition carries one oracle, q57-style — allocation and
    // consumption verified together.
    "q208_temperature_curate" -> Q(
      (s, dir) => {
        val docs   = Tables.documents(s, dir)
        val bench  = docs.filter(col("doc_id") % 20 === 7)
        val corpus = docs.filter(col("doc_id") % 20 =!= 7)
        val clean = graft.operators.Curation.stages(
          corpus, "doc_id", "text", bench, "text", "lang").clean
        val quotas = graft.operators.Sampling.temperatureMix(
          clean.groupBy(col("source")).agg(count(lit(1)).as("n")),
          "source", "n", alpha = 0.5, budget = 100L)
        graft.operators.Sampling.takeQuota(clean, "doc_id", "source", quotas)
          .select("doc_id", "source", "sel_rank", "quota")
          .orderBy("doc_id")
      },
      Some(s"""WITH $curateCtes,
             |clean AS (
             |  SELECT doc_id, source FROM deduped
             |  WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
             |src AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM clean GROUP BY source),
             |s2 AS (
             |  SELECT source, n,
             |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
             |  FROM src WHERE n > 0),
             |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM s2),
             |b2 AS (
             |  SELECT source, n,
             |    CAST(100 * w AS DOUBLE) / CAST(tw AS DOUBLE) AS ideal
             |  FROM s2 CROSS JOIN t),
             |c2 AS (
             |  SELECT source, n, CAST(floor(ideal) AS BIGINT) AS base,
             |    ideal - floor(ideal) AS frac
             |  FROM b2),
             |d2 AS (SELECT CAST(100 - sum(base) AS BIGINT) AS deficit FROM c2),
             |r2 AS (
             |  SELECT source, base,
             |    row_number() OVER (ORDER BY frac DESC, source) AS rk
             |  FROM c2),
             |qta AS (
             |  SELECT source,
             |    CAST(base + (CASE WHEN rk <= deficit THEN 1 ELSE 0 END) AS BIGINT) AS quota
             |  FROM r2 CROSS JOIN d2),
             |rnk AS (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY ${graft.operators.Sampling.hashShardSql("doc_id", 1000003)}, doc_id) AS rk
             |  FROM clean)
             |SELECT rnk.doc_id, rnk.source, CAST(rnk.rk AS BIGINT) AS sel_rank, qta.quota
             |FROM rnk JOIN qta USING (source) WHERE rnk.rk <= qta.quota
             |ORDER BY rnk.doc_id""".stripMargin)),
  )
}
