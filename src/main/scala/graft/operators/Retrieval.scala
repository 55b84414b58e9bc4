package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Keyword retrieval over the corpus — the lexical-search side of the engine,
  * next to the vector side ([[TopK]], [[AnnIndex]]). The reference delegates
  * retrieval entirely to its vector store (`/root/reference/vectrekker/
  * main.py:162-167`); a corpus engine additionally needs the classic sparse
  * ranker both as a baseline for embedding search and as the first stage of
  * hybrid retrieval.
  */
object Retrieval {

  /** Okapi BM25 (Robertson & Walker, SIGIR 1994; the SPARCK Jones/Robertson
    * probabilistic weighting): per document,
    *
    *   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * over a fixed query term set. Upgrades q41's TF-IDF from "characterize
    * the corpus" to "rank it for a query" — length-normalized and
    * saturating in tf, which raw TF-IDF is not.
    *
    * Scale design: the term filter is applied AT the token explode (map-side,
    * selective — only query-term postings survive), document length and
    * corpus stats (N, avgdl) are single-row/broadcast joins, and the final
    * per-document score folds each term's contribution in a FIXED order
    * (one conditional aggregate per term, summed left-to-right) so the
    * floating-point result is reproducible regardless of partitioning — and
    * identical to the DuckDB oracle's. Top-k is TakeOrderedAndProject.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, s"bm25 wants 1..8 query terms, got ${terms.size}")
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
    // per-document length + corpus stats over ALL documents with tokens
    // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).cast("long").as("dl")).cache()
    val stats = dl.agg(count(lit(1)).cast("long").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val tf = toks.filter(col("w").isin(terms: _*))
      .groupBy(idCol, "w").agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("long").as("df"))
    val contrib = {
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      val tfc = col("tf").cast("double") * (lit(k1) + lit(1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl")))
      idf * tfc
    }
    val scored = tf
      .join(broadcast(dfreq), Seq("w"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__c", contrib)
    // fixed-order fold over per-term contributions: sum(CASE term_i) is a
    // single value per doc, and the + chain is left-to-right in both engines
    // — no aggregation-order nondeterminism in the double sum
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w") === t, col("__c"))).as(s"__t$i")
    }
    val score = floorRound(
      terms.indices.map(i => coalesce(col(s"__t$i"), lit(0.0))).reduce(_ + _), 4)
    scored.groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_terms"), perTerm: _*)
      .select(col(idCol), col("n_terms"), score.as("bm25"))
      .orderBy(desc("bm25"), col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal rank
    * fusion outperforms Condorcet and individual rank learning methods",
    * SIGIR 2009): fuse ranked lists by `Σ_i 1/(k + rank_i(d))`, the standard
    * hybrid-retrieval combiner for lexical + vector rankings — rank-based,
    * so the incomparable score scales of BM25 and cosine never touch.
    *
    * Each input must carry (`idCol`, `rank`) with ranks 1-based and
    * deterministic (rank on a floor-rounded score with an id tiebreak).
    * The fused sum folds left-to-right over the lists in the given order —
    * no aggregation-order nondeterminism — and each term is one division of
    * doubles of small integers, bit-identical across engines.
    *
    * Scale: inputs are top-k lists (k rows each), so the fusion join is
    * trivially broadcastable no matter the corpus size behind the rankers.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              kRrf: Int = 60, topK: Int = 10, roundTo: Int = 6): DataFrame = {
    require(rankings.size >= 2, s"rrfFuse wants >= 2 ranked lists, got ${rankings.size}")
    val dupTags = rankings.map(_._1).groupBy(identity).collect { case (t, v) if v.size > 1 => t }
    require(dupTags.isEmpty, s"rrfFuse tags must be distinct, duplicated: ${dupTags.mkString(", ")}")
    rankings.foreach { case (tag, r) =>
      require(r.columns.contains("rank") && r.columns.contains(idCol),
        s"ranking '$tag' must carry columns ($idCol, rank), has ${r.columns.mkString(", ")}")
    }
    val tagged = rankings.map { case (tag, r) =>
      r.select(col(idCol), col("rank").cast("long").as(s"r_$tag"))
    }
    val joined = tagged.reduce((x, y) => x.join(y, Seq(idCol), "full_outer"))
    val rrf = rankings.map { case (tag, _) =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"r_$tag").cast("double")), lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf", floorRound(rrf, roundTo))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }

  /** DuckDB mirror of [[bm25]] — keep token-for-token in sync with the
    * column expressions above (same literal types, same associativity).
    */
  def bm25Sql(table: String, idCol: String, textCol: String, terms: Seq[String],
              k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val idf = s"ln(CAST(1.0 AS DOUBLE) + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
    val tfc = s"CAST(tf AS DOUBLE) * (CAST($k1 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST($b AS DOUBLE) + CAST($b AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl))"
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN w = '$t' THEN c END) AS __t$i"
    }.mkString(", ")
    val scoreSum = terms.indices.map(i => s"coalesce(__t$i, CAST(0.0 AS DOUBLE))").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT $idCol, unnest(string_split($textCol, ' ')) AS w FROM $table),
       |tf0 AS (SELECT $idCol, w FROM tok WHERE w <> ''),
       |dl AS (SELECT $idCol, CAST(count(*) AS BIGINT) AS dl FROM tf0 GROUP BY 1),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
       |tf AS (
       |  SELECT $idCol, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM tf0 WHERE w IN ($termList) GROUP BY 1, 2),
       |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.$idCol, tf.w, ($idf) * ($tfc) AS c
       |  FROM tf JOIN dfreq USING (w) JOIN dl USING ($idCol) CROSS JOIN stats),
       |agg AS (
       |  SELECT $idCol, CAST(count(*) AS BIGINT) AS n_terms, $perTerm
       |  FROM scored GROUP BY 1)
       |SELECT $idCol, n_terms, ${graft.functions.MathFunctions.floorRoundSql(s"($scoreSum)", 4)} AS bm25
       |FROM agg ORDER BY bm25 DESC, $idCol LIMIT $topK""".stripMargin
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, "The use of
    * MMR, diversity-based reranking", SIGIR 1998): greedily select `k` of the
    * top-`shortK` relevance shortlist, each step maximizing
    * `λ·rel − (1−λ)·max(sim to already-selected)` — the standard
    * diversity-aware second stage of a retrieval pipeline (a pure relevance
    * top-k returns near-duplicates of the best hit; MMR spends the slots on
    * coverage).
    *
    * Scale shape: stage 1 is the distributed [[TopK.topK]]
    * (TakeOrderedAndProject over the full corpus); the shortlist and its
    * pairwise similarities are then BOUNDED PARAMETER DATA (shortK ≤ ~100
    * rows, shortK² sims, both computed distributed and collected), and the
    * greedy loop is O(k·shortK) driver arithmetic — the same
    * parameters-not-data pattern as the IVF centroid fetches. Both λ and
    * 1−λ are passed explicitly: deriving `1 − 0.7` at runtime yields
    * 0.30000000000000004 and would diverge from an oracle's literal 0.3.
    *
    * Output: (sel_rank, vec_id, rel) in selection order — rel is the
    * floor-rounded stage-1 relevance, so the whole selection is
    * oracle-checkable (q141 mirrors the greedy loop as unrolled SQL stages).
    */
  def mmrRerank(corpus: DataFrame, idCol: String, vecCol: String,
                query: Seq[Double], shortK: Int, k: Int,
                lambda: Double, oneMinusLambda: Double,
                roundTo: Int = 6): DataFrame = {
    import graft.functions.VectorFunctions.{asDouble, cosineFromNormSq, l2NormSq}
    require(k >= 1 && shortK >= k, s"need 1 <= k <= shortK, got k=$k shortK=$shortK")
    require(math.abs(lambda + oneMinusLambda - 1.0) < 1e-12,
      s"lambda ($lambda) and oneMinusLambda ($oneMinusLambda) must sum to 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val shortlist = TopK.topK(corpus.select(col(idCol), col(vecCol)), vecCol, idCol,
        query, shortK, roundTo)
      .select(col(idCol).cast("long").as("__id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val member = shortlist.map(_._1).toSeq.toDF("__mid")
    val vecs = corpus.join(broadcast(member), col(idCol) === col("__mid"))
      .select(col(idCol).cast("long").as("__vid"), asDouble(col(vecCol)).as("__v"))
      .withColumn("__nsq", l2NormSq(col("__v")))
    val sims: Map[(Long, Long), Double] = vecs.as("a")
      .join(vecs.as("b"), col("a.__vid") < col("b.__vid"))
      .select(col("a.__vid"), col("b.__vid"),
        floorRound(cosineFromNormSq(col("a.__v"), col("b.__v"),
          col("a.__nsq"), col("b.__nsq")), roundTo).as("__s"))
      .collect().flatMap { r =>
        val (x, y, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((x, y) -> s, (y, x) -> s)
      }.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(shortlist.toSeq: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val (bestId, bestRel) =
        if (selected.isEmpty) remaining.maxBy { case (id, rel) => (rel, -id) }
        else remaining.maxBy { case (id, rel) =>
          val maxSim = selected.map(s => sims((id, s._1))).max
          (lambda * rel - oneMinusLambda * maxSim, -id)
        }
      selected += ((bestId, bestRel))
      remaining.remove(bestId)
    }
    selected.toSeq.zipWithIndex
      .map { case ((id, rel), i) => (i + 1L, id, rel) }
      .toDF("sel_rank", "vec_id", "rel")
  }

  /** RANKING-QUALITY EVALUATION — the IR report card for any ranked
    * retrieval relation against a binary-relevance truth set: per query,
    * precision@k, MRR (reciprocal rank of the first relevant hit, 0 when
    * none lands in the top k), and nDCG@k (binary gains: DCG =
    * Σ_{relevant hits} 1/log₂(rank+1), IDCG over the ideal prefix).
    * Complements the recall@k audits (q135/q177/q197 measure WHETHER the
    * truth arrives; this measures WHERE it ranks).
    *
    * Float determinism: every DCG is a LEFT FOLD over an explicitly sorted
    * rank list (`aggregate(sort_array(...))` here, DuckDB
    * `list_reduce(list_prepend(...))` in the oracle — the q26 pattern), so
    * the addition order is pinned and the doubles agree bit-for-bit across
    * engines; MRR and precision are single divisions of exact integers.
    *
    * Scale shape: one equi-join of ranking against truth on (query, doc),
    * one aggregate per query with state bounded by k — never by corpus or
    * candidate count.
    *
    * Input contracts: `ranked` carries (qCol, dCol, rankCol) with ranks
    * 1..k per query; `truth` carries (qCol, dCol) — every truth query
    * appears in the output even when the ranking missed it entirely.
    */
  def rankingEval(ranked: DataFrame, truth: DataFrame, qCol: String,
                  dCol: String, rankCol: String, k: Int,
                  roundTo: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hits = ranked
      .select(col(qCol), col(dCol), col(rankCol).cast("long").as("__r"))
      .filter(col("__r") <= k)
      .join(truth.select(col(qCol), col(dCol)), Seq(qCol, dCol))
    val nRel = truth.groupBy(col(qCol)).agg(count(lit(1)).as("n_rel"))
    val perQ = hits.groupBy(col(qCol)).agg(
      count(lit(1)).as("n_hits"),
      min("__r").as("__minr"),
      sort_array(collect_list(col("__r"))).as("__rs"))
    def foldDcg(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0),
        (acc, r) => acc + lit(1.0) / log2(r.cast("double") + lit(1.0)))
    nRel.join(perQ, Seq(qCol), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("__rs",
        coalesce(col("__rs"), array().cast("array<long>")))
      .withColumn("__dcg", foldDcg(col("__rs")))
      .withColumn("__idcg",
        foldDcg(sequence(lit(1L), least(lit(k.toLong), col("n_rel")))))
      .select(col(qCol), col("n_rel"), col("n_hits"),
        floorRound(col("n_hits").cast("double") / lit(k.toDouble), roundTo).as("p_at_k"),
        floorRound(when(col("__minr").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__minr").cast("double")), roundTo).as("mrr"),
        floorRound(col("__dcg"), roundTo).as("dcg"),
        floorRound(col("__idcg"), roundTo).as("idcg"),
        floorRound(col("__dcg") / col("__idcg"), roundTo).as("ndcg"))
      .orderBy(qCol)
  }

  /** GRADED-relevance variant of [[rankingEval]] — nDCG with graded gains
    * (Järvelin & Kekäläinen, TOIS 2002; gain = 2^grade − 1, the "Burges"
    * exponential gain of LambdaRank/MSLR), which is what published
    * embedding-search evals report: a system that ranks a grade-3 document
    * at position 1 must beat one that leads with a grade-1 document, which
    * binary nDCG cannot see. `truth` carries (qCol, dCol, gradeCol) with
    * small positive integer grades.
    *
    * Float determinism (the same ordered-fold rule as [[rankingEval]]):
    * per-hit contributions are materialized as an array in EXPLICIT rank
    * order (ideal side: grade-descending order) and summed by a left fold —
    * the DuckDB mirror builds the identical lists with `list(x ORDER BY y)`
    * + `list_transform(generate_series(...))`, so the doubles agree
    * bit-for-bit. gains 2^g − 1 are exact doubles for any small int g.
    *
    * Scale shape: identical to [[rankingEval]] — one equi-join on
    * (query, doc), one aggregate per query with state bounded by k.
    */
  def rankingEvalGraded(ranked: DataFrame, truth: DataFrame, qCol: String,
                        dCol: String, rankCol: String, gradeCol: String,
                        k: Int, roundTo: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def gain(g: org.apache.spark.sql.Column) =
      pow(lit(2.0), g.cast("double")) - lit(1.0)
    def foldSum(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val hits = ranked
      .select(col(qCol), col(dCol), col(rankCol).cast("long").as("__r"))
      .filter(col("__r") <= k)
      .join(truth.select(col(qCol), col(dCol),
        col(gradeCol).cast("long").as("__g")), Seq(qCol, dCol))
    val nRel = truth.groupBy(col(qCol)).agg(
      count(lit(1)).as("n_rel"),
      // ideal gain order: grade DESC — sort_array asc on struct(-g) then
      // project back, so the ideal prefix is deterministic
      transform(sort_array(collect_list(struct(
        (-col(gradeCol).cast("long")).as("__ng")))), x => -x.getField("__ng"))
        .as("__ideal"))
    val perQ = hits.groupBy(col(qCol)).agg(
      count(lit(1)).as("n_hits"),
      // rank-ascending (rank is unique per query) contribution order
      transform(sort_array(collect_list(struct(col("__r"), col("__g")))),
        x => gain(x.getField("__g")) /
          log2(x.getField("__r").cast("double") + lit(1.0))).as("__contrib"))
    nRel.join(perQ, Seq(qCol), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("__contrib",
        coalesce(col("__contrib"), array().cast("array<double>")))
      .withColumn("__dcg", foldSum(col("__contrib")))
      .withColumn("__icontrib",
        zip_with(slice(col("__ideal"), 1, k),
          sequence(lit(1L), least(lit(k.toLong), size(col("__ideal")).cast("long"))),
          (g, r) => gain(g) / log2(r.cast("double") + lit(1.0))))
      .withColumn("__idcg", foldSum(col("__icontrib")))
      .select(col(qCol), col("n_rel"), col("n_hits"),
        floorRound(col("__dcg"), roundTo).as("dcg"),
        floorRound(col("__idcg"), roundTo).as("idcg"),
        floorRound(col("__dcg") / col("__idcg"), roundTo).as("ndcg"))
      .orderBy(qCol)
  }

  /** SQL twin of [[rankingEval]]'s metric tail — expects CTEs `sysr`
    * ($qCol, $dCol, rn ≤ k) and `tru` ($qCol, $dCol) in scope. Shared by
    * q228/q229 (vector evals, q_id/c_id) and q231 (hybrid legs,
    * leg/doc_id) so the metric arithmetic cannot drift between reports.
    * Every double sum is the left fold both engines share.
    */
  def rankingEvalTailSql(k: Int, qCol: String = "q_id",
                         dCol: String = "c_id"): String = {
    import graft.functions.MathFunctions.{floorRoundSql => frs}
    s"""hit AS (
       |  SELECT s.$qCol, s.rn FROM sysr s
       |  JOIN tru t ON s.$qCol = t.$qCol AND s.$dCol = t.$dCol),
       |nrel AS (SELECT $qCol, CAST(count(*) AS BIGINT) AS n_rel FROM tru GROUP BY 1),
       |hq AS (
       |  SELECT $qCol, CAST(count(*) AS BIGINT) AS n_hits, min(rn) AS minr,
       |    list_sort(list(rn)) AS rs
       |  FROM hit GROUP BY 1),
       |jq AS (
       |  SELECT nrel.$qCol, n_rel,
       |    coalesce(n_hits, CAST(0 AS BIGINT)) AS n_hits, minr,
       |    coalesce(rs, []::BIGINT[]) AS rs
       |  FROM nrel LEFT JOIN hq USING ($qCol)),
       |mq AS (
       |  SELECT *,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(rs,
       |      r -> CAST(1.0 AS DOUBLE) / log2(CAST(r AS DOUBLE) + CAST(1.0 AS DOUBLE)))),
       |      (acc, x) -> acc + x) AS dcgr,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(
       |      generate_series(1, least($k, n_rel)),
       |      r -> CAST(1.0 AS DOUBLE) / log2(CAST(r AS DOUBLE) + CAST(1.0 AS DOUBLE)))),
       |      (acc, x) -> acc + x) AS idcgr
       |  FROM jq)
       |SELECT $qCol, n_rel, n_hits,
       |  ${frs(s"CAST(n_hits AS DOUBLE) / CAST($k.0 AS DOUBLE)", 6)} AS p_at_k,
       |  ${frs("CASE WHEN minr IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) / CAST(minr AS DOUBLE) END", 6)} AS mrr,
       |  ${frs("dcgr", 6)} AS dcg,
       |  ${frs("idcgr", 6)} AS idcg,
       |  ${frs("dcgr / idcgr", 6)} AS ndcg
       |FROM mq ORDER BY $qCol""".stripMargin
  }

  /** SQL twin of [[rankingEvalGraded]]'s metric tail — expects CTEs `sysr`
    * ($qCol, $dCol, rn ≤ k) and `tru` ($qCol, $dCol, grade) in scope. The
    * hit contributions fold in rank order (`list(... ORDER BY rn)`), the
    * ideal prefix in grade-descending order — the exact lists the Spark
    * side builds, so the graded DCGs hash-match.
    */
  def rankingEvalGradedTailSql(k: Int, qCol: String = "q_id",
                               dCol: String = "c_id"): String = {
    import graft.functions.MathFunctions.{floorRoundSql => frs}
    val gainOf = (g: String) =>
      s"(pow(CAST(2.0 AS DOUBLE), CAST($g AS DOUBLE)) - CAST(1.0 AS DOUBLE))"
    s"""hit AS (
       |  SELECT s.$qCol, s.rn, t.grade FROM sysr s
       |  JOIN tru t ON s.$qCol = t.$qCol AND s.$dCol = t.$dCol),
       |nrel AS (
       |  SELECT $qCol, CAST(count(*) AS BIGINT) AS n_rel,
       |    list(grade ORDER BY grade DESC) AS ideal
       |  FROM tru GROUP BY 1),
       |hq AS (
       |  SELECT $qCol, CAST(count(*) AS BIGINT) AS n_hits,
       |    list(rn ORDER BY rn) AS rs, list(grade ORDER BY rn) AS gs
       |  FROM hit GROUP BY 1),
       |jq AS (
       |  SELECT nrel.$qCol, n_rel,
       |    coalesce(n_hits, CAST(0 AS BIGINT)) AS n_hits,
       |    coalesce(rs, []::BIGINT[]) AS rs, coalesce(gs, []::BIGINT[]) AS gs,
       |    list_slice(ideal, 1, $k) AS idk
       |  FROM nrel LEFT JOIN hq USING ($qCol)),
       |mq AS (
       |  SELECT *,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len(rs)),
       |        i -> ${gainOf("gs[i]")} / log2(CAST(rs[i] AS DOUBLE) + CAST(1.0 AS DOUBLE)))),
       |      (acc, x) -> acc + x) AS dcgr,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len(idk)),
       |        i -> ${gainOf("idk[i]")} / log2(CAST(i AS DOUBLE) + CAST(1.0 AS DOUBLE)))),
       |      (acc, x) -> acc + x) AS idcgr
       |  FROM jq)
       |SELECT $qCol, n_rel, n_hits,
       |  ${frs("dcgr", 6)} AS dcg,
       |  ${frs("idcgr", 6)} AS idcg,
       |  ${frs("dcgr / idcgr", 6)} AS ndcg
       |FROM mq ORDER BY $qCol""".stripMargin
  }

  /** Macro summary of a [[rankingEval]] relation: the one-row dashboard
    * number — query count and mean precision@k / MRR / nDCG. Each mean is
    * an ordered fold over the VALUE-SORTED per-query list (same
    * determinism rule as the per-query DCGs: pin the double addition
    * order, and the average hash-matches across engines).
    */
  def rankingEvalSummary(perQuery: DataFrame, roundTo: Int = 6): DataFrame = {
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      meanOrdered("p_at_k", roundTo), meanOrdered("mrr", roundTo),
      meanOrdered("ndcg", roundTo))
  }

  /** [[rankingEvalSummary]] GROUPED by a key column (e.g. the retrieval leg
    * in a lexical-vs-vector-vs-hybrid comparison): one dashboard row per
    * group, same ordered-fold determinism per group. `metrics` names the
    * per-query columns to macro-average — the default matches
    * [[rankingEval]]'s outputs; a [[rankingEvalGraded]] relation passes
    * `Seq("ndcg")` (graded rows carry no p@k/MRR).
    */
  def rankingEvalSummaryBy(perQuery: DataFrame, byCol: String,
                           roundTo: Int = 6,
                           metrics: Seq[String] = Seq("p_at_k", "mrr", "ndcg")): DataFrame = {
    require(metrics.nonEmpty, "rankingEvalSummaryBy needs at least one metric column")
    val aggs = count(lit(1)).as("n_queries") +: metrics.map(meanOrdered(_, roundTo))
    perQuery.groupBy(col(byCol)).agg(aggs.head, aggs.tail: _*)
      .orderBy(byCol)
  }

  private def meanOrdered(c: String, roundTo: Int) = floorRound(
    aggregate(sort_array(collect_list(col(c))), lit(0.0), (a, x) => a + x) /
      count(lit(1)).cast("double"), roundTo).as(s"mean_$c")
}
