package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the perplexity-style
  * fluency filter of LLM data pipelines (CCNet / Wenzek et al., "CCNet:
  * extracting high-quality monolingual datasets from web crawl data", LREC
  * 2020, filter documents by LM score): documents whose word transitions are
  * rare under a model trained on the corpus itself score low and get culled.
  *
  * The score is the mean conditional bigram probability
  * `avg over bigrams of p(w2|w1) = c(w1,w2) / c(w1·)` — deliberately kept in
  * probability space (no log/exp) so the whole computation is modular
  * integer counting plus IEEE divisions, reproducible bit-exactly in DuckDB
  * SQL. Monotonicity is the same as negative log-perplexity for ranking
  * purposes; the filter decision (bottom quantile) is unchanged.
  *
  * Plan shape at 100 TB: bigram extraction is a map-only explode; the two
  * count tables aggregate with map-side partial combine and are bounded by
  * the vocabulary (quadratic in vocab, not corpus) — small enough to
  * broadcast back onto the bigram stream in practice, and AQE picks that up
  * from the aggregated size; the per-doc average is one final shuffle on
  * doc_id.
  */
object LanguageModel {

  /** (id, n_bigrams, lm_score) for every document with >= 1 bigram.
    * `lm_score` is the floor-rounded mean of p(w2|w1) over the document's
    * bigrams, with probabilities from the whole-input bigram/context counts.
    */
  def bigramScore(df: DataFrame, idCol: String, textCol: String,
                  roundTo: Int = 6): DataFrame = {
    val toks = split(col(textCol), " ")
    // adjacent pairs, order-preserving: bigram i = (tok[i], tok[i+1])
    val bigrams = df
      .select(col(idCol).as("id"), toks.as("__t"))
      // sequence(1, size-1) DESCENDS for single-token docs (sequence(1,0) =
      // [1,0] in Spark) and would index past the array — drop them here;
      // they have no bigrams and no row in the output either way
      .filter(size(col("__t")) >= 2)
      .select(col("id"), explode(
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
                      element_at(col("__t"), i + 1).as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1"), col("bg.w2"))
    // Pre-reduce to per-doc DISTINCT bigrams with multiplicities before any
    // join: the count tables derive from the reduced relation (sums of k),
    // and the scoring join attaches to ~doc·distinct rows instead of every
    // bigram instance — the instance stream is never materialized, cached,
    // or shuffled twice. The per-doc mean over instances is recovered
    // exactly as the k-weighted mean over distinct bigrams.
    // deliberately NOT cached: the two consumers re-run a map-only explode +
    // partial agg inside whole-stage codegen, which measures faster than one
    // columnar-cache round-trip of ~1M string-pair rows (A/B at sf0.1:
    // 2.6 s uncached vs 3.8 s cached, and no executor-memory footprint)
    val docBg = bigrams
      .groupBy("id", "w1", "w2").agg(count(lit(1)).as("__k"))
    val pairCounts = docBg.groupBy("w1", "w2").agg(sum("__k").as("__c12"))
    val ctxCounts  = pairCounts.groupBy("w1").agg(sum("__c12").as("__c1"))
    docBg
      .join(pairCounts, Seq("w1", "w2"))
      .join(ctxCounts, Seq("w1"))
      .groupBy(col("id"))
      .agg(sum("__k").cast("long").as("n_bigrams"),
        floorRound(
          sum(col("__k").cast("double") *
            (col("__c12").cast("double") / col("__c1").cast("double"))) /
            sum("__k").cast("double"), roundTo)
          .as("lm_score"))
      .withColumnRenamed("id", idCol)
  }

  /** PMI collocation mining (Church & Hanks, "Word association norms, mutual
    * information, and lexicography", Computational Linguistics 1990; the
    * phrase-detection score of word2vec's phrase pass): for adjacent word
    * pairs,
    *
    *   pmi(w1,w2) = ln( c(w1,w2) · N / (c(w1,·) · c(·,w2)) )
    *
    * with N the total bigram count, c(w1,·) the count of w1 in first
    * position and c(·,w2) of w2 in second — high-PMI pairs co-occur far more
    * than their marginals predict and are merge candidates for tokenizer
    * vocabularies. Both products stay in exact BIGINT (each factor <= N, so
    * the products are < N² ~ 10¹² at sf1); the only FP ops are one division
    * and one ln, identical in both engines.
    *
    * Plan shape at 100 TB: map-only bigram explode, then three
    * vocabulary-bounded aggregations (pair, first-position, second-position
    * counts) with map-side partial combine; the marginal joins attach to the
    * PAIR table (vocabulary-bounded, never the corpus stream) and broadcast
    * under AQE. TakeOrderedAndProject for the top-k.
    */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5, topK: Int = 25, roundTo: Int = 6): DataFrame = {
    val toks = split(col(textCol), " ")
    val bigrams = df
      .select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
                      element_at(col("__t"), i + 1).as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    // ONE pass over the instance stream: marginals and the total derive
    // EXACTLY from the pair-count table (c1 = Σ_w2 c12, c2 = Σ_w1 c12,
    // N = Σ c12) — the explode runs once, and the cached relation is the
    // vocab-bounded pair table, not the corpus-sized instance stream
    val pairCounts  = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .cache() // four consumers: both marginals, the total, the scoring join
    val firstCounts = pairCounts.groupBy("w1").agg(sum("c12").as("c1"))
    val secondCounts = pairCounts.groupBy("w2").agg(sum("c12").as("c2"))
    val total = pairCounts.agg(sum("c12").as("n_total"))
    pairCounts
      .filter(col("c12") >= minCount)
      .join(broadcast(firstCounts), Seq("w1"))
      .join(broadcast(secondCounts), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pmi", floorRound(
        log((col("c12") * col("n_total")).cast("double") /
            (col("c1") * col("c2")).cast("double")), roundTo))
      .select("w1", "w2", "c12", "pmi")
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(topK)
  }

  /** DuckDB mirror of [[collocations]] — keep token-for-token in sync. */
  def collocationsSql(table: String, textCol: String,
                      minCount: Long = 5, topK: Int = 25, roundTo: Int = 6): String = {
    val fr = graft.functions.MathFunctions.floorRoundSql _
    s"""WITH t AS (
       |  SELECT string_split($textCol, ' ') AS toks FROM $table
       |  WHERE len(string_split($textCol, ' ')) >= 2),
       |bg AS (
       |  SELECT toks[i] AS w1, toks[i+1] AS w2
       |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t)),
       |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
       |m1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pc GROUP BY 1),
       |m2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM pc GROUP BY 1),
       |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_total FROM pc)
       |SELECT w1, w2, c12,
       |  ${fr("ln(CAST(c12 * n_total AS DOUBLE) / CAST(c1 * c2 AS DOUBLE))", roundTo)} AS pmi
       |FROM pc JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN n
       |WHERE c12 >= $minCount
       |ORDER BY pmi DESC, w1, w2 LIMIT $topK""".stripMargin
  }
}
