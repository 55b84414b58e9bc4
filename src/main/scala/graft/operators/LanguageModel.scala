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
      // three consumers (pair counts, context counts, the scoring join) —
      // without the barrier each re-scans the corpus and re-explodes
      .cache()
    val pairCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    val ctxCounts  = bigrams.groupBy("w1").agg(count(lit(1)).as("__c1"))
    bigrams
      .join(pairCounts, Seq("w1", "w2"))
      .join(ctxCounts, Seq("w1"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        floorRound(avg(col("__c12").cast("double") / col("__c1").cast("double")), roundTo)
          .as("lm_score"))
      .withColumnRenamed("id", idCol)
  }
}
