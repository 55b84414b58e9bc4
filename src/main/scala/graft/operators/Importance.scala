package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.TextFunctions.shingleHashesPoly
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** DSIR-style importance weighting (Xie et al., "Data selection for language
  * models via importance resampling", NeurIPS 2023): estimate how much more
  * likely a document's hashed n-gram features are under a TARGET distribution
  * than under the RAW corpus distribution, and score the document by the mean
  * likelihood ratio over its bigram occurrences. High-scoring documents "look
  * like" the target domain and get preferentially sampled.
  *
  * Deviations from the paper are deliberate, to keep the weight itself
  * ORACLE-CHECKABLE: the feature is the [[graft.functions.expressions.PolyHash]]
  * bigram hash bucketed mod `buckets` (the paper's hashed n-grams), counts are
  * Laplace-smoothed (+1 / +buckets), and the score is a mean of
  * per-occurrence probability ratios rather than a summed log-likelihood —
  * each ratio is one IEEE division of two EXACT integer products, so no
  * transcendental (log) whose last-ulp behavior could differ across engines
  * enters the value; the resampling step consumes only the ranking, which is
  * preserved.
  *
  * Plan shape at 100 TB: bigram → bucket is a map-only fused-kernel explode;
  * both count tables are bounded by `buckets` (fixed, e.g. 8k), so they
  * broadcast back onto the stream; one final shuffle on the doc id for the
  * mean. The corpus is never joined against itself.
  */
object Importance {

  /** (id, n_bigrams, dsir_weight) per document with >= 1 bigram. `isTarget`
    * marks the rows whose distribution is the sampling target (target rows
    * stay part of raw — weights are against the full mixture).
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int, roundTo: Int = 6): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val toks = split(col(textCol), " ")
    // per-OCCURRENCE bigram buckets (shingleHashesPoly on the full text
    // would dedup them): each adjacent pair re-joined with a space is a
    // 2-token string whose single poly-shingle hash is exactly the
    // (h1·R + h2) mod P bigram fold the DuckDB oracle mirrors
    val feats = df
      .select(col(idCol).as("id"), isTarget.cast("long").as("__t"), toks.as("__toks"))
      // sequence(1, size-1) DESCENDS for single-token docs — drop them; they
      // have no bigrams and no output row either way
      .filter(size(col("__toks")) >= 2)
      .select(col("id"), col("__t"), explode(
        transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
                      element_at(col("__toks"), i + 1)))).as("__bg"))
      .select(col("id"), col("__t"),
        (element_at(shingleHashesPoly(col("__bg"), 2), 1) % lit(buckets.toLong)).as("__f"))
      .cache() // consumers: target counts, raw counts, totals, scoring join
    val tCnt = feats.filter(col("__t") === 1).groupBy("__f").agg(count(lit(1)).as("__ct"))
    val rCnt = feats.groupBy("__f").agg(count(lit(1)).as("__cr"))
    val tot  = feats.agg(sum(col("__t")).as("__nt"), count(lit(1)).as("__nr"))
    feats
      .join(rCnt, Seq("__f"))
      .join(tCnt, Seq("__f"), "left")
      .crossJoin(tot)
      .withColumn("__ratio",
        ((coalesce(col("__ct"), lit(0L)) + lit(1L)) * (col("__nr") + lit(buckets.toLong))).cast("double") /
          ((col("__cr") + lit(1L)) * (col("__nt") + lit(buckets.toLong))).cast("double"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        floorRound(avg(col("__ratio")), roundTo).as("dsir_weight"))
      .withColumnRenamed("id", idCol)
  }
}
