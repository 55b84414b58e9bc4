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
    // Pre-reduce to per-doc DISTINCT features with multiplicities before any
    // join (same playbook as LanguageModel.bigramScore): the count tables
    // are sums of k over the reduced relation, and the scoring join never
    // touches the per-occurrence stream. The per-occurrence mean ratio is
    // recovered exactly as the k-weighted mean over distinct features.
    val docFeat = feats
      .groupBy("id", "__f").agg(count(lit(1)).as("__k"), max("__t").as("__t"))
      .cache() // consumers: target counts, raw counts, totals, scoring join
    val tCnt = docFeat.filter(col("__t") === 1).groupBy("__f").agg(sum("__k").as("__ct"))
    val rCnt = docFeat.groupBy("__f").agg(sum("__k").as("__cr"))
    val tot  = docFeat.agg(sum(col("__t") * col("__k")).as("__nt"), sum("__k").as("__nr"))
    docFeat
      .join(rCnt, Seq("__f"))
      .join(tCnt, Seq("__f"), "left")
      .crossJoin(tot)
      .withColumn("__ratio",
        ((coalesce(col("__ct"), lit(0L)) + lit(1L)) * (col("__nr") + lit(buckets.toLong))).cast("double") /
          ((col("__cr") + lit(1L)) * (col("__nt") + lit(buckets.toLong))).cast("double"))
      .groupBy("id")
      .agg(sum("__k").cast("long").as("n_bigrams"),
        floorRound(
          sum(col("__k").cast("double") * col("__ratio")) / sum("__k").cast("double"),
          roundTo).as("dsir_weight"))
      .withColumnRenamed("id", idCol)
  }

  /** Temperature-0.5 mixture reweighting across domains: the GPT-3-style
    * rebalance π_d ∝ p_d^T that upweights small domains (T = 0.5 here, i.e.
    * √p — chosen because sqrt is IEEE-correctly-rounded everywhere, so the
    * whole computation is engine-reproducible; a general p^T needs libm pow
    * and loses that). Output per domain: document count, current share,
    * target mixture weight π_d, and the resampling rate π_d·N/n_d a sampler
    * must apply (rates > 1 mean the domain repeats across epochs).
    *
    * The normalizer Σ_d √n_d is a float sum — summed as a SEQUENTIAL fold
    * over the domain-sorted list (collect_list → sort_array → aggregate),
    * so the accumulation order is fixed and the oracle's list_reduce
    * reproduces it bit-for-bit. Domain cardinality is small by definition
    * (it's a mixture), so the fold is a single tiny row.
    */
  def mixtureWeights(df: DataFrame, domainCol: String,
                     roundTo: Int = 6): DataFrame = {
    val counts = df.groupBy(domainCol).agg(count(lit(1)).cast("long").as("n_docs"))
    val totals = counts.agg(
      sum("n_docs").cast("long").as("__n"),
      aggregate(
        sort_array(collect_list(struct(col(domainCol), sqrt(col("n_docs").cast("double")).as("w")))),
        lit(0.0), (acc, s) => acc + s.getField("w")).as("__sw"))
    counts.crossJoin(broadcast(totals))
      .select(col(domainCol), col("n_docs"),
        floorRound(col("n_docs").cast("double") / col("__n").cast("double"), roundTo).as("share"),
        floorRound(sqrt(col("n_docs").cast("double")) / col("__sw"), roundTo).as("mix_weight"),
        floorRound(sqrt(col("n_docs").cast("double")) / col("__sw") * col("__n").cast("double") /
          col("n_docs").cast("double"), roundTo).as("target_rate"))
      .orderBy(domainCol)
  }
}
