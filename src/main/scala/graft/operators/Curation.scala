package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.TextFunctions.{qualityScore, repetitionScore}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the chain an LLM pre-training data pipeline
  * actually runs, composed from this library's operators in the canonical
  * order (cheapest-first so each stage shrinks the next stage's input):
  *
  *  1. quality gate (rule-based score ≥ minQuality)            — map-only
  *  2. repetition gate (duplicate-n-gram fraction ≤ maxRep)    — map-only
  *  3. exact dedup, keep lowest id                             — 1 hash shuffle
  *  4. benchmark decontamination (n-gram collision)            — broadcast semi-join
  *  5. deterministic stratified sampling                       — map-only
  *
  * Every stage is SQL-expressible, so the WHOLE chain carries one DuckDB
  * oracle (q57) — the composition, not just the parts, is verified.
  */
object Curation {

  final case class Params(
      minQuality: Double = 0.5,
      maxRepetition: Double = 0.2,
      shingleSize: Int = 5,
      ratePercent: Map[String, Int] = Map("en" -> 80),
      defaultPercent: Int = 60)

  /** Every intermediate relation of the curation chain, for callers that
    * need stage visibility ([[funnel]]) — `sampled` is the final output. */
  final case class Stages(raw: DataFrame, gated: DataFrame, deduped: DataFrame,
                          clean: DataFrame, sampled: DataFrame)

  /** The chain as named stages; [[curate]] is its last stage. */
  def stages(corpus: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, bTextCol: String, stratumCol: String,
             p: Params = Params()): Stages = {
    val scored = corpus
      .withColumn("quality", floorRound(qualityScore(col(textCol)), 4))
      .withColumn("rep_ratio", floorRound(repetitionScore(col(textCol), 3), 4))
    val gated   = scored.filter(col("quality") >= p.minQuality && col("rep_ratio") <= p.maxRepetition)
    val deduped = Dedup.exactDedup(gated, idCol, textCol)
    val clean   = Decontaminate.decontaminate(deduped, idCol, textCol, benchmark, bTextCol, p.shingleSize)
    val sampled = Sampling.stratifiedSample(clean, idCol, stratumCol, p.ratePercent, p.defaultPercent)
    Stages(corpus, gated, deduped, clean, sampled)
  }

  /** Curate `corpus` against `benchmark`; returns surviving documents with
    * their quality/repetition scores attached (rounded, oracle-stable).
    */
  def curate(corpus: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, bTextCol: String, stratumCol: String,
             p: Params = Params()): DataFrame =
    stages(corpus, idCol, textCol, benchmark, bTextCol, stratumCol, p).sampled

  /** Per-stage attrition report of the curation chain: one row per stage
    * (raw → gated → deduped → decontaminated → sampled) with surviving
    * document count and the fraction retained vs raw — the pipeline-health
    * summary every curation run should publish (a stage suddenly dropping
    * 40% is a bug or a data shift; either way it should be VISIBLE, not
    * buried in the final count).
    *
    * Intermediate stages are cached before counting, so the five counts
    * execute the chain once, not five times (Spark's CacheManager matches
    * downstream stages' subplans against the cached generations by
    * canonicalized-plan equality). The counts themselves are bounded
    * parameter data (five longs), so they are computed EAGERLY under
    * try/finally and the caches released before returning — a lazy
    * formulation would leak all three cached stages into the caller's
    * executor storage for the result DataFrame's whole lifetime.
    */
  def funnel(corpus: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, bTextCol: String, stratumCol: String,
             p: Params = Params()): DataFrame = {
    val st = stages(corpus, idCol, textCol, benchmark, bTextCol, stratumCol, p)
    val parts = Seq(
      "raw" -> st.raw, "gated" -> st.gated, "deduped" -> st.deduped,
      "decontaminated" -> st.clean, "sampled" -> st.sampled)
    st.gated.cache(); st.deduped.cache(); st.clean.cache()
    val counts =
      try parts.map { case (name, df) => (name, df.count()) }
      finally { st.clean.unpersist(); st.deduped.unpersist(); st.gated.unpersist() }
    val rawN = counts.head._2
    val spark = corpus.sparkSession
    import spark.implicits._
    counts.zipWithIndex.map { case ((name, n), i) => (i.toLong, name, n) }
      .toDF("stage_idx", "stage", "n_docs")
      // empty corpus: retention is undefined (0 of 0) — NULL, not a
      // divide-by-zero crash under ANSI mode
      .withColumn("retained",
        if (rawN == 0L) lit(null).cast("double")
        else floorRound(col("n_docs").cast("double") / lit(rawN.toDouble), 6))
      .select("stage_idx", "stage", "n_docs", "retained")
      .orderBy("stage_idx")
  }

  /** Curriculum phase assignment: split each group's documents into `phases`
    * equal-size tiers by `valueCol` (ntile over the per-group window, ties
    * broken by id for determinism) — the shortest-first / easiest-first
    * ordering curriculum-training pipelines feed from. Per-group, not
    * global: a 'zh' document's length percentile is judged against other
    * 'zh' documents. Window per group key — the standard distributed
    * per-group sort, never a global one.
    */
  def curriculumPhases(df: DataFrame, idCol: String, valueCol: String,
                       groupCol: String, phases: Int): DataFrame = {
    require(phases >= 2, s"curriculum needs >= 2 phases, got $phases")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    df.withColumn("phase", ntile(phases).over(w).cast("long"))
  }

  /** Per-key document cap — "at most `n` documents per domain/source", the
    * standard web-corpus balancing step (a handful of giant domains would
    * otherwise dominate the training mix). Keeps the top `n` rows per key by
    * `orderCols` (ties broken by the caller's last order column; make it a
    * unique id for determinism) and attaches their 1-based `rank`.
    *
    * Scale shape: a bare window would send EVERY row of a hot domain to one
    * reducer, but Catalyst's `InferWindowGroupLimit` (Spark 3.5+) rewrites
    * `row_number() <= n` into a map-side WindowGroupLimit BEFORE the
    * exchange — each map partition forwards at most `n` rows per key, so the
    * hot key's reducer sees ≤ n·numPartitions rows no matter how large the
    * domain (verify: the physical plan shows Sort→WindowGroupLimit→Exchange
    * →…→Window). A hand-salted two-phase rank gives the identical per-key
    * bound at the cost of a second full shuffle — don't hand-schedule what
    * the optimizer already does.
    */
  def capPerKey(df: DataFrame, keyCol: String, orderCols: Seq[Column], n: Int): DataFrame = {
    require(n > 0, s"capPerKey needs n > 0, got $n")
    require(!df.columns.contains("rank"),
      "capPerKey emits a 'rank' column; rename or drop the input's existing 'rank' first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Per-group winsorization: clip `valueCol` to its group's
    * [pLo, pHi] exact percentile band — the outlier-clipping step before
    * length/score statistics feed a sampler. The band edges are
    * floor-rounded BEFORE clipping so the clip thresholds (and hence the
    * clipped values) are engine-stable and oracle-checkable.
    *
    * Plan shape: one exact-percentile aggregate per group (small result,
    * broadcast back onto the stream) + a map-only clip — the corpus shuffles
    * only into the percentile aggregate.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
                pLo: Double, pHi: Double, roundTo: Int = 4): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got $pLo/$pHi")
    Seq("lo", "hi", "clipped").foreach(c => require(!df.columns.contains(c),
      s"winsorize emits a '$c' column; rename or drop the input's existing '$c' first"))
    val stats = df.groupBy(groupCol).agg(
      floorRound(percentile(col(valueCol), lit(pLo)), roundTo).as("lo"),
      floorRound(percentile(col(valueCol), lit(pHi)), roundTo).as("hi"))
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("clipped", least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
  }

  /** Robust per-group outlier detection via the median absolute deviation
    * (Hampel's MAD rule; Leys et al., "Detecting outliers: do not use
    * standard deviation around the mean, use absolute deviation around the
    * median", JESP 2013): `robust_z = |x − median| / (1.4826·MAD)`, flag
    * `robust_z > zMax`. Unlike a mean/stddev z-score, the thresholds
    * themselves are immune to the outliers they detect — the right filter
    * for heavy-tailed document-length distributions.
    *
    * Output: input columns + (med, mad, robust_z, is_outlier). `robust_z` is
    * NULL (and is_outlier 0) for degenerate groups where MAD = 0. Exact
    * medians keep the values oracle-checkable (q86); at 100 TB the two
    * median aggregates are the only shuffles (approx_percentile slots in for
    * a one-pass variant) and the stats broadcast back onto the stream.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  zMax: Double = 3.0, roundTo: Int = 4): DataFrame = {
    Seq("med", "mad", "robust_z", "is_outlier").foreach(c => require(!df.columns.contains(c),
      s"madOutliers emits a '$c' column; rename or drop the input's existing '$c' first"))
    val med = df.groupBy(groupCol).agg(median(col(valueCol)).as("__med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__ad", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(groupCol).agg(median(col("__ad")).as("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("med", floorRound(col("__med"), roundTo))
      .withColumn("mad", floorRound(col("__mad"), roundTo))
      .withColumn("robust_z",
        when(col("__mad") > 0,
          floorRound(col("__ad") / (lit(1.4826) * col("__mad")), roundTo)))
      .withColumn("is_outlier", when(col("robust_z") > zMax, 1L).otherwise(0L))
      .drop("__med", "__ad", "__mad")
  }
}
