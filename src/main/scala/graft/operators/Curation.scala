package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.TextFunctions.{qualityScore, repetitionScore}
import org.apache.spark.sql.DataFrame
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

  /** Curate `corpus` against `benchmark`; returns surviving documents with
    * their quality/repetition scores attached (rounded, oracle-stable).
    */
  def curate(corpus: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, bTextCol: String, stratumCol: String,
             p: Params = Params()): DataFrame = {
    val scored = corpus
      .withColumn("quality", floorRound(qualityScore(col(textCol)), 4))
      .withColumn("rep_ratio", floorRound(repetitionScore(col(textCol), 3), 4))
    val gated   = scored.filter(col("quality") >= p.minQuality && col("rep_ratio") <= p.maxRepetition)
    val deduped = Dedup.exactDedup(gated, idCol, textCol)
    val clean   = Decontaminate.decontaminate(deduped, idCol, textCol, benchmark, bTextCol, p.shingleSize)
    Sampling.stratifiedSample(clean, idCol, stratumCol, p.ratePercent, p.defaultPercent)
  }
}
