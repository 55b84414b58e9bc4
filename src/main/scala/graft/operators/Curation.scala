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

  /** Per-key document cap — "at most `n` documents per domain/source", the
    * standard web-corpus balancing step (a handful of giant domains would
    * otherwise dominate the training mix). Keeps the top `n` rows per key by
    * `orderCols` (ties broken by the caller's last order column; make it a
    * unique id for determinism) and attaches their 1-based `rank`.
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY key)` sends EVERY
    * row of a hot domain to one reducer — exactly the skew this operator
    * exists to fight. Phase 1 ranks per (input-partition-id, key): the
    * partition id acts as a salt, so its shuffle moves the same total bytes
    * but spreads a hot key over all reducers, and each (salt, key) group
    * keeps at most `n` rows. Phase 2 computes the exact global rank over
    * that bounded survivor set — ≤ n·numPartitions rows per key, so the
    * per-key reducer is safe no matter how large the domain. Same pre-reduce
    * idiom as [[TopK.knnJoin]].
    */
  def capPerKey(df: DataFrame, keyCol: String, orderCols: Seq[Column], n: Int): DataFrame = {
    require(n > 0, s"capPerKey needs n > 0, got $n")
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__salt"), col(keyCol)).orderBy(orderCols: _*)
    val global = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("__salt", spark_partition_id()) // input partition id, materialized pre-shuffle
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= n)
      .drop("__lr", "__salt")
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= n)
  }
}
