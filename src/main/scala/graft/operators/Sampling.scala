package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic corpus sampling — reproducible (re-running selects the SAME
  * rows; no RNG state, no seed-per-partition nondeterminism), stable under
  * repartitioning, and joinable (two tables sampled on the same key keep
  * referential integrity). The standard trick for training-data subsetting
  * at 100 TB: a pure map-side filter, no shuffle.
  *
  * The hash is a Knuth multiplicative mix of the numeric key — chosen over
  * xxhash64 so the exact selection is expressible in plain SQL (the DuckDB
  * oracle mirrors it literally).
  */
object Sampling {

  /** Pseudo-random bucket in [0, 100) from a numeric key. */
  def hashBucket(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(100L))

  /** Keep ~`percent`% of rows, selected deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.filter(hashBucket(col(keyCol)) < percent)
  }

  /** Per-stratum rates: keep ~ratePercent(stratum)% of each stratum
    * (default for unlisted strata). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       ratePercent: Map[String, Int], defaultPercent: Int): DataFrame = {
    val rate = ratePercent.foldRight(lit(defaultPercent): Column) {
      case ((stratum, p), acc) => when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < rate)
  }
}
