package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.TextFunctions.shingleHashesPoly
import graft.functions.expressions.PolyHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Distinct-count sketching via K-Minimum-Values (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002): with hashes
  * uniform on [0, P), the k-th smallest distinct hash h_k estimates the
  * distinct count as (k-1)·P / h_k. Unlike HLL (whose register layout is
  * implementation-specific), KMV over the [[PolyHash]] family is EXACTLY
  * reproducible in DuckDB SQL — the sketch itself is oracle-checked, not
  * just sanity-bounded.
  *
  * Plan shape: one shuffle of 8-byte hash keys (map-side partial distinct)
  * followed by TakeOrderedAndProject for the k minima — no full sort, no
  * row-width shuffle. At 100 TB the distinct-shuffle volume is bounded by
  * the distinct-hash cardinality, never the corpus size.
  */
object Sketches {

  /** One-row summary: k, the k-th minimum distinct n-gram hash, the KMV
    * estimate, the exact distinct count, and the relative error.
    */
  def kmvDistinctNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashes = df
      .select(explode(shingleHashesPoly(col(textCol), n)).as("h"))
      .distinct()
      .cache() // two consumers: k-minima and the exact count
    val kth = hashes.orderBy("h").limit(k) // TakeOrderedAndProject
      .agg(max("h").as("h_k"))
    val exact = hashes.agg(count(lit(1)).as("exact_distinct"))
    // Sketch-saturation guard (classic KMV): with fewer than k distinct
    // hashes, h_k is just the overall max and (k-1)·P/h_k is a meaningless
    // extrapolation — the sketch holds EVERY distinct hash, so report the
    // exact count with zero error. Mirrored in the q64 oracle SQL.
    val saturated = col("exact_distinct") < k
    kth.crossJoin(exact)
      .select(
        lit(k.toLong).as("k"),
        col("h_k"),
        when(saturated, col("exact_distinct").cast("double"))
          .otherwise(floorRound(lit((k - 1).toDouble) * PolyHash.P / col("h_k"), 4))
          .as("est_distinct"),
        col("exact_distinct"),
        when(saturated, lit(0.0))
          .otherwise(floorRound(
            abs(lit((k - 1).toDouble) * PolyHash.P / col("h_k") - col("exact_distinct")) /
              col("exact_distinct"), 4))
          .as("rel_err"))
  }
}
