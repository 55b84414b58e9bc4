package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.TextFunctions.shingleHashesPoly
import graft.functions.expressions.PolyHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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

  /** Count–min sketch (Cormode & Muthukrishnan, "An improved data stream
    * summary: the count-min sketch and its applications", J. Algorithms 2005)
    * over corpus tokens, with the estimate AUDITED against exact counts for
    * the top-`topK` tokens: output (w, n, est, overcount) where
    * `est = min over depth rows of counter[row][bucket_row(hash(w))]` and
    * `overcount = est − n >= 0` (CMS never underestimates).
    *
    * The whole sketch is modular integer arithmetic over the [[PolyHash]]
    * affine family, so the DuckDB oracle rebuilds the counter table and
    * reproduces the ESTIMATES exactly — the sketch is verified, not just
    * bounded. Plan shape: the counter table is a (depth·width)-row groupBy
    * with map-side partial combine (shuffle bounded by depth·width, never
    * the corpus); the audit joins only topK·depth slim rows.
    */
  def countMinTokens(df: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 1024, topK: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1 and width >= 2, got $depth/$width")
    val toks = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("h", element_at(shingleHashesPoly(col("w"), 1), 1))
      .cache() // two consumers: the counter build and the exact heavy hitters
    def bucket(j: Int, h: Column): Column =
      ((lit(PolyHash.a(j)) * h + lit(PolyHash.b(j))) % lit(PolyHash.P)) % lit(width.toLong)
    val counters = toks
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(j, col("h")).as("bucket"))): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val heavy = toks.groupBy("w", "h").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(topK)
    heavy
      .select(col("w"), col("h"), col("n"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), bucket(j, col("h")).as("bucket"))): _*)).as("jb"))
      .join(counters, col("jb.j") === counters("j") && col("jb.bucket") === counters("bucket"))
      .groupBy("w", "n").agg(min("cnt").as("est"))
      .select(col("w"), col("n"), col("est"), (col("est") - col("n")).as("overcount"))
      .orderBy(desc("n"), col("w"))
  }
}
