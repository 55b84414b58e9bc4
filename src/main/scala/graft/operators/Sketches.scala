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

  // ---- HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the
  // analysis of a near-optimal cardinality estimation algorithm", AofA 2007)
  // over the PolyHash affine family. The usual objection to oracle-checking
  // HLL — register layout and FP harmonic-mean order are implementation
  // details — is removed by construction here:
  //  - the hash is `(a0·(key mod P) + b0) mod P` (intermediates < 2^61);
  //  - the register index is `h mod m` and the remaining-bit pattern
  //    `w = h div m` has a FIXED bit budget W = bitlen((P-1) div m), so the
  //    rank rho = W + 1 - bitlen(w) is pure integer comparison;
  //  - the harmonic-mean denominator Σ 2^(−M_j) is scaled by 2^(W+1) and
  //    summed as BIGINTs (max m·2^(W+1) ≪ 2^63) — NO floating-point
  //    accumulation, so partition order cannot perturb the estimate;
  //  - the only FP ops are one division (raw estimate) and one ln (the
  //    small-range linear-counting branch), identical single expressions in
  //    both engines.
  //
  // Plan shape at 100 TB: one m-row groupBy with map-side partial max — the
  // shuffle moves at most m·partitions slim (bucket, rho) rows regardless of
  // corpus size; the exact-count audit column is the only part that scales
  // with cardinality (drop it in production use).

  /** Raw-estimate numerator, as one shared double: α_m · m² · 2·(M+1),
    * where M = (P−1) div m is the maximum register payload w. The 2·(M+1)
    * factor (instead of the power-of-two 2^(W+1)) folds in the range-bias
    * correction: w is uniform on [0, M], not [0, 2^W), so
    * P(rho >= r) = 2^(1−r) · 2^W/(M+1) — every register behaves as if it saw
    * 2^W/(M+1) ≈ 1.074× the true cardinality, and dividing the numerator by
    * exactly that constant removes the bias (simulated: +7.4% systematic →
    * ±1σ noise around zero).
    */
  private def hllNumerator(m: Int): Double = {
    val M = (PolyHash.P - 1) / m
    0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble * 2.0 * (M + 1).toDouble
  }

  /** Second prime limb for folding 64-bit keys into [0, P): keys congruent
    * mod P alone would collapse deterministically (k and k+P identical in
    * every register); mixing in the residue mod a SECOND prime pushes the
    * collision domain to P·P2 ≈ 10^18 — the full practical key range. The
    * estimable-cardinality envelope is n ≪ P (~10^9), as with any 30-bit
    * register hash; beyond that, random hash-space saturation dominates.
    */
  private val P2 = 999999937L

  /** Bit length of the largest possible w = h div m (so w < 2^W always). */
  private def hllW(m: Int): Int = 64 - java.lang.Long.numberOfLeadingZeros((PolyHash.P - 1) / m)

  /** Map-only register stage: (bucket, rho) per input row. Works identically
    * over a batch relation and a structured stream (no shuffle, no state) —
    * the register MAX that follows commutes, which is exactly why HLL
    * streams losslessly ([[graft.streaming.StreamingSketch]]).
    */
  def hllRegisterStage(df: DataFrame, keyCol: String, p: Int,
                       carryCols: Seq[String] = Nil): DataFrame = {
    require(p >= 4 && p <= 14, s"HLL wants 4 <= p <= 14, got $p")
    val m = 1 << p
    val W = hllW(m) // bit budget of w = h div m; rho in [1, W+1]
    // Affine maps compose to affine — sequential keys would put STRUCTURE in
    // the leading-zero statistic (measured 2-10x rho bias). Two squaring
    // rounds between affines break the linearity; every intermediate stays
    // < P² < 2^60, so the identical formula runs in DuckDB. The first step
    // folds the full 64-bit key through TWO prime residues (see [[P2]]).
    val h = {
      val k = col(keyCol).cast("long")
      val folded = (pmod(k, lit(PolyHash.P))
        + lit(PolyHash.R) * pmod(k, lit(P2))) % lit(PolyHash.P)
      val t0 = (lit(PolyHash.a(0)) * folded + lit(PolyHash.b(0))) % lit(PolyHash.P)
      val t1 = (lit(PolyHash.a(1)) * ((t0 * t0) % lit(PolyHash.P))
        + lit(PolyHash.b(1))) % lit(PolyHash.P)
      (lit(PolyHash.a(2)) * ((t1 * t1) % lit(PolyHash.P))
        + lit(PolyHash.b(2))) % lit(PolyHash.P)
    }
    val w = (col("__h") / m).cast("long") // floor: __h >= 0
    // rho = W + 1 - bitlen(w) via an integer-threshold chain (no FP log).
    // Ascending fold so the LARGEST threshold is the outermost when — the
    // last-folded condition wins in a when/otherwise chain.
    val bitlen = (1 to W).foldLeft(lit(0)) { (acc, bl) =>
      when(col("__w") >= lit(1L << (bl - 1)), lit(bl)).otherwise(acc)
    }
    val carry = carryCols.map(col)
    df.filter(col(keyCol).isNotNull) // NULL is not a value: excluded from the
      // sketch AND from the exact audit (count(DISTINCT) semantics)
      .select(carry :+ h.as("__h"): _*)
      .select(carry ++ Seq(col("__h"), w.as("__w")): _*)
      .select(carry ++ Seq((col("__h") % m).as("bucket"), (lit(W + 1) - bitlen).as("rho")): _*)
  }

  /** Estimate tail over a materialized register table (bucket, mj) plus a
    * one-row exact-count audit relation — shared by the batch and streaming
    * forms.
    */
  def hllFinish(regs: DataFrame, exact: DataFrame, p: Int,
                groupCols: Seq[String] = Nil): DataFrame = {
    val m = 1 << p
    val W = hllW(m)
    val gc = groupCols.map(col)
    // Σ 2^(W+1-M_j) over ALL m registers, in exact integer arithmetic:
    // present registers contribute via shiftleft; absent ones (M_j = 0,
    // never hit: rho >= 1 always) contribute 2^(W+1) each.
    // (shiftleft with a COLUMN shift count only exists in SQL form — the
    // Scala DSL overload takes a literal Int)
    val spAgg = sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${W + 1} - CAST(mj AS INT))")).as("__sp")
    val npAgg = count(lit(1)).as("__np")
    val sums =
      if (groupCols.isEmpty) regs.agg(spAgg, npAgg)
      else regs.groupBy(gc: _*).agg(spAgg, npAgg)
    val sInt  = col("__sp") + (lit(m.toLong) - col("__np")) * lit(1L << (W + 1))
    val vZero = (lit(m.toLong) - col("__np")).as("v_zero")
    val raw   = lit(hllNumerator(m)) / sInt.cast("double")
    val est   = when(col("__raw") <= lit(2.5 * m) && col("v_zero") > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
      .otherwise(col("__raw"))
    val joined =
      if (groupCols.isEmpty) sums.crossJoin(exact)
      else sums.join(exact, groupCols) // every group has >= 1 key row by construction
    joined
      .select(gc ++ Seq(lit(m.toLong).as("m"), vZero, floorRound(raw, 4).as("raw_est"),
        raw.as("__raw"), col("exact_distinct")): _*)
      .select(gc ++ Seq(col("m"), col("v_zero"), col("raw_est"),
        floorRound(est, 4).as("est_distinct"), col("exact_distinct"),
        floorRound(abs(est - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double"), 4).as("rel_err")): _*)
  }

  /** Per-group HLL: one sketch row per value of `groupCol` — the GROUPED
    * approximate count-distinct that replaces an exact count(DISTINCT) whose
    * state would be unbounded per group. Shuffle volume is at most
    * groups × m slim (group, bucket, rho) rows after map-side partial max,
    * independent of the key cardinality behind it.
    */
  def hllDistinctByKey(df: DataFrame, groupCol: String, keyCol: String,
                       p: Int = 9): DataFrame = {
    val regs = hllRegisterStage(df.select(groupCol, keyCol), keyCol, p,
        carryCols = Seq(groupCol))
      .groupBy(col(groupCol), col("bucket")).agg(max("rho").as("mj"))
    val exact = df.filter(col(keyCol).isNotNull)
      .groupBy(groupCol).agg(countDistinct(col(keyCol)).as("exact_distinct"))
    hllFinish(regs, exact, p, groupCols = Seq(groupCol)).orderBy(groupCol)
  }

  /** DuckDB mirror of [[hllDistinctByKey]] — the [[hllSql]] pipeline with the
    * group key carried through every stage.
    */
  def hllByKeySql(table: String, groupCol: String, keyCol: String, p: Int = 9): String = {
    val m = 1 << p
    val W = hllW(m)
    val a0 = PolyHash.a(0); val b0 = PolyHash.b(0); val P = PolyHash.P
    val a1 = PolyHash.a(1); val b1 = PolyHash.b(1)
    val a2 = PolyHash.a(2); val b2 = PolyHash.b(2)
    val bitlen = (W to 1 by -1).map(bl =>
      s"WHEN w >= ${1L << (bl - 1)} THEN $bl").mkString(" ", " ", " ELSE 0 ")
    val num = hllNumerator(m)
    s"""WITH f AS (
       |  SELECT $groupCol AS g, (((($keyCol % $P) + $P) % $P)
       |    + ${PolyHash.R} * ((($keyCol % $P2) + $P2) % $P2)) % $P AS f
       |  FROM $table WHERE $keyCol IS NOT NULL),
       |t0 AS (SELECT g, ($a0 * f + $b0) % $P AS t0 FROM f),
       |t1 AS (SELECT g, ($a1 * ((t0 * t0) % $P) + $b1) % $P AS t1 FROM t0),
       |h AS (SELECT g, ($a2 * ((t1 * t1) % $P) + $b2) % $P AS h FROM t1),
       |hw AS (SELECT g, h, h // $m AS w FROM h),
       |r AS (
       |  SELECT g, h % $m AS bucket,
       |    ${W + 1} - (CASE$bitlen END) AS rho
       |  FROM hw),
       |regs AS (SELECT g, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
       |s AS (
       |  SELECT g, CAST(sum(CAST(1 AS BIGINT) << (${W + 1} - mj)) AS BIGINT) AS sp,
       |    CAST(count(*) AS BIGINT) AS np FROM regs GROUP BY 1),
       |x AS (
       |  SELECT $groupCol AS g, CAST(count(DISTINCT $keyCol) AS BIGINT) AS exact_distinct
       |  FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1),
       |e AS (
       |  SELECT s.g, CAST($m AS BIGINT) AS m, CAST($m AS BIGINT) - np AS v_zero,
       |    CAST($num AS DOUBLE) /
       |      CAST(sp + (CAST($m AS BIGINT) - np) * ${1L << (W + 1)} AS DOUBLE) AS raw,
       |    exact_distinct
       |  FROM s JOIN x ON s.g = x.g),
       |c AS (
       |  SELECT g, m, v_zero, raw,
       |    CASE WHEN raw <= CAST(${2.5 * m} AS DOUBLE) AND v_zero > 0
       |      THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / CAST(v_zero AS DOUBLE))
       |      ELSE raw END AS est,
       |    exact_distinct
       |  FROM e)
       |SELECT g AS $groupCol, m, v_zero, ${floorRoundSqlLocal("raw", 4)} AS raw_est,
       |  ${floorRoundSqlLocal("est", 4)} AS est_distinct, exact_distinct,
       |  ${floorRoundSqlLocal("abs(est - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)", 4)} AS rel_err
       |FROM c ORDER BY 1""".stripMargin
  }

  /** One-row HLL summary over the distinct values of `keyCol` (an integral
    * column): registers m = 2^p, the zero-register count, the raw harmonic
    * estimate, the corrected estimate (linear counting below 2.5·m when any
    * register is empty), the exact distinct count, and the relative error.
    */
  def hllDistinct(df: DataFrame, keyCol: String, p: Int = 9): DataFrame =
    hllFinish(
      hllRegisterStage(df, keyCol, p).groupBy("bucket").agg(max("rho").as("mj")),
      df.filter(col(keyCol).isNotNull).select(col(keyCol)).distinct()
        .agg(count(lit(1)).as("exact_distinct")),
      p)

  /** DuckDB mirror of [[hllDistinct]] — same hash, same integer register
    * math, same single-division/single-ln FP tail. Keep token-for-token in
    * sync with the column expressions above.
    */
  def hllSql(table: String, keyCol: String, p: Int = 9): String = {
    val m = 1 << p
    val W = hllW(m)
    val a0 = PolyHash.a(0); val b0 = PolyHash.b(0); val P = PolyHash.P
    val a1 = PolyHash.a(1); val b1 = PolyHash.b(1)
    val a2 = PolyHash.a(2); val b2 = PolyHash.b(2)
    val bitlen = (W to 1 by -1).map(bl =>
      s"WHEN w >= ${1L << (bl - 1)} THEN $bl").mkString(" ", " ", " ELSE 0 ")
    val num = hllNumerator(m)
    s"""WITH f AS (
       |  SELECT (((($keyCol % $P) + $P) % $P)
       |    + ${PolyHash.R} * ((($keyCol % $P2) + $P2) % $P2)) % $P AS f
       |  FROM $table WHERE $keyCol IS NOT NULL),
       |t0 AS (SELECT ($a0 * f + $b0) % $P AS t0 FROM f),
       |t1 AS (SELECT ($a1 * ((t0 * t0) % $P) + $b1) % $P AS t1 FROM t0),
       |h AS (SELECT ($a2 * ((t1 * t1) % $P) + $b2) % $P AS h FROM t1),
       |hw AS (SELECT h, h // $m AS w FROM h),
       |r AS (
       |  SELECT h % $m AS bucket,
       |    ${W + 1} - (CASE$bitlen END) AS rho
       |  FROM hw),
       |regs AS (SELECT bucket, max(rho) AS mj FROM r GROUP BY 1),
       |s AS (
       |  SELECT CAST(sum(CAST(1 AS BIGINT) << (${W + 1} - mj)) AS BIGINT) AS sp,
       |    CAST(count(*) AS BIGINT) AS np FROM regs),
       |x AS (SELECT CAST(count(DISTINCT $keyCol) AS BIGINT) AS exact_distinct FROM $table),
       |e AS (
       |  SELECT CAST($m AS BIGINT) AS m, CAST($m AS BIGINT) - np AS v_zero,
       |    CAST($num AS DOUBLE) /
       |      CAST(sp + (CAST($m AS BIGINT) - np) * ${1L << (W + 1)} AS DOUBLE) AS raw,
       |    exact_distinct
       |  FROM s CROSS JOIN x),
       |c AS (
       |  SELECT m, v_zero, raw,
       |    CASE WHEN raw <= CAST(${2.5 * m} AS DOUBLE) AND v_zero > 0
       |      THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / CAST(v_zero AS DOUBLE))
       |      ELSE raw END AS est,
       |    exact_distinct
       |  FROM e)
       |SELECT m, v_zero, ${floorRoundSqlLocal("raw", 4)} AS raw_est,
       |  ${floorRoundSqlLocal("est", 4)} AS est_distinct, exact_distinct,
       |  ${floorRoundSqlLocal("abs(est - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)", 4)} AS rel_err
       |FROM c""".stripMargin
  }

  private def floorRoundSqlLocal(e: String, n: Int): String =
    graft.functions.MathFunctions.floorRoundSql(e, n)

  // ---- Mergeable quantile sketch (fixed-bin histogram) ----

  /** Fixed-bin histogram of `valueCol` over [lo, hi): bin = clamp(⌊(x−lo)/w⌋,
    * 0, bins−1), one row per non-empty bin — the quantile-sketch state. The
    * bin vector is a MONOID (counts add), so partial histograms merge
    * across partitions, micro-batches, and shards without error — the
    * property t-digest/GK sketches trade away and the reason a fixed grid
    * is the right first quantile sketch for a 100 TB profile pass: one
    * map-side-combined shuffle of ≤ `bins` rows, state size independent of
    * row count. Bin edges are data-independent (lo/hi/bins are parameters),
    * so the sketch is deterministic and SQL-mirrorable; accuracy is bounded
    * by the bin width (audited in q173, not assumed).
    */
  /** The bin-assignment column shared by the batch and streaming forms. */
  def histBinCol(value: Column, lo: Double, hi: Double, bins: Int): Column = {
    require(bins >= 1 && hi > lo, s"need bins >= 1 and hi > lo, got $bins, [$lo, $hi)")
    val w = (hi - lo) / bins
    least(greatest(
      floor((value.cast("double") - lit(lo)) / lit(w)).cast("long"),
      lit(0L)), lit(bins - 1L))
  }

  /** NULL and NaN rows are EXCLUDED before binning — Spark's
    * `greatest`/`least` skip null arguments, so an unguarded clamp would
    * silently bucket every NULL into bin 0 and skew the percentiles (found
    * in review; the SQL mirrors carry the same WHERE).
    */
  def histValueFilter(value: Column): Column =
    value.isNotNull && !isnan(value.cast("double"))

  def histogramCounts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                      bins: Int): DataFrame =
    df.filter(histValueFilter(col(valueCol)))
      .select(histBinCol(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  /** Per-group histogram state `(g, bin, n)` — the grid behind
    * [[groupedHistogramQuantiles]] and the per-source PSI gate
    * ([[Validate.groupedPsiGateFromCounts]]): one map-side-combined shuffle,
    * ≤ groups·bins rows out regardless of corpus size.
    */
  def groupedHistogramCounts(df: DataFrame, groupCol: String, valueCol: String,
                             lo: Double, hi: Double, bins: Int): DataFrame =
    df.filter(histValueFilter(col(valueCol)))
      .select(col(groupCol).as("g"), histBinCol(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))

  /** Quantile estimates from histogram state: for each q, the minimum bin
    * whose cumulative count reaches ⌈q·n⌉, estimated as the bin's lower
    * edge plus a uniform-within-bin interpolation — every step is integer
    * comparisons plus one floor-rounded double expression, so the DuckDB
    * oracle reproduces the estimate bit-for-bit.
    */
  def quantilesFromCounts(counts: DataFrame, lo: Double, hi: Double, bins: Int,
                          qs: Seq[Double], roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); the cumsum window AND the total both read the counts, and
    // uncached each re-runs the full upstream scan+aggregate
    val c = counts.cache()
    val cum = c
      .withColumn("cum", sum("n").over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_before", col("cum") - col("n"))
    val total = c.agg(sum("n").as("total"))
    val spark = counts.sparkSession
    import spark.implicits._
    val qdf = qs.toDF("q")
    // target rank = ceil(q·n); the hit bin is the first with cum >= target.
    // parameter-sized join: |qs| × non-empty bins
    qdf.crossJoin(broadcast(total))
      .withColumn("target", ceil(col("q") * col("total")).cast("long"))
      .join(cum, col("cum") >= col("target"))
      .groupBy("q", "target", "total")
      .agg(min_by(struct(col("bin"), col("n"), col("cum_before")), col("bin")).as("hit"))
      .select(col("q"),
        floorRound(lit(lo) + lit(w) * (col("hit.bin").cast("double") +
          (col("target") - col("hit.cum_before")).cast("double") / col("hit.n").cast("double")),
          roundTo).as("est"),
        col("total").as("n"))
      .orderBy("q")
  }

  /** One-call batch form: histogram + quantile finish. */
  def histogramQuantiles(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                         bins: Int, qs: Seq[Double], roundTo: Int = 4): DataFrame =
    quantilesFromCounts(histogramCounts(df, valueCol, lo, hi, bins),
      lo, hi, bins, qs, roundTo)

  /** Per-GROUP histogram quantiles — the per-domain/per-source profile
    * column: one histogram per group key (state ≤ groups·bins rows, still
    * one map-side-combined shuffle), quantiles finished per group with the
    * same deterministic arithmetic. Output (group, q, est, n).
    */
  def groupedHistogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                                lo: Double, hi: Double, bins: Int,
                                qs: Seq[Double], roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    // cache-lifetime: pinned by the returned plan — caller releases (see
    // Caching); cumsum window and per-group totals both read the counts
    val counts = df
      .filter(histValueFilter(col(valueCol)))
      .select(col(groupCol).as("g"), histBinCol(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))
      .cache()
    val cum = counts
      .withColumn("cum", sum("n").over(Window.partitionBy("g").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_before", col("cum") - col("n"))
    val total = counts.groupBy("g").agg(sum("n").as("total"))
    val spark = df.sparkSession
    import spark.implicits._
    val targets = total.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("target", ceil(col("q") * col("total")).cast("long"))
    targets.join(cum, Seq("g")).filter(col("cum") >= col("target"))
      .groupBy("g", "q", "target", "total")
      .agg(min_by(struct(col("bin"), col("n"), col("cum_before")), col("bin")).as("hit"))
      .select(col("g").as(groupCol), col("q"),
        floorRound(lit(lo) + lit(w) * (col("hit.bin").cast("double") +
          (col("target") - col("hit.cum_before")).cast("double") / col("hit.n").cast("double")),
          roundTo).as("est"),
        col("total").as("n"))
      .orderBy(groupCol, "q")
  }

  /** The oracle SQL mirror of [[groupedHistogramQuantiles]]. */
  def groupedHistogramQuantilesSql(table: String, groupCol: String, valueCol: String,
                                   lo: Double, hi: Double, bins: Int,
                                   qs: Seq[Double], roundTo: Int = 4): String = {
    val w = (hi - lo) / bins
    val qList = qs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")
    s"""WITH h AS (
       |  SELECT $groupCol AS g,
       |    least(greatest(CAST(floor((CAST($valueCol AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($w AS DOUBLE)) AS BIGINT),
       |    CAST(0 AS BIGINT)), CAST(${bins - 1} AS BIGINT)) AS bin
       |  FROM $table
       |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE))),
       |c AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY g, bin),
       |cc AS (
       |  SELECT g, bin, n,
       |    CAST(sum(n) OVER (PARTITION BY g ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM c),
       |t AS (SELECT g, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY g),
       |tg AS (
       |  SELECT t.g, qv.q, CAST(ceil(qv.q * t.total) AS BIGINT) AS target, t.total
       |  FROM t CROSS JOIN (SELECT unnest(ARRAY[$qList]) AS q) qv),
       |hit AS (
       |  SELECT g, q, target, total, min(bin) AS bin FROM (
       |    SELECT tg.g, tg.q, tg.target, tg.total, cc.bin
       |    FROM tg JOIN cc ON cc.g = tg.g AND cc.cum >= tg.target)
       |  GROUP BY g, q, target, total)
       |SELECT hit.g AS $groupCol, hit.q,
       |  ${floorRoundSqlLocal(
           s"CAST($lo AS DOUBLE) + CAST($w AS DOUBLE) * (CAST(hit.bin AS DOUBLE)" +
             " + CAST(hit.target - (cc.cum - cc.n) AS DOUBLE) / CAST(cc.n AS DOUBLE))",
           roundTo)} AS est,
       |  hit.total AS n
       |FROM hit JOIN cc ON cc.g = hit.g AND cc.bin = hit.bin
       |ORDER BY $groupCol, q""".stripMargin
  }

  /** The CTE chain behind [[histogramQuantilesSql]], ending in
    * `qest(q, est, n)` — exposed so audit oracles can extend it.
    */
  def histogramQuantileCtes(table: String, valueCol: String, lo: Double, hi: Double,
                            bins: Int, qs: Seq[Double], roundTo: Int = 4): String = {
    val w = (hi - lo) / bins
    val qList = qs.map(q => s"CAST($q AS DOUBLE)").mkString(", ")
    s"""h AS (
       |  SELECT least(greatest(CAST(floor((CAST($valueCol AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($w AS DOUBLE)) AS BIGINT),
       |    CAST(0 AS BIGINT)), CAST(${bins - 1} AS BIGINT)) AS bin
       |  FROM $table
       |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE))),
       |c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY bin),
       |cc AS (
       |  SELECT bin, n,
       |    CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM c),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
       |qv AS (SELECT unnest(ARRAY[$qList]) AS q),
       |hit AS (
       |  SELECT q, target, total, min(bin) AS bin FROM (
       |    SELECT qv.q, CAST(ceil(qv.q * t.total) AS BIGINT) AS target, t.total,
       |      cc.bin, cc.cum
       |    FROM qv CROSS JOIN t JOIN cc ON cc.cum >= CAST(ceil(qv.q * t.total) AS BIGINT))
       |  GROUP BY q, target, total),
       |qest AS (
       |  SELECT hit.q,
       |    ${floorRoundSqlLocal(
             s"CAST($lo AS DOUBLE) + CAST($w AS DOUBLE) * (CAST(hit.bin AS DOUBLE)" +
               " + CAST(hit.target - (cc.cum - cc.n) AS DOUBLE) / CAST(cc.n AS DOUBLE))",
             roundTo)} AS est,
       |    hit.total AS n
       |  FROM hit JOIN cc ON cc.bin = hit.bin)""".stripMargin
  }

  /** The oracle SQL mirror of [[histogramQuantiles]] over `table.col`. */
  def histogramQuantilesSql(table: String, valueCol: String, lo: Double, hi: Double,
                            bins: Int, qs: Seq[Double], roundTo: Int = 4): String =
    s"""WITH ${histogramQuantileCtes(table, valueCol, lo, hi, bins, qs, roundTo)}
       |SELECT q, est, n FROM qest ORDER BY q""".stripMargin
}
