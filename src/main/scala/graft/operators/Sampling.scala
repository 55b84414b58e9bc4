package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic corpus sampling — reproducible (re-running selects the SAME
  * rows; no RNG state, no seed-per-partition nondeterminism), stable under
  * repartitioning, and joinable (two tables sampled on the same key keep
  * referential integrity). The standard trick for training-data subsetting
  * at 100 TB: a pure map-side filter, no shuffle.
  *
  * The hash is a two-round affine mix modulo a prime — chosen over xxhash64
  * so the exact selection is expressible in plain SQL (the DuckDB oracle
  * mirrors it literally, see [[hashBucketSql]]). The mod-prime rounds are
  * what make the final `mod 100` fair: a bare Knuth multiply would make the
  * bucket depend only on `key mod 100` (2654435761 ≡ 61 mod 100), biasing
  * structured keys (all-even, multiples of 10), and would overflow — ANSI
  * throw — for keys ≳3.5e9. Here every intermediate stays < P·1.2e9 < 2⁶³.
  */
object Sampling {
  // single-sourced with the dedup hash family — the SAME prime backs every
  // SQL-expressible modular hash in the engine (and its oracle mirrors)
  private val P = graft.functions.expressions.PolyHash.P

  /** Pseudo-random shard in [0, n) from a numeric key — the mixing hash
    * behind every deterministic assignment in the engine (sampling buckets,
    * dataset splits, output shards). */
  def hashShard(key: Column, n: Int): Column = {
    require(n >= 2, s"hashShard needs n >= 2, got $n")
    val h1 = pmod(key.cast("long"), lit(P))
    val h2 = (h1 * lit(1103515245L) + lit(12345L)) % lit(P)
    val h3 = (h2 * lit(69069L) + lit(1L)) % lit(P)
    h3 % lit(n.toLong)
  }

  /** DuckDB mirror of [[hashShard]] — keep token-for-token in sync. */
  def hashShardSql(keyExpr: String, n: Int): String =
    s"((((($keyExpr % $P + $P) % $P) * 1103515245 + 12345) % $P * 69069 + 1) % $P) % $n"

  /** Pseudo-random bucket in [0, 100) from a numeric key. */
  def hashBucket(key: Column): Column = hashShard(key, 100)

  /** DuckDB mirror of [[hashBucket]] — keep token-for-token in sync. */
  def hashBucketSql(keyExpr: String): String = hashShardSql(keyExpr, 100)

  /** Keep ~`percent`% of rows, selected deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.filter(hashBucket(col(keyCol)) < percent)
  }

  /** Deterministic train/val/test assignment by key hash — the canonical
    * dataset split: stable across runs and machines (pure [[hashBucket]]
    * arithmetic, no RNG state), disjoint and exhaustive by construction,
    * and map-only (each row decides its own split; at 100 TB the split is a
    * partition-pruned filter, never a shuffle). Output: input + (bucket,
    * split).
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100, got $trainPct/$valPct")
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
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

  /** Pseudo-uniform u ∈ (0, 1] from a numeric key — the same two-round
    * mod-prime mix as [[hashBucket]], divided once by P. Integer arithmetic
    * until the single division, so any IEEE engine (DuckDB included)
    * reproduces the double bit-exactly.
    */
  def hashUniform(key: Column): Column = {
    val h1 = pmod(key.cast("long"), lit(P))
    val h2 = (h1 * lit(1103515245L) + lit(12345L)) % lit(P)
    val h3 = (h2 * lit(69069L) + lit(1L)) % lit(P)
    (h3 + lit(1L)).cast("double") / lit(P.toDouble)
  }

  /** DuckDB mirror of [[hashUniform]] — keep token-for-token in sync. */
  def hashUniformSql(keyExpr: String): String =
    s"CAST(((((($keyExpr % $P + $P) % $P) * 1103515245 + 12345) % $P * 69069 + 1) % $P + 1) AS DOUBLE) / CAST($P AS DOUBLE)"

  /** Deterministic weighted sample WITHOUT replacement: keep the `k` rows
    * with the smallest priority u(key)/weight — a fixed-priority variant of
    * the Efraimidis–Spirakis A-ES reservoir scheme (u^(1/w) keys), using the
    * ratio form so the whole computation stays log/pow-free and therefore
    * bit-reproducible in plain SQL. Heavier rows get smaller priorities in
    * expectation, so selection probability grows with weight, and the
    * selection is stable across reruns and repartitioning.
    *
    * Plan shape: map-only priority computation + TakeOrderedAndProject —
    * each partition keeps its local k, the driver merges P·k slim rows.
    * No shuffle of the corpus at any scale.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int,
                     roundTo: Int = 12): DataFrame = {
    require(k > 0, s"weightedSample needs k > 0, got $k")
    withPriority(df, keyCol, weightCol, roundTo)
      .orderBy(col("priority"), col(keyCol))
      .limit(k)
  }

  private def withPriority(df: DataFrame, keyCol: String, weightCol: String,
                           roundTo: Int): DataFrame = {
    require(!df.columns.contains("priority"),
      "weighted sampling emits a 'priority' column; rename or drop the input's existing 'priority' first")
    val priority = hashUniform(col(keyCol)) / col(weightCol).cast("double")
    df.filter(col(weightCol) > 0) // zero/negative weight = never sampled
      .withColumn("priority", graft.functions.MathFunctions.floorRound(priority, roundTo))
  }

  /** TEMPERATURE-weighted source mixing (r11 verdict task 7) — the one
    * curation knob a pretraining pipeline tunes that sampling-by-rate
    * doesn't express: per-source inclusion mass p_s ∝ n_s^α, α ∈ (0, 1] —
    * α = 1 is natural/proportional mixing, α → 0 flattens toward uniform
    * (the multilingual sampling temperature of Arivazhagan et al.,
    * "Massively multilingual neural machine translation in the wild",
    * 2019 §5; the same exponent family as GPT-3-style dataset weights).
    * Given per-source sizes and a TOTAL document budget, allocates exact
    * integer quotas by LARGEST REMAINDER (Hamilton's method): floor the
    * ideal shares, then hand the leftover units to the largest fractional
    * parts (ties to source order) — quotas sum to the budget EXACTLY, by
    * construction.
    *
    * Cross-engine determinism: weights are integerized up front
    * (⌊n^α · 10⁶⌋ — with α = 0.5 the power is `sqrt`, IEEE-correctly-
    * rounded in every engine), so the weight total is an exact integer sum
    * (order-free), the ideal share is one double division of exact
    * integers, and the floor/fraction ranking can never disagree between
    * engines. Precondition: budget · max(w_scaled) < 2⁵³ (holds through
    * petabyte-scale source counts at any sane budget). The ranking window
    * is global but PARAMETER-sized — sources are a config-scale list, the
    * legitimate single-partition window case (see [[Scan]] for when it is
    * not).
    *
    * Input: one row per source with its document count. Output: (source,
    * n, quota), quota summing to `budget`.
    */
  def temperatureMix(counts: DataFrame, sourceCol: String, nCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val nD = col("n").cast("double")
    val wRaw = if (alpha == 0.5) sqrt(nD) else pow(nD, lit(alpha))
    val scaled = counts
      .select(col(sourceCol).as("source"), col(nCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("w", floor(wRaw * lit(1000000.0)).cast("long"))
      // cache-lifetime: the weight total, the deficit, and the final
      // allocation each re-read this relation — uncached, a caller passing
      // `corpus.groupBy(source).count()` would scan the corpus once PER
      // BRANCH (4 scans, plan-audited); cached it is one row per source,
      // parameter-sized. Caller releases (see Caching).
      .cache()
    // fail loudly (ADVICE r12): with zero positive-size sources the
    // quotas-sum-to-budget contract is unsatisfiable — an empty frame here
    // would silently violate it (same fail-fast style as readBatches)
    require(scaled.limit(1).count() > 0,
      "temperatureMix: no source with n > 0 — cannot allocate a positive budget over an empty mix")
    val tot = scaled.agg(sum("w").as("tw"))
    val based = scaled.crossJoin(broadcast(tot))
      .withColumn("ideal",
        (lit(budget) * col("w")).cast("double") / col("tw").cast("double"))
      .withColumn("base", floor(col("ideal")).cast("long"))
      .withColumn("frac", col("ideal") - floor(col("ideal")))
    val deficit = based.agg((lit(budget) - sum("base")).as("deficit"))
    based
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("frac"), col("source"))))
      .crossJoin(broadcast(deficit))
      .select(col("source"), col("n"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("quota"))
      .orderBy("source")
  }

  /** CONSUME a [[temperatureMix]] allocation (r12 verdict task 7 — q199
    * allocated quotas but nothing executed them): per source, keep the
    * `quota` documents with the smallest deterministic hash priority
    * ([[hashShard]] of the id — unbiased w.r.t. id/length structure, stable
    * across runs), attaching each survivor's 1-based `sel_rank` and its
    * source's `quota`. A source whose corpus is smaller than its quota
    * under-fills — the honest outcome when α-flattening over-allocates a
    * tiny source; the selection never invents documents.
    *
    * Scale shape: the variable per-key cap can't ride Catalyst's
    * `InferWindowGroupLimit` directly (it needs a literal), so the rank is
    * bounded in TWO stages: [[Curation.capPerKey]] with the LITERAL
    * max-quota first (map-side WindowGroupLimit — each partition forwards
    * ≤ max(quota) rows per source no matter how hot the source), then the
    * exact per-source filter against the broadcast quota relation. Output
    * ≡ a direct rank-≤-quota filter; shuffle bounded by max(quota)·parts
    * per source.
    */
  def takeQuota(df: DataFrame, idCol: String, sourceCol: String,
                quotas: DataFrame): DataFrame = {
    require(!df.columns.contains("__pri"),
      "takeQuota uses a '__pri' working column; rename the input's first")
    // parameter fetch: the allocation is config-sized (one row per source)
    val maxQ = quotas.agg(coalesce(max("quota"), lit(0L))).head.getLong(0)
    require(maxQ > 0, s"takeQuota: allocation assigns no documents (max quota $maxQ)")
    val capped = Curation.capPerKey(
      df.withColumn("__pri", hashShard(col(idCol), 1000003)),
      sourceCol, Seq(col("__pri"), col(idCol)), maxQ.toInt)
    capped.join(broadcast(quotas.select(col(sourceCol), col("quota"))), Seq(sourceCol))
      .filter(col("rank") <= col("quota"))
      .drop("__pri")
      .withColumnRenamed("rank", "sel_rank")
  }

  /** Split-distribution drift audit: total-variation distance between the
    * unigram token distributions of each pair of [[assignSplit]] splits —
    * the check that a hash split didn't land train and test on measurably
    * different text (it shouldn't; this PROVES it per corpus instead of
    * assuming it). TV = ½·Σ_w |p_w − q_w| computed as the integer form
    * Σ_w |c1_w·T2 − c2_w·T1| / (2·T1·T2): the numerator is an exact integer
    * sum (order-free, so Spark's partition-parallel aggregation and the
    * oracle's agree bit-for-bit), divided once at the end. Products stay
    * below 2⁶³ while per-word counts < 2³¹ and split totals < 2³²; beyond
    * that, pre-scale counts or accept double accumulation.
    *
    * Output: one row per split pair (split_a, split_b, n_words, tv_dist),
    * n_words = |vocabulary union of the pair|. Plan shape: one token-count
    * shuffle on (split, w), then per-pair joins on the vocabulary — bounded
    * by distinct-word cardinality, never the corpus.
    */
  def splitDrift(df: DataFrame, idCol: String, textCol: String,
                 trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    import graft.functions.MathFunctions.floorRound
    val tok = assignSplit(df.select(col(idCol), col(textCol)), idCol, trainPct, valPct)
      .select(col("split"), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
    // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val counts = tok.groupBy("split", "w").agg(count(lit(1)).as("c")).cache()
    val totals = tok.groupBy("split").agg(count(lit(1)).as("t")).cache()
    def pair(a: String, b: String): DataFrame = {
      val ca = counts.filter(col("split") === a).select(col("w"), col("c").as("ca"))
      val cb = counts.filter(col("split") === b).select(col("w"), col("c").as("cb"))
      val ta = totals.filter(col("split") === a).select(col("t").as("ta"))
      val tb = totals.filter(col("split") === b).select(col("t").as("tb"))
      ca.join(cb, Seq("w"), "full_outer")
        .na.fill(0L, Seq("ca", "cb"))
        .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
        .agg(count(lit(1)).as("n_words"),
          sum(abs(col("ca") * col("tb") - col("cb") * col("ta"))).cast("long").as("__num"),
          max("ta").as("__ta"), max("tb").as("__tb"))
        .select(lit(a).as("split_a"), lit(b).as("split_b"), col("n_words"),
          floorRound(col("__num").cast("double") /
            (lit(2.0) * col("__ta").cast("double") * col("__tb").cast("double")), 6)
            .as("tv_dist"))
    }
    pair("train", "val").unionByName(pair("train", "test")).unionByName(pair("val", "test"))
      .orderBy("split_a", "split_b")
  }

  /** Output-shard assignment + balance audit: assign each row a deterministic
    * shard via [[hashShard]] and report per-shard row counts, payload bytes,
    * and the skew ratios against a perfectly uniform assignment. This is the
    * check a training pipeline runs BEFORE writing n output shards: a skewed
    * shard map means stragglers at write time and at training-data load time.
    * Hash-sharding (vs. range or round-robin) keeps assignment stable across
    * reruns and repartitioning, so incremental re-exports land rows in the
    * same shard.
    *
    * Plan shape: map-only shard assignment, one n-row partial-aggregated
    * groupBy, one broadcast single-row total — the corpus is never shuffled
    * by anything wider than the 8-byte shard key.
    */
  def shardBalance(df: DataFrame, keyCol: String, sizeCol: String,
                   nShards: Int): DataFrame = {
    val perShard = df
      .withColumn("shard", hashShard(col(keyCol), nShards))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum(col(sizeCol)).cast("long").as("shard_bytes"))
    val totals = df.agg(count(lit(1)).as("__rows"), sum(col(sizeCol)).cast("long").as("__bytes"))
    import graft.functions.MathFunctions.floorRound
    perShard.crossJoin(totals)
      // skew = this shard's share × nShards (1.0 = perfectly uniform)
      .withColumn("row_skew",
        floorRound(col("n_rows").cast("double") * nShards / col("__rows").cast("double"), 4))
      .withColumn("byte_skew",
        floorRound(col("shard_bytes").cast("double") * nShards / col("__bytes").cast("double"), 4))
      .select("shard", "n_rows", "shard_bytes", "row_skew", "byte_skew")
      .orderBy("shard")
  }

  /** [[weightedSample]] per stratum — `k` weighted winners within EACH group
    * (language, source, …): the distributed reservoir of the per-language
    * rebalancing step. Ranks by the same deterministic priority inside a
    * per-stratum window; `InferWindowGroupLimit` bounds the shuffle at
    * k·numPartitions rows per stratum (see [[Curation.capPerKey]]).
    */
  def weightedSamplePerStratum(df: DataFrame, keyCol: String, weightCol: String,
                               stratumCol: String, k: Int,
                               roundTo: Int = 12): DataFrame =
    // same priority column, ranked per stratum — the rank-cap idiom lives in
    // ONE place (capPerKey), so any future window-limit workaround applies
    // to both operators
    Curation.capPerKey(withPriority(df, keyCol, weightCol, roundTo),
      stratumCol, Seq(col("priority"), col(keyCol)), k)

  /** Token-budget mixing plan: per domain, select documents in a
    * deterministic pseudo-random order (the engine's mixing hash — unbiased
    * w.r.t. id/length structure) until the running token total would exceed
    * the per-domain budget, and report the plan (docs and tokens selected,
    * fill rate). This is the data-mixing step of training-corpus assembly —
    * "give me ~N tokens per domain" — as a prefix-greedy cumulative-sum
    * window, everything in exact integer arithmetic.
    *
    * Token counts are the chars/4 proxy `(chars + 3) div 4` (exact ceil in
    * both engines); swap in real token counts upstream if available. One
    * shuffle on the domain key; the window is per-domain with a cumulative
    * ROWS frame.
    */
  def tokenBudgetMix(df: DataFrame, domainCol: String, idCol: String,
                     charsCol: String, targetTokensPerDomain: Long,
                     roundTo: Int = 4): DataFrame = {
    require(targetTokensPerDomain > 0, s"budget must be positive, got $targetTokensPerDomain")
    import org.apache.spark.sql.expressions.Window
    val toks = ((col(charsCol) + lit(3L)) / lit(4L)).cast("long") // exact: values << 2^52
    val w = Window.partitionBy(domainCol).orderBy(col("__pri"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val selected = df.select(col(domainCol), col(idCol), toks.as("__tok"))
      .withColumn("__pri", hashShard(col(idCol), 1000003))
      .withColumn("__cum", sum("__tok").over(w))
      .filter(col("__cum") <= targetTokensPerDomain)
      .groupBy(domainCol)
      .agg(count(lit(1)).as("__n"), sum("__tok").cast("long").as("__sel"))
    // EVERY domain appears in the plan — a domain whose very first document
    // already exceeds the budget selects nothing, and that zero-fill row is
    // precisely the one the consumer must see (silently omitting it would
    // read as "covered")
    df.select(col(domainCol)).distinct()
      .join(selected, Seq(domainCol), "left")
      .select(col(domainCol),
        coalesce(col("__n"), lit(0L)).as("n_docs"),
        coalesce(col("__sel"), lit(0L)).as("tokens_selected"),
        lit(targetTokensPerDomain).as("target_tokens"))
      .withColumn("fill", graft.functions.MathFunctions.floorRound(
        col("tokens_selected").cast("double") / col("target_tokens").cast("double"), roundTo))
      .orderBy(domainCol)
  }

  /** DuckDB mirror of [[tokenBudgetMix]] — keep token-for-token in sync. */
  def tokenBudgetMixSql(table: String, domainCol: String, idCol: String,
                        charsCol: String, targetTokensPerDomain: Long,
                        roundTo: Int = 4): String = {
    val fr = graft.functions.MathFunctions.floorRoundSql _
    s"""WITH t AS (
       |  SELECT $domainCol, $idCol, ($charsCol + 3) // 4 AS tok,
       |    ${hashShardSql(idCol, 1000003)} AS pri
       |  FROM $table),
       |c AS (
       |  SELECT $domainCol, tok,
       |    CAST(sum(tok) OVER (PARTITION BY $domainCol ORDER BY pri, $idCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t),
       |sel AS (
       |  SELECT $domainCol, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(tok) AS BIGINT) AS sel
       |  FROM c WHERE cum <= $targetTokensPerDomain GROUP BY 1),
       |doms AS (SELECT DISTINCT $domainCol FROM $table)
       |SELECT $domainCol, coalesce(s.n, CAST(0 AS BIGINT)) AS n_docs,
       |  coalesce(s.sel, CAST(0 AS BIGINT)) AS tokens_selected,
       |  CAST($targetTokensPerDomain AS BIGINT) AS target_tokens,
       |  ${fr(s"CAST(coalesce(s.sel, CAST(0 AS BIGINT)) AS DOUBLE) / CAST($targetTokensPerDomain AS DOUBLE)", roundTo)} AS fill
       |FROM doms d LEFT JOIN sel s USING ($domainCol)
       |ORDER BY 1""".stripMargin
  }
}
