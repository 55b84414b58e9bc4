package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality validation — the expectations/Deequ pattern
  * (Schelter et al., "Automating large-scale data quality verification",
  * VLDB 2018): a constraint suite evaluated against a table produces a
  * machine-checkable report row per constraint (violation count, fraction,
  * threshold, pass), the gate every production ingest runs before publishing
  * a snapshot.
  *
  * Scale shape: ALL row-level and uniqueness constraints for a table are
  * computed in ONE aggregation pass over it (violations are exact integer
  * sums of 0/1 indicators; uniqueness is `count(*) − countDistinct(keys)`);
  * each referential constraint adds one broadcast anti-join count (the dim
  * side broadcasts, the fact side never shuffles). The collected metrics are
  * bounded parameter data — one long per constraint, never a data-plane
  * collect. Fractions are floor-rounded so the report is oracle-checkable
  * (q137).
  */
object Validate {

  /** A constraint whose violations are countable row-by-row in the single
    * aggregation pass. `violations` is a 0/1 indicator column; NULL is a
    * violation for range/set membership (a null can't be proven in-range).
    */
  sealed trait RowCheck { def name: String; def violations: Column; def threshold: Double }

  final case class NotNull(colName: String, threshold: Double = 0.0) extends RowCheck {
    val name = s"not_null:$colName"
    def violations: Column = when(col(colName).isNull, 1L).otherwise(0L)
  }
  final case class InRange(colName: String, lo: Double, hi: Double,
                           threshold: Double = 0.0) extends RowCheck {
    val name = s"range:$colName"
    def violations: Column =
      when(col(colName).isNull || col(colName) < lo || col(colName) > hi, 1L).otherwise(0L)
  }
  final case class InSet(colName: String, values: Seq[String],
                         threshold: Double = 0.0) extends RowCheck {
    val name = s"set:$colName"
    def violations: Column =
      when(col(colName).isNull || !col(colName).isin(values: _*), 1L).otherwise(0L)
  }

  /** Key-uniqueness constraint; violations = rows beyond one per distinct
    * key. NULL keys form their own groups (SQL `SELECT DISTINCT`
    * semantics): the distinct count runs over a struct of the key columns,
    * which Spark's countDistinct never null-skips — two (NULL, 'a') rows
    * are one group with one violation, matching the DuckDB oracle.
    */
  final case class UniqueKey(cols: Seq[String], threshold: Double = 0.0) {
    val name = s"unique:${cols.mkString("+")}"
  }

  /** Referential constraint: every fact `colName` value exists in
    * `dim.dimCol`. Violations = dangling fact rows (broadcast anti-join).
    */
  final case class ForeignKey(colName: String, dim: DataFrame, dimCol: String,
                              threshold: Double = 0.0) {
    val name = s"fk:$colName->$dimCol"
  }

  /** Evaluate a constraint suite against `df`; returns one report row per
    * constraint: (check, violations, total, viol_frac, threshold, pass).
    * `table` prefixes the check names so suites over several tables union
    * into one report.
    */
  def validate(table: String, df: DataFrame,
               rowChecks: Seq[RowCheck] = Nil,
               uniques: Seq[UniqueKey] = Nil,
               fks: Seq[ForeignKey] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniques.nonEmpty || fks.nonEmpty, "empty constraint suite")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs =
      Seq(count(lit(1)).cast("long").as("__n")) ++
      // coalesce: sum over an EMPTY table is NULL, which would flow into the
      // report as a boxed null Long and break the row encoder
      rowChecks.map(c => coalesce(sum(c.violations), lit(0L)).cast("long").as(c.name)) ++
      uniques.map(u =>
        // struct-wrapped: a bare multi-arg countDistinct SKIPS rows with any
        // NULL key column and over-counts violations vs SELECT DISTINCT
        (count(lit(1)) - countDistinct(struct(u.cols.map(col): _*)))
          .cast("long").as(u.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val fkViolations = fks.map { f =>
      f.name -> df.select(col(f.colName))
        .join(broadcast(f.dim.select(col(f.dimCol))), col(f.colName) === col(f.dimCol), "left_anti")
        .count()
    }
    val rows =
      rowChecks.map(c => (s"$table/${c.name}", row.getAs[Long](c.name), c.threshold)) ++
      uniques.map(u => (s"$table/${u.name}", row.getAs[Long](u.name), u.threshold)) ++
      fkViolations.zip(fks).map { case ((nm, v), f) => (s"$table/$nm", v, f.threshold) }
    rows.toDF("check", "violations", "threshold")
      .withColumn("total", lit(n))
      // empty table: fraction undefined (NULL), constraints pass vacuously
      .withColumn("viol_frac",
        when(col("total") > 0,
          floorRound(col("violations").cast("double") / col("total").cast("double"), 6)))
      .withColumn("pass",
        (col("total") === 0 || col("viol_frac") <= col("threshold")).cast("long"))
      .select("check", "violations", "total", "viol_frac", "threshold", "pass")
  }

  /** Drift gate between two snapshots of the same table: per-group row
    * counts are profiled on each side, and each group's count DELTA is
    * z-scored against the cross-group delta distribution — gating on
    * "which groups moved abnormally vs everything else" instead of a
    * static per-group threshold (a uniform 2× growth of every group is NOT
    * drift; one nation losing half its rows while the rest hold still is).
    * Same exact-integer moment machinery as [[Anomaly.countZScores]]
    * (S1 = Σδ, S2 = Σδ² over k groups), so the z doubles are bit-stable
    * across partitionings and the DuckDB oracle reproduces them (q150).
    * Groups absent on one side profile as 0 there — an appearing or
    * vanishing group is drift by construction, not a join miss.
    *
    * Scale shape: one count shuffle per side on the group key, a full-outer
    * group-key join at group cardinality (parameter-sized), one broadcast
    * single-row stats join. The snapshots themselves never pairwise join.
    */
  def driftGate(prev: DataFrame, next: DataFrame, groupCol: String,
                zMax: Double = 3.0, roundTo: Int = 4): DataFrame = {
    val p = prev.groupBy(col(groupCol)).agg(count(lit(1)).cast("long").as("prev_n"))
    val nx = next.groupBy(col(groupCol)).agg(count(lit(1)).cast("long").as("next_n"))
    driftGateFromCounts(p, nx, groupCol, zMax, roundTo)
  }

  /** [[driftGate]] on PRE-AGGREGATED per-group counts — `prevCounts`
    * (groupCol, prev_n) and `nextCounts` (groupCol, next_n). This is the
    * composition point for incrementally-maintained profiles: a streaming
    * fold of per-batch counts ([[graft.streaming.StreamingDrift]], q152)
    * gates through the identical arithmetic as the two-snapshot batch form
    * (q150), so stream ≡ batch is provable under one oracle.
    */
  def driftGateFromCounts(prevCounts: DataFrame, nextCounts: DataFrame,
                          groupCol: String, zMax: Double = 3.0,
                          roundTo: Int = 4): DataFrame = {
    val deltas = prevCounts.join(nextCounts, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("prev_n"), lit(0L)).as("prev_n"),
        coalesce(col("next_n"), lit(0L)).as("next_n"))
      .withColumn("delta", col("next_n") - col("prev_n"))
    val stats = deltas.agg(
      count(lit(1)).cast("long").as("__k"),
      sum("delta").cast("long").as("__s1"),
      sum(col("delta") * col("delta")).cast("long").as("__s2"))
    val varNum = (col("__k") * col("__s2") - col("__s1") * col("__s1")).cast("double")
    val den    = (col("__k") * (col("__k") - lit(1L))).cast("double")
    val z      = floorRound(
      (col("delta") * col("__k") - col("__s1")).cast("double") /
        (col("__k").cast("double") * sqrt(varNum / den)), roundTo)
    deltas.crossJoin(broadcast(stats))
      .withColumn("z", when(col("__k") > 1 && varNum > 0, z))
      .withColumn("is_drift", coalesce((abs(col("z")) > zMax).cast("long"), lit(0L)))
      .select(groupCol, "prev_n", "next_n", "delta", "z", "is_drift")
      .orderBy(groupCol)
  }

  /** Metric-HISTORY drift gate (the Deequ anomaly-detection-on-metric-series
    * pattern, Schelter et al. 2018 §4.3): given an ordered series of ≥ 4
    * snapshots, each group's LATEST count delta is z-scored against that
    * group's OWN historical delta distribution — the orthogonal axis to
    * [[driftGate]] (which compares groups against each other at one
    * moment). A nation that always grows ~20% per snapshot and suddenly
    * shrinks flags here even if every other nation moved too.
    *
    * Same exact-integer moment machinery (per-group S1 = Σd, S2 = Σd² over
    * the history deltas), so the z doubles are bit-stable and the DuckDB
    * oracle reproduces them (q153). Groups absent from a snapshot count 0
    * there (dense group × snapshot grid), so appearing/vanishing groups
    * produce real deltas, not join misses.
    *
    * Scale shape: one count shuffle per snapshot on the group key, a dense
    * grid at (groups × snapshots) — parameter-sized — one lag window and
    * one keyed aggregate over it. Snapshots never pairwise join.
    */
  def driftHistoryGate(snapshots: Seq[DataFrame], groupCol: String,
                       zMax: Double = 3.0, roundTo: Int = 4): DataFrame = {
    val k = snapshots.length
    require(k >= 4,
      s"driftHistoryGate needs >= 4 snapshots (>= 2 history deltas + the gated one), got $k")
    val counts = snapshots.zipWithIndex.map { case (df, i) =>
      df.groupBy(col(groupCol)).agg(count(lit(1)).cast("long").as("n"))
        .withColumn("__i", lit(i))
    }.reduce(_ unionByName _)
    val grid = counts.select(col(groupCol)).distinct()
      .withColumn("__i", explode(sequence(lit(0), lit(k - 1))))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol)).orderBy("__i")
    val deltas = grid.join(counts, Seq(groupCol, "__i"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("d", col("n") - lag("n", 1).over(w))
      .filter(col("__i") >= 1)
    val hist = deltas.filter(col("__i") <= k - 2)
      .groupBy(col(groupCol)).agg(
        count(lit(1)).cast("long").as("__kh"),
        sum("d").cast("long").as("__s1"),
        sum(col("d") * col("d")).cast("long").as("__s2"))
    val last = deltas.filter(col("__i") === k - 1)
      .select(col(groupCol), col("n").as("latest_n"), col("d").as("last_delta"))
    val varNum = (col("__kh") * col("__s2") - col("__s1") * col("__s1")).cast("double")
    val den    = (col("__kh") * (col("__kh") - lit(1L))).cast("double")
    val z      = floorRound(
      (col("last_delta") * col("__kh") - col("__s1")).cast("double") /
        (col("__kh").cast("double") * sqrt(varNum / den)), roundTo)
    last.join(hist, Seq(groupCol))
      .withColumn("z", when(col("__kh") > 1 && varNum > 0, z))
      .withColumn("is_drift", coalesce((abs(col("z")) > zMax).cast("long"), lit(0L)))
      .select(groupCol, "latest_n", "last_delta", "z", "is_drift")
      .orderBy(groupCol)
  }

  /** DISTRIBUTION-drift gate via the Population Stability Index (the
    * standard credit-scoring / feature-monitoring metric; see e.g. Yurdakul,
    * "Statistical properties of the population stability index", 2018):
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) between the prev and next
    * VALUE DISTRIBUTIONS over a fixed bin grid ([[Sketches.histBinCol]]'s
    * grid — the same mergeable histogram state the quantile sketch keeps,
    * so a pipeline that already profiles percentiles gates distribution
    * drift for free). The orthogonal axis to [[driftGate]]: a column whose
    * row COUNT is stable but whose values shifted flags here and nowhere
    * else. Industry-standard read: < 0.1 stable, 0.1–0.25 moderate,
    * > 0.25 shifted — `threshold` defaults to 0.25.
    *
    * Zero-count bins use a proportion floor (`minP`, default 1e-6 — the
    * standard smoothing) so ln stays finite; every arithmetic step is
    * deterministic and SQL-mirrorable (one ln call per non-empty bin; the
    * ~1-ulp libm-vs-JVM ln divergence is ~1e-16 per term against a 1e-6
    * rounding quantum on the sum). One count shuffle per side, bounded by
    * `bins`; everything after is parameter-sized.
    */
  def psiGate(prev: DataFrame, next: DataFrame, valueCol: String,
              lo: Double, hi: Double, bins: Int,
              threshold: Double = 0.25, minP: Double = 1e-6,
              roundTo: Int = 6): DataFrame =
    psiGateFromCounts(
      Sketches.histogramCounts(prev, valueCol, lo, hi, bins),
      Sketches.histogramCounts(next, valueCol, lo, hi, bins),
      threshold, minP, roundTo)

  /** [[psiGate]] on PRE-AGGREGATED bin counts (`(bin, n)` per side) — the
    * counts-level composition point, exactly as [[driftGateFromCounts]] is
    * for the z-gate: a streaming fold of the next snapshot's histogram
    * ([[graft.streaming.StreamingDrift.psiGate]], q176) gates through the
    * identical arithmetic as the two-snapshot batch form (q175).
    */
  def psiGateFromCounts(prevCounts: DataFrame, nextCounts: DataFrame,
                        threshold: Double = 0.25, minP: Double = 1e-6,
                        roundTo: Int = 6): DataFrame = {
    val pc = prevCounts.withColumnRenamed("n", "prev_n")
    val nc = nextCounts.withColumnRenamed("n", "next_n")
    val joined = pc.join(nc, Seq("bin"), "full_outer")
      .select(coalesce(col("prev_n"), lit(0L)).as("pn"),
        coalesce(col("next_n"), lit(0L)).as("nn"))
    val totals = joined.agg(sum("pn").as("tp"), sum("nn").as("tn"))
    joined.crossJoin(broadcast(totals))
      .select((greatest(col("pn").cast("double") / col("tp").cast("double"), lit(minP))).as("p"),
        (greatest(col("nn").cast("double") / col("tn").cast("double"), lit(minP))).as("q"),
        col("tp"), col("tn"))
      .agg(floorRound(sum((col("p") - col("q")) * log(col("p") / col("q"))), roundTo).as("psi"),
        first("tp").as("n_prev"), first("tn").as("n_next"))
      .withColumn("is_drift", (col("psi") > threshold).cast("long"))
      .select("psi", "n_prev", "n_next", "is_drift")
  }

  /** Per-GROUP PSI gate — the multi-source ingest form of [[psiGate]]
    * (round-10 verdict task 7): one PSI per group key over that group's own
    * histogram pair, so a distribution shift confined to ONE source/domain
    * flags exactly that group while every other group reads 0. The count
    * state is ≤ groups·bins rows per side (one map-side-combined shuffle
    * each); the PSI finish is a keyed aggregate over that grid — the same
    * 100 TB profile as the global gate, keyed.
    *
    * Groups with an EMPTY side are excluded (tp/tn > 0): PSI compares
    * proportions and is undefined for a source that appears or vanishes
    * outright — that event is the COUNT gate's job
    * ([[driftGateFromCounts]], q162's keyed form).
    */
  def groupedPsiGate(prev: DataFrame, next: DataFrame, groupCol: String,
                     valueCol: String, lo: Double, hi: Double, bins: Int,
                     threshold: Double = 0.25, minP: Double = 1e-6,
                     roundTo: Int = 6): DataFrame =
    groupedPsiGateFromCounts(
      Sketches.groupedHistogramCounts(prev, groupCol, valueCol, lo, hi, bins),
      Sketches.groupedHistogramCounts(next, groupCol, valueCol, lo, hi, bins),
      groupCol, threshold, minP, roundTo)

  /** [[groupedPsiGate]] on pre-aggregated per-group bin counts
    * (`(g, bin, n)` per side) — the counts-level composition point the
    * streaming form folds into ([[graft.streaming.StreamingDrift]]), keyed
    * exactly as [[psiGateFromCounts]] is global.
    */
  def groupedPsiGateFromCounts(prevCounts: DataFrame, nextCounts: DataFrame,
                               groupCol: String, threshold: Double = 0.25,
                               minP: Double = 1e-6, roundTo: Int = 6): DataFrame = {
    val pc = prevCounts.withColumnRenamed("n", "prev_n")
    val nc = nextCounts.withColumnRenamed("n", "next_n")
    val joined = pc.join(nc, Seq("g", "bin"), "full_outer")
      .select(col("g"), coalesce(col("prev_n"), lit(0L)).as("pn"),
        coalesce(col("next_n"), lit(0L)).as("nn"))
    val totals = joined.groupBy("g").agg(sum("pn").as("tp"), sum("nn").as("tn"))
    joined.join(totals, Seq("g"))
      .filter(col("tp") > 0 && col("tn") > 0)
      .select(col("g"),
        greatest(col("pn").cast("double") / col("tp").cast("double"), lit(minP)).as("p"),
        greatest(col("nn").cast("double") / col("tn").cast("double"), lit(minP)).as("q"),
        col("tp"), col("tn"))
      .groupBy("g")
      .agg(floorRound(sum((col("p") - col("q")) * log(col("p") / col("q"))), roundTo).as("psi"),
        first("tp").as("n_prev"), first("tn").as("n_next"))
      .withColumn("is_drift", (col("psi") > threshold).cast("long"))
      .select(col("g").as(groupCol), col("psi"), col("n_prev"), col("n_next"), col("is_drift"))
  }

  /** The oracle SQL mirror of [[groupedPsiGate]]: baseline = `table`, next
    * snapshot = `table WHERE nextWhere`.
    */
  def groupedPsiGateSql(table: String, groupCol: String, valueCol: String,
                        nextWhere: String, lo: Double, hi: Double, bins: Int,
                        threshold: Double = 0.25, minP: Double = 1e-6,
                        roundTo: Int = 6): String = {
    val w = (hi - lo) / bins
    def binCte(name: String, where: String) =
      s"""$name AS (
         |  SELECT $groupCol AS g,
         |    least(greatest(CAST(floor((CAST($valueCol AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($w AS DOUBLE)) AS BIGINT),
         |    CAST(0 AS BIGINT)), CAST(${bins - 1} AS BIGINT)) AS bin
         |  FROM $table
         |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE))$where)""".stripMargin
    val frs = graft.functions.MathFunctions.floorRoundSql _
    s"""WITH ${binCte("hp", "")},
       |${binCte("hn", s" AND ($nextWhere)")},
       |cp AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS pn FROM hp GROUP BY g, bin),
       |cn AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS nn FROM hn GROUP BY g, bin),
       |j AS (
       |  SELECT coalesce(cp.g, cn.g) AS g, coalesce(cp.pn, 0) AS pn, coalesce(cn.nn, 0) AS nn
       |  FROM cp FULL OUTER JOIN cn ON cp.g = cn.g AND cp.bin = cn.bin),
       |t AS (SELECT g, CAST(sum(pn) AS BIGINT) AS tp, CAST(sum(nn) AS BIGINT) AS tn FROM j GROUP BY g),
       |pq AS (
       |  SELECT j.g,
       |    greatest(CAST(pn AS DOUBLE) / CAST(tp AS DOUBLE), CAST($minP AS DOUBLE)) AS p,
       |    greatest(CAST(nn AS DOUBLE) / CAST(tn AS DOUBLE), CAST($minP AS DOUBLE)) AS q,
       |    tp, tn
       |  FROM j JOIN t ON t.g = j.g WHERE tp > 0 AND tn > 0)
       |SELECT g AS $groupCol, ${frs("sum((p - q) * ln(p / q))", roundTo)} AS psi,
       |  CAST(min(tp) AS BIGINT) AS n_prev, CAST(min(tn) AS BIGINT) AS n_next,
       |  CAST(${frs("sum((p - q) * ln(p / q))", roundTo)} > CAST($threshold AS DOUBLE) AS BIGINT) AS is_drift
       |FROM pq GROUP BY g ORDER BY g""".stripMargin
  }

  /** Two-sample KOLMOGOROV–SMIRNOV drift gate — the third axis of the gate
    * matrix: [[driftGate]] sees COUNT shifts, [[psiGate]] sees BINNED-MASS
    * shifts, and the KS statistic D = sup_v |F_prev(v) − F_next(v)| is the
    * bin-free sup-norm on the empirical CDFs (Smirnov, "Table for estimating
    * the goodness of fit of empirical distributions", Ann. Math. Stat. 1948)
    * — it flags a pure location/scale shift at full resolution, with no grid
    * to choose and no smoothing floor.
    *
    * Exact, not binned: D is evaluated at every DISTINCT value (the CDFs
    * only step there). The distinct-value relation is data-sized, so the
    * running counts come from [[Scan.cumSums]] — the two-pass
    * range-partitioned prefix scan — never a single-partition window. One
    * count shuffle (value-keyed, map-side combined) + one range exchange;
    * the final max is a scalar aggregate.
    *
    * Determinism: cum counts are exact longs; D is a max (order-independent)
    * of |long/long − long/long| IEEE doubles, floor-rounded — the DuckDB
    * oracle ([[ksGateSql]]) reproduces it bit-for-bit.
    */
  def ksGate(prev: DataFrame, next: DataFrame, valueCol: String,
             threshold: Double, roundTo: Int = 6, scanParts: Int = 32): DataFrame = {
    val v = col(valueCol).cast("double")
    def cnt(df: DataFrame) = df
      .filter(v.isNotNull && !isnan(v))
      .groupBy(v.as("v")).agg(count(lit(1)).as("n"))
    ksGateFromValueCounts(cnt(prev), cnt(next), threshold, roundTo, scanParts)
  }

  /** EXACT KS from precomputed per-DISTINCT-VALUE count tables (v, n) —
    * the arithmetic [[ksGate]] delegates to, split out so a STREAMING
    * ingest can fold the next side's value counts through engine state
    * ([[graft.streaming.StreamingDrift.ksGateExact]]) and still finish
    * with the exact sup-norm D: merge the two count tables, two-pass
    * prefix-scan the running counts ([[Scan.cumSums]] — the distinct-value
    * relation is data-sized, never a single-partition window), max the CDF
    * gap. Counts are a monoid, so the folded stream table equals the batch
    * count table regardless of micro-batching — which is why the stream
    * query passes the exact BATCH oracle ([[ksGateSql]]) verbatim.
    */
  def ksGateFromValueCounts(prevCounts: DataFrame, nextCounts: DataFrame,
                            threshold: Double, roundTo: Int = 6,
                            scanParts: Int = 32): DataFrame = {
    val counts = prevCounts
      .select(col("v"), col("n").cast("long").as("pn"), lit(0L).as("nn"))
      .unionByName(nextCounts
        .select(col("v"), lit(0L).as("pn"), col("n").cast("long").as("nn")))
      .groupBy("v").agg(sum("pn").as("pn"), sum("nn").as("nn"))
    ksFinish(Scan.cumSums(counts, Seq("v"), Seq("pn", "nn"), scanParts),
      threshold, roundTo)
  }

  /** [[ksGate]] on a pre-binned histogram grid — the STREAMING form's
    * arithmetic: bin counts fold through complete-mode engine state exactly
    * as [[psiGateFromCounts]]'s do, and the binned CDF max runs over ≤ bins
    * rows (parameter-sized, so the plain cumulative window is the right
    * tool here — see [[Scan]] for when it is not). Binned D converges to
    * exact D from below as the grid refines; the streaming query's oracle
    * is the batch binned SQL, so stream ≡ batch is what gets checked.
    */
  def ksGateFromBinnedCounts(prevCounts: DataFrame, nextCounts: DataFrame,
                             threshold: Double, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pc = prevCounts.withColumnRenamed("n", "prev_n")
    val nc = nextCounts.withColumnRenamed("n", "next_n")
    val joined = pc.join(nc, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("prev_n"), lit(0L)).as("pn"),
        coalesce(col("next_n"), lit(0L)).as("nn"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    ksFinish(joined
      .withColumn("cum_pn", sum("pn").over(w))
      .withColumn("cum_nn", sum("nn").over(w)),
      threshold, roundTo)
  }

  /** Shared KS finish over (cum_pn, cum_nn) running counts: totals, CDF
    * gap, max, verdict. An EMPTY side (tp or tn = 0) must not reach the
    * division at all: under ANSI mode (Spark 4 default) 0-divide THROWS,
    * and with ANSI off it yields NaN whose `NaN > threshold` is true —
    * either way a silent-or-crashing wrong answer. The guard sits INSIDE
    * the aggregate (the conditional short-circuits the division), so an
    * empty side yields null `ks` and null `is_drift` (matching
    * [[groupedKsGate]]'s exclude-empty-sides contract); a vanishing source
    * is the count gate's job, not KS's.
    */
  private def ksFinish(cum: DataFrame, threshold: Double, roundTo: Int): DataFrame = {
    val totals = cum.agg(max("cum_pn").as("tp"), max("cum_nn").as("tn"))
    cum.crossJoin(broadcast(totals))
      .agg(floorRound(max(when(col("tp") > 0 && col("tn") > 0,
        abs(col("cum_pn").cast("double") / col("tp").cast("double") -
          col("cum_nn").cast("double") / col("tn").cast("double")))), roundTo).as("ks"),
        first("tp").as("n_prev"), first("tn").as("n_next"))
      .withColumn("is_drift",
        when(col("ks").isNotNull, (col("ks") > threshold).cast("long")))
      .select("ks", "n_prev", "n_next", "is_drift")
  }

  /** Per-GROUP binned KS — the multi-source form completing the KS row of
    * the gate matrix (count × {batch,stream,keyed,history}, PSI ×
    * {batch,stream,grouped×2}, KS × {exact batch, stream binned, grouped}):
    * one D per group over that group's own binned CDF pair. The cumulative
    * window partitions BY GROUP over the fixed grid, so each partition is
    * ≤ bins rows — parameter-sized, the legitimate window case. Groups
    * with an empty side are excluded (a vanishing source is the COUNT
    * gate's job, same contract as [[groupedPsiGateFromCounts]]).
    */
  def groupedKsGate(prev: DataFrame, next: DataFrame, groupCol: String,
                    valueCol: String, lo: Double, hi: Double, bins: Int,
                    threshold: Double, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pc = Sketches.groupedHistogramCounts(prev, groupCol, valueCol, lo, hi, bins)
      .withColumnRenamed("n", "prev_n")
    val nc = Sketches.groupedHistogramCounts(next, groupCol, valueCol, lo, hi, bins)
      .withColumnRenamed("n", "next_n")
    val joined = pc.join(nc, Seq("g", "bin"), "full_outer")
      .select(col("g"), col("bin"), coalesce(col("prev_n"), lit(0L)).as("pn"),
        coalesce(col("next_n"), lit(0L)).as("nn"))
    val w = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = joined
      .withColumn("cp", sum("pn").over(w))
      .withColumn("cn", sum("nn").over(w))
    val totals = cum.groupBy("g").agg(max("cp").as("tp"), max("cn").as("tn"))
    cum.join(totals, Seq("g"))
      .filter(col("tp") > 0 && col("tn") > 0)
      .groupBy("g")
      .agg(floorRound(max(abs(col("cp").cast("double") / col("tp").cast("double") -
        col("cn").cast("double") / col("tn").cast("double"))), roundTo).as("ks"),
        first("tp").as("n_prev"), first("tn").as("n_next"))
      .withColumn("is_drift", (col("ks") > threshold).cast("long"))
      .select(col("g").as(groupCol), col("ks"), col("n_prev"), col("n_next"), col("is_drift"))
  }

  /** The oracle SQL mirror of [[groupedKsGate]]: baseline = `table`, next
    * snapshot = `table WHERE nextWhere`.
    */
  def groupedKsGateSql(table: String, groupCol: String, valueCol: String,
                       nextWhere: String, lo: Double, hi: Double, bins: Int,
                       threshold: Double, roundTo: Int = 6): String = {
    val w = (hi - lo) / bins
    val frs = graft.functions.MathFunctions.floorRoundSql _
    def binCte(name: String, where: String) =
      s"""$name AS (
         |  SELECT $groupCol AS g,
         |    least(greatest(CAST(floor((CAST($valueCol AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($w AS DOUBLE)) AS BIGINT),
         |    CAST(0 AS BIGINT)), CAST(${bins - 1} AS BIGINT)) AS bin
         |  FROM $table
         |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE))$where)""".stripMargin
    val d = "abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE))"
    s"""WITH ${binCte("hp", "")},
       |${binCte("hn", s" AND ($nextWhere)")},
       |cp0 AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS pn FROM hp GROUP BY g, bin),
       |cn0 AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS nn FROM hn GROUP BY g, bin),
       |j AS (
       |  SELECT coalesce(cp0.g, cn0.g) AS g, coalesce(cp0.bin, cn0.bin) AS bin,
       |    coalesce(cp0.pn, 0) AS pn, coalesce(cn0.nn, 0) AS nn
       |  FROM cp0 FULL OUTER JOIN cn0 ON cp0.g = cn0.g AND cp0.bin = cn0.bin),
       |cum AS (
       |  SELECT g,
       |    sum(pn) OVER (PARTITION BY g ORDER BY bin) AS cp,
       |    sum(nn) OVER (PARTITION BY g ORDER BY bin) AS cn
       |  FROM j),
       |t AS (SELECT g, CAST(max(cp) AS BIGINT) AS tp, CAST(max(cn) AS BIGINT) AS tn
       |      FROM cum GROUP BY g)
       |SELECT cum.g AS $groupCol, ${frs(s"max($d)", roundTo)} AS ks,
       |  CAST(min(tp) AS BIGINT) AS n_prev, CAST(min(tn) AS BIGINT) AS n_next,
       |  CAST(${frs(s"max($d)", roundTo)} > CAST($threshold AS DOUBLE) AS BIGINT) AS is_drift
       |FROM cum JOIN t ON t.g = cum.g WHERE tp > 0 AND tn > 0
       |GROUP BY cum.g ORDER BY cum.g""".stripMargin
  }

  /** Per-GROUP EXACT KS — the last cell of the KS row on the exact axis
    * (exact batch [[ksGate]] / exact stream q198 / grouped BINNED
    * [[groupedKsGate]]): one bin-free D per group over that group's own
    * distinct-value CDF pair. The running counts use a window PARTITIONED
    * BY GROUP over the group's distinct values — per-partition size is
    * bounded by the value DOMAIN within the group (the q198 state
    * argument: ≤ 1.1M keys for a fixed-point currency column at ANY row
    * count), never by rows; for truly continuous domains the grouped
    * binned form stays the right trade. Groups with an empty side are
    * excluded (the [[groupedKsGate]] contract — a vanishing source is the
    * count gate's job), and the exclusion filter precedes the division, so
    * ANSI mode never sees a zero divisor.
    */
  def groupedKsGateExact(prev: DataFrame, next: DataFrame, groupCol: String,
                         valueCol: String, threshold: Double,
                         roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    def side(df: DataFrame, pn: Int, nn: Int) = df
      .filter(v.isNotNull && !isnan(v))
      .select(col(groupCol).as("g"), v.as("v"),
        lit(pn.toLong).as("pn"), lit(nn.toLong).as("nn"))
    val counts = side(prev, 1, 0).unionByName(side(next, 0, 1))
      .groupBy("g", "v").agg(sum("pn").as("pn"), sum("nn").as("nn"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wg = Window.partitionBy("g")
    counts
      .withColumn("cum_pn", sum("pn").over(w))
      .withColumn("cum_nn", sum("nn").over(w))
      .withColumn("tp", max("cum_pn").over(wg))
      .withColumn("tn", max("cum_nn").over(wg))
      .filter(col("tp") > 0 && col("tn") > 0)
      .groupBy("g")
      .agg(floorRound(max(abs(
          col("cum_pn").cast("double") / col("tp").cast("double") -
          col("cum_nn").cast("double") / col("tn").cast("double"))), roundTo).as("ks"),
        first("tp").as("n_prev"), first("tn").as("n_next"))
      .withColumn("is_drift", (col("ks") > threshold).cast("long"))
      .select(col("g").as(groupCol), col("ks"), col("n_prev"), col("n_next"),
        col("is_drift"))
      .orderBy(groupCol)
  }

  /** The oracle SQL mirror of [[groupedKsGateExact]]. */
  def groupedKsGateExactSql(table: String, groupCol: String, valueCol: String,
                            nextWhere: String, threshold: Double,
                            roundTo: Int = 6): String = {
    val frs = graft.functions.MathFunctions.floorRoundSql _
    def sideCte(name: String, where: String, pn: Int, nn: Int) =
      s"""$name AS (
         |  SELECT $groupCol AS g, CAST($valueCol AS DOUBLE) AS v,
         |    CAST($pn AS BIGINT) AS pn, CAST($nn AS BIGINT) AS nn
         |  FROM $table
         |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE))$where)""".stripMargin
    val d = "abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE))"
    s"""WITH ${sideCte("sp", "", 1, 0)},
       |${sideCte("sn", s" AND ($nextWhere)", 0, 1)},
       |c AS (
       |  SELECT g, v, CAST(sum(pn) AS BIGINT) AS pn, CAST(sum(nn) AS BIGINT) AS nn
       |  FROM (SELECT * FROM sp UNION ALL SELECT * FROM sn) GROUP BY g, v),
       |cum AS (
       |  SELECT g,
       |    sum(pn) OVER (PARTITION BY g ORDER BY v) AS cp,
       |    sum(nn) OVER (PARTITION BY g ORDER BY v) AS cn
       |  FROM c),
       |t AS (SELECT g, CAST(max(cp) AS BIGINT) AS tp, CAST(max(cn) AS BIGINT) AS tn
       |      FROM cum GROUP BY g)
       |SELECT cum.g AS $groupCol, ${frs(s"max($d)", roundTo)} AS ks,
       |  CAST(min(tp) AS BIGINT) AS n_prev, CAST(min(tn) AS BIGINT) AS n_next,
       |  CAST(${frs(s"max($d)", roundTo)} > CAST($threshold AS DOUBLE) AS BIGINT) AS is_drift
       |FROM cum JOIN t ON t.g = cum.g WHERE tp > 0 AND tn > 0
       |GROUP BY cum.g ORDER BY cum.g""".stripMargin
  }

  /** The oracle SQL mirror of [[ksGate]] (exact, distinct-value CDFs). */
  def ksGateSql(prevSel: String, nextSel: String, valueCol: String,
                threshold: Double, roundTo: Int = 6): String = {
    val frs = graft.functions.MathFunctions.floorRoundSql _
    def sideCte(name: String, sel: String, pn: Int, nn: Int) =
      s"""$name AS (
         |  SELECT CAST($valueCol AS DOUBLE) AS v, CAST($pn AS BIGINT) AS pn, CAST($nn AS BIGINT) AS nn
         |  FROM ($sel)
         |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE)))""".stripMargin
    s"""WITH ${sideCte("sp", prevSel, 1, 0)},
       |${sideCte("sn", nextSel, 0, 1)},
       |c AS (
       |  SELECT v, CAST(sum(pn) AS BIGINT) AS pn, CAST(sum(nn) AS BIGINT) AS nn
       |  FROM (SELECT * FROM sp UNION ALL SELECT * FROM sn) GROUP BY v),
       |cum AS (
       |  SELECT sum(pn) OVER (ORDER BY v) AS cp, sum(nn) OVER (ORDER BY v) AS cn
       |  FROM c),
       |t AS (SELECT CAST(max(cp) AS BIGINT) AS tp, CAST(max(cn) AS BIGINT) AS tn FROM cum)
       |SELECT ${frs("max(abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE)))", roundTo)} AS ks,
       |  CAST(min(tp) AS BIGINT) AS n_prev, CAST(min(tn) AS BIGINT) AS n_next,
       |  CAST(${frs("max(abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE)))", roundTo)} > CAST($threshold AS DOUBLE) AS BIGINT) AS is_drift
       |FROM cum CROSS JOIN t""".stripMargin
  }

  /** The oracle SQL mirror of [[ksGateFromBinnedCounts]] over two snapshot
    * subqueries on [[Sketches.histBinCol]]'s grid.
    */
  def ksBinnedSql(prevSel: String, nextSel: String, valueCol: String,
                  lo: Double, hi: Double, bins: Int,
                  threshold: Double, roundTo: Int = 6): String = {
    val w = (hi - lo) / bins
    val frs = graft.functions.MathFunctions.floorRoundSql _
    def binCte(name: String, sel: String) =
      s"""$name AS (
         |  SELECT least(greatest(CAST(floor((CAST($valueCol AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($w AS DOUBLE)) AS BIGINT),
         |    CAST(0 AS BIGINT)), CAST(${bins - 1} AS BIGINT)) AS bin
         |  FROM ($sel)
         |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE)))""".stripMargin
    s"""WITH ${binCte("hp", prevSel)},
       |${binCte("hn", nextSel)},
       |cp AS (SELECT bin, CAST(count(*) AS BIGINT) AS pn FROM hp GROUP BY bin),
       |cn AS (SELECT bin, CAST(count(*) AS BIGINT) AS nn FROM hn GROUP BY bin),
       |j AS (
       |  SELECT coalesce(cp.bin, cn.bin) AS bin, coalesce(cp.pn, 0) AS pn, coalesce(cn.nn, 0) AS nn
       |  FROM cp FULL OUTER JOIN cn ON cp.bin = cn.bin),
       |cum AS (
       |  SELECT sum(pn) OVER (ORDER BY bin) AS cp, sum(nn) OVER (ORDER BY bin) AS cn
       |  FROM j),
       |t AS (SELECT CAST(max(cp) AS BIGINT) AS tp, CAST(max(cn) AS BIGINT) AS tn FROM cum)
       |SELECT ${frs("max(abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE)))", roundTo)} AS ks,
       |  CAST(min(tp) AS BIGINT) AS n_prev, CAST(min(tn) AS BIGINT) AS n_next,
       |  CAST(${frs("max(abs(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) - CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE)))", roundTo)} > CAST($threshold AS DOUBLE) AS BIGINT) AS is_drift
       |FROM cum CROSS JOIN t""".stripMargin
  }

  /** The oracle SQL mirror of [[psiGate]] over two snapshot subqueries. */
  def psiGateSql(prevSel: String, nextSel: String, valueCol: String,
                 lo: Double, hi: Double, bins: Int,
                 threshold: Double = 0.25, minP: Double = 1e-6,
                 roundTo: Int = 6): String = {
    val w = (hi - lo) / bins
    def binCte(name: String, sel: String) =
      s"""$name AS (
         |  SELECT least(greatest(CAST(floor((CAST($valueCol AS DOUBLE) - CAST($lo AS DOUBLE)) / CAST($w AS DOUBLE)) AS BIGINT),
         |    CAST(0 AS BIGINT)), CAST(${bins - 1} AS BIGINT)) AS bin
         |  FROM ($sel)
         |  WHERE $valueCol IS NOT NULL AND NOT isnan(CAST($valueCol AS DOUBLE)))""".stripMargin
    s"""WITH ${binCte("hp", prevSel)},
       |${binCte("hn", nextSel)},
       |cp AS (SELECT bin, CAST(count(*) AS BIGINT) AS pn FROM hp GROUP BY bin),
       |cn AS (SELECT bin, CAST(count(*) AS BIGINT) AS nn FROM hn GROUP BY bin),
       |j AS (
       |  SELECT coalesce(cp.pn, 0) AS pn, coalesce(cn.nn, 0) AS nn
       |  FROM cp FULL OUTER JOIN cn ON cp.bin = cn.bin),
       |t AS (SELECT CAST(sum(pn) AS BIGINT) AS tp, CAST(sum(nn) AS BIGINT) AS tn FROM j),
       |pq AS (
       |  SELECT greatest(CAST(pn AS DOUBLE) / CAST(tp AS DOUBLE), CAST($minP AS DOUBLE)) AS p,
       |    greatest(CAST(nn AS DOUBLE) / CAST(tn AS DOUBLE), CAST($minP AS DOUBLE)) AS q,
       |    tp, tn
       |  FROM j CROSS JOIN t)
       |SELECT ${graft.functions.MathFunctions.floorRoundSql("sum((p - q) * ln(p / q))", roundTo)} AS psi,
       |  CAST(min(tp) AS BIGINT) AS n_prev, CAST(min(tn) AS BIGINT) AS n_next,
       |  CAST(${graft.functions.MathFunctions.floorRoundSql("sum((p - q) * ln(p / q))", roundTo)} > CAST($threshold AS DOUBLE) AS BIGINT) AS is_drift
       |FROM pq""".stripMargin
  }
}
