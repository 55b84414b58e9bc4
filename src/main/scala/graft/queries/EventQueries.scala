package graft.queries

import graft.Tables
import graft.functions.MathFunctions.{floorRound => fr, floorRoundSql => frs}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Event-stream-shaped batch queries over the `events` fixture (SURVEY.md §2.8
  * X-F): time-bucket aggregation, JSON field extraction, per-entity stats,
  * sliding windows.
  *
  * Time buckets are emitted as formatted strings — `events.ts` is
  * ns-precision; string buckets sidestep engine-specific timestamp precision
  * in the oracle compare (SURVEY §7 risk 4).
  */
object EventQueries {
  private val hourStr = date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")

  def all: ListMap[String, Q] = ListMap(
    "q12_events_hourly" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(hourStr.as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), fr(sum("value"), 2).as("total_value"))
          .orderBy("hour", "event_type")
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
             |  count(*) AS n, ${frs("sum(value)", 2)} AS total_value
             |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    "q13_events_json" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), fr(avg("value"), 4).as("avg_value"))
          .orderBy("k_bucket")
      },
      Some(s"""SELECT CAST(json_extract_string(props,'$$.k') AS BIGINT) % 10 AS k_bucket,
             |  count(*) AS n, ${frs("avg(value)", 4)} AS avg_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q14_user_activity" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct("event_type").as("n_types"),
            fr(sum("value"), 2).as("total_value"),
            date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, count(*) AS n_events, count(DISTINCT event_type) AS n_types,
             |  ${frs("sum(value)", 2)} AS total_value,
             |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q15_events_sliding_window" -> Q(
      (s, dir) => {
        // 2h windows sliding by 1h: each event lands in exactly two windows.
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:00").as("win_start"),
            col("event_type"), col("n"))
          .orderBy("win_start", "event_type")
      },
      Some("""SELECT strftime(ws, '%Y-%m-%d %H:00') AS win_start, event_type, count(*) AS n
             |FROM (
             |  SELECT date_trunc('hour', ts) AS ws, event_type FROM events
             |  UNION ALL
             |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events)
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // Recency-weighted activity: per-user sum of 1/(1 + age_days) relative
    // to the corpus's latest event — the time-decay scoring that weights
    // fresh engagement without exp()/ln() (rational decay keeps both engines
    // in plain IEEE arithmetic, so the score value is oracle-checked).
    "q82_decay_score" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val anchor = ev.agg(max(unix_micros(col("ts"))).as("__anchor"))
        ev.crossJoin(broadcast(anchor))
          .withColumn("__decay", lit(1.0) / (lit(1.0) +
            (col("__anchor") - unix_micros(col("ts"))).cast("double") / lit(86400000000.0)))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), fr(sum(col("__decay")), 4).as("recency_score"))
          .orderBy("user_id")
      },
      Some(s"""WITH a AS (SELECT max(epoch_us(ts)) AS anchor FROM events)
             |SELECT user_id, count(*) AS n_events,
             |  ${frs("sum(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(a.anchor - epoch_us(ts) AS DOUBLE) / CAST(8.64E10 AS DOUBLE)))", 4)} AS recency_score
             |FROM events, a GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SCD2 interval construction: each user's event stream collapsed into
    // state runs [valid_from, valid_to) with one open is_current row — the
    // warehouse change-tracking shape, two windows over ONE user_id shuffle.
    "q90_scd2_intervals" -> Q(
      (s, dir) => graft.operators.Scd.intervals(
          Tables.events(s, dir), "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "valid_from", "event_type"),
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |c AS (
             |  SELECT user_id, ts, event_id, event_type FROM e
             |  WHERE prev IS NULL OR prev <> event_type),
             |i AS (
             |  SELECT user_id, event_type, ts,
             |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
             |  FROM c)
             |SELECT user_id, event_type,
             |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |  strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
             |  CAST(CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
             |FROM i ORDER BY user_id, valid_from, event_type""".stripMargin)),

    // Conversion funnel: users whose first purchase follows their first
    // signup. min-over-conditional + count aggregation; single-row output.
    "q42_funnel" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
            min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
          .agg(
            count(col("first_signup")).as("n_signup"),
            count(when(col("first_purchase") > col("first_signup"), lit(1))).as("n_converted"))
          .select(col("n_signup"), col("n_converted"),
            fr(col("n_converted").cast("double") / col("n_signup").cast("double"), 4).as("conversion"))
      },
      Some(s"""SELECT n_signup, n_converted,
             |  ${frs("CAST(n_converted AS DOUBLE) / CAST(n_signup AS DOUBLE)", 4)} AS conversion
             |FROM (
             |  SELECT count(first_signup) AS n_signup,
             |    count(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
             |  FROM (
             |    SELECT user_id,
             |      min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             |      min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
             |    FROM events GROUP BY 1))""".stripMargin)),

    // Range join: events falling inside 6-hour windows anchored at sampled
    // events. Bin-bucketed equi-join (1-hour bins), exact filter after.
    "q48_range_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val intervals = ev.filter(col("event_id") % 199 === 0)
          .select(col("event_id").as("anchor_id"),
            col("ts").as("win_start"),
            (col("ts") + expr("INTERVAL 6 HOURS")).as("win_end"))
        val pairs = graft.operators.RangeJoin.pointsInIntervals(
          ev.select("event_id", "ts"), "ts",
          intervals, "win_start", "win_end", binSeconds = 3600L)
        pairs.groupBy("anchor_id")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("anchor_id")
      },
      Some("""SELECT anchor_id, count(*) AS n_events
             |FROM (SELECT event_id AS anchor_id, ts AS win_start,
             |        ts + INTERVAL 6 HOUR AS win_end
             |      FROM events WHERE event_id % 199 = 0) i
             |JOIN events e ON e.ts >= i.win_start AND e.ts < i.win_end
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // As-of join: each purchase matched to the user's most recent
    // at-or-before signup. Spark side = union + single window (one shuffle);
    // oracle = DuckDB's native ASOF LEFT JOIN.
    "q47_asof_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id", "value")
        val signups = ev.filter(col("event_type") === "signup")
          .select("user_id", "ts", "event_id")
        graft.operators.AsOfJoin.asOf(purchases, signups, "user_id", "ts", "ts",
            rightCols = Seq("ts"), tieCol = "event_id")
          .select(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            col("event_id"), col("value"),
            date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
             |     s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
             |SELECT p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             |  p.event_id, p.value, strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
             |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
             |ORDER BY p.user_id, p.event_id""".stripMargin)),

    "q36_sessionize" -> Q(
      (s, dir) => graft.streaming.Sessionize.batch(s, dir, gapMinutes = 30),
      Some(SessionizeOracle)),

    // Join-key skew audit over events.user_id: hottest keys, share, ratio to
    // the median per-key count, and the ceil(n/median) salt factor a salted
    // join would need — the pre-join planning report for Skew.saltedJoin.
    "q105_skew_audit" -> Q(
      (s, dir) => graft.operators.Skew.skewAudit(
        Tables.events(s, dir), col("user_id"), topN = 10),
      Some(s"""WITH c AS (
             |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |s AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS total,
             |    quantile_cont(n, 0.5) AS p50 FROM c)
             |SELECT key, n,
             |  ${frs("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)", 6)} AS share,
             |  ${frs("CAST(n AS DOUBLE) / p50", 4)} AS hot_ratio,
             |  CAST(ceil(CAST(n AS DOUBLE) / p50) AS BIGINT) AS rec_salt
             |FROM c CROSS JOIN s
             |ORDER BY n DESC, key LIMIT 10""".stripMargin)),

    // Hourly volume anomalies with EXACT arithmetic: z-scores from integer
    // sums (n·S2 − S1² variance identity), so the doubles are partition-
    // order-independent and bit-identical to the oracle — no streaming-
    // moments drift.
    "q108_hourly_anomaly" -> Q(
      (s, dir) => graft.operators.Anomaly.countZScores(
        Tables.events(s, dir), hourStr, zMax = 3.0),
      Some {
        val zCase =
          s"""CASE WHEN k > 1 AND CAST(k*s2 - s1*s1 AS DOUBLE) > 0 THEN
             |    ${frs("CAST(n_events*k - s1 AS DOUBLE) / (CAST(k AS DOUBLE) * sqrt(CAST(k*s2 - s1*s1 AS DOUBLE) / CAST(k*(k-1) AS DOUBLE)))", 4)}
             |  END""".stripMargin
        s"""WITH c AS (
           |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           |    CAST(count(*) AS BIGINT) AS n_events
           |  FROM events GROUP BY 1),
           |s AS (
           |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_events) AS BIGINT) AS s1,
           |    CAST(sum(n_events*n_events) AS BIGINT) AS s2 FROM c),
           |r AS (
           |  SELECT bucket, n_events, $zCase AS z
           |  FROM c CROSS JOIN s)
           |SELECT bucket, n_events, z,
           |  coalesce(CAST(abs(z) > CAST(3.0 AS DOUBLE) AS BIGINT), 0) AS is_anomaly
           |FROM r ORDER BY bucket""".stripMargin
      }),

    // Point-in-time join: each purchase attaches the account-status SCD2
    // version (signup/error runs) valid AT ITS TIMESTAMP — the feature-store
    // leakage-free attribute join; purchases before the first status row
    // keep a null state.
    "q110_pit_join" -> Q(
      (s, dir) => {
        val ev  = Tables.events(s, dir)
        val dim = graft.operators.Scd.intervals(
          ev.filter(col("event_type").isin("signup", "error")),
          "user_id", "ts", "event_id", "event_type")
        val facts = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        graft.operators.Scd.pitJoin(facts, dim, "user_id", "ts")
          .select(col("user_id"), col("event_id"), col("fact_ts"),
            col("event_type").as("state"), col("valid_from"))
          .orderBy("user_id", "fact_ts", "event_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events WHERE event_type IN ('signup', 'error')),
             |c AS (
             |  SELECT user_id, ts, event_id, event_type FROM e
             |  WHERE prev IS NULL OR prev <> event_type),
             |d AS (
             |  SELECT user_id, event_type AS state,
             |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |    strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |      '%Y-%m-%d %H:%M:%S') AS valid_to
             |  FROM c),
             |f AS (
             |  SELECT user_id, event_id,
             |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS fact_ts
             |  FROM events WHERE event_type = 'purchase')
             |SELECT f.user_id, f.event_id, f.fact_ts, d.state, d.valid_from
             |FROM f LEFT JOIN d ON f.user_id = d.user_id
             |  AND f.fact_ts >= d.valid_from
             |  AND (d.valid_to IS NULL OR f.fact_ts < d.valid_to)
             |ORDER BY f.user_id, f.fact_ts, f.event_id""".stripMargin)),

    // Behavioral trigram mining: most common 3-step event-type sequences
    // across user streams (lead-window n-grams, global count, top-20).
    "q111_event_ngrams" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            lead("event_type", 1).over(w).as("__e2"),
            lead("event_type", 2).over(w).as("__e3"))
          .filter(col("__e2").isNotNull && col("__e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("__e2"), col("__e3")).as("trigram"))
          .groupBy("trigram").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("trigram")).limit(20)
      },
      Some("""WITH g AS (
             |  SELECT event_type || '>' ||
             |    lead(event_type, 1) OVER w || '>' ||
             |    lead(event_type, 2) OVER w AS trigram
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT trigram, count(*) AS n FROM g
             |WHERE trigram IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin)),

    // Weekly cohort retention matrix: users bucketed by first-activity week,
    // tracked by distinct-active share at each later week offset — the
    // engagement (and data-freshness) report every events pipeline ships.
    // Monday-truncated weeks agree between engines; offsets are exact day
    // diffs of week-truncs (always multiples of 7).
    "q113_retention_cohorts" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wk = date_trunc("week", col("ts"))
        val weeks = Tables.events(s, dir).select(col("user_id"), wk.as("__wk"))
        val cohorts = weeks.groupBy("user_id").agg(min("__wk").as("__cohort"))
        val g = weeks
          .join(cohorts, Seq("user_id"))
          .groupBy(
            date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_week"),
            (datediff(col("__wk").cast("date"), col("__cohort").cast("date")) / 7)
              .cast("long").as("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
        val w = Window.partitionBy("cohort_week")
        g.withColumn("cohort_size",
            max(when(col("week_offset") === 0, col("n_users"))).over(w))
          .withColumn("retention",
            fr(col("n_users").cast("double") / col("cohort_size").cast("double"), 4))
          .orderBy("cohort_week", "week_offset")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id, date_trunc('week', ts) AS wk FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
             |g AS (
             |  SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
             |    CAST(date_diff('day', c.cohort, e.wk) // 7 AS BIGINT) AS week_offset,
             |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
             |  FROM e JOIN c USING (user_id) GROUP BY 1, 2),
             |w AS (
             |  SELECT cohort_week, week_offset, n_users,
             |    CAST(max(CASE WHEN week_offset = 0 THEN n_users END)
             |      OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size
             |  FROM g)
             |SELECT cohort_week, week_offset, n_users, cohort_size,
             |  ${frs("CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE)", 4)} AS retention
             |FROM w ORDER BY 1, 2""".stripMargin)),

    // HyperLogLog distinct sketches over a high-cardinality key (event_id —
    // the harmonic-mean regime) and a low-cardinality key (user_id — the
    // linear-counting correction regime), both ESTIMATES oracle-checked:
    // integer register math over the PolyHash family, audited against the
    // exact distinct counts. Completes the sketch family next to KMV (q64)
    // and count-min (q72).
    "q115_hll_distinct" -> Q(
      (s, dir) => {
        import graft.operators.Sketches
        val ev = Tables.events(s, dir)
        Sketches.hllDistinct(ev.select("event_id"), "event_id", p = 9)
          .withColumn("key", lit("event_id"))
          .unionByName(
            Sketches.hllDistinct(ev.select("user_id"), "user_id", p = 9)
              .withColumn("key", lit("user_id")))
          .select("key", "m", "v_zero", "raw_est", "est_distinct",
            "exact_distinct", "rel_err")
          .orderBy("key")
      },
      Some {
        import graft.operators.Sketches
        s"""SELECT 'event_id' AS key, * FROM (${Sketches.hllSql("events", "event_id", p = 9)})
           |UNION ALL
           |SELECT 'user_id' AS key, * FROM (${Sketches.hllSql("events", "user_id", p = 9)})
           |ORDER BY key""".stripMargin
      }),

    // GROUPED HLL: distinct users per event type as one sketch row per
    // group — the approximate count-distinct that replaces per-group exact
    // DISTINCT state at scale, with the exact audit beside it. Shuffle is
    // groups × m slim register rows regardless of key cardinality.
    "q132_hll_by_group" -> Q(
      (s, dir) => graft.operators.Sketches.hllDistinctByKey(
        Tables.events(s, dir), "event_type", "user_id", p = 9),
      Some(graft.operators.Sketches.hllByKeySql("events", "event_type", "user_id", p = 9))),

    // First-order Markov transition matrix over per-user event sequences:
    // P(next event type | event type) from lead-window pairs — the
    // behavioral model behind q111's raw trigram counts. Probabilities are
    // one division of exact BIGINT counts.
    "q116_event_transitions" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = Tables.events(s, dir)
          .select(col("event_type"), lead("event_type", 1).over(w).as("__next"))
          .filter(col("__next").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val byFrom = Window.partitionBy("from_type")
        pairs
          .withColumn("p",
            fr(col("n").cast("double") / sum("n").over(byFrom).cast("double"), 4))
          .orderBy("from_type", "to_type")
      },
      Some(s"""WITH g AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (
             |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM g WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  ${frs("CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)", 4)} AS p
             |FROM c ORDER BY 1, 2""".stripMargin)),

    // Right-to-be-forgotten cascade: a deletion-request list (user_id % 97)
    // erased from the raw event log AND a derived per-user profile store,
    // with the per-table audit (rows before/removed/after, users actually
    // hit) a GDPR deletion job must produce. Broadcast anti-join per table —
    // the fact tables never shuffle.
    "q120_user_erasure" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val requests = ev.select("user_id").filter(col("user_id") % 97 === 0)
        val profiles = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
        graft.operators.Cleaning.eraseUsers(requests, "user_id",
          Seq("events" -> (ev, "user_id"), "user_profiles" -> (profiles, "user_id")))
      },
      Some("""WITH req AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
             |prof AS (SELECT user_id FROM events GROUP BY user_id),
             |ea AS (
             |  SELECT 'events' AS table_name,
             |    CAST(count(*) AS BIGINT) AS rows_before,
             |    CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rows_removed,
             |    CAST(count(DISTINCT CASE WHEN r.user_id IS NOT NULL THEN e.user_id END) AS BIGINT) AS users_hit
             |  FROM events e LEFT JOIN req r ON e.user_id = r.user_id),
             |pa AS (
             |  SELECT 'user_profiles' AS table_name,
             |    CAST(count(*) AS BIGINT) AS rows_before,
             |    CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rows_removed,
             |    CAST(count(DISTINCT CASE WHEN r.user_id IS NOT NULL THEN p.user_id END) AS BIGINT) AS users_hit
             |  FROM prof p LEFT JOIN req r ON p.user_id = r.user_id)
             |SELECT table_name, rows_before, rows_removed,
             |  rows_before - rows_removed AS rows_after, users_hit
             |FROM (SELECT * FROM ea UNION ALL SELECT * FROM pa)
             |ORDER BY table_name""".stripMargin)),

    // Equal-width value histogram per event type with GLOBAL bin edges —
    // the distribution-drift profile view. Bin assignment is the identical
    // IEEE expression in both engines (edge values bin identically).
    "q121_value_histogram" -> Q(
      (s, dir) => graft.operators.Profile.histogram(
        Tables.events(s, dir).select("event_type", "value"),
        "event_type", "value", nBins = 20),
      Some(graft.operators.Profile.histogramSql("events", "event_type", "value", nBins = 20))),

    // Equi-DEPTH deciles per event type (q121's complement: equal COUNT per
    // bin, data-driven edges) — ntile over a deterministic (value, event_id)
    // order, so ties split identically in both engines; per-bin count and
    // exact [lo, hi] value range.
    "q128_equidepth_deciles" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy("value", "event_id")
        Tables.events(s, dir)
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy("event_type", "decile")
          .agg(count(lit(1)).as("n"),
            fr(min("value"), 4).as("lo"), fr(max("value"), 4).as("hi"))
          .orderBy("event_type", "decile")
      },
      Some(s"""WITH d AS (
             |  SELECT event_type, value,
             |    CAST(ntile(10) OVER (PARTITION BY event_type
             |      ORDER BY value, event_id) AS BIGINT) AS decile
             |  FROM events)
             |SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n,
             |  ${frs("min(value)", 4)} AS lo, ${frs("max(value)", 4)} AS hi
             |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // CDC changelog -> current-state snapshot (Debezium-style
    // materialization, the single-state complement of q90's SCD2 history):
    // latest row per user under (ts, event_id) order, keys whose last op is
    // a delete ('error' plays the tombstone) drop out entirely.
    "q129_cdc_snapshot" -> Q(
      (s, dir) => graft.operators.Scd.cdcSnapshot(
          Tables.events(s, dir), "user_id",
          orderCols = Seq(col("ts"), col("event_id")),
          isDelete = col("event_type") === "error")
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("event_type").as("last_type"), fr(col("value"), 4).as("last_value"))
        .orderBy("user_id"),
      Some(s"""WITH r AS (
             |  SELECT user_id, ts, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events)
             |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
             |  event_type AS last_type, ${frs("value", 4)} AS last_value
             |FROM r WHERE rn = 1 AND event_type <> 'error'
             |ORDER BY user_id""".stripMargin)),

    // Exact quantile profile of value per event type — p25/p50/p75/p95 with
    // linear interpolation (Spark percentile == DuckDB quantile_cont; the
    // parity q35b's median already established, extended to a full profile).
    "q122_value_quantiles" -> Q(
      (s, dir) => {
        val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            qs.map { case (q, name) =>
              fr(percentile(col("value"), lit(q)), 4).as(name)
            }: _*)
          .withColumn("iqr", fr(col("p75") - col("p25"), 4))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  ${frs("quantile_cont(value, 0.25)", 4)} AS p25,
             |  ${frs("quantile_cont(value, 0.5)", 4)} AS p50,
             |  ${frs("quantile_cont(value, 0.75)", 4)} AS p75,
             |  ${frs("quantile_cont(value, 0.95)", 4)} AS p95,
             |  ${frs(s"${frs("quantile_cont(value, 0.75)", 4)} - ${frs("quantile_cont(value, 0.25)", 4)}", 4)} AS iqr
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Time-bounded conversion: signups whose FIRST subsequent purchase lands
    // within 7 days — q42's funnel with the window constraint production
    // funnels actually use. Interval arithmetic is identical in both engines
    // (timestamp + INTERVAL 7 DAY, microsecond-exact on these fixtures).
    "q123_conversion_window" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("signup_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("__p_ts"))
        signups.join(purchases, Seq("user_id"), "left")
          .withColumn("__after", when(col("__p_ts") > col("signup_ts"), col("__p_ts")))
          .groupBy("user_id", "signup_ts")
          .agg(min("__after").as("__first_conv"))
          .agg(count(lit(1)).as("n_signup"),
            count(when(col("__first_conv") <= col("signup_ts") + expr("INTERVAL 7 DAYS"),
              lit(1))).as("n_conv_7d"))
          .select(col("n_signup"), col("n_conv_7d"),
            fr(col("n_conv_7d").cast("double") / col("n_signup").cast("double"), 4)
              .as("conv_rate_7d"))
      },
      Some(s"""WITH s AS (
             |  SELECT user_id, min(ts) AS signup_ts FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |fc AS (
             |  SELECT s.user_id, s.signup_ts,
             |    min(CASE WHEN e.ts > s.signup_ts THEN e.ts END) AS first_conv
             |  FROM s LEFT JOIN events e
             |    ON e.user_id = s.user_id AND e.event_type = 'purchase'
             |  GROUP BY 1, 2),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_signup,
             |    CAST(count(CASE WHEN first_conv <= signup_ts + INTERVAL 7 DAY THEN 1 END) AS BIGINT) AS n_conv_7d
             |  FROM fc)
             |SELECT n_signup, n_conv_7d,
             |  ${frs("CAST(n_conv_7d AS DOUBLE) / CAST(n_signup AS DOUBLE)", 4)} AS conv_rate_7d
             |FROM agg""".stripMargin)),
  )

  /** Mirror of Sessionize.batch: 30-minute gap sessions via lag + running sum. */
  val SessionizeOracle: String =
    """WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events),
      |g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      |  FROM g)
      |SELECT user_id, sess_id, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
      |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin
}
