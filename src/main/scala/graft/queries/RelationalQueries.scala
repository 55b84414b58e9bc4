package graft.queries

import graft.Tables
import graft.functions.MathFunctions.{floorRound => fr, floorRoundSql => frs}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Relational operator coverage over the TPC-H-ish fixtures (SURVEY.md §2.3
  * X-J, §2.4 X-A1, §2.5, §2.6): scans, filters, inner/semi/anti joins,
  * broadcast star joins, hash aggregation, rollup, windows, top-k.
  *
  * Scale notes (local[32] tests, 1000-executor design):
  *  - dimension tables (region/nation/customer/part/supplier) are broadcast —
  *    the fact table (lineitem/orders) never shuffles for the star joins;
  *  - aggregations are partial (map-side combine) by construction (groupBy.agg
  *    with algebraic aggregates);
  *  - top-k uses orderBy+limit => TakeOrderedAndProject (per-partition heaps),
  *    not a full sort;
  *  - every query output carries a total order + floor-rounded float keys
  *    (engine-stable, see [[graft.functions.MathFunctions]]).
  */
object RelationalQueries {
  private val revenue    = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val revenueSql = "sum(l_extendedprice*(1-l_discount))"

  def all: ListMap[String, Q] = ListMap(
    "q01_pricing_summary" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            fr(sum("l_quantity"), 2).as("sum_qty"),
            fr(sum("l_extendedprice"), 2).as("sum_base_price"),
            fr(sum(revenue), 2).as("sum_disc_price"),
            fr(avg("l_quantity"), 4).as("avg_qty"),
            fr(avg("l_extendedprice"), 4).as("avg_price"),
            fr(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
             |  ${frs("sum(l_quantity)", 2)} AS sum_qty,
             |  ${frs("sum(l_extendedprice)", 2)} AS sum_base_price,
             |  ${frs(revenueSql, 2)} AS sum_disc_price,
             |  ${frs("avg(l_quantity)", 4)} AS avg_qty,
             |  ${frs("avg(l_extendedprice)", 4)} AS avg_price,
             |  ${frs("avg(l_discount)", 4)} AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    "q02_revenue_by_nation" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(fr(sum(revenue), 2).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, ${frs(revenueSql, 2)} AS revenue, count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q03_top_orders" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_orderkey")
          .agg(fr(sum(revenue), 2).as("order_revenue"))
          .orderBy(desc("order_revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, ${frs(revenueSql, 2)} AS order_revenue
             |FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin)),

    "q04_big_customers_semi" -> Q(
      (s, dir) => {
        val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
        Tables.customer(s, dir)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
             |ORDER BY 1""".stripMargin)),

    "q05_quiet_customers_anti" -> Q(
      (s, dir) => {
        // anti-join against a filtered build side: customers with no
        // high-value order (threshold chosen so the result is non-trivial)
        val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 350000)
        Tables.customer(s, dir)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000)
             |ORDER BY 1""".stripMargin)),

    "q06_top_orders_per_cust" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    "q07_priority_stats" -> Q(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            fr(sum("o_totalprice"), 2).as("total"),
            fr(avg("o_totalprice"), 4).as("avg_price"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS n_orders,
             |  ${frs("sum(o_totalprice)", 2)} AS total, ${frs("avg(o_totalprice)", 4)} AS avg_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q08_brand_revenue" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(fr(sum(revenue), 2).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      },
      Some(s"""SELECT p_brand, ${frs(revenueSql, 2)} AS revenue, count(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q09_rollup_qty" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(fr(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("sum_qty"), col("n"))
          .orderBy("returnflag", "linestatus")
      },
      Some(s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag, coalesce(l_linestatus,'ALL') AS linestatus,
             |  ${frs("sum(l_quantity)", 2)} AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY 1,2""".stripMargin)),

    "q10_region_revenue" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(fr(sum(revenue), 2).as("revenue"), countDistinct("o_custkey").as("n_customers"))
          .orderBy("r_name")
      },
      Some(s"""SELECT r_name, ${frs(revenueSql, 2)} AS revenue,
             |  count(DISTINCT o_custkey) AS n_customers
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q11_top_customers_by_nation" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(desc("c_acctbal"), col("c_custkey"))
        Tables.customer(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .select("n_name", "c_custkey", "c_acctbal", "rn")
          .orderBy("n_name", "rn")
      },
      Some("""SELECT n_name, c_custkey, c_acctbal, rn FROM (
             |  SELECT c_custkey, c_nationkey, c_acctbal,
             |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) c
             |JOIN nation ON c.c_nationkey = n_nationkey
             |WHERE rn <= 3 ORDER BY n_name, rn""".stripMargin)),

    "q35b_median_acctbal" -> Q(
      (s, dir) => {
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            fr(median(col("c_acctbal")), 4).as("median_bal"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, count(*) AS n, ${frs("median(c_acctbal)", 4)} AS median_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // correlated-subquery shape: customers above their nation's average
    // balance — decorrelated as a broadcast join against per-nation averages
    "q51_above_avg_customers" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val natAvg = c.groupBy("c_nationkey").agg(avg("c_acctbal").as("nat_avg"))
        c.join(broadcast(natAvg), Seq("c_nationkey"))
          .filter(col("c_acctbal") > col("nat_avg"))
          .select(col("c_custkey"), col("c_acctbal"), fr(col("nat_avg"), 4).as("nat_avg"))
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_acctbal, ${frs("nat_avg", 4)} AS nat_avg FROM (
             |  SELECT c_custkey, c_acctbal,
             |    avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nat_avg
             |  FROM customer)
             |WHERE c_acctbal > nat_avg ORDER BY c_custkey""".stripMargin)),

    // analytic-window bundle: per-customer order sequence with lag deltas,
    // quartiles, percent_rank — the classic OLAP window family in one query,
    // all inside ONE window spec (one shuffle on o_custkey)
    "q58_order_analytics" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir).filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).cast("long").as("rn"),
            fr(col("o_totalprice") - coalesce(lag("o_totalprice", 1).over(w), lit(0.0)), 2).as("price_delta"),
            ntile(4).over(w).cast("long").as("quartile"),
            fr(percent_rank().over(w), 6).as("pr"))
          .orderBy("o_custkey", "rn")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
             |  row_number() OVER w AS rn,
             |  ${frs("o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, CAST(0.0 AS DOUBLE))", 2)} AS price_delta,
             |  ntile(4) OVER w AS quartile,
             |  ${frs("percent_rank() OVER w", 6)} AS pr
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, rn""".stripMargin)),

    // date arithmetic: ship-latency histogram (days between order and ship)
    "q52_ship_latency" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .withColumn("lat_days", datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
          // % (remainder, dividend sign) matches DuckDB's %; pmod would not
          // for negative latencies
          .groupBy((col("lat_days") - (col("lat_days") % 7)).as("lat_week"))
          .agg(count(lit(1)).as("n"), fr(avg("l_quantity"), 4).as("avg_qty"))
          .orderBy("lat_week")
      },
      Some(s"""SELECT lat_days - (lat_days % 7) AS lat_week, count(*) AS n,
             |  ${frs("avg(l_quantity)", 4)} AS avg_qty
             |FROM (SELECT CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS lat_days, l_quantity
             |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q33_setops" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val big  = o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("c_custkey"))
        val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        val low  = o.filter(col("o_totalprice") < 50000).select(col("o_custkey").as("c_custkey"))
        big.union(auto).except(low).orderBy("c_custkey") // except is EXCEPT DISTINCT
      },
      Some("""SELECT c_custkey FROM (
             |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
             |  UNION
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |  EXCEPT
             |  SELECT o_custkey FROM orders WHERE o_totalprice < 50000)
             |ORDER BY 1""".stripMargin)),

    "q34_cube_revenue" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(fr(sum(revenue), 2).as("revenue"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("revenue"), col("n"))
          .orderBy("returnflag", "linestatus")
      },
      Some(s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag, coalesce(l_linestatus,'ALL') AS linestatus,
             |  ${frs(revenueSql, 2)} AS revenue, count(*) AS n
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY 1,2""".stripMargin)),

    // FULL OUTER join with genuinely exclusive rows on BOTH sides (disjoint
    // modulus filters) — the join type q04/q05's semi/anti and the star
    // joins don't cover. Nullable columns ride through the compare (q58's
    // lag nulls are precedent); the key is coalesced explicitly.
    "q73_full_outer" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("ckey"), col("c_acctbal"))
        val o = Tables.orders(s, dir).filter(col("o_custkey") % 5 === 0)
          .groupBy(col("o_custkey").as("okey"))
          .agg(count(lit(1)).as("n_orders"), fr(sum("o_totalprice"), 2).as("order_total"))
        c.join(o, col("ckey") === col("okey"), "full_outer")
          .select(
            coalesce(col("ckey"), col("okey")).as("custkey"),
            when(col("ckey").isNotNull && col("okey").isNotNull, "both")
              .when(col("ckey").isNotNull, "customer_only")
              .otherwise("orders_only").as("side"),
            col("c_acctbal").as("acctbal"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            col("order_total"))
          .orderBy("custkey")
      },
      Some(s"""WITH c AS (
             |  SELECT c_custkey AS ckey, c_acctbal FROM customer WHERE c_custkey % 7 = 0),
             |o AS (
             |  SELECT o_custkey AS okey, count(*) AS n_orders,
             |    ${frs("sum(o_totalprice)", 2)} AS order_total
             |  FROM orders WHERE o_custkey % 5 = 0 GROUP BY 1)
             |SELECT coalesce(ckey, okey) AS custkey,
             |  CASE WHEN ckey IS NOT NULL AND okey IS NOT NULL THEN 'both'
             |       WHEN ckey IS NOT NULL THEN 'customer_only'
             |       ELSE 'orders_only' END AS side,
             |  c_acctbal AS acctbal, coalesce(n_orders, 0) AS n_orders, order_total
             |FROM c FULL JOIN o ON c.ckey = o.okey
             |ORDER BY custkey""".stripMargin)),

    // GROUPING SETS that are neither a rollup prefix chain nor a full cube
    // ((flag,status), (status), ()) — the general form q09/q34 specialize.
    "q74_grouping_sets" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
                Seq(col("l_linestatus")),
                Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(fr(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("sum_qty"), col("n"))
          .orderBy("returnflag", "linestatus")
      },
      Some(s"""SELECT coalesce(l_returnflag,'ALL') AS returnflag, coalesce(l_linestatus,'ALL') AS linestatus,
             |  ${frs("sum(l_quantity)", 2)} AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
             |ORDER BY 1,2""".stripMargin)),

    // Fuzzy name matching (entity resolution): part-name variants within
    // edit distance 3, first-token blocking over the DISTINCT name
    // dictionary — candidates and distances both oracle-checked (both
    // engines implement textbook levenshtein).
    "q80_fuzzy_name_join" -> Q(
      (s, dir) => graft.operators.FuzzyJoin.nameVariants(
        Tables.part(s, dir), "p_name", maxDist = 3),
      Some("""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
             |b AS (SELECT name, string_split(name, ' ')[1] AS blk FROM names)
             |SELECT a.name AS name_a, c.name AS name_b,
             |  CAST(levenshtein(a.name, c.name) AS BIGINT) AS dist
             |FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
             |WHERE levenshtein(a.name, c.name) <= 3
             |ORDER BY 1, 2""".stripMargin)),

    // Column profiling (ingestion data-quality summary): one pass, all
    // per-column aggregates in a single Expand+aggregate, unpivoted to one
    // row per column.
    "q75_profile" -> Q(
      (s, dir) => graft.operators.Profile.profile(
        Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")),
      Some {
        def one(c: String, numeric: Boolean): String = {
          val mn = if (numeric) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val mx = if (numeric) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
             |  $mn AS min_v, $mx AS max_v FROM orders""".stripMargin
        }
        Seq(one("o_orderkey", true), one("o_custkey", true), one("o_totalprice", true),
            one("o_orderstatus", false), one("o_orderpriority", false))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // Two-stage SALTED aggregation — the explicit skew playbook next to
    // Skew.saltedJoin: stage 1 aggregates per (key, salt) so each hot key
    // (3 return flags across all of lineitem — maximal skew) spreads over 16
    // reducers; stage 2 merges 16 slim partials per key. The oracle IS the
    // direct one-stage groupBy, proving the re-association exact (quantities
    // are integral-valued doubles, so partial sums commute bit-exactly).
    "q89_salted_agg" -> Q(
      (s, dir) => {
        val partial = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
          .withColumn("__salt", pmod(col("l_orderkey"), lit(16)))
          .groupBy("l_returnflag", "__salt")
          .agg(count(lit(1)).as("__n"), sum("l_quantity").as("__q"))
        partial.groupBy("l_returnflag")
          .agg(sum("__n").cast("long").as("n_rows"), sum("__q").cast("long").as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Trailing 7-day rolling revenue (RANGE frame on an integer day key, so
    // calendar gaps shrink the frame instead of sliding over 7 rows).
    // Revenue is converted to exact integer cents BEFORE any aggregation —
    // every sum (daily and windowed) is BIGINT arithmetic, immune to
    // partition/frame FP ordering; the only doubles are the final divisions.
    // The day-grain window is a single partition by construction (~2.5k rows
    // at any corpus scale — the daily rollup bounds it, not the data).
    "q117_rolling_revenue" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cents = floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
        val daily = Tables.orders(s, dir)
          .select(col("o_orderdate").cast("date").as("__d"), cents.as("__c"))
          .groupBy(col("__d"))
          .agg(count(lit(1)).as("n_orders"), sum("__c").as("__rev_c"))
          .withColumn("__dn", datediff(col("__d"), lit("1970-01-01").cast("date")))
        val w = Window.orderBy("__dn").rangeBetween(-6, 0)
        daily
          .withColumn("__roll_c", sum("__rev_c").over(w))
          .withColumn("__n7", count(lit(1)).over(w))
          .select(
            date_format(col("__d"), "yyyy-MM-dd").as("order_day"),
            col("n_orders"),
            fr(col("__rev_c").cast("double") / lit(100.0), 2).as("revenue"),
            fr(col("__roll_c").cast("double") / lit(100.0), 2).as("roll7_revenue"),
            col("__n7").as("n_days7"),
            fr(col("__roll_c").cast("double") / (lit(100.0) * col("__n7").cast("double")), 4)
              .as("roll7_avg"))
          .orderBy("order_day")
      },
      Some(s"""WITH d AS (
             |  SELECT CAST(o_orderdate AS DATE) AS d,
             |    CAST(count(*) AS BIGINT) AS n_orders,
             |    CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_c
             |  FROM orders GROUP BY 1),
             |r AS (SELECT d, n_orders, rev_c, date_diff('day', DATE '1970-01-01', d) AS dn FROM d),
             |w AS (
             |  SELECT d, n_orders, rev_c,
             |    CAST(sum(rev_c) OVER win AS BIGINT) AS roll_c,
             |    CAST(count(*) OVER win AS BIGINT) AS n7
             |  FROM r WINDOW win AS (ORDER BY dn RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT strftime(d, '%Y-%m-%d') AS order_day, n_orders,
             |  ${frs("CAST(rev_c AS DOUBLE) / CAST(100.0 AS DOUBLE)", 2)} AS revenue,
             |  ${frs("CAST(roll_c AS DOUBLE) / CAST(100.0 AS DOUBLE)", 2)} AS roll7_revenue,
             |  n7 AS n_days7,
             |  ${frs("CAST(roll_c AS DOUBLE) / (CAST(100.0 AS DOUBLE) * CAST(n7 AS DOUBLE))", 4)} AS roll7_avg
             |FROM w ORDER BY 1""".stripMargin)),

    // Data-quality gate (Deequ/expectations pattern): a constraint suite per
    // table — null/range/set membership, key uniqueness, referential
    // integrity — as one aggregation pass + broadcast anti-joins, reported as
    // machine-checkable rows. Two checks FAIL on purpose and the report
    // shows their exact violation fractions rather than hiding them: the
    // l_discount range (fixture discounts span [0, 0.1]) and the
    // (l_orderkey, l_linenumber) composite key, which the synthetic
    // generator genuinely does not keep unique — a real data finding the
    // gate surfaces.
    // Drift gate: each nation's customer-count delta between two snapshots
    // is z-scored against the cross-nation delta distribution — the
    // "gate on movement, not static thresholds" layer above q137. The next
    // snapshot drops half of nation 13's customers while the other 24
    // nations are unchanged, so exactly that group must flag.
    // Mergeable quantile sketch (fixed-bin histogram): the profile
    // statistic every 100 TB data-quality pass needs, as a monoid — bin
    // counts add across partitions/shards/micro-batches, state ≤ bins
    // rows. Estimates (bin edge + uniform-within-bin interpolation) are
    // deterministic and fully SQL-mirrored; accuracy is AUDITED against
    // the exact rank quantile in q173, not assumed.
    "q171_quantile_sketch" -> Q(
      (s, dir) => graft.operators.Sketches.histogramQuantiles(
        Tables.lineitem(s, dir), "l_extendedprice",
        lo = 0.0, hi = 110000.0, bins = 220, qs = Seq(0.5, 0.9, 0.99)),
      Some(graft.operators.Sketches.histogramQuantilesSql(
        "lineitem", "l_extendedprice", lo = 0.0, hi = 110000.0, bins = 220,
        qs = Seq(0.5, 0.9, 0.99)))),

    // The same sketch THROUGH THE STREAMING ENGINE: bin counts are
    // additive, so the complete-mode streaming aggregation reaches the
    // batch histogram exactly whatever the micro-batching — q171's oracle
    // verbatim proves stream ≡ batch (the q126 HLL argument, for
    // quantiles).
    "q172_stream_quantile" -> Q(
      (s, dir) => graft.streaming.StreamingSketch.histQuantiles(
        s, dir, "lineitem.parquet", "l_extendedprice",
        lo = 0.0, hi = 110000.0, bins = 220, qs = Seq(0.5, 0.9, 0.99)),
      Some(graft.operators.Sketches.histogramQuantilesSql(
        "lineitem", "l_extendedprice", lo = 0.0, hi = 110000.0, bins = 220,
        qs = Seq(0.5, 0.9, 0.99)))),

    // Per-group quantile profile: one histogram per l_returnflag (the
    // per-domain/per-source percentile column of a profiling pass) —
    // state ≤ groups·bins rows, one shuffle, same deterministic finish.
    "q174_group_quantiles" -> Q(
      (s, dir) => graft.operators.Sketches.groupedHistogramQuantiles(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice",
        lo = 0.0, hi = 110000.0, bins = 220, qs = Seq(0.5, 0.9, 0.99)),
      Some(graft.operators.Sketches.groupedHistogramQuantilesSql(
        "lineitem", "l_returnflag", "l_extendedprice",
        lo = 0.0, hi = 110000.0, bins = 220, qs = Seq(0.5, 0.9, 0.99)))),

    // Accuracy audit: sketch estimate vs the EXACT rank quantile (min v
    // with cumulative count ≥ ⌈q·n⌉ — pure comparisons, no interpolation
    // ambiguity between engines). The target-rank value lies inside the
    // sketch's hit bin by construction, so |est − exact| < bin width —
    // within_bin pins that invariant as data, abs_err reports the real
    // distance. (The exact side's cumsum runs over DISTINCT values via the
    // two-pass range-partitioned prefix scan — see Scan.cumSums below.)
    "q173_quantile_audit" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (lo, hi, bins) = (0.0, 110000.0, 220)
        val binW = (hi - lo) / bins
        val qs = Seq(0.5, 0.9, 0.99)
        val li = Tables.lineitem(s, dir)
        val est = graft.operators.Sketches.histogramQuantiles(
          li, "l_extendedprice", lo, hi, bins, qs)
        import s.implicits._
        val vals = li.groupBy(col("l_extendedprice").as("v")).agg(count(lit(1)).as("vn"))
        // exact ground truth over the DISTINCT-VALUE relation — data-sized,
        // so the running count comes from the two-pass range-partitioned
        // prefix scan, not a single-partition window (the ksGate rule)
        val cum = graft.operators.Scan.cumSums(vals, Seq("v"), Seq("vn"), parts = 32)
          .withColumnRenamed("cum_vn", "cum")
        val total = vals.agg(sum("vn").as("total"))
        val exact = qs.toDF("q").crossJoin(broadcast(total))
          .withColumn("target", ceil(col("q") * col("total")).cast("long"))
          .join(cum, col("cum") >= col("target"))
          .groupBy("q").agg(min("v").as("exact_q"))
        est.join(exact, Seq("q"))
          .select(col("q"), col("est"), col("exact_q"),
            fr(abs(col("est") - col("exact_q")), 4).as("abs_err"),
            (abs(col("est") - col("exact_q")) <= binW).cast("long").as("within_bin"))
          .orderBy("q")
      },
      Some {
        val (lo, hi, bins) = (0.0, 110000.0, 220)
        val binW = (hi - lo) / bins
        s"""WITH ${graft.operators.Sketches.histogramQuantileCtes(
              "lineitem", "l_extendedprice", lo, hi, bins, Seq(0.5, 0.9, 0.99))},
           |vals AS (
           |  SELECT l_extendedprice AS v, CAST(count(*) AS BIGINT) AS vn
           |  FROM lineitem GROUP BY 1),
           |vcum AS (
           |  SELECT v, vn,
           |    CAST(sum(vn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM vals),
           |vt AS (SELECT CAST(sum(vn) AS BIGINT) AS total FROM vals),
           |ex AS (
           |  SELECT q, min(v) AS exact_q FROM (
           |    SELECT qq.q, CAST(ceil(qq.q * vt.total) AS BIGINT) AS target, vc.v, vc.cum
           |    FROM (SELECT unnest(ARRAY[CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q) qq
           |    CROSS JOIN vt JOIN vcum vc ON vc.cum >= CAST(ceil(qq.q * vt.total) AS BIGINT))
           |  GROUP BY q)
           |SELECT e.q, e.est, ex.exact_q,
           |  ${frs("abs(e.est - ex.exact_q)", 4)} AS abs_err,
           |  CAST(abs(e.est - ex.exact_q) <= CAST($binW AS DOUBLE) AS BIGINT) AS within_bin
           |FROM qest e JOIN ex ON ex.q = e.q
           |ORDER BY e.q""".stripMargin
      }),

    // DISTRIBUTION drift via PSI over the quantile sketch's bin grid — the
    // orthogonal axis to q150's count gate: dropping every negative
    // balance SHIFTS the value distribution and must flag (psi ≈ 0.49),
    // while halving the table on custkey parity keeps the distribution and
    // must NOT (psi ≈ 0.01) even though it moves far more rows — PSI is
    // count-invariant where the z-gate is distribution-blind.
    "q175_psi_gate" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        def withMetric(df: org.apache.spark.sql.DataFrame, m: String) =
          df.withColumn("metric", lit(m))
            .select("metric", "psi", "n_prev", "n_next", "is_drift")
        withMetric(graft.operators.Validate.psiGate(
            c, c.filter(col("c_acctbal") >= 0), "c_acctbal",
            lo = -1000.0, hi = 10000.0, bins = 20), "drop_negative_balances")
          .unionByName(withMetric(graft.operators.Validate.psiGate(
            c, c.filter(col("c_custkey") % 2 === 0), "c_acctbal",
            lo = -1000.0, hi = 10000.0, bins = 20), "random_half"))
          .orderBy("metric")
      },
      Some {
        def one(nextWhere: String, label: String) =
          graft.operators.Validate.psiGateSql(
            "SELECT c_acctbal FROM customer",
            s"SELECT c_acctbal FROM customer WHERE $nextWhere",
            "c_acctbal", lo = -1000.0, hi = 10000.0, bins = 20)
            .replaceFirst("(?s)^WITH ", "")
        s"""SELECT metric, psi, n_prev, n_next, is_drift FROM (
           |  SELECT 'drop_negative_balances' AS metric, * FROM (
           |    WITH ${one("c_acctbal >= 0", "a")} )
           |  UNION ALL
           |  SELECT 'random_half', * FROM (
           |    WITH ${one("c_custkey % 2 = 0", "b")} ))
           |ORDER BY metric""".stripMargin
      }),

    // The PSI gate MID-INGEST: the next snapshot's bin counts fold through
    // the engine's complete-mode aggregation (the q172 monoid argument) and
    // gate against the static baseline via the identical psiGateFromCounts
    // arithmetic — q175's shifted-metric oracle verbatim proves stream ≡
    // batch for the distribution axis.
    "q176_stream_psi_gate" -> Q(
      (s, dir) => graft.streaming.StreamingDrift.psiGate(
        s, dir, "c_acctbal", nextFilter = "c_acctbal >= 0",
        lo = -1000.0, hi = 10000.0, bins = 20),
      Some(graft.operators.Validate.psiGateSql(
        "SELECT c_acctbal FROM customer",
        "SELECT c_acctbal FROM customer WHERE c_acctbal >= 0",
        "c_acctbal", lo = -1000.0, hi = 10000.0, bins = 20))),

    // PER-GROUP PSI (verdict r10 task 7): the distribution gate a
    // multi-source ingest deploys — one PSI per nation over that nation's
    // own balance histogram. The next snapshot drops nation 13's negative
    // balances ONLY, so nation 13 flags on the distribution axis while its
    // row count barely moves and every other nation reads psi = 0.
    "q179_grouped_psi_gate" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val next = c.filter(!(col("c_nationkey") === 13 && col("c_acctbal") < 0))
        graft.operators.Validate.groupedPsiGate(c, next, "c_nationkey",
            "c_acctbal", lo = -1000.0, hi = 10000.0, bins = 20)
          .orderBy("c_nationkey")
      },
      Some(groupedPsiOracle)),

    // The same keyed gate MID-INGEST: the next snapshot streams, (nation,
    // bin) counts fold through complete-mode engine state (≤ groups·bins
    // rows), and the keyed PSI finish runs the identical arithmetic —
    // q179's oracle verbatim proves stream ≡ batch for the grouped
    // distribution axis (completing the gate matrix's last cell).
    "q180_stream_grouped_psi" -> Q(
      (s, dir) => graft.streaming.StreamingDrift.groupedPsiGate(
          s, dir, "c_nationkey", "c_acctbal",
          nextFilter = "NOT (c_nationkey = 13 AND c_acctbal < 0)",
          lo = -1000.0, hi = 10000.0, bins = 20)
        .orderBy("c_nationkey"),
      Some(groupedPsiOracle)),

    // KOLMOGOROV–SMIRNOV drift — the BIN-FREE third axis of the gate
    // matrix (count z-gate / binned PSI / sup-norm CDF): exact D over every
    // distinct value, running CDFs from the two-pass range-partitioned
    // prefix scan (Scan.cumSums — no single-partition window on a
    // data-sized relation). Same scenario pair as q175 so the axes are
    // directly comparable: dropping negative balances moves 8% of CDF mass
    // (D = 0.0813, flags at 0.05) while halving on custkey parity — a far
    // larger ROW change — reads D = 0.0167 and must not flag.
    "q187_ks_gate" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        def withMetric(df: org.apache.spark.sql.DataFrame, m: String) =
          df.withColumn("metric", lit(m))
            .select("metric", "ks", "n_prev", "n_next", "is_drift")
        withMetric(graft.operators.Validate.ksGate(
            c, c.filter(col("c_acctbal") >= 0), "c_acctbal",
            threshold = 0.05), "drop_negative_balances")
          .unionByName(withMetric(graft.operators.Validate.ksGate(
            c, c.filter(col("c_custkey") % 2 === 0), "c_acctbal",
            threshold = 0.05), "random_half"))
          .orderBy("metric")
      },
      Some {
        def one(nextWhere: String) =
          graft.operators.Validate.ksGateSql(
            "SELECT c_acctbal FROM customer",
            s"SELECT c_acctbal FROM customer WHERE $nextWhere",
            "c_acctbal", threshold = 0.05)
            .replaceFirst("(?s)^WITH ", "")
        s"""SELECT metric, ks, n_prev, n_next, is_drift FROM (
           |  SELECT 'drop_negative_balances' AS metric, * FROM (
           |    WITH ${one("c_acctbal >= 0")} )
           |  UNION ALL
           |  SELECT 'random_half', * FROM (
           |    WITH ${one("c_custkey % 2 = 0")} ))
           |ORDER BY metric""".stripMargin
      }),

    // The KS gate MID-INGEST: the next snapshot's bin counts fold through
    // complete-mode engine state (the q176 monoid) and the BINNED KS runs
    // against the static baseline — the batch binned SQL is the oracle, so
    // stream ≡ batch is the checked claim. Binned D under-estimates exact D
    // (sup over grid points only): 20 bins read 0.0802 for the 0.0813 shift
    // — still >> the 0.05 threshold, which is the resolution statement a
    // deployed grid must satisfy.
    "q188_stream_ks_gate" -> Q(
      (s, dir) => graft.streaming.StreamingDrift.ksGate(
        s, dir, "c_acctbal", nextFilter = "c_acctbal >= 0",
        lo = -1000.0, hi = 10000.0, bins = 20, threshold = 0.05),
      Some(graft.operators.Validate.ksBinnedSql(
        "SELECT c_acctbal FROM customer",
        "SELECT c_acctbal FROM customer WHERE c_acctbal >= 0",
        "c_acctbal", lo = -1000.0, hi = 10000.0, bins = 20,
        threshold = 0.05))),

    // The EXACT KS gate MID-INGEST (r11 verdict task 5) — q188 streamed the
    // BINNED trade; this streams the bin-free exact form: per-distinct-value
    // counts fold through complete-mode state (bounded by the value DOMAIN
    // — ≤ 1.1M keys for a fixed-point currency column at ANY ingest volume;
    // StreamingDrift.ksGateExact documents when the binned form stays the
    // right trade), and the exact sup-norm D finishes over the drained
    // count table via the same two-pass prefix scan as the batch gate. The
    // oracle is q187's EXACT-batch SQL builder on the same scenario,
    // verbatim — stream ≡ exact batch, D = 0.0813 (vs binned 0.0802).
    "q198_stream_ks_exact" -> Q(
      (s, dir) => graft.streaming.StreamingDrift.ksGateExact(
        s, dir, "c_acctbal", nextFilter = "c_acctbal >= 0", threshold = 0.05),
      Some(graft.operators.Validate.ksGateSql(
        "SELECT c_acctbal FROM customer",
        "SELECT c_acctbal FROM customer WHERE c_acctbal >= 0",
        "c_acctbal", threshold = 0.05))),

    // Per-GROUP binned KS — the last cell of the gate matrix's KS row
    // (exact batch q187 / streamed binned q188 / grouped here): one D per
    // nation over that nation's own binned balance CDFs. Nation 13 drops
    // its negative balances only, so it alone crosses 0.05 while every
    // other nation reads D = 0 — the per-source read the grouped PSI
    // (q179) gives on the mass axis, here on the sup-norm axis.
    "q193_grouped_ks_gate" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val next = c.filter(!(col("c_nationkey") === 13 && col("c_acctbal") < 0))
        graft.operators.Validate.groupedKsGate(c, next, "c_nationkey",
            "c_acctbal", lo = -1000.0, hi = 10000.0, bins = 20, threshold = 0.05)
          .orderBy("c_nationkey")
      },
      Some(graft.operators.Validate.groupedKsGateSql(
        "customer", "c_nationkey", "c_acctbal",
        nextWhere = "NOT (c_nationkey = 13 AND c_acctbal < 0)",
        lo = -1000.0, hi = 10000.0, bins = 20, threshold = 0.05))),

    // The grouped EXACT KS — the last open cell of the KS row on the exact
    // axis (exact batch q187 / exact stream q198 / grouped BINNED q193):
    // one bin-free D per nation over that nation's own distinct-value CDF
    // pair, running counts from a window PARTITIONED BY GROUP (partition
    // size bounded by the value DOMAIN within the group — the q198 state
    // argument — never by rows). Same scenario as q193 for a direct
    // resolution comparison: exact D ≥ binned D always; on THIS shift the
    // 20-bin grid already attains the sup (drop-negatives makes the CDF
    // gap flat across the critical region), so both read nation 13 at
    // D = 0.0896 at sf0.01 — the exact form's value is the guarantee the
    // grid only sometimes earns. Only nation 13 flags on either axis.
    "q202_grouped_ks_exact" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val next = c.filter(!(col("c_nationkey") === 13 && col("c_acctbal") < 0))
        graft.operators.Validate.groupedKsGateExact(c, next, "c_nationkey",
          "c_acctbal", threshold = 0.05)
      },
      Some(graft.operators.Validate.groupedKsGateExactSql(
        "customer", "c_nationkey", "c_acctbal",
        nextWhere = "NOT (c_nationkey = 13 AND c_acctbal < 0)",
        threshold = 0.05))),

    "q150_drift_gate" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val next = c.filter(!(col("c_nationkey") === 13 && col("c_custkey") % 2 === 0))
        graft.operators.Validate.driftGate(c, next, "c_nationkey", zMax = 3.0)
      },
      Some(driftGateOracle)),

    // The same drift gate MID-INGEST: the next snapshot arrives as a
    // structured stream, per-batch group counts fold into keyed monoid
    // state (the q142 pattern), and the z-gate runs over the folded profile
    // via the identical driftGateFromCounts arithmetic — q150's oracle SQL
    // verbatim proves stream ≡ batch.
    "q152_stream_drift_gate" -> Q(
      (s, dir) => graft.streaming.StreamingDrift.nationDriftGate(s, dir, zMax = 3.0),
      Some(driftGateOracle)),

    // The streaming gate on an UNBOUNDED group key: per-batch deltas MERGE
    // into a parquet-backed key-partitioned state table (staged swap,
    // batchId-in-table idempotence) instead of a driver-held map — the
    // production shape when the group key is per-domain/per-host. Scenario
    // mirrors q150 on 64 c_custkey buckets: half of bucket 7 vanishes from
    // the streamed next snapshot, so exactly that bucket must flag.
    "q162_stream_keyed_drift" -> Q(
      (s, dir) => graft.streaming.StreamingDrift.keyedDriftGate(s, dir, zMax = 3.0, buckets = 64),
      Some(keyedDriftOracle)),

    // The orthogonal drift axis: each nation's LATEST delta gated against
    // that nation's OWN history (Deequ's anomaly-detection-on-metric-series
    // pattern) over a 5-snapshot growth series. Every nation grows ~20% per
    // snapshot; the final snapshot drops a third of nation 7 — only a
    // history-aware gate sees that as abnormal FOR THAT NATION.
    "q153_drift_history_gate" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val snaps = (0 until 4).map(i => c.filter(col("c_custkey") % 20 < 4 * (i + 1))) :+
          c.filter(!(col("c_nationkey") === 7 && col("c_custkey") % 3 === 0))
        graft.operators.Validate.driftHistoryGate(snaps, "c_nationkey", zMax = 3.0)
      },
      Some {
        val zCase =
          s"""CASE WHEN kh > 1 AND CAST(kh*s2 - s1*s1 AS DOUBLE) > 0 THEN
             |    ${frs("CAST(last_delta*kh - s1 AS DOUBLE) / (CAST(kh AS DOUBLE) * sqrt(CAST(kh*s2 - s1*s1 AS DOUBLE) / CAST(kh*(kh-1) AS DOUBLE)))", 4)}
             |  END""".stripMargin
        val snapCtes = (0 until 4).map(i =>
          s"""c$i AS (
             |  SELECT c_nationkey AS g, CAST(count(*) AS BIGINT) AS n, $i AS i
             |  FROM customer WHERE c_custkey % 20 < ${4 * (i + 1)} GROUP BY 1)""").mkString(",\n") +
          s""",
             |c4 AS (
             |  SELECT c_nationkey AS g, CAST(count(*) AS BIGINT) AS n, 4 AS i
             |  FROM customer WHERE NOT (c_nationkey = 7 AND c_custkey % 3 = 0) GROUP BY 1)"""
        s"""WITH $snapCtes,
           |cs AS (SELECT * FROM c0 UNION ALL SELECT * FROM c1 UNION ALL SELECT * FROM c2
           |       UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4),
           |grid AS (
           |  SELECT g, CAST(t.i AS INTEGER) AS i
           |  FROM (SELECT DISTINCT g FROM cs), UNNEST(range(0, 5)) AS t(i)),
           |dense AS (
           |  SELECT grid.g, grid.i, coalesce(cs.n, 0) AS n
           |  FROM grid LEFT JOIN cs ON cs.g = grid.g AND cs.i = grid.i),
           |d AS (
           |  SELECT * FROM (
           |    SELECT g, i, n, n - lag(n) OVER (PARTITION BY g ORDER BY i) AS d
           |    FROM dense) WHERE i >= 1),
           |hist AS (
           |  SELECT g, CAST(count(*) AS BIGINT) AS kh, CAST(sum(d) AS BIGINT) AS s1,
           |    CAST(sum(d*d) AS BIGINT) AS s2
           |  FROM d WHERE i <= 3 GROUP BY g),
           |lastd AS (SELECT g, n AS latest_n, d AS last_delta FROM d WHERE i = 4),
           |r AS (
           |  SELECT l.g, latest_n, last_delta, $zCase AS z
           |  FROM lastd l JOIN hist h ON h.g = l.g)
           |SELECT g AS c_nationkey, latest_n, last_delta, z,
           |  coalesce(CAST(abs(z) > CAST(3.0 AS DOUBLE) AS BIGINT), 0) AS is_drift
           |FROM r ORDER BY c_nationkey""".stripMargin
      }),

    "q137_data_quality" -> Q(
      (s, dir) => {
        import graft.operators.Validate._
        val li = Tables.lineitem(s, dir)
        val o  = Tables.orders(s, dir)
        val c  = Tables.customer(s, dir)
        validate("lineitem", li,
          rowChecks = Seq(
            NotNull("l_shipdate"),
            InRange("l_quantity", 1, 50),
            InRange("l_discount", 0, 0.05)),
          uniques = Seq(UniqueKey(Seq("l_orderkey", "l_linenumber"))),
          fks = Seq(ForeignKey("l_orderkey", o, "o_orderkey")))
          .unionByName(validate("orders", o,
            rowChecks = Seq(InSet("o_orderstatus", Seq("F", "O", "P"))),
            uniques = Seq(UniqueKey(Seq("o_orderkey"))),
            fks = Seq(ForeignKey("o_custkey", c, "c_custkey"))))
          .orderBy("check")
      },
      Some {
        def checkSql(name: String, viol: String, total: String, threshold: Double): String = {
          val frac = frs(s"CAST(($viol) AS DOUBLE) / CAST(($total) AS DOUBLE)", 6)
          s"""SELECT '$name' AS "check", CAST(($viol) AS BIGINT) AS violations,
             |  CAST(($total) AS BIGINT) AS total, $frac AS viol_frac,
             |  CAST($threshold AS DOUBLE) AS threshold,
             |  CAST(CASE WHEN $frac <= CAST($threshold AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT) AS pass"""
        }
        val nLi = "SELECT count(*) FROM lineitem"
        val nO  = "SELECT count(*) FROM orders"
        Seq(
          checkSql("lineitem/not_null:l_shipdate",
            "SELECT sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) FROM lineitem", nLi, 0.0),
          checkSql("lineitem/range:l_quantity",
            "SELECT sum(CASE WHEN l_quantity IS NULL OR l_quantity < CAST(1.0 AS DOUBLE) OR l_quantity > CAST(50.0 AS DOUBLE) THEN 1 ELSE 0 END) FROM lineitem", nLi, 0.0),
          checkSql("lineitem/range:l_discount",
            "SELECT sum(CASE WHEN l_discount IS NULL OR l_discount < CAST(0.0 AS DOUBLE) OR l_discount > CAST(0.05 AS DOUBLE) THEN 1 ELSE 0 END) FROM lineitem", nLi, 0.0),
          checkSql("lineitem/unique:l_orderkey+l_linenumber",
            s"($nLi) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))", nLi, 0.0),
          checkSql("lineitem/fk:l_orderkey->o_orderkey",
            "SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)", nLi, 0.0),
          checkSql("orders/set:o_orderstatus",
            "SELECT sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) FROM orders", nO, 0.0),
          checkSql("orders/unique:o_orderkey",
            s"($nO) - (SELECT count(DISTINCT o_orderkey) FROM orders)", nO, 0.0),
          checkSql("orders/fk:o_custkey->c_custkey",
            "SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)", nO, 0.0),
        ).mkString("", "\nUNION ALL\n", "\nORDER BY \"check\"").stripMargin
      }),

    // Snapshot diff: reconstruct the CDC changelog from two full snapshots
    // (inverse of q129's changelog→snapshot). prev/next are deterministic
    // slices of orders — %7/%3 membership makes inserts and deletes, a
    // doubled o_totalprice on %5 keys makes single-column updates.
    "q138_snapshot_diff" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val prev = o.filter(col("o_orderkey") % 7 =!= 0)
        val next = o.filter(col("o_orderkey") % 3 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") * lit(2.0))
              .otherwise(col("o_totalprice")))
        graft.operators.Diff.snapshotDiff(prev, next, Seq("o_orderkey"))
          // q147 covers the applyable old/new value maps; this entry pins
          // the classification + changed-column routing
          .select("o_orderkey", "change_type", "changed_cols")
      },
      Some {
        val valCols = Seq("o_custkey", "o_orderdate", "o_orderpriority",
          "o_orderstatus", "o_totalprice") // sorted, mirrors snapshotDiff
        val changed = valCols.map(c =>
          s"CASE WHEN p.$c IS DISTINCT FROM n.$c THEN '$c' END").mkString(", ")
        s"""WITH prev AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
           |next AS (
           |  SELECT * REPLACE (
           |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(2.0 AS DOUBLE)
           |         ELSE o_totalprice END AS o_totalprice)
           |  FROM orders WHERE o_orderkey % 3 <> 0)
           |SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
           |  CASE WHEN p.o_orderkey IS NULL THEN 'insert'
           |       WHEN n.o_orderkey IS NULL THEN 'delete'
           |       ELSE 'update' END AS change_type,
           |  CASE WHEN p.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
           |       ELSE array_to_string(list_filter([$changed], x -> x IS NOT NULL), ',')
           |       END AS changed_cols
           |FROM prev p FULL OUTER JOIN next n ON p.o_orderkey = n.o_orderkey
           |WHERE p.o_orderkey IS NULL OR n.o_orderkey IS NULL
           |   OR array_to_string(list_filter([$changed], x -> x IS NOT NULL), ',') <> ''
           |ORDER BY o_orderkey""".stripMargin
      }),

    // Incremental aggregate maintenance: the materialized per-priority order
    // stats are built from an 80% "historical" slice, then two delta batches
    // fold in — and the result must equal the from-scratch full recompute
    // BIT EXACTLY (money summed as integer cents: order-independent), which
    // is precisely what the oracle computes.
    "q139_incremental_agg" -> Q(
      (s, dir) => {
        import graft.operators.Incremental
        val o = Tables.orders(s, dir)
          .withColumn("cents",
            floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
        val hist   = o.filter(col("o_orderkey") % 10 < 8)
        val delta1 = o.filter(col("o_orderkey") % 10 === 8)
        val delta2 = o.filter(col("o_orderkey") % 10 === 9)
        val state = Incremental.aggState(hist, Seq("o_orderpriority"), Seq("cents"))
        val updated = Incremental.applyDelta(
          Incremental.applyDelta(state, delta1, Seq("o_orderpriority"), Seq("cents")),
          delta2, Seq("o_orderpriority"), Seq("cents"))
        updated.select(col("o_orderpriority"), col("n"),
            fr(col("sum_cents").cast("double") / lit(100.0), 2).as("total"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  ${frs("CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) / CAST(100.0 AS DOUBLE)", 2)} AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Weighted PageRank with dangling-mass redistribution over a directed
    // weighted graph derived from customer: src = nation (0..24), dst =
    // custkey mod 40 (0..39), weight = pair count. dst nodes 25..39 have
    // in-edges but NO out-edges — genuinely dangling — which is exactly the
    // case the symmetrized-only q144/q145 pageRank refuses (its out-degree
    // guard); here their mass is redistributed uniformly each iteration.
    "q146_pagerank_weighted" -> Q(
      (s, dir) => {
        val edges = Tables.customer(s, dir)
          .groupBy(col("c_nationkey").cast("long").as("src"),
                   (col("c_custkey") % 40).cast("long").as("dst"))
          .agg(count(lit(1)).cast("double").as("w"))
        graft.operators.Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 3)
      },
      Some(s"""WITH edges AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS src,
             |         CAST(c_custkey % 40 AS BIGINT) AS dst,
             |         CAST(count(*) AS DOUBLE) AS w
             |  FROM customer GROUP BY 1, 2),
             |${weightedPrCtes(3)}
             |SELECT id, ${frs("r", 6)} AS pr FROM r3 ORDER BY id""".stripMargin)),

    // Applyable snapshot diff: the changelog now carries old/new VALUES per
    // changed column (full row for inserts/deletes), so a consumer can
    // replay it without the source snapshots. Money is diffed as integer
    // cents: BIGINT→string serialization is engine-identical, double
    // formatting is not. The maps are serialized sorted-by-key for the
    // hash compare; q148 then proves the replay reproduces `next` exactly.
    "q147_diff_applyable" -> Q(
      (s, dir) => {
        val (prev, next) = diffCentsSnapshots(s, dir)
        val d = graft.operators.Diff.snapshotDiff(prev, next, Seq("o_orderkey"))
        def ser(m: String) = array_join(
          transform(array_sort(map_keys(col(m))),
            k => concat(k, lit("="), try_element_at(col(m), k))), ";")
        d.select(col("o_orderkey"), col("change_type"), col("changed_cols"),
          ser("old_vals").as("old_s"), ser("new_vals").as("new_s"))
      },
      Some(diffApplyableOracle)),

    // ...and the round-trip: applying the diff onto `prev` must reproduce
    // `next` EXACTLY — the oracle is simply `next` itself. This is the
    // end-to-end applyability proof at fixture scale (PropertySpec pins it
    // on adversarial small cases: NULL transitions, NULL-valued updates).
    "q148_diff_roundtrip" -> Q(
      (s, dir) => {
        val (prev, next) = diffCentsSnapshots(s, dir)
        val d = graft.operators.Diff.snapshotDiff(prev, next, Seq("o_orderkey"))
        graft.operators.Diff.applyDiff(prev, d, Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some(s"""$diffSnapshotCtes
             |SELECT * FROM next ORDER BY o_orderkey""".stripMargin)),
  )

  /** DuckDB mirror of the nation drift gate — the oracle of BOTH q150
    * (batch two-snapshot) and q152 (streamed next snapshot): one SQL, two
    * execution topologies. z uses the exact-integer moment sums of q108.
    */
  /** Shared z-gate arithmetic over any prev/next count CTE pair — `p(g,
    * prev_n)` and `nx(g, next_n)` supplied by the caller, output group
    * column named `gOut`. q150/q152 (nation key) and q162 (custkey buckets)
    * differ only in those three slots.
    */
  private def driftCountsOracle(pCte: String, nxCte: String, gOut: String): String = {
    val zCase =
      s"""CASE WHEN k > 1 AND CAST(k*s2 - s1*s1 AS DOUBLE) > 0 THEN
         |    ${frs("CAST(delta*k - s1 AS DOUBLE) / (CAST(k AS DOUBLE) * sqrt(CAST(k*s2 - s1*s1 AS DOUBLE) / CAST(k*(k-1) AS DOUBLE)))", 4)}
         |  END""".stripMargin
    s"""WITH p AS ($pCte),
       |nx AS ($nxCte),
       |d AS (
       |  SELECT coalesce(p.g, nx.g) AS g,
       |    coalesce(prev_n, 0) AS prev_n, coalesce(next_n, 0) AS next_n,
       |    coalesce(next_n, 0) - coalesce(prev_n, 0) AS delta
       |  FROM p FULL OUTER JOIN nx ON p.g = nx.g),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(delta) AS BIGINT) AS s1,
       |    CAST(sum(delta*delta) AS BIGINT) AS s2 FROM d),
       |r AS (
       |  SELECT g, prev_n, next_n, delta, $zCase AS z
       |  FROM d CROSS JOIN s)
       |SELECT g AS $gOut, prev_n, next_n, delta, z,
       |  coalesce(CAST(abs(z) > CAST(3.0 AS DOUBLE) AS BIGINT), 0) AS is_drift
       |FROM r ORDER BY $gOut""".stripMargin
  }

  /** One oracle for q179 (batch) and q180 (stream) — stream ≡ batch. */
  private lazy val groupedPsiOracle: String =
    graft.operators.Validate.groupedPsiGateSql(
      "customer", "c_nationkey", "c_acctbal",
      nextWhere = "NOT (c_nationkey = 13 AND c_acctbal < 0)",
      lo = -1000.0, hi = 10000.0, bins = 20)

  private lazy val driftGateOracle: String = driftCountsOracle(
    """
      |  SELECT c_nationkey AS g, CAST(count(*) AS BIGINT) AS prev_n
      |  FROM customer GROUP BY 1""".stripMargin,
    """
      |  SELECT c_nationkey AS g, CAST(count(*) AS BIGINT) AS next_n
      |  FROM customer WHERE NOT (c_nationkey = 13 AND c_custkey % 2 = 0)
      |  GROUP BY 1""".stripMargin,
    gOut = "c_nationkey")

  private lazy val keyedDriftOracle: String = driftCountsOracle(
    """
      |  SELECT c_custkey % 64 AS g, CAST(count(*) AS BIGINT) AS prev_n
      |  FROM customer GROUP BY 1""".stripMargin,
    """
      |  SELECT c_custkey % 64 AS g, CAST(count(*) AS BIGINT) AS next_n
      |  FROM customer WHERE c_custkey % 128 <> 7
      |  GROUP BY 1""".stripMargin,
    gOut = "g")

  /** Shared prev/next snapshot pair for q147/q148: orders with money as
    * integer cents, ~1/3 deleted, ~1/7 inserted, two update channels
    * (cents doubled on mod-5, status rewritten on mod-11).
    */
  private def diffCentsSnapshots(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_orderdate"),
      floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
    val prev = o.filter(col("o_orderkey") % 7 =!= 0)
    val next = o.filter(col("o_orderkey") % 3 =!= 0)
      .withColumn("cents",
        when(col("o_orderkey") % 5 === 0, col("cents") * 2).otherwise(col("cents")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("X")).otherwise(col("o_orderstatus")))
    (prev, next)
  }

  private val diffSnapshotCtes: String =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
       |    CAST(floor(o_totalprice * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
       |  FROM orders),
       |prev AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
       |next AS (
       |  SELECT o_orderkey, o_custkey,
       |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       |    o_orderdate,
       |    CASE WHEN o_orderkey % 5 = 0 THEN cents * 2 ELSE cents END AS cents
       |  FROM base WHERE o_orderkey % 3 <> 0)""".stripMargin

  /** DuckDB mirror of q147: per-column 'name=value' fragments assembled in
    * sorted-key order — identical bytes to Spark's serialized sorted map.
    */
  private val diffApplyableOracle: String = {
    val valCols = Seq("cents", "o_custkey", "o_orderdate", "o_orderstatus") // sorted
    def v(side: String, c: String) = s"'$c=' || CAST($side.$c AS VARCHAR)"
    val changedNames = valCols.map(c =>
      s"CASE WHEN p.$c IS DISTINCT FROM n.$c THEN '$c' END").mkString(", ")
    def changedSer(side: String) = valCols.map(c =>
      s"CASE WHEN p.$c IS DISTINCT FROM n.$c THEN ${v(side, c)} END").mkString(", ")
    // per-column fragments + list_filter (NOT `||` chaining): a NULL value
    // must DROP its fragment — matching Spark's array_join-over-null-entries
    // — not null the entire serialized row (ADVICE r9)
    def allSer(side: String) =
      s"array_to_string(list_filter([${valCols.map(v(side, _)).mkString(", ")}], x -> x IS NOT NULL), ';')"
    val changedCols = s"array_to_string(list_filter([$changedNames], x -> x IS NOT NULL), ',')"
    s"""$diffSnapshotCtes
       |SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
       |  CASE WHEN p.o_orderkey IS NULL THEN 'insert'
       |       WHEN n.o_orderkey IS NULL THEN 'delete'
       |       ELSE 'update' END AS change_type,
       |  CASE WHEN p.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
       |       ELSE $changedCols END AS changed_cols,
       |  CASE WHEN p.o_orderkey IS NULL THEN ''
       |       WHEN n.o_orderkey IS NULL THEN ${allSer("p")}
       |       ELSE array_to_string(list_filter([${changedSer("p")}], x -> x IS NOT NULL), ';')
       |       END AS old_s,
       |  CASE WHEN n.o_orderkey IS NULL THEN ''
       |       WHEN p.o_orderkey IS NULL THEN ${allSer("n")}
       |       ELSE array_to_string(list_filter([${changedSer("n")}], x -> x IS NOT NULL), ';')
       |       END AS new_s
       |FROM prev p FULL OUTER JOIN next n ON p.o_orderkey = n.o_orderkey
       |WHERE p.o_orderkey IS NULL OR n.o_orderkey IS NULL OR $changedCols <> ''
       |ORDER BY o_orderkey""".stripMargin
  }

  /** Weighted-PageRank CTE chain over an `edges(src, dst, w)` CTE defined
    * upstream: full node set (src ∪ dst), weighted out-degree, uniform r0,
    * then `iters` unrolled power iterations each with a dangling-mass
    * aggregate — mirrors [[graft.operators.Graph.pageRankWeighted]]
    * (damping 0.85, teleport 0.15) arithmetic-op-for-arithmetic-op so the
    * doubles agree cross-engine before the final floor-round.
    */
  private def weightedPrCtes(iters: Int): String = {
    val stages = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id, sum(r.r * e.w / d.wd) AS c
         |  FROM edges e JOIN r${i - 1} r ON r.id = e.src
         |               JOIN wdeg d ON d.id = e.src
         |  GROUP BY 1),
         |d$i AS (
         |  SELECT coalesce(sum(r.r), CAST(0 AS DOUBLE)) AS dm
         |  FROM r${i - 1} r LEFT JOIN wdeg d ON d.id = r.id
         |  WHERE d.id IS NULL),
         |r$i AS (
         |  SELECT p.id,
         |    CAST(0.15 AS DOUBLE) / nn.n
         |      + CAST(0.85 AS DOUBLE)
         |        * (coalesce(c.c, CAST(0 AS DOUBLE)) + d$i.dm / nn.n) AS r
         |  FROM prnodes p LEFT JOIN c$i c ON c.id = p.id, nn, d$i)"""
    }.mkString(",\n")
    s"""prnodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM prnodes),
       |wdeg AS (SELECT src AS id, sum(w) AS wd FROM edges GROUP BY 1),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS r FROM prnodes, nn),
       |$stages"""
  }
}
