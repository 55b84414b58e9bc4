package graft.queries

import graft.Tables
import graft.functions.MathFunctions.{floorRoundSql => frs}
import graft.operators.{Layout, Sampling}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Physical-layout / output-shape operators: shard-balance audit, small-file
  * compaction planning, Z-order data-skipping audit. These are the queries a
  * pipeline runs about its OWN storage — before writing n shards, before an
  * OPTIMIZE pass, before choosing a sort order for zone-map pruning.
  */
object LayoutQueries {

  private val ShardCount  = 16
  private val TargetBytes = 5000L
  private val BlockRows   = 64
  private val ProbeMod    = 97L

  val all: ListMap[String, Q] = ListMap(

    // Deterministic hash-shard assignment + balance audit: per-shard rows /
    // bytes and skew vs a perfectly uniform split — the pre-write check
    // that output shards won't straggle at write or training-load time.
    "q95_shard_balance" -> Q(
      (s, dir) => Sampling.shardBalance(
        Tables.documents(s, dir).select("doc_id", "n_chars"),
        "doc_id", "n_chars", nShards = ShardCount),
      Some(s"""WITH s AS (
             |  SELECT ${Sampling.hashShardSql("doc_id", ShardCount)} AS shard, n_chars
             |  FROM documents),
             |ps AS (
             |  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(sum(n_chars) AS BIGINT) AS shard_bytes
             |  FROM s GROUP BY 1),
             |t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS tr,
             |    CAST(sum(n_chars) AS BIGINT) AS tb FROM s)
             |SELECT shard, n_rows, shard_bytes,
             |  ${frs(s"CAST(n_rows AS DOUBLE) * $ShardCount / CAST(tr AS DOUBLE)", 4)} AS row_skew,
             |  ${frs(s"CAST(shard_bytes AS DOUBLE) * $ShardCount / CAST(tb AS DOUBLE)", 4)} AS byte_skew
             |FROM ps CROSS JOIN t ORDER BY shard""".stripMargin)),

    // Small-file compaction plan: contiguous target-size bins per language
    // partition (docs standing in for files, n_chars for bytes) — the
    // deterministic OPTIMIZE planner, windowed per partition key.
    "q97_compaction_plan" -> Q(
      (s, dir) => Layout.compactionPlan(
        Tables.documents(s, dir).select("lang", "doc_id", "n_chars"),
        "lang", "doc_id", "n_chars", targetBytes = TargetBytes),
      Some(s"""WITH c AS (
             |  SELECT lang, doc_id, n_chars,
             |    CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM documents),
             |b AS (
             |  SELECT lang, CAST((cum - n_chars) // $TargetBytes AS BIGINT) AS bin, n_chars
             |  FROM c)
             |SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_files,
             |  CAST(sum(n_chars) AS BIGINT) AS bin_bytes,
             |  ${frs(s"CAST(sum(n_chars) AS DOUBLE) / $TargetBytes", 4)} AS fill
             |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Z-order layout audit over orders (o_custkey × order-day): per-64-row
    // block min/max spans under the natural key order vs the Morton curve —
    // the zone-map tightness a Z-ordered rewrite buys for two-dimensional
    // predicate pruning.
    "q98_zorder_audit" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01"))).as("o_day"))
        Layout.zorderAudit(o, "o_orderkey", "o_custkey", "o_day", blockRows = BlockRows)
      },
      Some {
        val span = "max(x) - min(x) AS xs, max(y) - min(y) AS ys"
        def layer(name: String, order: String, i: Int): String =
          s"""n$i AS (
             |  SELECT x, y, (row_number() OVER (ORDER BY $order) - 1) // $BlockRows AS blk
             |  FROM z),
             |a$i AS (SELECT blk, $span FROM n$i GROUP BY 1),
             |r$i AS (
             |  SELECT '$name' AS layout, CAST(count(*) AS BIGINT) AS n_blocks,
             |    CAST(sum(xs) AS BIGINT) AS sx, CAST(sum(ys) AS BIGINT) AS sy
             |  FROM a$i)""".stripMargin
        s"""WITH src AS (
           |  SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS x,
           |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS y
           |  FROM orders),
           |z AS (SELECT k, x, y, ${Layout.zValue16Sql("x", "y")} AS z FROM src),
           |${layer("natural", "k", 1)},
           |${layer("zorder", "z, k", 2)}
           |SELECT layout, n_blocks,
           |  ${frs("CAST(sx AS DOUBLE) / CAST(n_blocks AS DOUBLE)", 4)} AS avg_x_span,
           |  ${frs("CAST(sy AS DOUBLE) / CAST(n_blocks AS DOUBLE)", 4)} AS avg_y_span
           |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
           |ORDER BY layout""".stripMargin
      }),

    // What q98's spans MEAN for a scan: fraction of 64-row blocks a zone-map
    // check skips for point probes on o_custkey, natural vs Z-order — the
    // planner-side pruning estimate over zone-map metadata, not a data scan.
    "q107_pruning_sim" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01"))).as("o_day"))
        Layout.pruningSim(o, "o_orderkey", "o_custkey", "o_day",
          blockRows = BlockRows, probeMod = ProbeMod)
      },
      Some {
        def blk(name: String, order: String): String =
          s"SELECT '$name' AS layout, (row_number() OVER (ORDER BY $order) - 1) // $BlockRows AS blk, x FROM z"
        s"""WITH src AS (
           |  SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS x,
           |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS y
           |  FROM orders),
           |z AS (SELECT k, x, y, ${Layout.zValue16Sql("x", "y")} AS z FROM src),
           |m AS (
           |  SELECT layout, blk, min(x) AS mnx, max(x) AS mxx
           |  FROM (${blk("natural", "k")} UNION ALL ${blk("zorder", "z, k")})
           |  GROUP BY 1, 2),
           |p AS (SELECT DISTINCT x AS p FROM z WHERE x % $ProbeMod = 0),
           |j AS (
           |  SELECT layout, blk, p,
           |    CASE WHEN p < mnx OR p > mxx THEN 1 ELSE 0 END AS s
           |  FROM m CROSS JOIN p)
           |SELECT layout, CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
           |  CAST(count(DISTINCT p) AS BIGINT) AS n_probes,
           |  ${frs("CAST(sum(s) AS DOUBLE) / CAST(count(DISTINCT blk) * count(DISTINCT p) AS DOUBLE)", 6)} AS skip_frac
           |FROM j GROUP BY layout ORDER BY layout""".stripMargin
      }),
  )
}
