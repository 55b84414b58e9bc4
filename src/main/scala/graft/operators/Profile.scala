package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column profiling — the data-quality summary every ingestion pipeline runs
  * before training on a new source: per column, row/null/distinct counts and
  * (for numeric columns) min/max.
  *
  * ONE pass over the data: all per-column aggregates live in a single `agg`
  * (the multiple DISTINCT aggregates plan as one Expand + aggregate — a
  * deliberate trade: C distinct columns cost a C-way row expansion, still
  * one scan and one shuffle of partial aggregates, never C scans of a 100 TB
  * table), then the single result row is unpivoted to one row per column.
  */
object Profile {

  /** (col_name, n_rows, n_null, n_distinct, min_v, max_v) per profiled
    * column; min_v/max_v are NULL for non-numeric columns. `n_distinct`
    * counts distinct NON-NULL values (SQL COUNT(DISTINCT) semantics).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double")).as(s"__max_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*").orderBy("col_name")
  }

  /** Equal-width histogram of `valCol` per `keyCol` group, with GLOBAL bin
    * edges (shared [min, max] across groups so group shapes are comparable —
    * the distribution-drift view data profilers ship). Bin assignment is
    * `least(nBins-1, floor((v - lo) / width))`: the identical IEEE
    * expression in both engines, so edge-exact values bin identically; the
    * top edge folds into the last bin. Degenerate input (hi == lo) puts
    * everything in bin 0 rather than dividing by zero.
    *
    * Plan shape: one single-row global min/max broadcast back onto the
    * stream (map-only bin assignment), one (groups × bins)-bounded groupBy
    * with map-side partial combine. Never a sort, never a per-group scan.
    */
  def histogram(df: DataFrame, keyCol: String, valCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"histogram wants >= 2 bins, got $nBins")
    val stats = df.agg(min(col(valCol)).cast("double").as("__lo"),
      max(col(valCol)).cast("double").as("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(nBins.toDouble)
    val bin = when(col("__hi") === col("__lo"), lit(0L)).otherwise(
      least(lit((nBins - 1).toLong),
        floor((col(valCol).cast("double") - col("__lo")) / width).cast("long")))
    df.crossJoin(broadcast(stats))
      .select(col(keyCol), col("__lo"), bin.as("bin"),
        (col("__hi") - col("__lo")).as("__span"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        floorRound(first(col("__lo")) + col("bin").cast("double") *
          (first(col("__span")) / lit(nBins.toDouble)), 6).as("bin_lo"))
      .select(col(keyCol), col("bin"), col("bin_lo"), col("n"))
      .orderBy(col(keyCol), col("bin"))
  }

  /** DuckDB mirror of [[histogram]] — keep token-for-token in sync. */
  def histogramSql(table: String, keyCol: String, valCol: String, nBins: Int): String = {
    val fr = graft.functions.MathFunctions.floorRoundSql _
    s"""WITH s AS (
       |  SELECT CAST(min($valCol) AS DOUBLE) AS lo, CAST(max($valCol) AS DOUBLE) AS hi
       |  FROM $table),
       |b AS (
       |  SELECT $keyCol, lo, hi - lo AS span,
       |    CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
       |      ELSE least(CAST(${nBins - 1} AS BIGINT),
       |        CAST(floor((CAST($valCol AS DOUBLE) - lo) / ((hi - lo) / CAST($nBins AS DOUBLE))) AS BIGINT))
       |    END AS bin
       |  FROM $table CROSS JOIN s)
       |SELECT $keyCol, bin,
       |  ${fr(s"lo + CAST(bin AS DOUBLE) * (span / CAST($nBins AS DOUBLE))", 6)} AS bin_lo,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM b GROUP BY $keyCol, bin, lo, span
       |ORDER BY $keyCol, bin""".stripMargin
  }
}
