package graft.operators

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
}
