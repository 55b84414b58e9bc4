package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Incremental materialized-aggregate maintenance: keep a keyed ADDITIVE
  * STATE (count + sums — the partials every algebraic aggregate decomposes
  * into; avg/rate derive at read time) and fold new delta batches into it
  * without touching historical input. This is the view-maintenance shape
  * that turns a nightly 100 TB re-aggregation into an O(|delta| + |state|)
  * merge — and the merge is a monoid (commutative, associative), so deltas
  * can arrive in any order and partial states can merge hierarchically
  * (hourly → daily → total).
  *
  * Exactness policy: sum columns should be integral (e.g. money as cents —
  * the q117 convention); integer partial sums are order-independent, so the
  * incrementally-maintained state equals a from-scratch recompute BIT
  * EXACTLY (the q139 oracle is exactly that full recompute). Double sums
  * would drift by accumulation order across merge shapes.
  */
object Incremental {

  /** Aggregate raw rows into the additive state: keys, `n`, one `sum_<c>`
    * per sum column.
    */
  def aggState(rows: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && sumCols.nonEmpty, "need at least one key and one sum column")
    val aggs = count(lit(1)).cast("long").as("n") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    rows.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Monoid merge of two states (same schema): per-key sums of partials. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val aggs = sum("n").cast("long").as("n") +:
      sumCols.map(c => sum(s"sum_$c").as(s"sum_$c"))
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a batch of new raw rows into the state. */
  def applyDelta(state: DataFrame, deltaRows: DataFrame,
                 keys: Seq[String], sumCols: Seq[String]): DataFrame =
    merge(state, aggState(deltaRows, keys, sumCols), keys, sumCols)
}
