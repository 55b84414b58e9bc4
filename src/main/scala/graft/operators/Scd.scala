package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval construction from an event
  * log (Kimball & Ross, The Data Warehouse Toolkit, 3rd ed., ch. 5 — the
  * standard warehouse change-tracking shape): collapse each entity's event
  * stream into state intervals `[valid_from, valid_to)` with an open
  * `is_current` row per entity — the gaps-and-islands pattern done with two
  * window passes (change detection via lag, interval close via lead).
  *
  * Plan shape at 100 TB: both windows share ONE partitioning (the entity
  * key), so the whole operator is a single shuffle; no self-join, no
  * cross-row explosion — strictly fewer rows out than in.
  */
object Scd {

  /** One row per state RUN: consecutive equal `stateCol` values collapse
    * into `[valid_from, valid_to)`; the last run per entity has a NULL
    * valid_to and is_current = 1. `tsFormat` renders the bounds as strings
    * (ns-precision timestamps compare engine-specifically; formatted bounds
    * are oracle-stable).
    */
  def intervals(events: DataFrame, entityCol: String, tsCol: String,
                tieCol: String, stateCol: String,
                tsFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(tsCol, tieCol)
    val changes = events
      .select(col(entityCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
    changes
      .withColumn("__vt", lead(col(tsCol), 1).over(w))
      .select(col(entityCol), col(stateCol),
        date_format(col(tsCol), tsFormat).as("valid_from"),
        date_format(col("__vt"), tsFormat).as("valid_to"),
        col("__vt").isNull.cast("long").as("is_current"))
  }

  /** Point-in-time join — the feature-store correctness primitive: each fact
    * row joins the dimension version that was valid AT ITS TIMESTAMP
    * (`valid_from <= ts < valid_to`, open row = null valid_to), never a
    * later one — the leakage-free way to attach slowly-changing attributes
    * to training examples. `dim` is an [[intervals]] output; facts that
    * predate the entity's first interval keep a null state (left join).
    *
    * Bounds are compared as the same formatted strings [[intervals]] emits
    * (lexicographic == chronological for this format), so fact and
    * dimension sides agree engine-independently. Intervals partition each
    * entity's timeline, so the join multiplicity is at most 1 by
    * construction. Plan: an equi-join on the entity key with a residual
    * range predicate — per-entity interval lists are small, the standard
    * PIT shape.
    */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCol: String, tsCol: String,
              tsFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val f = facts.withColumn("fact_ts", date_format(col(tsCol), tsFormat))
    val d = dim.withColumnRenamed(keyCol, "__dim_key")
    f.join(d,
      f(keyCol) === d("__dim_key") &&
        col("fact_ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("fact_ts") < col("valid_to")),
      "left")
      .drop("__dim_key")
  }

  /** CDC log → current-state snapshot (the Debezium/changelog materialization
    * next to [[intervals]]' full history): keep each key's LATEST row under
    * the deterministic `orderCols` order, and drop keys whose latest
    * operation is a delete (`isDelete`). One window per key partition — at
    * 100 TB this is a single shuffle on the key, with Spark's rank-limit
    * pushdown (WindowGroupLimit) pre-reducing each map partition to one row
    * per key before the exchange.
    */
  def cdcSnapshot(log: DataFrame, keyCol: String,
                  orderCols: Seq[org.apache.spark.sql.Column],
                  isDelete: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "cdcSnapshot needs a deterministic order")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(_.desc): _*)
    log
      .withColumn("__is_del", isDelete)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__is_del"))
      .drop("__rn", "__is_del")
  }
}
