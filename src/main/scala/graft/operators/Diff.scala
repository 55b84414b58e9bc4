package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Snapshot diffing — derive the changelog a CDC stream would have carried
  * from two FULL table snapshots (the inverse of [[Scd]]'s
  * changelog→snapshot reconstruction, q129): 'insert' rows only in `next`,
  * 'delete' rows only in `prev`, 'update' rows present in both with at least
  * one differing value column. The differing column names ride along
  * (sorted, comma-joined) so downstream consumers can route column-level
  * invalidations. Unchanged rows are dropped.
  *
  * Scale shape: one hash shuffle per side on the key for the full-outer
  * join; at 100 TB both snapshots are bucketed on the key and the join is
  * co-located, making the nightly snapshot diff a map-side zip. Comparison
  * is null-safe (`<=>`), so NULL→value and value→NULL transitions are
  * updates, not misses.
  */
object Diff {

  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(prev.columns.sameElements(next.columns),
      s"snapshots must share a schema, got ${prev.columns.toSeq} vs ${next.columns.toSeq}")
    val valCols = prev.columns.filterNot(keyCols.contains).sorted
    val p = prev.select(prev.columns.map(c => col(c).as(s"__p_$c")).toSeq: _*)
    val n = next.select(next.columns.map(c => col(c).as(s"__n_$c")).toSeq: _*)
    val joined = p.join(n,
      keyCols.map(k => col(s"__p_$k") === col(s"__n_$k")).reduce(_ && _), "full_outer")
    val pKey = col(s"__p_${keyCols.head}")
    val nKey = col(s"__n_${keyCols.head}")
    val changeType = when(pKey.isNull, lit("insert"))
      .when(nKey.isNull, lit("delete"))
      .otherwise(lit("update"))
    val changedList = array_join(filter(
      array(valCols.map(c => when(!(col(s"__p_$c") <=> col(s"__n_$c")), lit(c))).toSeq: _*),
      x => x.isNotNull), ",")
    joined
      .withColumn("change_type", changeType)
      // changed columns are only meaningful for updates (an absent side
      // "differs" in every column)
      .withColumn("changed_cols",
        when(col("change_type") === "update", changedList).otherwise(lit("")))
      .filter(pKey.isNull || nKey.isNull || col("changed_cols") =!= "")
      .select(keyCols.map(k => coalesce(col(s"__p_$k"), col(s"__n_$k")).as(k)) ++
        Seq(col("change_type"), col("changed_cols")): _*)
      .orderBy(keyCols.map(col): _*)
  }
}
