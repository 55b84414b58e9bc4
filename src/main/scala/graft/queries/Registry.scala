package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.immutable.ListMap

/** One registered operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases MUST match between the two — the driver's compare
  * sorts columns by name before hashing (builder contract).
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Registry {
  /** Insertion-ordered union of all query groups. Duplicate ids across
    * groups would silently drop the earlier query from the driver's verify
    * set — fail fast instead.
    */
  def all: ListMap[String, Q] = {
    val groups = Seq(RelationalQueries.all, EventQueries.all, TextQueries.all,
      VectorQueries.all, PipelineQueries.all, LayoutQueries.all, MultimodalQueries.all)
    val merged = groups.reduce(_ ++ _)
    require(merged.size == groups.map(_.size).sum,
      s"duplicate query ids across groups: ${groups.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.mkString(", ")}")
    merged
  }
}
