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
  /** Insertion-ordered union of all query groups. */
  def all: ListMap[String, Q] =
    RelationalQueries.all ++ EventQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ PipelineQueries.all
}
