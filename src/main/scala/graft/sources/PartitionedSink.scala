package graft.sources

import org.apache.spark.sql.DataFrame

/** Hive-style partitioned parquet sink + pruning check. Partitioning by a
  * low-cardinality column (date, lang, event_type) turns downstream
  * equality/range filters into directory pruning — at 100 TB the scan reads
  * only the matching partitions' files.
  */
object PartitionedSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    // cluster rows by the partition columns first (AQE rebalance) so each
    // value's rows land in few files instead of one file per (task, value)
    graft.pipeline.WriteLayout.clusterBy(df, partitionCols: _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** True when the plan prunes by partition (a `PartitionFilters` entry that
    * actually references a column, not just `[]`).
    */
  def isPartitionPruned(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    val idx  = plan.indexOf("PartitionFilters: [")
    idx >= 0 && plan.charAt(idx + "PartitionFilters: [".length) != ']'
  }
}
