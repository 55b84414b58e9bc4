package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output-file clustering for partitioned writes (optimization guide §6:
  * partitioning and sort order on write determine how well readers skip
  * data — and unclustered `partitionBy` writes produce tasks × partitions
  * files). Without this, every input task holding rows of every cell
  * writes one file per cell: measured 477 part files for a 32-cell chunk
  * index at sf0.1 (15 tasks × ~32 cells), paid again by every later read
  * of the artifact (477 opens + footers instead of 32).
  *
  * `clusterBy` inserts an AQE REBALANCE on the write-partition column(s):
  * rows of one partition value land in one output task (one file), while
  * AQE still SPLITS a skewed value across tasks (a hot cell in a 100 TB
  * index becomes several large files, not one straggler task) and
  * coalesces small ones — the scale-adaptive middle ground between plain
  * `repartition(partCol)` (one task per value, unbounded skew) and no
  * clustering (files = tasks × values). Content is unchanged — only row
  * placement across output files moves.
  */
object WriteLayout {
  def clusterBy(df: DataFrame, partCols: String*): DataFrame =
    df.hint("rebalance", partCols.map(col): _*)
}
