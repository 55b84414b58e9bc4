package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sequence packing — the step after curation that fills fixed-capacity
  * training sequences (bins of `capacity` tokens) from variable-length
  * documents. This is contiguous greedy packing: documents in a
  * deterministic order fill bins front-to-back, and a document's bin is
  * wherever its cumulative start offset lands (documents may straddle a
  * boundary; the trainer's loader splits there — the standard
  * concat-then-chunk packing used for LLM pre-training batches).
  *
  * Scale design: packing is done PER SHARD (`shardCol`) — each shard's
  * window cumsum is independent, so the plan is one hash shuffle on the
  * shard key and never a global sort. (A single global packing order would
  * serialize the whole corpus through one window partition; per-shard bins
  * are what distributed pipelines ship anyway, one output file per shard.)
  * Bin ids are (shard, bin_id) pairs; deterministic given (shardCol,
  * orderCol) — re-running produces identical bins.
  */
object Packing {

  /** Assign each document its bin and in-bin start offset.
    * Output columns: all of `df` plus `bin_id` (0-based within shard) and
    * `bin_offset` (token offset of the doc's first token within its bin).
    */
  def packBins(df: DataFrame, shardCol: String, orderCol: String,
               tokenCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__start", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("__start") / capacity).cast("long"))
      .withColumn("bin_offset", (col("__start") % capacity).cast("long"))
      .drop("__start")
  }
}
