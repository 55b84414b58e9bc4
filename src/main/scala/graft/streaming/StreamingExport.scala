package graft.streaming

import graft.functions.TextFunctions.tokenCount
import graft.operators.Export
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** STREAM-MAINTAINED EXPORT MANIFEST — the export × streaming matrix cell:
  * the per-shard integrity manifest ([[Export.shardManifest]]) kept current
  * as documents arrive, without rescanning the standing corpus. Each
  * micro-batch appends its documents' (source, content-hash, token count)
  * plus the within-batch token cumsum to the content-keyed artifact
  * ([[StreamingPacking.streamGlobalOffsets]] — the ingest-granularity
  * two-pass prefix scan, arrival-order independent and replay idempotent);
  * the read side reconciles global offsets, assigns shards, and finishes
  * through the SAME [[Export.manifestOf]] aggregate as the batch path — so
  * stream-maintained ≡ batch manifest by construction, and the q221 oracle
  * checks it verbatim.
  *
  * Scale shape: per-batch cost is the batch's own projection + one window
  * over the batch; the read-side finish groups by shard (checksum
  * concatenation bounded by the shard budget). Nothing rescans earlier
  * batches — their rows sit in the artifact with their offsets already
  * final relative to their batch, and only the parameter-sized batch-total
  * relation is re-reduced per read.
  */
object StreamingExport {

  /** The manifest of [[Export.shardManifest]], maintained from a stream:
    * (shard_id, n_docs, n_tokens, first_doc, last_doc, n_sources,
    * checksum), ordered by shard_id.
    */
  def streamShardManifest(spark: SparkSession, dir: String,
                          shardTokenBudget: Long,
                          hitsName: String = "export_manifest_stream_v1"): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    val rows = StreamingPacking.streamGlobalOffsets(spark, dir, hitsName,
      b => b.select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tok"),
        col("source"), md5(col("text")).as("__h")))
      .withColumn("shard_id",
        graft.functions.MathFunctions.longDiv(col("start_off"), lit(shardTokenBudget)))
    Export.manifestOf(rows, "doc_id", "source")
  }
}
