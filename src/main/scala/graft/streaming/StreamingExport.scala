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
                          hitsName: String = "export_manifest_stream_v2"): DataFrame = {
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

  /** The TOKEN-AWARE CDC manifest ([[Export.shardManifestCdcTokenAware]])
    * maintained from a stream — the CDC × streaming matrix cell. The cut
    * decision depends ONLY on the arriving document's own content (the
    * exact integer comparison hv·budget < n_tok·65536), so pass 1 needs no
    * cross-batch state at all; the only thing reconciled at read is the
    * cumulative CUT COUNT (the shard id), which rides the same two-pass
    * prefix scan as the token offsets — [[StreamingPacking.streamGlobalCumsums]]
    * summing the 0/1 cut indicator instead of n_tok. Stream-maintained ≡
    * the batch CDC manifest by construction; q233 checks it against q227's
    * batch oracle verbatim.
    */
  def streamShardManifestCdcTokenAware(spark: SparkSession, dir: String,
                                       shardTokenBudget: Long,
                                       hitsName: String = "export_manifest_cdc_stream_v1"): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    val rows = StreamingPacking.streamGlobalCumsums(spark, dir, hitsName,
      b => b.select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tok"),
          expr(Export.hex4ValSql("md5(text)")).cast("long").as("__hv"),
          col("source"), md5(col("text")).as("__h"))
        .withColumn("cut",
          when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(65536L), 1L)
            .otherwise(0L))
        .drop("__hv"),
      sumCols = Seq("cut"))
      .withColumn("shard_id", col("cum_cut"))
    Export.manifestOf(rows, "doc_id", "source")
  }

  /** The TTTD MIN-GAP manifest ([[Export.shardManifestCdcTokenAwareMinGap]])
    * maintained from a stream (r15 verdict task 4). Pass 1 is the same
    * content-pure projection as the plain CDC twin above — candidate flag
    * from the document's own hash, cumulative (n_tok, cand) riding the
    * content-keyed two-pass prefix scan. The min-gap survivor cut is a
    * function of the CANDIDATE relation only (one lag + one candidate-sized
    * prefix scan), so the read-side finish calls the BATCH operator's own
    * tail ([[Export.minGapSurvivorShardIds]]) on the stream-maintained
    * rows: streamed ≡ batch by shared construction, and q239 checks it
    * against q235's batch oracle verbatim.
    */
  def streamShardManifestCdcTokenAwareMinGap(spark: SparkSession, dir: String,
                                             shardTokenBudget: Long,
                                             minGapTokens: Long,
                                             hitsName: String = "export_manifest_cdc_mingap_stream_v1"): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    require(minGapTokens >= 0 && minGapTokens < shardTokenBudget * 16,
      s"minGapTokens must be in [0, 16*budget), got $minGapTokens")
    val rows = StreamingPacking.streamGlobalCumsums(spark, dir, hitsName,
      b => b.select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tok"),
          expr(Export.hex4ValSql("md5(text)")).cast("long").as("__hv"),
          col("source"), md5(col("text")).as("__h"))
        .withColumn("cand",
          when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(65536L), 1L)
            .otherwise(0L))
        .drop("__hv"),
      sumCols = Seq("n_tok", "cand"))
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
    val assigned = Export.minGapSurvivorShardIds(rows, "doc_id", minGapTokens, 32)
    Export.manifestOf(
      rows.select("doc_id", "source", "__h").join(assigned, Seq("doc_id")),
      "doc_id", "source")
  }

  /** The full TTTD manifest (min-gap floor + backup-divisor sub-cuts,
    * [[Export.shardManifestCdcTokenAwareTttd]]) maintained from a stream:
    * pass 1 adds the content-pure BACKUP flag to the min-gap twin's
    * projection; the read side runs the batch operator's own survivor-cut
    * AND piece tails ([[Export.minGapSurvivorShardIds]] →
    * [[Export.tttdPieceIds]]) over the stream-maintained rows — streamed ≡
    * batch by shared construction, checked against q246's oracle verbatim.
    */
  def streamShardManifestCdcTokenAwareTttd(spark: SparkSession, dir: String,
                                           shardTokenBudget: Long,
                                           minGapTokens: Long,
                                           maxShardTokens: Long,
                                           hitsName: String = "export_manifest_cdc_tttd_stream_v1"): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    require(maxShardTokens >= shardTokenBudget,
      s"maxShardTokens must be >= budget, got $maxShardTokens < $shardTokenBudget")
    val rows = StreamingPacking.streamGlobalCumsums(spark, dir, hitsName,
      b => b.select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tok"),
          expr(Export.hex4ValSql("md5(text)")).cast("long").as("__hv"),
          col("source"), md5(col("text")).as("__h"))
        .withColumn("cand",
          when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(65536L), 1L)
            .otherwise(0L))
        .withColumn("__bkp",
          when(col("__hv") * lit(shardTokenBudget) < col("n_tok") * lit(2L * 65536L), 1L)
            .otherwise(0L))
        .drop("__hv"),
      sumCols = Seq("n_tok", "cand"))
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
    val assigned = Export.tttdPieceIds(
      Export.minGapSurvivorShardIds(rows, "doc_id", minGapTokens, 32)
        .join(rows.select("doc_id", "__bkp"), Seq("doc_id")),
      "doc_id", maxShardTokens)
    Export.manifestBySubOf(
      rows.select("doc_id", "source", "__h").join(assigned, Seq("doc_id")),
      "doc_id", "source")
  }
}
