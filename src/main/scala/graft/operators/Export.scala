package graft.operators

import graft.functions.TextFunctions.tokenCount
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The LAST MILE of a training-data pipeline: exporting a curated corpus as
  * size-bounded shards with a verifiable manifest. The reference stops at
  * upserting vectors (`vectrekker/main.py:185`); a corpus that feeds a
  * training run ships as N files of ≈equal token mass plus a manifest the
  * loader (and any later audit) checks shard-by-shard.
  *
  * Shard assignment is deterministic and DISTRIBUTED: a document's shard is
  * `floor(global_start_offset / shardTokenBudget)` where the global offset
  * comes from [[Scan.cumSums]] (the two-pass Blelloch prefix scan — range
  * partition, per-partition partials, broadcast offsets), never a
  * single-partition window. Unlike [[Packing.packSequences]] documents are
  * NOT split across shards — a shard holds whole documents and overflows
  * its budget by at most one document, the standard export trade (loaders
  * re-chunk inside a shard; file boundaries must not cut a document).
  *
  * The manifest checksum is ORDER-SENSITIVE — md5 over the concatenation of
  * per-document `md5(text)` in ascending doc_id order — so a re-export that
  * reorders, drops, duplicates, or mutates any document inside a shard
  * changes that shard's line. Computed per shard group: the concatenation
  * is bounded by the shard budget (32 hex chars per document), not by the
  * corpus.
  */
object Export {

  /** Per-document shard assignment: (idCol, n_tok, start_off, shard_id).
    * One range-partitioned prefix scan; no global sort, no data-plane
    * collect.
    */
  def assignShards(df: DataFrame, idCol: String, textCol: String,
                   shardTokenBudget: Long, parts: Int = 32): DataFrame = {
    require(shardTokenBudget > 0,
      s"shardTokenBudget must be positive, got $shardTokenBudget")
    val tc = df.select(col(idCol), tokenCount(col(textCol)).cast("long").as("n_tok"))
    Scan.cumSums(tc, Seq(idCol), Seq("n_tok"), parts)
      .withColumn("start_off", col("cum_n_tok") - col("n_tok"))
      // non-negative offsets: integer division == floor division
      .withColumn("shard_id", (col("start_off") / lit(shardTokenBudget)).cast("long"))
      .select(col(idCol), col("n_tok"), col("start_off"), col("shard_id"))
  }

  /** The export manifest: one row per shard — document count, token mass,
    * id range, distinct sources, and the order-sensitive content checksum.
    * This is what a loader verifies before training and what an audit
    * re-derives from the shipped files; any divergence names the shard.
    *
    * Scale shape: one prefix scan for assignment, one hash aggregate on
    * shard_id. The checksum concatenation uses sort_array over the shard's
    * collected (doc_id, md5) pairs — bounded by the shard BUDGET (a config
    * constant), never the corpus; shards are the unit a single task is
    * sized to hold by construction.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    sourceCol: String, shardTokenBudget: Long,
                    parts: Int = 32): DataFrame = {
    val assigned = assignShards(df, idCol, textCol, shardTokenBudget, parts)
    val rows = df.select(col(idCol), col(sourceCol), md5(col(textCol)).as("__h"))
      .join(assigned, Seq(idCol))
    rows
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        countDistinct(col(sourceCol)).as("n_sources"),
        // sort_array on struct(doc_id, h) orders by doc_id (first field);
        // the transform projects back to the hex digests in id order
        md5(concat_ws("", transform(
          sort_array(collect_list(struct(col(idCol), col("__h")))),
          x => x.getField("__h")))).as("checksum"))
      .select("shard_id", "n_docs", "n_tokens", "first_doc", "last_doc",
        "n_sources", "checksum")
      .orderBy("shard_id")
  }

  /** Physically write the corpus as one directory per shard
    * (`outDir/shard_id=K/`), shard assignment identical to
    * [[shardManifest]]'s, and return the manifest of what was written.
    * `partitionBy` gives hive-style shard directories; within a shard the
    * writer task count follows the repartition on shard_id, so each shard's
    * rows land together (the loader reads one directory per shard).
    */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, shardTokenBudget: Long,
                  outDir: String, parts: Int = 32): DataFrame = {
    val assigned = assignShards(df, idCol, textCol, shardTokenBudget, parts)
    df.join(assigned.select(col(idCol), col("shard_id")), Seq(idCol))
      .repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    shardManifest(df, idCol, textCol, sourceCol, shardTokenBudget, parts)
  }

  /** Re-derive the manifest FROM a shards directory written by
    * [[writeShards]] — the audit a consumer runs on received files. Equal
    * output to the producer's manifest ⇔ the shipped bytes hold exactly the
    * intended corpus (see the checksum contract above).
    */
  def auditShards(spark: SparkSession, shardsDir: String, idCol: String,
                  textCol: String, sourceCol: String,
                  shardTokenBudget: Long, parts: Int = 32): DataFrame =
    shardManifest(
      spark.read.parquet(shardsDir).drop("shard_id"),
      idCol, textCol, sourceCol, shardTokenBudget, parts)
}
