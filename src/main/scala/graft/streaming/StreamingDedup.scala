package graft.streaming

import graft.Tables
import graft.functions.MathFunctions.floorRound
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming ingestion dedup — the production topology of
  * [[Dedup.dedupDeltaAgainstCorpus]]: new documents arrive as a structured
  * stream, compute their LSH band keys as pure map-side expressions (the
  * fused shingle/minhash kernels run unchanged inside the streaming plan),
  * and probe the STANDING corpus index via a stream-static join. No
  * streaming state at all: candidate verification is stateless per row,
  * duplicates across micro-batches collapse in the post-drain
  * reconciliation — the same pattern q37 uses for provisional session
  * emissions.
  *
  * At 100 TB the static side is the precomputed band-key index of the
  * corpus (here derived inline from the fixture); each arriving batch costs
  * O(batch · bands) probe rows against it, never a corpus rescan.
  */
object StreamingDedup {

  /** Delta docs (doc_id % 10 == 0) that survive LSH near-dup checks against
    * the static corpus (doc_id % 10 != 0) and earlier delta docs — result
    * is row-identical to the batch [[Dedup.dedupDeltaAgainstCorpus]] on the
    * same split (the corpus check streams; the within-delta keep-first is
    * the batch pair operator on the small delta, exactly how an ingest
    * pipeline composes the two).
    */
  def deltaDedup(spark: SparkSession, dir: String, shingleSize: Int = 3,
                 numHashes: Int = 32, bands: Int = 16,
                 threshold: Double = 0.5): DataFrame = {
    val docs        = Tables.documents(spark, dir)
    val corpus      = docs.filter(col("doc_id") % 10 =!= 0)
    val deltaStatic = docs.filter(col("doc_id") % 10 === 0)

    // standing index: band keys + shingle sets of the corpus (static side)
    val index = Dedup.bandKeysFor(corpus, "doc_id", "text", shingleSize, numHashes, bands)
      .select(col("doc_id").as("id_a"), col("hs").as("hs_a"), col("band"), col("band_key"))

    // the stream: documents file source, delta rows only; banding is map-only
    val deltaStream = StreamingAgg.streamTable(spark, dir, "documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val probe = Dedup.bandKeysFor(deltaStream, "doc_id", "text", shingleSize, numHashes, bands)
      .select(col("doc_id").as("id_b"), col("hs").as("hs_b"), col("band"), col("band_key"))

    // stream-static inner join + stateless verify; Append emits one row per
    // colliding band, duplicates reconciled after the drain
    val dropped = probe.join(index, Seq("band", "band_key"))
      .withColumn("jac", floorRound(Dedup.jaccardOfSorted(col("hs_a"), col("hs_b")), 4))
      .filter(col("jac") >= threshold)
      .select("id_b")
    val droppedByCorpus = StreamingAgg.drain(dropped, "graft_stream_deltadedup", "append")
      .distinct()

    // within-delta keep-first (batch over the small delta side)
    val withinPairs = Dedup.minhashLshPairs(deltaStatic, "doc_id", "text",
      shingleSize, numHashes, bands, threshold)

    Dedup.keepFirst(deltaStatic, "doc_id", withinPairs)
      .join(droppedByCorpus.withColumnRenamed("id_b", "doc_id"), Seq("doc_id"), "left_anti")
  }
}
