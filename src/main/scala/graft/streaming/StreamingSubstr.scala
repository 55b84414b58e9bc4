package graft.streaming

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming exact-substring ingest dedup — the third member of the
  * stream-static probe family ([[StreamingDedup]] = LSH near-dup,
  * [[StreamingAnn]] = IVF-PQ vectors, this = verbatim substring overlap):
  * delta documents arrive as a structured stream, their content-defined
  * anchored windows are computed map-side (the same filtered-transform
  * expression as the batch operator runs unchanged in the streaming plan),
  * and each window probes the STANDING corpus's anchored-window index via a
  * stream-static equi-join. Stateless per row; the drained hit positions
  * are interval-merged batch-side into the delta documents' duplicated
  * spans — the spans an ingest pipeline would cut before accepting the
  * delta into a training corpus.
  *
  * At 100 TB the static side is the precomputed anchored-window index of
  * the corpus (~1/anchorEvery of corpus bytes); each arriving batch costs
  * O(batch-bytes/anchorEvery) probe rows — never a corpus rescan.
  */
object StreamingSubstr {

  /** Duplicated spans of streamed delta docs (doc_id % 10 == 0, capped)
    * against the standing corpus (doc_id % 10 != 0) — row-identical to the
    * equivalent batch join, which is exactly what the q157 oracle computes.
    */
  def deltaSubstrSpans(spark: SparkSession, dir: String, cap: Int,
                       minLen: Int = 50, anchorEvery: Int = 8): DataFrame = {
    val corpus = Tables.documents(spark, dir)
      .filter(col("doc_id") < cap && col("doc_id") % 10 =!= 0)
    val index = Dedup.anchoredWindows(corpus, "doc_id", "text", minLen, anchorEvery)
      .select("win").distinct()
    val deltaStream = StreamingAgg.streamTable(spark, dir, "documents.parquet")
      .filter(col("doc_id") < cap && col("doc_id") % 10 === 0)
    val hits = Dedup.anchoredWindows(deltaStream, "doc_id", "text", minLen, anchorEvery)
      .join(index, Seq("win"))
      .select(col("doc_id"), col("pos"))
    // Append emits one row per window hit; duplicates across micro-batches
    // collapse in the distinct before the batch-side interval merge
    val drained = StreamingAgg.drain(hits, "graft_stream_substr", "append").distinct()
    Dedup.mergeWindowIntervals(drained, "doc_id", minLen)
  }
}
