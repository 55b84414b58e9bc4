package graft.streaming

import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming multimodal ingest probe — the fourth member of the
  * stream-static probe family ([[StreamingDedup]] = LSH text near-dup,
  * [[StreamingAnn]] = IVF-PQ vectors, [[StreamingSubstr]] = verbatim
  * substrings, this = verbatim media FRAMES): delta media arrive as a
  * structured stream, their frame checksums are computed map-side (the
  * typed mapPartitions frame sampler runs unchanged inside the streaming
  * plan), and each frame probes the STANDING corpus's frame-checksum index
  * via a stream-static equi-join. Stateless per row; drained hits merge
  * batch-side into maximal duplicated FRAME RUNS per delta media — the
  * segments an ingest gate would flag as already-seen footage.
  *
  * At 100 TB the static side is the persisted frame index (one slim row
  * per frame); each arriving batch costs O(batch frames) probe rows —
  * never a corpus rescan. Index maintenance under corpus append is the
  * q166 algebra: append the accepted media's frame rows.
  */
object StreamingMedia {

  /** Duplicated frame runs of streamed delta media (doc_id % 10 == 0)
    * against the standing corpus (doc_id % 10 != 0), both derived from the
    * capped documents fixture via `mediaExpr` — row-identical to the
    * equivalent batch join, which is what the q168 oracle computes.
    * Output: (doc_id, span_start, span_len) in FRAME units (0-based start).
    */
  def deltaFrameSpans(spark: SparkSession, dir: String, cap: Int,
                      frameBytes: Int, mediaExpr: String): DataFrame = {
    val media = Tables.documents(spark, dir)
      .filter(col("doc_id") < cap)
      .withColumn("m", expr(mediaExpr))
    val corpusFrames = Multimodal.sampleFrames(spark,
        media.filter(col("doc_id") % 10 =!= 0), frameBytes, "doc_id", "m")
      .select("checksum").distinct()
    val deltaStream = StreamingAgg.streamTable(spark, dir, "documents.parquet")
      .filter(col("doc_id") < cap && col("doc_id") % 10 === 0)
      .withColumn("m", expr(mediaExpr))
    val hits = Multimodal.sampleFrames(spark, deltaStream, frameBytes, "doc_id", "m")
      .join(corpusFrames, Seq("checksum"))
      .select(col("doc_id"), col("frame_id").as("pos"))
    val drained = StreamingAgg.drain(hits, "graft_stream_media", "append").distinct()
    // frame ids are consecutive integers: interval-merge with unit windows
    // gives maximal duplicated frame runs, span_len in frames
    Dedup.mergeWindowIntervals(drained, "doc_id", minLen = 1)
  }
}
