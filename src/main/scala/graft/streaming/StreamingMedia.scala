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

  /** PERCEPTUAL ingest gate: streamed delta media are "re-encoded"
    * renditions (in-place head substitution of the fixture text), their
    * whole-blob dHashes probe the standing corpus's BANDED perceptual index
    * stream-static, and band hits within `maxHamming` bits report (delta
    * doc, matched corpus doc, hamming) — the gate that catches a re-encoded
    * copy of already-ingested footage where exact checksums
    * ([[deltaFrameSpans]]) see nothing. Rendition ids are 2·doc+1, corpus
    * ids 2·doc (the q159 rendition-corpus convention), mapped back to doc
    * ids on output.
    */
  def perceptualProbe(spark: SparkSession, dir: String, cap: Int,
                      maxHamming: Int): DataFrame = {
    import graft.functions.TextFunctions.hamming64
    import graft.multimodal.Multimodal.banded
    val idx = banded(Tables.documents(spark, dir).filter(col("doc_id") < cap)
        .select((col("doc_id") * 2).as("id"),
          Multimodal.dHash(col("text").cast("binary")).as("ph")))
      .select(col("id").as("c_id"), col("ph").as("ph_c"), col("band"), col("chunk"))
    val delta = StreamingAgg.streamTable(spark, dir, "documents.parquet")
      .filter(col("doc_id") < cap)
      .select((col("doc_id") * 2 + 1).as("id"),
        Multimodal.dHash(concat(upper(substring(col("text"), 1, 4)),
          expr("substring(text, 5, length(text))")).cast("binary")).as("ph"))
    val hits = banded(delta).join(idx, Seq("band", "chunk"))
      .select(expr("(id - 1) div 2").as("doc_id"), expr("c_id div 2").as("match_id"),
        hamming64(col("ph"), col("ph_c")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    StreamingAgg.drain(hits, "graft_stream_phash", "append")
      .distinct().orderBy("doc_id", "match_id")
  }
}
