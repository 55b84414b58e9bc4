package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CHUNK-GRANULAR RETRIEVAL (r18 verdict task 2) — the end of the
  * reference's splitting TODO (`vectrekker/main.py:177`): [[Chunker]]
  * implements the split and the token guard filters-not-crashes, but a
  * document past the guard was still UNREACHABLE by retrieval — its whole-
  * doc embedding never enters the index. Here chunks become the retrieval
  * unit: chunk → per-chunk embedding → score → DOC-level top-k by
  * max-over-chunk-scores (the standard long-document RAG shape; public
  * practice in every chunked vector store). A 100k-token document is
  * indexed as ~2k bounded chunks, each under the guard, and a query
  * matching any 64-token window of it retrieves the document.
  *
  * Scale shape: chunking is map-only (one explode inside codegen), chunk
  * embedding is fused into the same stage, queries broadcast, and the
  * doc-level max + top-k are one window pass partitioned by query — no
  * corpus-wide shuffle. [[chunkDocTopKLsh]] swaps the exact cross-score
  * for the [[AnnIndex.annTopK]] bucket join over the SAME chunk relation —
  * candidates drop to the query's hamming-≤1 buckets, and the doc-max
  * finish is unchanged; at 100 TB the chunk relation is also exactly what
  * the IVF/PQ index family consumes ((key, vec) rows), so every trained
  * chain applies per-chunk unchanged.
  */
object ChunkRetrieval {

  /** Exact chunk-granular retrieval: top-`k` DOCS per query, scored by the
    * maximum chunk cosine; `best_chunk` names the winning window (lowest
    * chunk_id on ties). Output (qIdCol, doc_id, best_chunk, score, rn).
    *
    * Embeddings are the pluggable hashing embedder's RAW bucket counts
    * (integer-valued — dots and norms exact, so the cosine mirrors
    * bit-for-bit in the DuckDB oracle, q274).
    */
  def chunkDocTopK(queries: DataFrame, qIdCol: String, qTextCol: String,
                   docs: DataFrame, dIdCol: String, textCol: String,
                   chunkTokens: Int, overlap: Int, embDim: Int, k: Int,
                   roundTo: Int = 6): DataFrame = {
    val scored = chunkScores(queries, qIdCol, qTextCol, docs, dIdCol, textCol,
      chunkTokens, overlap, embDim, roundTo)
    docMaxTopK(scored, qIdCol, dIdCol, k)
  }

  /** The ANN form: chunk candidates from [[AnnIndex.annTopK]]'s
    * sign-hyperplane buckets (query bucket + hamming-1 multiprobe) instead
    * of the exact cross-score — per-query work O(chunks·(nbits+1)/2^nbits)
    * expected. `chunkShortlist` bounds the per-query chunk candidates that
    * compete in the doc-max (the ANN top-`chunkShortlist` chunks). Recall
    * < 1 by construction; the q275 eval prices it against the exact path.
    */
  def chunkDocTopKLsh(queries: DataFrame, qIdCol: String, qTextCol: String,
                      docs: DataFrame, dIdCol: String, textCol: String,
                      chunkTokens: Int, overlap: Int, embDim: Int, k: Int,
                      nbits: Int, chunkShortlist: Int,
                      roundTo: Int = 6): DataFrame = {
    val emb = graft.pipeline.HashingEmbedder(embDim)
    val chunks = Chunker.chunk(docs, dIdCol, textCol, chunkTokens, overlap)
      .select(col(dIdCol),
        // one retrieval key per chunk; dIdCol recovered by integer division
        packedChunkKey(col(dIdCol), col("chunk_id")).as("__chunk_key"),
        emb.embedRaw(col("chunk_text")).as("__cvec"))
    val qs = queries.select(col(qIdCol), emb.embedRaw(col(qTextCol)).as("__qvec"))
    val cand = AnnIndex.annTopK(qs, qIdCol, "__qvec",
      chunks.select(col("__chunk_key"), col("__cvec")), "__chunk_key", "__cvec",
      k = chunkShortlist, nbits = nbits, dim = embDim,
      roundTo = roundTo, excludeSelf = false)
    val scored = cand.select(col(qIdCol),
      graft.functions.MathFunctions.longDiv(col("__chunk_key"), lit(1000000L)).as(dIdCol),
      pmod(col("__chunk_key"), lit(1000000L)).as("chunk_id"),
      col("score").as("__sim"))
    docMaxTopK(scored, qIdCol, dIdCol, k)
  }

  /** One packed retrieval key per chunk — `doc_id·10⁶ + chunk_id` (doc
    * recovered by integer division), GUARDED (r19 ADVICE): the arithmetic
    * silently collides when a doc reaches 10⁶ chunks (~48 M tokens),
    * overflows past doc_id ≈ 9.2·10¹², and mis-decodes for negative ids —
    * each of which would attribute candidate chunks to the WRONG document.
    * Out-of-range inputs raise instead. The bounds stay inside the codegen
    * path (one branch per row).
    */
  def packedChunkKey(docId: org.apache.spark.sql.Column,
                     chunkId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = docId.cast("long")
    val c = chunkId.cast("long")
    when(d < 0L || d > 9000000000000L || c < 0L || c >= 1000000L,
      raise_error(concat(lit("packedChunkKey out of range: doc_id="), d.cast("string"),
        lit(", chunk_id="), c.cast("string"))).cast("long"))
      .otherwise(d * 1000000L + c)
  }

  /** Every (query, doc, chunk) cosine — the exact scored relation both the
    * retrieval finish and the q275 eval consume. Queries broadcast (the
    * query set is small by contract; the corpus side never shuffles).
    */
  private[graft] def chunkScores(queries: DataFrame, qIdCol: String, qTextCol: String,
                                 docs: DataFrame, dIdCol: String, textCol: String,
                                 chunkTokens: Int, overlap: Int, embDim: Int,
                                 roundTo: Int): DataFrame = {
    val emb = graft.pipeline.HashingEmbedder(embDim)
    val chunks = Chunker.chunk(docs, dIdCol, textCol, chunkTokens, overlap)
      .select(col(dIdCol), col("chunk_id"),
        emb.embedRaw(col("chunk_text")).as("__cvec"))
      .withColumn("__nsq_c", l2NormSq(col("__cvec")))
    val qs = queries.select(col(qIdCol), emb.embedRaw(col(qTextCol)).as("__qvec"))
      .withColumn("__nsq_q", l2NormSq(col("__qvec")))
    chunks.crossJoin(broadcast(qs))
      .withColumn("__sim", floorRound(
        cosineFromNormSq(col("__qvec"), col("__cvec"), col("__nsq_q"), col("__nsq_c")),
        roundTo))
      .filter(col("__sim").isNotNull) // zero-norm chunks don't compete
      .select(col(qIdCol), col(dIdCol), col("chunk_id"), col("__sim"))
  }

  /** Doc-level finish: per (query, doc) keep the best chunk (max sim,
    * lowest chunk_id on ties), then top-`k` docs per query. Two window
    * passes, both partitioned by the query — TakeOrderedAndProject-class
    * work, never a corpus-wide sort.
    */
  private[graft] def docMaxTopK(scored: DataFrame, qIdCol: String, dIdCol: String,
                                k: Int): DataFrame = {
    val wChunk = Window.partitionBy(col(qIdCol), col(dIdCol))
      .orderBy(desc("__sim"), col("chunk_id"))
    val wDoc = Window.partitionBy(col(qIdCol))
      .orderBy(desc("__sim"), col(dIdCol))
    scored
      .withColumn("__cr", row_number().over(wChunk))
      .filter(col("__cr") === 1)
      .withColumn("rn", row_number().over(wDoc).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(dIdCol), col("chunk_id").as("best_chunk"),
        col("__sim").as("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }

  /** [[docMaxTopK]] for DISTANCE scores (smaller = closer — the PQ-ADC
    * chunk finish, q286): per (query, doc) keep the nearest chunk (min
    * `__sim`, lowest chunk_id on ties), then the k nearest docs per query
    * ascending, doc_id tiebreak. Same two query-partitioned window passes.
    */
  private[graft] def docMinTopK(scored: DataFrame, qIdCol: String, dIdCol: String,
                                k: Int): DataFrame = {
    val wChunk = Window.partitionBy(col(qIdCol), col(dIdCol))
      .orderBy(col("__sim"), col("chunk_id"))
    val wDoc = Window.partitionBy(col(qIdCol))
      .orderBy(col("__sim"), col(dIdCol))
    scored
      .withColumn("__cr", row_number().over(wChunk))
      .filter(col("__cr") === 1)
      .withColumn("rn", row_number().over(wDoc).cast("long"))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(dIdCol), col("chunk_id").as("best_chunk"),
        col("__sim").as("score"), col("rn"))
      .orderBy(col(qIdCol), col("rn"))
  }
}
