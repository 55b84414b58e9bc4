package graft.pipeline

import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable document embedder (SURVEY.md §2.8 F3).
  *
  * The reference embeds with a remote OpenAI call, one document per RPC
  * (reference `vectrekker/main.py:180-183`) — unreachable offline and a
  * throughput anti-pattern. The trait keeps the contract (fixed dimension,
  * deterministic, normalized); the default implementation is a local
  * feature-hashing embedder expressed as a codegen'd Column, so embedding runs
  * inside the scan stage with zero RPCs and zero serialization boundaries —
  * batched "for free" by Spark partitioning.
  */
trait Embedder {
  def dim: Int
  /** Embed a text column into array<double> of length `dim`, L2-normalized. */
  def embed(text: Column): Column
}

/** Deterministic feature-hashing embedder: token -> xxhash64 bucket in
  * [0, dim); bucket counts, L2-normalized. O(dim · tokens) inside whole-stage
  * codegen.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  override def embed(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val counts = aggregate(
      toks,
      array_repeat(lit(0.0), dim),
      (acc, t) => {
        val b = pmod(xxhash64(t), lit(dim.toLong)).cast("int")
        zip_with(acc, sequence(lit(0), lit(dim - 1)),
          (c, i) => c + when(i === b, lit(1.0)).otherwise(lit(0.0)))
      })
    VectorFunctions.l2Normalize(counts)
  }
}
