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
    import graft.functions.expressions.BucketCountVector
    import org.apache.spark.sql.{GraftSqlBridge => B}
    // hash tokens to buckets ONCE (HOF lambda bodies re-evaluate per element),
    // then count + L2-normalize in a fused single-pass kernel — the HOF
    // formulation allocates a dim-length array per token
    val buckets = transform(TextFunctions.tokens(text),
      t => pmod(xxhash64(t), lit(dim.toLong)).cast("int"))
    B.column(BucketCountVector(B.expression(buckets), dim))
  }
}
