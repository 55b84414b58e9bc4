package graft.pipeline

import org.apache.spark.sql.Column

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
  /** Stable identifier of the embedding FUNCTION (family + version + dim).
    * Persisted into the vector index it fills: vectors from different
    * embedders are mutually meaningless, and a query embedded with embedder
    * B against an index built with embedder A would silently return garbage
    * neighbors — the index refuses the mix instead
    * ([[VectorIndex.upsert]]). Bump the version part whenever the function's
    * output changes for any input.
    */
  def id: String
  /** Embed a text column into array<double> of length `dim`, L2-normalized. */
  def embed(text: Column): Column
  /** Pre-normalization view of [[embed]] (raw feature weights); defaults to
    * the normalized embedding for embedders without a meaningful raw stage.
    */
  def embedRaw(text: Column): Column = embed(text)
}

/** Deterministic feature-hashing embedder: token -> polynomial-hash bucket in
  * [0, dim); bucket counts, L2-normalized. Both stages are fused single-pass
  * kernels, so embedding runs inside whole-stage codegen.
  *
  * The token hash is the SQL-expressible byte polynomial of
  * [[graft.functions.expressions.PolyTokenBuckets]] (not xxhash64) so the
  * full embedding pipeline has a DuckDB oracle (q35): deterministic
  * feature hashing only needs a well-mixed hash, and checkability across
  * engines is worth more than xxhash64's marginally better avalanche.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  import graft.functions.expressions.{BucketCountVector, PolyTokenBuckets}
  import org.apache.spark.sql.{GraftSqlBridge => B}

  // v2 = polynomial bucket hash (v1 was xxhash64); code-point iteration is
  // output-identical on ASCII but not beyond, hence the explicit version
  override def id: String = s"graft-hashing-v2:dim=$dim"

  override def embed(text: Column): Column =
    B.column(BucketCountVector(PolyTokenBuckets(B.expression(text), dim), dim))

  /** Raw bucket counts (array<double>, integer-valued) — exact integer math,
    * the view the q35 oracle checks.
    */
  override def embedRaw(text: Column): Column =
    B.column(BucketCountVector(PolyTokenBuckets(B.expression(text), dim), dim, normalize = false))
}
