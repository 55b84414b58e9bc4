package graft.streaming

import graft.Tables
import graft.functions.MathFunctions.floorRound
import graft.operators.AnnIndex
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming IVF-PQ probe — the serving topology of [[AnnIndex.pqTopK]]:
  * query vectors arrive as a structured stream, their cell probes and ADC
  * lookup tables are computed as pure map-side expressions (the PqEncode /
  * PqAdcTable native kernels run unchanged inside the streaming plan), and
  * candidates come from a stream-static join against the STANDING encoded
  * corpus. No streaming state: per-candidate ADC scoring is stateless, and
  * the per-query top-k ranking runs batch-side on the drained candidates —
  * the same emit-then-reconcile pattern as [[StreamingDedup]].
  *
  * Because both topologies compose the IDENTICAL plan pieces
  * ([[AnnIndex.pqParts]]: same centroids, same codebooks, same floor-rounded
  * ADC arithmetic), the streamed result is row-for-row equal to the batch
  * [[AnnIndex.pqTopK]] — which is exactly what q151's oracle (the q135 SQL)
  * checks.
  *
  * At 100 TB the static side is the precomputed (cell, codes) index of the
  * corpus (here derived inline from the fixture); each arriving query batch
  * costs O(batch · nprobe) probe rows equi-joined against it — never a
  * corpus rescan, never an all-pairs score.
  */
object StreamingAnn {

  /** Top-k IVF-PQ neighbors for streamed queries (vec_id < 10 of the
    * embeddings fixture) against the static full corpus; row-identical to
    * the batch [[AnnIndex.pqTopK]] with the same parameters.
    */
  def pqProbeTopK(spark: SparkSession, dir: String,
                  k: Int, m: Int, ksub: Int, dim: Int,
                  nlist: Int, nprobe: Int, roundTo: Int = 6,
                  codebooks: Option[Array[Array[Seq[Double]]]] = None): DataFrame = {
    val corpus = Tables.embeddings(spark, dir).withColumnRenamed("vec_id", "c_id")
    val (enc, qbOf, adist) =
      AnnIndex.pqParts(corpus, "c_id", "embedding", m, ksub, dim, nlist, nprobe, codebooks)

    val qStream = StreamingAgg.streamTable(spark, dir, "embeddings.parquet")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // stream-static equi-join on the probed cell; scoring is stateless
    val scored = qbOf(qStream, "q_id", "q_vec")
      .join(enc, Seq("__cell"))
      .filter(col("q_id") =!= col("c_id")) // excludeSelf, as in q135
      .withColumn("score", floorRound(adist, roundTo))
      .select(col("q_id"), col("c_id"), col("score"))
    val drained = StreamingAgg.drain(scored, "graft_stream_pq", "append")

    // batch-side reconciliation: rank the drained candidate set per query
    val w = Window.partitionBy(col("q_id")).orderBy(col("score"), col("c_id"))
    drained.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Streaming SEMANTIC-dedup ingest gate — the streaming row of the
    * semantic axis ([[graft.operators.Dedup.semDeDup]] is the batch form):
    * NEW embeddings arrive as a stream, each assigns its IVF cell as a pure
    * map-side expression (literal trained centroids — the same argmin
    * convention as the batch dedup), probes the STANDING corpus's members
    * of that cell via a stream-static equi-join, and every pair at cosine
    * ≥ `tau` folds into per-new-item verdict state (complete-mode count +
    * max — an additive/idempotent monoid, so batch boundaries are
    * invisible). Output: one row per flagged new item (vec_id, n_matches,
    * best_sim); items matching nothing pass the gate silently (the
    * complement set), which is the ingest-gate contract — report what you
    * would REJECT.
    *
    * Scale: the standing side is the cell-partitioned corpus index (at
    * 100 TB: precomputed, cell-bucketed); each arriving batch costs its
    * own cell assignment plus one equi-join into its own cells' members —
    * never a corpus rescan, never all-pairs. State is bounded by flagged
    * new items, not by the corpus.
    */
  def semanticIngestGate(spark: SparkSession, dir: String,
                         idExpr: String, vecExpr: String, deltaFilter: String,
                         corpus: DataFrame, cents: Seq[Seq[Double]], tau: Double,
                         roundTo: Int = 6): DataFrame = {
    import graft.functions.VectorFunctions.{asDouble, cosineFromNormSq, l2NormSq}
    // one codegen kernel node instead of nlist·dim centroid literals — on
    // this STREAMING path the literal tree re-planned every micro-batch
    // (the q214 pathology class; see AnnIndex.argminCell)
    val mat = graft.operators.AnnIndex.centMat(cents)
    def cellOf(vec: org.apache.spark.sql.Column) =
      graft.operators.AnnIndex.argminCell(vec, mat).cast("long")
    val stat = corpus
      .select(col("c_id").cast("long").as("c_id"), asDouble(col("cvec")).as("cv"))
      .withColumn("cell", cellOf(col("cv")))
      .withColumn("c_nsq", l2NormSq(col("cv")))
    val stream = StreamingAgg.streamTable(spark, dir, "embeddings.parquet")
      .filter(expr(deltaFilter))
      .select(expr(idExpr).cast("long").as("vec_id"), asDouble(expr(vecExpr)).as("dv"))
      .withColumn("cell", cellOf(col("dv")))
      .withColumn("d_nsq", l2NormSq(col("dv")))
    val matched = stream.join(stat, Seq("cell"))
      .withColumn("sim", floorRound(
        cosineFromNormSq(col("dv"), col("cv"), col("d_nsq"), col("c_nsq")), roundTo))
      .filter(col("sim") >= tau)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_matches"), max("sim").as("best_sim"))
    StreamingAgg.drain(matched, "graft_stream_semgate", "complete")
      .orderBy("vec_id")
  }
}
