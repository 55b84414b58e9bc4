package graft.operators

import graft.functions.MathFunctions.floorRound
import graft.functions.VectorFunctions.{cosineFromNormSq, l2NormSq}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Contrastive training-pair mining over an embedding column: for each
  * anchor, the top-`kPos` cosine neighbors as positives and `kNeg`
  * deterministically hash-picked non-neighbors as negatives — the
  * (anchor, positive, negative) triplet feed of contrastive/embedding
  * distillation training (e.g. SimCSE/DPR-style batches), built from the
  * corpus itself.
  *
  * Determinism everywhere: anchors are an id-modulus sample, negatives are
  * ranked by the same mixing hash the sampling family uses ([[Sampling
  * .hashUniform]]) keyed on the (anchor, candidate) pair — so reruns,
  * repartitioning, and the DuckDB oracle all select identical triplets.
  *
  * Plan shape at 100 TB: the anchor set broadcasts (it is a sample);
  * scoring is one map-side pass over the corpus per anchor batch with
  * norms precomputed per row ([[cosineFromNormSq]]); both rankings are
  * `row_number <= k` windows, which Spark rewrites to map-side
  * WindowGroupLimit — k·partitions rows reach the shuffle, never the full
  * scored set. Zero-norm vectors have no direction to contrast and are
  * excluded on both sides.
  */
object Contrastive {

  def minePairs(emb: DataFrame, idCol: String, vecCol: String,
                anchorMod: Long, kPos: Int, kNeg: Int,
                roundTo: Int = 6): DataFrame = {
    require(anchorMod >= 1 && kPos >= 1 && kNeg >= 0,
      s"need anchorMod >= 1, kPos >= 1, kNeg >= 0; got $anchorMod/$kPos/$kNeg")
    val nonZero = emb.filter(l2NormSq(col(vecCol)) > 0)
    val anchors = nonZero
      .select(col(idCol).as("anchor_id"), col(vecCol).as("__av"))
      .withColumn("__na", l2NormSq(col("__av")))
    val cands = nonZero
      .select(col(idCol).as("pair_id"), col(vecCol).as("__cv"))
      .withColumn("__nc", l2NormSq(col("__cv")))
    val scored = cands
      .join(broadcast(anchors.filter(col("anchor_id") % anchorMod === 0)),
        col("pair_id") =!= col("anchor_id"))
      .withColumn("score",
        floorRound(cosineFromNormSq(col("__cv"), col("__av"), col("__nc"), col("__na")), roundTo))
      .select("anchor_id", "pair_id", "score")
      .cache() // ranked twice (positives, negatives) — one scoring pass
    val pos = scored
      .withColumn("pair_rank",
        row_number().over(Window.partitionBy("anchor_id")
          .orderBy(desc("score"), col("pair_id"))).cast("long"))
      .filter(col("pair_rank") <= kPos)
    val pri = Sampling.hashUniform(col("anchor_id") * lit(1000003L) + col("pair_id"))
    val neg = scored
      .join(pos.select("anchor_id", "pair_id"), Seq("anchor_id", "pair_id"), "left_anti")
      .withColumn("pair_rank",
        row_number().over(Window.partitionBy("anchor_id")
          .orderBy(pri, col("pair_id"))).cast("long"))
      .filter(col("pair_rank") <= kNeg)
    pos.withColumn("kind", lit("pos"))
      .unionByName(neg.withColumn("kind", lit("neg")))
      .select("anchor_id", "pair_id", "kind", "pair_rank", "score")
      .orderBy("anchor_id", "kind", "pair_rank")
  }
}
