package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew kill-switch for the banded pair joins (round-10 verdict task 4).
  *
  * Every near-dup pairing site (SimHash bands, media dHash bands, perceptual
  * frame bands) is a self-equi-join on a bucket key. The `maxDf` /
  * stop-frame caps bound the SIZE of a surviving bucket, but a single hot
  * bucket AT the cap still lands its whole O(k²) pair generation in one
  * task — at 1000 executors that one straggler sets the stage's wall-clock.
  * AQE's skew split can help when the join is sort-merge AND the hot
  * partition crosses its BYTE threshold — but these buckets are slim
  * (id, hash) rows whose cost is quadratic pair COMPUTE, not bytes, so a
  * time-straggler routinely sits far below the size trigger. The salt is
  * deterministic and threshold-free.
  *
  * The fix is the standard two-stage salt, shaped for PAIR generation: the
  * right side is split into `salts` deterministic sub-buckets by id hash,
  * the (slim) left side is replicated once per sub-bucket, and the join key
  * grows by the salt — a hot bucket's pair work then spreads over `salts`
  * independent tasks (each k·k/salts), while pair coverage stays EXACT:
  * pair (a, b) meets in exactly one task, the one holding b's salt. Total
  * work is unchanged (it is inherent to the operator's semantics); what the
  * salt buys is bounded per-TASK work, which is what survives a 100×
  * scale-up. Cost: the left rows (id + 8-byte hash — the blobs never reach
  * these joins) shuffle `salts`×.
  *
  * `salts = 1` is the identity (no replication, plain join) — the default
  * everywhere, so small-corpus plans pay nothing.
  */
object Salting {

  /** `left.join(right, keys)` with the right side salted `salts` ways by
    * `rightIdCol`'s hash and the left side replicated across the salt
    * domain. Row-for-row equal to the unsalted join for any `salts`
    * (asserted in ScaleSpec).
    */
  def saltedSelfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     rightIdCol: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    if (salts == 1) left.join(right, keys)
    else {
      val l = left.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      val r = right.withColumn("__salt", pmod(hash(col(rightIdCol)), lit(salts)))
      l.join(r, keys :+ "__salt").drop("__salt")
    }
  }
}
