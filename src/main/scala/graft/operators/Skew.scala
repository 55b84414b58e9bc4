package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-handling join utilities for cluster scale.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins; salting
  * is the explicit fallback when a broadcastable-but-skewed key distribution
  * must go through a shuffle join — e.g. joining a fact table against
  * per-key aggregates where a handful of hot keys hold most rows.
  *
  * `saltedJoin` replicates the (small) right side `salt` times and scatters
  * the left side uniformly across the replicas, so a hot key's rows spread
  * over `salt` reducers instead of one.
  */
object Skew {

  /** Equi-join `left.keyCol == right.keyCol` with `salt`-way key splitting.
    * `right` rows are replicated `salt` times (keep it the smaller side).
    * Result columns = left columns ++ right columns minus the join key dup.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right rows are replicated `salt` times, so only left-preserving join
    // types are sound — an unmatched right row would surface once per replica
    val ok = Set("inner", "cross", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(ok.contains(joinType.toLowerCase.replace("_", "")) ||
            ok.contains(joinType.toLowerCase),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    // deterministic scatter: hash of the whole left row, not rand() — keeps
    // results reproducible run to run
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toSeq.map(col): _*), lit(salt)).cast("int"))
    val rightSalted = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    leftSalted.join(rightSalted, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heavy-hitter keys by row count — the diagnostic used to decide
    * whether a join needs salting at all.
    */
  def heavyHitters(df: DataFrame, keyCol: Column, topN: Int = 20): DataFrame =
    df.groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("key"))
      .limit(topN)
}
