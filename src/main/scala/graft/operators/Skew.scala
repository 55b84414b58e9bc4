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

  /** Join-key skew audit: the hottest `topN` keys with their corpus share,
    * ratio to the MEDIAN per-key count, and the salt factor
    * ceil(n / median) that [[saltedJoin]] would need to spread that key's
    * rows across median-sized reducer slices — the pre-join report that
    * decides between a plain shuffle join, AQE skew handling, and explicit
    * salting. Exact median (the q77-proven percentile parity), single
    * per-key aggregate, top-N via TakeOrderedAndProject.
    */
  def skewAudit(df: DataFrame, keyCol: Column, topN: Int = 10,
                roundTo: Int = 6): DataFrame = {
    import graft.functions.MathFunctions.floorRound
    // cache-lifetime: pinned by the returned plan — caller releases (see Caching)
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).cast("long").as("n")).cache()
    val stats = counts.agg(
      sum("n").cast("long").as("__total"),
      expr("percentile(n, 0.5)").as("__p50"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("n"),
        floorRound(col("n").cast("double") / col("__total").cast("double"), roundTo).as("share"),
        floorRound(col("n").cast("double") / col("__p50"), 4).as("hot_ratio"),
        ceil(col("n").cast("double") / col("__p50")).cast("long").as("rec_salt"))
      .orderBy(desc("n"), col("key"))
      .limit(topN)
  }
}
