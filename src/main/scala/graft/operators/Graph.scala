package graft.operators

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Graph centrality over relational edge lists — the ranking layer above the
  * near-dup machinery: [[Dedup.clusters]] tells you WHICH documents form a
  * duplicate community, PageRank tells you which members are central to it
  * (a principled representative-selection signal next to min-id).
  */
object Graph {

  /** Fixed-iteration PageRank (Brin & Page, WWW 1998) over a directed edge
    * list; pass both directions for an undirected graph. Contract: every
    * node has out-degree ≥ 1 (true for symmetrized edges) — the
    * dangling-mass redistribution of the general algorithm is deliberately
    * omitted, which keeps every step a plain join + keyed sum and the whole
    * computation SQL-expressible as unrolled iterations (the q144 oracle).
    *
    * `damping` and `teleport` are BOTH explicit: deriving `1 − 0.85` at
    * runtime yields 0.15000000000000002 and would silently diverge from an
    * oracle's literal 0.15 (the same pitfall as MMR's λ).
    *
    * Scale shape: per iteration one join of edges against the rank vector
    * and one keyed sum — at cluster scale both sides co-partition on the
    * node id, the classic Pregel-as-joins layout. Edges are localCheckpointed
    * once so the (possibly expensive) edge-derivation lineage does not
    * re-execute per iteration.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85, teleport: Double = 0.15,
               roundTo: Int = 6): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    require(math.abs(damping + teleport - 1.0) < 1e-12,
      s"damping ($damping) and teleport ($teleport) must sum to 1")
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id")).distinct()
    val n = nodes.count() // one parameter-sized job fixes the node count
    if (n == 0) return nodes.withColumn("pr", lit(0.0))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("__deg"))
    var ranks = nodes.withColumn("__r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), (col("__r") / col("__deg").cast("double")).as("__c"))
      // every node of a symmetrized graph has in-edges, so grouping the
      // contributions covers the full node set each iteration
      ranks = contrib.groupBy("id")
        .agg((lit(teleport / n) + lit(damping) * sum("__c")).as("__r"))
    }
    ranks.select(col("id"), floorRound(col("__r"), roundTo).as("pr")).orderBy("id")
  }
}
