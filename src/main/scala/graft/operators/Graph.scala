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
    // the out-degree ≥ 1 contract is load-bearing (dangling nodes silently
    // leak mass and dst-only nodes drop out of the vector) — fail loudly
    // instead; the check is one node-count-sized job against the
    // checkpointed edges. Directed graphs with dangling nodes belong in
    // [[pageRankWeighted]], which redistributes dangling mass properly.
    val nDangling = e.select(col("dst").as("id")).distinct()
      .join(nodes, Seq("id"), "left_anti").count()
    require(nDangling == 0,
      s"pageRank: $nDangling node(s) have in-edges but no out-edges; " +
        "symmetrize the edge list or use pageRankWeighted (handles dangling mass)")
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

  /** General PageRank: edge WEIGHTS (contribution ∝ weight / weighted
    * out-degree) and DANGLING-MASS redistribution — the variant that is
    * correct for any directed edge list a user brings, not just the
    * symmetrized near-dup graphs [[pageRank]] is specialized for. A node
    * with in-edges but no out-edges (dangling) donates its whole rank
    * uniformly to every node each iteration (Brin & Page 1998 §2.1.1's
    * standard fix), and nodes with no in-edges keep receiving teleport +
    * dangling mass instead of dropping out of the vector.
    *
    * Still SQL-expressible as unrolled iterations (the q146 oracle): per
    * iteration one edges⋈ranks join + keyed sum, one anti-join aggregate
    * for the dangling mass (a one-row broadcast), one left join to cover
    * in-degree-0 nodes. Node set and edges are localCheckpointed once, so
    * per-iteration lineage stays flat at cluster scale.
    */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int,
                       damping: Double = 0.85, teleport: Double = 0.15,
                       roundTo: Int = 6): DataFrame = {
    require(iters >= 1, s"pageRankWeighted needs iters >= 1, got $iters")
    require(math.abs(damping + teleport - 1.0) < 1e-12,
      s"damping ($damping) and teleport ($teleport) must sum to 1")
    val e = edges.select(
        col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("double").as("__w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = nodes.count() // one parameter-sized job fixes the node count
    if (n == 0) return nodes.withColumn("pr", lit(0.0))
    val wdeg = e.groupBy("src").agg(sum("__w").as("__wd")) // out-nodes only
    var ranks = nodes.withColumn("__r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(wdeg, Seq("src"))
        .select(col("dst").as("id"), (col("__r") * col("__w") / col("__wd")).as("__c"))
        .groupBy("id").agg(sum("__c").as("__c"))
      // rank currently sitting on nodes with no out-edges: redistributed
      // uniformly. One-row aggregate -> broadcast, never a real cross join.
      val dangling = ranks
        .join(wdeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum("__r"), lit(0.0)).as("__dm"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(teleport / n) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dm") / lit(n.toDouble))).as("__r"))
        // the rank vector is referenced TWICE next iteration (contributions
        // AND the dangling aggregate) — without materializing it the plan
        // doubles per iteration. Checkpointing the node-count-sized vector
        // each step is the standard Pregel superstep barrier.
        .localCheckpoint()
    }
    ranks.select(col("id"), floorRound(col("__r"), roundTo).as("pr")).orderBy("id")
  }
}
