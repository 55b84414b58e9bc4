package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch plan-audit tool (not product surface): prints physical-plan
  * health counters — shuffle count, join strategies, cartesian products,
  * single-partition windows — for the round's new query chains. The
  * counters are the review checklist a 100 TB plan must pass: no
  * cartesian against a non-parameter relation, no corpus-sized
  * single-partition window, broadcasts on parameter-sized sides only.
  * Artifact-backed queries are audited through their BUILD chain (the
  * stored read plan is just a parquet scan).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    def docs = graft.Tables.documents(spark, dir)
    val chains: Seq[(String, () => DataFrame)] = Seq(
      // round-16 chains kept for drift checks
      "q243_build (semanticCellDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = 16, cosThreshold = 0.95)),
      "q244_build (semanticPartitionDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticPartitionDedupFlags(docs, "doc_id", "text",
          "source", embDim = 64, cosThreshold = 0.95)),
      // round-17 chains
      "q245b_sampled_recall" -> (() =>
        graft.SparkEntry.queries("q245b_semantic_recall_sampled")(spark, dir)),
      "q248_build (pqEncodedCorpus, trained)" -> (() => {
        val e = graft.Tables.embeddings(spark, dir)
          .select(org.apache.spark.sql.functions.col("vec_id").as("c_id"),
            org.apache.spark.sql.functions.col("embedding"))
        graft.operators.AnnIndex.pqEncodedCorpus(e, "c_id", "embedding",
          m = 16, ksub = 16, dim = 64, nlist = 32)
      }),
      "q249_manifest" -> (() =>
        graft.SparkEntry.queries("q249_erasure_repair_manifest")(spark, dir)),
      "q251_build (crossModalVerdictPartitioned)" -> (() =>
        graft.operators.Dedup.crossModalVerdictPartitioned(docs, "doc_id", "text",
          "source", shingleSize = 3, numHashes = 32, bands = 16,
          jacThreshold = 0.5, containThreshold = 0.6, maxHamming = 8,
          embDim = 64, cosThreshold = 0.95)),
      // round-18 chains
      "q262_sync_delete" -> (() =>
        graft.SparkEntry.queries("q262_sync_delete_propagation")(spark, dir)),
      "q264_purge_manifest" -> (() =>
        graft.SparkEntry.queries("q264_hits_purge_manifest")(spark, dir)),
      "q267_build (auto-k semanticCellDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = graft.operators.Dedup.autoCellK(docs, "source"),
          cosThreshold = 0.95, stratifiedInit = true)))
    for ((name, fn) <- chains) {
      println(s"===== $name =====")
      try {
        // planning-cost probe (r17 verdict task 8): literal-bake regressions
        // (the CentroidArgmin pathology class) surface as expression-node
        // blowups and planning-wall growth long before they hurt execution —
        // these two columns make the check mechanical every round.
        val t0 = System.nanoTime()
        val df = fn()
        val tBuilt = System.nanoTime()
        val plan = df.queryExecution.executedPlan
        val tPlanned = System.nanoTime()
        val lines = plan.toString.split('\n')
        val exprNodes = plan.collect { case p => p }
          .flatMap(_.expressions).map(e => e.collect { case x => x }.size).sum
        println(s"  Exchanges (shuffles):    ${lines.count(_.contains("Exchange"))}")
        println(s"  BroadcastHashJoin:       ${lines.count(_.contains("BroadcastHashJoin"))}")
        println(s"  SortMergeJoin:           ${lines.count(_.contains("SortMergeJoin"))}")
        println(s"  CartesianProduct:        ${lines.count(_.contains("CartesianProduct"))}")
        println(s"  single-partition window: ${lines.count(l => l.contains("Window") && l.contains("SinglePartition"))}")
        println(s"  plan expr nodes:         $exprNodes")
        println(f"  build ms (driver prep):  ${(tBuilt - t0) / 1e6}%.0f")
        println(f"  planning ms:             ${(tPlanned - tBuilt) / 1e6}%.0f")
      } catch { case e: Throwable => println(s"  SKIP: ${String.valueOf(e.getMessage).take(100)}") }
    }
    spark.stop()
  }
}
