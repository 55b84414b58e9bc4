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
      "q239_stream_export_cdc_tttd" -> (() =>
        graft.SparkEntry.queries("q239_stream_export_cdc_tttd")(spark, dir)),
      "q241_erasure_packed_delta" -> (() =>
        graft.SparkEntry.queries("q241_erasure_packed_delta")(spark, dir)),
      "q242_export_manifest_cdc_bounded" -> (() =>
        graft.SparkEntry.queries("q242_export_manifest_cdc_bounded")(spark, dir)),
      "q243_build (semanticCellDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticCellDedupFlags(docs, "doc_id", "text",
          embDim = 64, k = 16, cosThreshold = 0.95)),
      "q244_build (semanticPartitionDedupFlags)" -> (() =>
        graft.operators.Dedup.semanticPartitionDedupFlags(docs, "doc_id", "text",
          "source", embDim = 64, cosThreshold = 0.95)))
    for ((name, fn) <- chains) {
      println(s"===== $name =====")
      try {
        val lines = fn().queryExecution.executedPlan.toString.split('\n')
        println(s"  Exchanges (shuffles):    ${lines.count(_.contains("Exchange"))}")
        println(s"  BroadcastHashJoin:       ${lines.count(_.contains("BroadcastHashJoin"))}")
        println(s"  SortMergeJoin:           ${lines.count(_.contains("SortMergeJoin"))}")
        println(s"  CartesianProduct:        ${lines.count(_.contains("CartesianProduct"))}")
        println(s"  single-partition window: ${lines.count(l => l.contains("Window") && l.contains("SinglePartition"))}")
      } catch { case e: Throwable => println(s"  SKIP: ${String.valueOf(e.getMessage).take(100)}") }
    }
    spark.stop()
  }
}
