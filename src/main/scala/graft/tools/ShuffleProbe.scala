package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Scratch measurement harness (not part of the product surface): runs
  * named registry queries and reports total shuffle bytes WRITTEN per query
  * via a stage-completion listener — the number behind "the fingerprint key
  * cuts shuffle volume" style claims in PERF notes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ShuffleProbe q149 q163
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shuffleWrite = new AtomicLong(0)
    val shuffleRecords = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shuffleRecords.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })
    for (prefix <- args) {
      val hits = graft.SparkEntry.queries.filter(_._1.contains(prefix))
      for ((name, fn) <- hits) {
        spark.catalog.clearCache()
        shuffleWrite.set(0); shuffleRecords.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        // listener events are async — drain the bus deterministically before
        // reading the counters (a fixed sleep can under-report under load)
        org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 30000)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[shuffle] $name%-28s ${shuffleWrite.get / 1048576.0}%10.2f MiB " +
          f"${shuffleRecords.get}%12d rows $dt%8.2f s")
      }
    }
    spark.stop()
  }
}
