package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Scratch measurement harness (not part of the product surface): runs the
  * banded pair joins over a DELIBERATELY skewed synthetic corpus with and
  * without salting and reports the max single-task wall time — the number
  * behind the PERF claim that [[graft.operators.Salting]] bounds straggler
  * tasks on a hot band bucket. Usage: runMain graft.tools.SkewProbe [nHot]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nHot = args.headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxTaskMs = new AtomicLong(0)
    val nTasks = new AtomicLong(0)
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val ms = te.taskInfo.duration
        nTasks.incrementAndGet()
        var cur = maxTaskMs.get()
        while (ms > cur && !maxTaskMs.compareAndSet(cur, ms)) cur = maxTaskMs.get()
        perStage.merge(te.stageId, (ms, 1),
          (a, b) => (math.max(a._1, b._1), a._2 + b._2))
      }
    })
    // skewed corpus: nHot byte-identical "viral" blobs (one hot band bucket
    // per band) + a quiet background of unique blobs
    val corpus = spark.range(nHot + 600).select(col("id"),
      when(col("id") < nHot, concat(lit("VIRAL"), lit("x" * 600)))
        .otherwise(concat(md5(col("id").cast("string")), lit("y" * 80))).as("m"))
      .cache()
    corpus.count()
    for (salts <- Seq(1, 16)) {
      spark.catalog.clearCache()
      corpus.cache().count()
      maxTaskMs.set(0); nTasks.set(0); perStage.clear()
      val t0 = System.nanoTime()
      graft.multimodal.Multimodal.mediaDupPairs(corpus, "id", "m",
        maxHamming = 3, salts = salts)
        .write.mode("overwrite").format("noop").save()
      org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 30000)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skew] mediaDupPairs salts=$salts%-3d wall $dt%6.2f s  " +
        f"maxTask ${maxTaskMs.get}%6d ms  tasks ${nTasks.get}%5d")
      import scala.jdk.CollectionConverters._
      val top = perStage.asScala.toSeq.sortBy(-_._2._1).take(3)
      for ((sid, (ms, n)) <- top)
        println(f"[skew]   stage $sid%-4d maxTask $ms%6d ms over $n%4d tasks")
    }
    // suffix-rank leg (r11 verdict task 4): an all-same-character corpus
    // keys every position of every early doubling round to ONE (r, r2)
    // pair — the re-rank join's hot key. Measure the max single task with
    // and without the denseRank salt.
    val degen = spark.range(16).select(col("id"),
      concat(lit("a" * 400), md5(col("id").cast("string")).substr(1, 4)).as("t"))
      .cache()
    degen.count()
    for (saltRank <- Seq(1, 8)) {
      maxTaskMs.set(0); nTasks.set(0); perStage.clear()
      val t0 = System.nanoTime()
      graft.operators.SuffixRank.rankTables(degen, "id", "t", saltRank)
        .last._2.write.mode("overwrite").format("noop").save()
      org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 30000)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skew] suffixRank saltRank=$saltRank%-3d wall $dt%6.2f s  " +
        f"maxTask ${maxTaskMs.get}%6d ms  tasks ${nTasks.get}%5d")
      spark.catalog.clearCache()
      degen.cache().count()
    }
    spark.stop()
  }
}
