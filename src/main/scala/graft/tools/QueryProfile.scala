package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch profiling harness (not part of the product surface): runs named
  * registry queries under the Bench timing protocol (clearCache + noop
  * sink) several times and prints a PER-JOB wall breakdown of the last
  * (warm) iteration — the localization step the optimization guide's §1
  * empirical loop needs when the Spark UI is unavailable (ui disabled in
  * the bench protocol). Job count itself is a first-class metric here: at
  * bench scale a lifecycle chain's wall is mostly (jobs × scheduling/codegen
  * overhead), so "which call site submits how many jobs" is the question.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *          runMain graft.tools.QueryProfile q282 q292 [iters=3]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val names = args.filterNot(_.forall(_.isDigit))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class JobRec(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[Int]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execSite.put(s.executionId, s.description.linesIterator.take(1).mkString)
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val desc = p.flatMap(x => Option(x.getProperty("spark.job.description")))
          .orElse(p.flatMap(x => Option(x.getProperty("spark.sql.execution.id")))
            .map(id => s"exec#$id ${execSite.getOrDefault(id.toLong, "")}"))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, JobRec(js.jobId, desc, js.time, -1))
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    })
    val all = graft.SparkEntry.queries
    names.foreach { q =>
      val fn = all.getOrElse(q,
        all.collectFirst { case (k, f) if k.startsWith(q) => f }.getOrElse(
          sys.error(s"no query matching $q")))
      var last = 0.0
      (1 to iters).foreach { i =>
        spark.catalog.clearCache()
        jobs.clear(); order.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        last = (System.nanoTime() - t0) / 1e9
        println(f"[qprof] $q iter $i: $last%.2f s, ${order.size} jobs")
      }
      // per-job breakdown of the last (warm) iteration
      import scala.jdk.CollectionConverters._
      var prevEnd = -1L
      order.asScala.foreach { id =>
        val r = jobs.get(id)
        val dur = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (r.start - prevEnd) / 1e3 else 0.0
        prevEnd = if (r.end > 0) r.end else prevEnd
        println(f"[qprof]   job ${r.id}%3d ${dur}%7.3f s (gap before ${gap}%6.3f s)  ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
