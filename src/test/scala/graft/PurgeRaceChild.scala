package graft

/** Child process of the cross-process purge/append race test (r18 verdict
  * task 4): from a SEPARATE JVM, append batches through
  * [[graft.pipeline.IndexErasure.appendBatchPurged]], each carrying one
  * row referencing the victim id (42) plus one unique safe row. The parent
  * purges id 42 once, mid-stream: with the [[graft.pipeline.FsLock]]
  * protocol every append serializes against the purge as a whole — it is
  * either fully before (its batch is live, listed, and cleansed) or fully
  * after (it reads the tombstone log and filters) — so no 42-reference can
  * survive. Without the cross-process lock an append could read the empty
  * log AND promote after the purge's listing: resurrection through the gap
  * the in-JVM `synchronized` cannot close.
  *
  * Exit: writes "<ok>/<attempts>" to the report file.
  */
object PurgeRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, nStr, report) = args
    val n = nStr.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var ok = 0
    for (i <- 1 to n) {
      try {
        graft.pipeline.IndexErasure.appendBatchPurged(spark, root, 100L + i,
          Seq("test_id", "train_id"))(
          Seq((42L, 7L), (1000L + i, 8L)).toDF("test_id", "train_id"))
        ok += 1
      } catch { case _: Throwable => () } // racing loser: documented outcome
    }
    val rep = new java.io.FileWriter(report)
    rep.write(s"$ok/$n"); rep.close()
    spark.stop()
  }
}
