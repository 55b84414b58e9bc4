package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle data once at write time so repeated
  * joins/aggregations on the bucket key run shuffle-free. At 100 TB this is
  * the difference between re-shuffling a fact table per query and reading
  * co-located buckets.
  */
object Bucketing {

  /** Persist `df` as a bucketed (+ sorted) managed parquet table. Drops any
    * previous table AND its leftover warehouse location (an in-memory catalog
    * from a prior JVM forgets the table but leaves the files, which
    * saveAsTable then refuses to overwrite).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath.stripSuffix("/") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange of any
    * kind (hash, range, or single-partition) — the property bucketed
    * co-located joins buy. Broadcast exchanges are not shuffles and are
    * excluded.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    "(?<!Broadcast)Exchange".r
      .findFirstIn(df.queryExecution.executedPlan.toString)
      .isEmpty

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
