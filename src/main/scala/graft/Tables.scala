package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders (SURVEY.md §2.1 S8).
  *
  * All tables are plain parquet under a scale-factor directory
  * (`/root/repo/TESTDATA.md`). Loading through `spark.read.parquet` keeps the
  * scan declarative so Catalyst applies column pruning + predicate pushdown —
  * at 100 TB the same call reads only the referenced columns/row-groups.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/test
    * sessions). Normalize back to a proper timestamp here (`div` truncates
    * toward zero — identical to DuckDB's ns->µs cast for the post-epoch
    * timestamps these fixtures contain).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
