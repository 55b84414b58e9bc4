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
  /** `events.ts` arrives in whatever resolution the fixture generator used:
    * TIMESTAMP(NANOS) parquet (readable only with
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in Verify/Bench/test
    * sessions — lands as LongType nanos) or TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (lands as TIMESTAMP_NTZ). Normalize both to a
    * session-zoned TIMESTAMP: `div` truncates toward zero — identical to
    * DuckDB's ns→µs cast for post-epoch timestamps — and the NTZ cast
    * interprets wall-clock as UTC (all sessions pin
    * `spark.sql.session.timeZone=UTC`), matching DuckDB's naive reading.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
