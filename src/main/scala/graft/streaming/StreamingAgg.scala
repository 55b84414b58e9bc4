package graft.streaming

import graft.functions.MathFunctions.floorRound
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming surface (SURVEY.md §2.7). The reference's
  * "streaming" is a cron batch (reference `README.md:23-36`); the idiomatic
  * Spark analog is the file source + `Trigger.AvailableNow` — incremental,
  * exactly-once per micro-batch, and drained synchronously so results stay
  * batch-comparable (and DuckDB-oracle-checkable).
  */
object StreamingAgg {
  private val counter = new AtomicInteger(0)

  /** Monthly order stats computed *through the streaming engine* over the
    * orders fixture, drained with AvailableNow into a memory sink. Result is
    * identical to the equivalent batch aggregation — that equivalence is the
    * oracle check. (orders, not events: the streaming parquet source rejects
    * the events table's TIMESTAMP(NANOS) ts column.)
    */
  def monthlyOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    val sdf = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
    val agg = sdf
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), floorRound(sum("o_totalprice"), 2).as("total"))
    val name = s"graft_stream_monthly_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("month")
  }

  /** Stream-stream inner equi-join through the streaming engine: both sides
    * are file-source streams; matches accumulate in symmetric join state and
    * emit in append mode as they pair up across micro-batches. (Unbounded
    * corpora would add watermarks + a time-range condition to bound the
    * state; AvailableNow over fixtures doesn't need one.) The oracle is the
    * equivalent batch join.
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val oSchema = spark.read.parquet(s"$dir/orders.parquet").schema
    val lSchema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val o = spark.readStream.schema(oSchema)
      .option("pathGlobFilter", "orders.parquet").parquet(dir)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = spark.readStream.schema(lSchema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
      // mirror the key predicate on BOTH inputs: rows that can never match
      // must not enter the symmetric join state (an inner equi-join lets the
      // same residual apply to each side)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val joined = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "l_linenumber", "l_quantity")
    val name = s"graft_stream_join_${counter.incrementAndGet()}"
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("o_orderkey", "l_linenumber")
  }

  /** Stateful streaming dedup: the distinct customer-key set computed
    * THROUGH the streaming engine (`dropDuplicates` keeps a state-store
    * entry per seen key and emits each key exactly once across ALL
    * micro-batches — the streaming analog of exact dedup). Key-only output
    * keeps the result deterministic and batch-comparable, which is the
    * oracle check. Unbounded corpora would bound the state with
    * `withWatermark` + `dropDuplicatesWithinWatermark`; AvailableNow over a
    * fixture doesn't need it.
    */
  def distinctCustomers(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    val sdf = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
    val dedup = sdf.select(col("o_custkey")).dropDuplicates("o_custkey")
    val name = s"graft_stream_dedup_${counter.incrementAndGet()}"
    val q = dedup.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("o_custkey")
  }
}
