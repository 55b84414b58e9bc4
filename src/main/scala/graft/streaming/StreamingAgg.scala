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

  /** One fixture table as a file-source stream (schema probed from the same
    * parquet — streaming sources need an explicit schema).
    */
  private[streaming] def streamTable(spark: SparkSession, dir: String, file: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/$file").schema)
      .option("pathGlobFilter", file)
      .parquet(dir)

  /** Drain a streaming frame synchronously through a memory sink with
    * AvailableNow; returns the drained table.
    *
    * `statePartitions` sizes the state stores: a stateful streaming query
    * pins its state partitioning to `spark.sql.shuffle.partitions` AT FIRST
    * START, and every micro-batch commits every store — so the per-batch
    * floor cost is proportional to the partition count, independent of data.
    * Size it to expected STATE VOLUME (keys held), not to the batch shuffle
    * default: the fixtures hold thousands of keys, where 8 stores cut the
    * q63 stream-stream join from 4.2 s to 1.8 s with identical results. A
    * real deployment with billions of keys raises it; the setting is
    * per-query (restored after the drain), so batch plans are untouched.
    */
  // serializes the set→start→drain→restore window below: interleaved drains
  // would otherwise read each other's overridden value as the "default" and
  // leave the session conf permanently clobbered
  private val drainLock = new Object

  private[streaming] def drain(df: DataFrame, prefix: String, mode: String,
                               statePartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val name = s"${prefix}_${counter.incrementAndGet()}"
    drainLock.synchronized {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
      try {
        val q = df.writeStream
          .outputMode(mode)
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    df.sparkSession.table(name)
  }

  /** Monthly order stats computed *through the streaming engine* over the
    * orders fixture. Result is identical to the equivalent batch aggregation
    * — that equivalence is the oracle check. (orders, not events: the
    * streaming parquet source rejects the events table's TIMESTAMP(NANOS)
    * ts column.)
    */
  def monthlyOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val agg = streamTable(spark, dir, "orders.parquet")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), floorRound(sum("o_totalprice"), 2).as("total"))
    drain(agg, "graft_stream_monthly", "complete").orderBy("month")
  }

  /** Stream-stream inner equi-join through the streaming engine: both sides
    * are file-source streams; matches accumulate in symmetric join state and
    * emit in append mode as they pair up across micro-batches. (Unbounded
    * corpora would add watermarks + a time-range condition to bound the
    * state; AvailableNow over fixtures doesn't need one.) The oracle is the
    * equivalent batch join.
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = streamTable(spark, dir, "orders.parquet")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = streamTable(spark, dir, "lineitem.parquet")
      // mirror the key predicate on BOTH inputs: rows that can never match
      // must not enter the symmetric join state (an inner equi-join lets the
      // same residual apply to each side)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val joined = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "l_linenumber", "l_quantity")
    drain(joined, "graft_stream_join", "append").orderBy("o_orderkey", "l_linenumber")
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
    val dedup = streamTable(spark, dir, "orders.parquet")
      .select(col("o_custkey")).dropDuplicates("o_custkey")
    drain(dedup, "graft_stream_dedup", "append").orderBy("o_custkey")
  }

  /** [[distinctCustomers]] with BOUNDED state: `dropDuplicatesWithinWatermark`
    * holds a key only until the watermark passes its event time, instead of
    * forever — the production shape for unbounded streams, where plain
    * `dropDuplicates` state grows with the distinct-key count of all time.
    * The contract weakens accordingly: duplicates are only suppressed while
    * the key is in state, so a key can re-emit after `delay` of event time —
    * the output is distinct per (key, watermark window), deduplicated here
    * to stay comparable with the batch DISTINCT oracle (parity shows the
    * watermark variant LOSES nothing on this data while bounding state).
    */
  def distinctCustomersBounded(spark: SparkSession, dir: String,
                               delay: String = "30 days"): DataFrame =
    boundedDedupDrain(spark, dir, schemaFrom = s"$dir/orders.parquet",
      glob = "orders.parquet", delay = delay, maxFilesPerTrigger = None)
      .dropDuplicates("o_custkey").orderBy("o_custkey")

  /** The raw watermark-bounded dedup drain, BEFORE the final batch-side
    * dropDuplicates — one row per (key, state residency window). Exposed so
    * the loss case is testable: a key recurring after eviction re-emits
    * here (StreamingSpec pins that boundary), which is exactly why
    * [[distinctCustomersBounded]] deduplicates the drained output before
    * comparing against the batch DISTINCT oracle.
    *
    * Eviction timing (measured on Spark 4.1.2, pinned by StreamingSpec):
    * expired `dropDuplicatesWithinWatermark` state is NOT evicted during
    * data-carrying micro-batches, even ones whose eviction watermark is far
    * past the entry's expiry — physical removal happens in the trailing
    * NO-DATA batch that the engine schedules when the watermark advanced
    * (`shouldRunAnotherBatch`). Within a single AvailableNow run every file
    * is discovered up front, so a recurrence always precedes that terminal
    * batch and is suppressed (a suppressed duplicate also EXTENDS the
    * entry's expiry to its own event time + delay). Observing re-emission
    * therefore needs a checkpointed SECOND run after the first run's
    * terminal batch evicted the key — pass `fileSink` (output dir,
    * checkpoint dir) to span runs; the memory sink cannot recover from a
    * checkpoint, so the spanning path writes parquet instead.
    */
  private[graft] def boundedDedupDrain(spark: SparkSession, dir: String,
                                           schemaFrom: String, glob: String,
                                           delay: String,
                                           maxFilesPerTrigger: Option[Int],
                                           fileSink: Option[(String, String)] = None): DataFrame = {
    val reader = spark.readStream
      .schema(spark.read.parquet(schemaFrom).schema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val dedup = reader.parquet(dir)
      // parquet date -> TIMESTAMP_LTZ; watermarks require an event-time col
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .withWatermark("o_orderdate", delay)
      .dropDuplicatesWithinWatermark("o_custkey")
      .select(col("o_custkey"))
    fileSink match {
      case None => drain(dedup, "graft_stream_dedup_wm", "append")
      case Some((outDir, ckpt)) =>
        drainLock.synchronized {
          val before = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", 8)
          try {
            val q = dedup.writeStream.outputMode("append").format("parquet")
              .option("path", outDir).option("checkpointLocation", ckpt)
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
          } finally spark.conf.set("spark.sql.shuffle.partitions", before)
        }
        spark.read.parquet(outDir)
    }
  }
}
