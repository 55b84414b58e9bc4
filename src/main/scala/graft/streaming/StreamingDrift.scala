package graft.streaming

import graft.operators.Validate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming drift gate — the mid-ingest form of [[Validate.driftGate]]:
  * the NEXT snapshot arrives as a structured stream, per-batch group counts
  * fold into a keyed additive state (the [[StreamingIncremental]] pattern —
  * counts are a monoid, so the fold equals the batch profile regardless of
  * micro-batching), and the z-gate runs over the folded profile against the
  * static baseline through [[Validate.driftGateFromCounts]] — the IDENTICAL
  * arithmetic as the batch gate, which is why q152 passes q150's oracle SQL
  * verbatim.
  *
  * State is one driver-held count per group key (bounded: nations); an
  * unbounded key space MERGEs per-batch deltas into a key-partitioned
  * state table instead, exactly as [[StreamingIncremental]] documents.
  */
object StreamingDrift {

  /** q150's scenario through the streaming engine: baseline = the full
    * customer table, streamed next snapshot = customers minus half of
    * nation 13 — that nation must flag, the other 24 must not.
    */
  def nationDriftGate(spark: SparkSession, dir: String,
                      zMax: Double = 3.0): DataFrame =
    nationDriftGateFrom(spark, dir, schemaFrom = s"$dir/customer.parquet",
      glob = "customer.parquet", maxFilesPerTrigger = None, zMax = zMax)

  def nationDriftGateFrom(spark: SparkSession, dir: String, schemaFrom: String,
                          glob: String, maxFilesPerTrigger: Option[Int],
                          zMax: Double): DataFrame = {
    import spark.implicits._
    val reader = spark.readStream
      .schema(spark.read.parquet(schemaFrom).schema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val streamed = reader.parquet(dir)
      .filter(!(col("c_nationkey") === 13 && col("c_custkey") % 2 === 0))
      .select(col("c_nationkey"))
    // group -> count; driver-held because the key space is bounded.
    // foreachBatch is at-least-once: a retried micro-batch must not
    // double-count, so the fold is guarded by the last applied batchId
    // (ADVICE r9) — the same idempotence contract a keyed MERGE state
    // table gets from writing batchId alongside the delta.
    var state = Map.empty[Int, Long]
    var lastApplied = -1L
    val q = streamed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastApplied) {
          val delta = batch.groupBy("c_nationkey").agg(count(lit(1)).cast("long").as("n"))
            .collect().map(r => (r.getInt(0), r.getLong(1)))
          state = delta.foldLeft(state) { case (st, (g, n)) =>
            st.updated(g, st.getOrElse(g, 0L) + n)
          }
          lastApplied = batchId
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val prevCounts = spark.read.option("pathGlobFilter", glob).parquet(dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).cast("long").as("prev_n"))
    val nextCounts = state.toSeq.toDF("c_nationkey", "next_n")
    Validate.driftGateFromCounts(prevCounts, nextCounts, "c_nationkey", zMax)
  }
}
