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

  /** MERGE one micro-batch's keyed count delta into the parquet-backed state
    * table at `statePath` (schema `g, next_n, batch_id`) — the unbounded-key
    * state fold: the union+re-aggregate runs distributed, the staged swap
    * ([[graft.pipeline.StagedSwap]]) makes the write safe against the plan
    * reading its own input, and the applied batchId rides IN the state table
    * (every row carries it; one swap = counts and marker move atomically),
    * so a retried at-least-once micro-batch sees `batchId <= max(batch_id)`
    * and skips — no double-count. The only `.collect()` is the 1-row
    * batch-marker max (bounded parameter fetch).
    */
  def mergeCountDelta(spark: SparkSession, statePath: String,
                      delta: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val p  = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("next_n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("batch_id", org.apache.spark.sql.types.LongType)))
    val old =
      if (fs.exists(p)) spark.read.schema(schema).parquet(statePath)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val lastApplied = old.agg(coalesce(max("batch_id"), lit(-1L))).head.getLong(0)
    if (batchId > lastApplied) {
      val merged = old.select(col("g"), col("next_n"))
        .unionByName(delta.select(col("g"), col("next_n")))
        .groupBy("g").agg(sum("next_n").as("next_n"))
        .withColumn("batch_id", lit(batchId))
      val tmp = new Path(statePath + ".staging")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      merged.write.mode("overwrite").parquet(tmp.toString)
      graft.pipeline.StagedSwap.swap(fs, tmp, p, new Path(statePath + ".old"))
    }
  }

  /** The DISTRIBUTION-drift gate mid-ingest: the next snapshot streams in,
    * its fixed-grid bin counts fold through the engine-managed complete-mode
    * aggregation (bin counts are the same additive monoid the quantile
    * sketch rides — ≤ bins state rows, batch boundaries invisible), and PSI
    * runs over the drained histogram against the static baseline through
    * [[Validate.psiGateFromCounts]] — identical arithmetic to the batch
    * q175, which is why q176 passes its oracle SQL verbatim. Completes the
    * gate matrix: count × {batch, stream, keyed-state, history} and now
    * distribution × {batch, stream}.
    */
  def psiGate(spark: SparkSession, dir: String, valueCol: String,
              nextFilter: String, lo: Double, hi: Double, bins: Int,
              threshold: Double = 0.25): DataFrame = {
    import graft.operators.Sketches
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$dir/customer.parquet").schema)
      .option("pathGlobFilter", "customer.parquet")
      .parquet(dir)
      .filter(expr(nextFilter))
    val nextCounts = streamed
      .filter(Sketches.histValueFilter(col(valueCol)))
      .select(Sketches.histBinCol(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val drained = StreamingAgg.drain(nextCounts, "graft_stream_psi", "complete")
    val prevCounts = Sketches.histogramCounts(
      spark.read.option("pathGlobFilter", "customer.parquet").parquet(dir),
      valueCol, lo, hi, bins)
    Validate.psiGateFromCounts(prevCounts, drained, threshold)
  }

  /** The KOLMOGOROV–SMIRNOV gate MID-INGEST — the sup-norm CDF axis of the
    * gate matrix streamed: the next snapshot's fixed-grid bin counts fold
    * through the same complete-mode additive monoid as [[psiGate]]'s, and
    * the binned KS statistic runs against the static baseline through
    * [[Validate.ksGateFromBinnedCounts]] — identical arithmetic to the
    * batch binned form, so the stream query passes the batch binned oracle
    * ([[Validate.ksBinnedSql]]) verbatim. State ≤ bins rows; the gate
    * publishes one row however long the ingest runs.
    */
  def ksGate(spark: SparkSession, dir: String, valueCol: String,
             nextFilter: String, lo: Double, hi: Double, bins: Int,
             threshold: Double): DataFrame = {
    import graft.operators.Sketches
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$dir/customer.parquet").schema)
      .option("pathGlobFilter", "customer.parquet")
      .parquet(dir)
      .filter(expr(nextFilter))
    val nextCounts = streamed
      .filter(Sketches.histValueFilter(col(valueCol)))
      .select(Sketches.histBinCol(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val drained = StreamingAgg.drain(nextCounts, "graft_stream_ks", "complete")
    val prevCounts = Sketches.histogramCounts(
      spark.read.option("pathGlobFilter", "customer.parquet").parquet(dir),
      valueCol, lo, hi, bins)
    Validate.ksGateFromBinnedCounts(prevCounts, drained, threshold)
  }

  /** The EXACT KS gate MID-INGEST (r11 verdict task 5) — no grid at all:
    * the streamed next snapshot's per-DISTINCT-VALUE counts fold through
    * complete-mode engine state, and the exact sup-norm D finishes over the
    * drained count table via [[Validate.ksGateFromValueCounts]] (the
    * two-pass prefix scan, identical arithmetic to the batch [[Validate
    * .ksGate]]) — so the stream query passes the exact BATCH oracle
    * ([[Validate.ksGateSql]]) verbatim, closing the gap q188's binned form
    * left (binned D under-reads: 0.0802 vs the exact 0.0813 here).
    *
    * STATE-SIZE BOUND, and when to use which form: state is one count per
    * distinct value of `valueCol` — bounded by the value DOMAIN, not by
    * rows. For fixed-point domains like c_acctbal (currency in
    * [-999.99, 9999.99]: ≤ 1.1M distinct keys) that bound holds at ANY
    * ingest volume, and the exact gate is deployable as-is. For truly
    * continuous domains the distinct-count grows with the data and the
    * binned [[ksGate]] (state ≤ bins) remains the right trade — this pair
    * is the resolution/state dial, both ends oracle-checked.
    */
  def ksGateExact(spark: SparkSession, dir: String, valueCol: String,
                  nextFilter: String, threshold: Double,
                  scanParts: Int = 32): DataFrame = {
    val v = col(valueCol).cast("double")
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$dir/customer.parquet").schema)
      .option("pathGlobFilter", "customer.parquet")
      .parquet(dir)
      .filter(expr(nextFilter))
    val nextCounts = streamed
      .filter(v.isNotNull && !isnan(v))
      .groupBy(v.as("v")).agg(count(lit(1)).as("n"))
    val drained = StreamingAgg.drain(nextCounts, "graft_stream_ks_exact", "complete")
    val prev = spark.read.option("pathGlobFilter", "customer.parquet").parquet(dir)
    val prevCounts = prev
      .filter(v.isNotNull && !isnan(v))
      .groupBy(v.as("v")).agg(count(lit(1)).as("n"))
    Validate.ksGateFromValueCounts(prevCounts, drained, threshold,
      scanParts = scanParts)
  }

  /** The PER-GROUP distribution gate MID-INGEST (round-10 verdict task 7):
    * the next snapshot streams in, its (group, bin) counts fold through the
    * engine's complete-mode aggregation (state ≤ groups·bins rows — the
    * additive monoid again, so batch boundaries are invisible), and the
    * keyed PSI runs against the static baseline through
    * [[Validate.groupedPsiGateFromCounts]] — identical arithmetic to the
    * batch form, which is why the stream query passes the batch oracle
    * verbatim. This is the gate a multi-source ingest deploys: a shift
    * confined to one source flags that source alone.
    */
  def groupedPsiGate(spark: SparkSession, dir: String, groupCol: String,
                     valueCol: String, nextFilter: String,
                     lo: Double, hi: Double, bins: Int,
                     threshold: Double = 0.25): DataFrame = {
    import graft.operators.Sketches
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$dir/customer.parquet").schema)
      .option("pathGlobFilter", "customer.parquet")
      .parquet(dir)
      .filter(expr(nextFilter))
    val nextCounts = streamed
      .filter(Sketches.histValueFilter(col(valueCol)))
      .select(col(groupCol).as("g"),
        Sketches.histBinCol(col(valueCol), lo, hi, bins).as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))
    val drained = StreamingAgg.drain(nextCounts, "graft_stream_gpsi", "complete")
    val prevCounts = Sketches.groupedHistogramCounts(
      spark.read.option("pathGlobFilter", "customer.parquet").parquet(dir),
      groupCol, valueCol, lo, hi, bins)
    Validate.groupedPsiGateFromCounts(prevCounts, drained, groupCol, threshold)
  }

  /** The EMBEDDING-SPACE drift gate MID-INGEST (r12 verdict task 4): the
    * drift matrix has covered scalar columns (z/PSI/KS × batch/stream/
    * grouped); this is the embedding MODALITY — the next corpus snapshot's
    * vectors stream in, each assigns its TRAINED IVF cell as a pure
    * map-side expression (the same argmin convention every IVF consumer
    * uses), per-cell counts fold through complete-mode engine state
    * (additive monoid, ≤ nlist rows — batch boundaries invisible), and PSI
    * over the cell-occupancy histograms runs against the static baseline
    * through [[Validate.psiGateFromCounts]] — identical arithmetic to the
    * batch gate, so the stream query passes the batch oracle verbatim.
    *
    * This is the gate an embedding-backed ingest deploys: a new crawl
    * snapshot whose topic mix shifted (cells emptying or swelling) flags
    * BEFORE it lands in the index, using parameters the deployment already
    * ships (the trained centroid artifact). State ≤ nlist regardless of
    * volume.
    */
  def embeddingCellDriftGate(spark: SparkSession, dir: String,
                             vecExpr: String, nextFilter: String,
                             cents: Seq[Seq[Double]], prevCounts: DataFrame,
                             threshold: Double = 0.25): DataFrame = {
    import graft.functions.VectorFunctions.{asDouble, dotFused}
    def cellOf(vec: org.apache.spark.sql.Column) =
      array_min(array(cents.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - lit(2.0) * dotFused(vec, array(c.map(lit): _*))).as("d"),
          lit(i).as("i"))
      }: _*)).getField("i").cast("long")
    val streamed = spark.readStream
      .schema(spark.read.parquet(s"$dir/embeddings.parquet").schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .filter(expr(nextFilter))
    val nextCounts = streamed
      .select(cellOf(asDouble(expr(vecExpr))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val drained = StreamingAgg.drain(nextCounts, "graft_stream_celldrift", "complete")
    Validate.psiGateFromCounts(prevCounts, drained, threshold)
  }

  /** The UNBOUNDED-key form of the streaming gate: the group key is a wide
    * domain (here `c_custkey % buckets` standing in for per-domain / per-host
    * counts), so per-batch deltas MERGE into a key-partitioned parquet state
    * table via [[mergeCountDelta]] instead of folding into a driver-held
    * map — no driver state grows with key cardinality, which is what makes
    * the gate usable when the group key is unbounded. Scenario mirrors
    * q150/q152: the streamed next snapshot drops the half of bucket 7 with
    * `c_custkey % (2·buckets) = 7`, so exactly that bucket must flag.
    */
  def keyedDriftGate(spark: SparkSession, dir: String, zMax: Double = 3.0,
                     buckets: Int = 64): DataFrame = {
    val stateRoot = java.nio.file.Files.createTempDirectory("graft_drift_state")
    val statePath = stateRoot.resolve("state").toString
    val reader = spark.readStream
      .schema(spark.read.parquet(s"$dir/customer.parquet").schema)
      .option("pathGlobFilter", "customer.parquet")
    val streamed = reader.parquet(dir)
      .filter(col("c_custkey") % (2 * buckets) =!= 7)
      .select((col("c_custkey") % buckets).as("g"))
    val q = streamed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch.groupBy("g").agg(count(lit(1)).cast("long").as("next_n"))
        mergeCountDelta(spark, statePath, delta, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val prevCounts = spark.read.option("pathGlobFilter", "customer.parquet").parquet(dir)
      .groupBy((col("c_custkey") % buckets).as("g")).agg(count(lit(1)).cast("long").as("prev_n"))
    val nextCounts = spark.read.parquet(statePath).select("g", "next_n")
    val gate = Validate.driftGateFromCounts(prevCounts, nextCounts, "g", zMax)
    // Materialize the verdict (≤ `buckets` rows — a bounded parameter fetch,
    // not a data-plane collect) so the returned plan no longer references
    // the temp state table, then drop the whole temp root — state, the
    // .staging scratch, and any .old swap remnant — instead of leaking one
    // orphaned directory per invocation (ADVICE r10).
    import scala.jdk.CollectionConverters._
    val out = spark.createDataFrame(gate.collect().toSeq.asJava, gate.schema)
    deleteRecursively(stateRoot)
    out
  }

  /** Best-effort recursive delete of a local temp directory (shared by the
    * streaming functions that seed or hold state in temp roots, and by the
    * q222 export-roundtrip harness query for its scratch shard dir). */
  private[graft] def deleteTempDir(root: java.nio.file.Path): Unit =
    deleteRecursively(root)

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
    }
  }
}
