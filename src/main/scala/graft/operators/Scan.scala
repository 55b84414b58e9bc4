package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Distributed PREFIX SCANS — exact order-dependent running aggregates
  * without a single-partition window.
  *
  * `Window.orderBy(...)` with no `partitionBy` funnels every row through ONE
  * task; the library only ever uses that form on parameter-sized inputs (a
  * histogram's ≤ bins rows, Sketches.quantilesFromCounts). When the scanned
  * relation is DATA-sized — the distinct-value CDF of an exact KS statistic,
  * the lexicographic side-neighbor walk of a suffix array — the scalable
  * shape is the textbook two-pass scan (Blelloch, "Prefix sums and their
  * applications", CMU-CS-90-190, distributed here as range-partition +
  * per-partition partials + broadcast offsets):
  *
  *  1. range-partition by the order key and sort within partitions — a
  *     total order, TeraSort-style, no global funnel;
  *  2. pass 1 reduces each partition to one partial (per-partition sum /
  *     last-flagged payload) — the collect is bounded by the PARTITION
  *     COUNT, a config parameter, never by rows;
  *  3. pass 2 re-walks each partition with its exclusive prefix offset
  *     broadcast in, emitting the exact running value per row.
  *
  * Both passes read the same cached sorted relation, so the partitioning the
  * offsets were computed against is byte-identical to the one they are
  * applied to. Caller releases the cache ([[graft.pipeline.Caching]]
  * conventions) via the `unpersist` handle on the returned frame's sorted
  * parent — in practice the scan output is immediately aggregated and the
  * cache dies with the session; the bench's per-query `clearCache` covers
  * the verify/bench paths.
  */
object Scan {

  /** Appends `cum_<v>` (inclusive running total, ascending `orderCols`
    * lexicographic order) for every `v` in `valueCols`; the value columns
    * must be LongType. Ties in the order key scan in an arbitrary but
    * CONSISTENT order within the run — callers that need a deterministic
    * per-row result must pass a tie-free key (the library's callers scan
    * DISTINCT keys).
    */
  def cumSums(df: DataFrame, orderCols: Seq[String], valueCols: Seq[String],
              parts: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .cache()
    // fail with a clear message, not an executor-side NPE mid-scan: the
    // per-row getLong below has no null path (runningLast, which DOES
    // accept nulls, is the primitive for nullable payloads). The type check
    // is driver-side; nulls can only be caught per-row (Spark marks agg
    // outputs nullable even when the data never is, so a schema-nullability
    // require would reject every groupBy-sum caller).
    valueCols.foreach { v =>
      require(df.schema(v).dataType == LongType,
        s"Scan.cumSums value column '$v' must be LongType, got ${df.schema(v).dataType}")
    }
    val vIdx = valueCols.map(sorted.schema.fieldIndex).toArray
    val vNames = valueCols.toArray
    def checkNull(r: Row): Unit = {
      var j = 0
      while (j < vIdx.length) {
        if (r.isNullAt(vIdx(j))) throw new IllegalArgumentException(
          s"Scan.cumSums value column '${vNames(j)}' contains a null — " +
            "coalesce nulls to 0 (or a domain sentinel) before scanning")
        j += 1
      }
    }
    val partials = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = new Array[Long](vIdx.length)
      it.foreach { r =>
        checkNull(r)
        var j = 0
        while (j < vIdx.length) { acc(j) += r.getLong(vIdx(j)); j += 1 }
      }
      Iterator((i, acc))
    }.collect().sortBy(_._1) // bounded: one row per partition
    val offsets = Array.fill(partials.length + 1)(new Array[Long](vIdx.length))
    partials.foreach { case (i, acc) =>
      offsets(i + 1) = offsets(i).zip(acc).map { case (a, b) => a + b }
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields ++
      valueCols.map(v => StructField(s"cum_$v", LongType, nullable = false)))
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bc.value(i).clone()
      it.map { r =>
        var j = 0
        while (j < vIdx.length) { acc(j) += r.getLong(vIdx(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ acc.toList)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Appends `prev_<payload>` — the most recent NON-NULL `payloadCol` value
    * at or BEFORE each row in ascending `orderCols` order, null when no
    * flagged row precedes. "At or before" includes the row itself (a row
    * carrying a payload sees its own). `payloadCol` must be LongType.
    *
    * The suffix-array side-neighbor primitive: with `payload` = the sa index
    * of corpus-A suffixes (null for B), `runningLast` ascending gives every
    * B suffix its nearest A predecessor; run again with a negated key for
    * the successor.
    */
  def runningLast(df: DataFrame, orderCols: Seq[String], payloadCol: String,
                  parts: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .cache()
    val pIdx = sorted.schema.fieldIndex(payloadCol)
    val partials = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var last: java.lang.Long = null
      it.foreach { r => if (!r.isNullAt(pIdx)) last = r.getLong(pIdx) }
      Iterator((i, last))
    }.collect().sortBy(_._1) // bounded: one row per partition
    val carry = new Array[java.lang.Long](partials.length + 1)
    partials.foreach { case (i, last) =>
      carry(i + 1) = if (last != null) last else carry(i)
    }
    val bc = spark.sparkContext.broadcast(carry)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(s"prev_$payloadCol", LongType, nullable = true))
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var last: java.lang.Long = bc.value(i)
      it.map { r =>
        if (!r.isNullAt(pIdx)) last = r.getLong(pIdx)
        Row.fromSeq(r.toSeq :+ (last: Any))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
