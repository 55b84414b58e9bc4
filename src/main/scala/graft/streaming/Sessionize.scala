package graft.streaming

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

final case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
final case class SessionState(nextSessionId: Long)
final case class SessionOut(user_id: Long, sess_id: Long, n_events: Long,
                            session_start: String, session_end: String)

/** Gap-based sessionization — the classic stateful-streaming operator, in two
  * equivalent forms:
  *
  *  - [[batch]]: window lag + cumulative sum (fully relational, shuffles once
  *    on user_id; SQL-expressible => DuckDB-oracle-checked as q36);
  *  - [[streaming]]: `flatMapGroupsWithState` over the file source with
  *    `Trigger.AvailableNow` — per-key session counters persist in the state
  *    store across micro-batches. Unit-tested to agree with [[batch]].
  *
  * At cluster scale both shuffle once by user_id; the streaming form holds
  * O(users) state, the batch form is stateless.
  */
object Sessionize {
  private val counter = new AtomicInteger(0)
  private val fmt     = "yyyy-MM-dd HH:mm:ss"

  def batch(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w      = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prevUs = lag(unix_micros(col("ts")), 1).over(w)
    Tables.events(spark, dir)
      .select("user_id", "ts", "event_id")
      .withColumn("new_sess",
        when(prevUs.isNull || (unix_micros(col("ts")) - prevUs) > gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min("ts"), fmt).as("session_start"),
        date_format(max("ts"), fmt).as("session_end"))
      .orderBy("user_id", "sess_id")
  }

  /** Stateful streaming sessionization, drained synchronously. Sessions are
    * emitted per micro-batch (gap closure across batches is approximated by
    * the per-batch grouping — with AvailableNow + a single batch this is
    * exact and equals [[batch]]).
    */
  def streaming(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs  = gapMinutes * 60L * 1000000L
    // format in the session timezone so output strings match batch()'s
    // date_format regardless of spark.sql.session.timeZone
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // normalize ts exactly like Tables.events (nanosAsLong => long nanos)
    val ev =
      (if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
         raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
       else raw)
        .select(col("user_id"), col("ts"), col("event_id")).as[SessionEvent]

    val sessions = ev
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val sdf = new java.text.SimpleDateFormat(fmt)
          sdf.setTimeZone(java.util.TimeZone.getTimeZone(tz))
          // full-microsecond epoch (getTime alone is ms-truncated — the batch
          // form compares unix_micros, so the gap test must too)
          def micros(t: Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val first  = state.getOption.map(_.nextSessionId).getOrElse(1L)
          var sessId = first
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Timestamp, Timestamp)]
          var cur = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
          def flush(): Unit = if (cur.nonEmpty) {
            out += ((uid, sessId, cur.length.toLong, cur.head.ts, cur.last.ts))
            sessId += 1; cur = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
          }
          sorted.foreach { e =>
            if (cur.nonEmpty && micros(e.ts) - micros(cur.last.ts) > gapUs) flush()
            cur += e
          }
          flush()
          state.update(SessionState(sessId))
          out.iterator.map { case (u, s, n, st, en) =>
            SessionOut(u, s, n, sdf.format(st), sdf.format(en))
          }
        })

    val name = s"graft_sessions_${counter.incrementAndGet()}"
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("user_id", "sess_id")
  }

  /** Watermarked sliding-window counts through the streaming engine —
    * demonstrates event-time windows + watermark on the file source.
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/orders.parquet").schema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
    val agg = raw
      // parquet ms timestamps read as NTZ; watermarks require TIMESTAMP_LTZ
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .withWatermark("o_orderdate", "1 day")
      .groupBy(window(col("o_orderdate"), "30 days", "15 days"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("win_start"), col("n"))
    val name = s"graft_wincounts_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("win_start")
  }
}
