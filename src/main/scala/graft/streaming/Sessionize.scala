package graft.streaming

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Timestamp

final case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** Per-user state carried across micro-batches: the id of the CURRENT (still
  * open) session plus its running summary. `openCount == 0` means no open
  * session (fresh key). Timestamps are full-precision epoch micros so the
  * cross-batch gap test is identical to the in-batch one.
  */
final case class SessionState(openSessId: Long, openCount: Long,
                              openStartUs: Long, openEndUs: Long)
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

  /** Stateful streaming sessionization, drained synchronously. Exact across
    * micro-batch boundaries: the open (trailing) session is buffered in
    * [[SessionState]], so a later batch extends or closes it instead of
    * splitting it. Each batch also emits the open session *provisionally*
    * under its final session id — Append mode cannot retract, so a session
    * spanning batches is emitted once per batch, each time with a larger
    * event count; the post-stream reconciliation keeps the latest version
    * (max n_events per (user_id, sess_id)). With a single batch this
    * degenerates to exactly the one-shot behavior; with many batches it
    * equals [[batch]] as long as files arrive in event-time order (the file
    * source's modification-time order — true for append-style ingestion;
    * out-of-order files are a watermark problem the fixture doesn't pose).
    */
  def streaming(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    streamingFrom(spark, dir, schemaFrom = s"$dir/events.parquet",
      glob = "events.parquet", gapMinutes = gapMinutes, maxFilesPerTrigger = None)

  /** [[streaming]] with explicit source layout — lets tests drive a
    * multi-file input one file per micro-batch (`maxFilesPerTrigger=1`) to
    * exercise the cross-batch session carry.
    */
  def streamingFrom(spark: SparkSession, dir: String, schemaFrom: String,
                    glob: String, gapMinutes: Int,
                    maxFilesPerTrigger: Option[Int]): DataFrame = {
    import spark.implicits._
    val gapUs  = gapMinutes * 60L * 1000000L
    // format in the session timezone so output strings match batch()'s
    // date_format regardless of spark.sql.session.timeZone
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val reader = spark.readStream
      .schema(spark.read.parquet(schemaFrom).schema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.parquet(dir)
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
          def toTs(us: Long): Timestamp = {
            val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
            t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
            t
          }
          val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val st = state.getOption.getOrElse(SessionState(1L, 0L, 0L, 0L))
          var sessId   = st.openSessId
          var curCount = st.openCount
          var curStart = st.openStartUs
          var curEnd   = st.openEndUs
          // The exactness contract assumes batches arrive in event-time order
          // (file-source mtime order). An event EARLIER than the carried
          // open-session end would otherwise read as a negative gap and pull
          // curEnd backwards — make the violation visible instead of silent,
          // and clamp so the session end never regresses.
          if (curCount > 0 && sorted.nonEmpty && micros(sorted.head.ts) < curEnd)
            org.slf4j.LoggerFactory.getLogger("graft.streaming.Sessionize").warn(
              s"out-of-order micro-batch for user $uid: earliest event " +
                s"${micros(sorted.head.ts)}us precedes carried session end ${curEnd}us; " +
                "session boundaries for this user may not match the batch operator")
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (curCount > 0 && us - curEnd > gapUs) {
              // gap exceeded: the open session is final — emit and advance
              out += ((sessId, curCount, curStart, curEnd))
              sessId += 1; curCount = 0
            }
            if (curCount == 0) { curStart = us; curEnd = us }
            else curEnd = math.max(curEnd, us) // clamp: never regress an open session's end
            curCount += 1
          }
          // provisional emission of the still-open session (re-emitted with a
          // larger count if a later batch extends it; reconciled downstream)
          if (curCount > 0) out += ((sessId, curCount, curStart, curEnd))
          state.update(SessionState(sessId, curCount, curStart, curEnd))
          out.iterator.map { case (s, n, stUs, enUs) =>
            SessionOut(uid, s, n, sdf.format(toTs(stUs)), sdf.format(toTs(enUs)))
          }
        })

    // reconciliation: a session emitted in k batches has k versions with
    // strictly growing n_events — keep the latest (struct max orders by
    // n_events first; start is fixed and end grows with the count)
    StreamingAgg.drain(sessions.toDF(), "graft_sessions", "append")
      .groupBy("user_id", "sess_id")
      .agg(max(struct(col("n_events"), col("session_start"), col("session_end"))).as("__s"))
      .select(col("user_id"), col("sess_id"), col("__s.n_events").as("n_events"),
        col("__s.session_start").as("session_start"), col("__s.session_end").as("session_end"))
      .orderBy("user_id", "sess_id")
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
    StreamingAgg.drain(agg, "graft_wincounts", "append").orderBy("win_start")
  }
}
