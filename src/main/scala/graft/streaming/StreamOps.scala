package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms extending the reference's batch-incremental semantics
  * (SURVEY.md §2.9 flags these as engine extensions — the reference has no
  * streaming runtime, so these define, not port, the semantics):
  *
  * - `windowedMetrics`: event-time tumbling-window aggregation with a
  *   watermark bounding state; the streaming analogue of the curated daily
  *   rollup (dt grain → window grain).
  * - `sessionize`: gap-based user sessions via flatMapGroupsWithState —
  *   the canonical custom-state operator (emits a session when `gapMinutes`
  *   of event-time silence elapse, via event-time timeout).
  *
  * Both run identically on batch DataFrames (Spark's unified API) — tests
  * exercise the batch path and an AvailableNow streaming path.
  */
object StreamOps {

  /** Tumbling event-time window rollup of the events stream:
    * (window, event_type) → count + exact decimal value sum. With a
    * watermark, state for closed windows is dropped — bounded memory at any
    * stream length.
    */
  def windowedMetrics(
      events: DataFrame, // needs ts: timestamp, event_type, value
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    wm.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming exact dedup on a normalized-content digest: the first
    * arrival of each content key passes, duplicates are suppressed, and —
    * via `dropDuplicatesWithinWatermark` — dedup state for keys older than
    * the watermark delay is evicted, so state stays bounded at any stream
    * length (classic `dropDuplicates` on a stream retains every key
    * forever). The streaming analogue of [[graft.dedup.Dedup.exactDedup]]:
    * the same digest keying, so a batch backfill and the streaming path
    * agree on what counts as a duplicate.
    */
  def dedupStream(
      docs: DataFrame, // needs ts: timestamp + textCol
      tsCol: String = "ts",
      textCol: String = "text",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("content_key",
      md5(graft.functions.TextFunctions.normalize(col(textCol))))
    if (keyed.isStreaming)
      keyed.withWatermark(tsCol, watermarkDelay).dropDuplicatesWithinWatermark("content_key")
    else keyed.dropDuplicates("content_key")
  }

  /** Stream-stream time-interval join: attribute each click to the view(s)
    * of the same user within `withinMinutes` BEFORE the click — the
    * canonical two-stream correlation (ad attribution, request/response
    * pairing). Both sides carry event-time watermarks, and the join
    * condition bounds how far apart matching rows can be, so Spark can
    * evict buffered state on BOTH sides (a stream-stream join without a
    * time bound retains every row forever). Runs identically on batch
    * frames, where no watermark is needed.
    */
  def clickAttribution(
      views: DataFrame, // needs user_id, event_id, ts
      clicks: DataFrame, // same shape
      withinMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val v = (if (views.isStreaming) views.withWatermark("ts", watermarkDelay) else views)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", watermarkDelay) else clicks)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("click_ts"), col("view_id"), col("view_ts"))
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Gap-based sessionization: consecutive events of a user belong to one
    * session while gaps stay under `gapMinutes`. Streaming: state times out
    * on event-time (watermark-driven) and the closed session is emitted —
    * a streaming input REQUIRES a watermark on `ts` (Spark rejects
    * EventTimeTimeout at query start without one): either pre-declare it
    * on `events` or pass `watermarkDelay` and this declares it here.
    * Batch: sessions are computed directly per group (no timeouts in batch
    * mode — all groups are complete; `watermarkDelay` is ignored).
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
      watermarkDelay: Option[String] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val isStreamingRun = events.isStreaming // capture primitive, not the Dataset
    val src = watermarkDelay match {
      case Some(d) if isStreamingRun => events.withWatermark("ts", d).as[Ev]
      case _ => events
    }

    def toSession(uid: Long, s: SessionState): Session =
      Session(uid, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n, s.total)

    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession(uid, _))
            state.remove()
            out.iterator
          } else {
            // fold this batch's events (sorted by time) into sessions
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += toSession(uid, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                if (isStreamingRun) {
                  state.update(s)
                  state.setTimeoutTimestamp(s.last + gapMs)
                  closed.iterator
                } else {
                  // batch: the group is complete — emit the open session too
                  (closed :+ toSession(uid, s)).iterator
                }
              case None => closed.iterator
            }
          }
      }
  }
}
