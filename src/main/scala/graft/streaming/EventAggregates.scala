package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregates over the events shape
  * (event_id, ts, user_id, event_type, value): watermarked tumbling-
  * window counts, and stateful gap-based sessionization via
  * `flatMapGroupsWithState` — the two structured-streaming patterns a
  * training-data ingest pipeline needs beyond file-batch SCD.
  *
  * Scale shape: the windowed aggregate is a standard partial+final
  * streaming hash aggregate keyed on (window, event_type) — state is
  * bounded by the watermark (late rows beyond it are dropped and the
  * window state evicted). Sessionization state is one small record per
  * ACTIVE user, evicted by event-time timeout once the watermark
  * passes the session gap.
  */
object EventAggregates {

  /** Watermarked tumbling-window counts per event_type.
    * Append-mode compatible: a window emits once its end passes the
    * watermark.
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stream-stream interval join: correlate two live streams (the
    * classic impression→click attribution shape) — each left row pairs
    * with right rows for the same key whose time falls in
    * `[leftTime, leftTime + window]`. Both sides carry watermarks, so
    * Spark bounds the join state: a buffered left row is dropped once
    * the right watermark passes its window end, and vice versa —
    * without the interval condition the state store grows forever.
    *
    * Inner join by default; pass `"leftOuter"` to also emit
    * unmatched left rows (nulls) once their window can no longer
    * match. Time columns must be named distinctly across the sides.
    */
  def correlate(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      window: String = "10 minutes",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTimeCol, watermark)
    val r = right
      .withColumnRenamed(keyCol, s"__r_$keyCol")
      .withWatermark(rightTimeCol, watermark)
    l.join(
      r,
      expr(
        s"""$keyCol = __r_$keyCol AND
           |$rightTimeCol >= $leftTimeCol AND
           |$rightTimeCol <= $leftTimeCol + INTERVAL $window""".stripMargin),
      joinType)
      .drop(s"__r_$keyCol")
  }

  /** Native streaming session windows: the engine-managed form of
    * [[sessionizeStateful]] — Spark merges gap-overlapping windows in
    * the state store and emits a session once the watermark passes its
    * end. Batch truth for the SAME operator is oracle-checked as
    * q_session_windows; the boundary convention (new session at gap ==
    * exactly, windows merge on strict overlap) is the engine's.
    */
  def sessionWindowCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Stateful gap-based sessionization: a user's session closes after
    * `gapMillis` of event-time inactivity. A session also closes via
    * EVENT-TIME timeout once the stream's watermark passes its idle gap
    * (no wall-clock batches — processing-time timeouts would keep the
    * query permanently busy). State per ACTIVE user only.
    */
  def sessionizeStateful(
      events: Dataset[Event],
      gapMillis: Long = 30 * 60 * 1000L,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMillis =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMillis)
            }
            closed.result().iterator
          }
      }
  }
}
