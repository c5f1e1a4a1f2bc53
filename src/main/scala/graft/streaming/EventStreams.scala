package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the batch event operators
  * (AnalyticsQueries): the reference is batch-only (all its
  * PlanProperties declare Boundedness::Bounded, SURVEY.md §1.1), so
  * this module is the forward-looking streaming surface a training
  * pipeline needs — windowed aggregation with watermarked late-data
  * handling, and stateful 30-min-gap sessionization via
  * flatMapGroupsWithState (the streaming twin of the batch
  * lag/island formulation).
  *
  * Inputs follow the events schema: (event_id Long, ts Timestamp,
  * user_id Long, event_type String, value Double).
  */
object EventStreams {

  /** Tumbling/sliding windowed counts per event type with a watermark:
    * late events beyond `watermarkDelay` are dropped, state is bounded.
    * Scale: keyed state is (window x type) — shuffle key, not stream
    * volume. */
  def windowedCounts(
      events: DataFrame,
      window: String = "10 minutes",
      slide: Option[String] = None,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val withWm = events.withWatermark("ts", watermarkDelay)
    val win = slide match {
      case Some(s) => functions.window(col("ts"), window, s)
      case None => functions.window(col("ts"), window)
    }
    withWm.groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
  }

  private object functions {
    def window(c: org.apache.spark.sql.Column, w: String) =
      org.apache.spark.sql.functions.window(c, w)
    def window(c: org.apache.spark.sql.Column, w: String, s: String) =
      org.apache.spark.sql.functions.window(c, w, s)
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Int)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Stateful sessionization: a session closes after `gapMs` of
    * event-time silence (timeout-driven emission). One state entry per
    * active user — the streaming equivalent of the batch
    * 30-min-gap island sweep (AnalyticsQueries a_sessionize). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.end, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
