package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental gap sessionization with explicit state —
  * `flatMapGroupsWithState` (SURVEY §2.10 / guide "custom state" surface).
  *
  * `session_window` (StreamOps.sessionAgg) covers the aggregate case;
  * this operator exists for session outputs an aggregate can't express —
  * here each closed session carries its ordered event-id list (the
  * reference's sessions keep their member activities for the LLM prompt).
  *
  * State per user = the open session (bounded: one buffer per key, event
  * ids only); a session closes when an event arrives ≥ gap after its end,
  * or when the event-time watermark passes its end + gap (timeout), so
  * state size is bounded by activity, not by stream length.
  */
object StatefulSessionize {

  // keeps the watermarked timestamp column itself — EventTimeTimeout
  // requires the watermark attribute to flow into the grouped Dataset
  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_id: Long) {
    def tsUs: Long = ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
  }
  final case class OpenSession(start_us: Long, end_us: Long, events: Seq[Long])
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, event_ids: Seq[Long])

  def sessionize(events: Dataset[Event], gapUs: Long,
      outputMode: OutputMode = OutputMode.Append()): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        outputMode, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start_us, s.end_us,
              s.events.size.toLong, s.events))
          } else {
            val sorted = it.toVector.sortBy(e => (e.tsUs, e.event_id))
            val closed = Vector.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.tsUs - s.end_us <= gapUs =>
                  open = Some(OpenSession(s.start_us, math.max(s.end_us, e.tsUs),
                    s.events :+ e.event_id))
                case Some(s) =>
                  closed += ClosedSession(userId, s.start_us, s.end_us,
                    s.events.size.toLong, s.events)
                  open = Some(OpenSession(e.tsUs, e.tsUs, Seq(e.event_id)))
                case None =>
                  open = Some(OpenSession(e.tsUs, e.tsUs, Seq(e.event_id)))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close via watermark once no event can extend the session
              state.setTimeoutTimestamp((s.end_us + gapUs) / 1000L + 1L)
            }
            closed.result().iterator
          }
      }
  }

  /** Processing-time-timeout variant (NEXT.md backlog): for streams with no
    * usable event-time watermark, an open session is flushed once its key
    * has been idle for `idleMs` of WALL-CLOCK time (timeout fires on the
    * next micro-batch after the duration elapses). Gap splitting within a
    * batch still uses event time; only the close-on-idle trigger differs
    * from the EventTimeTimeout form above. */
  def sessionizeProcessingTime(events: Dataset[Event], gapUs: Long,
      idleMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start_us, s.end_us,
              s.events.size.toLong, s.events))
          } else {
            val sorted = it.toVector.sortBy(e => (e.tsUs, e.event_id))
            val closed = Vector.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.tsUs - s.end_us <= gapUs =>
                  open = Some(OpenSession(s.start_us, math.max(s.end_us, e.tsUs),
                    s.events :+ e.event_id))
                case Some(s) =>
                  closed += ClosedSession(userId, s.start_us, s.end_us,
                    s.events.size.toLong, s.events)
                  open = Some(OpenSession(e.tsUs, e.tsUs, Seq(e.event_id)))
                case None =>
                  open = Some(OpenSession(e.tsUs, e.tsUs, Seq(e.event_id)))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(idleMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch→stream adapter for the events table: (user_id, ts, event_id)
    * with event-time watermark on `ts`. */
  def fromEventsFrame(events: DataFrame): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[Event]
  }
}
