package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization via keyed state
  * (`flatMapGroupsWithState`) — the incremental twin of
  * graft.ops.Sessionization, with the same session definition: a gap
  * over `gapSeconds` closes the session.
  *
  * State per user = the open session. Events for a key arrive in batch
  * order, are sorted within the trigger, folded into the open session
  * or emitted as closed sessions; an event-time timeout (watermark past
  * last-event + gap) flushes a session that stopped receiving events.
  * State size is O(1) per active user — no unbounded buffering.
  *
  * All session math runs at MICROSECOND precision — Spark's
  * TimestampType is µs, and the batch twin (and its DuckDB oracle)
  * makes gap/ordering decisions on µs longs, so a ms-truncated
  * streaming path could split sessions differently on sub-ms data.
  * Session bounds are emitted as epoch-µs longs. The engine's
  * GroupState timeout clock is ms; the due time is rounded UP to the
  * next ms so a timeout can never fire early.
  */
object Sessionize {

  val gapSeconds = 3600L
  private val gapUs = gapSeconds * 1000000L

  case class In(user_id: Long, ts: Timestamp, event_type: String)
  case class Open(start: Long, last: Long, n: Long)
  /** session_start/session_end are epoch MICROSECONDS. */
  case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** Full epoch-µs of a Timestamp: getTime is ms (already including the
    * ms part of nanos); the sub-ms remainder lives in getNanos.
    */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def fold(
      userId: Long, events: Iterator[In], state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed last-event + gap: the open session is closed
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start, s.last, s.n))
    }
    val sorted = events.map(e => micros(e.ts)).toSeq.sorted
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var open = state.getOption
    // cross-trigger stragglers: events older than the open session by
    // more than the gap are gap-chained among THEMSELVES; a chain that
    // climbs back to within the gap of the open session's start folds
    // into it (batch parity), otherwise it is emitted as a historical
    // session — same session definition, bounded lateness. The one
    // remaining batch/streaming divergence: stragglers split across
    // TRIGGERS do not re-merge (single-open-session state; the
    // watermark bounds how long that window even exists). Pinned in
    // SessionizeSpec.
    var straggler = Option.empty[Open]
    // A straggler chain that climbs to within the gap of the open
    // session's start belongs to it (the batch twin, ops.Sessionization,
    // would merge them): fold it in instead of emitting a split session.
    def mergeChain(s: Open): Open = straggler match {
      case Some(h) if s.start - h.last <= gapUs =>
        straggler = None
        Open(math.min(h.start, s.start), s.last, s.n + h.n)
      case _ => s
    }
    sorted.foreach { t =>
      open match {
        case Some(s0) if t - s0.last > gapUs =>
          val s = mergeChain(s0)
          closed += Session(userId, s.start, s.last, s.n)
          straggler.foreach(h => closed += Session(userId, h.start, h.last, h.n))
          straggler = None
          open = Some(Open(t, t, 1))
        case Some(s) if s.start - t > gapUs =>
          straggler match {
            case Some(h) if t - h.last <= gapUs =>
              straggler = Some(Open(h.start, math.max(h.last, t), h.n + 1))
            case Some(h) =>
              closed += Session(userId, h.start, h.last, h.n)
              straggler = Some(Open(t, t, 1))
            case None =>
              straggler = Some(Open(t, t, 1))
          }
        case Some(s) =>
          // in-gap event, possibly out-of-order: extend both ends
          open = Some(Open(math.min(s.start, t), math.max(s.last, t), s.n + 1))
        case None =>
          open = Some(Open(t, t, 1))
      }
    }
    open = open.map(mergeChain)
    straggler.foreach(h => closed += Session(userId, h.start, h.last, h.n))
    open.foreach { s =>
      // ceil-to-ms: the timeout clock is ms; firing at dueMs guarantees
      // watermark µs > last + gap, so no future on-time event could
      // have extended this session (it would gap-open a new one anyway)
      val dueMs = (s.last + gapUs) / 1000L + 1L
      // flatMapGroupsWithState does NOT drop late data: the watermark
      // may already be past this session's close time, and
      // setTimeoutTimestamp(past) throws — close the session now instead
      if (state.getCurrentWatermarkMs() >= dueMs) {
        state.remove()
        closed += Session(userId, s.start, s.last, s.n)
      } else {
        state.update(s)
        state.setTimeoutTimestamp(dueMs)
      }
    }
    closed.iterator
  }

  /** events must carry a watermark on `ts` before grouping. */
  def sessions(events: Dataset[In]): Dataset[Session] = {
    implicit val openEnc = Encoders.product[Open]
    implicit val outEnc = Encoders.product[Session]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
