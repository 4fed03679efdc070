package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with CUSTOM STREAMING STATE — the
  * `flatMapGroupsWithState` counterpart of the batch gap-session face
  * (SparkEntry q_events_sessions): per user, events within `gapMs` of
  * the previous one extend the open session; a larger gap closes it
  * (emitted immediately); the watermark passing last-event + gap
  * closes it via EventTimeTimeout. Append-mode output, so closed
  * sessions stream out exactly once while open sessions ride in the
  * state store across micro-batches — the state survives restarts
  * through the checkpoint like LiveIndex's WAL analog.
  *
  * Scale: state is one small case class per ACTIVE user (not per
  * event); the watermark bounds how long a silent user's state lives,
  * so the store cannot grow without bound at 100 TB event volumes. */
object Sessionize {

  final case class Ev(userId: Long, ts: java.sql.Timestamp, value: Double)

  final case class SessState(start: Long, last: Long, n: Int, sum: Double)

  final case class Session(userId: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, events: Int,
                           totalValue: Double)

  private def toTs(ms: Long) = new java.sql.Timestamp(ms)

  private def close(userId: Long, s: SessState): Session =
    Session(userId, toTs(s.start), toTs(s.last), s.n, s.sum)

  /** The state-transition function. Within one invocation events sort
    * by (ts, value) so the fold is deterministic for same-timestamp
    * events; value sums accumulate in that order. */
  def update(gapMs: Long)(userId: Long, evs: Iterator[Ev],
                          state: GroupState[SessState]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer[Session]()
    if (state.hasTimedOut) {
      out += close(userId, state.get)
      state.remove()
    } else {
      var cur = state.getOption
      evs.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            // min the start: a late in-watermark event may be OLDER
            // than the open session's start (t - s.last negative) and
            // must widen the session backwards, not silently vanish
            // into an unchanged [start, last] envelope
            cur = Some(SessState(math.min(s.start, t), math.max(s.last, t),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            out += close(userId, s)
            cur = Some(SessState(t, t, 1, e.value))
          case None =>
            cur = Some(SessState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // the open session dies when the watermark passes last + gap
        state.setTimeoutTimestamp(s.last + gapMs)
      }
    }
    out.iterator
  }

  /** Streaming face: `events` is a streaming Dataset. */
  def sessions(events: Dataset[Ev], gapMs: Long,
               watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }

  /** Batch oracle: the same fold applied per user in one shot, all
    * sessions closed at the end. Streaming output (after every open
    * session timed out or was flushed) equals this exactly for
    * IN-ORDER-PER-USER delivery across micro-batches (the spec's
    * setting). Cross-batch reordering within the watermark is handled
    * conservatively — a late event older than the open session widens
    * it backwards (start min) — but an event that would have BRIDGED
    * two sessions a previous batch already split (or split one it
    * merged) cannot retract emitted rows in append mode, so exact
    * batch equality is not claimed for arbitrary reordering. */
  def sessionsBatch(events: Seq[Ev], gapMs: Long): Seq[Session] =
    events.groupBy(_.userId).toSeq.flatMap { case (uid, evs) =>
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      var cur: Option[SessState] = None
      evs.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            out += close(uid, s)
            cur = Some(SessState(t, t, 1, e.value))
          case None =>
            cur = Some(SessState(t, t, 1, e.value))
        }
      }
      cur.foreach(s => out += close(uid, s))
      out.toSeq
    }
}
