package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

import graft.ops.Behavior

/** S22 — STATEFUL streaming sessionization: q157's gap rule maintained
  * online with `flatMapGroupsWithState` + event-time timeouts — the one
  * Structured Streaming state shape (arbitrary per-key state with
  * watermark-driven expiry) the engine's other seams deliberately avoid
  * (S8–S21 are all stateless overwrite-by-batch). Sessionization is the
  * canonical case that genuinely NEEDS cross-batch state: a session is
  * open until 30 minutes of silence, and only the watermark can prove
  * silence.
  *
  * Semantics: per user, events in each micro-batch are processed in
  * (us, event_id) order against the open-session state; an event within
  * [[Behavior.SessionGapUs]] of the session's last event extends it,
  * otherwise the open session CLOSES (emitted downstream) and a new one
  * opens. A session with no successor closes when the event-time
  * watermark passes lastUs + gap (GroupStateTimeout.EventTimeTimeout) —
  * exactly the gap rule, enforced by time instead of by a successor.
  * On an event-time-ordered feed the emitted rows equal q157 exactly
  * (spec-verified); events arriving out of order ACROSS batches beyond
  * the 30-minute watermark are the standard late-data caveat of any
  * streaming sessionizer.
  *
  * Determinism: within-batch processing order is pinned by the explicit
  * (us, event_id) sort; value totals accumulate as exact integer cents
  * (each value rounded HALF_UP to 2 decimals — the q157 dsum contract —
  * so the final cents/100.0 double equals the batch decimal sum's
  * double surfacing).
  *
  * At 100 TB/day: state is ONE row per user (five longs) — an open
  * session while active, a counter-only stub after timeout (the ordinal
  * must survive expiry or a returning user's sessions would collide
  * with already-emitted ones) — partitioned by user hash across the
  * state store. At production scale the stub population is the knob: a
  * state-store TTL, or session identity by start_us instead of an
  * ordinal. The per-batch sort is per (user, batch) — tiny. */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, value: Double, us: Long,
      ts: java.sql.Timestamp)
  case class Sess(startUs: Long, lastUs: Long, n: Long, cents: Long,
      idx: Long)
  case class SessionRow(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long, duration_us: Long, total_value: Double)

  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(2).longValueExact()

  private def emit(uid: Long, st: Sess): SessionRow =
    SessionRow(uid, st.idx, st.n, st.startUs, st.lastUs,
      st.lastUs - st.startUs, st.cents / 100.0)

  /** The per-group state transition — factored for direct spec replay. */
  /** The per-group state transition. A COUNTER-ONLY state (n == 0) is
    * what a timeout leaves behind: the open session is emitted, but the
    * per-user session ORDINAL must survive — removing it entirely would
    * restart a returning user at idx = 1 and collide with an
    * already-emitted (user, 1) row. Counter-only state registers no
    * timeout (nothing is open), so it never re-fires; its cost is one
    * tiny row per user ever seen, the price of stable ordinals (at
    * production scale the knob is a state-store TTL, or keying sessions
    * by start_us instead of an ordinal). */
  private[streaming] def updateGroup(uid: Long, evs: Iterator[Ev],
      state: GroupState[Sess]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      // watermark passed lastUs + gap: the open session is proven silent
      val out = state.getOption.filter(_.n > 0L).map(emit(uid, _)).iterator
      // keep the ordinal; drop the session payload
      state.getOption.foreach(st =>
        state.update(Sess(0L, 0L, 0L, 0L, st.idx)))
      out
    } else {
      val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
      var cur = state.getOption
      for (e <- sorted) {
        cur match {
          case Some(st) if st.n == 0L => // counter-only: continue numbering
            cur = Some(Sess(e.us, e.us, 1L, cents(e.value), st.idx + 1L))
          case Some(st) if e.us - st.lastUs <= Behavior.SessionGapUs =>
            cur = Some(st.copy(lastUs = e.us, n = st.n + 1,
              cents = st.cents + cents(e.value)))
          case Some(st) =>
            closed += emit(uid, st)
            cur = Some(Sess(e.us, e.us, 1L, cents(e.value), st.idx + 1L))
          case None =>
            cur = Some(Sess(e.us, e.us, 1L, cents(e.value), 1L))
        }
      }
      cur.foreach { st =>
        state.update(st)
        if (st.n > 0L) state.setTimeoutTimestamp(
          st.lastUs / 1000L + Behavior.SessionGapUs / 1000L)
      }
      closed.iterator
    }
  }

  /** Streaming driver. `events` must carry (user_id long, event_id long,
    * value double, ts timestamp); closed sessions append to
    * `root/sessions`. */
  def run(events: DataFrame, root: String,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit s: SparkSession): StreamingQuery = {
    import s.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .selectExpr("user_id", "event_id", "value",
        "unix_micros(ts) AS us", "ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Sess, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateGroup _)
      .writeStream
      .format("parquet")
      .option("path", s"$root/sessions")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
  }
}
