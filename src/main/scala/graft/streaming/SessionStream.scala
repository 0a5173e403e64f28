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
  * (spec-verified). Out-of-order arrival ACROSS batches (ADVICE r10):
  * a within-watermark, within-gap straggler folds into the open session
  * MONOTONICALLY — start_us/end_us are min/max-extended, never
  * regressed — so a late event can widen a session but cannot shrink
  * one or re-order the gap clock; stragglers beyond the 30-minute
  * watermark are the standard late-data drop of any streaming
  * sessionizer. (A straggler that batch q157 would have split into its
  * own earlier session still merges here — cross-batch splits would
  * need buffered reordering; the monotonic fold is the documented
  * contract.)
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
  * state store. The stub population is bounded by the `stubTtl` knob
  * (VERDICT r10 #8): with a TTL, an expired session's stub registers a
  * second event-time timeout at lastUs + gap + ttl and is REMOVED when
  * it fires — a user silent past the TTL costs zero state, and a user
  * returning within it keeps a stable ordinal. Returning AFTER the TTL
  * restarts at idx 1 by design: the TTL is the operator's declaration
  * of the window over which (user, session_idx) must stay unique;
  * consumers needing uniqueness forever key on (user, start_us), which
  * every emitted row carries. Default None = stubs kept for the run
  * (exact ordinals, the spec/bench regime). The per-batch sort is per
  * (user, batch) — tiny. */
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

  /** The per-group state transition — factored (curried over the TTL
    * knob) for direct spec replay. A COUNTER-ONLY state (n == 0) is
    * what a session timeout leaves behind: the open session is emitted,
    * but the per-user session ORDINAL must survive — removing it
    * entirely would restart a returning user at idx = 1 and collide
    * with an already-emitted (user, 1) row.
    *
    * `stubTtlMs = None`: the stub registers no timeout (nothing is
    * open) and never re-fires; its cost is one tiny row per user ever
    * seen — exact ordinals for the run's lifetime.
    * `stubTtlMs = Some(ttl)`: the stub re-arms the event-time clock at
    * lastUs + gap + ttl (clamped above the current watermark — Spark
    * rejects a deadline at or below it; a clamped stub expires on the
    * next batch, which is the intent) and is REMOVED when that fires,
    * bounding state to users active within gap + ttl of the watermark.
    *
    * Out-of-order within-gap stragglers min/max-fold into the open
    * session (ADVICE r10): lastUs never regresses, so end_us/duration
    * are monotone and the gap clock never moves backwards. */
  private[streaming] def updateGroup(stubTtlMs: Option[Long])(
      uid: Long, evs: Iterator[Ev],
      state: GroupState[Sess]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      state.getOption match {
        case Some(st) if st.n > 0L =>
          // watermark passed lastUs + gap: the open session is proven
          // silent — emit it, keep the ordinal, drop the payload
          stubTtlMs match {
            case Some(ttl) =>
              state.update(Sess(0L, st.lastUs, 0L, 0L, st.idx))
              state.setTimeoutTimestamp(math.max(
                st.lastUs / 1000L + Behavior.SessionGapUs / 1000L + ttl,
                state.getCurrentWatermarkMs() + 1L))
            case None => state.update(Sess(0L, 0L, 0L, 0L, st.idx))
          }
          Iterator.single(emit(uid, st))
        case Some(_) =>
          // stub TTL fired: the ordinal retires; a later return restarts
          // at idx 1 (the documented uniqueness-window contract)
          state.remove()
          Iterator.empty
        case None => Iterator.empty
      }
    } else {
      val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
      var cur = state.getOption
      for (e <- sorted) {
        cur match {
          case Some(st) if st.n == 0L => // counter-only: continue numbering
            cur = Some(Sess(e.us, e.us, 1L, cents(e.value), st.idx + 1L))
          case Some(st) if e.us - st.lastUs <= Behavior.SessionGapUs =>
            // min/max fold: a within-gap straggler widens the session but
            // never regresses end_us or rewinds the gap clock
            cur = Some(st.copy(startUs = math.min(st.startUs, e.us),
              lastUs = math.max(st.lastUs, e.us), n = st.n + 1,
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
    * `root/sessions`. `stubTtlMs` bounds expired-user stub state (see
    * [[updateGroup]]). */
  def run(events: DataFrame, root: String,
      trigger: Trigger = Trigger.AvailableNow(),
      stubTtlMs: Option[Long] = None)(
      implicit s: SparkSession): StreamingQuery = {
    import s.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .selectExpr("user_id", "event_id", "value",
        "unix_micros(ts) AS us", "ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Sess, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup(stubTtlMs))
      .writeStream
      .format("parquet")
      .option("path", s"$root/sessions")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
  }
}
