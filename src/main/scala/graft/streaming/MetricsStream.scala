package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The CloudWatch monitoring surface as Structured Streaming (SURVEY.md §2
  * D1/D2/S2/S3): 1-minute tumbling Sum/Average metrics (app.ts:452–502) and
  * threshold alarms with N consecutive evaluation periods (app.ts:547–588).
  */
object MetricsStream {

  case class MetricPoint(ts: Timestamp, component: String, value: Double)

  /** Per-key alarm state: the minute currently accumulating (a minute may
    * arrive split across micro-batches), its cumulative count/sum, and the
    * consecutive-breach run length through the minute BEFORE it. */
  case class BreachState(curMinuteMs: Long, curCnt: Long, curSum: Double,
      runBefore: Int)

  case class MinuteStat(component: String, minuteMs: Long, cnt: Long,
      sum: Double, breached: Boolean, consecutive: Int, alarm: Boolean)

  /** 1-minute tumbling Sum/Average over an event-time watermark — the D1/D2
    * statistics. Late data beyond 10 minutes is dropped (the reference has
    * no event-time lateness concept at all; arrival time only). */
  def tumbling1min(points: DataFrame): DataFrame =
    points
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("component"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .select(unix_millis(col("window.start")).as("minute_ms"),
        col("component"), col("cnt"), col("sum_value"), col("avg_value"))

  /** Sliding (hopping) Sum/Average — 5-minute windows every minute, the
    * streaming twin of batch q90: CloudWatch's any-period-finer-refresh
    * chart. The 5× window expansion is map-side, before the partial
    * aggregate, so state is per (window, component) and the shuffle moves
    * one row per group per task; the watermark expires each window 10
    * minutes after its end. */
  def sliding5min(points: DataFrame): DataFrame =
    points
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("component"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .select(unix_millis(col("window.start")).as("window_ms"),
        col("component"), col("cnt"), col("sum_value"), col("avg_value"))

  /** Streaming sessionization: Spark's built-in `session_window` (gap-based,
    * 30 min) — the streaming twin of the batch q35_sessionize operator.
    * State is per (session_window, component), merged by the state store as
    * windows grow/merge; watermark bounds state retention.
    */
  def sessionWindows(points: DataFrame, gap: String = "30 minutes"): DataFrame =
    points
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("component"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("component"), col("n_events"), col("sum_value"))

  /** Stateful consecutive-breach alarm (S3): per component, bucket points
    * into minutes, mark minutes whose count exceeds `threshold`, and raise
    * `alarm` once `periods` consecutive minutes breach — the
    * `evaluationPeriods` semantics of app.ts:558–566. Keyed state is
    * hash-partitioned by component: no global ordering is needed, which is
    * what lets this scale; within a component, minutes are assumed to
    * arrive in order (arrival-time semantics, as in the reference).
    */
  def consecutiveBreaches(points: Dataset[MetricPoint], threshold: Long, periods: Int)(
      implicit spark: SparkSession): Dataset[MinuteStat] = {
    import spark.implicits._
    points
      .groupByKey(_.component)
      .flatMapGroupsWithState[BreachState, MinuteStat](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (component, it, state: GroupState[BreachState]) =>
          var st = state.getOption.getOrElse(BreachState(Long.MinValue, 0L, 0.0, 0))
          // Pre-aggregate to per-minute partials WHILE draining the iterator:
          // task memory is O(distinct minutes in the batch), never O(points)
          // — a single-component flood of raw points must not materialize
          // (the previous it.toSeq would OOM on exactly that batch).
          val partials = scala.collection.mutable.TreeMap.empty[Long, (Long, Double)]
          it.foreach { p =>
            val m = p.ts.getTime - p.ts.getTime % 60000L
            val (c0, s0) = partials.getOrElse(m, (0L, 0.0))
            partials.update(m, (c0 + 1L, s0 + p.value))
          }
          // "Consecutive" means minute-ADJACENT: a gap of point-free minutes
          // resets the run. A minute split across micro-batches accumulates
          // into the same state (cumulative cnt/sum re-emitted per fragment)
          // and extends the run at most once.
          val out = partials.toSeq.map { case (minuteMs, (cnt, sumV)) =>
            if (minuteMs != st.curMinuteMs) {
              val runThroughPrev =
                if (st.curCnt > threshold) st.runBefore + 1 else 0
              val adjacent = minuteMs == st.curMinuteMs + 60000L
              st = BreachState(minuteMs, 0L, 0.0,
                if (adjacent) runThroughPrev else 0)
            }
            st = st.copy(curCnt = st.curCnt + cnt, curSum = st.curSum + sumV)
            val breached = st.curCnt > threshold
            val cons = if (breached) st.runBefore + 1 else 0
            MinuteStat(component, minuteMs, st.curCnt, st.curSum, breached,
              cons, alarm = cons >= periods)
          }
          state.update(st)
          out.iterator
      }
  }
}
