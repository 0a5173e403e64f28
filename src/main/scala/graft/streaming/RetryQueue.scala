package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** S5 — SQS redrive-policy semantics (reference app.ts:150–153:
  * `deadLetterQueue: { queue, maxReceiveCount: 3 }`; the signer re-raises on
  * failure, signer/index.js:322–328, so SQS redelivers and counts receives).
  *
  * A record that fails processing is retried on a later delivery; once it
  * has failed `maxReceives` deliveries it is parked in the DLQ instead of
  * retried — retry-then-park, not park-on-first-failure. The receive counter
  * is keyed streaming state, hash-partitioned by record id, so it scales
  * horizontally with no coordination; success or parking clears the entry,
  * bounding state at the set of currently-failing records (not stream
  * history).
  */
object RetryQueue {

  /** One delivery attempt: the record plus its processing outcome. `seq`
    * is the delivery sequence (receipt order — SQS deliveries are
    * timestamped); it makes in-batch ordering of one record's multiple
    * deliveries explicit rather than shuffle-order-dependent. */
  case class Attempt(recordId: String, payload: String, ok: Boolean,
      seq: Long = 0L)

  case class ReceiveCount(receives: Int)

  /** Routing decision for one delivery. `receives` is the failed-delivery
    * count through this attempt (0 for a success). */
  case class Routed(recordId: String, payload: String, receives: Int,
      route: String)

  val RouteOk = "ok"
  val RouteRetry = "retry"
  val RouteDlq = "dlq"

  /** Route each delivery: success → `ok` (counter cleared), failure →
    * `retry` until the record has failed `maxReceives` deliveries, then
    * `dlq` (counter cleared — a future re-send of the same id starts a
    * fresh redrive cycle, matching SQS after a DLQ redrive). Deliveries of
    * the same record within one micro-batch each count as a receive (SQS
    * counts deliveries, not batches). Works on batch and streaming
    * Datasets.
    */
  def route(attempts: Dataset[Attempt], maxReceives: Int = 3)(
      implicit spark: SparkSession): Dataset[Routed] = {
    import spark.implicits._
    attempts
      .groupByKey(_.recordId)
      .flatMapGroupsWithState[ReceiveCount, Routed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (recordId, it, state: GroupState[ReceiveCount]) =>
          var receives = state.getOption.map(_.receives).getOrElse(0)
          // each group is ONE record's deliveries within the batch — tiny by
          // construction, safe to drain before the state update below. The
          // group iterator arrives in shuffle order; sort by the delivery
          // sequence (tie-broken totally) so a batch holding both a failure
          // and a success for one record routes the same way on every
          // replay — the same trick KeyLease uses with eventId.
          val out = it.toVector.sortBy(a => (a.seq, a.ok, a.payload)).map { a =>
            if (a.ok) {
              receives = 0
              Routed(recordId, a.payload, 0, RouteOk)
            } else {
              receives += 1
              if (receives >= maxReceives) {
                val parked = Routed(recordId, a.payload, receives, RouteDlq)
                receives = 0
                parked
              } else Routed(recordId, a.payload, receives, RouteRetry)
            }
          }.toVector
          if (receives == 0) state.remove()
          else state.update(ReceiveCount(receives))
          out.iterator
      }
  }

  /** Sink stage: split routed deliveries into `ok/`, `retry/` (the
    * redelivery feed a source re-ingests) and `dlq/` directories — the
    * same one-pass persist-and-split shape as
    * [[IngestStream.writeLake]]. */
  def writeRouted(routed: DataFrame, dir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    routed.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try for (r <- Seq(RouteOk, RouteRetry, RouteDlq)) {
          val side = batch.filter(col("route") === r)
          if (!side.isEmpty)
            side.write.mode("append").parquet(s"$dir/$r")
        } finally { batch.unpersist(); () }
      }
      .start()
}
