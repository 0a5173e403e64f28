package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S6/S7 — the exclusive LRU key lease as partitioned streaming state.
  *
  * The reference leases one Ethereum key per batch from Aurora with
  * `ORDER BY last_used_at ASC LIMIT 1 FOR UPDATE SKIP LOCKED` inside a
  * transaction (signer/index.js:151–214). Its locking is aspirational (the
  * row lock is released at COMMIT *before* signing — signer/index.js:179),
  * so we implement the intended semantics: a key is never assigned
  * concurrently, rotation is least-recently-used, `last_used_at` advances on
  * every assignment.
  *
  * Scale design: the keyring is sharded — key k lives in shard
  * k % nShards, and records are routed to a shard up front. Each shard's
  * keyring is a single `GroupState` owned by exactly one task
  * (hash-partitioned by Spark's state store), so exclusivity holds *by
  * construction* — no `SKIP LOCKED`, no distributed lock, and shards scale
  * horizontally where the reference serialized on one Aurora row range.
  * `last_used` is a deterministic logical clock (the reference's `NOW()`
  * would make results time-dependent and untestable).
  */
object KeyLease {

  case class SignRequest(eventId: Long, shard: Int, payload: String)

  /** last_used logical clocks per key id within the shard. */
  case class ShardKeyring(lastUsed: Map[Int, Long], clock: Long)

  case class Leased(eventId: Long, shard: Int, keyId: Int, leaseSeq: Long)

  /** Assign each request the shard-local least-recently-used key
    * (tie → smallest key id, mirroring `ORDER BY last_used_at ASC` +
    * deterministic id order). Works on batch and streaming Datasets.
    */
  def leaseAndAssign(requests: Dataset[SignRequest], keysPerShard: Int)(
      implicit spark: SparkSession): Dataset[Leased] = {
    import spark.implicits._
    requests
      .groupByKey(_.shard)
      .flatMapGroupsWithState[ShardKeyring, Leased](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[ShardKeyring]) =>
          var st = state.getOption.getOrElse(
            ShardKeyring((0 until keysPerShard).map(_ -> 0L).toMap, 0L))
          // Deterministic in-batch order (SQS batches are ordered per queue)
          // needs a sort, and a sort needs the batch materialized — but only
          // the 8-byte event ids, not the full requests with payloads
          // (project while draining the iterator, then sort in place). A
          // flooded shard costs one long per request, not one record.
          val ids = it.map(_.eventId).toArray
          java.util.Arrays.sort(ids)
          val out = ids.map { eventId =>
            val (keyId, _) = st.lastUsed.minBy { case (k, lu) => (lu, k.toLong) }
            val seq = st.clock + 1
            st = ShardKeyring(st.lastUsed + (keyId -> seq), seq)
            Leased(eventId, shard, keyId, seq)
          }
          state.update(st)
          out.iterator
      }
  }
}
