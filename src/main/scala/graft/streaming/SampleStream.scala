package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

import graft.ops.Curation

/** S24 — streaming weighted reservoir: q170's Efraimidis–Spirakis sample
  * maintained ONLINE. A-Res is literally the reservoir algorithm — each
  * item's key u^(1/w) is fixed at first sight, and the sample is the
  * standing top-k of keys — so the streaming form needs only MERGEABLE
  * top-k state: per key-shard, a GroupState holding that shard's top-64
  * (key, doc) rows, folded per micro-batch; the global sample is the
  * top-64 of the ≤ 32·64 shard-reservoir rows at read time. Because the
  * key is a pure function of (doc_id, w) — the recomputable q145 draw
  * through [[Curation.aresKeyed]], shared verbatim with the batch query —
  * a corpus replayed through the stream yields EXACTLY q170's sample
  * (spec-pinned), and the merge property (global top-k = top-k of
  * per-shard top-ks) is the same identity a 1000-executor batch
  * TakeOrdered relies on, applied across TIME instead of across tasks.
  *
  * State discipline: 32 groups × ≤ 64 rows of four longs — bounded
  * metadata regardless of stream length (the whole point of a
  * reservoir); no timeout (the reservoir lives as long as the sampling
  * window/job). Each batch OVERWRITES the shard's reservoir snapshot
  * under `reservoir/shard=<k>`, so an at-least-once replay rewrites an
  * identical file (the fold is idempotent: re-merging rows already in
  * the reservoir changes nothing — dedup by doc_id inside the fold).
  *
  * At 100 TB/day: the seam is one map-side key projection + a 32-group
  * shuffle of batch candidates (each batch contributes at most its own
  * top-64 per shard — the fold prunes before state), zero corpus
  * storage. */
object SampleStream {

  val ReservoirK = 64
  val KeyShards = 32L

  case class Cand(shard: Long, doc_id: Long, w: Long, u: Long,
      key_micro: Long)
  case class Res(items: Seq[(Long, Long, Long, Long)]) // (key, doc, w, u)
  case class ResRow(shard: Long, doc_id: Long, w: Long, u: Long,
      key_micro: Long)

  /** The reservoir fold: merge a batch's candidates into the standing
    * top-64, dedup by doc_id (replay safety), order by (key DESC,
    * doc_id ASC) — q170's exact comparator. Factored for spec replay. */
  private[streaming] def fold(existing: Seq[(Long, Long, Long, Long)],
      batch: Iterator[Cand]): Seq[(Long, Long, Long, Long)] =
    (existing ++ batch.map(c => (c.key_micro, c.doc_id, c.w, c.u)))
      .groupBy(_._2).values.map(_.head).toSeq
      // explicit reverse ordering, NOT sortBy(-k): negating Long.MinValue
      // overflows and would sort the worst key first
      .sortBy { case (k, d, _, _) => (k, d) }(
        Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
      .take(ReservoirK)

  private def updateGroup(shard: Long, batch: Iterator[Cand],
      state: GroupState[Res]): Iterator[ResRow] = {
    val merged = fold(state.getOption.map(_.items).getOrElse(Seq.empty), batch)
    state.update(Res(merged))
    merged.iterator.map { case (k, d, w, u) => ResRow(shard, d, w, u, k) }
  }

  /** Streaming driver. `docs` must carry (doc_id long, text string);
    * every batch refreshes the touched shards' reservoir snapshots under
    * `root/reservoir/shard=<k>`. */
  def run(docs: DataFrame, root: String,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit s: SparkSession): StreamingQuery = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    Curation.aresKeyed(docs)
      .withColumn("shard", pmod(xxhash64($"doc_id"), lit(KeyShards)))
      .select($"shard", $"doc_id", $"w", $"u", $"key_micro")
      .as[Cand]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Res, ResRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateGroup _)
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ResRow], _: Long) =>
        // dynamic partition overwrite: only the shards this batch touched
        // are rewritten, each with its full current reservoir — an
        // at-least-once replay rewrites identical snapshots
        batch.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("shard").parquet(s"$root/reservoir")
        ()
      }
      .start()
  }

  /** The merged global sample — q170's shape (rank, doc_id, n_tokens, u,
    * key_micro): top-64 over the union of shard reservoirs. */
  def sample(root: String)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val top = s.read.parquet(s"$root/reservoir")
      .orderBy($"key_micro".desc, $"doc_id").limit(ReservoirK)
    top.withColumn("rank", row_number()
        .over(Window.orderBy($"key_micro".desc, $"doc_id")).cast("long"))
      .select($"rank", $"doc_id", $"w".as("n_tokens"), $"u", $"key_micro")
  }
}
