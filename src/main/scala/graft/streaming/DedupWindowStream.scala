package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S23 — watermark-bounded EXACT streaming dedup: the third and last
  * cross-batch state shape the engine demonstrates, after S8 (standing
  * near-dup index with parquet-persisted accepted-set state) and S22
  * (arbitrary per-key GroupState): Spark's built-in stateful operator
  * `dropDuplicatesWithinWatermark`, keyed on the content hash, with the
  * state store's row lifecycle driven ENTIRELY by the event-time
  * watermark.
  *
  * The production story at 100 TB/day: unbounded exact dedup belongs to
  * the standing-corpus join (S8 — state grows with the corpus, so it
  * lives in a table, not a state store); what a state store is FOR is the
  * bounded re-fetch window — the same page crawled twice in a day, the
  * same record replayed by an at-least-once upstream within minutes.
  * Keying on sha256(text) (64 bytes) instead of the text keeps state rows
  * constant-width (the q96 rule: the hash shuffles, never the document);
  * the watermark delay IS the dedup window, and every key older than it
  * is evicted by the engine — state is bounded by window × ingest rate,
  * not by corpus size, with zero custom eviction code.
  *
  * Semantics (the operator's contract, kept deliberately): a duplicate
  * arriving WITHIN the watermark delay of its first occurrence is
  * dropped even if its event time precedes the first-seen row; a
  * duplicate arriving after the watermark passed the first occurrence's
  * expiry re-EMITS (by then it is indistinguishable from new content —
  * catching it is S8's job). Exactly-once to the sink follows from the
  * checkpointed state + file-sink commit log.
  */
object DedupWindowStream {

  /** Streaming driver. `docs` must carry (doc_id long, text string,
    * ts timestamp); first-in-window uniques append to `root/unique`.
    * `delay` is the dedup window (= watermark delay). */
  def run(docs: DataFrame, root: String, delay: String = "30 minutes",
      trigger: Trigger = Trigger.AvailableNow())(
      implicit s: SparkSession): StreamingQuery = {
    import s.implicits._
    docs
      .select($"doc_id", $"ts", sha2($"text", 256).as("content_key"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_key")
      .writeStream
      .format("parquet")
      .option("path", s"$root/unique")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .start()
  }

  /** The kept uniques — the consumer's view. */
  def uniques(root: String)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$root/unique").orderBy($"doc_id")
  }
}
