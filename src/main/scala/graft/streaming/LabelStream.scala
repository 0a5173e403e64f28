package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** S27 — streaming connected-component label maintenance: the standing
  * cluster-label artifact (the asset q62/q80/q81 consume) kept current as
  * near-dup pair batches arrive, instead of re-clustering the corpus per
  * refresh. Each micro-batch folds its edges into the previous label
  * version through the LITERAL q191 merge core ([[Dedup.mergeLabels]]):
  * contract the batch's endpoints to their standing labels, run CC on the
  * DELTA-bounded contracted graph, relabel through the resulting map —
  * stream and batch cannot disagree on a merge, and because component
  * merging is commutative/associative, the final labels are independent
  * of how edges were batched (the spec drives the same edge set in one
  * and in many batches and asserts identical labels == the q60 rescan).
  *
  * Versioned-artifact idempotence (the q164 manifest discipline, not a
  * state store): batch b reads `labels/v=<max version < b>` and
  * OVERWRITES `labels/v=b`, so an at-least-once replay of batch b
  * recomputes from the same input version and rewrites an identical
  * artifact. Readers take the highest version — the q139/SCD2-style
  * snapshot contract.
  *
  * Scale shape per batch: the contracted CC runs on batch-bounded
  * metadata; the relabel is one broadcast join against the standing
  * label table; the artifact rewrite is labels-table-sized (graph nodes,
  * not corpus rows). At 100 TB the rewrite becomes a partitioned
  * merge-on-read table — the merge math is unchanged.
  */
object LabelStream {

  private[streaming] def emptyLabels(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long)].toDF("doc_id", "cluster")
  }

  /** Highest committed label version strictly below `batchId`. */
  private[streaming] def latestVersionBelow(root: String, batchId: Long)
      : Option[Long] = {
    val dir = new java.io.File(s"$root/labels")
    if (!dir.isDirectory) None
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < batchId)
      .sorted(Ordering[Long].reverse)
      .headOption
  }

  /** Current labels — what a consumer reads between batches. */
  def currentLabels(s: SparkSession, root: String): DataFrame =
    latestVersionBelow(root, Long.MaxValue)
      .map(v => s.read.parquet(s"$root/labels/v=$v"))
      .getOrElse(emptyLabels(s))

  /** Streaming driver. `pairs` must carry (doc_a long, doc_b long). */
  def run(pairs: DataFrame, root: String,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit s: SparkSession): StreamingQuery = {
    pairs.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import s.implicits._
        val prev = latestVersionBelow(root, batchId)
          .map(v => s.read.parquet(s"$root/labels/v=$v"))
          .getOrElse(emptyLabels(s))
        val (labels, _) =
          Dedup.mergeLabels(prev, batch.select($"doc_a", $"doc_b"))
        labels.write.mode(SaveMode.Overwrite)
          .parquet(s"$root/labels/v=$batchId")
        ()
      }
      .start()
  }
}
