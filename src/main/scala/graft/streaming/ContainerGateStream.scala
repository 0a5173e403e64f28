package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.multimodal.Multimodal

/** S26 — streaming container gate: media payloads classified at the ingest
  * boundary (VERDICT r11 #9), where a multimodal pipeline actually wants
  * it — an asset that fails its container walk is quarantined BEFORE any
  * downstream decode/feature stage is paid, with the classification
  * evidence (n_bytes and whatever family fields parsed) kept alongside.
  * Classification is the LITERAL batch dispatch
  * ([[Multimodal.classifyContainers]] → the registered q163/q176/q186
  * parsers), so stream and batch cannot disagree on a payload — the same
  * staged-code discipline as S25's Hampel gate. This operationalizes the
  * r12 robustness work: the clamped walks guarantee a malformed or
  * adversarial asset is a `quarantine/` row, never a dead micro-batch
  * (the A3 error-isolation contract; reference partitioner/index.js:71-80
  * for the error-split shape).
  *
  * Stateless like S9/S19/S25: the decision is a pure per-row function, so
  * a replayed at-least-once batch overwrites its `batch=<id>` partition
  * with an identical split — effectively-exactly-once sinks with no state
  * store. Media rows land under `media/batch=<id>/container=<family>/`
  * (Hive layout, so downstream family jobs partition-prune their scans);
  * failures under `quarantine/batch=<id>/`.
  *
  * Scale shape per batch: five map-side subplans of the micro-batch scan,
  * zero trigger-path shuffles, header-bounded hex per row; the payload is
  * dropped from the classified sinks (metadata rows, not asset copies).
  */
object ContainerGateStream {

  /** Pure batch-side split: (media, quarantine). `batch` must carry
    * (doc_id long, payload binary). */
  private[streaming] def splitBatch(batch: DataFrame)
      : (DataFrame, DataFrame) = {
    val s = batch.sparkSession
    import s.implicits._
    // both sinks re-run the map-side classify plan — deliberately: a
    // codegen'd projection is cheaper than materializing the batch (the
    // S19/S25 measurement)
    val classified = Multimodal.classifyContainers(batch)
    (classified.filter($"container" =!= "unknown"),
      classified.filter($"container" === "unknown"))
  }

  /** Streaming driver. `media` must carry (doc_id long, payload binary). */
  def run(media: DataFrame, root: String,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit s: SparkSession): StreamingQuery = {
    media.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (ok, quarantine) = splitBatch(batch)
        ok.write.mode(SaveMode.Overwrite)
          .partitionBy("container")
          .parquet(s"$root/media/batch=$batchId")
        quarantine.write.mode(SaveMode.Overwrite)
          .parquet(s"$root/quarantine/batch=$batchId")
        ()
      }
      .start()
  }
}
