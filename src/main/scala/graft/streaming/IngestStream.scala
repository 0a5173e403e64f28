package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Djb2

/** EP1 — the ingest/partitioner pipeline as Structured Streaming
  * (SURVEY.md §3 EP1). The reference's four service hops (Firehose buffer →
  * partitioner Lambda → S3 raw/ | errors/) collapse into one Catalyst plan:
  * micro-batch trigger ≙ the Firehose 60 s flush (app.ts:406–409), the
  * partitioned file sink ≙ the `raw/partition_N/year=…/hour=…` lake layout
  * (app.ts:400,411), the error split ≙ `errorOutputPrefix` +
  * `ProcessingFailed` (app.ts:412, partitioner/index.js:71–80).
  */
object IngestStream {

  /** Transform stage (partitioner/index.js:40–83): base64 decode → JSON
    * validity check (PERMISSIVE: corrupt → ProcessingFailed, the record
    * survives) → key extract with whole-payload fallback → djb2 partition.
    * Works identically on batch and streaming frames — it is a pure
    * projection, fully codegen'd, map-only at any scale.
    *
    * Input schema: `recordId: string, data: string` (base64 payload),
    * optionally `ts: timestamp` for the time-partition columns.
    */
  def partitionRecords(records: DataFrame, nPartitions: Int,
      keyField: String = "id"): DataFrame = {
    val payload = unbase64(col("data")).cast("string")
    records
      .withColumn("payload", payload)
      // get_json_object(payload, "$") null ⇔ JSON.parse throws OR the root
      // is JSON null — the latter also fails in the reference (payload.id
      // on null throws TypeError, partitioner/index.js:51), so the
      // classification matches either way
      .withColumn("parse_ok", get_json_object(col("payload"), "$").isNotNull)
      .withColumn("result", when(col("parse_ok"), "Ok").otherwise("ProcessingFailed"))
      .withColumn("key",
        coalesce(get_json_object(col("payload"), s"$$.$keyField"), col("payload")))
      .withColumn("bucket_partition",
        when(col("parse_ok"),
          concat(lit("partition_"),
            pmod(Djb2.djb2(col("key")), lit(nPartitions.toLong)).cast("string"))))
  }

  /** Sink stage: one foreachBatch writer splitting Ok records into the
    * partitioned lake and failures under `errors/` (A2 + A3). Both writes
    * land Hive-partitioned so downstream readers get directory pruning.
    */
  def writeLake(partitioned: DataFrame, lakeDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    partitioned
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // three actions below (ok write, err probe, err write) — persist so
        // the source micro-batch and the decode projection run once
        batch.persist()
        try {
          val ok = batch.filter(col("result") === "Ok")
          ok.write.mode("append")
            .partitionBy("bucket_partition", "year", "month", "day", "hour")
            .parquet(s"$lakeDir/raw")
          val err = batch.filter(col("result") =!= "Ok")
          if (!err.isEmpty)
            err.write.mode("append")
              .partitionBy("year", "month", "day", "hour")
              .parquet(s"$lakeDir/errors")
        } finally batch.unpersist()
      }
      .start()
  }
}
