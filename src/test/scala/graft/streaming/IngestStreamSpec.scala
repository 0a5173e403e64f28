package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.functions.Djb2

class IngestStreamSpec extends SparkSpec {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  test("partitionRecords: decode, key fallback, djb2 routing, error isolation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("rec-1", b64("""{"id": "tx-001", "value": 7}""")),
      ("rec-2", b64("""{"value": 9}""")), // no id → whole payload is the key
      ("rec-3", b64("this is not json")),
    ).toDF("recordId", "data")
    val out = IngestStream.partitionRecords(df, 5)
      .select("recordId", "result", "bucket_partition")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap

    assert(out("rec-1") == ("Ok", s"partition_${Djb2.hash("tx-001") % 5}"))
    assert(out("rec-2")._1 == "Ok")
    assert(out("rec-2")._2 == s"partition_${Djb2.hash("""{"value": 9}""") % 5}")
    assert(out("rec-3") == ("ProcessingFailed", null))
  }

  test("streaming lake write: ok records land partitioned, failures in errors/") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = Files.createTempDirectory("graft-lake-").toString
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val ts0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val records = input.toDF().toDF("recordId", "data", "ts")
    // data must be present BEFORE the query starts: AvailableNow snapshots
    // the available offsets at start, so addData after start() races the
    // snapshot and can leave the run with zero batches
    input.addData(
      ("r1", b64("""{"id": "tx-001"}"""), ts0),
      ("r2", b64("garbage"), ts0))
    val q = IngestStream.writeLake(
      IngestStream.partitionRecords(records, 5),
      dir, s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination(60000)

    val raw = s.read.parquet(s"$dir/raw")
    assert(raw.count() === 1)
    // partition pruning: the filter is on directory columns only
    val pruned = raw.filter($"bucket_partition" === s"partition_${Djb2.hash("tx-001") % 5}"
      && $"year" === 2024 && $"day" === 5)
    assert(pruned.count() === 1)
    val errs = s.read.parquet(s"$dir/errors")
    assert(errs.count() === 1)
    assert(errs.select("result").head.getString(0) === "ProcessingFailed")
  }
}
