package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{IngestStream, SigningStream}

/** End-to-end streaming throughput: the full EP1→EP2 chain (base64 decode →
  * djb2 partition → dedup → keyring join → sign) over the sf events replayed
  * as a file-source stream, measured in records/second.
  *
  * The reference's derived signing ceiling is 0.056–1.67 objects/s
  * (BASELINE.md: 5 concurrent Lambdas × batches of 10 × 30 s admission);
  * this number is the single-node Spark equivalent for the same semantics.
  *
  * Two entry points: [[measure]] (reused by [[Bench]], whose JSON line —
  * the per-round BENCH artifact — carries a `streambench` object, so
  * streaming throughput regressions are visible round-to-round, not only
  * in verdict prose) and [[main]] (standalone, one JSON line, emitted
  * triple-redundantly like Bench: stdout, stderr, and
  * `target/streambench.json`). Run: `sbt "runMain graft.StreamBench"`.
  */
object StreamBench {
  final case class Result(recordsPerSec: Double, records: Long, signed: Long,
      seconds: Double) {
    /** The embeddable JSON object (no metric wrapper). A degenerate run
      * (zero or non-finite seconds → Infinity/NaN rate) emits -1 markers:
      * bare `Infinity`/`NaN` tokens are not valid JSON and would break the
      * driver's parse of the whole bench line (ADVICE r6). */
    def json: String = {
      val rate = if (seconds.isFinite && seconds > 0 && recordsPerSec.isFinite)
        recordsPerSec else -1.0
      val secs = if (seconds.isFinite) seconds else -1.0
      f"""{"records_per_sec":$rate%.1f,"records":$records,"signed":$signed,"seconds":$secs%.3f}"""
    }
  }

  /** Run the EP1→EP2 chain once over `sfDir`'s events from a clean slate.
    * recordsPerSec is −1 on timeout (signed = −1), so a stream that stops
    * completing cannot masquerade as a fast one. */
  def measure(spark: SparkSession, sfDir: String,
      timeoutMs: Long = 600000): Result = {
    import spark.implicits._
    implicit val sp: SparkSession = spark

    val root = s"/root/repo/target/streambench/${new java.io.File(sfDir).getName}"
    // stale checkpoint + signatures would turn the timed run into an
    // anti-join-suppressed no-op — always measure from a clean slate
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val incoming = s"$root/incoming"
    // Replay events as raw ingest records (base64-wrapped JSON payloads).
    val raw = Tables(spark, sfDir, "events")
      .select($"event_id".cast("string").as("recordId"),
        base64($"props".cast("binary")).as("data"), $"ts")
    raw.write.mode("overwrite").parquet(incoming)
    val n = spark.read.parquet(incoming).count()

    val keyring = ops.Pipeline.keyring(spark)

    val t0 = System.nanoTime()
    val stream = spark.readStream
      .schema("recordId string, data string, ts timestamp")
      .parquet(incoming)
    // the fixture's record-id field is `k` (FIXTURES.md) — same key rule
    // as batch q20/q22, so partition routing and signatures agree
    val partitioned = IngestStream.partitionRecords(stream, 5, keyField = "k")
      .filter(col("result") === "Ok")
      .select(col("payload"), col("ts"),
        concat(lit("raw/"), col("bucket_partition"), lit("/obj-"), col("recordId")).as("s3_path"))
    val q = SigningStream.run(partitioned, keyring, s"$root/sigs", s"$root/ckpt",
      Trigger.AvailableNow(), keyField = "k")
    val finished = q.awaitTermination(timeoutMs)
    val secs = (System.nanoTime() - t0) / 1e9
    if (!finished) {
      q.stop()
      System.err.println(s"[streambench] timed out after $secs s")
      Result(-1.0, n, -1L, secs)
    } else {
      val signed = spark.read.parquet(s"$root/sigs").count()
      Result(n / secs, n, signed, secs)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTITIONS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val r = measure(spark, sfDir)
    val line = s"""{"metric":"stream_records_per_sec","value":${r.recordsPerSec},""" +
      s""""unit":"rec/sec","records":${r.records},"signed":${r.signed},""" +
      s""""seconds":${r.seconds},"sf":"$sfDir"}"""
    // Triple-redundant emission, same contract as Bench: raw stdout for
    // the parser, stderr + file as belt-and-braces.
    println(line)
    System.err.println(line)
    try {
      val out = java.nio.file.Paths.get("target", "streambench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[streambench] file write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
