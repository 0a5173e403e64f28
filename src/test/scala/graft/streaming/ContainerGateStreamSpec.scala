package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal

/** S26 streaming container gate: decisions are the literal q188 dispatch,
  * media ∪ quarantine is a partition of the input, the Hive container
  * layout prunes, and replay re-decides identically.
  */
class ContainerGateStreamSpec extends SparkSpec {

  test("classification parity with q188, sinks partition the input, " +
      "container layout prunes, replay is idempotent") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-cg-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    val media = Multimodal.q188ContainerGate(s, sf) // batch truth
    Multimodal.mixedMediaTable(s, sf)
      .write.mode("append").parquet(incoming)

    val q0 = ContainerGateStream.run(
      s.readStream.schema("doc_id long, payload binary").parquet(incoming),
      root)
    assert(q0.awaitTermination(120000))

    def key(r: org.apache.spark.sql.Row): (Long, String, String, Seq[Long]) =
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "-" else r.getString(2),
        (3 to 12).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)))
    val cols = Seq($"doc_id", $"container", $"byte_order", $"width", $"height",
      $"bit_depth", $"channels", $"sample_rate", $"data_size",
      $"duration_ms", $"timescale", $"duration", $"n_bytes")
    val ok = s.read.parquet(s"$root/media").select(cols: _*)
      .collect().map(key)
    val quarantined = s.read.parquet(s"$root/quarantine").select(cols: _*)
      .collect().map(key)
    val truth = media.collect().map(key)

    // the stream's two sinks ARE the batch classification, split
    assert(ok.forall(_._2 != "unknown"))
    assert(quarantined.forall(_._2 == "unknown"))
    assert((ok ++ quarantined).sortBy(_._1).toSeq ===
      truth.sortBy(_._1).toSeq)
    assert(ok.nonEmpty && quarantined.nonEmpty, "fixture split degenerate")
    // all five families present — the gate exercises every dispatch arm
    assert(ok.map(_._2).toSet === Set("png", "jpeg", "wav", "mp4", "tiff"))

    // Hive layout: one directory per family under the batch dir, so a
    // family job's filter prunes to its own files
    val famDirs = new java.io.File(s"$root/media/batch=0").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(famDirs === Set("container=png", "container=jpeg",
      "container=wav", "container=mp4", "container=tiff"))

    // replay: a restarted stream over one more file re-decides with the
    // same dispatch — a malformed asset must quarantine, not kill the run
    val garbage: Array[Byte] =
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++
        Array.fill(8)(0x69.toByte) // the r11 CAST_OVERFLOW repro shape
    Seq((90000001L, garbage)).toDF("doc_id", "payload")
      .write.mode("append").parquet(incoming)
    val q1 = ContainerGateStream.run(
      s.readStream.schema("doc_id long, payload binary").parquet(incoming),
      root)
    assert(q1.awaitTermination(120000))
    val quarantined2 = s.read.parquet(s"$root/quarantine")
      .select($"doc_id").as[Long].collect().toSet
    assert(quarantined2.contains(90000001L),
      "malformed asset must land in quarantine")
    assert(quarantined2 -- Set(90000001L) === quarantined.map(_._1).toSet,
      "replay changed prior decisions")
  }
}
