package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TextAnalysis

/** S13 streaming RAG chunk ingest: the per-batch chunker IS the batch
  * query's chunker (shared code path), the merged index equals the batch
  * answer over the same docs, replay overwrites land byte-identical
  * partitions, and the provenance probe finds a chunk by content hash.
  */
class ChunkStreamSpec extends SparkSpec {

  private def words(n: Int): Seq[String] = (1 to n).map(i => s"w$i")

  test("merged index == batch chunker; cross-restart append; replay pure; lookup probe") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cs-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    // batch 0: a short doc (1 chunk) and a 200-token doc (4 chunks)
    val b0 = Seq((1L, words(10).mkString(" ")), (2L, words(200).mkString(" ")))
    b0.toDF("doc_id", "text").write.mode("append").parquet(incoming)
    val q0 = ChunkStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming), root)
    assert(q0.awaitTermination(120000))

    // batch 1, restarted stream: a 65-token doc (2 chunks)
    val b1 = Seq((3L, words(65).mkString(" ")))
    b1.toDF("doc_id", "text").write.mode("append").parquet(incoming)
    val q1 = ChunkStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming), root)
    assert(q1.awaitTermination(120000))

    // the standing index equals the BATCH chunker over the union of docs —
    // streaming adds arrival-time partitioning, never different chunks
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    val merged = keyed(ChunkStream.mergedChunks(s, root)
      .select($"doc_id", $"chunk_idx", $"n_tokens", $"chunk_sha256").collect())
    val batchAnswer = keyed(TextAnalysis.chunkDocs(
      (b0 ++ b1).toDF("doc_id", "text")).collect())
    assert(merged === batchAnswer)
    assert(merged.size === 7) // 1 + 4 + 2 chunks
    // chunk partitions carry their producing batch
    val byBatch = ChunkStream.mergedChunks(s, root)
      .groupBy($"batch".cast("long").as("batch")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch === Map(0L -> 5L, 1L -> 2L))

    // replay: re-running batch 0's body overwrites its partition with the
    // identical rows — the merged index is unchanged (exactly-once effect)
    ChunkStream.writeBatch(b0.toDF("doc_id", "text"), root, 0L)
    val replayed = keyed(ChunkStream.mergedChunks(s, root)
      .select($"doc_id", $"chunk_idx", $"n_tokens", $"chunk_sha256").collect())
    assert(replayed === merged)

    // provenance probe: doc 3's second chunk (tokens 49..65) by its hash
    val d = java.security.MessageDigest.getInstance("SHA-256")
    val sha = d.digest(words(65).drop(48).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val hits = ChunkStream.lookup(s, root, sha).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(hits.toSeq === Seq((3L, 1L, 17L, 1L)))
  }
}
