package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S8 streaming corpus refresh: batches are near-dup-checked against the
  * static corpus AND every earlier accepted doc; replays re-derive the same
  * split (idempotent state overwrite).
  */
class DedupStreamSpec extends SparkSpec {

  private val corpusTail =
    "grumpy wizards make toxic brew for the evil queen and jack"

  /** A tiny corpus dir with one distinctive doc. */
  private def writeCorpus(): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-dsc-").toString
    Seq((1000L, s"prefix one $corpusTail")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    root
  }

  private def batchDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("batches dedup against corpus AND earlier accepted batches; replay is idempotent") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val corpusDir = writeCorpus()
    val root = Files.createTempDirectory("graft-ds-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    val novelTail = "seventeen violet umbrellas quietly argued about rhubarb pie tonight"
    // batch 0: a near-dup of the CORPUS doc, a novel doc, and a too-short
    // doc — appended as bare part files (the file source does not recurse
    // into nested dataset directories)
    batchDf(Seq(
      (1L, s"prefix two $corpusTail"),
      (2L, s"intro words $novelTail"),
      (3L, "too short"),
    )).write.mode("append").parquet(incoming)

    val stream0 = s.readStream.schema("doc_id long, text string").parquet(incoming)
    val q0 = DedupStream.run(stream0, corpusDir, root)
    assert(q0.awaitTermination(120000))

    // batch 1 (new file, restarted stream): a near-dup of batch 0's ACCEPTED
    // doc (cross-batch state must catch it) and another novel doc
    batchDf(Seq(
      (4L, s"other words $novelTail"),
      (5L, "completely fresh content about deterministic parquet layouts here"),
    )).write.mode("append").parquet(incoming)
    val stream1 = s.readStream.schema("doc_id long, text string").parquet(incoming)
    val q1 = DedupStream.run(stream1, corpusDir, root)
    assert(q1.awaitTermination(120000))

    val dups = s.read.parquet(s"$root/dups")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(dups === Set((1L, 1000L), (4L, 2L)),
      s"expected corpus-dup and cross-batch dup, got $dups")
    val clean = s.read.parquet(s"$root/clean")
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(clean === Seq(2L, 3L, 5L), s"clean set wrong: $clean")
    // too-short doc 3 is accepted but NOT in state (nothing to match later)
    val state = s.read.parquet(s"$root/state")
      .select($"doc_id").as[Long].collect().toSet
    assert(state === Set(2L, 5L), s"state should hold only shingled accepts: $state")

    // replay batch 0's decision: re-running splitBatch against the
    // standing-before view must reproduce the original split exactly
    val b0 = batchDf(Seq(
      (1L, s"prefix two $corpusTail"),
      (2L, s"intro words $novelTail"),
      (3L, "too short"),
    ))
    val prior = DedupStream.standingBefore(s, corpusDir, s"$root/state", 0L)
    val (rp, ra) = DedupStream.splitBatch(s, b0, prior)
    assert(rp.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet ===
      Set((1L, 1000L)))
    assert(ra.select($"doc_id").as[Long].collect().toSet === Set(2L))
  }
}
