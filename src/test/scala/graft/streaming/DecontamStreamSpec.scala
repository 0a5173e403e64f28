package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S9 streaming decontamination: batches split on eval n-gram collisions;
  * the split is a pure function of (batch, eval set) so restarts and
  * replays land identical decisions.
  */
class DecontamStreamSpec extends SparkSpec {

  private val evalPhrase =
    "the quick brown fox jumps over the lazy benchmark sentence"

  /** Corpus dir whose eval slice (doc_id % 97 == 0) holds one benchmark
    * doc; a non-eval corpus doc shares nothing with it. */
  private def writeCorpus(): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-dcc-").toString
    Seq(
      (0L, evalPhrase), // 0 % 97 == 0 → the eval slice
      (5L, "ordinary corpus text with no overlap whatsoever here"),
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    root
  }

  test("contaminated docs route to contam with hit stats; clean pass; replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val corpusDir = writeCorpus()
    val root = Files.createTempDirectory("graft-dc-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    // batch 0: one doc quoting a 4-gram span of the benchmark, one clean,
    // one too short to shingle (must pass clean)
    Seq(
      (1L, s"contains the quick brown fox jumps verbatim inside"),
      (2L, "totally unrelated text about parquet partition layouts"),
      (3L, "tiny doc"),
    ).toDF("doc_id", "text").write.mode("append").parquet(incoming)
    val q0 = DecontamStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming),
      corpusDir, root)
    assert(q0.awaitTermination(120000))

    // batch 1, restarted stream: another contaminated doc
    Seq(
      (4L, s"quotes over the lazy benchmark sentence at the end"),
    ).toDF("doc_id", "text").write.mode("append").parquet(incoming)
    val q1 = DecontamStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming),
      corpusDir, root)
    assert(q1.awaitTermination(120000))

    val contam = s.read.parquet(s"$root/contam")
    assert(contam.select($"doc_id").as[Long].collect().toSet === Set(1L, 4L))
    // doc 1 shares exactly 2 distinct 4-gram windows of the benchmark
    // ("the quick brown fox", "quick brown fox jumps")
    val r1 = contam.filter($"doc_id" === 1L).collect().head
    assert(r1.getAs[Long]("n_hit") === 2L)
    assert(r1.getAs[Double]("hit_frac") > 0.0 && r1.getAs[Double]("hit_frac") <= 1.0)
    val clean = s.read.parquet(s"$root/clean")
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(clean === Seq(2L, 3L), s"clean set wrong: $clean")

    // replay batch 0's decision: identical split from the pure function
    val ev = DecontamStream.evalHashes(s, corpusDir)
    val b0 = Seq(
      (1L, s"contains the quick brown fox jumps verbatim inside"),
      (2L, "totally unrelated text about parquet partition layouts"),
      (3L, "tiny doc"),
    ).toDF("doc_id", "text")
    val (rc, rl) = DecontamStream.splitBatch(s, b0, ev)
    assert(rc.select($"doc_id").as[Long].collect().toSet === Set(1L))
    assert(rl.select($"doc_id").as[Long].collect().toSet === Set(2L, 3L))
  }
}
