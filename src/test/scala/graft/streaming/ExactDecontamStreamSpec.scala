package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S17 streaming EXACT-substring decontamination: per-batch suffix-order
  * nearest-eval scan against the staged eval suffix-key table — exact LCS
  * lengths (capped at KeyCap), the q134 flag rule at the stream boundary,
  * pure-function replay idempotency, and full parity with batch q134 on
  * the driver fixture.
  */
class ExactDecontamStreamSpec extends SparkSpec {

  private val evalPhrase =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  /** Corpus dir whose eval slice (doc_id % 97 == 0) holds one benchmark
    * doc of 10 tokens. */
  private def writeCorpus(): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-xdc-").toString
    Seq(
      (0L, evalPhrase),
      (5L, "ordinary corpus text with no overlap whatsoever here"),
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    root
  }

  test("exact LCS lengths, ≥8-token flag, replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    ExactDecontamStream.evictSession(s)
    val corpusDir = writeCorpus()
    val root = Files.createTempDirectory("graft-xd-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    // doc 1: a 7-token quote — UNDER the 8-token gate (S9's 4-gram rule
    // would flag it; the exact gate reports 7 and admits it)
    // doc 2: an 8-token quote — flagged at exactly 8
    // doc 3: no overlap — lcs from shared single tokens only (0 here)
    Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta suffix"),
      (2L, "x alpha beta gamma delta epsilon zeta eta theta y"),
      (3L, "totally unrelated text about parquet partition layouts"),
    ).toDF("doc_id", "text").write.mode("append").parquet(incoming)
    val q0 = ExactDecontamStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming),
      corpusDir, root)
    assert(q0.awaitTermination(300000))

    // restarted stream, batch 1: the whole benchmark verbatim (lcs 10)
    Seq(
      (4L, s"leading context $evalPhrase trailing context"),
    ).toDF("doc_id", "text").write.mode("append").parquet(incoming)
    val q1 = ExactDecontamStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming),
      corpusDir, root)
    assert(q1.awaitTermination(300000))

    val contam = s.read.parquet(s"$root/contam")
    assert(contam.select($"doc_id").as[Long].collect().toSet === Set(2L, 4L))
    assert(contam.filter($"doc_id" === 2L).select($"lcs_tokens")
      .as[Long].head() === 8L)
    assert(contam.filter($"doc_id" === 4L).select($"lcs_tokens")
      .as[Long].head() === 10L)
    val clean = s.read.parquet(s"$root/clean")
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(clean === Seq(1L, 3L), s"clean set wrong: $clean")

    // the graded verdict is a pure function of (batch, staged keys):
    // replaying batch 0 reproduces it exactly, including the sub-gate
    // lcs of the 7-token quote
    val ev = ExactDecontamStream.evalSuffixKeys(s, corpusDir)
    val b0 = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta suffix"),
      (2L, "x alpha beta gamma delta epsilon zeta eta theta y"),
      (3L, "totally unrelated text about parquet partition layouts"),
    ).toDF("doc_id", "text")
    val graded = ExactDecontamStream.gradeBatch(s, b0, ev)
      .select($"doc_id", $"lcs_tokens", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (k, v, c) => k -> ((v, c)) }.toMap
    assert(graded(1L) === ((7L, false)))
    assert(graded(2L) === ((8L, true)))
    assert(graded(3L)._2 === false)
  }

  test("parity with batch q134 on the driver fixture") {
    val s = spark
    import s.implicits._
    ExactDecontamStream.evictSession(s)
    val ev = ExactDecontamStream.evalSuffixKeys(s, sf)
    val nonEval = graft.Tables(s, sf, "documents")
      .filter($"doc_id" % 97 =!= 0).select($"doc_id", $"text")
    val streamed = ExactDecontamStream.gradeBatch(s, nonEval, ev)
      .select($"doc_id", $"lcs_tokens", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, l, c) => d -> ((l, c)) }.toMap
    val batch = graft.ops.SuffixIndex.q134EvalLcs(s, sf)
      .select($"doc_id", $"eval_lcs_tokens", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, l, c) => d -> ((l, c)) }.toMap
    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (d, (lcs, flag)) =>
      val (sl, sc) = streamed(d)
      // S17 caps reported LCS at KeyCap; the flag is exact either way
      assert(sl === math.min(lcs, ExactDecontamStream.KeyCap.toLong),
        s"doc $d: streamed lcs $sl vs batch $lcs")
      assert(sc === flag, s"doc $d: flag $sc vs $flag")
    }
  }
}
