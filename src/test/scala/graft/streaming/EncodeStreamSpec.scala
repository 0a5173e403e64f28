package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.TextAnalysis

/** S21 streaming tokenizer encode: staged-merge online encoding congruent
  * with q153, replay-idempotent, OOV-safe by construction.
  */
class EncodeStreamSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("one-batch replay equals q153; replay idempotent; OOV words encode") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-enc-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()
    graft.Tables(s, sf, "documents").select($"doc_id", $"text")
      .write.mode("append").parquet(incoming)
    val q0 = EncodeStream.run(
      s.readStream.schema("doc_id long, text string").parquet(incoming),
      sf, root)
    assert(q0.awaitTermination(120000))
    val got = rows(s.read.parquet(s"$root/stats/batch=0"))
    assert(got === rows(TextAnalysis.q153BpeEncode(s, sf)))
    // replay: identical batch × staged merges overwrites identical rows
    EncodeStream.encodeBatch(
      s.read.parquet(incoming).select($"doc_id", $"text"), 0L,
      TextAnalysis.cachedMerges(s, sf), root)
    assert(rows(s.read.parquet(s"$root/stats/batch=0")) === got)
    // OOV: a word the trainer never saw encodes through the same fold —
    // verified against an independent local greedy apply
    val merges = TextAnalysis.cachedMerges(s, sf)
      .map { case (_, l, r, _) => (l, r) }
    def encLen(word: String): Long = {
      var syms: Vector[String] = word.map(_.toString).toVector
      for ((l, r) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (x <- syms) {
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        }
        syms = out.toVector
      }
      syms.length.toLong
    }
    val oov = "zzqqxx"
    val enc = TextAnalysis.encodeDocs(
      Seq((9999L, s"$oov $oov")).toDF("doc_id", "text"),
      TextAnalysis.cachedMerges(s, sf)).collect()
    assert(enc.length === 1)
    assert(enc(0).getLong(1) === 2L)
    assert(enc(0).getLong(3) === 2L * encLen(oov))
  }
}
