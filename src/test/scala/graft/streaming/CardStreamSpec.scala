package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Curation

/** S14 streaming card maintenance: batch partials merge by sum to the
  * full-corpus card, the per-batch partial IS the batch-mode card (shared
  * code path), and replay lands identical partials.
  */
class CardStreamSpec extends SparkSpec {

  private def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("partials sum to the corpus card; shared code path; replay pure") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cds-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    // batch 0: srcA gets a short (10-tok) and a long (40-tok) doc
    val b0 = Seq(("srcA", doc(10)), ("srcA", doc(40)))
    b0.toDF("source", "text").write.mode("append").parquet(incoming)
    val q0 = CardStream.run(
      s.readStream.schema("source string, text string").parquet(incoming), root)
    assert(q0.awaitTermination(120000))

    // batch 1, restarted stream: srcA grows, srcB appears
    val b1 = Seq(("srcA", doc(50)), ("srcB", doc(5)))
    b1.toDF("source", "text").write.mode("append").parquet(incoming)
    val q1 = CardStream.run(
      s.readStream.schema("source string, text string").parquet(incoming), root)
    assert(q1.awaitTermination(120000))

    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val standing = keyed(CardStream.standingCard(s, root).collect())
    // hand-checked: srcA 3 docs / 100 toks / 1 short (the 10-tok doc);
    // srcB 1 doc / 5 toks / 1 short
    val chars = (b0 ++ b1).groupBy(_._1).view
      .mapValues(_.map(_._2.length.toLong).sum).toMap
    assert(standing === Map(
      "srcA" -> ((3L, 100L, chars("srcA"), 1L)),
      "srcB" -> ((1L, 5L, chars("srcB"), 1L))))
    // the standing streamed card == the batch-mode card over all docs
    val batchMode = keyed(Curation.additiveCard(
      (b0 ++ b1).toDF("source", "text")).collect())
    assert(standing === batchMode)

    // replay purity: re-running batch 0's body lands the identical partial
    CardStream.writeBatch(b0.toDF("source", "text"), root, 0L)
    assert(keyed(CardStream.standingCard(s, root).collect()) === standing)
  }

  test("additive-card merge property: any random partitioning sums to the whole") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val docs = (1 to 120).map { i =>
      (s"src${rnd.nextInt(5)}", (1 to (1 + rnd.nextInt(50))).map(j => s"w$j").mkString(" "))
    }
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val whole = keyed(Curation.additiveCard(docs.toDF("source", "text")).collect())
    // split into 7 arbitrary slices, compute partials independently, merge
    // by plain addition — the property every maintenance mode relies on
    val parts = docs.grouped(18).toSeq
    val merged = parts.map(p => keyed(Curation.additiveCard(p.toDF("source", "text")).collect()))
      .foldLeft(Map.empty[String, (Long, Long, Long, Long)]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map { k =>
          val a = acc.getOrElse(k, (0L, 0L, 0L, 0L))
          val b = m.getOrElse(k, (0L, 0L, 0L, 0L))
          k -> ((a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
        }.toMap
      }
    assert(merged === whole)
  }
}
