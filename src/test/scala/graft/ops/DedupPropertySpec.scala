package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Djb2

/** Property check of the q51 candidate machinery (AllPairs prefix filter +
  * hot-shingle df-cap + array_intersect verification) against a brute-force
  * all-pairs reference computed driver-side from first principles. The
  * prefix filter claims provable completeness at threshold 0.5; this spec
  * is the executable form of that claim on random corpora.
  */
class DedupPropertySpec extends SparkSpec {

  private def brute(docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Double)] = {
    val sets = docs.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      id -> (if (toks.length < 3) Set.empty[Long]
             else toks.sliding(3).map(w => Djb2.hash(w.mkString(" "))).toSet)
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa & sb).size.toLong
      jac = common.toDouble / (sa.size + sb.size - common).toDouble
      if jac >= 0.5
    } yield (a, b) -> (common, jac)).toMap
  }

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-dedup-prop-").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("p"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    root
  }

  test("q51 with prefix filtering equals brute-force exact Jaccard (cap off)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 3) {
      val docs = (1L to 30L).map { id =>
        val n = 3 + rnd.nextInt(18)
        id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val dir = writeDocs(docs)
      val got = Dedup.q51NgramJaccard(s, dir, Long.MaxValue)
        .select($"doc_a", $"doc_b", $"common", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      val want = brute(docs)
      assert(got.keySet === want.keySet, s"trial $trial: pair sets differ")
      for ((k, v) <- want)
        assert(got(k) === v, s"trial $trial: scores differ at $k")
    }
  }

  test("df-cap only removes pairs, never changes surviving scores") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 30L).map { id =>
      val n = 3 + rnd.nextInt(15)
      id -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val dir = writeDocs(docs)
    val capped = Dedup.q51NgramJaccard(s, dir, maxDf = 5L)
      .select($"doc_a", $"doc_b", $"common", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val want = brute(docs)
    for ((k, v) <- capped) {
      assert(want.contains(k), s"cap manufactured pair $k")
      assert(want(k) === v, s"cap distorted score at $k")
    }
  }
}
