package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Similarity

/** S20 streaming ANN query serving: per-batch probe over the staged IVF
  * index, congruent with the registered batch probe, idempotent on replay.
  */
class ServeStreamSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSet

  test("served batch equals the registered batch IVF probe; replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-serve-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()
    // batch 0: the q59 query set (vec_id < 10), arriving online
    graft.Tables(s, sf, "embeddings").filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      .write.mode("append").parquet(incoming)
    val q0 = ServeStream.run(
      s.readStream.schema("q_id long, q_emb array<float>").parquet(incoming),
      sf, root)
    assert(q0.awaitTermination(120000))
    val got = rows(s.read.parquet(s"$root/results/batch=0")
      .select($"q_id", $"rank", $"vec_id", $"cell", $"cos"))
    assert(got.nonEmpty)
    // congruence: the online path IS the batch probe core — with the
    // serving frame's excludeSelf = false (ADVICE r10: serving q_ids are
    // an external namespace; a coincidental q_id == vec_id collision
    // must not drop that corpus vector from the candidates)
    val (cells0, mats0) = Similarity.cachedCentroidMeta(s, sf)
    val want = rows(Similarity.ivfProbeRank(
      graft.Tables(s, sf, "embeddings").filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb")),
      Similarity.stagedAssigned(s, sf), cells0, mats0, 3, 2,
      excludeSelf = false))
    assert(got === want)
    // these queries ARE corpus members, so each must see its colliding
    // corpus vector (cos ~ 1) in its served candidates — the exact row
    // the old self-exclusion silently dropped
    (0L until 10L).foreach { qid =>
      val self = got.find(r => r._1 == qid && r._3 == qid)
      assert(self.nonEmpty, s"query $qid lost its colliding corpus vector")
      assert(self.get._5 > 0.999999, s"query $qid self-cos ${self.get._5}")
    }
    // and the corpus-member batch path (q59's frame) still self-excludes
    assert(!rows(Similarity.ivfTopK(s, sf, 3, 2))
      .exists(r => r._1 == r._3))
    // replay: re-serving the identical batch against the same staged
    // index overwrites identical rows (pure function of batch × index)
    val (cells, mats) = Similarity.cachedCentroidMeta(s, sf)
    ServeStream.serveBatch(
      s.read.parquet(incoming).select($"q_id", $"q_emb"), 0L,
      Similarity.stagedAssigned(s, sf), cells, mats, root, 3, 2)
    val replayed = rows(s.read.parquet(s"$root/results/batch=0")
      .select($"q_id", $"rank", $"vec_id", $"cell", $"cos"))
    assert(replayed === got)
    // a second batch of NEW queries serves without touching batch 0
    graft.Tables(s, sf, "embeddings")
      .filter($"vec_id" >= 10 && $"vec_id" < 15)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      .write.mode("append").parquet(incoming)
    val q1 = ServeStream.run(
      s.readStream.schema("q_id long, q_emb array<float>").parquet(incoming),
      sf, root)
    assert(q1.awaitTermination(120000))
    val all = s.read.parquet(s"$root/results")
    assert(all.select($"q_id").distinct().count() === 15)
    assert(rows(s.read.parquet(s"$root/results/batch=0")
      .select($"q_id", $"rank", $"vec_id", $"cell", $"cos")) === got)
    // every query got at most k results, ranked contiguously from 1
    val byQ = all.select($"q_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byQ.foreach { case (qid, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks === (1L to ranks.length.toLong).toSeq, s"ranks of $qid")
      assert(ranks.length <= 3)
    }
  }
}
