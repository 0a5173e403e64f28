package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S29 streaming ndv-sketch maintenance: min-K of per-batch partials is
  * EQUAL (not merely congruent) to the one-pass batch sketch for any
  * batching, the estimate read off the merged sketch is q200's verbatim,
  * and replay is idempotent.
  */
class NdvStreamSpec extends SparkSpec {

  test("merged stream KMV sketch == one-pass sketch row for row, for " +
      "any batching; estimate matches q200's; replay extends") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-ndv-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    // l_orderkey: ndv > K at every SF, so the estimator path is live;
    // chunked by key residue so every micro-batch carries overlapping
    // AND fresh values (dup hashes across batches must collapse)
    val keys = graft.Tables(s, sf, "lineitem").select($"l_orderkey".as("v"))
    for (chunk <- 0 to 2) {
      keys.filter(pmod($"v", lit(3)) === chunk)
        .coalesce(1).write.mode("append").parquet(incoming)
    }

    val q0 = NdvStream.run(
      s.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1).parquet(incoming), root)
    assert(q0.awaitTermination(120000))
    assert(new java.io.File(s"$root/ndv").listFiles()
      .count(_.getName.startsWith("batch=")) >= 2,
      "fixture must exercise more than one micro-batch")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq
    val merged = rows(NdvStream.mergedSketch(s, root))
    val onePass = rows(NdvStream.batchSketch(s.read.parquet(incoming)))
    // associativity of min-K: EXACT equality, ordered, row for row
    assert(merged === onePass,
      "min-K of per-batch min-Ks must equal the one-pass min-K")
    assert(merged.size <= 1024 && merged === merged.sorted)

    // the estimate the planner reads is q200's estimate verbatim
    val est = NdvStream.estimate(NdvStream.mergedSketch(s, root))
    val exact = keys.distinct().count()
    val q200 = graft.ops.Layout.q200NdvSketch(s, sf).collect()
      .find(_.getString(0) == "lineitem.l_orderkey").get
    assert(q200.getLong(1) === exact)
    assert(est === q200.getLong(4), "stream estimate must equal q200's")
    assert(math.abs(1000 * (est - exact) / exact) <= 100,
      s"estimate $est vs exact $exact outside 10%")

    // idempotent replay: re-running over the same files (fresh
    // checkpoint, same batch ids) rewrites identical partials
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$root/ckpt"))
    val q1 = NdvStream.run(
      s.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1).parquet(incoming), root)
    assert(q1.awaitTermination(120000))
    assert(rows(NdvStream.mergedSketch(s, root)) === merged,
      "replay must rewrite identical partials")

    // extension: new values arrive — the merged sketch absorbs any new
    // minima; a value hashing above the standing k-th minimum changes
    // nothing, one hashing below must enter
    val before = merged
    Seq(-1L, -2L).toDF("v").write.mode("append").parquet(incoming)
    val q2 = NdvStream.run(
      s.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 8).parquet(incoming), root)
    assert(q2.awaitTermination(120000))
    val after = rows(NdvStream.mergedSketch(s, root))
    val newOnePass = rows(NdvStream.batchSketch(s.read.parquet(incoming)))
    assert(after === newOnePass, "extended merge still equals one-pass")
    assert(after.size === before.size ||
      (before.size < 1024 && after.size <= 1024))
  }
}
