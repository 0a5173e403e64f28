package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S31 streaming MCV maintenance: per-value counts are additive, so the
  * merged streamed table is EQUAL to the one-pass count table for any
  * batching; the MCV list and the q203 estimate are read-time
  * derivations (the estimate matches q203's verbatim); replay is
  * idempotent and new arrivals extend the table additively.
  */
class McvStreamSpec extends SparkSpec {

  private def countsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("merged stream count table == one-pass for any batching; q203 " +
      "estimate replays; replay idempotent; arrivals extend additively") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-mcv-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    // n_chars: the q203 attribute — bounded domain, heavy duplication;
    // chunked by doc residue so batches carry overlapping AND fresh
    // values (the merged sums must collapse duplicates across batches)
    val vals = graft.Tables(s, sf, "documents").select($"n_chars".as("v"))
    for (chunk <- 0 to 2) {
      graft.Tables(s, sf, "documents")
        .where(pmod($"doc_id", lit(3)) === chunk)
        .select($"n_chars".as("v"))
        .coalesce(1).write.mode("append").parquet(incoming)
    }

    val q0 = McvStream.run(
      s.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1).parquet(incoming), root)
    assert(q0.awaitTermination(120000))
    assert(new java.io.File(s"$root/mcv").listFiles()
      .count(_.getName.startsWith("batch=")) >= 2,
      "fixture must exercise more than one micro-batch")

    // additivity: EXACT equality with the one-pass count table
    val merged = countsOf(McvStream.mergedCounts(s, root))
    val onePass = countsOf(
      vals.groupBy($"v").agg(count(lit(1)).as("n")))
    assert(merged === onePass,
      "sum of per-batch counts must equal the one-pass counts")
    assert(merged.values.sum === vals.count(), "mass conservation")

    // the MCV list is the q203 ranking: frequency desc, value asc
    val top = McvStream.mcvList(s, root, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.length === math.min(8, merged.size))
    val expectTop = merged.toSeq.sortBy { case (v, n) => (-n, v) }.take(8)
    assert(top.sortBy(_._3).map(t => (t._1, t._2)).toSeq === expectTop)

    // the estimate read off the streamed table IS q203's, all four k
    val q203 = graft.ops.Layout.q203McvEstimation(s, sf).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Seq(0, 8, 32, 128).foreach { k =>
      assert(McvStream.estimate(s, root, k) === q203(k),
        s"stream estimate at k=$k must equal q203's")
    }

    // idempotent replay: fresh checkpoint, same files, same batch ids →
    // identical partials, identical merge
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$root/ckpt"))
    val q1 = McvStream.run(
      s.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 1).parquet(incoming), root)
    assert(q1.awaitTermination(120000))
    assert(countsOf(McvStream.mergedCounts(s, root)) === merged,
      "replay must rewrite identical partials")

    // extension: append rows for one existing and one fresh value — the
    // merged table must absorb them ADDITIVELY
    val heavyV = expectTop.head._1
    Seq(heavyV, heavyV, -12345L).toDF("v")
      .coalesce(1).write.mode("append").parquet(incoming)
    val q2 = McvStream.run(
      s.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", 8).parquet(incoming), root)
    assert(q2.awaitTermination(120000))
    val after = countsOf(McvStream.mergedCounts(s, root))
    assert(after(heavyV) === merged(heavyV) + 2, "existing value adds")
    assert(after(-12345L) === 1L, "fresh value enters")
    assert(after.values.sum === merged.values.sum + 3)
  }

  test("bounded heavy-hitter mode: the per-batch partial is ≤ M+1 rows " +
      "by construction; within the slot budget it EQUALS the exact " +
      "table (tail mass 0); past it the top-k and head+tail masses " +
      "match the exact table on a genuinely skewed fixture; replay is " +
      "idempotent") {
    val s = spark
    import s.implicits._
    val m = 32

    // a genuinely skewed synthetic corpus: 8 heavy hitters (geometric
    // masses 512, 256, …, 4) over a 400-value uniform tail of singles —
    // per-batch ndv ≈ 208 ≫ m, so the bound genuinely bites
    val heavy = (0 until 8).flatMap(i => Seq.fill(512 >> i)(i.toLong))
    val tail = (1000L until 1400L)
    val all = heavy ++ tail
    // two deterministic batches: even/odd positions — every heavy value
    // lands in both batches with mass far above each batch's rank-m cut
    val batches = Seq(
      all.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v },
      all.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v })

    val root = Files.createTempDirectory("graft-mcvb-").toString
    batches.zipWithIndex.foreach { case (vs, i) =>
      McvStream.processBatchBounded(vs.toDF("v"), i.toLong, root, m)
    }

    // partial size: ≤ m+1 rows per batch partition, by construction
    batches.indices.foreach { i =>
      val rows = s.read.parquet(s"$root/mcv/batch=$i").count()
      assert(rows <= m + 1, s"batch $i partial must be ≤ ${m + 1} rows")
    }

    val exact = all.groupBy(identity).map { case (v, xs) =>
      v -> xs.size.toLong }
    // top-k (k well under m): bounded head == exact, values AND counts —
    // a heavy hitter makes every batch's top-m by definition
    val k = 8
    val headTop = McvStream.mergedBoundedHead(s, root)
      .orderBy($"n".desc, $"v").limit(k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val exactTop = exact.toSeq.sortBy { case (v, n) => (-n, v) }.take(k)
    assert(headTop === exactTop,
      "bounded top-k must equal the exact table's top-k")
    // mass conservation: head + tail == total rows, exactly, any batching
    val (hn, tn) = McvStream.boundedMasses(s, root)
    assert(hn + tn === all.size.toLong, "head+tail mass is exact")
    assert(tn > 0, "the fixture must actually overflow the slots")

    // replay idempotence: rewriting a batch partial yields identical rows
    val before = s.read.parquet(s"$root/mcv").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    McvStream.processBatchBounded(batches.head.toDF("v"), 0L, root, m)
    val after2 = s.read.parquet(s"$root/mcv").collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(after2 === before, "replaying a batch must rewrite the " +
      "identical bounded partial")

    // slot-budget regime: ndv ≤ m ⇒ the bounded artifact IS the exact
    // table — merged == one-pass verbatim, zero tail
    val root2 = Files.createTempDirectory("graft-mcvb2-").toString
    val smallBatches = Seq(Seq(1L, 1L, 2L, 3L), Seq(2L, 2L, 4L))
    smallBatches.zipWithIndex.foreach { case (vs, i) =>
      McvStream.processBatchBounded(vs.toDF("v"), i.toLong, root2, m)
    }
    val mergedSmall = countsOf(McvStream.mergedBoundedHead(s, root2))
    assert(mergedSmall === Map(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L),
      "within the slot budget the bounded head is the exact table")
    assert(McvStream.boundedMasses(s, root2)._2 === 0L,
      "no tail mass within the slot budget")
  }
}
