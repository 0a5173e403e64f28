package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S32 streaming file-stats manifest: the manifest describes exactly the
  * files on disk with their REAL footer stats; manifest-pruned reads
  * return exactly what a full scan + filter returns while opening only
  * the overlapping files; replay is idempotent; new batches extend the
  * manifest.
  */
class ManifestStreamSpec extends SparkSpec {

  test("manifest rows match real footers; pruned read == full filter " +
      "while opening only overlapping files; replay idempotent; extends") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-manifest-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    val prices = graft.Tables(s, sf, "lineitem")
      .select($"l_extendedprice".as("p"))
    for (chunk <- 0 to 2) {
      prices.filter(pmod(($"p" * 100).cast("long"), lit(3)) === chunk)
        .coalesce(1).write.mode("append").parquet(incoming)
    }

    val q0 = ManifestStream.run(
      s.readStream.schema("p double")
        .option("maxFilesPerTrigger", 1).parquet(incoming), s"$root/out")
    assert(q0.awaitTermination(120000))
    assert(new java.io.File(s"$root/out/manifest").listFiles()
      .count(_.getName.startsWith("batch=")) >= 2,
      "fixture must exercise more than one micro-batch")

    // the manifest describes exactly the data files on disk, and its
    // stats equal a recomputation from the files' contents
    val man = ManifestStream.manifest(s, s"$root/out").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val dataFiles = new java.io.File(s"$root/out/data").listFiles()
      .filter(_.getName.startsWith("batch="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => "file:" + f.getAbsolutePath).toSet
    assert(man.keySet === dataFiles, "one manifest row per data file")
    man.foreach { case (path, (rows, mn, mx)) =>
      val actual = s.read.parquet(path)
        .agg(count(lit(1)), min($"p"), max($"p")).head()
      assert(actual.getLong(0) === rows, s"$path rows")
      assert(actual.getDouble(1) === mn, s"$path min")
      assert(actual.getDouble(2) === mx, s"$path max")
    }
    val total = prices.count()
    assert(man.values.map(_._1).sum === total, "mass conservation")

    // planning prunes: a middle price fifth must open a strict subset of
    // files, and the pruned read must return EXACTLY full-scan ∘ filter
    val (pmn, pmx) = prices.agg(min($"p"), max($"p"))
      .as[(Double, Double)].head()
    val (lo, hi) = (pmn + (pmx - pmn) * 2 / 5.0, pmn + (pmx - pmn) * 3 / 5.0)
    val opened = ManifestStream.prunedFiles(s, s"$root/out", lo, hi)
    assert(opened.nonEmpty && opened.size < man.size,
      s"a middle fifth must prune some of ${man.size} files, opened ${opened.size}")
    // no false negatives: every file that truly contains a matching row
    // is opened (read ⊇ match — the q202 invariant, live)
    val mustOpen = man.collect {
      case (path, (_, mn, mx)) if mx >= lo && mn < hi => path
    }.toSet
    assert(opened.toSet === mustOpen)
    val got = ManifestStream.prunedRead(s, s"$root/out", lo, hi)
      .as[Double].collect().sorted.toSeq
    val expect = prices.where($"p" >= lo && $"p" < hi)
      .as[Double].collect().sorted.toSeq
    assert(got === expect, "pruned read must equal full scan + filter")
    // pruning everything returns an empty frame, not an error
    assert(ManifestStream.prunedRead(s, s"$root/out", pmx + 1, pmx + 2)
      .count() === 0L)

    // idempotent replay: fresh checkpoint, same batches → the manifest
    // again describes exactly the files on disk and every read returns
    // identical results. File BOUNDARIES are attempt-scoped (the range
    // exchange samples per execution), so the pinned invariants are the
    // ones a reader can observe: total mass, global span, and
    // pruned-read results — not byte-identical zones.
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(s"$root/out/ckpt"))
    val q1 = ManifestStream.run(
      s.readStream.schema("p double")
        .option("maxFilesPerTrigger", 1).parquet(incoming), s"$root/out")
    assert(q1.awaitTermination(120000))
    val man2 = ManifestStream.manifest(s, s"$root/out").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val dataFiles2 = new java.io.File(s"$root/out/data").listFiles()
      .filter(_.getName.startsWith("batch="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => "file:" + f.getAbsolutePath).toSet
    assert(man2.keySet === dataFiles2,
      "replayed manifest must describe exactly the current files")
    assert(man2.values.map(_._1).sum === total)
    assert(man2.values.map(_._2).min === man.values.map(_._2).min)
    assert(man2.values.map(_._3).max === man.values.map(_._3).max)
    val got2 = ManifestStream.prunedRead(s, s"$root/out", lo, hi)
      .as[Double].collect().sorted.toSeq
    assert(got2 === expect)

    // extension: a new batch lands → its files join the manifest and a
    // read over the new values finds them
    Seq(pmx + 100.0, pmx + 101.0).toDF("p")
      .coalesce(1).write.mode("append").parquet(incoming)
    val q2 = ManifestStream.run(
      s.readStream.schema("p double")
        .option("maxFilesPerTrigger", 8).parquet(incoming), s"$root/out")
    assert(q2.awaitTermination(120000))
    val late = ManifestStream.prunedRead(s, s"$root/out", pmx + 99.0, pmx + 200.0)
      .as[Double].collect().sorted.toSeq
    assert(late === Seq(pmx + 100.0, pmx + 101.0))
  }
}
