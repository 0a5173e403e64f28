package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S33 streaming compaction maintenance: the executed q206 loop — as
  * small z-cell files accumulate past the trigger, the maintenance step
  * rewrites zone-sorted groups into merged files and commits a
  * generation manifest; readers consult the VIEW (latest complete
  * generation ∪ newer raw batches) and get identical results to a full
  * scan + filter while opening a BOUNDED number of files; replay leaves
  * the view's (rows, zones) multiset identical; no view row ever
  * references an absent file.
  */
class CompactStreamSpec extends SparkSpec {

  test("compaction fires past the small-file trigger; view reads == " +
      "scan+filter with bounded file count and lower read " +
      "amplification; zones are REAL footers; replay idempotent; no " +
      "absent files at rest") {
    val s = spark
    import s.implicits._
    val root0 = Files.createTempDirectory("graft-compact-").toString
    val incoming = s"$root0/in"
    new java.io.File(incoming).mkdirs()
    val root = s"$root0/out"

    val rows = graft.Tables(s, sf, "lineitem")
      .select($"l_extendedprice".as("p"),
        expr("cast(datediff(l_shipdate, date'1970-01-01') as double)")
          .as("d"))
    for (chunk <- 0 to 4) {
      rows.filter(pmod(($"p" * 100).cast("long"), lit(5)) === chunk)
        .coalesce(1).write.mode("append").parquet(incoming)
    }
    val bounds = ManifestStream.stageBounds(rows)
    def stream() = s.readStream.schema("p double, d double")
      .option("maxFilesPerTrigger", 1).parquet(incoming)

    val q0 = CompactStream.run(stream(), root, bounds)
    assert(q0.awaitTermination(180000))

    // maintenance fired at least once, and the view is the compacted
    // one: fewer files than the ever-growing raw manifest, same mass
    assert(CompactStream.latestGen(s, root).nonEmpty,
      "the small-file trigger must have fired across 5 batches")
    val raw = ManifestStream.manifest(s, root)
    val v = CompactStream.view(s, root)
    val (rawFiles, viewFiles) = (raw.count(), v.count())
    assert(viewFiles < rawFiles,
      s"view must be compacted: $viewFiles vs raw $rawFiles")
    val total = rows.count()
    assert(v.agg(sum($"rows")).as[Long].head() === total,
      "view mass conservation")

    // every view row references a LIVE file whose REAL footer stats
    // equal the manifest row — the at-rest invariant
    val viewRows = v.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    viewRows.foreach { case (path, n, pMn, pMx, dMn, dMx) =>
      assert(new java.io.File(path.stripPrefix("file:")).exists,
        s"view references absent file $path")
      val a = s.read.parquet(path)
        .agg(count(lit(1)), min($"p"), max($"p"), min($"d"), max($"d"))
        .head()
      assert(a.getLong(0) === n && a.getDouble(1) === pMn &&
        a.getDouble(2) === pMx && a.getDouble(3) === dMn &&
        a.getDouble(4) === dMx, s"view zone mismatch for $path")
    }

    // the read amplification q206 priced, bought back live: a
    // conjunctive fifth×fifth read opens fewer files through the view
    // than through the raw manifest, with identical results
    def fifth(mn: Double, mx: Double, k: Int) =
      (mn + (mx - mn) * (k - 1) / 5.0, mn + (mx - mn) * k / 5.0)
    val (pLo, pHi) = fifth(bounds.pMn, bounds.pMx, 2)
    val (dLo, dHi) = fifth(bounds.dMn, bounds.dMx, 2)
    val rawOpened = ManifestStream.prunedFiles(s, root, pLo, pHi, dLo, dHi)
    val viewOpened = viewRows.count { case (_, _, pMn, pMx, dMn, dMx) =>
      pMx >= pLo && pMn < pHi && dMx >= dLo && dMn < dHi
    }
    assert(viewOpened < rawOpened.size,
      s"compaction must reduce files opened: view $viewOpened vs " +
        s"raw ${rawOpened.size}")
    val got = CompactStream.prunedRead(s, root, pLo, pHi, dLo, dHi)
      .as[(Double, Double)].collect().sorted.toSeq
    val expect = rows.where($"p" >= pLo && $"p" < pHi &&
        $"d" >= dLo && $"d" < dHi)
      .as[(Double, Double)].collect().sorted.toSeq
    assert(got === expect, "view pruned read must equal scan + filter")

    // replay — per the ENGINE's foreachBatch contract (only the LATEST
    // uncommitted batch replays; a fresh-checkpoint whole-stream rerun
    // would re-absorb history against standing generations and is NOT a
    // state the engine can produce). Drive the protocol directly on a
    // second root: ingest batches 0..3, capture the view, simulate a
    // crash between the generation commit and the engine's checkpoint
    // (drop the newest generation's commit marker), replay batch 3, and
    // continue with batch 4 — the view's (rows, zones) multiset must
    // come back identical (paths are attempt-scoped) and mass must end
    // exact.
    def zoneMultiset(df: org.apache.spark.sql.DataFrame) =
      df.select($"rows", $"mn_p", $"mx_p", $"mn_d", $"mx_d")
        .as[(Long, Double, Double, Double, Double)].collect().sorted.toSeq
    val root2 = s"$root0/out2"
    def chunk(i: Int) =
      rows.filter(pmod(($"p" * 100).cast("long"), lit(5)) === i)
    for (i <- 0 to 3)
      CompactStream.processBatch(chunk(i), i, root2, bounds)
    val g = CompactStream.latestGen(s, root2)
      .getOrElse(fail("batches 0..3 must have committed a generation"))
    // the crash-replay below is only legal for the LATEST batch (the
    // engine never replays an older one) — pin the fixture's trigger
    // pattern so a fixture change fails loudly instead of silently
    // testing an impossible state
    assert(g === 3L, s"expected the generation to commit at batch 3, got $g")
    val v1 = zoneMultiset(CompactStream.view(s, root2))
    // crash simulation: the generation's data landed but its commit
    // marker did not — the view must fall back to the previous
    // generation (the orphan is invisible), and the replay must heal
    new java.io.File(s"$root2/compact/manifest_gen=$g/_SUCCESS").delete()
    assert(CompactStream.latestGen(s, root2).forall(_ < g),
      "an uncommitted generation must be invisible")
    CompactStream.processBatch(chunk(g.toInt), g, root2, bounds)
    assert(zoneMultiset(CompactStream.view(s, root2)) === v1,
      "replaying the crashed batch must restore the identical view " +
        "(rows, zones) multiset")
    // and the stream continues: batch 4 lands on the healed state
    CompactStream.processBatch(chunk(4), 4, root2, bounds)
    val vFinal = CompactStream.view(s, root2)
    assert(vFinal.agg(sum($"rows")).as[Long].head() === total,
      "post-replay mass conservation across the full input")
    val got2 = CompactStream.prunedRead(s, root2, pLo, pHi, dLo, dHi)
      .as[(Double, Double)].collect().sorted.toSeq
    assert(got2 === expect,
      "the healed root must serve identical pruned reads")
  }

  test("time travel + vacuum (VERDICT r16 #3/#5): as-of reads resolve " +
      "historical generations; a vacuumed root serves byte-identical " +
      "live and retained as-of reads with every referenced file on " +
      "disk; expiry past the retention floor fails as-of loudly; and a " +
      "re-vacuum deletes nothing (zero orphans past retention)") {
    val s = spark
    import s.implicits._
    val root0 = Files.createTempDirectory("graft-vacuum-").toString
    val root = s"$root0/out"

    val rows = graft.Tables(s, sf, "lineitem")
      .select($"l_extendedprice".as("p"),
        expr("cast(datediff(l_shipdate, date'1970-01-01') as double)")
          .as("d"))
    val bounds = ManifestStream.stageBounds(rows)
    val nChunks = 12
    def chunk(i: Int) =
      rows.filter(pmod(($"p" * 100).cast("long"), lit(nChunks)) === i)
    def zoneMultiset(df: org.apache.spark.sql.DataFrame) =
      df.select($"rows", $"mn_p", $"mx_p", $"mn_d", $"mx_d")
        .as[(Long, Double, Double, Double, Double)].collect().sorted.toSeq
    // drive batches until at least two generations committed, capturing
    // the view snapshot after every batch (the mid-stream history the
    // as-of read must reproduce)
    val snaps = scala.collection.mutable.Map.empty[Int, Seq[(Long, Double,
      Double, Double, Double)]]
    var driven = 0
    while (CompactStream.completeGens(s, root).size < 2 &&
        driven < nChunks) {
      CompactStream.processBatch(chunk(driven), driven, root, bounds)
      snaps(driven) = zoneMultiset(CompactStream.view(s, root))
      driven += 1
    }
    val gens = CompactStream.completeGens(s, root)
    assert(gens.size >= 2,
      s"fixture must commit two generations in $driven batches, got $gens")
    val (gPrev, gLast) = (gens(gens.size - 2), gens.last)

    // ---- time travel: viewAsOf(G) = gen G's manifest ∪ raw (G, nextG]
    // zones: the snapshot captured right after batch nextG-1 plus raw
    // batch nextG's own manifest partition (ingested before nextG's
    // maintenance absorbed it)
    val rawLast = zoneMultiset(ManifestStream.manifest(s, root)
      .where($"batch" === gLast))
    val expectAsOf =
      (snaps(gLast.toInt - 1) ++ rawLast).sorted
    assert(zoneMultiset(CompactStream.viewAsOf(s, root, gPrev))
      === expectAsOf,
      "as-of view must equal the historical snapshot + the next " +
        "generation's own raw batch")
    // as-of CONTENT: the rows of batches 0..gLast exactly, through the
    // shared pruned-read body
    def fifth(mn: Double, mx: Double, k: Int) =
      (mn + (mx - mn) * (k - 1) / 5.0, mn + (mx - mn) * k / 5.0)
    val (pLo, pHi) = fifth(bounds.pMn, bounds.pMx, 2)
    val asOfRows = (0 to gLast.toInt).map(chunk).reduce(_.unionByName(_))
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Double, Double)].collect().sorted.toSeq
    assert(sortedRows(CompactStream.prunedReadAsOf(s, root, gPrev,
        pLo, pHi))
      === sortedRows(asOfRows.where($"p" >= pLo && $"p" < pHi)),
      "pruned as-of read must equal the historical scan+filter")
    // asking for a never-committed generation fails loudly
    intercept[IllegalArgumentException] {
      CompactStream.viewAsOf(s, root, 999L)
    }

    // ---- vacuum with the default 2-generation retention floor
    val liveBefore = zoneMultiset(CompactStream.view(s, root))
    val pruneBefore = sortedRows(CompactStream.prunedRead(s, root, pLo, pHi))
    val asOfBefore = zoneMultiset(CompactStream.viewAsOf(s, root, gPrev))
    val stats = CompactStream.vacuum(s, root, retainGens = 2)
    assert(stats.retained === Seq(gPrev, gLast))
    assert(stats.deletedDataFiles > 0,
      s"the no-delete write path must have left orphans to collect: $stats")
    assert(zoneMultiset(CompactStream.view(s, root)) === liveBefore,
      "vacuum must not change the live view")
    assert(sortedRows(CompactStream.prunedRead(s, root, pLo, pHi))
      === pruneBefore, "vacuum must not change pruned reads")
    assert(zoneMultiset(CompactStream.viewAsOf(s, root, gPrev))
      === asOfBefore,
      "a reader pinned at G-1 within retention still resolves")
    // the at-rest invariant, post-vacuum: every file either view
    // references exists on disk
    (CompactStream.view(s, root).select($"path").as[String].collect() ++
      CompactStream.viewAsOf(s, root, gPrev).select($"path").as[String]
        .collect()).foreach { path =>
      assert(new java.io.File(path.stripPrefix("file:")).exists,
        s"vacuum deleted a referenced file: $path")
    }

    // ---- expiry past the floor: retain only the latest generation
    val stats2 = CompactStream.vacuum(s, root, retainGens = 1)
    assert(stats2.retained === Seq(gLast))
    intercept[IllegalArgumentException] {
      CompactStream.viewAsOf(s, root, gPrev)
    }
    assert(zoneMultiset(CompactStream.view(s, root)) === liveBefore,
      "expiring history must never touch the live view")
    assert(sortedRows(CompactStream.prunedRead(s, root, pLo, pHi))
      === pruneBefore)

    // ---- orphan count drops to zero past retention: an immediate
    // re-vacuum finds nothing to delete
    val stats3 = CompactStream.vacuum(s, root, retainGens = 1)
    assert(stats3.deletedDataFiles === 0L &&
      stats3.deletedManifestDirs === 0L,
      s"re-vacuum must be a no-op: $stats3")
  }
}
