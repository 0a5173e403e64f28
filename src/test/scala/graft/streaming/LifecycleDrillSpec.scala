package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The end-to-end lifecycle drill (VERDICT r16 #7): one root lives
  * through ingest → drift → bounds re-election → compaction (across the
  * generation seam) → vacuum → as-of read, with the read ⊇ match
  * invariant pinned at EVERY stage boundary — the integration seam none
  * of the per-stream specs crosses. "read ⊇ match" is asserted at its
  * observable: a manifest-pruned read over the standing view returns
  * exactly what a full scan + filter over everything ingested so far
  * returns (no false negatives — a pruned-away file can never hide a
  * matching row), in BOTH the original and the drifted value regime,
  * plus mass conservation and no absent files.
  */
class LifecycleDrillSpec extends SparkSpec {

  test("lifecycle drill: ingest → drift → re-election → compaction → " +
      "vacuum → as-of, read ⊇ match at every stage boundary") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-lifecycle-").toString + "/t"

    val base = graft.Tables(s, sf, "lineitem")
      .select($"l_extendedprice".as("p"),
        expr("cast(datediff(l_shipdate, date'1970-01-01') as double)")
          .as("d"))
    val b0 = ManifestStream.stageBounds(base)
    val pSpan = b0.pMx - b0.pMn
    val dSpan = b0.dMx - b0.dMn
    val drifted = base.select(($"p" + 10 * pSpan).as("p"),
      ($"d" + 10 * dSpan).as("d"))
    def chunk(df: DataFrame, i: Int) =
      df.filter(pmod(($"p" * 100).cast("long"), lit(6)) === i)

    // the drill's ledger: everything ingested so far, per batch id
    val batches = ArrayBuffer.empty[DataFrame]
    def drive(df: DataFrame): Unit = {
      CompactStream.processBatchDrift(df, batches.size.toLong, root)
      batches += df
    }
    def ingested(upTo: Int = Int.MaxValue) =
      batches.take(upTo).reduce(_.unionByName(_))

    def sortedRows(df: DataFrame) =
      df.as[(Double, Double)].collect().sorted.toSeq
    // the invariant, at a stage boundary: pruned reads == scan+filter in
    // both regimes (and on a 2-D conjunction), mass conserved, no absent
    // files
    def checkInvariant(stage: String): Unit = {
      val all = ingested()
      val probes = Seq(
        (b0.pMn + pSpan / 5, b0.pMn + 2 * pSpan / 5,
          Double.NegativeInfinity, Double.PositiveInfinity),
        (b0.pMn + 10 * pSpan, b0.pMx + 10 * pSpan,
          Double.NegativeInfinity, Double.PositiveInfinity),
        (b0.pMn + pSpan / 5, b0.pMn + 2 * pSpan / 5,
          b0.dMn + dSpan / 5, b0.dMn + 2 * dSpan / 5))
      probes.foreach { case (pLo, pHi, dLo, dHi) =>
        val got = sortedRows(CompactStream.prunedRead(s, root,
          pLo, pHi, dLo, dHi))
        val exp = sortedRows(all.where($"p" >= pLo && $"p" < pHi)
          .where(if (dLo.isNegInfinity) lit(true)
            else $"d" >= dLo && $"d" < dHi))
        assert(got === exp,
          s"[$stage] pruned read [$pLo,$pHi)×[$dLo,$dHi) != scan+filter")
      }
      val v = CompactStream.view(s, root)
      assert(v.agg(sum($"rows")).as[Long].head() === all.count(),
        s"[$stage] mass conservation")
      v.select($"path").as[String].collect().foreach { path =>
        assert(new java.io.File(path.stripPrefix("file:")).exists,
          s"[$stage] view references absent file $path")
      }
    }

    // ---- stage 1: ingest in-range until the first compaction fires
    ManifestStream.stageInitialBounds(s, root, b0)
    while (CompactStream.completeGens(s, root).isEmpty && batches.size < 6)
      drive(chunk(base, batches.size))
    assert(CompactStream.completeGens(s, root).nonEmpty,
      "in-range ingest must trigger a first compaction")
    checkInvariant("post-first-compaction")

    // ---- stage 2: drift arrives; one clamping batch must not re-elect,
    // and its edge-cell rows stay reachable
    drive(chunk(drifted, 0))
    assert(ManifestStream.latestBoundsGen(s, root).get._1 === -1L,
      "a single drifted batch must not re-elect")
    checkInvariant("post-first-drift")

    // ---- stage 3: the second consecutive clamping batch re-elects
    drive(chunk(drifted, 1))
    val (electGen, nb) = ManifestStream.latestBoundsGen(s, root).get
    assert(electGen === (batches.size - 1).toLong,
      "two consecutive clamping batches must re-elect")
    assert(nb.pMn > b0.pMx, s"new bounds must cover the drifted regime: $nb")
    checkInvariant("post-re-election")

    // ---- stage 4: compaction across the generation seam — keep
    // ingesting drifted data until a SECOND compaction generation
    // commits (its groups mix files carved under both grids)
    val gensBefore = CompactStream.completeGens(s, root)
    while (CompactStream.completeGens(s, root) == gensBefore &&
        batches.size < 12)
      drive(chunk(drifted, batches.size % 6))
    val gens = CompactStream.completeGens(s, root)
    assert(gens.size > gensBefore.size,
      s"drifted ingest must trigger a cross-seam compaction, gens=$gens")
    checkInvariant("post-cross-seam-compaction")

    // ---- stage 5: vacuum under the default retention floor
    val (gPrev, gLast) = (gens(gens.size - 2), gens.last)
    val stats = CompactStream.vacuum(s, root, retainGens = 2)
    assert(stats.deletedDataFiles > 0, s"orphans must exist to collect: $stats")
    checkInvariant("post-vacuum")
    // the drift lifecycle's own debris is collected too: frac telemetry
    // behind the decision window, and every bounds generation superseded
    // by the latest complete one
    val fracLeft = new java.io.File(s"$root/zbounds/frac").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(fracLeft.size <= ManifestStream.DriftWindow,
      s"vacuum must collect stale frac telemetry: $fracLeft")
    val gensLeft = new java.io.File(s"$root/zbounds").listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).toSeq
    assert(gensLeft.size === 1,
      s"only the latest bounds generation survives vacuum: $gensLeft")

    // ---- stage 6: the as-of read still resolves the retained history —
    // exactly the rows of batches 0..gLast, through the pruned-read body
    val (pLo, pHi) = (b0.pMn + 10 * pSpan, b0.pMx + 10 * pSpan + 1)
    assert(sortedRows(CompactStream.prunedReadAsOf(s, root, gPrev,
        pLo, pHi))
      === sortedRows(ingested(gLast.toInt + 1)
        .where($"p" >= pLo && $"p" < pHi)),
      "as-of pruned read must equal the historical scan+filter")

    // ---- stage 7 (VERDICT r17 #7): with the conf'd cadence, the
    // lifecycle runs INDEFINITELY without operator intervention — keep
    // ingesting through runDrift's own firing path and pin that the
    // standing file count stays bounded across 3+ cadenced vacuum
    // firings (without the cadence, orphan growth is monotone)
    def fileCount(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(root))
    }
    s.conf.set(CompactStream.VacuumEveryKey, "1")
    s.conf.set(CompactStream.VacuumRetainKey, "2")
    try {
      var vacuumFirings = 0
      var lastGens = CompactStream.completeGens(s, root)
      val counts = ArrayBuffer.empty[Int]
      var guard = 0
      while (vacuumFirings < 3 && guard < 24) {
        drive(chunk(drifted, batches.size % 6))
        guard += 1
        val gens = CompactStream.completeGens(s, root)
        if (gens != lastGens) {
          // a new generation committed ⇒ the cadence (every=1, floor 2)
          // fired in the same batch body; sample the standing footprint
          vacuumFirings += 1
          counts += fileCount()
          lastGens = gens
        }
      }
      assert(vacuumFirings >= 3,
        s"the drill must drive at least 3 cadenced firings ($guard batches)")
      // bounded: the footprint after each firing stays within a fixed
      // band of the first sample — no monotone growth across firings
      assert(counts.max <= counts.head + CompactStream.SmallTrigger,
        s"steady-state file count must be bounded across firings: $counts")
      // expired generations were collected by the in-path cadence, so
      // only the retention floor stands
      assert(CompactStream.completeGens(s, root).size <= 2 +
        1, // one generation may commit after the last firing
        "the cadence must hold the generation count at the floor")
      checkInvariant("post-cadenced-vacuum")
    } finally {
      s.conf.unset(CompactStream.VacuumEveryKey)
      s.conf.unset(CompactStream.VacuumRetainKey)
    }
  }
}
