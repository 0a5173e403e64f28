package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Planner

/** S33 — streaming COMPACTION maintenance: q206's bin-packing plan
  * EXECUTED as the standing maintenance loop — Iceberg's
  * rewriteDataFiles/OPTIMIZE verb run against the S32 manifest, so the
  * read amplification q206 priced is continuously bought back as small
  * files accumulate. This closes the maintenance side of the statistics
  * loop the way q205 closed the planning side: S32 maintains the zone
  * metadata, q206 plans from it, S33 acts on it.
  *
  * Per micro-batch: ingest through the literal S32 body
  * ([[ManifestStream.processBatch]] — per-batch z-laid cell files +
  * REAL-footer manifest partition), then the MAINTENANCE step: read the
  * standing view, and when more than [[SmallTrigger]] small files
  * (under half the bin-packing target) have accumulated, execute the
  * shared plan ([[Planner.planGroups]] — the identical generator q206
  * grades): rewrite every multi-member group into one merged file under
  * `compact/gen=<batch>/`, harvest the merged files' REAL footers, and
  * commit a GENERATION manifest `compact/manifest_gen=<batch>` holding
  * the merged rows plus the untouched singletons' original rows.
  *
  * The generation-pointer read protocol (the S27/S30 listing
  * discipline): [[view]] lists `compact/manifest_gen=*` through the
  * Hadoop FS API, takes the highest COMPLETE generation G (Spark's
  * `_SUCCESS` marker — a crash mid-commit leaves an orphan data dir no
  * reader ever sees), and unions it with the raw per-batch manifests of
  * batches ingested AFTER G (generation id = the batch id whose
  * maintenance committed it, so `batch > G` is exactly "not yet
  * absorbed"). The WRITE path never deletes — superseded files become
  * orphans, never a correctness hazard: every committed generation
  * remains readable (and time-travelable, [[viewAsOf]]) until the
  * [[vacuum]] verb expires it past an N-generation retention floor
  * (q103's lake discipline; Iceberg's expire_snapshots).
  *
  * Idempotency: a replayed batch re-runs ingest (byte-equal cell files —
  * the S32 deterministic carve) and re-runs maintenance into the SAME
  * generation id, overwriting `gen=<batch>` and its manifest with
  * equal-mass, equal-zone content (part-file names are attempt-scoped;
  * the manifest is harvested from what this attempt wrote, after the
  * write, so it can never describe absent files). Spec-pinned: view
  * reads == raw-manifest reads == scan+filter, replay leaves the view's
  * (rows, zones) multiset identical, and the view's file count stays
  * bounded while the raw manifest's grows per batch.
  *
  * At 100 TB this is the nightly-to-hourly table-maintenance loop:
  * the trigger reads |files| metadata rows, and the rewrite is SIZE
  * TIERED — only the small tier's data moves (each group one read +
  * one write, packed to the whole-view target so outputs graduate out
  * of the tier immediately), which bounds write amplification at one
  * rewrite per row for this loop rather than the O(corpus)-per-firing
  * a whole-view bin-pack would pay (see [[maintain]]). */
object CompactStream {

  /** Maintenance trigger: compact when more than this many SMALL files
    * (rows < target/2) stand in the view. One batch's worth of cells
    * stays cheap to carry; two batches' worth is worth a rewrite. */
  val SmallTrigger = 16

  /** Merged-file target count for the executed plan (q206's knob). */
  val OutFiles = 8

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Every COMPLETE compacted generation under `root`, ascending — a
    * generation is complete when Spark's `_SUCCESS` marker landed with
    * its manifest (the commit point; an orphan from a crashed attempt
    * has no marker and is invisible). */
  private[streaming] def completeGens(s: SparkSession, root: String)
      : Seq[Long] = {
    val base = new Path(s"$root/compact")
    val f = fs(s, base)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest_gen=") =>
        n.stripPrefix("manifest_gen=").toLong
      }
      .filter(g => f.exists(new Path(s"$root/compact/manifest_gen=$g/_SUCCESS")))
      .sorted
  }

  /** The highest COMPLETE compacted generation under `root`, if any. */
  private[streaming] def latestGen(s: SparkSession, root: String)
      : Option[Long] = completeGens(s, root).lastOption

  /** The raw per-batch manifest, degrading to an empty frame ONLY when
    * no raw partitions stand (a vacuumed root whose every
    * pre-generation batch was absorbed has none — an empty dir must
    * read as zero rows, not a schema-inference error). The emptiness
    * test is an explicit LISTING, never a catch-all: a corrupt footer
    * or an IO failure on a standing partition must fail the read
    * loudly, not silently shrink the view to generation-only rows. */
  private def rawManifest(s: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = new Path(s"$root/manifest")
    val f = fs(s, dir)
    val hasBatches = f.exists(dir) && f.listStatus(dir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (!hasBatches)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(ManifestStream.ManifestSchema.fields :+
          StructField("batch", LongType)))
    else ManifestStream.manifest(s, root)
  }

  /** The standing VIEW a reader consults: the latest complete
    * generation's manifest plus the raw per-batch manifests ingested
    * after it (batch id > generation id — `batch` is the raw
    * manifest's partition column). Without any generation, the view IS
    * the raw manifest. Schema: [[ManifestStream.ManifestSchema]]. */
  def view(s: SparkSession, root: String): DataFrame =
    viewBetween(s, root, latestGen(s, root), None)

  /** TIME TRAVEL (VERDICT r16 #5): the standing view AS OF generation
    * `asOfGen` — that generation's manifest plus the raw batches
    * ingested in (asOfGen, next-gen commit], i.e. the table exactly as
    * the last reader before the next compaction saw it. Near-free under
    * the generation protocol: every committed generation manifest is
    * retained until [[vacuum]] expires it, so as-of resolution is a
    * listing plus the same union the live view runs. Generations
    * expired by vacuum fail loudly here. */
  def viewAsOf(s: SparkSession, root: String, asOfGen: Long): DataFrame = {
    val gens = completeGens(s, root)
    require(gens.contains(asOfGen),
      s"generation $asOfGen is not a complete generation under $root " +
        s"(standing: ${gens.mkString(",")}) — expired by vacuum, never " +
        "committed, or crashed before its marker")
    viewBetween(s, root, Some(asOfGen), gens.find(_ > asOfGen))
  }

  /** The shared view body: generation manifest (if any) ∪ raw batches in
    * (gen, hi] — `hi` = the next generation for an as-of read, unbounded
    * for the live view. */
  private def viewBetween(s: SparkSession, root: String, gen: Option[Long],
      hi: Option[Long]): DataFrame = {
    val cols = ManifestStream.ManifestSchema.fieldNames.map(col).toSeq
    def rawIn(lo: Long): DataFrame = {
      val base = rawManifest(s, root).where(col("batch") > lo)
      hi.fold(base)(h => base.where(col("batch") <= h)).select(cols: _*)
    }
    gen match {
      case None => rawIn(Long.MinValue)
      case Some(g) =>
        s.read.parquet(s"$root/compact/manifest_gen=$g")
          .select(cols: _*).unionByName(rawIn(g))
    }
  }

  /** The maintenance step: trigger check on the view's metadata, then
    * the executed q206 plan over the SMALL tier only — rewrite
    * multi-member small-file groups, carry every large file and
    * singleton small untouched, commit the generation manifest LAST.
    *
    * Size tiering is what bounds write amplification: a first cut
    * planned over the WHOLE view, which zone-interleaved the new small
    * cells between the previously-merged large files and re-wrote
    * essentially all data every other batch (O(corpus) per firing). The
    * tier split — smalls (under half the whole-view target) pack among
    * THEMSELVES to an explicit whole-view target, larges carry — means
    * every merged output immediately graduates to the large tier and
    * each row is rewritten at most once by this loop, the standard
    * size-tiered compaction contract. (The planner's tail fold — ADVICE
    * r16, [[Planner.planGroups]] — is what makes that strict: the
    * cumulative carve's remainder group could otherwise pack < target/2
    * rows and stay in the small tier across firings; an undersized tail
    * now merges into its predecessor, except in the degenerate one-group
    * case where the single output stays small but collapses the tier to
    * one file, below any future trigger.) */
  private[streaming] def maintain(s: SparkSession, root: String,
      gen: Long): Unit = {
    import s.implicits._
    val v = view(s, root)
    val rows = v.collect() // |files| metadata rows — the planner's input
    if (rows.isEmpty) return
    val total = rows.map(_.getLong(1)).sum
    val target = math.max(total / OutFiles, 1L)
    val (smalls, larges) = rows.partition(_.getLong(1) < target / 2)
    if (smalls.length <= SmallTrigger) return
    // the SHARED plan (q206's generator) over the small tier, packed to
    // the WHOLE-view target so outputs graduate out of the tier
    val planned = Planner.planGroups(
      s.createDataFrame(s.sparkContext.parallelize(smalls.toSeq, 1),
        ManifestStream.ManifestSchema), OutFiles, Some(target))
      .select($"grp", $"path")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byGrp = planned.groupBy(_._1).toSeq.sortBy(_._1)
    val dataDir = s"$root/compact/gen=$gen"
    val merged = byGrp.filter(_._2.length > 1).map { case (g, members) =>
      s.read.parquet(members.map(_._2): _*)
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dataDir/grp=$g")
      g
    }
    // REAL footers of what was just written (manifest-after-data)
    val mergedRows =
      if (merged.isEmpty) Seq.empty
      else ManifestStream.harvest(s, dataDir)
    val singletonPaths = byGrp.filter(_._2.length == 1)
      .flatMap(_._2.map(_._2)).toSet
    val largePaths = larges.map(_.getString(0)).toSet
    val carried = rows.filter(r =>
      singletonPaths.contains(r.getString(0)) ||
        largePaths.contains(r.getString(0)))
    s.createDataFrame(
      s.sparkContext.parallelize(mergedRows ++ carried, 1),
      ManifestStream.ManifestSchema)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$root/compact/manifest_gen=$gen")
    ()
  }

  /** One micro-batch: heal any stale own-generation from a crashed
    * attempt, S32 ingest, then maintenance under this batch's
    * generation id.
    *
    * The healing step is what keeps the generation protocol sound under
    * replay: the engine replays batch b only when b never committed, but
    * a previous ATTEMPT may have committed `manifest_gen=b` referencing
    * the attempt's `data/batch=b` part files — which the replayed ingest
    * is about to overwrite. Deleting the stale generation FIRST drops
    * the view back to the previous generation ∪ raw manifests (all of
    * whose files survive — no file is ever deleted outside this one
    * self-healing case), so the view never references absent files at
    * rest. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      root: String, b: ManifestStream.ZBounds): Unit = {
    val s = batch.sparkSession
    for (d <- Seq(s"$root/compact/manifest_gen=$batchId",
        s"$root/compact/gen=$batchId")) {
      val p = new Path(d)
      fs(s, p).delete(p, true)
    }
    ManifestStream.processBatch(batch, batchId, root, b)
    maintain(s, root, batchId)
  }

  /** Streaming driver. `rows` must carry (p double, d double); `bounds`
    * is the staged S32 generation. */
  def run(rows: DataFrame, root: String, bounds: ManifestStream.ZBounds,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, bounds)
      }
      .start()

  /** Session conf: fire [[vacuum]] from [[runDrift]]'s own firing path
    * whenever this many complete generations stand BEYOND the retention
    * floor. 0 (the default) keeps vacuum a manually-invoked verb —
    * exactly Iceberg's posture, where expire_snapshots is an operator
    * action unless a table property schedules it. With a cadence set,
    * the lifecycle runs indefinitely without operator intervention:
    * every N generations the orphan debris is collected back to the
    * floor, so the standing file count is bounded
    * (LifecycleDrillSpec's cadence leg pins it across 3+ firings). */
  val VacuumEveryKey = "spark.graft.compact.vacuumEvery"

  /** Session conf: the retention floor the cadenced vacuum keeps
    * (default 2 — the live view plus one pinned historical reader). */
  val VacuumRetainKey = "spark.graft.compact.vacuumRetain"

  /** Drift-aware batch body (VERDICT r16 #2): the S32 ingest runs under
    * the bounds-generation lifecycle ([[ManifestStream.processBatchDrift]]
    * — persistent edge-cell clamping re-elects the grid), and the
    * maintenance step is untouched: it plans over FOOTER zones, which are
    * physical, so compaction works identically across a generation seam
    * (a group may merge files carved under different grids — the merged
    * footer is still exact). When a vacuum cadence is conf'd
    * ([[VacuumEveryKey]], VERDICT r17 #7), the verb fires here — after
    * maintenance, quiesced within the firing path — whenever N complete
    * generations have accumulated past the retention floor. The trigger
    * reads only the on-disk generation listing, so a replayed batch
    * re-derives the same decision, and re-vacuuming is harmless (the
    * reachable set is recomputed from the retained manifests). */
  private[streaming] def processBatchDrift(batch: DataFrame, batchId: Long,
      root: String): Unit = {
    val s = batch.sparkSession
    for (d <- Seq(s"$root/compact/manifest_gen=$batchId",
        s"$root/compact/gen=$batchId")) {
      val p = new Path(d)
      fs(s, p).delete(p, true)
    }
    ManifestStream.processBatchDrift(batch, batchId, root)
    maintain(s, root, batchId)
    val every = scala.util.Try(
      s.conf.get(VacuumEveryKey, "0").toInt).getOrElse(0)
    if (every > 0) {
      val retain = math.max(scala.util.Try(
        s.conf.get(VacuumRetainKey, "2").toInt).getOrElse(2), 1)
      if (completeGens(s, root).size >= retain + every) {
        vacuum(s, root, retain)
        ()
      }
    }
  }

  /** Drift-aware streaming driver: initial bounds staged as generation
    * -1, re-elected on persistent drift, compaction maintained per batch. */
  def runDrift(rows: DataFrame, root: String,
      initial: ManifestStream.ZBounds,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val s = rows.sparkSession
    ManifestStream.stageInitialBounds(s, root, initial)
    rows.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchDrift(batch, batchId, root)
      }
      .start()
  }

  /** The view-pruned read — the SHARED pruned-read body
    * ([[ManifestStream.prunedReadFrom]]) against the compacted view, so
    * a pruning fix can never reach one consumer and miss the other. */
  def prunedRead(s: SparkSession, root: String,
      pLo: Double, pHi: Double,
      dLo: Double = Double.NegativeInfinity,
      dHi: Double = Double.PositiveInfinity): DataFrame =
    ManifestStream.prunedReadFrom(s, view(s, root), pLo, pHi, dLo, dHi)

  /** The pruned read against a historical snapshot — the same shared
    * body over [[viewAsOf]]. */
  def prunedReadAsOf(s: SparkSession, root: String, asOfGen: Long,
      pLo: Double, pHi: Double,
      dLo: Double = Double.NegativeInfinity,
      dHi: Double = Double.PositiveInfinity): DataFrame =
    ManifestStream.prunedReadFrom(s, viewAsOf(s, root, asOfGen),
      pLo, pHi, dLo, dHi)

  // ------------------------------------------------------- vacuum (r17)

  /** What [[vacuum]] did: data files deleted, manifest partitions (raw
    * batch dirs + expired generation manifests) deleted, and the
    * generations left standing. */
  final case class VacuumStats(deletedDataFiles: Long,
      deletedManifestDirs: Long, retained: Seq[Long])

  /** VACUUM (VERDICT r16 #3): delete files no retained reader can reach.
    * The compaction protocol never deletes at write time — superseded
    * files become orphans — so without this verb orphan growth is
    * unbounded (the one cost the no-delete protocol ships). With an
    * N-generation retention floor (default 2: the live view plus one
    * pinned historical reader), the reachable set is:
    *
    *  - every path referenced by a RETAINED generation's manifest
    *    (merged files, plus carried singletons/larges — which may live
    *    in older generations' data dirs or raw batch dirs: reachability
    *    is PATH-based, never directory-based), and
    *  - every raw batch dir with batch > min(retained) — the oldest
    *    retained as-of view unions raw batches above its generation, and
    *    every newer view unions a subset of those.
    *
    * Deleted: unreachable data files under `data/batch=*` and
    * `compact/gen=*`, raw manifest partitions with batch ≤ min(retained)
    * (they describe only absorbed-or-deleted files — after vacuum the
    * RAW manifest is no longer a whole-table view; readers use
    * [[view]]/[[viewAsOf]], which is already the compacted root's read
    * contract), and expired generations' manifest dirs — after which
    * [[viewAsOf]] fails loudly for them, the Iceberg expire_snapshots
    * contract. Incomplete generation manifests (no `_SUCCESS`) are left
    * alone: they are invisible to readers and the owning batch's replay
    * self-heals them. On drift-aware roots ([[runDrift]]) the verb also
    * collects the lifecycle's own debris: frac telemetry behind the
    * [[ManifestStream.DriftWindow]] look-back and bounds generations
    * superseded by the latest complete one — per-batch partitions that
    * would otherwise grow without bound under the very verb that exists
    * to bound growth.
    *
    * Run it quiesced (between firings), like the maintenance verb it
    * complements: a reader pinned at a retained generation resolves all
    * its files after vacuum (spec-pinned); a reader pinned BEYOND the
    * retention floor is the one contract violation, exactly as in
    * Iceberg/Delta VACUUM. Driver-side and metadata-sized throughout:
    * the reachable set is |files| path strings. */
  def vacuum(s: SparkSession, root: String, retainGens: Int = 2)
      : VacuumStats = {
    val gens = completeGens(s, root)
    if (gens.isEmpty) return VacuumStats(0L, 0L, Seq.empty)
    val retained = gens.takeRight(math.max(retainGens, 1))
    val minR = retained.min
    val referenced: Set[String] = retained.flatMap { g =>
      s.read.parquet(s"$root/compact/manifest_gen=$g")
        .select("path").collect().map(_.getString(0))
    }.toSet
    var dataDeleted = 0L
    var manifestDeleted = 0L
    def eachSubdir(dir: String)(f: (String, Path) => Unit): Unit = {
      val p = new Path(dir)
      val sys = fs(s, p)
      if (sys.exists(p))
        sys.listStatus(p).foreach(st => f(st.getPath.getName, st.getPath))
    }
    def deleteUnreferencedUnder(dir: Path): Unit = {
      val sys = fs(s, dir)
      def walk(p: Path): Unit =
        sys.listStatus(p).foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet") &&
            !referenced.contains(st.getPath.toString)) {
            sys.delete(st.getPath, false)
            dataDeleted += 1
          }
        }
      walk(dir)
      // a dir whose every data file was carved away is pure debris
      def parquetCount(p: Path): Long =
        sys.listStatus(p).map { st =>
          if (st.isDirectory) parquetCount(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) 1L else 0L
        }.sum
      if (parquetCount(dir) == 0L) { sys.delete(dir, true); () }
    }
    // raw batches at or below the oldest retained generation: only
    // paths carried forward by a retained manifest survive
    eachSubdir(s"$root/data") { (name, p) =>
      if (name.startsWith("batch=") &&
        name.stripPrefix("batch=").toLong <= minR)
        deleteUnreferencedUnder(p)
    }
    // superseded merged files (any generation dir — carried larges keep
    // old gen dirs partially alive, so this is per-file)
    eachSubdir(s"$root/compact") { (name, p) =>
      if (name.startsWith("gen=")) deleteUnreferencedUnder(p)
    }
    // raw manifest partitions describing only absorbed batches
    eachSubdir(s"$root/manifest") { (name, p) =>
      if (name.startsWith("batch=") &&
        name.stripPrefix("batch=").toLong <= minR) {
        fs(s, p).delete(p, true)
        manifestDeleted += 1
      }
    }
    // expired generations' manifests (complete ones only)
    gens.filterNot(retained.contains).foreach { g =>
      val p = new Path(s"$root/compact/manifest_gen=$g")
      fs(s, p).delete(p, true)
      manifestDeleted += 1
    }
    // drift-lifecycle debris on runDrift roots: frac telemetry behind
    // the decision window (the election looks back DriftWindow−1
    // batches, never further) and bounds generations superseded by the
    // latest COMPLETE one (the grid reads only the latest; committed
    // files' zones are physical, not grid-derived, so old bounds serve
    // no reader). Without this the per-batch telemetry would be the one
    // partition set the vacuum verb lets grow without bound.
    val bDir = ManifestStream.boundsDir(root)
    val fracIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    eachSubdir(s"$bDir/frac") { (name, _) =>
      if (name.startsWith("batch=")) fracIds += name.stripPrefix("batch=").toLong
    }
    if (fracIds.nonEmpty) {
      val keepFrom = fracIds.max - (ManifestStream.DriftWindow - 1)
      eachSubdir(s"$bDir/frac") { (name, p) =>
        if (name.startsWith("batch=") &&
          name.stripPrefix("batch=").toLong < keepFrom) {
          fs(s, p).delete(p, true)
          manifestDeleted += 1
        }
      }
    }
    val boundGens = scala.collection.mutable.ArrayBuffer.empty[Long]
    eachSubdir(bDir) { (name, p) =>
      if (name.startsWith("gen=") &&
        fs(s, p).exists(new Path(p, "_SUCCESS")))
        boundGens += name.stripPrefix("gen=").toLong
    }
    if (boundGens.nonEmpty) {
      val latest = boundGens.max
      eachSubdir(bDir) { (name, p) =>
        if (name.startsWith("gen=") &&
          name.stripPrefix("gen=").toLong < latest) {
          fs(s, p).delete(p, true)
          manifestDeleted += 1
        }
      }
    }
    VacuumStats(dataDeleted, manifestDeleted, retained)
  }
}
