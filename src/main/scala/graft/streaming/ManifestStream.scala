package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** S32 — streaming FILE-STATS MANIFEST maintenance: the artifact that
  * turns q202's zone-map arithmetic into a production read path. q202
  * priced how many files a predicate can skip; the LayoutSpec production
  * twin proved the per-file min/max really live in parquet footers; this
  * driver MAINTAINS the standing manifest a reader consults — the
  * Iceberg/Delta core loop (a table is a manifest of data files with
  * column stats; planning prunes files by stats before any data I/O),
  * re-expressed over plain parquet.
  *
  * Per micro-batch: write the batch's rows as data files under
  * `data/batch=<id>` (range-laid on the price column inside the batch,
  * so each file carries a tight zone — the q202 sorted-layout lesson
  * applied at write time), then read the REAL footers of exactly the
  * files just written and overwrite `manifest/batch=<id>` with one row
  * per file: path, row count, per-column min/max. The footer harvest is
  * driver-side by design and metadata-sized (a handful of files per
  * batch; in production these stats arrive in the writer tasks' commit
  * messages — Iceberg's DataFile — rather than a post-hoc footer read;
  * same rows, different transport).
  *
  * The read path: [[prunedRead]] filters the standing manifest by zone
  * overlap and opens ONLY the surviving files — planning I/O is
  * manifest-sized, data I/O is proportional to the predicate's true
  * selectivity × layout quality, never to table size. That is the whole
  * 100 TB point: the scan cost of a range query over a year of data is
  * decided by this artifact, not by the table's row count.
  *
  * Idempotency protocol (S8/S9/S28/S29/S31): both the data directory and
  * the manifest partition are per-batch overwrites keyed by `batch=<id>`,
  * manifest AFTER data — a replayed batch rewrites its data files and
  * re-harvests footers from what it just wrote, so the manifest can never
  * describe files that are not on disk (a crash between data and manifest
  * leaves the batch's files invisible to readers until the replay heals
  * both). File NAMES and file BOUNDARIES are attempt-scoped (the range
  * exchange samples boundaries per execution), but readers only ever
  * reach files through the manifest, so the reader-observable contract —
  * batch masses, zone coverage, and every pruned read's RESULTS — is
  * replay-invariant (spec-pinned); orphaned files from a pre-crash
  * attempt are dead weight (production compaction's job — q103) rather
  * than a correctness hazard. */
object ManifestStream {

  /** Files per batch: small enough that the per-batch footer harvest is
    * trivially metadata-sized, large enough that in-batch range layout
    * gives each file a tight price zone to prune on. */
  val FilesPerBatch = 4

  val ManifestSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("mn_p", DoubleType, nullable = false),
    StructField("mx_p", DoubleType, nullable = false)))

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** REAL footer stats of every parquet file under `dir`: (path, rows,
    * min p, max p) — the writer-commit metadata, harvested post hoc. */
  private[streaming] def harvest(s: SparkSession, dir: String): Seq[Row] = {
    val conf = s.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    fs(s, d).listStatus(d).toSeq
      .filter(st => st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          var (mn, mx) = (Double.MaxValue, Double.MinValue)
          var rows = 0L
          var statsSeen = true
          r.getFooter.getBlocks.asScala.foreach { b =>
            rows += b.getRowCount
            b.getColumns.asScala.foreach { c =>
              if (c.getPath.toDotString == "p")
                (c.getStatistics.genericGetMin, c.getStatistics.genericGetMax) match {
                  case (lo: java.lang.Double, hi: java.lang.Double) =>
                    mn = math.min(mn, lo); mx = math.max(mx, hi)
                  case _ => statsSeen = false
                }
            }
          }
          // a file whose footer carries NO usable zone for p (parquet-mr
          // omits float min/max when the column contains NaN) must stay
          // VISIBLE to every read — an unknown zone means "cannot skip",
          // never "skip always" (the read ⊇ match invariant); the
          // infinite zone overlaps every predicate. NaN stats themselves
          // (ADVICE r15: mn > mx is FALSE for NaN, and a NaN zone fails
          // every overlap test — the file would go permanently invisible)
          // degrade to the same infinite zone.
          if (!statsSeen || rows == 0L || mn > mx || mn.isNaN || mx.isNaN)
            Row(st.getPath.toString, rows,
              Double.NegativeInfinity, Double.PositiveInfinity)
          else Row(st.getPath.toString, rows, mn, mx)
        } finally r.close()
      }
  }

  /** One micro-batch: data files first (range-laid on p within the
    * batch), then the manifest partition from their REAL footers. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      root: String): Unit = {
    val s = batch.sparkSession
    val dataDir = s"$root/data/batch=$batchId"
    batch.repartitionByRange(FilesPerBatch, col("p"))
      .write.mode(SaveMode.Overwrite).parquet(dataDir)
    val stats = harvest(s, dataDir)
    s.createDataFrame(stats.asJava, ManifestSchema)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$root/manifest/batch=$batchId")
  }

  /** Streaming driver. `prices` must carry (p double). */
  def run(prices: DataFrame, root: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    prices.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root)
      }
      .start()

  /** The standing manifest — |files| metadata rows. */
  def manifest(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/manifest")

  /** Planning: the files a `p ∈ [lo, hi)` read must open — zone overlap
    * over the manifest, data untouched. */
  def prunedFiles(s: SparkSession, root: String, lo: Double, hi: Double)
      : Seq[String] =
    manifest(s, root)
      .where(col("mx_p") >= lo && col("mn_p") < hi)
      .select("path").collect().map(_.getString(0)).toSeq

  /** The manifest-pruned read: open ONLY the overlapping files, then
    * apply the exact predicate. Returns an empty frame when the
    * predicate prunes everything (zero files). */
  def prunedRead(s: SparkSession, root: String, lo: Double, hi: Double)
      : DataFrame = {
    val files = prunedFiles(s, root, lo, hi)
    val base =
      if (files.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("p", DoubleType))))
      else s.read.parquet(files: _*)
    base.where(col("p") >= lo && col("p") < hi)
  }
}
