package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-maintenance operators: the mutation verbs a managed lake
  * needs around the read-only analytics — MERGE (upsert) and targeted
  * deletion with partition-pruned rewrite. Spark on parquet has no
  * transactional MERGE/DELETE; these are the hand-rolled shapes every
  * pre-Delta production lake ran (and what Delta/Iceberg compile to
  * underneath): join-based row reconciliation + partition-scoped file
  * replacement.
  */
object Maintenance {

  // ---------------------------------------------------------------- q99
  /** Batch MERGE delta — upsert a deterministic change batch into the
    * orders dimension: every `o_orderkey % 11 = 0` row is an UPDATE
    * (price bumped +1.00, status 'U'), every `% 101 = 0` key spawns an
    * INSERT under the NEGATED key space (−k−1 — disjoint from the
    * positive real keys at every scale factor, where a fixed offset
    * would eventually collide). The query
    * returns the merge DELTA — one row per source row with its action and
    * before/after values — which is both the audit log a production MERGE
    * emits and a bounded result at any scale (the delta is source-sized,
    * never target-sized). The merged table itself is
    * `target ANTI source ∪ source` — one hash join on the key.
    *
    * Scale shape: the action decision is a LEFT join of the change batch
    * against the target keyed on o_orderkey — both sides hash-partition
    * on the same key, the only wide exchange. At 100 TB the target side
    * would be bucketed on the key (q38) making the merge join
    * exchange-free on the big side. */
  def q99MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val target = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    val updates = target.filter($"o_orderkey" % 11 === 0)
      .select($"o_orderkey", ($"o_totalprice" + 1.0).as("new_price"),
        lit("U").as("new_status"))
    val inserts = target.filter($"o_orderkey" % 101 === 0)
      .select((-$"o_orderkey" - 1L).as("o_orderkey"),
        ($"o_orderkey" % 1000).cast("double").as("new_price"),
        lit("N").as("new_status"))
    val source = updates.unionByName(inserts)
    // presence is tested on a non-null MARKER, not on a nullable measure:
    // an existing row whose o_totalprice happens to be NULL must still
    // classify as an update
    source.join(target.select($"o_orderkey", lit(1L).as("matched"),
        $"o_totalprice".as("old_price"), $"o_orderstatus".as("old_status")),
      Seq("o_orderkey"), "left")
      .withColumn("action",
        when($"matched".isNull, "insert").otherwise("update"))
      .select($"o_orderkey", $"action", $"old_price", $"old_status",
        $"new_price", $"new_status")
      .orderBy($"o_orderkey")
  }

  val q99Oracle: String =
    """WITH target AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |source AS (
      |  SELECT o_orderkey, o_totalprice + 1.0 AS new_price, 'U' AS new_status
      |  FROM target WHERE o_orderkey % 11 = 0
      |  UNION ALL
      |  SELECT -o_orderkey - 1 AS o_orderkey,
      |    CAST(o_orderkey % 1000 AS DOUBLE) AS new_price, 'N' AS new_status
      |  FROM target WHERE o_orderkey % 101 = 0)
      |SELECT s.o_orderkey,
      |  CASE WHEN t.o_orderkey IS NULL THEN 'insert' ELSE 'update' END AS action,
      |  t.o_totalprice AS old_price, t.o_orderstatus AS old_status,
      |  s.new_price, s.new_status
      |FROM source s LEFT JOIN target t ON t.o_orderkey = s.o_orderkey
      |ORDER BY s.o_orderkey""".stripMargin

  // --------------------------------------------------------------- q100
  /** The standing day-bucketed events lake under scratch, built at most
    * once per (session, sf dir) and treated as IMMUTABLE thereafter: the
    * delete operator stages replacement files NEXT TO it and audits the
    * commit view, so repeated invocations (bench iterations, verify +
    * specs in one session) all see the same pristine input and the timed
    * body never re-pays fixture construction (the dedup_prep discipline —
    * VERDICT r8 #2). */
  private val lakeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def forgetRoot(dir: String): String = graft.Scratch.forSf("forget", dir)

  private[graft] def ensureForgetLake(s: SparkSession, dir: String): String =
    lakeCache.getOrElseUpdate((s, dir), {
      val lake = s"${forgetRoot(dir)}/events_lake"
      Tables(s, dir, "events")
        .withColumn("day_bucket", expr("unix_millis(ts) div 86400000"))
        .write.mode("overwrite").partitionBy("day_bucket").parquet(lake)
      lake
    })

  /** Bench prep hook: force the next [[ensureForgetLake]] to rebuild, so
    * the prep entry times the lake build COLD (and a post-swap lake is
    * never mistaken for the pristine one). */
  private[graft] def evictForgetLake(s: SparkSession, dir: String): Unit =
    lakeCache.remove((s, dir))

  private def partitionDirs(path: String): Set[Long] = {
    val fs = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    fs.filter(f => f.isDirectory && f.getName.startsWith("day_bucket="))
      .map(_.getName.stripPrefix("day_bucket=").toLong).toSet
  }

  /** Targeted deletion with partition-pruned staged rewrite (the
    * right-to-be-forgotten shape): events live in a day-bucketed lake;
    * forgetting the `user_id % 97 = 0` users must rewrite ONLY the
    * buckets that actually contain those users' rows — never the whole
    * lake. The operator (1) finds the affected buckets (an aggregation
    * over just the forget set), (2) writes those buckets' surviving rows
    * to a STAGING directory — real replacement files, but never an
    * in-place overwrite of the path being read (ADVICE r8: relying on
    * persist() to shield a read-modify-overwrite loses data if cached
    * partitions are evicted mid-commit), and (3) audits the commit view:
    * untouched buckets from the lake (partition-pruned), affected buckets
    * from their staged replacements. This is exactly how a manifest table
    * (Delta/Iceberg) commits a DELETE — new files per affected partition
    * plus a metadata swap; the physical directory swap is [[commitSwap]],
    * driven end-to-end by MaintenanceSpec, while the registered query
    * stops at the staged commit so the standing lake stays pristine.
    *
    * The all-forbidden-bucket edge resolves structurally: a bucket whose
    * every row is forbidden yields no staged partition and is excluded
    * from the untouched side, so it appears in neither — no directory
    * delete in the hot path, no silent retention (the failure mode of
    * bare dynamic partition overwrite, which only replaces partitions
    * PRESENT in the new data).
    *
    * Scale shape: the forget set's bucket list is an aggregation over
    * only the matching rows (collision-proportional, bounded by days not
    * rows); the rewrite reads and writes only the affected directories
    * (partition pruning on the read, staged files on the write). Day
    * granularity at fixture scale (hour buckets made the query
    * directory-count-bound at sf0.1); a 100 TB lake with real file sizes
    * per partition uses hours. With deletions clustered in time this
    * touches a sliver of the lake — the reason every lakehouse delete is
    * built exactly this way. */
  def q100ForgetUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lake = ensureForgetLake(s, dir)
    val staged = s"${forgetRoot(dir)}/staged"
    // (1) buckets that actually hold forbidden rows — day_bucket comes
    // back as an INFERRED partition column (int-typed when small), cast
    // before collecting
    val affected = s.read.parquet(lake)
      .filter($"user_id" % 97 === 0)
      .select($"day_bucket".cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // bounded: days, not rows
    // (2) staged rewrite of ONLY those buckets, forbidden users
    // anti-filtered out
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staged))
    s.read.parquet(lake)
      .filter($"day_bucket".isin(affected: _*))
      .filter(pmod($"user_id", lit(97L)) =!= 0)
      .write.mode("overwrite").partitionBy("day_bucket").parquet(staged)
    // (3) audit the commit view — the oracle recomputes it relationally,
    // so the staged rewrite path is hash-checked end to end
    viewFrom(s, lake, staged, affected)
      .groupBy($"day_bucket".cast("long").as("day_bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(pmod($"user_id", lit(97L)) === 0, 1L).otherwise(0L))
          .as("n_forbidden"))
      .orderBy($"day_bucket")
  }

  /** The post-delete table as a manifest swap serves it: lake buckets
    * without staged replacements + the staged files. An affected bucket
    * with no staged partition (all rows forbidden) appears in neither
    * side. */
  private def viewFrom(s: SparkSession, lake: String, staged: String,
      affected: Seq[Long]): DataFrame = {
    import s.implicits._
    val untouched = s.read.parquet(lake)
      .filter(!$"day_bucket".cast("long").isin(affected: _*))
    if (partitionDirs(staged).isEmpty) untouched
    else untouched.unionByName(s.read.parquet(staged))
  }

  /** Affected buckets recovered from the two directories alone: staged
    * buckets ∪ buckets still holding forbidden rows (covers all-forbidden
    * buckets, which stage nothing) — so spec-side consumers need no
    * plumbing from the query invocation. */
  private def affectedOf(s: SparkSession, lake: String,
      staged: String): Seq[Long] = {
    import s.implicits._
    (partitionDirs(staged) ++
      s.read.parquet(lake).filter($"user_id" % 97 === 0)
        .select($"day_bucket".cast("long")).distinct()
        .collect().map(_.getLong(0))).toSeq.sorted
  }

  /** The staged commit as a readable table (spec hook). */
  private[graft] def commitView(s: SparkSession, dir: String): DataFrame = {
    val lake = s"${forgetRoot(dir)}/events_lake"
    val staged = s"${forgetRoot(dir)}/staged"
    viewFrom(s, lake, staged, affectedOf(s, lake, staged))
  }

  /** Physically apply the staged rewrite — the file-system analog of the
    * manifest swap a table format commits: every affected bucket's lake
    * directory is dropped and its staged replacement (if any; none means
    * the bucket was deleted outright) moved into place. Kept OUT of the
    * registered query body; MaintenanceSpec drives it and proves the
    * swapped lake serves exactly the audited commit view. Evicts the
    * lake cache afterwards — the lake is no longer pristine. */
  private[graft] def commitSwap(s: SparkSession, dir: String): Unit = {
    val lake = s"${forgetRoot(dir)}/events_lake"
    val staged = s"${forgetRoot(dir)}/staged"
    val affected = affectedOf(s, lake, staged)
    affected.foreach { b =>
      val dst = new java.io.File(s"$lake/day_bucket=$b")
      org.apache.commons.io.FileUtils.deleteQuietly(dst)
      val src = new java.io.File(s"$staged/day_bucket=$b")
      if (src.exists())
        org.apache.commons.io.FileUtils.moveDirectory(src, dst)
    }
    evictForgetLake(s, dir)
  }

  val q100Oracle: String =
    """SELECT epoch_ms(ts) // 86400000 AS day_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(0 AS BIGINT) AS n_forbidden
      |FROM events
      |WHERE user_id % 97 <> 0
      |GROUP BY 1 ORDER BY day_bucket""".stripMargin

  // --------------------------------------------------------------- q103
  /** Target rows per compacted file. At fixture scale this is sized so
    * most day buckets compact to ONE file while the biggest still split,
    * exercising the rotation; production uses the ≤1M-rows/≈128MB-file
    * discipline of q30/q87/writeSeedKeys (the same number Firehose's
    * 128 MB buffer targets — app.ts:36,406). */
  val CompactRowsPerFile = 256L

  /** A deliberately fragmented day-bucketed events lake: `repartition(16)`
    * before the partitioned write makes EVERY task write a file into
    * EVERY bucket directory — the classic small-file lake mistake (q30
    * repartitions by the partition columns precisely to avoid it), and
    * exactly the debris Firehose-style buffered ingest leaves behind when
    * the buffer interval, not size, flushes. Built once per (session, sf
    * dir), immutable — the q100 lake discipline. */
  private val fragCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[graft] def ensureFragmentedLake(s: SparkSession, dir: String): String =
    fragCache.getOrElseUpdate((s, dir), {
      val lake = s"${graft.Scratch.forSf("compact", dir)}/fragmented"
      Tables(s, dir, "events")
        .withColumn("day_bucket", expr("unix_millis(ts) div 86400000"))
        .repartition(16)
        .write.mode("overwrite").partitionBy("day_bucket").parquet(lake)
      lake
    })

  private[graft] def evictFragmentedLake(s: SparkSession, dir: String): Unit =
    fragCache.remove((s, dir))

  /** The compaction kernel: bin-pack every bucket's rows into
    * ceil(rows / rowsPerFile) files. One shuffle clusters each bucket
    * into a single task (`repartition` on the partition column — the
    * q30 write discipline); `maxRecordsPerFile` rotates the writer, so
    * the per-bucket file count is row-count-derived with NO driver-side
    * per-bucket planning — the operator never collects anything. */
  private[graft] def compact(s: SparkSession, src: String, dst: String,
      rowsPerFile: Long): Unit =
    s.read.parquet(src)
      .repartition(col("day_bucket"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .partitionBy("day_bucket").parquet(dst)

  /** Lake compaction (OPTIMIZE) — the third maintenance verb next to q99
    * MERGE and q100 DELETE: rewrite a fragmented day-bucketed lake so
    * each bucket holds ceil(rows / [[CompactRowsPerFile]]) files instead
    * of one-file-per-ingest-task, byte-identical data. Compacted files
    * land in a staging directory (the q100 staged-commit discipline —
    * the fragmented source is never rewritten in place); the audit reads
    * the compacted lake back and reports, per bucket, the row count, two
    * content checksums (exact id sum + exact decimal value sum), and the
    * OBSERVED file count via `input_file_name()` — which the oracle
    * recomputes as ceil(n/rowsPerFile) from the raw events, so the
    * bin-packing contract itself is hash-checked, not just the data.
    *
    * Scale shape: one shuffle keyed on the partition column, writer-side
    * file rotation, zero driver state. At 100 TB this is the nightly
    * OPTIMIZE pass that keeps scan task counts proportional to data, not
    * to ingest cadence. */
  def q103CompactFiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frag = ensureFragmentedLake(s, dir)
    val compacted = s"${graft.Scratch.forSf("compact", dir)}/compacted"
    compact(s, frag, compacted, CompactRowsPerFile)
    s.read.parquet(compacted)
      // projection first: input_file_name is non-deterministic and may
      // not sit directly inside an aggregate
      .select($"day_bucket".cast("long").as("day_bucket"), $"event_id",
        $"value", input_file_name().as("fname"))
      .groupBy($"day_bucket")
      .agg(count(lit(1)).as("n_events"),
        sum($"event_id").as("sum_event_id"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        countDistinct($"fname").as("n_files"))
      .orderBy($"day_bucket")
  }

  val q103Oracle: String =
    s"""SELECT epoch_ms(ts) // 86400000 AS day_bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       |  ${Sql.dsum("value")} AS sum_value,
       |  CAST((COUNT(*) + ${CompactRowsPerFile - 1}) // $CompactRowsPerFile AS BIGINT) AS n_files
       |FROM events
       |GROUP BY 1 ORDER BY day_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_merge_upsert" -> q99MergeUpsert _,
    "q100_forget_users" -> q100ForgetUsers _,
    "q103_compact_files" -> q103CompactFiles _,
  )

  val oracles: Map[String, String] = Map(
    "q99_merge_upsert" -> q99Oracle,
    "q100_forget_users" -> q100Oracle,
    "q103_compact_files" -> q103Oracle,
  )
}
