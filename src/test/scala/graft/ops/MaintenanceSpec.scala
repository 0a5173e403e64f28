package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q99/q100 warehouse maintenance: merge actions and the forget rewrite,
  * including the bucket-of-only-forbidden-rows edge that dynamic
  * partition overwrite cannot clear by itself.
  */
class MaintenanceSpec extends SparkSpec {

  test("q99: every %11 key updates, every %101 key inserts under key+10M") {
    val s = spark
    import s.implicits._
    val rows = Maintenance.q99MergeUpsert(s, sf)
      .select($"o_orderkey", $"action").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.nonEmpty)
    rows.foreach { case (k, action) =>
      if (k < 0L) {
        assert(action === "insert", s"key $k")
        assert((-k - 1L) % 101 === 0, s"inserted key $k not from %101 rule")
      } else {
        assert(action === "update", s"key $k")
        assert(k % 11 === 0, s"updated key $k not from %11 rule")
      }
    }
  }

  test("q100: a bucket holding ONLY forbidden users vanishes entirely, " +
      "and the physical swap serves exactly the audited commit view") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-forget-").toString
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // bucket 0: only forbidden users (97, 194) — must be DELETED, not kept;
    // bucket 1: mixed; bucket 2: untouched (no forbidden rows)
    Seq(
      (1L, ts(0), 97L, "view", 1.0, "{}"),
      (2L, ts(0), 194L, "view", 1.0, "{}"),
      (3L, ts(1), 97L, "view", 1.0, "{}"),
      (4L, ts(1), 5L, "view", 1.0, "{}"),
      (5L, ts(2), 3L, "view", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    def auditOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = auditOf(Maintenance.q100ForgetUsers(s, dir))
    assert(out === Map(1L -> ((1L, 0L)), 2L -> ((1L, 0L))),
      s"bucket 0 must disappear, survivors only elsewhere: $out")
    // the registered query never mutates the standing lake: the pristine
    // buckets are all still present pre-swap
    val lakeRoot = new java.io.File(graft.Scratch.forSf("forget", dir),
      "events_lake")
    assert(new java.io.File(lakeRoot, "day_bucket=0").exists(),
      "staged commit must leave the standing lake pristine")
    // physical swap: affected dirs replaced/removed, untouched dirs kept
    Maintenance.commitSwap(s, dir)
    assert(!new java.io.File(lakeRoot, "day_bucket=0").exists(),
      "all-forbidden bucket directory should have been removed by the swap")
    val swapped = s.read.parquet(lakeRoot.toString)
      .groupBy($"day_bucket".cast("long").as("day_bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(pmod($"user_id", lit(97L)) === 0, 1L).otherwise(0L))
          .as("n_forbidden"))
    assert(auditOf(swapped) === out,
      "post-swap lake must serve exactly the audited commit view")
  }

  test("q103: compaction reduces file count, bin-packs to ceil(rows/target), " +
      "and the data survives byte-identically") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-compact-").toString
    def ts(day: Int) = new Timestamp(day * 86400000L)
    // bucket 0: 7 rows, bucket 1: 3 rows — written maximally fragmented
    val rows = (1 to 7).map(i => (i.toLong, ts(0), i.toLong, "view", i * 1.0, "{}")) ++
      (8 to 10).map(i => (i.toLong, ts(1), i.toLong, "view", i * 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val frag = Maintenance.ensureFragmentedLake(s, dir)
    def parquetFiles(root: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(new java.io.File(root))
    }
    val nFrag = parquetFiles(frag).size
    assert(nFrag > 4, s"fixture should be fragmented, got $nFrag files")
    // rowsPerFile = 3: bucket 0 (7 rows) -> 3 files, bucket 1 (3 rows) -> 1
    val compacted = s"${graft.Scratch.forSf("compact", dir)}/spec_compacted"
    Maintenance.compact(s, frag, compacted, 3L)
    val byBucket = parquetFiles(compacted)
      .groupBy(_.getParentFile.getName).view.mapValues(_.size).toMap
    assert(byBucket === Map("day_bucket=0" -> 3, "day_bucket=1" -> 1),
      s"bin-packing contract violated: $byBucket")
    // byte-identity: both difference directions empty over full rows
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props", "day_bucket")
    val a = s.read.parquet(frag).select(cols.map(col): _*)
    val b = s.read.parquet(compacted).select(cols.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compacted data must be byte-identical to the fragmented source")
  }
}
