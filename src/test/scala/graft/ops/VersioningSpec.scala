package graft.ops

import graft.SparkSpec

/** q96 snapshot diff: the four statuses partition the id space exactly as
  * the version-carving rules dictate.
  */
class VersioningSpec extends SparkSpec {

  test("statuses match the carve rules: %7 added, %17 removed, %13 changed") {
    val s = spark
    import s.implicits._
    val rows = Versioning.q96SnapshotDiff(s, sf)
      .select($"doc_id", $"status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = graft.Tables(s, sf, "documents")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    ids.foreach { id =>
      val expected =
        if (id % 7 == 0 && id % 17 == 0) None // in neither version
        else if (id % 7 == 0) Some("added") // only in v2
        else if (id % 17 == 0) Some("removed") // only in v1
        else if (id % 13 == 0) Some("changed") // edited in v2
        else Some("unchanged")
      assert(rows.get(id) === expected, s"doc $id")
    }
    // every diff row refers to a fixture doc
    assert(rows.keySet.subsetOf(ids))
  }

  test("q113 incremental card equals a direct v2 rescan, source by source") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val inc = Versioning.q113IncrementalCard(s, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the direct rescan, recomputed independently of BOTH the query's
    // incremental path and the oracle SQL
    val direct = graft.Tables(s, sf, "documents")
      .filter($"doc_id" % 17 =!= 0)
      .select($"source",
        when($"doc_id" % 13 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
      .withColumn("nt", size(split($"text", " ")).cast("long"))
      .groupBy($"source").agg(
        count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
        sum(length($"text").cast("long")).as("n_chars"),
        sum(when($"nt" < 32, 1L).otherwise(0L)).as("short_docs"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(inc === direct)
    // the identity was exercised for real: the carve produces adds,
    // removes, AND changes on the fixture id space
    val statuses = Versioning.q96SnapshotDiff(s, sf)
      .select($"status").distinct().as[String].collect().toSet
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(statuses))
  }

  test("q122 drift: hand-computed TV, bucket-boundary edit, absent-side total drift") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-drift-").toString
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // A: ids 1,2 (10 tok → b0), 3 (40 → b1) in both; 7 (100 → b3) v2-only
    // B: id 14 — v2-only source (14 % 7 = 0 drops it from v1)
    // C: id 13 — edited (+1 token " rev2") crosses the 31→32 bucket edge
    val rows = Seq(
      (1L, doc(10), "A"), (2L, doc(10), "A"), (3L, doc(40), "A"),
      (7L, doc(100), "A"),
      (14L, doc(10), "B"),
      (13L, doc(31), "C"))
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    val out = Versioning.q122SnapshotDrift(s, root).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // A: h1 = {b0:2, b1:1} n1=3; h2 = {b0:2, b1:1, b3:1} n2=4
    //    tv_num = |8−6| + |4−3| + |0−3| = 6 → tv = 6/24 = 0.25
    assert(out("A") === ((3L, 4L, 6L, 0.25)))
    // B: absent from v1 → total drift by definition
    assert(out("B") === ((0L, 1L, 0L, 1.0)))
    // C: one doc hops b0 → b1 → disjoint histograms → tv = 1
    assert(out("C") === ((1L, 1L, 2L, 1.0)))
  }
}
