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
}
