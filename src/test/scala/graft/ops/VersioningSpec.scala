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
}
