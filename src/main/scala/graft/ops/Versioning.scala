package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus snapshot diff — dataset versioning: given two corpus versions,
  * classify every doc_id as added / removed / changed / unchanged by
  * content hash. This is the audit step a managed training-corpus release
  * runs between snapshots (what changed since the last refresh, and how
  * much), and the precondition for incremental downstream rebuilds (only
  * `added ∪ changed` re-enters the dedup/decontam/index pipelines — the
  * q72/S8/S10 delta inputs are exactly this diff's output).
  *
  * Versions are carved deterministically from the fixture so the oracle
  * sees the same two snapshots: v1 = docs with doc_id % 7 ≠ 0 (the
  * "previous" snapshot), v2 = docs with doc_id % 17 ≠ 0, where the
  * doc_id % 13 = 0 docs carry an edit (text ⧺ " rev2"). Production points
  * the two sides at two lake snapshot paths.
  *
  * Scale shape: each side is one scan + a map-side sha2 projection; the
  * diff is ONE full-outer equi-join on doc_id (both sides hash-partition
  * on the same key), and the status is a map-side CASE over the joined
  * row. No driver-side state, no second shuffle; at 100 TB this is the
  * cheapest possible corpus comparison — hash-compare, never text-compare
  * (the 64-byte hash shuffles, not the documents).
  */
object Versioning {

  def q96SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    // presence rides on a non-null MARKER, not on the hash (q99's marker
    // discipline, ADVICE r8): a doc with NULL text hashes to NULL on both
    // sides and must classify by which snapshot holds the row, never be
    // mistaken for added/removed
    val v1 = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", lit(1L).as("in_v1"), sha2($"text", 256).as("old_hash"))
    val v2 = docs.filter($"doc_id" % 17 =!= 0)
      .select($"doc_id", lit(1L).as("in_v2"),
        sha2(when($"doc_id" % 13 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text"), 256).as("new_hash"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when($"in_v1".isNull, "added")
          .when($"in_v2".isNull, "removed")
          // NULL-hash rows present in both versions fall through to
          // "changed" — mirroring the oracle's CASE, where a NULL
          // comparison is not TRUE
          .when($"old_hash" === $"new_hash", "unchanged")
          .otherwise("changed"))
      .select($"doc_id", $"status", $"old_hash", $"new_hash")
      .orderBy($"doc_id")
  }

  val q96Oracle: String =
    """WITH v1 AS (
      |  SELECT doc_id, sha256(text) AS old_hash FROM documents
      |  WHERE doc_id % 7 <> 0),
      |v2 AS (
      |  SELECT doc_id,
      |    sha256(CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END)
      |      AS new_hash
      |  FROM documents WHERE doc_id % 17 <> 0)
      |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
      |  CASE WHEN v1.doc_id IS NULL THEN 'added'
      |       WHEN v2.doc_id IS NULL THEN 'removed'
      |       WHEN v1.old_hash = v2.new_hash THEN 'unchanged'
      |       ELSE 'changed' END AS status,
      |  v1.old_hash, v2.new_hash
      |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_snapshot_diff" -> q96SnapshotDiff _,
  )

  val oracles: Map[String, String] = Map(
    "q96_snapshot_diff" -> q96Oracle,
  )
}
