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

  // ---------------------------------------------------------------- q113
  /** Incremental data-card maintenance — the identity that lets q111's
    * governance card survive 100 TB without nightly rescans:
    * card(v2) = card(v1) + Σ delta(diff rows). The Spark side computes the
    * v2 card INCREMENTALLY — the v1 card plus per-source deltas derived
    * only from q96's non-unchanged diff rows (added: +m(new); removed:
    * −m(old); changed: m(new) − m(old)) — while the ORACLE rescans v2
    * directly, so the hash-match is a machine-checked proof that
    * incremental maintenance equals rescan, bit for bit. Restricted to the
    * card's SUM-decomposable metrics (docs, tokens, chars, short-docs);
    * q111's dup_docs/top_lang columns are deliberately absent — a corpus-
    * wide dup window is not delta-decomposable and stays a full-scan
    * metric.
    *
    * Scale shape: the v1 card is the standing |sources|-row table (stored,
    * not recomputed, in production — recomputed here from the carve so the
    * query is self-contained); the delta aggregates DIFF-sized input
    * (changed ∪ added ∪ removed — at steady state orders of magnitude
    * smaller than the corpus); the merge is a |sources|-row full-outer.
    * Sources whose last doc was removed drop out via the n_docs > 0
    * filter, matching the direct rescan. Uses the same deterministic
    * v1/v2 carve as q96. */
  def q113IncrementalCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def nToks(t: org.apache.spark.sql.Column) = size(split(t, " ")).cast("long")
    def isShort(t: org.apache.spark.sql.Column) =
      when(nToks(t) < 32, 1L).otherwise(0L)
    val docs = Tables(s, dir, "documents")
    val v1 = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", $"source", $"text")
    val v2 = docs.filter($"doc_id" % 17 =!= 0)
      .select($"doc_id", $"source",
        when($"doc_id" % 13 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
    // the standing card — the same additive projection the S14 streaming
    // seam maintains per micro-batch (shared code path)
    val cardV1 = Curation.additiveCard(v1)
    // q96's diff shape, kept as (old text, new text) + presence markers;
    // unchanged rows are filtered BEFORE any aggregation, so the delta agg
    // reads diff-sized input only
    val j = v1.select($"doc_id", $"source".as("s1"), $"text".as("t1"),
        lit(1L).as("in1"))
      .join(v2.select($"doc_id", $"source".as("s2"), $"text".as("t2"),
        lit(1L).as("in2")), Seq("doc_id"), "full_outer")
      .filter($"in1".isNull || $"in2".isNull || $"t1" =!= $"t2")
    val delta = j.select(coalesce($"s2", $"s1").as("source"),
        (when($"in2".isNotNull, 1L).otherwise(0L)
          - when($"in1".isNotNull, 1L).otherwise(0L)).as("dd"),
        (when($"in2".isNotNull, nToks($"t2")).otherwise(0L)
          - when($"in1".isNotNull, nToks($"t1")).otherwise(0L)).as("dt"),
        (when($"in2".isNotNull, length($"t2").cast("long")).otherwise(0L)
          - when($"in1".isNotNull, length($"t1").cast("long")).otherwise(0L)).as("dc"),
        (when($"in2".isNotNull, isShort($"t2")).otherwise(0L)
          - when($"in1".isNotNull, isShort($"t1")).otherwise(0L)).as("ds"))
      .groupBy($"source").agg(sum($"dd").as("dd"), sum($"dt").as("dt"),
        sum($"dc").as("dc"), sum($"ds").as("ds"))
    cardV1.join(delta, Seq("source"), "full_outer")
      .select($"source",
        (coalesce($"n_docs", lit(0L)) + coalesce($"dd", lit(0L))).as("n_docs"),
        (coalesce($"n_tokens", lit(0L)) + coalesce($"dt", lit(0L))).as("n_tokens"),
        (coalesce($"n_chars", lit(0L)) + coalesce($"dc", lit(0L))).as("n_chars"),
        (coalesce($"short_docs", lit(0L)) + coalesce($"ds", lit(0L))).as("short_docs"))
      .filter($"n_docs" > 0)
      .orderBy($"source")
  }

  /** The oracle is the DIRECT v2 rescan — deliberately a different
    * computation than the Spark side's incremental merge, so the
    * hash-match proves the maintenance identity. */
  val q113Oracle: String =
    """WITH v2 AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  CAST(SUM(len(text)) AS BIGINT) AS n_chars,
      |  CAST(SUM(CASE WHEN len(string_split(text, ' ')) < 32 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS short_docs
      |FROM v2 GROUP BY source
      |HAVING COUNT(*) > 0
      |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_snapshot_diff" -> q96SnapshotDiff _,
    "q113_incremental_card" -> q113IncrementalCard _,
  )

  val oracles: Map[String, String] = Map(
    "q96_snapshot_diff" -> q96Oracle,
    "q113_incremental_card" -> q113Oracle,
  )
}
