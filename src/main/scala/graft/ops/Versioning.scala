package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ---------------------------------------------------------------- q122
  /** Snapshot distribution drift — the monitoring number a corpus refresh
    * is gated on BEFORE retraining: per source, the total-variation
    * distance between the previous and current snapshots' token-length
    * distributions (q106's 256-bin histogram, per source). A refresh that
    * silently shifts a source's length profile (a scraper change, a new
    * boilerplate stripper, an upstream site redesign) shows up here as
    * TV > ε long before it shows up as a training regression. Uses the
    * same deterministic v1/v2 carve as q96/q113 and the SAME
    * `lengthHistogramBy` bucketing as q106/S12 — the drift metric cannot
    * disagree with the histograms the pipeline already maintains.
    *
    * Integer discipline: TV = ½·Σ_b |c1_b/n1 − c2_b/n2| is computed as
    * the INTEGER numerator Σ_b |c1_b·n2 − c2_b·n1| (exact cross
    * multiplication — no per-bucket float division whose summation order
    * could diverge) with ONE terminal division by 2·n1·n2. A source
    * absent from one snapshot is total drift (tv = 1) by definition.
    *
    * Scale shape: each snapshot side is one scan + a ≤ 256·|sources|-group
    * partial agg (the histogram IS the shuffle output); the joined
    * histogram is metadata-sized and localCheckpoint'd once for its two
    * consumers (per-source totals, per-bucket terms) so neither re-runs a
    * corpus scan. At 100 TB the inputs are the S12-maintained standing
    * histograms — this query is then pure metadata arithmetic. */
  def q122SnapshotDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val v1 = docs.filter($"doc_id" % 7 =!= 0).select($"source", $"text")
    val v2 = docs.filter($"doc_id" % 17 =!= 0)
      .select($"source",
        when($"doc_id" % 13 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"))
    tvBySource(TextAnalysis.lengthHistogramBy(v1, "source"),
      TextAnalysis.lengthHistogramBy(v2, "source"))
  }

  /** The TV computation itself, over two per-source histograms (columns:
    * source, bucket, c) — q122's integer-exact rule factored out so the
    * S16 streaming drift probe and the batch snapshot drift share ONE
    * code path (the S12/q106 discipline): the gate a stream maintains
    * cannot disagree with the gate a snapshot job computes. */
  private[graft] def tvBySource(h1: DataFrame, h2: DataFrame): DataFrame = {
    val s = h1.sparkSession
    import s.implicits._
    val j = h1.withColumnRenamed("c", "c1")
      .join(h2.withColumnRenamed("c", "c2"),
        Seq("source", "bucket"), "full_outer")
      .select($"source", $"bucket",
        coalesce($"c1", lit(0L)).as("c1"), coalesce($"c2", lit(0L)).as("c2"))
      .localCheckpoint(true) // ≤ 256·|sources| rows, two consumers
    val totals = j.groupBy($"source")
      .agg(sum($"c1").as("n1_docs"), sum($"c2").as("n2_docs"))
    j.join(totals, "source")
      .groupBy($"source", $"n1_docs", $"n2_docs")
      .agg(sum(abs($"c1" * $"n2_docs" - $"c2" * $"n1_docs")).as("tv_num"))
      .withColumn("tv",
        when($"n1_docs" === 0 || $"n2_docs" === 0, lit(1.0))
          .otherwise($"tv_num".cast("double") /
            (lit(2.0) * $"n1_docs" * $"n2_docs")))
      .select($"source", $"n1_docs", $"n2_docs", $"tv_num", $"tv")
      .orderBy($"source")
  }

  val q122Oracle: String =
    """WITH v1 AS (
      |  SELECT source, text FROM documents WHERE doc_id % 7 <> 0),
      |v2 AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 17 <> 0),
      |h1 AS (
      |  SELECT source, least(len(string_split(text, ' ')) // 32, 255) AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS c1
      |  FROM v1 GROUP BY 1, 2),
      |h2 AS (
      |  SELECT source, least(len(string_split(text, ' ')) // 32, 255) AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS c2
      |  FROM v2 GROUP BY 1, 2),
      |j AS (
      |  SELECT COALESCE(h1.source, h2.source) AS source,
      |    COALESCE(h1.bucket, h2.bucket) AS bucket,
      |    COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
      |  FROM h1 FULL OUTER JOIN h2 ON h1.source = h2.source AND h1.bucket = h2.bucket),
      |totals AS (
      |  SELECT source, CAST(SUM(c1) AS BIGINT) AS n1_docs,
      |    CAST(SUM(c2) AS BIGINT) AS n2_docs
      |  FROM j GROUP BY source)
      |SELECT j.source, t.n1_docs, t.n2_docs,
      |  CAST(SUM(abs(c1 * t.n2_docs - c2 * t.n1_docs)) AS BIGINT) AS tv_num,
      |  CASE WHEN t.n1_docs = 0 OR t.n2_docs = 0 THEN 1.0::DOUBLE
      |       ELSE CAST(CAST(SUM(abs(c1 * t.n2_docs - c2 * t.n1_docs)) AS BIGINT) AS DOUBLE)
      |            / (2.0::DOUBLE * t.n1_docs * t.n2_docs) END AS tv
      |FROM j JOIN totals t USING (source)
      |GROUP BY j.source, t.n1_docs, t.n2_docs
      |ORDER BY j.source""".stripMargin

  // ---------------------------------------------------------------- q139
  /** SCD-2 corpus version history — the temporal registry behind every
    * "which snapshot trained this model" audit: q96 answers what changed
    * between TWO snapshots; q139 folds a whole snapshot SERIES into the
    * type-2 dimension table a lakehouse keeps per document — one row per
    * contiguous content VERSION RUN with [valid_from, valid_to] snapshot
    * bounds and an is_current flag. A doc that is deleted and later
    * re-added (even with identical text) opens a NEW run — presence gaps
    * terminate validity, which is what provenance law (right-to-be-
    * forgotten windows, license revocations) actually asks of the
    * registry.
    *
    * Snapshots are the q96/q113 deterministic carve extended to three:
    * v1 = id%7≠0; v2 = id%17≠0 with the %13 " rev2" edit; v3 = id%19≠0
    * with the %13 edit kept and a further %11 " rev3" edit. Production
    * points the union at N lake snapshot paths.
    *
    * Scale shape: the union is N snapshot scans with a map-side sha2
    * projection (the 64-byte hash shuffles, never the text — q96's rule);
    * ONE exchange on doc_id feeds the lag window (≤N rows per doc), and
    * the run aggregation groups on (doc_id, run_id) — clustering keys a
    * superset of the window's hash partitioning, so EnsureRequirements
    * inserts no second exchange. Run detection is the gaps-and-islands
    * rule in pure integer/string comparison: new_run ⇔ first row ∨ hash
    * change ∨ snapshot gap. */
  def q139Scd2History(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    def snap(n: Int, pred: org.apache.spark.sql.Column,
             text: org.apache.spark.sql.Column) =
      docs.filter(pred).select($"doc_id", lit(n.toLong).as("snap"),
        sha2(text, 256).as("version_hash"))
    val v1 = snap(1, $"doc_id" % 7 =!= 0, $"text")
    val v2 = snap(2, $"doc_id" % 17 =!= 0,
      when($"doc_id" % 13 === 0, concat($"text", lit(" rev2"))).otherwise($"text"))
    val v3 = snap(3, $"doc_id" % 19 =!= 0,
      when($"doc_id" % 11 === 0,
        concat(when($"doc_id" % 13 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text"), lit(" rev3")))
        .otherwise(when($"doc_id" % 13 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text")))
    val w = Window.partitionBy($"doc_id").orderBy($"snap")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v1.unionByName(v2).unionByName(v3)
      .withColumn("new_run",
        when(lag($"snap", 1).over(w).isNull, 1L)
          .when($"version_hash" =!= lag($"version_hash", 1).over(w), 1L)
          .when($"snap" =!= lag($"snap", 1).over(w) + 1, 1L)
          .otherwise(0L))
      .withColumn("run_id", sum($"new_run").over(wRun))
      .groupBy($"doc_id", $"run_id")
      .agg(min($"snap").as("valid_from"), max($"snap").as("valid_to"),
        min($"version_hash").as("version_hash"))
      .withColumn("is_current", $"valid_to" === 3L)
      .select($"doc_id", $"run_id", $"valid_from", $"valid_to",
        $"is_current", $"version_hash")
      .orderBy($"doc_id", $"valid_from")
  }

  val q139Oracle: String =
    """WITH snaps AS (
      |  SELECT doc_id, 1::BIGINT AS snap, sha256(text) AS version_hash
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id, 2::BIGINT,
      |    sha256(CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END)
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id, 3::BIGINT,
      |    sha256(CASE WHEN doc_id % 11 = 0
      |      THEN (CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END) || ' rev3'
      |      ELSE (CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END) END)
      |  FROM documents WHERE doc_id % 19 <> 0),
      |flagged AS (
      |  SELECT doc_id, snap, version_hash,
      |    CASE WHEN lag(snap) OVER w IS NULL THEN 1
      |         WHEN version_hash <> lag(version_hash) OVER w THEN 1
      |         WHEN snap <> lag(snap) OVER w + 1 THEN 1
      |         ELSE 0 END::BIGINT AS new_run
      |  FROM snaps
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY snap)),
      |runs AS (
      |  SELECT doc_id, snap, version_hash,
      |    CAST(SUM(new_run) OVER (PARTITION BY doc_id ORDER BY snap
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      |  FROM flagged)
      |SELECT doc_id, run_id, MIN(snap) AS valid_from, MAX(snap) AS valid_to,
      |  MAX(snap) = 3 AS is_current, MIN(version_hash) AS version_hash
      |FROM runs GROUP BY doc_id, run_id
      |ORDER BY doc_id, valid_from""".stripMargin

  // ---------------------------------------------------------------- q149
  /** Embedding-space drift gate — q122's refresh monitor moved to the
    * VECTOR side of the corpus: per label group, the total-variation
    * distance between two embedding snapshots' IVF-CELL occupancy
    * histograms, with every vector assigned against the SAME standing
    * quantizer (the S10 generation — deliberately held fixed, so the
    * gate isolates data drift from quantizer drift; retraining is S10's
    * separate, pointer-swapped job). This is the check a release runs
    * after an embedding-model upgrade or a re-embed backfill: a shifted
    * cell histogram means the ANN index's balance assumptions (q128) and
    * the SemDeDup radii (q77) were tuned on a distribution that no
    * longer exists. The fixture carves snapshots deterministically
    * (v1: vec_id % 5 ≠ 0; v2: vec_id % 9 ≠ 0) and models the
    * re-embed by REVERSING the % 7 ≡ 0 vectors in v2 — a rotation-like
    * perturbation that moves vectors across cells without changing
    * norms.
    *
    * Scale shape: assignment is the map-side codegen'd NearestCells
    * projection against the CACHED quantizer metadata (zero exchange —
    * q59's discipline); each side folds to a ≤ |labels|·nlist-row
    * histogram in ONE partial agg (the histogram IS the shuffle output —
    * q122's contract); the TV arithmetic is [[tvBySource]] — the exact
    * integer cross-multiplication code q122 and S16 run, one code path
    * for all three drift gates. */
  def q149EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val (cells, mats) = Similarity.cachedCentroidMeta(s, dir)
    def hist(df: DataFrame): DataFrame =
      df.select($"label".cast("long").as("source"),
          element_at(graft.functions.NearestCellsUtil
            .column($"emb2", cells, mats, 1), 1).as("bucket"))
        .groupBy($"source", $"bucket").agg(count(lit(1)).as("c"))
    val v1 = emb.filter($"vec_id" % 5 =!= 0)
      .select($"label", $"embedding".as("emb2"))
    val v2 = emb.filter($"vec_id" % 9 =!= 0)
      .select($"label",
        when($"vec_id" % 7 === 0, reverse($"embedding"))
          .otherwise($"embedding").as("emb2"))
    tvBySource(hist(v1), hist(v2))
      .select($"source".as("label"), $"n1_docs".as("n1_vecs"),
        $"n2_docs".as("n2_vecs"), $"tv_num", $"tv")
  }

  val q149Oracle: String = {
    def side(pred: String, vexpr: String): String = {
      val ccos = Similarity.ivfAssignCos("v.emb2")
      s"""SELECT label, cell FROM (
         |    SELECT v.label, c.cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY $ccos DESC, c.cell) AS arn
         |    FROM (SELECT vec_id, label, $vexpr AS emb2 FROM embeddings WHERE $pred) v
         |    CROSS JOIN cent c)
         |  WHERE arn = 1""".stripMargin
    }
    s"""WITH ${Similarity.ivfCentCte},
       |a1 AS (
       |  ${side("vec_id % 5 <> 0", "embedding")}),
       |a2 AS (
       |  ${side("vec_id % 9 <> 0",
            "CASE WHEN vec_id % 7 = 0 THEN list_reverse(embedding) ELSE embedding END")}),
       |h1 AS (
       |  SELECT CAST(label AS BIGINT) AS source, cell AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS c1
       |  FROM a1 GROUP BY 1, 2),
       |h2 AS (
       |  SELECT CAST(label AS BIGINT) AS source, cell AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS c2
       |  FROM a2 GROUP BY 1, 2),
       |j AS (
       |  SELECT COALESCE(h1.source, h2.source) AS source,
       |    COALESCE(h1.bucket, h2.bucket) AS bucket,
       |    COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
       |  FROM h1 FULL OUTER JOIN h2
       |    ON h1.source = h2.source AND h1.bucket = h2.bucket),
       |totals AS (
       |  SELECT source, CAST(SUM(c1) AS BIGINT) AS n1_docs,
       |    CAST(SUM(c2) AS BIGINT) AS n2_docs
       |  FROM j GROUP BY source)
       |SELECT j.source AS label, t.n1_docs AS n1_vecs, t.n2_docs AS n2_vecs,
       |  CAST(SUM(abs(c1 * t.n2_docs - c2 * t.n1_docs)) AS BIGINT) AS tv_num,
       |  CASE WHEN t.n1_docs = 0 OR t.n2_docs = 0 THEN 1.0::DOUBLE
       |       ELSE CAST(CAST(SUM(abs(c1 * t.n2_docs - c2 * t.n1_docs)) AS BIGINT) AS DOUBLE)
       |            / (2.0::DOUBLE * t.n1_docs * t.n2_docs) END AS tv
       |FROM j JOIN totals t USING (source)
       |GROUP BY j.source, t.n1_docs, t.n2_docs
       |ORDER BY label""".stripMargin
  }

  // ---------------------------------------------------------------- q164
  /** The release manifest maintained INCREMENTALLY (VERDICT r10 #7 —
    * q113's incremental-vs-rescan identity applied to the capstone):
    * manifest(v2) is derived from manifest(v1) plus the q96-shaped diff,
    * while the ORACLE rescans v2 directly, so the hash-match is a
    * machine-checked proof that incremental maintenance equals rescan at
    * MANIFEST granularity.
    *
    * The decomposition unit is the SOURCE: every manifest column (per-doc
    * eligibility, hash split, per-source md5-ordered shard packing) is a
    * function of one source's docs alone, so a source with zero diff rows
    * carries its manifest(v1) rows forward VERBATIM, and only touched
    * sources recompute — the real nightly-release economics, where a
    * steady-state diff touches a handful of sources and the rebuild cost
    * is ∝ touched data, not corpus size. (Corpus-GLOBAL stages — dedup
    * clusters, transitive decontamination — are deliberately outside this
    * manifest: they are standing assets maintained by their own
    * incremental jobs (q72/S8/q110), consumed upstream of the release
    * carve; folding them in would make source-local carry-forward
    * unsound, which is exactly why q115's full composition stays a
    * rescan job.)
    *
    * The carve routes edits by source (ascii of the source's last char
    * mod 3): group 0 sources GAIN their doc_id % 11 = 0 docs (absent
    * from v1), group 1 sources lose doc_id % 7 = 0 docs and edit
    * doc_id % 3 = 0 docs, group 2 sources are untouched — all four diff
    * statuses occur, and the carry-forward path is non-vacuous. (The
    * fixture assigns source = src(doc_id % 20), so the per-class
    * moduli must be coprime with 20 or a class silently empties —
    * doc_id % 5 selected ZERO docs of any single source.)
    *
    * Scale shape: the diff is q96's ONE full-outer hash-join (64-byte
    * hashes shuffle, never text); `touched` is a ≤|sources|-row distinct
    * (broadcast to both manifest joins); the recompute scans only
    * touched sources' v2 rows; manifest(v1) is recomputed here for
    * self-containment (q113's discipline) but is the standing manifest
    * table in production — making the steady-state cost diff + touched,
    * not a corpus rescan. */
  private[graft] def manifestOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val m = docs.select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tokens"),
        (expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1))")
          - 1).as("b"),
        md5($"doc_id".cast("string")).as("rand_key"))
      .filter($"n_tokens" >= 32)
      .withColumn("split",
        when($"b" <= 12, "train").when($"b" <= 14, "val").otherwise("test"))
    val w = Window.partitionBy($"source").orderBy($"rand_key", $"doc_id")
    val train = m.filter($"split" === "train")
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("shard", expr("(cum_tokens - n_tokens) div 2048"))
      .select($"doc_id", $"shard", $"cum_tokens")
    m.join(train, Seq("doc_id"), "left")
      .select($"doc_id", $"source", $"split", $"n_tokens",
        coalesce($"shard", lit(-1L)).as("shard"),
        coalesce($"cum_tokens", lit(-1L)).as("cum_tokens"))
  }

  /** Sources holding at least one non-unchanged q96 diff row — the
    * pruning set the incremental job recomputes. NULL-text docs present
    * in both snapshots compare null-safe EQUAL: such a doc is ineligible
    * in every manifest, so either classification yields the same rows,
    * and unchanged skips a pointless source recompute. */
  private[graft] def diffTouchedSources(v1: DataFrame, v2: DataFrame)
      : DataFrame = {
    val s = v1.sparkSession
    import s.implicits._
    v1.select($"doc_id", $"source".as("s1"), lit(1L).as("in1"),
        sha2($"text", 256).as("h1"))
      .join(v2.select($"doc_id", $"source".as("s2"), lit(1L).as("in2"),
        sha2($"text", 256).as("h2")), Seq("doc_id"), "full_outer")
      .filter($"in1".isNull || $"in2".isNull || !($"h1" <=> $"h2"))
      .select(coalesce($"s2", $"s1").as("source")).distinct()
  }

  /** manifest(v1) carried forward for untouched sources ∪ recomputed
    * rows for touched ones — the incremental identity under test. */
  private[graft] def incrementalManifest(v1: DataFrame, v2: DataFrame)
      : DataFrame = {
    val s = v1.sparkSession
    import s.implicits._
    val touched = diffTouchedSources(v1, v2)
    manifestOf(v1).join(broadcast(touched), Seq("source"), "left_anti")
      .unionByName(manifestOf(
        v2.join(broadcast(touched), Seq("source"), "left_semi")))
      // the USING-join moved the key first; restore the manifest shape
      .select($"doc_id", $"source", $"split", $"n_tokens", $"shard",
        $"cum_tokens")
  }

  private[graft] def carveV164(docs: DataFrame): (DataFrame, DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    val srcmod = ascii(expr("right(source, 1)")) % 3
    val v1 = docs.filter(!(srcmod === 0 && $"doc_id" % 11 === 0))
      .select($"doc_id", $"source", $"text")
    val v2 = docs.filter(!(srcmod === 1 && $"doc_id" % 7 === 0))
      .select($"doc_id", $"source",
        when(srcmod === 1 && $"doc_id" % 3 === 0,
          concat($"text", lit(" rev2"))).otherwise($"text").as("text"))
    (v1, v2)
  }

  def q164IncrementalManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (v1, v2) = carveV164(
      Tables(s, dir, "documents").select($"doc_id", $"source", $"text"))
    incrementalManifest(v1, v2).orderBy($"doc_id")
  }

  /** The oracle is the DIRECT v2 manifest rescan — a different
    * computation than the incremental merge, so the hash-match proves
    * incremental == rescan (the q113 discipline, at manifest
    * granularity). */
  val q164Oracle: String =
    """WITH v2 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN (ascii(right(source, 1)) % 3) = 1 AND doc_id % 3 = 0
      |      THEN text || ' rev2' ELSE text END AS text
      |  FROM documents
      |  WHERE NOT ((ascii(right(source, 1)) % 3) = 1 AND doc_id % 7 = 0)),
      |m AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    strpos('0123456789abcdef',
      |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS b
      |  FROM v2),
      |elig AS (
      |  SELECT doc_id, source, n_tokens,
      |    CASE WHEN b <= 12 THEN 'train' WHEN b <= 14 THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM m WHERE n_tokens >= 32),
      |train AS (
      |  SELECT doc_id,
      |    CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
      |    (CAST(SUM(n_tokens) OVER w AS BIGINT) - n_tokens) // 2048 AS shard
      |  FROM elig WHERE split = 'train'
      |  WINDOW w AS (PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT e.doc_id, e.source, e.split, e.n_tokens,
      |  CAST(COALESCE(t.shard, -1) AS BIGINT) AS shard,
      |  CAST(COALESCE(t.cum_tokens, -1) AS BIGINT) AS cum_tokens
      |FROM elig e LEFT JOIN train t USING (doc_id)
      |ORDER BY e.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_snapshot_diff" -> q96SnapshotDiff _,
    "q113_incremental_card" -> q113IncrementalCard _,
    "q122_snapshot_drift" -> q122SnapshotDrift _,
    "q139_scd2_history" -> q139Scd2History _,
    "q149_embedding_drift" -> q149EmbeddingDrift _,
    "q164_incremental_manifest" -> q164IncrementalManifest _,
  )

  val oracles: Map[String, String] = Map(
    "q96_snapshot_diff" -> q96Oracle,
    "q113_incremental_card" -> q113Oracle,
    "q122_snapshot_drift" -> q122Oracle,
    "q139_scd2_history" -> q139Oracle,
    "q149_embedding_drift" -> q149Oracle,
    "q164_incremental_manifest" -> q164Oracle,
  )
}
