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

  test("q139 SCD2 runs equal an independent per-doc fold of the carve") {
    val s = spark
    import s.implicits._
    // Independent ground truth: fold each doc's snapshot series in plain
    // Scala (presence carve + edit rules + sha256), derive version runs
    // with the same islands rule, and demand exact equality.
    def sha(t: String): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = graft.Tables(s, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val t2 = if (id % 13 == 0) text + " rev2" else text
      val t3 = if (id % 11 == 0) t2 + " rev3" else t2
      val present = Seq(
        (1L, text, id % 7 != 0), (2L, t2, id % 17 != 0), (3L, t3, id % 19 != 0))
        .collect { case (snapN, t, true) => (snapN, sha(t)) }
      // islands: new run on first row, hash change, or snapshot gap
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      present.foreach { case (snapN, h) =>
        runs.lastOption match {
          case Some((from, to, ph)) if ph == h && to == snapN - 1 =>
            runs(runs.length - 1) = (from, snapN, h)
          case _ => runs += ((snapN, snapN, h))
        }
      }
      runs.zipWithIndex.map { case ((from, to, h), i) =>
        (id, (i + 1).toLong, from, to, to == 3L, h)
      }
    }.sortBy(r => (r._1, r._3))
    val got = Versioning.q139Scd2History(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getString(5)))
    assert(got.toSeq === expected.toSeq)
    // the carve exercises every interesting shape on the fixture id space:
    // a presence gap (two runs, same or different hash) and an edit split
    val byDoc = expected.groupBy(_._1)
    assert(byDoc.values.exists(_.length >= 2), "no multi-run doc in fixture")
    assert(expected.exists { case (id, _, from, to, _, _) =>
      id % 17 == 0 && to < 3 && from == 1 }, "no gap-terminated run")
  }

  test("q164 incremental manifest == direct rescan across all four diff statuses") {
    val s = spark
    import s.implicits._
    // sources chosen by last-char class: s0 → group 0 (gains), s1 →
    // group 1 (loses/edits), s2 → group 2 (untouched carry-forward).
    // 40 tokens clears the eligibility gate; 7 does not.
    def toks(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (11L, "s0", toks(40, "a")),   // group 0, %11: ADDED in v2
      (3L,  "s0", toks(40, "b")),   // group 0: unchanged
      (7L,  "s1", toks(40, "c")),   // group 1, %7: REMOVED in v2
      (6L,  "s1", toks(40, "d")),   // group 1, %3: CHANGED in v2
      (8L,  "s1", toks(40, "e")),   // group 1: unchanged
      (2L,  "s2", toks(40, "f")),   // group 2: carried forward verbatim
      (22L, "s2", toks(7, "g")),    // group 2: ineligible everywhere
      (4L,  "s2", null)             // NULL text: ineligible, unchanged
    ).toDF("doc_id", "source", "text")
    val (v1, v2) = Versioning.carveV164(docs)
    // the carve really produces all four statuses
    val ids1 = v1.select($"doc_id").as[Long].collect().toSet
    val ids2 = v2.select($"doc_id").as[Long].collect().toSet
    assert(!ids1.contains(11L) && ids2.contains(11L), "added")
    assert(ids1.contains(7L) && !ids2.contains(7L), "removed")
    assert(v2.filter($"doc_id" === 6L).select($"text").as[String].head()
      .endsWith(" rev2"), "changed")
    assert(ids1.contains(3L) && ids2.contains(3L), "unchanged present")
    // the pruning set is derived from the diff, not the carve: only the
    // sources holding a non-unchanged row recompute
    val touched = Versioning.diffTouchedSources(v1, v2)
      .as[String].collect().toSet
    assert(touched === Set("s0", "s1"), s"touched = $touched")
    // the identity: carry-forward ∪ recompute equals the direct rescan
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val inc = key(Versioning.incrementalManifest(v1, v2))
    val direct = key(Versioning.manifestOf(v2))
    assert(inc === direct)
    // the untouched source's rows came through (and the short/null docs
    // of every group stayed out)
    assert(inc.exists(_._2 == "s2"))
    assert(!inc.exists(r => r._1 == 22L || r._1 == 4L || r._1 == 7L))
  }

  test("q149 embedding drift: carve masses, TV bounds, the re-embed moves cells") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rows = Versioning.q149EmbeddingDrift(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // per-label snapshot masses equal the carve counts, independently
    val emb = graft.Tables(s, sf, "embeddings")
    val n1 = emb.filter($"vec_id" % 5 =!= 0).groupBy($"label".cast("long"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n2 = emb.filter($"vec_id" % 9 =!= 0).groupBy($"label".cast("long"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (label, v1, v2, _, tv) =>
      assert(v1 === n1(label) && v2 === n2(label), s"label $label masses")
      assert(tv >= 0.0 && tv <= 1.0, s"label $label tv out of bounds")
    }
    // the modeled re-embed (reversal of % 7 vectors) must actually move
    // SOME vectors across cells — otherwise the fixture tests nothing
    val (cells, mats) = Similarity.cachedCentroidMeta(s, sf)
    def cellOf(c: org.apache.spark.sql.Column) =
      element_at(graft.functions.NearestCellsUtil.column(c, cells, mats, 1), 1)
    val moved = emb.filter($"vec_id" % 7 === 0)
      .select(cellOf($"embedding").as("a"), cellOf(reverse($"embedding")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(moved > 0, "reversal moved no vector across cells")
    // and the gate sees it: at least one label reads tv > 0
    assert(rows.exists(_._5 > 0.0), "no label shows drift")
  }
}
