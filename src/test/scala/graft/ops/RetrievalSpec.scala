package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q94 hybrid retrieval semantics on a controlled corpus: BM25 term
  * weighting (rare beats common, tf saturates), RRF fusion (a doc found by
  * BOTH retrievers outranks single-retriever docs), and the full pipeline
  * against the driver fixture (shape + determinism).
  */
class RetrievalSpec extends SparkSpec {

  /** Corpus dir: one query doc (id 0 — ids < 10 are queries), corpus ids
    * ≥ 10. Doc 10 shares the RARE query term; doc 11 shares only a term
    * every doc has; doc 12 is lexically unrelated but its embedding is the
    * query's twin; doc 10's embedding is also near the query — doc 10 is
    * the both-retrievers doc and must win the fusion. */
  private def writeFixture(): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-ret-").toString
    Seq(
      (0L, "zylophant common alpha beta"), // the query doc
      (10L, "zylophant common gamma delta"), // rare-term + vector match
      (11L, "common epsilon zeta eta"), // common-term only
      (12L, "unrelated words entirely here"), // vector-only match
      (13L, "more unrelated filler text"),
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (0L, vec(1, 0, 0, 0), 0),
      (10L, vec(0.9, 0.1, 0, 0), 0), // near the query
      (11L, vec(0, 1, 0, 0), 0), // orthogonal
      (12L, vec(1, 0.01, 0, 0), 0), // nearest of all
      (13L, vec(0, 0, 1, 0), 0),
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$root/embeddings.parquet")
    root
  }

  test("RRF: the doc found by both retrievers wins; ranks are deterministic") {
    val dir = writeFixture()
    val out = Retrieval.q94HybridRetrieval(spark, dir).collect()
    val q0 = out.filter(_.getLong(0) == 0L)
    assert(q0.nonEmpty)
    val top = q0.minBy(_.getLong(1))
    // doc 10: lexical hit (rare term zylophant + common) AND vector rank 2
    assert(top.getLong(2) === 10L,
      s"both-retrievers doc should fuse on top, got ${top.getLong(2)}")
    // its rrf must be the two-term sum, strictly above any single-term doc
    val rrf = q0.map(r => r.getLong(2) -> r.getDouble(5)).toMap
    assert(rrf(10L) > rrf.filter(_._1 != 10L).values.max)
  }

  test("BM25: rare-term doc outranks common-term doc lexically") {
    val s = spark
    import s.implicits._
    val dir = writeFixture()
    val out = Retrieval.q94HybridRetrieval(s, dir)
      .filter($"q_id" === 0L && $"lex_rank".isNotNull)
      .select($"doc_id", $"lex_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 10 (zylophant, df=2) must outrank doc 11 (common, df=3)
    assert(out(10L) < out(11L),
      s"rare-term doc must rank above common-term doc: $out")
  }

  test("fixture run: 5 per query, rrf descending within query, no self-hit") {
    val s = spark
    import s.implicits._
    val rows = Retrieval.q94HybridRetrieval(s, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 10)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 5)
      assert(!rs.exists(_.getLong(2) == qid), s"query $qid retrieved itself")
      val rrfs = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q114 quality gate: 5 families x 10 queries, metric invariants, fusion lifts relevance") {
    val s = spark
    import s.implicits._
    val rows = Retrieval.q114RetrievalQuality(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 50)
    assert(rows.map(_._1).distinct.sorted ===
      Seq("hybrid_brute", "hybrid_ivf", "hybrid_lsh", "hybrid_sq", "lexical"))
    rows.foreach { case (fam, q, nRel, firstRel) =>
      assert(nRel >= 0L && nRel <= 5L, s"$fam q$q")
      assert(firstRel >= 0L && firstRel <= 5L, s"$fam q$q")
      // first_rel = 0 exactly when nothing in the top-5 was relevant
      assert((firstRel == 0L) === (nRel == 0L), s"$fam q$q")
    }
    // the seam's point, measured: every query's brute-hybrid top-5 holds
    // ≥ 1 cosine-relevant doc (the vector retriever IS a truth prefix),
    // and fusion strictly lifts total relevance over lexical-only on the
    // fixture corpus
    val byFam = rows.groupBy(_._1)
    assert(byFam("hybrid_brute").forall(_._3 >= 1L))
    assert(byFam("hybrid_brute").map(_._3).sum > byFam("lexical").map(_._3).sum)
    // SQ8's near-exact recall (q92: 1.0) must show up at the rank level
    // too: its hybrid matches the brute hybrid's total relevance
    assert(byFam("hybrid_sq").map(_._3).sum === byFam("hybrid_brute").map(_._3).sum)
  }

  test("q116 LSH hybrid: seam invariants hold and the vector side is the LSH subplan") {
    val s = spark
    import s.implicits._
    val rows = Retrieval.q116HybridLsh(s, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 10)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 5)
      assert(!rs.exists(_.getLong(2) == qid), s"query $qid retrieved itself")
      val rrfs = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    }
    // every fused row with a vector rank came from the registered LSH
    // bucket subplan at depth K — the index is served, not re-derived
    val lshSet = Similarity.lshTopK(s, sf, 20)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(lshSet.contains((r.getLong(0), r.getLong(2))),
        s"fused vec candidate not from lshTopK: q${r.getLong(0)} doc${r.getLong(2)}")
    }
  }

  test("q124 SQ8 hybrid: seam invariants hold and the vector side is the SQ subplan") {
    val s = spark
    import s.implicits._
    val rows = Retrieval.q124HybridSq(s, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 10)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 5)
      assert(!rs.exists(_.getLong(2) == qid), s"query $qid retrieved itself")
      val rrfs = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    }
    // every fused row with a vector rank came from the registered SQ8
    // encode+ADC subplan at depth K — the index is served, not re-derived
    val sqSet = Similarity.sqTopK(s, sf, 20)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    rows.filter(!_.isNullAt(4)).foreach { r =>
      assert(sqSet.contains((r.getLong(0), r.getLong(2))),
        s"fused vec candidate not from sqTopK: q${r.getLong(0)} doc${r.getLong(2)}")
    }
  }

  test("q127 MMR: greedy chain matches an independent Scala recompute") {
    val s = spark
    import s.implicits._
    val got = Retrieval.q127MmrRerank(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent recompute with the same fold discipline (left fold,
    // 0.0 seed — VecFns.dot's contract), plain Scala collections
    val embs = graft.Tables(s, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    for (q <- 0L until 10L) {
      val cand = embs.keys.filter(_ != q).toSeq
        .map(v => v -> cos(embs(q), embs(v)))
        .sortBy { case (v, c) => (-c, v) }.take(20)
      var selected = List.empty[Long]
      for (step <- 1 to 3) {
        val pick = cand.filter { case (v, _) => !selected.contains(v) }
          .map { case (v, rel) =>
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.map(sv => cos(embs(v), embs(sv))).max
            (v, rel - maxSim)
          }
          .minBy { case (v, sc) => (-sc, v) }._1
        assert(got((q, step.toLong)) === pick, s"q$q step $step")
        selected ::= pick
      }
    }
  }

  test("q138 trend: roll-up invariants, delta rows equal v2 minus v1, deterministic") {
    val s = spark
    import s.implicits._
    val rows = Retrieval.q138RetrievalTrend(s, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // 3 snapshot labels × 2 families
    assert(rows.map(r => (r._1, r._2)).toSet ===
      (for (sn <- Set("v1", "v2", "delta"); f <- Set("hybrid_brute", "lexical"))
        yield (sn, f)))
    val byKey = rows.map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    Seq("hybrid_brute", "lexical").foreach { f =>
      val (s1, h1, m1, q1) = byKey(("v1", f))
      val (s2, h2, m2, q2) = byKey(("v2", f))
      assert(byKey(("delta", f)) === ((s2 - s1, h2 - h1, m2 - m1, q2 - q1)),
        s"delta row is not v2 - v1 for $f")
      // gate ingredient invariants per snapshot: ≤ 10 probes graded, at
      // most 5 relevant per query, first-hit + miss partition ≤ n_queries
      Seq((s1, h1, m1, q1), (s2, h2, m2, q2)).foreach { case (sr, hh, mm, qq) =>
        assert(qq >= 1L && qq <= 10L)
        assert(sr >= 0L && sr <= 5L * qq)
        assert(hh >= 0L && mm >= 0L && hh + mm <= qq)
      }
    }
    // pure-function determinism: a second full build lands identical rows
    val again = Retrieval.q138RetrievalTrend(s, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(again === rows)
  }

  test("q127 MMR: a near-duplicate of the top pick is passed over for diversity") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-mmr-").toString
    Seq((0L, "q"), (10L, "a"), (11L, "a dup"), (12L, "b"), (13L, "c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$root/documents.parquet")
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (0L, vec(1, 0, 0, 0), 0), // the query
      (10L, vec(0.99, 0.01, 0, 0), 0), // most relevant
      (11L, vec(0.99, 0.011, 0, 0), 0), // its near-twin: 2nd by relevance
      (12L, vec(0.6, -0.8, 0, 0), 0), // diverse, still relevant
      (13L, vec(0, 0, 1, 0), 0), // irrelevant, orthogonal to everything
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$root/embeddings.parquet")
    val sel = Retrieval.q127MmrRerank(s, root)
      .filter($"q_id" === 0L).orderBy($"sel_rank")
      .select($"doc_id").as[Long].collect().toSeq
    // relevance order is 10, 11, 12, 13 — but the twin (11) scores
    // rel − maxsim ≈ 0 − 1 at every step after 10 is taken, so MMR
    // passes over it for the diverse doc 12, then the novel doc 13:
    // the twin never enters the selected context at all
    assert(sel === Seq(10L, 12L, 13L), s"got $sel")
  }

  test("q143 packing invariants: running sum, budget line, single partial fit") {
    val s = spark
    import s.implicits._
    val rows = Retrieval.q143ContextAssembly(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      // cum_tokens is the exact prefix sum of dl in rank order
      assert(sorted.map(_._4).scanLeft(0L)(_ + _).tail.toSeq ===
        sorted.map(_._5).toSeq, s"q$q prefix sum")
      // included ⇔ under budget; fit = dl while included
      sorted.foreach { case (_, rank, _, dl, cum, inc, fit) =>
        assert(inc === (cum <= 512L), s"q$q rank$rank included flag")
        if (inc) assert(fit === dl, s"q$q rank$rank fit≠dl")
      }
      // the packed context never exceeds the budget, and at most ONE row
      // is partially fit (the head-truncated overflow doc)
      assert(sorted.map(_._7).sum <= 512L, s"q$q over budget")
      assert(sorted.count(r => r._7 > 0 && r._7 < r._4) <= 1, s"q$q partial fits")
      // packing is prefix-shaped: once fit hits 0 it stays 0
      val fits = sorted.map(_._7)
      assert(fits.dropWhile(_ > 0).forall(_ == 0L), s"q$q not prefix-shaped")
    }
  }
}
