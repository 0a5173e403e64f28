package graft.ops

import graft.SparkSpec

/** q73 PQ-ANN semantics: the encoder's argmin-L2 contract, the 32-bit
  * compression invariant, and ADC recall against the brute-force oracle.
  */
class SimilaritySpec extends SparkSpec {

  test("PqEncode picks the argmin-L2 entry per subspace (ties to lower code)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // 2 subspaces × 2 dims; entry 1 of subspace 0 is closer to (1,1);
    // subspace 1 has an exact tie → code 0 must win.
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(2.0, 2.0), Array(4.0, 4.0)))
    val v = new GenericArrayData(Array(0.9f, 1.1f, 3.0f, 3.0f))
    val codes = graft.functions.PqEncodeUtil.encode(v, cb, isFloat = true)
    assert(codes.toLongArray().toSeq === Seq(1L, 0L))
  }

  test("q73: codes fit 4 bits each, packed code fits 32 bits — the 64× compression") {
    val s = spark
    import s.implicits._
    val rows = Similarity.q73AnnPq(s, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val p = r.getAs[Long]("code_packed"); p >= 0L && p < (1L << 32)
    })
  }

  test("q73: reported exact cos is truly exact, and ADC recall beats chance") {
    val s = spark
    import s.implicits._
    val brute = Similarity.q55AnnBrute(s, sf).filter($"rank" <= 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = Similarity.q73AnnPq(s, sf).collect()
    val pqPairs = pq.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    // the exact-cosine column must agree with q55's value for shared pairs
    val bruteCos = Similarity.q55AnnBrute(s, sf).collect()
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")), r.getAs[Double]("cos"))).toMap
    pq.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      bruteCos.get(key).foreach { c =>
        assert(c === r.getAs[Double]("cos"), s"exact cos mismatch at $key")
      }
    }
    // recall@3 of a 32-bit code + 64-candidate ADC pool over 500 vectors:
    // measured 21/30 here (16/30 at sf0.01) vs a ~0.6% random baseline;
    // the deterministic planes give a fixed value on this fixture — pin a
    // conservative floor so codebook regressions show up loudly.
    // (Production widens to 64/128-bit codes — the q65 width-caveat story.)
    val recall = (brute & pqPairs).size.toDouble / brute.size
    assert(recall >= 0.5, s"ADC recall@3 collapsed: $recall")
    // and the ADC ordering itself is deterministic across runs
    val again = Similarity.q73AnnPq(s, sf).collect()
    assert(pq.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
