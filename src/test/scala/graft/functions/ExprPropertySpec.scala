package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks of the custom expressions against independent
  * reimplementations (different arithmetic formulation, so a shared bug in
  * the production code can't hide).
  */
class ExprPropertySpec extends AnyFunSuite {

  /** djb2 with JS semantics, reimplemented over BigInt (no reliance on the
    * production code's Long/Int wrap trick). */
  private def djb2Ref(s: String): BigInt = {
    val two32 = BigInt(1) << 32
    val two31 = BigInt(1) << 31
    def toInt32(x: BigInt): BigInt = {
      val m = x.mod(two32)
      if (m >= two31) m - two32 else m
    }
    var h = BigInt(5381)
    for (c <- s) h = toInt32(toInt32(h) * 32) + h + BigInt(c.toInt)
    h.abs
  }

  test("Djb2.hash matches an independent BigInt formulation on random strings") {
    val rnd = new scala.util.Random(7)
    val cases = Seq("", "a", "\u0000", "ünïcødé-λ測試", "x" * 2000) ++
      (1 to 300).map(_ => rnd.alphanumeric.take(rnd.nextInt(120)).mkString) ++
      (1 to 100).map(_ => (1 to rnd.nextInt(40)).map(_ => rnd.nextPrintableChar()).mkString)
    for (s <- cases)
      assert(BigInt(Djb2.hash(s)) === djb2Ref(s), s"input=${s.take(40)}")
  }

  test("ShingleHashes: count and values match sliding-window djb2 on random token lists") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString))
    }
    val out = rows.toDF("id", "toks")
      .select($"id", HashFns.shingleHashes($"toks", 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, toks) <- rows) {
      val expected =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(w => Djb2.hash(w.mkString(" "))).toSeq
      assert(out(id) === expected, s"toks=$toks")
    }
  }

  test("MinHash: sig(A ∪ B) is the element-wise min of sig(A), sig(B)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val a = (1 to 60).map(_ => rnd.alphanumeric.take(6).mkString)
    val b = (1 to 60).map(_ => rnd.alphanumeric.take(6).mkString)
    val df = Seq((1L, a), (2L, b), (3L, a ++ b)).toDF("id", "shs")
    val sigs = df.select($"id", HashFns.minhash($"shs", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = sigs(1L).zip(sigs(2L)).map { case (x, y) => math.min(x, y) }
    assert(sigs(3L) === expected)
    assert(sigs(3L).forall(v => v >= 0 && v < HashFns.MinHashP))
  }

  test("SimHash is invariant under multiset doubling and bounded to 32 bits") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val toks = (1 to 40).map(_ => rnd.alphanumeric.take(5).mkString)
    val df = Seq((1L, toks), (2L, toks ++ toks)).toDF("id", "toks")
    val out = df.select($"id", HashFns.simhash32($"toks").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === out(2L)) // doubling every count preserves all signs
    assert(out(1L) >= 0 && out(1L) < (1L << 32))
  }

  test("DotProd matches a plain Scala double fold on random float vectors") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1 to 30).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val out = rows.toDF("id", "a", "b")
      .select($"id", VecFns.dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, a, b) <- rows) {
      var acc = 0.0
      for (i <- 0 until 64) acc += a(i).toDouble * b(i).toDouble
      assert(out(id) === acc, s"id=$id") // bit-exact, same fold order
    }
  }

  test("GatherSum matches the interpreted element_at fold on random tables") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 40).map { i =>
      val table = Seq.fill(8)(Seq.fill(1 + rnd.nextInt(16))(rnd.nextDouble() - 0.5))
      val codes = table.map(row => rnd.nextInt(row.length).toLong)
      (i.toLong, codes, table)
    }
    val out = rows.toDF("id", "codes", "table")
      .select($"id", GatherSum.column($"codes", $"table").as("g"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, codes, table) <- rows) {
      var acc = 0.0
      for (m <- 0 until 8) acc += table(m)(codes(m).toInt)
      assert(out(id) === acc, s"id=$id") // bit-exact, same fold order
    }
  }

  test("PqEncodeUtil.encode: argmin-L2 against a brute-force reimplementation") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 50) {
      val cb: Array[Array[Array[Double]]] = Array.fill(4)(
        Array.fill(1 + rnd.nextInt(8))(Array.fill(4)(rnd.nextDouble() - 0.5)))
      val v = Array.fill(16)(rnd.nextFloat() - 0.5f)
      val got = PqEncodeUtil.encode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), cb,
        isFloat = true).toLongArray().toSeq
      val want = (0 until 4).map { m =>
        val dists = cb(m).map { e =>
          (0 until 4).map(d => {
            val diff = v(m * 4 + d).toDouble - e(d); diff * diff
          }).sum
        }
        dists.zipWithIndex.minBy { case (dist, c) => (dist, c) }._2.toLong
      }
      assert(got === want)
    }
  }

  test("SqEncodeUtil.encode: quantize-clamp against an independent reimplementation") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 50) {
      val dims = 1 + rnd.nextInt(16)
      val mins = Array.fill(dims)(rnd.nextDouble() * 4 - 2)
      // mix real ranges with constant dims (range 0)
      val ranges = Array.fill(dims)(
        if (rnd.nextInt(4) == 0) 0.0 else rnd.nextDouble() * 3)
      // values both inside and outside the trained bounds (clamp paths)
      val v = Array.tabulate(dims)(d =>
        (mins(d) + (rnd.nextDouble() * 2 - 0.5) * (ranges(d) max 0.1)).toFloat)
      val got = SqEncodeUtil.encode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        mins, ranges, isFloat = true).toLongArray().toSeq
      val want = (0 until dims).map { d =>
        if (ranges(d) == 0.0) 0L
        else {
          val t = math.floor((v(d).toDouble - mins(d)) / ranges(d) * 255.0).toLong
          math.max(0L, math.min(255L, t))
        }
      }
      assert(got === want, s"mins=${mins.toSeq} ranges=${ranges.toSeq} v=${v.toSeq}")
    }
  }

  test("SimHash64: random token lists match an independent two-view recomputation") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(20)).map(_ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString))
    }
    val out = rows.toDF("id", "toks")
      .select($"id", HashFns.simhash64($"toks").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, toks) <- rows) {
      // independent recomputation straight from the published definition
      // (NOT via Djb2.raw/step, so the fold-sharing optimization is
      // checked against the slow path)
      val bal = new Array[Int](64)
      for (t <- toks; j <- 0 until 32) {
        if (((Djb2.hash(t) >> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
        if (((Djb2.hash(t + "#") >> j) & 1L) == 1L) bal(j + 32) += 1 else bal(j + 32) -= 1
      }
      val want = (0 until 64).foldLeft(0L)((acc, j) =>
        if (bal(j) > 0) acc | (1L << j) else acc)
      assert(out(id) === want, s"toks=$toks")
      // low half always equals the 32-bit sketch over the same tokens
    }
  }

  test("morton10: interleave round-trips through bit extraction on random points") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val pts = (1 to 100).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .select(graft.ops.Layout.morton10($"x", $"y").as("z"))
      .collect().map(_.getLong(0))
    pts.zip(got).foreach { case ((x, y), z) =>
      // de-interleave and compare — the curve must be invertible
      val dx = (0 until 10).foldLeft(0L)((a, i) => a | (((z >> (2 * i)) & 1L) << i))
      val dy = (0 until 10).foldLeft(0L)((a, i) => a | (((z >> (2 * i + 1)) & 1L) << i))
      assert((dx, dy) === ((x, y)), s"z=$z")
    }
  }
}
