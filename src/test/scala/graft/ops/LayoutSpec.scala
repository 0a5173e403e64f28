package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q98 Z-order layout: the Morton interleave is bit-exact, and the tiling
  * delivers the bounded-bbox locality that makes min/max stats prune on
  * both dimensions.
  */
class LayoutSpec extends SparkSpec {

  test("morton10 interleave matches a hand bit-interleave") {
    val s = spark
    import s.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (682L, 341L), (513L, 7L))
    val got = cases.toDF("x", "y")
      .select(Layout.morton10($"x", $"y").as("z")).collect().map(_.getLong(0))
    assert(got.toSeq === cases.map { case (x, y) => ref(x, y) })
    // the canonical small values: (x=1,y=0)→1, (x=0,y=1)→2, (x=1,y=1)→3
    assert(ref(1, 0) === 1L && ref(0, 1) === 2L && ref(1, 1) === 3L)
  }

  test("every 4096-key tile bounds a 64x64 block on the fixture") {
    val s = spark
    import s.implicits._
    val rows = Layout.q98ZorderLayout(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val area = r.getLong(6)
      assert(area <= 64L * 64L, s"tile ${r.getLong(0)} bbox $area exceeds 64x64")
      // bbox edges stay inside one 64-aligned block per dimension
      assert(r.getLong(2) / 64 === r.getLong(3) / 64, "x range crosses a block")
      assert(r.getLong(4) / 64 === r.getLong(5) / 64, "y range crosses a block")
    }
  }

  test("q192 range planner: a partition of the rows, ranges disjoint and " +
      "ordered, no key split, local replay agrees") {
    val s = spark
    import s.implicits._
    val rows = Layout.q192RangePlanner(s, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length === 32)
    assert(rows.map(_._1).toSeq === (0L until 32L))
    val ev = graft.Tables(s, sf, "events")
      .select($"user_id").as[Long].collect()
    // partition of the rows: counts sum to N; empty ranges carry NULLs
    assert(rows.map(_._4).sum === ev.length)
    rows.foreach { case (pid, lo, hi, n, _, _) =>
      assert((n == 0) === lo.isEmpty && lo.isEmpty === hi.isEmpty, s"pid $pid")
      lo.zip(hi).foreach { case (l, h) => assert(l <= h, s"pid $pid") }
    }
    // ranges are ordered and disjoint: hi of one nonempty range < lo of
    // the next — and therefore no key appears in two ranges
    val nonEmpty = rows.filter(_._4 > 0)
    nonEmpty.sliding(2).foreach {
      case Array((p1, _, Some(h1), _, _, _), (p2, Some(l2), _, _, _, _)) =>
        assert(h1 < l2, s"ranges $p1/$p2 overlap")
      case _ =>
    }
    // local replay of the exact planner arithmetic
    val n = ev.length.toLong
    val keyCnt = ev.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val sortedKeys = keyCnt.keys.toSeq.sorted
    val cum = sortedKeys.scanLeft(0L)((a, k) => a + keyCnt(k)).tail
      .zip(sortedKeys).map { case (c, k) => k -> c }.toMap
    val bounds = (1 until 32).flatMap { i =>
      val t = i * n / 32
      sortedKeys.find(k => cum(k) >= t + 1)
    }
    def pid(k: Long): Long = bounds.count(_ <= k).toLong
    val expect = sortedKeys.groupBy(pid).view
      .mapValues(ks => ks.map(keyCnt).sum).toMap
    rows.foreach { case (p, _, _, nr, ideal, skew) =>
      assert(expect.getOrElse(p, 0L) === nr, s"pid $p count")
      assert(ideal === n / 32)
      assert(skew === 1000L * nr * 32 / n, s"pid $p skew")
    }
    // the audit must surface real structural skew on this fixture:
    // duplicated boundary keys make at least one range over- or
    // under-shoot perfect balance
    assert(rows.exists(r => r._6 != 1000L), "fixture skew degenerate")
  }

  test("q197 selectivity: actuals exact, estimates within the " +
      "half-straddling-bin bound, last predicate covers everything") {
    val s = spark
    import s.implicits._
    val rows = Layout.q197Selectivity(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length === 20)
    val prices = graft.Tables(s, sf, "lineitem")
      .select($"l_extendedprice").as[Double].collect()
    val (mn, mx) = (prices.min, prices.max)
    def bin(v: Double): Long =
      math.min(math.floor((v - mn) * 4096 / (mx - mn)).toLong, 4095L)
    var prevActual = -1L
    rows.foreach { case (k, tMilli, est, actual, err) =>
      // the SAME IEEE double expression as both engines
      val t = mn + (k.toDouble * (mx - mn)) / 20.0
      assert(tMilli === math.floor(t * 1000).toLong, s"k=$k threshold")
      assert(actual === prices.count(_ <= t).toLong, s"k=$k actual")
      // half-bucket rule: the estimate can miss only inside the
      // straddling bin, by at most ceil(straddle/2)
      val straddle = prices.count(bin(_) == bin(t)).toLong
      assert(math.abs(est - actual) <= (straddle + 1) / 2,
        s"k=$k est $est vs actual $actual (straddle $straddle)")
      assert(err === 1000 * (est - actual) / math.max(actual, 1), s"k=$k err")
      assert(actual >= prevActual, "actuals must be monotone in k")
      prevActual = actual
    }
    assert(rows.last._4 === prices.length.toLong,
      "threshold 20 = max must cover every row")
  }

  test("q198 correlated selectivity: actuals exact; the correlated fixture " +
      "breaks independence while the min rule tracks") {
    val s = spark
    import s.implicits._
    val rows = Layout.q198CorrelatedSelectivity(s, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))))
      .toMap
    assert(rows.size === 16)
    val d = graft.Tables(s, sf, "documents").filter($"text".isNotNull)
      .select($"n_chars".cast("double"),
        size(split($"text", " ")).cast("double"))
      .as[(Double, Double)].collect()
    val (mnx, mxx) = (d.map(_._1).min, d.map(_._1).max)
    val (mny, mxy) = (d.map(_._2).min, d.map(_._2).max)
    for { i <- 1 to 4; j <- 1 to 4 } {
      val (tx, ty) = (mnx + (i.toDouble * (mxx - mnx)) / 4.0,
        mny + (j.toDouble * (mxy - mny)) / 4.0)
      val truth = d.count { case (x, y) => x <= tx && y <= ty }.toLong
      assert(rows((i.toLong, j.toLong))._3 === truth, s"($i,$j) actual")
    }
    // n_chars and token count are correlated by construction: at least
    // one cell must show the independence product badly wrong while the
    // min rule stays within 5% everywhere
    assert(rows.values.exists { case (_, _, _, ei, _) => math.abs(ei) > 200 },
      "fixture failed to expose the independence error")
    rows.foreach { case (k, (_, _, _, _, em)) =>
      assert(math.abs(em) <= 50, s"$k min-rule error $em")
    }
  }

  test("q199 join cardinality: exact counts verified locally; the " +
      "System-R rule is exact on FK edges and underestimates the skewed " +
      "self-join by the second frequency moment") {
    val s = spark
    import s.implicits._
    val rows = Layout.q199JoinCardinality(s, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rows.size === 9)
    // est formula is the published rule, recomputed locally per edge
    rows.foreach { case (e, (nl, nr, dl, dr, est, exact, err)) =>
      assert(est === nl * nr / math.max(dl, dr), s"$e est formula")
      assert(err === 1000 * (est - exact) / math.max(exact, 1), s"$e err")
    }
    // local exact-count replay for the skewed self-join: Σ n(v)²
    val counts = graft.Tables(s, sf, "documents")
      .groupBy($"n_chars").count().as[(Long, Long)].collect()
    val selfExact = counts.map { case (_, n) => n * n }.sum
    val (_, _, _, _, selfEst, gotExact, selfErr) = rows("documents_chars_self")
    assert(gotExact === selfExact, "self-join exact must equal Σ n(v)²")
    assert(selfErr < -100,
      s"skewed self-join must underestimate well beyond noise, got $selfErr")
    assert(selfEst < selfExact)
    // clean FK edges: containment + uniformity hold, the rule is exact
    Seq("customer_nation", "nation_region", "supplier_nation").foreach { e =>
      assert(rows(e)._7 === 0L, s"$e should estimate exactly on clean FKs")
    }
  }

  test("q200 ndv sketch: the KMV hash is a bijection, the exact path " +
      "fires below K, the estimator replays locally, and multiplicity " +
      "is invisible") {
    val s = spark
    import s.implicits._
    // bijectivity of the affine-mod-P hash on a dense probe range: no
    // two inputs collide (mod-prime affine maps are invertible)
    val probe = (0L until 50000L).toDF("v")
      .selectExpr(Layout.kmvHashSql("v") + " as h")
      .agg(countDistinct($"h")).as[Long].head()
    assert(probe === 50000L, "affine-mod-prime hash must not collide")
    val rows = Layout.q200NdvSketch(s, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.size === 7)
    rows.foreach { case (c, (exact, m, hk, est, err)) =>
      // the sketch never holds more than K rows, and the estimate and
      // error replay through the shared local formula
      assert(m <= 1024L, s"$c sketch exceeded K")
      assert(est === Layout.kmvEstimate(m, hk), s"$c estimator replay")
      assert(err === 1000 * (est - exact) / math.max(exact, 1), s"$c err")
      // below K the sketch is exhaustive: bijective hashes make the
      // estimate EXACT, not approximate
      if (exact < 1024L) assert(est === exact, s"$c exact path")
      else assert(math.abs(err) <= 100,
        s"$c estimator outside 10% on a uniform column, err $err")
    }
    // multiplicity-immunity: n_chars repeats across documents, yet the
    // sketch sees only distinct values — est equals the true ndv even
    // though a 1024-ROW sample of the column would be dominated by the
    // heavy values (the reason catalogs sketch hashes, not rows)
    val (nchExact, _, _, nchEst, _) = rows("documents.n_chars")
    assert(nchEst === nchExact)
  }

  test("q201 join-order audit: the cost-model ranking matches the exact " +
      "ranking, dimension-first wins, and the costs replay locally") {
    val s = spark
    import s.implicits._
    val rows = Layout.q201JoinOrderAudit(s, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.size === 4)
    // the cost model must rank every profile exactly as the truth does
    rows.foreach { case (o, (_, _, _, er, xr, m)) =>
      assert(m === 1L, s"$o est_rank $er != exact_rank $xr")
    }
    // dimension-first is the true and the chosen optimum; fact⋈fact
    // first is the true and the estimated worst
    assert(rows("N.C.O.L")._4 === 1L && rows("N.C.O.L")._5 === 1L)
    assert(rows("O.L.C.N")._4 === 4L && rows("O.L.C.N")._5 === 4L)
    // local replay of the N.C.O.L cascade from base-table stats
    def nd(t: String, k: String): (Long, Long) = {
      val df = graft.Tables(s, sf, t)
      (df.count(), df.select(k).distinct().count())
    }
    val (nN, dN) = nd("nation", "n_nationkey")
    val (nC, dC) = nd("customer", "c_nationkey")
    val (nO, dO) = nd("orders", "o_custkey")
    val e2 = nN * nC / math.max(dN, dC)
    val dCu = graft.Tables(s, sf, "customer")
      .select($"c_custkey").distinct().count()
    val e3 = e2 * nO / math.max(dCu, dO)
    assert(rows("N.C.O.L")._1 === e2 + e3, "N.C.O.L cascade replay")
    // the spread between best and worst is the value of reordering —
    // materially more than rounding (>= 2x on this chain at any SF)
    assert(rows("O.L.C.N")._2 >= 2 * rows("N.C.O.L")._2)
  }

  test("q202 zone maps: read superset of match, natural layout prunes " +
      "nothing, sorted prunes only its own dimension, z-order prunes both") {
    val s = spark
    import s.implicits._
    val rows = Layout.q202ZoneMapAudit(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(rows.size === 30)
    rows.foreach { case ((l, k), (_, read, m, fp, skip)) =>
      // zone maps may read too much, never too little
      assert(m <= read && read <= 64, s"$l/$k read/match sanity")
      assert(fp === read - m && fp >= 0, s"$l/$k false_pos")
      assert(skip === 1000 * (64 - read) / 64, s"$l/$k skip formula")
    }
    def skips(l: String, c: String) =
      rows.collect { case ((`l`, _), (`c`, _, _, _, sk)) => sk }
    // insertion order interleaves both domains into every file
    assert(skips("natural", "p").forall(_ === 0L))
    assert(skips("natural", "d").forall(_ === 0L))
    // a price sort makes price zones tight and shreds the date zones
    assert(skips("sorted", "p").forall(_ >= 500L),
      s"sorted layout must skip most files on its sort column")
    assert(skips("sorted", "d").forall(_ <= 100L),
      s"sorted layout cannot prune the shredded dimension")
    // the Morton tiling bounds BOTH dimensions (the q98 bbox argument,
    // priced in files)
    assert(skips("zorder", "p").forall(_ >= 400L))
    assert(skips("zorder", "d").forall(_ >= 400L))
  }

  test("q203 MCV estimation: k=0 reproduces q199's skew underestimate, " +
      "error shrinks monotonically in k, and the estimator replays " +
      "locally") {
    val s = spark
    import s.implicits._
    val rows = Layout.q203McvEstimation(s, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet === Set(0L, 8L, 32L, 128L))
    val exact = rows(0L)._2
    assert(rows.values.forall(_._2 === exact), "one truth for all k")
    // k = 0 is exactly q199's plain containment rule on the self-join:
    // underestimates well beyond noise on the skewed attribute
    assert(rows(0L)._3 < -100, s"k=0 must reproduce the skew gap")
    // MCV slots buy error: |err| non-increasing in k, near-exact at 128
    val errs = Seq(0L, 8L, 32L, 128L).map(k => math.abs(rows(k)._3))
    assert(errs === errs.sorted.reverse, s"|err| must shrink in k: $errs")
    assert(errs.last <= 20, s"128 MCV slots must be near-exact: $errs")
    // local replay from the raw frequency table
    val counts = graft.Tables(s, sf, "documents")
      .groupBy($"n_chars").count().as[(Long, Long)].collect()
      .sortBy { case (v, n) => (-n, v) }
    assert(exact === counts.map { case (_, n) => n * n }.sum)
    val k = 8
    val (mcv, rest) = counts.splitAt(k)
    val est8 = mcv.map { case (_, n) => n * n }.sum + {
      val nr = rest.map(_._2).sum
      nr * nr / math.max(rest.size, 1)
    }
    assert(rows(8L)._1 === est8, "k=8 estimator replay")
  }
}
