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

  test("q204 sample-vs-sketch ndv: stats replay locally from the raw " +
      "rows, estimator formulas are exact, and every sample estimator " +
      "misses the duplicate-bearing column the KMV sketch nails") {
    val s = spark
    import s.implicits._
    val rows = Layout.q204SampleNdv(s, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getLong(10), r.getLong(11))).toMap
    assert(rows.size === 6)
    // the shared affine hash, replayed in Scala (inputs < 2^31 so the
    // intermediate products stay far from Long overflow)
    val P = 2147483647L
    def h(x: Long): Long =
      (((x % P + P) % P * 48271 + 12345) % P * 69621 + 67890) % P
    def replay(vals: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      // vals = (value, rowkey)
      val byV = vals.groupBy(_._1).view.mapValues { rs =>
        (rs.size.toLong, rs.count { case (_, rk) => h(rk) % 64 == 0 }.toLong)
      }.toMap
      (byV.size.toLong, byV.values.map(_._2).sum,
        byV.values.count(_._2 > 0).toLong,
        byV.values.count(_._2 == 1).toLong,
        byV.values.count(_._2 == 2).toLong)
    }
    val li = graft.Tables(s, sf, "lineitem")
      .selectExpr("l_orderkey", "l_orderkey * 10 + l_linenumber")
      .as[(Long, Long)].collect().toSeq
    val (xd, nsamp, dsamp, f1, f2) = replay(li)
    val (gxd, gns, gds, gf1, gf2, gScale, gUjack, gChao, _, _, _) =
      rows("lineitem.l_orderkey")
    assert((gxd, gns, gds, gf1, gf2) === ((xd, nsamp, dsamp, f1, f2)),
      "lineitem sample stats must replay from the raw rows")
    // estimator formulas, integer-exact
    assert(gScale === 64 * dsamp)
    assert(gUjack === dsamp * nsamp * 64 / math.max(64 * nsamp - 63 * f1, 1))
    assert(gChao === dsamp + f1 * (f1 - 1) / (2 * (f2 + 1)))
    rows.foreach { case (c, (exact, _, ds, _, _, sc, uj, ch, eS, eU, eC)) =>
      assert(ds <= exact, s"$c sample can't see more values than exist")
      assert(eS === 1000 * (sc - exact) / math.max(exact, 1), s"$c err_scale")
      assert(eU === 1000 * (uj - exact) / math.max(exact, 1), s"$c err_ujack")
      assert(eC === 1000 * (ch - exact) / math.max(exact, 1), s"$c err_chao")
    }
    // the audit's finding: on the ~4-rows-per-value column every sample
    // estimator misses by >=20% in one direction or the other (scale-up
    // far over; jackknife and Chao1 under — multiplicity hides values
    // from a 1/64 row sample), where q200's KMV sketch is exact/±6‰
    Seq(("scale", rows("lineitem.l_orderkey")._9),
      ("ujack", rows("lineitem.l_orderkey")._10),
      ("chao", rows("lineitem.l_orderkey")._11)).foreach { case (n, e) =>
      assert(math.abs(e) >= 200, s"$n should miss l_orderkey badly, got $e")
    }
    assert(rows("lineitem.l_orderkey")._9 > 0, "scale-up overestimates")
    assert(rows("lineitem.l_orderkey")._10 < 0, "jackknife underestimates here")
  }

  test("q202 production twin (VERDICT r14 #3): REAL parquet footers under " +
      "the three writer layouts reproduce the simulated skip rates, and " +
      "Spark's own scan pushdown actually skips the pruned row groups") {
    val s = spark
    import s.implicits._
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val root = graft.Scratch.dir("layout-proof")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // sf0.01: ~60k lineitem rows → 64 files of ~950 rows, one row group
    // each — real zones with room to prune
    val sfd = "/root/testdata/sf0.01"
    val li0 = graft.Tables(s, sfd, "lineitem").selectExpr(
      "l_extendedprice as p",
      "datediff(l_shipdate, date'1970-01-01') as d",
      "l_orderkey as ok")
    val strow = li0.agg(min($"p"), max($"p"), min($"d"), max($"d")).head()
    val (mnP, mxP) = (strow.getDouble(0), strow.getDouble(1))
    val (mnD, mxD) = (strow.getInt(2), strow.getInt(3))
    // the q202/q98 Morton key, computed with the audit's own expressions
    val keyed = li0
      .withColumn("zx", expr(s"least(cast(floor((p - $mnP) * 1024.0 / " +
        s"($mxP - $mnP)) as bigint), 1023)"))
      .withColumn("zy", expr(s"least(cast(floor(cast(d - $mnD as double) " +
        s"* 1024.0 / ${(mxD - mnD).toDouble}) as bigint), 1023)"))
      .withColumn("zkey", Layout.morton10($"zx", $"zy"))
    // the PRODUCTION writes: repartitionByRange on insertion key / sort
    // key / Morton key (the q98 scaladoc's "production write" verbatim)
    Seq(("natural", "ok"), ("sorted", "p"), ("zorder", "zkey"))
      .foreach { case (name, key) =>
        keyed.repartitionByRange(64, col(key)).select($"p", $"d")
          .write.mode("overwrite").parquet(s"$root/$name")
      }
    // REAL zone maps: per-file min/max straight from the parquet footers
    def zones(layout: String): Seq[(Double, Double, Int, Int, Long)] = {
      val conf = s.sparkContext.hadoopConfiguration
      new java.io.File(s"$root/$layout").listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
          try {
            var (pmn, pmx) = (Double.MaxValue, Double.MinValue)
            var (dmn, dmx) = (Int.MaxValue, Int.MinValue)
            var rows = 0L
            r.getFooter.getBlocks.asScala.foreach { b =>
              rows += b.getRowCount
              b.getColumns.asScala.foreach { c =>
                (c.getPath.toDotString, c.getStatistics.genericGetMin,
                  c.getStatistics.genericGetMax) match {
                  case ("p", lo: java.lang.Double, hi: java.lang.Double) =>
                    pmn = math.min(pmn, lo); pmx = math.max(pmx, hi)
                  case ("d", lo: java.lang.Integer, hi: java.lang.Integer) =>
                    dmn = math.min(dmn, lo.intValue); dmx = math.max(dmx, hi.intValue)
                  case _ =>
                }
              }
            }
            (pmn, pmx, dmn, dmx, rows)
          } finally r.close()
        }
    }
    // the audit's 10 predicates (5 price fifths, 5 date fifths; the last
    // of each closed), reproduced in the same double arithmetic
    val preds: Seq[(Int, String, Double, Double, Boolean)] =
      (1 to 5).map(k => (k, "p", mnP + (k - 1) * (mxP - mnP) / 5.0,
        mnP + k * (mxP - mnP) / 5.0, k == 5)) ++
      (1 to 5).map(k => (k + 5, "d",
        mnD + (k - 1) * (mxD - mnD).toDouble / 5.0,
        mnD + k * (mxD - mnD).toDouble / 5.0, k == 5))
    def skipMilli(layout: String): Map[Int, Long] = {
      val zs = zones(layout)
      val total = zs.size
      preds.map { case (k, c, lo, hi, closed) =>
        val read = zs.count { case (pmn, pmx, dmn, dmx, _) =>
          val (zlo, zhi) =
            if (c == "p") (pmn, pmx) else (dmn.toDouble, dmx.toDouble)
          zhi >= lo && (zlo < hi || (closed && zlo <= hi))
        }
        k -> 1000L * (total - read) / total
      }.toMap
    }
    val (natS, sortS, zS) = (skipMilli("natural"), skipMilli("sorted"),
      skipMilli("zorder"))
    def avg(m: Map[Int, Long], ks: Range) = ks.map(m).sum / ks.size
    // the audit's headline claims, now measured off REAL footers:
    // natural prunes nothing, sorted prunes only its own dimension,
    // z-order prunes BOTH
    assert(avg(natS, 1 to 5) <= 150 && avg(natS, 6 to 10) <= 150,
      s"natural layout should prune ~nothing: $natS")
    assert(avg(sortS, 1 to 5) >= 500,
      s"sorted layout must skip most files on price: $sortS")
    assert(avg(sortS, 6 to 10) <= 150,
      s"sorted layout cannot prune the shredded date dimension: $sortS")
    assert(avg(zS, 1 to 5) >= 350 && avg(zS, 6 to 10) >= 350,
      s"z-order must prune materially on BOTH dimensions: $zS")
    // within tolerance of the SIMULATED audit at the same SF (sampled
    // range boundaries vs the audit's exact bucketing)
    val sim = Layout.q202ZoneMapAudit(s, sfd).collect()
      .map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(6)).toMap
    for (k <- 1 to 10) {
      assert(math.abs(zS(k) - sim(("zorder", k))) <= 300,
        s"zorder pred $k: real ${zS(k)} vs simulated ${sim(("zorder", k))}")
      assert(math.abs(sortS(k) - sim(("sorted", k))) <= 300,
        s"sorted pred $k: real ${sortS(k)} vs simulated ${sim(("sorted", k))}")
    }
    // ENGINE leg: a price+date range read over the z-order layout must
    // push both filters into the scan and output only the rows of the
    // footer-overlapping files — Spark's row-group skipping doing in
    // production what the audit priced
    val (_, _, pLo, pHi, _) = preds(1) // price fifth 2
    val (_, _, dLo, dHi, _) = preds(6) // date fifth 2
    val q = s.read.parquet(s"$root/zorder")
      .where($"p" >= pLo && $"p" < pHi &&
        $"d" >= dLo.toInt && $"d" < dHi.toInt)
    q.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScan(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case f: FileSourceScanExec => Some(f)
      case other => other.children.iterator.map(findScan)
        .collectFirst { case Some(f) => f }
    }
    val scan = findScan(q.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in the plan"))
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(p,"),
      "price filter must reach the parquet scan")
    assert(scan.metadata("PushedFilters").contains("LessThan(d,"),
      "date filter must reach the parquet scan")
    val zoneRows = zones("zorder")
    val totalRows = zoneRows.map(_._5).sum
    val overlapRows = zoneRows.collect {
      case (pmn, pmx, dmn, dmx, n)
        if pmx >= pLo && pmn < pHi &&
          dmx.toDouble >= dLo && dmn.toDouble < dHi => n
    }.sum
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned <= overlapRows,
      s"scan output $scanned must not exceed the $overlapRows rows of " +
        "footer-overlapping files (row-group skipping)")
    assert(scanned < totalRows / 2,
      s"scan output $scanned of $totalRows total — the engine must " +
        "actually skip most row groups on this layout")
  }

  test("q192 production twin (VERDICT r14 #7): the planner's exact bounds " +
      "drive a real range exchange; engine partition sizes and written " +
      "file row counts equal the predicted n_rows") {
    val s = spark
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val planned = Layout.q192RangePlanner(s, sf).collect()
      .map(r => (r.getLong(0).toInt,
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(3), r.getLong(5)))
    // reconstruct the elected boundary multiset from the plan: b_i is
    // the lo_key of the first non-empty partition at or above i
    // (duplicated boundaries collapse the partitions between them)
    val loByPid = planned.map { case (pid, lo, _, _) => pid -> lo }.toMap
    val bounds = (1 until 32).map { i =>
      (i until 32).iterator.flatMap(loByPid(_)).nextOption()
        .getOrElse(Long.MaxValue)
    }
    // a real Spark range exchange with EXACTLY those bounds: the public
    // DataFrame API only offers sampled boundaries (repartitionByRange),
    // so the exchange runs through the RDD Partitioner seam — the same
    // physical shuffle, boundary comparison per row
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = 32
      override def getPartition(key: Any): Int =
        bounds.count(_ <= key.asInstanceOf[Long])
    }
    val exchanged = graft.Tables(s, sf, "events")
      .select($"user_id").as[Long].rdd
      .map(k => (k, ())).partitionBy(part)
    // ENGINE partition sizes (counted inside the shuffle read) must equal
    // the audit's predicted n_rows per pid, and therefore its skew_milli
    val sizes = exchanged
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().toMap
    val n = planned.map(_._3).sum
    planned.foreach { case (pid, _, nr, skew) =>
      assert(sizes.getOrElse(pid, 0L) === nr,
        s"pid $pid: engine partition size ${sizes.getOrElse(pid, 0L)} " +
          s"vs predicted $nr")
      assert(skew === 1000L * nr * 32 / n, s"pid $pid skew replay")
    }
    // and the files a sorted write would produce: one parquet file per
    // non-empty partition, whose REAL footer row counts are exactly the
    // predicted per-partition sizes (multiset compare — file names do
    // not carry the pid)
    val root = graft.Scratch.dir("layout-proof", "range")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    exchanged.map(_._1).toDF("user_id")
      .write.mode("overwrite").parquet(root)
    val conf = s.sparkContext.hadoopConfiguration
    val fileRows = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally r.close()
      }
    // empty partitions may still emit a zero-row part file on this
    // writer path — rows, not files, are the prediction under test
    assert(fileRows.filter(_ > 0).sorted ===
      planned.map(_._3).filter(_ > 0).sorted.toSeq,
      "written file row counts must equal the predicted partition sizes")
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

  test("int64 headroom (VERDICT r15 #7): the caveated estimator products " +
      "are exact at test-SF stats (BigInt cross-check), exact at " +
      "synthetic near-boundary stats, and fail LOUDLY past the boundary") {
    val s = spark
    import s.implicits._
    // a loud failure is an exception whose chain carries the overflow —
    // never a silently wrapped wrong integer
    def loud(f: => Any): Unit = {
      val e = intercept[Throwable](f)
      def chain(t: Throwable, d: Int = 0): Seq[Throwable] =
        if (t == null || d > 10) Seq.empty else t +: chain(t.getCause, d + 1)
      assert(chain(e).exists(t => t.isInstanceOf[ArithmeticException] ||
        String.valueOf(t.getMessage).contains("ARITHMETIC_OVERFLOW")),
        s"expected a loud overflow, got $e")
    }

    // ---- q199 containment estimator, REAL test-SF stats: every edge's
    // n_left·n_right and the estimate itself replay exactly in BigInt —
    // int64 is EXACT at this SF, not merely unexploded
    Layout.q199JoinCardinality(s, sf).collect().foreach { r =>
      val (nl, nr) = (r.getLong(1), r.getLong(2))
      val nd = math.max(r.getLong(3), r.getLong(4))
      val big = BigInt(nl) * BigInt(nr) / BigInt(math.max(nd, 1))
      assert(big.isValidLong && big.toLong === r.getLong(5),
        s"${r.getString(0)}: int64 est ${r.getLong(5)} vs BigInt $big")
    }

    // ---- the documented SF1000 boundary is REAL: a TPC-H SF1000
    // lineitem⋈lineitem-shaped stats row (n ≈ 6e9 a side) overflows
    // int64, while everything up to ~3e9 a side stays exact
    assert(!(BigInt(6000000000L) * BigInt(6000000000L)).isValidLong,
      "SF1000 fact-fact products genuinely exceed int64")

    // ---- q199 expression, synthetic near-boundary stats: exact just
    // under (vs BigInt), LOUD just past (ANSI overflow, not a wrap)
    val est = Layout.q199EstSql("nt_0", "nt_1", "nd_0", "nd_1")
    def q199At(nl: Long, nr: Long, nd: Long): Long =
      Seq((nl, nr, nd, nd)).toDF("nt_0", "nt_1", "nd_0", "nd_1")
        .selectExpr(s"cast(($est) as bigint) as e").head().getLong(0)
    val safe = 3000000000L // 9.0e18 < Long.MaxValue ≈ 9.223e18
    assert(q199At(safe, safe, 7L) ===
      (BigInt(safe) * BigInt(safe) / 7).toLong)
    loud(q199At(3100000000L, 3100000000L, 7L)) // 9.61e18 > Long.MaxValue

    // ---- q201 cascade expression (est-cost of the N.C.O.L profile):
    // same regime — exact near the boundary, loud past it
    val (_, cascSql, _) = Layout.q201Profiles("div").head
    def q201At(nn: Long, nc: Long, no: Long): Long =
      Seq((nn, nc, no, 1L, 1L, 1L, 1L))
        .toDF("n_n", "n_c", "n_o", "d_nc_n", "d_nc_c", "d_co_c", "d_co_o")
        .selectExpr(s"cast(($cascSql) as bigint) as e").head().getLong(0)
    // e2 = nn·nc div 1; cost = e2 + e2·no div 1 — keep e2·no just under
    assert(q201At(2000000000L, 2L, 2L) ===
      4000000000L + 4000000000L * 2L)
    loud(q201At(2000000000L, 2L, 3000000000L)) // e2·no = 1.2e19

    // ---- q204 unsmoothed-jackknife numerator (d·n·64): exact just
    // under, loud past
    val ujack = Layout.q204Ests("div")
      .collectFirst { case ("est_ujack", e) => e }.get
    def q204At(d: Long, n: Long, f1: Long): Long =
      Seq((d, n, f1, 0L))
        .toDF("d_samp", "sample_rows", "f1", "f2")
        .selectExpr(s"cast(($ujack) as bigint) as e").head().getLong(0)
    val dSafe = 379000000L // d·n·64 = 9.19e18 just under Long.MaxValue
    assert(q204At(dSafe, dSafe, 0L) ===
      (BigInt(dSafe) * dSafe * 64 /
        (BigInt(64) * dSafe).max(1)).toLong)
    loud(q204At(380000000L, 380000000L, 0L)) // 9.24e18 > Long.MaxValue

    // ---- q205 driver-side hybrid estimate: multiplyExact/addExact make
    // the catalog math equally loud (a plain Scala `*` would WRAP here —
    // the worst failure mode, silent and plausible-looking)
    assert(Planner.hybridJoinEst(10L, 0L, 0L, 3000000000L, 1000L) ===
      (BigInt(10) * (BigInt(3000000000L) * 3000000000L / 968) /
        3000000000L).toLong)
    loud(Planner.hybridJoinEst(10L, 0L, 0L, 4000000000L, 1000L))
  }
}
