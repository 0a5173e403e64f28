package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, GraftSession, SparkSpec, Tables}
import graft.ops.Planner

/** A dedicated session carrying the [[GraftExtensions]] injection (the
  * optimizer rule is registered at session CONSTRUCTION — the shared
  * SparkSpec session cannot retrofit it). Shares the JVM's one
  * SparkContext; the shared session is restored as default/active so
  * every other suite is untouched.
  */
object ExtSession {
  lazy val spark: SparkSession = {
    val prev = SparkSpec.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-ext-test")
        .withExtensions(new GraftExtensions), "4")
      .getOrCreate()
    SparkSession.setDefaultSession(prev)
    SparkSession.setActiveSession(prev)
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** [[CatalogJoinReorder]] — the q207 catalog driving the ENGINE's own
  * optimizer: a fact⋈fact-first user plan is rebuilt dimension-first by
  * the injected rule, results are identical, the engine-measured
  * intermediate row counts equal the q207 audit's exact costs, the
  * rewrite is a fixpoint, and everything outside the catalog's reach is
  * left byte-identical.
  */
class JoinReorderSpec extends AnyFunSuite {

  private def sf = SparkSpec.sf

  /** The fact-first worst order O.L.C.N, as a user would write it. */
  private def worstOrder(s: SparkSession): DataFrame = {
    import s.implicits._
    Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      .join(Tables(s, sf, "lineitem").select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey")
      .join(Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey"),
        $"c_custkey" === $"o_custkey")
      .join(Tables(s, sf, "nation").select($"n_nationkey"),
        $"n_nationkey" === $"c_nationkey")
  }

  /** Left-deep leaf sequence of a logical plan, named by column
    * evidence — the observable join order. */
  private def leafTables(p: LogicalPlan): Seq[String] = p match {
    case j: Join => leafTables(j.left) ++ leafTables(j.right)
    case leaf if leaf.children.isEmpty =>
      val names = leaf.output.map(_.name).toSet
      Seq(
        if (names("c_custkey") || names("c_nationkey")) "customer"
        else if (names("n_nationkey") || names("n_regionkey")) "nation"
        else if (names("o_orderkey") || names("o_custkey")) "orders"
        else if (names("l_orderkey")) "lineitem"
        else if (names("r_regionkey")) "region"
        else "?")
    case other => other.children.flatMap(leafTables)
  }

  /** Engine-measured intermediate join output rows: collect() the frame
    * (running ITS OWN queryExecution — a count() would plan a separate
    * one and leave these metrics at zero), then sum numOutputRows over
    * every join node except the root-most (whose output is
    * order-invariant and not part of the cost). */
  private def measuredIntermediates(df: DataFrame): (Long, Seq[Seq[Any]]) = {
    val rows = df.collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def joins(p: SparkPlan): Seq[BaseJoinExec] = {
      val kids = p.children.flatMap(joins)
      p match { case j: BaseJoinExec => j +: kids; case _ => kids }
    }
    val js = joins(df.queryExecution.executedPlan)
    assert(js.length === 3, s"left-deep 4-chain has 3 joins: $js")
    (js.drop(1).map(_.metrics("numOutputRows").value).sum, rows)
  }

  test("the injected rule rebuilds a fact-first join dimension-first, " +
      "results are identical, and the engine-measured intermediate rows " +
      "equal the q207 audit's exact costs — catalog-driven CBO without " +
      "ANALYZE TABLE") {
    val s = ExtSession.spark
    val art = Planner.ensureJoinArtifacts(s, sf)
    val audit = Planner.q207JoinOrderPlan(s, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val savedAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // baseline: rule disabled — the user's order survives
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val off = worstOrder(s)
      assert(leafTables(off.queryExecution.optimizedPlan) ===
        Seq("orders", "lineitem", "customer", "nation"),
        "without the catalog, the fact-first user order must survive")
      val (offRows, offData) = measuredIntermediates(off)

      // catalog on: the SAME user plan comes out dimension-first
      s.conf.set(CatalogJoinReorder.CatalogKey, art)
      val on = worstOrder(s)
      assert(leafTables(on.queryExecution.optimizedPlan) ===
        Seq("customer", "nation", "orders", "lineitem"),
        "the rule must rebuild to the catalog's best order C.N.O.L")
      val (onRows, onData) = measuredIntermediates(on)

      assert(onData === offData, "reordering must not change results")
      assert(onRows === audit("C.N.O.L"),
        "engine intermediates under the rule == audit exact cost of C.N.O.L")
      assert(offRows === audit("O.L.C.N"),
        "engine intermediates without the rule == audit exact cost of O.L.C.N")
      assert(onRows < offRows,
        "the catalog's order must move fewer intermediate rows")
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("fixpoint: re-running the optimizer over the rule's own output " +
      "leaves it untouched") {
    val s = ExtSession.spark
    val art = Planner.ensureJoinArtifacts(s, sf)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val optimized = worstOrder(s).queryExecution.optimizedPlan
      val again = org.apache.spark.sql.graft.OptimizerBridge
        .reoptimize(s, optimized)
      assert(again.canonicalized === optimized.canonicalized,
        "a second optimization pass must be a no-op")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("safety: regions the catalog cannot fully price are left " +
      "byte-identical — an uncataloged relation in the chain, and a " +
      "2-join region below the rule's threshold") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    // part is the uncataloged relation (supplier joined the chain
    // catalog in r20 for the graded 9-relation audit)
    def partChain(): DataFrame =
      Tables(s, sf, "part").select($"p_partkey")
        .join(Tables(s, sf, "lineitem").select($"l_partkey", $"l_orderkey"),
          $"p_partkey" === $"l_partkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey"),
          $"o_orderkey" === $"l_orderkey")
    def twoJoin(): DataFrame =
      Tables(s, sf, "orders").select($"o_orderkey")
        .join(Tables(s, sf, "lineitem").select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey")
    for (build <- Seq(partChain _, twoJoin _)) {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val off = build().queryExecution.optimizedPlan
      s.conf.set(CatalogJoinReorder.CatalogKey, art)
      val on = build().queryExecution.optimizedPlan
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      assert(on.canonicalized === off.canonicalized,
        "out-of-scope plans must be untouched")
    }
  }

  test("degradation: a misconfigured catalog path disables the rule for " +
      "that root — queries still plan and run, just without CBO") {
    val s = ExtSession.spark
    s.conf.set(CatalogJoinReorder.CatalogKey,
      "/nonexistent/graft-join-catalog")
    try {
      val df = worstOrder(s)
      assert(leafTables(df.queryExecution.optimizedPlan) ===
        Seq("orders", "lineitem", "customer", "nation"),
        "a broken catalog must leave the user's order untouched")
      assert(df.count() > 0, "and the query must still run")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("self-joins: two instances of one cataloged table classify " +
      "independently (edges resolve by exprId, stats by name) and the " +
      "region reorders with identical results; a RENAMED self-join side " +
      "degrades safely to no change") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    def star(): DataFrame = {
      val o1 = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      val o2 = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      val c = Tables(s, sf, "customer").select($"c_custkey")
      o1.join(c, o1("o_custkey") === $"c_custkey")
        .join(o2, o2("o_custkey") === $"c_custkey")
    }
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = star().count()
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      assert(star().count() === off,
        "self-join region must produce identical results under the rule")
      // renamed side: no column-name evidence → unclassifiable leaf →
      // byte-identical no-op
      def renamed(): DataFrame = {
        val o1 = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
        val o2 = Tables(s, sf, "orders")
          .select($"o_orderkey".as("ok2"), $"o_custkey".as("oc2"))
        val c = Tables(s, sf, "customer").select($"c_custkey")
        o1.join(c, $"o_custkey" === $"c_custkey")
          .join(o2, $"oc2" === $"c_custkey")
      }
      val on = renamed().queryExecution.optimizedPlan
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val offPlan = renamed().queryExecution.optimizedPlan
      assert(on.canonicalized === offPlan.canonicalized,
        "a renamed self-join side must leave the plan untouched")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("5-chain: the catalog's region edge lets the rule price all 16 " +
      "connected orders of region–nation–customer–orders–lineitem and " +
      "rebuild a fact-first chain smallest-dimension-first") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val chain = Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey"),
          $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation")
          .select($"n_nationkey", $"n_regionkey"),
          $"n_nationkey" === $"c_nationkey")
        .join(Tables(s, sf, "region").select($"r_regionkey"),
          $"r_regionkey" === $"n_regionkey")
      // the dimension pair N⋈R opens every optimal order (25 est rows —
      // N.R and R.N tie exactly, and the deterministic tiebreak keeps
      // the extraction-order representative, nation first); the chain
      // then cascades in table-size order
      assert(leafTables(chain.queryExecution.optimizedPlan) ===
        Seq("nation", "region", "customer", "orders", "lineitem"),
        "16-order enumeration must pick the smallest-dimension-first chain")
      // reordering must not change results: compare against the same
      // chain with the rule disabled
      val got = chain.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val off = Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey"),
          $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation")
          .select($"n_nationkey", $"n_regionkey"),
          $"n_nationkey" === $"c_nationkey")
        .join(Tables(s, sf, "region").select($"r_regionkey"),
          $"r_regionkey" === $"n_regionkey")
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      assert(got === off, "5-chain reordering must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("completeness: every one of the 8 connected user nestings of the " +
      "4-chain funnels to an optimal order under the rule, with the " +
      "order-invariant result cardinality preserved") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    def frame(t: String): DataFrame = t match {
      case "N" => Tables(s, sf, "nation").select($"n_nationkey")
      case "C" => Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey")
      case "O" => Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      case "L" => Tables(s, sf, "lineitem").select($"l_orderkey")
    }
    def edge(t: String, prefix: Set[String]) = t match {
      case "N" => $"n_nationkey" === $"c_nationkey"
      case "C" => if (prefix("N")) $"n_nationkey" === $"c_nationkey"
        else $"c_custkey" === $"o_custkey"
      case "O" => if (prefix("C")) $"c_custkey" === $"o_custkey"
        else $"o_orderkey" === $"l_orderkey"
      case "L" => $"o_orderkey" === $"l_orderkey"
    }
    // the two optimal rebuilds (C⋈N first — the exact cost tie resolves
    // by extraction order, so either representative is correct)
    val optimal = Set(
      Seq("customer", "nation", "orders", "lineitem"),
      Seq("nation", "customer", "orders", "lineitem"))
    val all8 = Seq("N.C.O.L", "C.N.O.L", "C.O.N.L", "C.O.L.N",
      "O.C.N.L", "O.C.L.N", "O.L.C.N", "L.O.C.N")
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val counts = all8.map { o =>
        val tags = o.split("\\.").toSeq
        val df = tags.tail.foldLeft((frame(tags.head), Set(tags.head))) {
          case ((d, p), t) => (d.join(frame(t), edge(t, p)), p + t)
        }._1
        val leaf = leafTables(df.queryExecution.optimizedPlan)
        assert(optimal(leaf), s"user order $o rebuilt to $leaf — not optimal")
        df.count()
      }
      assert(counts.toSet.size === 1,
        "the final join cardinality is order-invariant")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("selectivity-aware: a narrow pushed filter on orders FLIPS the " +
      "best order from dimension-first to filtered-fact-first, and the " +
      "flip is right — engine-measured intermediates beat the " +
      "dimension-first alternative") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    // the narrow q205-style threshold, computed off the catalog's own
    // staged bounds artifact
    val hb = s.read.parquet(s"$art/hists")
      .where($"col" === "o_totalprice").head()
    val (mn, mx) = (hb.getAs[Double]("mn"), hb.getAs[Double]("mx"))
    val t = mn + (mx - mn) / 64.0
    def chain(filtered: Boolean): DataFrame = {
      val orders0 = Tables(s, sf, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val orders = if (filtered) orders0.where($"o_totalprice" <= t)
        else orders0
      Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(orders, $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
    }
    val savedAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      // unfiltered: dimension-first (the standing 4-chain decision)
      assert(leafTables(chain(filtered = false)
        .queryExecution.optimizedPlan).take(2).toSet ===
        Set("customer", "nation"),
        "without the filter the dimension pair must open the plan")
      // filtered: the σ(orders) estimate (~n/64) makes orders the
      // cheapest opener — the DECISION flips on the same chain shape
      val on = chain(filtered = true)
      assert(leafTables(on.queryExecution.optimizedPlan) ===
        Seq("orders", "customer", "nation", "lineitem"),
        "the narrow filter must flip the best order to σ(orders)-first")
      val (onRows, onData) = measuredIntermediates(on)
      // the flip is RIGHT: the rule-disabled dimension-first execution
      // of the same filtered chain moves more intermediate rows
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val dimFirst = Tables(s, sf, "customer")
        .select($"c_custkey", $"c_nationkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
        .join(Tables(s, sf, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .where($"o_totalprice" <= t),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "lineitem").select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey")
      val (dimRows, dimData) = measuredIntermediates(dimFirst)
      assert(onRows < dimRows,
        s"σ(orders)-first must move fewer intermediate rows " +
          s"($onRows vs $dimRows)")
      // identical results through both shapes (column order differs —
      // compare rows as sorted value multisets, then sort the row set)
      def norm(rows: Seq[Seq[Any]]): Seq[String] =
        rows.map(_.map(String.valueOf).sorted.mkString("|")).sorted
      assert(norm(onData) === norm(dimData),
        "the flip must not change results")
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("equality selectivity off the maintained MCV: a tail-key " +
      "σ(o_custkey = k) makes orders the cheapest opener — the rule's " +
      "twin of the graded q209 flip — with identical results") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    // the same key q209 audits: the (McvSlots+1)-th most common custkey
    // — just past the head, so the rule prices it by the uniform tail
    val k = graft.streaming.McvStream.mergedBoundedHead(s, s"$art/m_co_o")
      .orderBy($"n".desc, $"v").limit(Planner.McvSlots + 1)
      .collect().last.getLong(0)
    def chain(): DataFrame =
      Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
          .where($"o_custkey" === k), $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafTables(on.queryExecution.optimizedPlan) ===
        Seq("orders", "customer", "nation", "lineitem"),
        "the equality-filtered fact must open the rebuilt plan")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) === off,
        "the equality flip must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("BETWEEN pricing (VERDICT r18 #7): a narrow MID-domain window on " +
      "orders flips the best order to the filtered fact — " +
      "estLE(hi) − estLE(lo) prices the window right where independent " +
      "one-sided factors would keep most of the mass — with identical " +
      "results") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    // a 2/64-wide window centred in the domain: the combined estimate is
    // ~n/32 (flip); two independent one-sided factors would price it at
    // ~0.24·n (no flip — the exact failure mode the composition fixes)
    val hb = s.read.parquet(s"$art/hists")
      .where($"col" === "o_totalprice").head()
    val (mn, mx) = (hb.getAs[Double]("mn"), hb.getAs[Double]("mx"))
    val lo = mn + (mx - mn) * 30.0 / 64.0
    val hi = mn + (mx - mn) * 32.0 / 64.0
    def chain(): DataFrame =
      Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(Tables(s, sf, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .where($"o_totalprice" >= lo && $"o_totalprice" <= hi),
          $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafTables(on.queryExecution.optimizedPlan) ===
        Seq("orders", "customer", "nation", "lineitem"),
        "the BETWEEN-priced σ(orders) must open the rebuilt plan")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) === off,
        "the BETWEEN flip must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("IN-list pricing (VERDICT r18 #7): σ(o_custkey IN (three tail " +
      "keys)) makes orders the cheapest opener — Σ estEq over the coded " +
      "list values, the q209 tail rule composed — with identical " +
      "results") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    // three keys just past the MCV head — each priced by the uniform
    // tail, so the estimate is 3 tail slots (~a few dozen rows → flip)
    val ks = graft.streaming.McvStream.mergedBoundedHead(s, s"$art/m_co_o")
      .orderBy($"n".desc, $"v").limit(Planner.McvSlots + 3)
      .collect().takeRight(3).map(_.getLong(0)).toSeq
    def chain(): DataFrame =
      Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
          .where($"o_custkey".isin(ks: _*)), $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafTables(on.queryExecution.optimizedPlan) ===
        Seq("orders", "customer", "nation", "lineitem"),
        "the IN-filtered fact must open the rebuilt plan")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) === off,
        "the IN-list flip must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("OR-of-equalities pricing (VERDICT r19 #5): σ(o_custkey = k₁ OR " +
      "o_custkey = k₂ OR o_custkey = k₃) over the three tail keys flips " +
      "the best order to the filtered fact EXACTLY like its IN-list " +
      "twin — an OR chain IS an IN-list Spark did not canonicalize, " +
      "priced as Σ estEq — with identical results") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    // the IN-list leg's exact keys: three just past the MCV head
    val ks = graft.streaming.McvStream.mergedBoundedHead(s, s"$art/m_co_o")
      .orderBy($"n".desc, $"v").limit(Planner.McvSlots + 3)
      .collect().takeRight(3).map(_.getLong(0)).toSeq
    def chain(): DataFrame =
      Tables(s, sf, "lineitem").select($"l_orderkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
          .where($"o_custkey" === ks(0) || $"o_custkey" === ks(1) ||
            $"o_custkey" === ks(2)),
          $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain().collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafTables(on.queryExecution.optimizedPlan) ===
        Seq("orders", "customer", "nation", "lineitem"),
        "the OR-filtered fact must open the rebuilt plan, exactly as " +
          "the IN-list twin does")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) === off,
        "the OR flip must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("15-relation region (VERDICT r19 #1): a TPC-H star with repeated " +
      "dimension instances — one past the 14-relation exact-DP ceiling, " +
      "previously a silent fall-through — reorders through the GOO " +
      "fallback with identical results and a fixpoint no-op") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, JoinReorderSpec.gooSpec)
    // 15 leaves over 6 cataloged tables: the 6-chain plus 1:1 repeated
    // dimension instances (self-join classification resolves by column
    // evidence; edges by exprId)
    def chain(): DataFrame = {
      val l = Tables(s, sf, "lineitem").select($"l_orderkey", $"l_suppkey")
      val o = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      val c = Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey")
      val n = Tables(s, sf, "nation").select($"n_nationkey", $"n_regionkey")
      val r = Tables(s, sf, "region").select($"r_regionkey")
      val sp = Tables(s, sf, "supplier").select($"s_suppkey")
      val o2 = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      val c2 = Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey")
      val n2 = Tables(s, sf, "nation").select($"n_nationkey", $"n_regionkey")
      val r2 = Tables(s, sf, "region").select($"r_regionkey")
      val s2 = Tables(s, sf, "supplier").select($"s_suppkey")
      val n3 = Tables(s, sf, "nation").select($"n_nationkey")
      val r3 = Tables(s, sf, "region").select($"r_regionkey")
      val c3 = Tables(s, sf, "customer").select($"c_custkey")
      val o3 = Tables(s, sf, "orders").select($"o_orderkey")
      l.join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(n, n("n_nationkey") === c("c_nationkey"))
        .join(r, r("r_regionkey") === n("n_regionkey"))
        .join(sp, sp("s_suppkey") === l("l_suppkey"))
        .join(o2, o2("o_orderkey") === l("l_orderkey"))
        .join(c2, c2("c_custkey") === o("o_custkey"))
        .join(n2, n2("n_nationkey") === c("c_nationkey"))
        .join(r2, r2("r_regionkey") === n("n_regionkey"))
        .join(s2, s2("s_suppkey") === l("l_suppkey"))
        .join(n3, n3("n_nationkey") === c2("c_nationkey"))
        .join(r3, r3("r_regionkey") === n2("n_regionkey"))
        .join(c3, c3("c_custkey") === o2("o_custkey"))
        .join(o3, o3("o_orderkey") === l("l_orderkey"))
    }
    def leaves(p: LogicalPlan): Seq[LogicalPlan] = p match {
      case j: Join => leaves(j.left) ++ leaves(j.right)
      case leaf if leaf.children.isEmpty => Seq(leaf)
      case other => other.children.flatMap(leaves)
    }
    def checksum(df: DataFrame): Seq[Any] =
      df.selectExpr("hash(*) as h")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum($"h"))
        .head().toSeq
    assert(15 > CatalogJoinReorder.MaxRelations,
      "the region must sit past the exact-DP ceiling")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain()
    val offLeaves = leaves(off.queryExecution.optimizedPlan)
    assert(offLeaves.size === 15, "the user plan must flatten to 15 leaves")
    assert(offLeaves.head.output.exists(_.name == "l_orderkey"),
      "without the catalog the fact-first user order must survive")
    val offSum = checksum(off)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      val bp = on.queryExecution.optimizedPlan
      val onLeaves = leaves(bp)
      assert(onLeaves.size === 15, "the rebuilt region keeps 15 leaves")
      assert(bp.canonicalized !==
        off.queryExecution.optimizedPlan.canonicalized,
        "the 15-relation region must now be REBUILT (it fell through " +
          "silently at MaxRelations = 14)")
      // the structural tell of the fallback's bushy rebuild: at least
      // one join of two bare DIMENSION leaves (nation⋈region and the
      // like) — impossible in the user's left-deep chain, where every
      // join keeps the fact-rooted prefix on one side
      def dimPairJoins(p: LogicalPlan): Int = p match {
        case j: Join =>
          def joinFreeDim(q: LogicalPlan): Boolean =
            q.collectFirst { case _: Join => () }.isEmpty &&
              !q.collectLeaves().flatMap(_.output).exists(a =>
                a.name.startsWith("l_") || a.name.startsWith("o_"))
          val self = joinFreeDim(j.left) && joinFreeDim(j.right)
          (if (self) 1 else 0) + dimPairJoins(j.left) + dimPairJoins(j.right)
        case other => other.children.map(dimPairJoins).sum
      }
      assert(dimPairJoins(bp) >= 1,
        s"the GOO rebuild must join dimension pairs before the fact:\n$bp")
      assert(checksum(on) === offSum,
        "the 15-relation reorder must not change results")
      val again = org.apache.spark.sql.graft.OptimizerBridge
        .reoptimize(s, bp)
      assert(again.canonicalized === bp.canonicalized,
        "a second optimization pass over the GOO plan must be a no-op")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("33-relation region (r20 Long-mask widening): a TPC-H star one " +
      "past the old 30-relation Int-mask ceiling — where an Int-masked " +
      "GOO could not even represent a component — reorders through the " +
      "widened fallback with identical results and a fixpoint no-op") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, JoinReorderSpec.gooSpec)
    // 33 leaves over the same 6 cataloged tables: the 6-chain plus 27
    // 1:1 repeated dimension instances (each N:1 on a unique key, so
    // every copy is row-preserving and the result stays checksum-able)
    def chain(): DataFrame = {
      val l = Tables(s, sf, "lineitem").select($"l_orderkey", $"l_suppkey")
      val o = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      val c = Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey")
      val n = Tables(s, sf, "nation").select($"n_nationkey", $"n_regionkey")
      val r = Tables(s, sf, "region").select($"r_regionkey")
      val sp = Tables(s, sf, "supplier").select($"s_suppkey")
      val base = l.join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(n, n("n_nationkey") === c("c_nationkey"))
        .join(r, r("r_regionkey") === n("n_regionkey"))
        .join(sp, sp("s_suppkey") === l("l_suppkey"))
      val withR = (1 to 9).foldLeft(base) { (df, _) =>
        val ri = Tables(s, sf, "region").select($"r_regionkey")
        df.join(ri, ri("r_regionkey") === n("n_regionkey"))
      }
      val withN = (1 to 9).foldLeft(withR) { (df, _) =>
        val ni = Tables(s, sf, "nation").select($"n_nationkey")
        df.join(ni, ni("n_nationkey") === c("c_nationkey"))
      }
      (1 to 9).foldLeft(withN) { (df, _) =>
        val si = Tables(s, sf, "supplier").select($"s_suppkey")
        df.join(si, si("s_suppkey") === l("l_suppkey"))
      }
    }
    def leaves(p: LogicalPlan): Seq[LogicalPlan] = p match {
      case j: Join => leaves(j.left) ++ leaves(j.right)
      case leaf if leaf.children.isEmpty => Seq(leaf)
      case other => other.children.flatMap(leaves)
    }
    def checksum(df: DataFrame): Seq[Any] =
      df.selectExpr("hash(*) as h")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum($"h"))
        .head().toSeq
    assert(33 > 30 && 33 <= CatalogJoinReorder.GooMaxRelations,
      "the region must sit past the r20 Int-mask ceiling but inside " +
        "the widened Long-mask one")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain()
    val offLeaves = leaves(off.queryExecution.optimizedPlan)
    assert(offLeaves.size === 33, "the user plan must flatten to 33 leaves")
    val offSum = checksum(off)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      val bp = on.queryExecution.optimizedPlan
      assert(leaves(bp).size === 33, "the rebuilt region keeps 33 leaves")
      assert(bp.canonicalized !==
        off.queryExecution.optimizedPlan.canonicalized,
        "the 33-relation region must be REBUILT (at the r20 ceiling it " +
          "fell through with only a log line)")
      assert(checksum(on) === offSum,
        "the 33-relation reorder must not change results")
      val again = org.apache.spark.sql.graft.OptimizerBridge
        .reoptimize(s, bp)
      assert(again.canonicalized === bp.canonicalized,
        "a second optimization pass over the widened-GOO plan must be " +
          "a no-op")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("past the 62-relation ceiling: a 63-leaf region's ROOT falls " +
      "through (logged), but the transform keeps descending and the " +
      "62-leaf sub-region still gets cost-based ordering — 63 leaves " +
      "kept, identical results, fixpoint no-op") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, JoinReorderSpec.gooSpec)
    def chain(): DataFrame = {
      val l = Tables(s, sf, "lineitem").select($"l_orderkey", $"l_suppkey")
      val o = Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
      val c = Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey")
      val n = Tables(s, sf, "nation").select($"n_nationkey", $"n_regionkey")
      val r = Tables(s, sf, "region").select($"r_regionkey")
      val sp = Tables(s, sf, "supplier").select($"s_suppkey")
      val base = l.join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(n, n("n_nationkey") === c("c_nationkey"))
        .join(r, r("r_regionkey") === n("n_regionkey"))
        .join(sp, sp("s_suppkey") === l("l_suppkey"))
      val withR = (1 to 19).foldLeft(base) { (df, _) =>
        val ri = Tables(s, sf, "region").select($"r_regionkey")
        df.join(ri, ri("r_regionkey") === n("n_regionkey"))
      }
      val withN = (1 to 19).foldLeft(withR) { (df, _) =>
        val ni = Tables(s, sf, "nation").select($"n_nationkey")
        df.join(ni, ni("n_nationkey") === c("c_nationkey"))
      }
      (1 to 19).foldLeft(withN) { (df, _) =>
        val si = Tables(s, sf, "supplier").select($"s_suppkey")
        df.join(si, si("s_suppkey") === l("l_suppkey"))
      }
    }
    def leafCount(p: LogicalPlan): Int = p match {
      case j: Join => leafCount(j.left) + leafCount(j.right)
      case leaf if leaf.children.isEmpty => 1
      case other => other.children.map(leafCount).sum
    }
    def checksum(df: DataFrame): Seq[Any] =
      df.selectExpr("hash(*) as h")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum($"h"))
        .head().toSeq
    assert(63 > CatalogJoinReorder.GooMaxRelations,
      "the region must sit past the widened ceiling")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain()
    val offPlan = off.queryExecution.optimizedPlan
    assert(leafCount(offPlan) === 63,
      "the user plan must flatten to 63 leaves")
    val offSum = checksum(off)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      val bp = on.queryExecution.optimizedPlan
      assert(leafCount(bp) === 63,
        "the fall-through must keep all 63 leaves")
      assert(bp.canonicalized !== offPlan.canonicalized,
        "the ≤-ceiling SUB-region must still be reordered on the way " +
          "down (the root alone falls through)")
      assert(checksum(on) === offSum,
        "the partial (sub-region) reorder must not change results")
      val again = org.apache.spark.sql.graft.OptimizerBridge
        .reoptimize(s, bp)
      assert(again.canonicalized === bp.canonicalized,
        "a second optimization pass over the fall-through plan must " +
          "be a no-op")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("registered catalog: a NON-TPC-H table set (events/documents/" +
      "embeddings joined on user/doc keys) registers via CatalogSpec, " +
      "catalogs through the same one-pass stream, and a fact-first plan " +
      "over it comes out dimension-first with identical results") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, Planner.PipelineCatalogSpec)
    def leafNames(p: LogicalPlan): Seq[String] = p match {
      case j: Join => leafNames(j.left) ++ leafNames(j.right)
      case leaf if leaf.children.isEmpty =>
        val names = leaf.output.map(_.name).toSet
        Seq(
          if (names("user_id")) "events"
          else if (names("doc_id")) "documents"
          else if (names("vec_id")) "embeddings"
          else "?")
      case other => other.children.flatMap(leafNames)
    }
    // the user writes the 10k-row fact first; the 500-row dims should open
    def chain(): DataFrame =
      Tables(s, sf, "events").select($"user_id")
        .join(Tables(s, sf, "documents").select($"doc_id"),
          $"user_id" === $"doc_id")
        .join(Tables(s, sf, "embeddings").select($"vec_id"),
          $"doc_id" === $"vec_id")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain()
    assert(leafNames(off.queryExecution.optimizedPlan) ===
      Seq("events", "documents", "embeddings"),
      "without the catalog the fact-first user order must survive")
    val offRows = off.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafNames(on.queryExecution.optimizedPlan) ===
        Seq("documents", "embeddings", "events"),
        "the registered catalog must rebuild the chain dimension-first")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ===
        offRows, "reordering the registered set must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("user-registered spec: a catalog the engine does not declare " +
      "builds through the STANDALONE builder path (own root, own " +
      "stream) with histogram and bounded-MCV artifacts, and the " +
      "rule reorders a chain the safety leg pins as untouched when " +
      "unregistered") {
    val s = ExtSession.spark
    import s.implicits._
    import graft.ops.{CatalogColumn, CatalogHistCol, CatalogSpec, CatalogTable}
    val userSpec = CatalogSpec(
      name = "planner_user_test",
      tables = Seq(
        CatalogTable("sx", "supplier", "s_suppkey", "s_nationkey"),
        CatalogTable("nx", "nation", "n_nationkey", "n_nationkey"),
        CatalogTable("cx", "customer", "c_custkey", "c_nationkey")),
      sketches = Seq(
        CatalogColumn("sx_nk", "sx", "a", "supplier", "s_nationkey"),
        CatalogColumn("nx_nk", "nx", "a", "nation", "n_nationkey"),
        CatalogColumn("cx_nk", "cx", "a", "customer", "c_nationkey")),
      hists = Seq(CatalogHistCol("hsx", "sx", "supplier", "s_acctbal")),
      mcvs = Seq(CatalogColumn("sx_mk", "sx", "a", "supplier",
        "s_nationkey", bounded = true)))
    val art = Planner.ensureCatalog(s, sf, userSpec)
    assert(art.contains("planner_user_test"),
      "a user spec must build under its own root, not the engine's")
    // the bounded-MCV artifact materialized with the tail schema
    val mcvCols = s.read.parquet(s"$art/m_sx_mk").columns.toSet
    assert(mcvCols === Set("v", "n", "d", "tail", "batch"),
      s"user-spec bounded MCV artifact schema: $mcvCols")
    def chain(): DataFrame =
      Tables(s, sf, "customer").select($"c_nationkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"c_nationkey" === $"n_nationkey")
        .join(Tables(s, sf, "supplier").select($"s_nationkey"),
          $"n_nationkey" === $"s_nationkey")
    def leafNames(p: LogicalPlan): Seq[String] = p match {
      case j: Join => leafNames(j.left) ++ leafNames(j.right)
      case leaf if leaf.children.isEmpty =>
        val names = leaf.output.map(_.name).toSet
        Seq(
          if (names("c_nationkey")) "customer"
          else if (names("n_nationkey")) "nation"
          else if (names("s_nationkey")) "supplier"
          else "?")
      case other => other.children.flatMap(leafNames)
    }
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain()
    assert(leafNames(off.queryExecution.optimizedPlan) ===
      Seq("customer", "nation", "supplier"),
      "unregistered, the customer-first user order survives (the " +
        "safety leg's contract)")
    val offRows = off.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafNames(on.queryExecution.optimizedPlan) ===
        Seq("nation", "supplier", "customer"),
        "registered, the 10-row supplier pair must open the plan")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ===
        offRows, "the user-spec reorder must not change results")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("9-relation region (VERDICT r18 #1): the TPC-H chain extended " +
      "by supplier and joined to the pipeline path through customer — " +
      "9 relations, past the old 8-relation ceiling, silently " +
      "untouched in r18 — registers as a user catalog and reorders " +
      "through the subset-DP enumerations (leftDeepDP default, DPccp " +
      "under the bushy flag) with identical results") {
    val s = ExtSession.spark
    import s.implicits._
    import graft.ops.{CatalogColumn, CatalogSpec, CatalogTable}
    val nineSpec = CatalogSpec(
      name = "planner_nine_test",
      tables = Seq(
        CatalogTable("r9", "region", "r_regionkey", "r_regionkey"),
        CatalogTable("n9", "nation", "n_nationkey", "n_regionkey",
          "n_nationkey"),
        CatalogTable("c9", "customer", "c_custkey", "c_nationkey",
          "c_custkey"),
        CatalogTable("o9", "orders", "o_orderkey", "o_custkey",
          "o_orderkey"),
        CatalogTable("l9", "lineitem", "l_orderkey", "l_orderkey",
          "l_suppkey"),
        CatalogTable("s9", "supplier", "s_suppkey", "s_suppkey"),
        CatalogTable("e9", "events", "event_id", "user_id"),
        CatalogTable("d9", "documents", "doc_id", "doc_id"),
        CatalogTable("m9", "embeddings", "vec_id", "vec_id")),
      sketches = Seq(
        CatalogColumn("r9_rk", "r9", "a", "region", "r_regionkey"),
        CatalogColumn("n9_rk", "n9", "a", "nation", "n_regionkey"),
        CatalogColumn("n9_nk", "n9", "b", "nation", "n_nationkey"),
        CatalogColumn("c9_nk", "c9", "a", "customer", "c_nationkey"),
        CatalogColumn("c9_ck", "c9", "b", "customer", "c_custkey"),
        CatalogColumn("o9_ck", "o9", "a", "orders", "o_custkey"),
        CatalogColumn("o9_ok", "o9", "b", "orders", "o_orderkey"),
        CatalogColumn("l9_ok", "l9", "a", "lineitem", "l_orderkey"),
        CatalogColumn("l9_sk", "l9", "b", "lineitem", "l_suppkey"),
        CatalogColumn("s9_sk", "s9", "a", "supplier", "s_suppkey"),
        CatalogColumn("e9_uid", "e9", "a", "events", "user_id"),
        CatalogColumn("d9_did", "d9", "a", "documents", "doc_id"),
        CatalogColumn("m9_vid", "m9", "a", "embeddings", "vec_id")))
    val art = Planner.ensureCatalog(s, sf, nineSpec)
    def leafNames(p: LogicalPlan): Seq[String] = p match {
      case j: Join => leafNames(j.left) ++ leafNames(j.right)
      case leaf if leaf.children.isEmpty =>
        val names = leaf.output.map(_.name).toSet
        Seq(
          if (names("l_orderkey")) "lineitem"
          else if (names("o_orderkey")) "orders"
          else if (names("s_suppkey")) "supplier"
          else if (names("c_custkey")) "customer"
          else if (names("n_nationkey")) "nation"
          else if (names("r_regionkey")) "region"
          else if (names("user_id")) "events"
          else if (names("doc_id")) "documents"
          else if (names("vec_id")) "embeddings"
          else "?")
      case other => other.children.flatMap(leafNames)
    }
    // the user writes the fact tables first — the worst opener
    def chain(): DataFrame =
      Tables(s, sf, "lineitem").select($"l_orderkey", $"l_suppkey")
        .join(Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey"),
          $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "supplier").select($"s_suppkey"),
          $"l_suppkey" === $"s_suppkey")
        .join(Tables(s, sf, "customer")
          .select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation")
          .select($"n_nationkey", $"n_regionkey"),
          $"n_nationkey" === $"c_nationkey")
        .join(Tables(s, sf, "region").select($"r_regionkey"),
          $"r_regionkey" === $"n_regionkey")
        .join(Tables(s, sf, "events").select($"user_id"),
          $"user_id" === $"c_custkey")
        .join(Tables(s, sf, "documents").select($"doc_id"),
          $"doc_id" === $"user_id")
        .join(Tables(s, sf, "embeddings").select($"vec_id"),
          $"vec_id" === $"doc_id")
    val userOrder = Seq("lineitem", "orders", "supplier", "customer",
      "nation", "region", "events", "documents", "embeddings")
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain()
    assert(leafNames(off.queryExecution.optimizedPlan) === userOrder,
      "without the catalog the fact-first user order must survive")
    val offRows = off.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      val onLeaves = leafNames(on.queryExecution.optimizedPlan)
      assert(onLeaves !== userOrder,
        "the 9-relation region must now be REORDERED (it fell through " +
          "at the old MaxRelations = 8)")
      assert((onLeaves.head !== "lineitem") && (onLeaves.head !== "orders"),
        s"a fact table must not open the rebuilt 9-chain: $onLeaves")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ===
        offRows, "the 9-relation reorder must not change results")
      // the bushy flag routes the same region through DPccp — results
      // still identical, and the plan is a fixpoint
      s.conf.set(CatalogJoinReorder.BushyKey, "true")
      val bushy = chain()
      assert(bushy.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ===
        offRows, "the DPccp plan must not change results")
      val bp = bushy.queryExecution.optimizedPlan
      val again = org.apache.spark.sql.graft.OptimizerBridge
        .reoptimize(s, bp)
      assert(again.canonicalized === bp.canonicalized,
        "a second optimization pass over the DPccp plan must be a no-op")
    } finally {
      s.conf.unset(CatalogJoinReorder.BushyKey)
      s.conf.unset(CatalogJoinReorder.CatalogKey)
    }
  }

  test("coded MCV column: the registered catalog keys events' " +
      "djb2-coded event-type frequencies by the REAL column name with " +
      "the codec recorded, and an equality literal prices through the " +
      "same hash to the exact head count (ADVICE r18)") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, Planner.PipelineCatalogSpec)
    CatalogJoinReorder.invalidate(art)
    val cat = CatalogJoinReorder.load(s, art).get
    val m = cat.mcv.get("event_type")
    assert(m.isDefined,
      "the coded column must be keyed by its real base name")
    assert(m.get.codec === Some("djb2"),
      "the descriptor must record the codec")
    // a string literal prices via the SAME hash the staging applied —
    // the 5-value enum fits the head, so the estimate is EXACT
    val exact = Tables(s, sf, "events")
      .where($"event_type" === "click").count()
    val coded = m.get.code(
      org.apache.spark.unsafe.types.UTF8String.fromString("click"))
    assert(coded === Some(graft.functions.Djb2.hash("click")),
      "consult-time coding must be the staged djb2")
    assert(m.get.estEq(coded.get) === exact,
      "an in-head coded equality estimate must be the exact frequency")
    // an unknown-codec or wrong-typed literal prices nothing (factor 1
    // downstream — conservative, never wrong)
    assert(m.get.code(java.lang.Long.valueOf(7L)).isEmpty,
      "a bigint literal cannot feed a string codec")
  }

  test("ndv rescale: a correlated key-range filter on customer (range " +
      "containing the whole user_id domain) keeps the dimension pair " +
      "first — the unrescaled cascade would crown the filtered-customer " +
      "opener — and the engine-measured intermediates prove the rescaled " +
      "choice right (the q210 flip, in-engine)") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, Planner.PipelineCatalogSpec)
    def leafNames(p: LogicalPlan): Seq[String] = p match {
      case j: Join => leafNames(j.left) ++ leafNames(j.right)
      case leaf if leaf.children.isEmpty =>
        val names = leaf.output.map(_.name).toSet
        Seq(
          if (names("user_id")) "events"
          else if (names("doc_id")) "documents"
          else if (names("vec_id")) "embeddings"
          else if (names("c_custkey")) "customer"
          else "?")
      case other => other.children.flatMap(leafNames)
    }
    // σ(c_custkey ≤ 18) at sf0.001: est ≈ 18 rows, yet every one of the
    // 15 users matches — the filter range contains the user domain. The
    // unrescaled estimate (÷ ndv(c_custkey) = 150) would price the
    // σ(CU)-opener at ~240 intermediate rows and open with it; the
    // rescaled estimate (÷ min(150, 18) = 18) prices the semi-join at
    // its true ~1000 and keeps the dimension pair first.
    def chain(): DataFrame =
      Tables(s, sf, "events").select($"user_id")
        .join(Tables(s, sf, "documents").select($"doc_id"),
          $"user_id" === $"doc_id")
        .join(Tables(s, sf, "embeddings").select($"vec_id"),
          $"doc_id" === $"vec_id")
        .join(Tables(s, sf, "customer").select($"c_custkey")
          .where($"c_custkey" <= 18L),
          $"user_id" === $"c_custkey")
    val savedAqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain()
      assert(leafNames(on.queryExecution.optimizedPlan) ===
        Seq("documents", "embeddings", "events", "customer"),
        "the rescaled cascade must keep the dimension pair first")
      val (onRows, onData) = measuredIntermediates(on)
      // the unrescaled choice, built by hand: σ(customer)-opening
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val cuFirst = Tables(s, sf, "events").select($"user_id")
        .join(Tables(s, sf, "customer").select($"c_custkey")
          .where($"c_custkey" <= 18L),
          $"user_id" === $"c_custkey")
        .join(Tables(s, sf, "documents").select($"doc_id"),
          $"user_id" === $"doc_id")
        .join(Tables(s, sf, "embeddings").select($"vec_id"),
          $"doc_id" === $"vec_id")
      val (cuRows, cuData) = measuredIntermediates(cuFirst)
      assert(onRows < cuRows,
        s"the rescaled order must move fewer intermediate rows " +
          s"($onRows vs $cuRows)")
      def norm(rows: Seq[Seq[Any]]): Seq[String] =
        rows.map(_.map(String.valueOf).sorted.mkString("|")).sorted
      assert(norm(onData) === norm(cuData),
        "the rescale flip must not change results")
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("bushy enumeration (spark.graft.join.bushy): a chain with two " +
      "independently-filtered END tables and an expanding middle edge " +
      "gets a bushy plan — both arms reduce before crossing the " +
      "expansion — strictly cheaper catalog-priced than every left-deep " +
      "order; default stays left-deep; results identical either way") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureCatalog(s, sf, Planner.PipelineCatalogSpec)
    // σ(label ≤ 1) on embeddings (≈79 est rows) and σ(c_custkey ≤ 2) on
    // customer (≈2 est rows): the documents→events edge expands 2× at
    // sf0.001, so every left-deep order pays the expansion over one
    // REDUCED arm only (best: 237 est rows), while the bushy tree
    // (σEM⋈DC)⋈(EV⋈σCU) pays both arms pre-expansion (212 est rows)
    def chain(): DataFrame =
      Tables(s, sf, "events").select($"user_id")
        .join(Tables(s, sf, "documents").select($"doc_id"),
          $"user_id" === $"doc_id")
        .join(Tables(s, sf, "embeddings").select($"vec_id", $"label")
          .where($"label" <= 1L),
          $"doc_id" === $"vec_id")
        .join(Tables(s, sf, "customer").select($"c_custkey")
          .where($"c_custkey" <= 2L),
          $"user_id" === $"c_custkey")
    def leafSets(p: LogicalPlan): Option[(Set[String], Set[String])] = {
      def names(q: LogicalPlan): Set[String] =
        q.collectLeaves().flatMap(_.output.map(_.name)).toSet
      p.collectFirst { case j: Join => j } match {
        case Some(j) => Some((names(j.left), names(j.right)))
        case None => None
      }
    }
    def topJoinChildren(p: LogicalPlan): Seq[LogicalPlan] =
      p.collectFirst { case j: Join => Seq(j.left, j.right) }
        .getOrElse(Seq.empty)
    def isJoinSubtree(p: LogicalPlan): Boolean =
      p.collectFirst { case _: Join => true }.getOrElse(false)
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val offRows = chain().collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      // default: left-deep — at most one child of the top join is a join
      val ld = chain().queryExecution.optimizedPlan
      assert(topJoinChildren(ld).count(isJoinSubtree) <= 1,
        s"without the flag the plan must stay left-deep:\n$ld")
      // flag on: the top join's BOTH children are join subtrees, with
      // the two reduced arms on either side
      s.conf.set(CatalogJoinReorder.BushyKey, "true")
      val on = chain()
      val bp = on.queryExecution.optimizedPlan
      assert(topJoinChildren(bp).count(isJoinSubtree) === 2,
        s"the bushy flag must produce a bushy tree:\n$bp")
      val (lNames, rNames) = leafSets(bp).get
      val arms = Set(lNames.intersect(Set("vec_id", "doc_id", "user_id",
        "c_custkey")), rNames.intersect(Set("vec_id", "doc_id", "user_id",
        "c_custkey")))
      assert(arms === Set(Set("vec_id", "doc_id"),
        Set("user_id", "c_custkey")),
        s"the arms must be (EM⋈DC) and (EV⋈CU): $arms")
      assert(on.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) ===
        offRows, "the bushy plan must not change results")
      // fixpoint: re-optimizing the bushy output is a no-op
      val again = org.apache.spark.sql.graft.OptimizerBridge
        .reoptimize(s, bp)
      assert(again.canonicalized === bp.canonicalized,
        "a second optimization pass over the bushy plan must be a no-op")
    } finally {
      s.conf.unset(CatalogJoinReorder.BushyKey)
      s.conf.unset(CatalogJoinReorder.CatalogKey)
    }
  }

  test("determinism guard: a non-deterministic predicate between joins " +
      "leaves the region byte-identical — relocating rand() would change " +
      "results (the ExtractFiltersAndInnerJoins contract)") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    def chain(): DataFrame =
      Tables(s, sf, "orders").select($"o_orderkey", $"o_custkey")
        .join(Tables(s, sf, "lineitem").select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey")
        .where(org.apache.spark.sql.functions.rand(7) < 0.5)
        .join(Tables(s, sf, "customer").select($"c_custkey", $"c_nationkey"),
          $"c_custkey" === $"o_custkey")
        .join(Tables(s, sf, "nation").select($"n_nationkey"),
          $"n_nationkey" === $"c_nationkey")
    // Spark's own ReorderJoin hoists the rand filter ABOVE the region
    // before this rule ever sees it (leaving a clean, safely-reorderable
    // region). Exclude it so the mid-chain non-deterministic filter
    // reaches THIS rule's flattener — the exact pooling hazard the guard
    // exists for.
    val exKey = "spark.sql.optimizer.excludedRules"
    val savedEx = s.conf.getOption(exKey)
    s.conf.set(exKey, "org.apache.spark.sql.catalyst.optimizer.ReorderJoin")
    try {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      val off = chain().queryExecution.optimizedPlan
      s.conf.set(CatalogJoinReorder.CatalogKey, art)
      val on = chain().queryExecution.optimizedPlan
      assert(on.canonicalized === off.canonicalized,
        "a region with a non-deterministic pooled predicate must be " +
          "left untouched")
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      savedEx.fold(s.conf.unset(exKey))(v => s.conf.set(exKey, v))
    }
  }

  test("aggregate leaf: a leaf that is a groupBy projecting a cataloged " +
      "column is NOT priced at base-table rows — the region is left " +
      "byte-identical") {
    val s = ExtSession.spark
    import s.implicits._
    val art = Planner.ensureJoinArtifacts(s, sf)
    def chain(): DataFrame = {
      // an aggregate whose output carries the cataloged name o_orderkey
      val agg = Tables(s, sf, "orders").groupBy($"o_orderkey")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .where($"n" > 0)
      agg.join(Tables(s, sf, "lineitem").select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey")
        .join(Tables(s, sf, "customer").select($"c_custkey"),
          $"c_custkey" === $"l_orderkey")
    }
    s.conf.unset(CatalogJoinReorder.CatalogKey)
    val off = chain().queryExecution.optimizedPlan
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val on = chain().queryExecution.optimizedPlan
      assert(on.canonicalized === off.canonicalized,
        "an aggregate leaf must make the region out-of-scope")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }

  test("catalog refresh: a loaded catalog expires after the conf'd " +
      "window and the next query re-reads the maintained artifacts — " +
      "'never staler than a micro-batch' requires the planner to " +
      "actually look again") {
    val s = ExtSession.spark
    val art = Planner.ensureJoinArtifacts(s, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat-refresh")
      .toString + "/stats"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(art), new java.io.File(tmp))
    CatalogJoinReorder.invalidate(tmp)
    s.conf.set(CatalogJoinReorder.RefreshKey, "3600")
    try {
      val before = CatalogJoinReorder.load(s, tmp).get
      val nOrders = before.tables.find(_.name == "orders").get.rows
      // the stream lands another micro-batch: a new count partial
      // doubles the orders cardinality on disk
      import s.implicits._
      Seq(nOrders).toDF("n").coalesce(1).write
        .mode("append").parquet(s"$tmp/n_o/rows/batch=99")
      // inside the refresh window the stale view serves
      assert(CatalogJoinReorder.load(s, tmp).get
        .tables.find(_.name == "orders").get.rows === nOrders,
        "within the window the cached catalog must serve")
      // window elapses (refreshSec=0) → the reload sees the new partial
      s.conf.set(CatalogJoinReorder.RefreshKey, "0")
      assert(CatalogJoinReorder.load(s, tmp).get
        .tables.find(_.name == "orders").get.rows === 2 * nOrders,
        "past the window the catalog must re-read the artifacts")
    } finally {
      s.conf.unset(CatalogJoinReorder.RefreshKey)
      CatalogJoinReorder.invalidate(tmp)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp).getParentFile)
    }
  }

  test("negative-cache retry: a root that failed to load is retried " +
      "after the conf'd window — a transient failure must not disable " +
      "CBO for the JVM lifetime") {
    val s = ExtSession.spark
    val art = Planner.ensureJoinArtifacts(s, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat-retry")
      .toString + "/stats"
    CatalogJoinReorder.invalidate(tmp)
    s.conf.set(CatalogJoinReorder.RetryKey, "3600")
    s.conf.set(CatalogJoinReorder.CatalogKey, tmp)
    try {
      // first query: load fails (nothing at tmp), negative cache arms
      assert(leafTables(worstOrder(s).queryExecution.optimizedPlan) ===
        Seq("orders", "lineitem", "customer", "nation"))
      // the catalog MATERIALIZES at that path…
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(art), new java.io.File(tmp))
      // …but inside the retry window the rule still no-ops
      assert(leafTables(worstOrder(s).queryExecution.optimizedPlan) ===
        Seq("orders", "lineitem", "customer", "nation"),
        "within the retry window the negative cache must hold")
      // window elapses (retrySec=0) → the next load succeeds
      s.conf.set(CatalogJoinReorder.RetryKey, "0")
      assert(leafTables(worstOrder(s).queryExecution.optimizedPlan) ===
        Seq("customer", "nation", "orders", "lineitem"),
        "after the retry window the rule must recover without invalidate()")
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.unset(CatalogJoinReorder.RetryKey)
      CatalogJoinReorder.invalidate(tmp)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(tmp).getParentFile)
    }
  }

  test("SQL path: a FROM … JOIN … chain written fact-first in SQL text " +
      "comes out dimension-first — the rule is engine-level, not a " +
      "DataFrame-API affordance") {
    val s = ExtSession.spark
    val art = Planner.ensureJoinArtifacts(s, sf)
    Seq("nation", "customer", "orders", "lineitem").foreach { t =>
      Tables(s, sf, t).createOrReplaceTempView(t)
    }
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val q = s.sql(
        """SELECT o_orderkey, l_orderkey, c_custkey, n_nationkey
          |FROM orders
          |JOIN lineitem ON o_orderkey = l_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |JOIN nation ON n_nationkey = c_nationkey""".stripMargin)
      assert(leafTables(q.queryExecution.optimizedPlan) ===
        Seq("customer", "nation", "orders", "lineitem"),
        "the SQL-authored fact-first chain must rebuild to C.N.O.L")
    } finally s.conf.unset(CatalogJoinReorder.CatalogKey)
  }
}

object JoinReorderSpec {
  import graft.ops.{CatalogColumn, CatalogSpec, CatalogTable}

  /** The 6-table TPC-H catalog the GOO fallback legs share (one
    * ensureCatalog build serves both the 15- and 33-relation tests). */
  lazy val gooSpec: CatalogSpec = CatalogSpec(
    name = "planner_goo_test",
    tables = Seq(
      CatalogTable("rg", "region", "r_regionkey", "r_regionkey"),
      CatalogTable("ng", "nation", "n_nationkey", "n_nationkey",
        "n_regionkey"),
      CatalogTable("cg", "customer", "c_custkey", "c_nationkey",
        "c_custkey"),
      CatalogTable("og", "orders", "o_orderkey", "o_custkey",
        "o_orderkey"),
      CatalogTable("lg", "lineitem", "l_orderkey", "l_orderkey",
        "l_suppkey"),
      CatalogTable("sg", "supplier", "s_suppkey", "s_suppkey")),
    sketches = Seq(
      CatalogColumn("rg_rk", "rg", "a", "region", "r_regionkey"),
      CatalogColumn("ng_nk", "ng", "a", "nation", "n_nationkey"),
      CatalogColumn("ng_rk", "ng", "b", "nation", "n_regionkey"),
      CatalogColumn("cg_nk", "cg", "a", "customer", "c_nationkey"),
      CatalogColumn("cg_ck", "cg", "b", "customer", "c_custkey"),
      CatalogColumn("og_ck", "og", "a", "orders", "o_custkey"),
      CatalogColumn("og_ok", "og", "b", "orders", "o_orderkey"),
      CatalogColumn("lg_ok", "lg", "a", "lineitem", "l_orderkey"),
      CatalogColumn("lg_sk", "lg", "b", "lineitem", "l_suppkey"),
      CatalogColumn("sg_sk", "sg", "a", "supplier", "s_suppkey")))
}
