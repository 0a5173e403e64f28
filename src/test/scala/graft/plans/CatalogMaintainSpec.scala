package graft.plans

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}
import graft.ops.{CatalogColumn, CatalogSpec, CatalogTable, Planner}

/** Standing maintenance for REGISTERED user catalogs (VERDICT r18 #3):
  * r18's ensureCatalog pinned a build-time snapshot per (dir, spec) for
  * the JVM lifetime, so the reorder rule's 60s artifact re-read could
  * never see new data for user specs. Now a cached build is trusted for
  * `spark.graft.catalog.maintainSec`; past the window the base tables'
  * row counts are re-probed and a moved signature re-stages + replays
  * (and invalidates the rule's cached load). This spec appends rows to
  * a registered table and pins the reorder DECISION changing after the
  * window — without any explicit evict.
  */
class CatalogMaintainSpec extends AnyFunSuite {

  private def leafNames(p: LogicalPlan): Seq[String] = p match {
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

  test("rows appended to a registered table change the reorder decision " +
      "after the maintain window — no explicit evict: within the window " +
      "the snapshot serves; past it the moved count signature re-stages, " +
      "replays, and invalidates the rule's cached load") {
    val s = ExtSession.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // a private mutable fixture: the spec APPENDS to supplier, which the
    // shared immutable sf dirs must never see
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat-maint")
      .toString
    for (t <- Seq("supplier", "nation", "customer"))
      FileUtils.copyFile(new File(s"${SparkSpec.sf}/$t.parquet"),
        new File(s"$tmp/$t.parquet/part-00000.parquet"))
    val spec = CatalogSpec(
      name = "planner_maint_test",
      tables = Seq(
        CatalogTable("sm", "supplier", "s_suppkey", "s_nationkey"),
        CatalogTable("nm", "nation", "n_nationkey", "n_nationkey"),
        CatalogTable("cm", "customer", "c_custkey", "c_nationkey")),
      sketches = Seq(
        CatalogColumn("sm_nk", "sm", "a", "supplier", "s_nationkey"),
        CatalogColumn("nm_nk", "nm", "a", "nation", "n_nationkey"),
        CatalogColumn("cm_nk", "cm", "a", "customer", "c_nationkey")))
    def chain(): DataFrame =
      Tables(s, tmp, "customer").select($"c_nationkey")
        .join(Tables(s, tmp, "nation").select($"n_nationkey"),
          $"c_nationkey" === $"n_nationkey")
        .join(Tables(s, tmp, "supplier").select($"s_nationkey"),
          $"n_nationkey" === $"s_nationkey")
    // the rule re-reads artifacts every query: staleness in this spec
    // must come from the ARTIFACTS, not the rule's own load cache
    s.conf.set(CatalogJoinReorder.RefreshKey, "0")
    s.conf.set(Planner.MaintainKey, "3600")
    val art = Planner.ensureCatalog(s, tmp, spec)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      assert(leafNames(chain().queryExecution.optimizedPlan) ===
        Seq("nation", "supplier", "customer"),
        "fresh build: the 10-row supplier pair must open the plan")
      // the standing stream lands more data: supplier grows ~2000× and
      // becomes the region's biggest table (materialized first — a lazy
      // self-read-append would race its own input)
      val sup = s.read.parquet(s"$tmp/supplier.parquet")
      val grown = sup.crossJoin(s.range(1999))
        .select(sup.columns.map(col): _*)
      val rows = grown.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), sup.schema)
        .write.mode("append").parquet(s"$tmp/supplier.parquet")
      // WITHIN the maintain window the snapshot serves — same decision
      val artIn = Planner.ensureCatalog(s, tmp, spec)
      assert(artIn === art)
      assert(leafNames(chain().queryExecution.optimizedPlan) ===
        Seq("nation", "supplier", "customer"),
        "within the window the stale snapshot must still serve")
      // PAST the window the count signature has moved → rebuild; the
      // 20k-row supplier sinks and the customer-first user order is
      // now itself optimal (the settled check keeps it)
      s.conf.set(Planner.MaintainKey, "0")
      val art2 = Planner.ensureCatalog(s, tmp, spec)
      assert(art2 === art, "the rebuild lands under the same root")
      assert(leafNames(chain().queryExecution.optimizedPlan) ===
        Seq("customer", "nation", "supplier"),
        "past the window the rebuilt catalog must change the decision")
      // and an unmoved signature past the window only revalidates —
      // the decision is stable
      val art3 = Planner.ensureCatalog(s, tmp, spec)
      assert(art3 === art)
      assert(leafNames(chain().queryExecution.optimizedPlan) ===
        Seq("customer", "nation", "supplier"))
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.unset(CatalogJoinReorder.RefreshKey)
      s.conf.unset(Planner.MaintainKey)
      CatalogJoinReorder.invalidate(art)
      FileUtils.deleteQuietly(new File(tmp))
    }
  }

  test("SAME-COUNT overwrite (VERDICT r19 #3): a registered table " +
      "rewritten in place with an identical row count but a shifted " +
      "key domain — invisible to the old row-count signature — moves " +
      "the FILE-FOOTPRINT signature, rebuilds past the maintain " +
      "window, and the reorder decision changes") {
    val s = ExtSession.spark
    import s.implicits._
    import graft.ops.{CatalogColumn, CatalogSpec, CatalogTable}
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat-sig")
      .toString
    // T1 80 rows (a1 over 20 values) — T2 100 rows (a2 over 20, b2 over
    // 5) — T3 600 rows. T3's join key starts ALL-DISTINCT (1..600), so
    // est|T2⋈T3| = 100·600/600 = 100 beats est|T1⋈T2| = 80·100/20 =
    // 400 and the (T2,T3) pair opens. The overwrite keeps T3 at 600
    // rows but collapses the key domain to 5 values — est|T2⋈T3| jumps
    // to 12,000 and (T1,T2) must open instead.
    s.range(1, 81).selectExpr("id % 20 + 1 as a1")
      .coalesce(1).write.parquet(s"$tmp/t1tab.parquet")
    s.range(1, 101).selectExpr("id % 20 + 1 as a2", "id % 5 + 1 as b2")
      .coalesce(1).write.parquet(s"$tmp/t2tab.parquet")
    s.range(1, 601).selectExpr("id as c3")
      .coalesce(1).write.parquet(s"$tmp/t3tab.parquet")
    val spec = CatalogSpec(
      name = "planner_sig_test",
      tables = Seq(
        CatalogTable("t1", "t1tab", "a1", "a1"),
        CatalogTable("t2", "t2tab", "a2", "a2", "b2"),
        CatalogTable("t3", "t3tab", "c3", "c3")),
      sketches = Seq(
        CatalogColumn("t1_a", "t1", "a", "t1tab", "a1"),
        CatalogColumn("t2_a", "t2", "a", "t2tab", "a2"),
        CatalogColumn("t2_b", "t2", "b", "t2tab", "b2"),
        CatalogColumn("t3_c", "t3", "a", "t3tab", "c3")))
    def chain(): org.apache.spark.sql.DataFrame =
      Tables(s, tmp, "t1tab")
        .join(Tables(s, tmp, "t2tab"), $"a1" === $"a2")
        .join(Tables(s, tmp, "t3tab"), $"b2" === $"c3")
    def leafNames2(p: LogicalPlan): Seq[String] = p match {
      case j: Join => leafNames2(j.left) ++ leafNames2(j.right)
      case leaf if leaf.children.isEmpty =>
        val names = leaf.output.map(_.name).toSet
        Seq(
          if (names("a1")) "t1tab"
          else if (names("a2")) "t2tab"
          else if (names("c3")) "t3tab"
          else "?")
      case other => other.children.flatMap(leafNames2)
    }
    s.conf.set(CatalogJoinReorder.RefreshKey, "0")
    s.conf.set(Planner.MaintainKey, "3600")
    val art = Planner.ensureCatalog(s, tmp, spec)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    try {
      val before = s.read.parquet(s"$tmp/t3tab.parquet").count()
      assert(leafNames2(chain().queryExecution.optimizedPlan) ===
        Seq("t2tab", "t3tab", "t1tab"),
        "fresh build: the all-distinct T3 edge must open the plan")
      // the in-place rewrite: SAME row count, collapsed key domain
      s.range(1, 601).selectExpr("id % 5 + 1 as c3")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/t3tab.parquet")
      assert(s.read.parquet(s"$tmp/t3tab.parquet").count() === before,
        "the overwrite must preserve the row count — the exact move " +
          "the old count signature could not see")
      // within the maintain window the snapshot serves
      assert(Planner.ensureCatalog(s, tmp, spec) === art)
      assert(leafNames2(chain().queryExecution.optimizedPlan) ===
        Seq("t2tab", "t3tab", "t1tab"),
        "within the window the stale snapshot must still serve")
      // past the window: the footprint moved (new file names/mtimes at
      // the same row count) → rebuild → the decision flips
      s.conf.set(Planner.MaintainKey, "0")
      assert(Planner.ensureCatalog(s, tmp, spec) === art,
        "the rebuild lands under the same root")
      assert(leafNames2(chain().queryExecution.optimizedPlan) ===
        Seq("t1tab", "t2tab", "t3tab"),
        "the collapsed T3 key domain must flip the opener to (T1,T2)")
    } finally {
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.unset(CatalogJoinReorder.RefreshKey)
      s.conf.unset(Planner.MaintainKey)
      CatalogJoinReorder.invalidate(art)
      FileUtils.deleteQuietly(new File(tmp))
    }
  }
}
