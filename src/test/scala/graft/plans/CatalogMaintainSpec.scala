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
}
