package graft.plans

import java.io.File

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Range}
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.ops.{CatalogColumn, CatalogSpec, CatalogTable, Planner}

/** MCV-HEAD DRIFT for user catalogs (VERDICT r19 #6): the histogram
  * side of a built catalog gained a no-rebuild drift seam in r19
  * ([[Planner.appendHistBatch]] — CatalogHistDriftSpec); the MCV head,
  * which feeds q209/q215-style equality pricing AND
  * [[SkewSaltJoin]]'s salt decision, could until now only refresh by
  * full re-stage. [[Planner.appendMcvBatch]] routes one micro-batch of
  * new key values through the literal bounded heavy-hitter maintenance
  * body, so a NEW heavy hitter appearing after build enters the merged
  * head as one ≤ M+1-row partial — this spec pins the salt DECISION
  * flipping from plain to salted on the same join text without any
  * rebuild, with identical results either way.
  */
class CatalogMcvDriftSpec extends AnyFunSuite {

  private def hasRangeLeaf(p: LogicalPlan): Boolean =
    p.collectFirst { case _: Range => true }.getOrElse(false)

  test("a new heavy hitter appended through appendMcvBatch flips the " +
      "salt decision without a rebuild: the uniform-key build leaves " +
      "the join plain; one appended bounded partial puts the hot key " +
      "in the merged head and the SAME join text comes out salted — " +
      "results identical") {
    val s = ExtSession.spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mcv-drift")
      .toString
    // 2000 rows, every key distinct — maxHead 1, far under any budget
    s.range(1, 2001).selectExpr("id as g")
      .coalesce(1).write.parquet(s"$tmp/gtab.parquet")
    val spec = CatalogSpec(
      name = "planner_mcvdrift_test",
      tables = Seq(CatalogTable("g", "gtab", "g", "g")),
      sketches = Seq(CatalogColumn("g_k", "g", "a", "gtab", "g")),
      mcvs = Seq(CatalogColumn("g_mcv", "g", "a", "gtab", "g",
        bounded = true)))
    val savedParts = s.conf.get("spark.sql.shuffle.partitions")
    val savedBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.shuffle.partitions", "64")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set(Planner.MaintainKey, "3600")
    val art = Planner.ensureCatalog(s, tmp, spec)
    s.conf.set(CatalogJoinReorder.CatalogKey, art)
    s.conf.set(SkewSaltJoin.SaltKey, "true")
    def joined(): DataFrame =
      Tables(s, tmp, "gtab")
        .join(Seq(1L, 2L, 3L, 4L, 5L).toDF("dv"), $"g" === $"dv")
    try {
      val plain = joined()
      assert(!hasRangeLeaf(plain.queryExecution.optimizedPlan),
        "with a uniform maintained head the join must stay plain")
      val rows = plain.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      // the stream lands a drifted micro-batch: key 7 arrives 5000
      // times — one bounded partial, no re-stage, no replay
      Planner.appendMcvBatch(s, art, "g_mcv",
        s.range(5000).select(org.apache.spark.sql.functions.lit(7L)
          .as("v")), batchId = Planner.ReplayCarves + 100L)
      val salted = joined()
      val bp = salted.queryExecution.optimizedPlan
      assert(hasRangeLeaf(bp),
        s"the appended heavy hitter must flip the decision to salted:\n$bp")
      // S caps at the task count: ⌈(5000 + 1) ÷ (2000/64)⌉ = 162 → 64
      val nSalt = bp.collectFirst { case r: Range => r.end }.get
      assert(nSalt === 64L,
        s"the salt count must come off the appended head ($nSalt)")
      assert(salted.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
        === rows, "the drift-flipped plan must not change results")
    } finally {
      s.conf.unset(SkewSaltJoin.SaltKey)
      s.conf.unset(CatalogJoinReorder.CatalogKey)
      s.conf.unset(Planner.MaintainKey)
      s.conf.set("spark.sql.shuffle.partitions", savedParts)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      CatalogJoinReorder.invalidate(art)
      FileUtils.deleteQuietly(new File(tmp))
    }
  }
}
