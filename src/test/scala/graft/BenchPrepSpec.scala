package graft

/** VERDICT r15 #2 — preps self-correct: a prep stamp that trips the ≥2×
  * line re-runs as a clean evict-and-rebuild after the main loop, and the
  * final stamp is min(original, rebuild). In the r15 run preps were the
  * largest stamps in the file and took the worst disk-load inflation
  * (compact_prep stamped 26.9s vs 2.26s judge-isolated) while being
  * excluded from the re-pass by design; unlike gates they are clean
  * rebuilds, so a cold re-run cannot understate them.
  */
class BenchPrepSpec extends SparkSpec {

  override val sf = "/root/testdata/sf0.001"

  test("every prep entry Bench stamps has a rerun recipe") {
    // joinstats_prep folded into planner_prep in r18 (the combined
    // single-pass artifact build — VERDICT r17 #5)
    val prepNames = Set("dedup_prep", "forget_prep", "compact_prep",
      "suffix_prep", "ann_prep", "planner_prep")
    assert(Bench.prepReruns(spark, sf).keySet === prepNames)
    assert(Bench.PrepNames === prepNames,
      "the parse universe must cover every rerun recipe")
  }

  test("an artificially-inflated compact_prep re-stamps within noise of " +
    "its quiesced rebuild cost (the r15 26.9s-vs-2.26s scenario)") {
    // quiesced truth: a direct evict + timed rebuild under the same
    // ambient conditions (ratio comparison, never absolute bands —
    // LoadCanarySpec lesson)
    graft.ops.Maintenance.evictFragmentedLake(spark, sf)
    val t0 = System.nanoTime()
    graft.ops.Maintenance.ensureFragmentedLake(spark, sf)
    val quiesced = (System.nanoTime() - t0) / 1e9
    // simulate a load-inflated original stamp (12× the r15 pathology)
    val original = quiesced * 12
    val stamped = Bench.rerunPrep(spark, sf, "compact_prep", original)
    assert(stamped < original,
      s"rerun must improve an inflated stamp: $stamped vs $original")
    // "within noise": the rebuild measures the same work as the direct
    // timing just taken — same session, same page-cache state; 3× is a
    // generous same-conditions band
    assert(stamped <= quiesced * 3 && stamped > 0,
      s"rebuild $stamped should sit near the quiesced cost $quiesced")
  }

  test("a rerun can only lower a stamp, and failures keep the original") {
    // min(original, rebuild): an already-fast stamp survives a slower rerun
    val fast = Bench.rerunPrep(spark, sf, "compact_prep", 0.000001)
    assert(fast === 0.000001)
    // unknown prep name → original unchanged (no recipe, no crash)
    assert(Bench.rerunPrep(spark, sf, "no_such_prep", 7.0) === 7.0)
    // a rerun whose build throws (bad fixture dir) keeps the original
    assert(Bench.rerunPrep(spark, "/nonexistent/sf", "compact_prep", 5.0)
      === 5.0)
  }
}
