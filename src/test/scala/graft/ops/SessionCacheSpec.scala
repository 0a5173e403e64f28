package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** The shared-plan SessionCache's liveness contract (VERDICT r10 #4 /
  * ADVICE r9): ONLY a missing-checkpoint-block failure self-heals by
  * rebuilding; any other probe failure — an unreadable corpus, a real
  * executor fault — propagates, so a genuine fault is never masked as
  * cache staleness and "fixed" by a doomed rebuild.
  */
class SessionCacheSpec extends SparkSpec {

  test("missing-checkpoint-block classifier: checkpoint losses yes, real faults no") {
    def chain(t: Throwable, depth: Int): Throwable =
      if (depth == 0) t else chain(new RuntimeException("wrap", t), depth - 1)
    assert(SessionCache.isMissingCheckpointBlock(
      new org.apache.spark.SparkException(
        "Checkpoint block rdd_42_3 not found! Either the executor that " +
          "originally checkpointed this partition is no longer alive ...")))
    assert(SessionCache.isMissingCheckpointBlock(
      new org.apache.spark.storage.BlockNotFoundException("rdd_42_3")))
    assert(SessionCache.isMissingCheckpointBlock(
      chain(new IllegalStateException("Cannot call methods on a stopped SparkContext"), 3)))
    // deeply-wrapped checkpoint loss is still recognized
    assert(SessionCache.isMissingCheckpointBlock(
      chain(new org.apache.spark.storage.BlockNotFoundException("rdd_7_0"), 5)))
    // real faults must NOT classify as staleness
    assert(!SessionCache.isMissingCheckpointBlock(
      new java.io.FileNotFoundException("/data/corpus/part-0000.parquet")))
    assert(!SessionCache.isMissingCheckpointBlock(
      chain(new OutOfMemoryError("GC overhead limit exceeded"), 2)))
    assert(!SessionCache.isMissingCheckpointBlock(
      new org.apache.spark.SparkException("Job aborted due to stage failure")))
    assert(!SessionCache.isMissingCheckpointBlock(
      new RuntimeException(null: String)))
  }

  test("evicted checkpoint blocks rebuild; a genuine read fault propagates") {
    val s = spark
    import s.implicits._
    val cache = new SessionCache
    val dir = Files.createTempDirectory("graft-sc-").toString

    // (a) self-heal: cache a localCheckpoint'd plan, then evict its RDD
    // blocks — the next getOrBuild must probe, classify, and rebuild
    var builds = 0
    def build() = { builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint(true) }
    val before = s.sparkContext.getPersistentRDDs.keySet
    val first = cache.getOrBuild(s, dir)(build())
    assert(builds === 1 && first.count() === 2L)
    assert(cache.getOrBuild(s, dir)(build()).count() === 2L)
    assert(builds === 1, "warm hit must not rebuild")
    // evict ONLY this entry's checkpoint blocks (a shared test session —
    // other suites' staged assets must stay untouched)
    s.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
      .values.foreach(_.unpersist(true))
    val healed = cache.getOrBuild(s, dir)(build())
    assert(builds === 2, "missing checkpoint blocks must trigger ONE rebuild")
    assert(healed.count() === 2L)

    // (b) propagate: cache an UNCHECKPOINTED scan, delete its files —
    // the probe's FileNotFound is a real fault and must escape, and the
    // broken entry must not be silently replaced
    val cache2 = new SessionCache
    val data = Files.createTempDirectory("graft-sc-data-").toString
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite").parquet(data)
    var builds2 = 0
    def build2() = { builds2 += 1; s.read.parquet(data) }
    assert(cache2.getOrBuild(s, dir)(build2()).count() === 1L)
    assert(builds2 === 1)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(data))
    val thrown = intercept[Throwable] { cache2.getOrBuild(s, dir)(build2()) }
    assert(!SessionCache.isMissingCheckpointBlock(thrown) ||
      // some Spark versions wrap FNF in a generic SparkException; the
      // contract under test is that NO rebuild happened
      builds2 === 1)
    assert(builds2 === 1, "a real read fault must propagate, not rebuild")
  }
}
