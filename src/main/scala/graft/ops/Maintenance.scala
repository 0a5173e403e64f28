package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-maintenance operators: the mutation verbs a managed lake
  * needs around the read-only analytics — MERGE (upsert) and targeted
  * deletion with partition-pruned rewrite. Spark on parquet has no
  * transactional MERGE/DELETE; these are the hand-rolled shapes every
  * pre-Delta production lake ran (and what Delta/Iceberg compile to
  * underneath): join-based row reconciliation + partition-scoped file
  * replacement.
  */
object Maintenance {

  // ---------------------------------------------------------------- q99
  /** Batch MERGE delta — upsert a deterministic change batch into the
    * orders dimension: every `o_orderkey % 11 = 0` row is an UPDATE
    * (price bumped +1.00, status 'U'), every `% 101 = 0` key spawns an
    * INSERT under the NEGATED key space (−k−1 — disjoint from the
    * positive real keys at every scale factor, where a fixed offset
    * would eventually collide). The query
    * returns the merge DELTA — one row per source row with its action and
    * before/after values — which is both the audit log a production MERGE
    * emits and a bounded result at any scale (the delta is source-sized,
    * never target-sized). The merged table itself is
    * `target ANTI source ∪ source` — one hash join on the key.
    *
    * Scale shape: the action decision is a LEFT join of the change batch
    * against the target keyed on o_orderkey — both sides hash-partition
    * on the same key, the only wide exchange. At 100 TB the target side
    * would be bucketed on the key (q38) making the merge join
    * exchange-free on the big side. */
  def q99MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val target = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    val updates = target.filter($"o_orderkey" % 11 === 0)
      .select($"o_orderkey", ($"o_totalprice" + 1.0).as("new_price"),
        lit("U").as("new_status"))
    val inserts = target.filter($"o_orderkey" % 101 === 0)
      .select((-$"o_orderkey" - 1L).as("o_orderkey"),
        ($"o_orderkey" % 1000).cast("double").as("new_price"),
        lit("N").as("new_status"))
    val source = updates.unionByName(inserts)
    // presence is tested on a non-null MARKER, not on a nullable measure:
    // an existing row whose o_totalprice happens to be NULL must still
    // classify as an update
    source.join(target.select($"o_orderkey", lit(1L).as("matched"),
        $"o_totalprice".as("old_price"), $"o_orderstatus".as("old_status")),
      Seq("o_orderkey"), "left")
      .withColumn("action",
        when($"matched".isNull, "insert").otherwise("update"))
      .select($"o_orderkey", $"action", $"old_price", $"old_status",
        $"new_price", $"new_status")
      .orderBy($"o_orderkey")
  }

  val q99Oracle: String =
    """WITH target AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |source AS (
      |  SELECT o_orderkey, o_totalprice + 1.0 AS new_price, 'U' AS new_status
      |  FROM target WHERE o_orderkey % 11 = 0
      |  UNION ALL
      |  SELECT -o_orderkey - 1 AS o_orderkey,
      |    CAST(o_orderkey % 1000 AS DOUBLE) AS new_price, 'N' AS new_status
      |  FROM target WHERE o_orderkey % 101 = 0)
      |SELECT s.o_orderkey,
      |  CASE WHEN t.o_orderkey IS NULL THEN 'insert' ELSE 'update' END AS action,
      |  t.o_totalprice AS old_price, t.o_orderstatus AS old_status,
      |  s.new_price, s.new_status
      |FROM source s LEFT JOIN target t ON t.o_orderkey = s.o_orderkey
      |ORDER BY s.o_orderkey""".stripMargin

  // --------------------------------------------------------------- q100
  /** Targeted deletion with partition-pruned rewrite (the
    * right-to-be-forgotten shape): events land in a day-bucketed lake;
    * forgetting the `user_id % 97 = 0` users must rewrite ONLY the
    * buckets that actually contain those users' rows — never the whole
    * lake. The query performs the real file surgery under
    * `target/forget/<sf>`: (1) write the bucketed lake, (2) find the
    * affected buckets (an aggregation over just the forget set),
    * (3) rewrite those buckets with the users anti-joined out, via
    * dynamic partition overwrite so untouched buckets keep their
    * original files, (4) read the lake back and return per-bucket
    * surviving counts — which the oracle recomputes relationally, so the
    * whole rewrite path is hash-checked end to end.
    *
    * Scale shape: the forget set's bucket list is an aggregation over
    * only the matching rows (collision-proportional); the rewrite reads
    * and writes only the affected directories (partition pruning on the
    * read, dynamic overwrite on the write). Day granularity at fixture
    * scale (hour buckets made the registered query directory-count-bound:
    * thousands of near-empty dirs at sf0.1); a 100 TB lake with real
    * file sizes per partition uses hours. At 100 TB with deletions
    * clustered in time, this touches a sliver of the lake — the reason
    * every lakehouse delete is built exactly this way. */
  def q100ForgetUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = s"/root/repo/target/forget/${new java.io.File(dir).getName}"
    val lake = s"$root/events_lake"
    val events = Tables(s, dir, "events")
      .withColumn("day_bucket", expr("unix_millis(ts) div 86400000"))
    // (1) the standing lake — day-bucketed directories
    events.write.mode("overwrite").partitionBy("day_bucket").parquet(lake)
    // (2) buckets that actually hold forbidden rows — aggregate over the
    // forget set only
    // day_bucket comes back as an INFERRED partition column (int-typed
    // when small) — cast before collecting
    val affected = s.read.parquet(lake)
      .filter($"user_id" % 97 === 0)
      .select($"day_bucket".cast("long")).distinct()
      .collect().map(_.getLong(0)) // bucket ids: bounded (days, not rows)
    // (3) rewrite ONLY those buckets, dynamic overwrite keeps the rest.
    // Edge handled explicitly: dynamic overwrite only replaces partitions
    // PRESENT in the new data, so a bucket whose every row is forbidden
    // produces no output rows and would silently keep its old files — its
    // directory must be dropped outright.
    val survivors = s.read.parquet(lake)
      .filter($"day_bucket".isin(affected.toSeq: _*))
      .filter(pmod($"user_id", lit(97L)) =!= 0)
      .persist()
    // survivor buckets are collected BEFORE the overwrite: the collect
    // also materializes the cache, and the deletion decision must never
    // depend on recomputing `survivors` against a lake whose files the
    // overwrite commit has already replaced (cache loss there would
    // read deleted files — or, with ignoreMissingFiles, silently decide
    // every affected bucket is empty and drop legitimate data)
    val survivorBuckets = survivors.select($"day_bucket".cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_bucket")
      .parquet(lake)
    survivors.unpersist()
    (affected.toSet -- survivorBuckets).foreach { b =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$lake/day_bucket=$b"))
    }
    // (4) audit from the lake as rewritten
    s.read.parquet(lake)
      .groupBy($"day_bucket".cast("long").as("day_bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(pmod($"user_id", lit(97L)) === 0, 1L).otherwise(0L))
          .as("n_forbidden"))
      .orderBy($"day_bucket")
  }

  val q100Oracle: String =
    """SELECT epoch_ms(ts) // 86400000 AS day_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(0 AS BIGINT) AS n_forbidden
      |FROM events
      |WHERE user_id % 97 <> 0
      |GROUP BY 1 ORDER BY day_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_merge_upsert" -> q99MergeUpsert _,
    "q100_forget_users" -> q100ForgetUsers _,
  )

  val oracles: Map[String, String] = Map(
    "q99_merge_upsert" -> q99Oracle,
    "q100_forget_users" -> q100Oracle,
  )
}
