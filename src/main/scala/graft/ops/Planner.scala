package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.{ManifestStream, McvStream, NdvStream, StatsStream}

/** The operational close of the optimizer-statistics family (VERDICT r15
  * #5/#6): q197–q204 built and graded the statistics a planner keeps;
  * S28–S32 maintain them as streams; until now nothing READ the
  * maintained artifacts to make a decision. q205 costs one real
  * two-table join — broadcast-vs-shuffle choice plus files-to-open —
  * entirely from parquet artifacts a stream maintained, and grades every
  * estimate against exact truth, q201-style. q206 is the second
  * consumer: the Iceberg bin-packing loop, planning compaction rewrites
  * from the manifest's zones and pricing read amplification
  * before/after. q207 (VERDICT r16 #4) is the third: the full System-R
  * left-deep join-ORDER enumeration over the N–C–O–L chain, reading
  * ONLY a per-table catalog ([[ensureJoinArtifacts]]) the same one-pass
  * stream pattern maintains.
  *
  * The artifact suite ([[ensureArtifacts]]) is maintained by ONE
  * streaming pass — since r18 the SAME pass that builds both join
  * catalogs ([[buildAll]]): a single staged union replays all declared
  * tables as [[ReplayCarves]] deterministic micro-batches, and each batch fans
  * concurrently to every maintainer's own per-batch body (the literal
  * S28/S29/S31/S32 `processBatch` code, so the audit-driven and the
  * engine-driven artifacts cannot drift). The planner suite's share:
  *
  *  - `hist/`  — S28 4096-bin histogram of o_totalprice under staged
  *    global bounds ([[StatsStream]]),
  *  - `ndv/`   — S29 KMV sketch of o_custkey ([[NdvStream]]),
  *  - `mcv/`   — S31 value-count table of o_custkey ([[McvStream]]),
  *  - `data/` + `manifest/` — S32 z-laid files with 2-column footer
  *    zones over (p = o_totalprice, d = o_custkey) ([[ManifestStream]]),
  *  - `bounds/` — the staged scaling generation (4 doubles), persisted
  *    because a catalog's staged bounds ARE an artifact, not a rescan.
  *
  * Oracle-checkability rests on properties each stream spec pins: the
  * merged ndv sketch, MCV table, and fixed-bounds histogram are EQUAL to
  * their one-pass batch twins for any batching (associative /
  * commutative reductions), and the S32 Morton-cell carve is
  * deterministic per batch — with the batch carve itself deterministic
  * (`kmvHash(o_orderkey) % ReplayCarves`, one file per micro-batch),
  * DuckDB can
  * recompute every artifact from the base table and land on identical
  * integers.
  *
  * Reference anchor: the reference's only planning inputs are config
  * constants (app.ts:36,46,51 — buffer sizes and rate ceilings); this
  * family is the engine-infrastructure surface a 100 TB deployment of
  * the same pipeline would need.
  */
object Planner {

  /** Audited predicate thresholds: t_k = mn + k·(mx−mn)/64 for k ∈
    * {1, 8, 48} — one under the broadcast crossover (N/31 rows at
    * [[Workers]] = 32), one near the decade of it, one far above — so
    * the broadcast-vs-shuffle decision actually flips across preds. */
  private val Ks = Seq(1, 8, 48)

  /** MCV slots the join estimate absorbs exactly (q203's k = 32 point). */
  private[graft] val McvSlots = 32

  /** Cost-model fanout of a broadcast: every worker receives the build
    * side once (rows moved = 32·|build|), vs a shuffle moving each side
    * once. The q201 currency — rows through the network. */
  private val Workers = 32

  /** q206: target output file count for the compaction plan. */
  private val OutFiles = 8

  /** Replay micro-batches per catalog build (the deterministic
    * `kmvHash(carveKey) % ReplayCarves` carve). 4 → 2 in r19 (VERDICT
    * r18 #4): every artifact is batch-invariant by construction —
    * min-K-of-union, summed counts, fixed-bounds bins — so the carve
    * count is free for correctness, and the per-batch fan's tiny-job
    * scheduling floor is the dominant planner_prep cost, so fewer
    * batches is directly wall-clock. The bounded-MCV partials and the
    * S32 cells ARE carve-shaped — their oracles recompute the same
    * `% ReplayCarves` carve, so both engines move together. */
  private[graft] val ReplayCarves = 2

  /** The q205 hybrid join estimate over catalog scalars: MCV head exact
    * + uniform tail over the sketch's estimated remainder, scaled by the
    * predicate selectivity under attribute independence — the identical
    * integer arithmetic to the oracle's
    * `(est_sel * (mcv_sq + (n−mcv_n)² // greatest(ndv−k, 1))) // n`.
    * Driver-side Long arithmetic is overflow-CHECKED (multiplyExact /
    * addExact) so an SF1000-scale catalog fails LOUDLY instead of
    * silently wrapping — the q199 DECIMAL caveat, machine-checked by
    * LayoutSpec's "int64 headroom" spec. */
  private[graft] def hybridJoinEst(estSel: Long, mcvSq: Long, mcvN: Long,
      nRows: Long, ndvEst: Long): Long = {
    val tail = Math.multiplyExact(nRows - mcvN, nRows - mcvN) /
      math.max(ndvEst - McvSlots, 1L)
    Math.multiplyExact(estSel, Math.addExact(mcvSq, tail)) / nRows
  }

  // ------------------------------------------------------ artifact build

  // Keyed on the sf DIR alone, never the SparkSession OBJECT (ADVICE
  // r16 — the Tables schema-cache contract: an object key strongly pins
  // stopped test sessions for the JVM's lifetime). The artifacts are
  // deterministic standing parquet under a dir-derived scratch path, so
  // a later session in the same JVM legitimately reuses the build — the
  // same way a planner reuses a catalog. evictSession (the bench prep's
  // cold-rebuild hook) clears the whole map: only one sf dir is live per
  // entry point, and an over-wide evict costs a rebuild, never
  // correctness.
  // ConcurrentHashMap.computeIfAbsent, NOT TrieMap.getOrElseUpdate
  // (ADVICE r17): the TrieMap form is not atomic — two threads asking
  // for the same dir could both run the builder, whose first act is a
  // deleteQuietly of the shared scratch root, one build deleting the
  // other's in-progress stream output. computeIfAbsent holds the bin
  // lock for the key, so exactly one build runs per root and latecomers
  // block until it lands.
  private val cacheAll = new java.util.concurrent
    .ConcurrentHashMap[String, (String, String, String)]

  private[graft] def evictSession(s: SparkSession): Unit = {
    cacheAll.clear()
    cacheJoin.clear()
  }

  /** Run independent per-batch maintainer bodies concurrently against a
    * persisted (and pre-materialized) micro-batch. Each leg is its own
    * tiny Spark job writing its own artifact partition — they share no
    * output path, and a cached batch serves all of them, so the wall
    * cost of a batch is max(leg) instead of sum(legs). VERDICT r16 #6:
    * the sequential fan was the dominant planner_prep cost (tiny-job
    * scheduling floors × 16 jobs). */
  /** Fan concurrency: 32 simultaneous tiny Spark jobs inflate EVERY
    * leg's wall ~10× (scheduler + commit contention — profiled r19:
    * even a precomputed 1-row count write reads 1.4s inside a 32-wide
    * fan vs ~0.1s isolated), so the fan runs bounded waves instead.
    * Overridable for profiling via SPARK_GRAFT_FAN_PAR. */
  private def fanPar: Int = math.max(1, scala.util.Try(
    sys.env.getOrElse("SPARK_GRAFT_FAN_PAR", "8").toInt).getOrElse(8))

  private[graft] def fanOut(legs: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    // A DEDICATED bounded pool, not the global pool (r19 — see
    // [[fanPar]]): each leg blocks inside a Spark action, and an
    // unbounded fan makes every concurrent job ~10× slower than the
    // same job in a small wave, so max(leg) stops being the wall.
    // Every leg is awaited TO COMPLETION before any failure is rethrown
    // (ADVICE r17): Future.sequence rethrows on the first failed leg
    // while siblings keep running, and the streaming engine's retry of
    // the same foreachBatch could then overwrite the same batch=<id>
    // artifact partitions concurrently with the orphans — a torn write.
    val dbg = sys.env.contains("SPARK_GRAFT_FAN_DEBUG")
    // DAEMON threads (ADVICE r19): a leg that somehow survives the
    // timeout teardown below must never pin JVM exit.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fanPar,
      new java.util.concurrent.ThreadFactory {
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-fan")
          t.setDaemon(true)
          t
        }
      })
    val ec = ExecutionContext.fromExecutorService(pool)
    try {
      implicit val fanEc: ExecutionContext = ec
      val done = Await.result(
        Future.sequence(legs.zipWithIndex.map { case (f, i) =>
          Future {
            val t0 = System.nanoTime()
            val r = scala.util.Try(f())
            if (dbg) System.err.println(
              f"[fan] leg $i%2d ${(System.nanoTime() - t0) / 1e9}%.2fs")
            r
          }
        }), 10.minutes)
      done.collectFirst { case scala.util.Failure(e) => throw e }
      ()
    } catch { case e: java.util.concurrent.TimeoutException =>
      // ADVICE r19: on the Await timeout the still-running legs must
      // not outlive this call — the streaming engine's retry of the
      // batch would otherwise overwrite batch=<id> partitions
      // CONCURRENTLY with the orphans (the torn write the happy path's
      // await-to-completion discipline exists to prevent). shutdownNow
      // interrupts the leg threads (Spark actions abort on interrupt)
      // and the bounded awaitTermination drains them before the
      // failure propagates to the retry.
      pool.shutdownNow()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
      throw e
    } finally { ec.shutdown(); () }
  }

  /** The maintained-statistics suite root (q205/q206): built by the
    * SINGLE combined pass ([[buildAll]] — VERDICT r17 #5 folded the
    * planner suite, the TPC-H join catalog, and the registered pipeline
    * catalog into one staged union and one stream). */
  private[graft] def ensureArtifacts(s: SparkSession, dir: String): String =
    ensureAll(s, dir)._1

  private def ensureAll(s: SparkSession, dir: String)
      : (String, String, String) =
    cacheAll.computeIfAbsent(dir, _ => buildAll(s, dir))

  /** ONE staged union, ONE stream, every artifact family (VERDICT r17
    * #5): the prior layout replayed two overlapping unions back-to-back
    * (planner suite 5.1s + join catalog 6.4s — each paying its own
    * staging scan, checkpoint IO, and multi-batch stream spin-up). Now the
    * 10 table legs (5 TPC-H chain + 4 registered pipeline + the orders
    * planner columns riding the same `o` rows) stage once, every bound
    * (the S32 z-grid generation AND all four S28 histogram generations)
    * comes off one 10-row aggregate of the staged parquet, and each of
    * the [[ReplayCarves]] micro-batches fans concurrently to all ~32
    * maintainer legs —
    * per-table, per-artifact partials identical to the separate builds
    * (each leg still reads only its own table's batch rows), so every
    * oracle's recompute is untouched (merged == one-pass specs pass
    * verbatim). */
  private def buildAll(s: SparkSession, dir: String)
      : (String, String, String) = {
    import s.implicits._
    graft.GraftFunctions.registerAll(s)
    val base = graft.Scratch.forSf("planner_all", dir)
    val basePlanner = graft.Scratch.forSf("planner", dir)
    val baseJoin = graft.Scratch.forSf(TpchChainSpec.name, dir)
    val basePipe = graft.Scratch.forSf(PipelineCatalogSpec.name, dir)
    Seq(base, basePlanner, baseJoin, basePipe).foreach(b =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(b)))
    val art205 = s"$basePlanner/stats"
    val artJoin = s"$baseJoin/stats"
    val artPipe = s"$basePipe/stats"
    val incoming = s"$base/incoming"
    // the combined union: (tbl, a, b, h, d, chunk) — `d` is the S32
    // z-grid's second dimension, carried only by the orders rows
    val t0 = System.nanoTime()
    val union = (stagedTables(s, dir, TpchChainSpec) ++
      stagedTables(s, dir, PipelineCatalogSpec))
      .reduce(_.unionByName(_))
    // EVERY bounds generation rides the staging job ITSELF (VERDICT r18
    // #4 — "share the staging scan's shuffle with the bounds
    // aggregate"): per-hist-tag min/max of h (the S28 histograms) and
    // min/max of d on the orders tag (the S32 z-grid's second
    // dimension) are Observation metrics on the staging write, so the
    // post-write bounds re-scan is gone. The staged values are
    // identical either way — the observation sees exactly the rows the
    // write persists.
    val boundTags = ((TpchChainSpec.hists ++ PipelineCatalogSpec.hists)
      .map(_.tag) :+ "o").distinct
    val obsAggs = boundTags.flatMap { t =>
      Seq(min(when($"tbl" === t, $"h")).as(s"hmn_$t"),
        max(when($"tbl" === t, $"h")).as(s"hmx_$t"))
    } ++ Seq(
      min(when($"tbl" === "o", $"d")).as("dmn_o"),
      max(when($"tbl" === "o", $"d")).as("dmx_o"))
    val obs = org.apache.spark.sql.Observation()
    union.observe(obs, obsAggs.head, obsAggs.tail: _*)
      .repartition(ReplayCarves, $"chunk")
      .write.partitionBy("chunk").mode("overwrite").parquet(incoming)
    val om = obs.get
    def bound(key: String): Double = om(key) match {
      case null => throw new IllegalStateException(
        s"no staged rows informed bound $key")
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalStateException(
        s"non-numeric bound $key: $other")
    }
    val zb = ManifestStream.ZBounds(
      bound("hmn_o"), bound("hmx_o"), bound("dmn_o"), bound("dmx_o"))
    // the stageBounds contract, re-asserted (ADVICE r18): a degenerate
    // orders domain must fail fast, not stage a silently collapsed z-grid
    require(zb.pMx > zb.pMn && zb.dMx > zb.dMn,
      s"degenerate z-grid bounds [${zb.pMn}, ${zb.pMx}] × " +
        s"[${zb.dMn}, ${zb.dMx}]")
    Seq((zb.pMn, zb.pMx, zb.dMn, zb.dMx))
      .toDF("p_mn", "p_mx", "d_mn", "d_mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$art205/bounds")
    def boundsOf(spec: CatalogSpec) = spec.hists.map { h =>
      val (mn, mx) = (bound(s"hmn_${h.tag}"), bound(s"hmx_${h.tag}"))
      require(mx > mn,
        s"degenerate histogram bounds for ${h.table}.${h.column}")
      (h.id, h.tag, h.column, mn, mx)
    }
    val histJoin = boundsOf(TpchChainSpec)
    val histPipe = boundsOf(PipelineCatalogSpec)
    val tBounds = System.nanoTime()
    val q = s.readStream
      .schema("tbl string, a bigint, b bigint, h double, d double, chunk int")
      .option("maxFilesPerTrigger", 1).parquet(incoming)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val batch = b.drop("chunk")
        batch.persist()
        // materialize ONCE before the concurrent fan — and the
        // materializing action IS the per-table count partial, so the
        // 9 count legs below only write a precomputed 1-row frame
        val counts = batch.groupBy($"tbl").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val orders = batch.where($"tbl" === "o")
        fanOut(Seq(
          () => NdvStream.processBatch(orders.select($"a".as("v")),
            batchId, art205),
          () => McvStream.processBatch(orders.select($"a".as("v")),
            batchId, art205),
          () => StatsStream.processBatch(orders.select($"h".as("p")),
            batchId, art205, zb.pMn, zb.pMx),
          () => ManifestStream.processBatch(
            orders.select($"h".as("p"), $"d"), batchId, art205, zb)) ++
          specLegs(TpchChainSpec, artJoin, histJoin, batch, batchId,
            counts) ++
          specLegs(PipelineCatalogSpec, artPipe, histPipe, batch, batchId,
            counts))
        batch.unpersist()
        ()
      }
      .start()
    require(q.awaitTermination(600000), "combined artifact stream timeout")
    val tStream = System.nanoTime()
    writeDescriptors(s, TpchChainSpec, artJoin, histJoin)
    writeDescriptors(s, PipelineCatalogSpec, artPipe, histPipe)
    System.err.println(f"[planner] combined build: stage+bounds ${
      (tBounds - t0) / 1e9}%.1fs " +
      f"stream ${(tStream - tBounds) / 1e9}%.1fs descriptors ${
        (System.nanoTime() - tStream) / 1e9}%.1fs")
    (art205, artJoin, artPipe)
  }

  /** The staged frames of one spec's tables — the fixed
    * (tbl, a, b, h, d, chunk) union schema; `d` rides only the TPC-H
    * orders rows (the planner suite's second z-dimension). */
  private def stagedTables(s: SparkSession, dir: String,
      spec: CatalogSpec): Seq[DataFrame] = {
    val histOf = spec.hists.map(h => h.tag -> h).toMap
    spec.tables.map { t =>
      Tables(s, dir, t.table).selectExpr(
        s"'${t.tag}' as tbl",
        s"cast(${t.a} as bigint) as a",
        if (t.b == null) "cast(null as bigint) as b"
        else s"cast(${t.b} as bigint) as b",
        histOf.get(t.tag).map(h => s"cast(${h.column} as double) as h")
          .getOrElse("cast(null as double) as h"),
        // the planner suite's second z-dimension rides ONLY the TPC-H
        // orders rows (matching on the table name too, so a USER spec
        // reusing the "o" tag for some other table stages cleanly)
        if (t.tag == "o" && t.table == "orders")
          "cast(o_custkey as double) as d"
        else "cast(null as double) as d",
        s"(${Layout.kmvHashSql(t.carveKey)}) % $ReplayCarves as chunk")
    }
  }

  /** One spec's per-batch maintainer legs over the shared persisted
    * batch — each leg reads only its own table's rows, so the partials
    * are identical to a standalone build's. */
  private def specLegs(spec: CatalogSpec, art: String,
      histBounds: Seq[(String, String, String, Double, Double)],
      batch: DataFrame, batchId: Long,
      counts: Map[String, Long]): Seq[() => Unit] = {
    import org.apache.spark.sql.functions.col
    spec.sketches.map { c =>
      () => NdvStream.processBatch(
        batch.where(col("tbl") === c.tag).select(col(c.staged).as("v")),
        batchId, s"$art/d_${c.id}")
    } ++ spec.tables.map { t =>
      () => writeCount(batch.sparkSession, counts.getOrElse(t.tag, 0L),
        batchId, s"$art/n_${t.tag}")
    } ++ histBounds.map { case (id, tag, _, mn, mx) =>
      () => StatsStream.processBatch(
        batch.where(col("tbl") === tag).select(col("h").as("p")),
        batchId, s"$art/h_$id", mn, mx)
    } ++ spec.mcvs.map { c =>
      () =>
        if (c.bounded) McvStream.processBatchBounded(
          batch.where(col("tbl") === c.tag).select(col(c.staged).as("v")),
          batchId, s"$art/m_${c.id}")
        else McvStream.processBatch(
          batch.where(col("tbl") === c.tag).select(col(c.staged).as("v")),
          batchId, s"$art/m_${c.id}")
    }
  }

  /** The self-describing catalog descriptors: which base column each
    * artifact measures and which table each count belongs to — what
    * lets a CONSUMER (q207+, [[graft.plans.CatalogJoinReorder]])
    * resolve artifacts from the catalog root alone. */
  private def writeDescriptors(s: SparkSession, spec: CatalogSpec,
      art: String,
      histBounds: Seq[(String, String, String, Double, Double)]): Unit = {
    import s.implicits._
    // three independent metadata writes — fanned like the batch legs
    // (each is a tiny job whose wall cost is scheduling floor)
    fanOut(Seq(
      () => spec.sketches.map(c => (c.column, c.table, c.tag, c.id))
        .toDF("col", "tbl", "tag", "id")
        .coalesce(1).write.mode("overwrite").parquet(s"$art/columns"),
      () => histBounds.map { case (id, tag, column, mn, mx) =>
        (column, tag, id, mn, mx)
      }.toDF("col", "tag", "id", "mn", "mx")
        .coalesce(1).write.mode("overwrite").parquet(s"$art/hists"),
      () => spec.mcvs.map(c =>
        (c.column, c.tag, c.id, if (c.bounded) "bounded" else "exact",
          c.codec.getOrElse("")))
        .toDF("col", "tag", "id", "mode", "codec")
        .coalesce(1).write.mode("overwrite").parquet(s"$art/mcvs")))
    // a consumer that raced the build (or cached a stale root) must
    // see THIS catalog on its next load
    graft.plans.CatalogJoinReorder.invalidate(art)
  }

  // ------------------------------------------------- shared SQL fragments

  /** Threshold t_k over a row carrying (pmn, pmx) — identical text in
    * Spark SQL and DuckDB, and identical IEEE arithmetic to the
    * driver-side Scala mirror in [[q205PlannerAudit]]. The `k` slot
    * takes a literal (Spark exact legs) or the column name (oracle). */
  private def tSql(k: Any): String =
    s"(pmn + (cast($k as double) * (pmx - pmn)) / 64.0)"

  /** q206 fifth boundaries over (pmn, pmx). */
  private def fifthLoSql(k: Int): String =
    s"(pmn + (cast(${k - 1} as double) * (pmx - pmn)) / 5.0)"
  private def fifthHiSql(k: Int): String =
    s"(pmn + (cast($k as double) * (pmx - pmn)) / 5.0)"

  /** DuckDB-side recomputation of the artifact suite's inputs from the
    * base table — the CTE prefix both oracles share. Every expression is
    * the maintained artifact's own arithmetic: [[Layout.kmvHashSql]] for
    * the batch carve and the ndv sketch, [[Layout.mortonSql]] +
    * the S32 grid scaling for the manifest cells, the q197/S28 binning
    * for the histogram. */
  private def artifactCtes: String =
    s"""src AS (
       |  SELECT o_custkey AS v, o_totalprice AS p,
       |    CAST(o_custkey AS DOUBLE) AS d,
       |    (${Layout.kmvHashSql("o_orderkey")}) % $ReplayCarves AS chunk
       |  FROM orders),
       |b AS (
       |  SELECT MIN(p) AS pmn, MAX(p) AS pmx,
       |    MIN(d) AS dmn, MAX(d) AS dmx
       |  FROM src),
       |zc AS (
       |  SELECT chunk, p, d,
       |    GREATEST(LEAST(CAST(FLOOR((p - pmn) * 1024.0 / (pmx - pmn))
       |      AS BIGINT), 1023), 0) AS zx,
       |    GREATEST(LEAST(CAST(FLOOR((d - dmn) * 1024.0 / (dmx - dmn))
       |      AS BIGINT), 1023), 0) AS zy
       |  FROM src, b),
       |zk AS (SELECT chunk, p, d,
       |  (${Layout.mortonSql("zx", "zy")}) AS zkey FROM zc),
       |cells AS (
       |  SELECT chunk, zkey >> ${ManifestStream.GridShift} AS fid,
       |    MIN(p) AS mn_p, MAX(p) AS mx_p,
       |    MIN(d) AS mn_d, MAX(d) AS mx_d,
       |    CAST(COUNT(*) AS BIGINT) AS nrows
       |  FROM zk GROUP BY 1, 2),
       |cat AS (
       |  SELECT CAST(SUM(nrows) AS BIGINT) AS n_rows,
       |    CAST(COUNT(*) AS BIGINT) AS files_total
       |  FROM cells)""".stripMargin

  // ----------------------------------------------------------------- q205

  /** Maintained-statistics planner audit: cost the join
    * `σ_{p ≤ t_k}(orders) ⋈ orders ON o_custkey` (the q203 skew setting —
    * both sides carry multiplicity, so the frequency stats matter) for
    * three predicate widths, READING every estimate off the streamed
    * artifacts:
    *
    *  - selectivity of `p ≤ t_k` from the S28 histogram (q197's
    *    full-bins-plus-half-straddle rule),
    *  - join output rows from the S31 MCV head + S29 KMV ndv for the
    *    tail (q203's hybrid, with the catalog's ESTIMATED ndv where
    *    q203 used the exact one) × the histogram selectivity under
    *    attribute independence (q198's assumption, declared),
    *  - table row count and files-to-open from the S32 manifest — the
    *    Iceberg planning inputs (row counts and zone overlaps come from
    *    manifest metadata, never a rescan),
    *
    * then grades: exact selectivity and exact join rows (the q199
    * Σ n_k(v)·n(v) identity — no join materialized) and the
    * broadcast-vs-shuffle decision under the q201 rows-moved currency:
    * broadcast ships the filtered build side [[Workers]] times, shuffle
    * ships both sides once. `est_rank` vs `exact_rank` per strategy is
    * the graded decision; PlannerSpec pins est_rank == exact_rank.
    *
    * The catalog consults ([[NdvStream.estimate]]-style `head()` pulls
    * of metadata-sized artifacts) are driver-side BY DESIGN — that is
    * what a planner does with a catalog; the exact-truth legs are one
    * value-domain aggregation of the fact table. At SF1000 the
    * est_join multiply wants DECIMAL headroom — the q199 caveat,
    * machine-checked by LayoutSpec's int64-headroom test.
    *
    * Scale shape: estimates touch ONLY metadata (≤4096-row histogram,
    * ≤1024-row sketch, value-domain count table, |files| manifest
    * rows); truth costs one column-pruned scan with the partial agg in
    * the scan task and one value-domain shuffle. */
  def q205PlannerAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureArtifacts(s, dir)

    // ---- catalog consults: ONE action over four parallel metadata
    // branches (the q199 lesson — serializing tiny driver jobs costs
    // more than the jobs; the first cut here paid 5 sequential
    // heads). Thresholds and bins are computed IN-PLAN against the
    // bounds artifact, so the consult arithmetic is the oracle's SQL
    // verbatim, not a Scala mirror of it.
    val boundsDf = s.read.parquet(s"$art/bounds")
      .selectExpr("p_mn as pmn", "p_mx as pmx")
    def tbinSql(k: Int): String =
      s"least(cast(floor((${tSql(k)} - pmn) * ${Layout.HistBins} " +
        s"/ (pmx - pmn)) as bigint), ${Layout.HistBins - 1})"
    val histAggs = Ks.flatMap { k =>
      Seq(coalesce(sum(when(expr(s"bin < ${tbinSql(k)}"), $"n")), lit(0L))
          .as(s"full_$k"),
        coalesce(sum(when(expr(s"bin = ${tbinSql(k)}"), $"n")), lit(0L))
          .as(s"strad_$k"))
    }
    val histW = StatsStream.mergedHistogram(s, art)
      .crossJoin(broadcast(boundsDf))
      .agg(histAggs.head, histAggs.tail: _*)
    val sketchW = NdvStream.mergedSketch(s, art)
      .agg(count(lit(1)).as("sk_rows"),
        coalesce(max($"h"), lit(0L)).as("sk_kth"))
    val mcvW = McvStream.mergedCounts(s, art)
      .withColumn("r", row_number().over(Window.orderBy($"n".desc, $"v")))
      .agg(coalesce(sum(when($"r" <= McvSlots, $"n" * $"n")), lit(0L))
          .as("mcv_sq"),
        coalesce(sum(when($"r" <= McvSlots, $"n")), lit(0L)).as("mcv_n"))
    val manAggs = Seq(coalesce(sum($"rows"), lit(0L)).as("n_rows"),
      count(lit(1)).as("files_total")) ++
      Ks.map(k => count(when(expr(s"mn_p <= ${tSql(k)}"), 1)).as(s"fo_$k"))
    val manW = ManifestStream.manifest(s, art)
      .crossJoin(broadcast(boundsDf))
      .agg(manAggs.head, manAggs.tail: _*)
    val cat = histW.crossJoin(sketchW).crossJoin(mcvW).crossJoin(manW)
      .head()
    // field reads by NAME (ADVICE r14: an aggregate reorder must fail
    // the read, never silently swap columns)
    val estSel = Ks.map { k =>
      k -> (cat.getAs[Long](s"full_$k") + cat.getAs[Long](s"strad_$k") / 2)
    }.toMap
    val ndvEst = Layout.kmvEstimate(
      cat.getAs[Long]("sk_rows"), cat.getAs[Long]("sk_kth"))
    val (mcvSq, mcvN) = (cat.getAs[Long]("mcv_sq"), cat.getAs[Long]("mcv_n"))
    val (nRows, filesTotal) =
      (cat.getAs[Long]("n_rows"), cat.getAs[Long]("files_total"))
    val filesOpen = Ks.map(k => k -> cat.getAs[Long](s"fo_$k")).toMap

    // the q203 hybrid with the catalog's ndv: MCV head exact, tail
    // uniform over the sketch's estimated remainder
    val estJoin = Ks.map(k =>
      k -> hybridJoinEst(estSel(k), mcvSq, mcvN, nRows, ndvEst)).toMap

    // ---- exact truth (one value-domain pass, the q199 identity) ----
    val vcAggs = count(lit(1)).as("n") +: Ks.map(k =>
      count(when(expr(s"p <= ${tSql(k)}"), 1)).as(s"n_$k"))
    val vc = Tables(s, dir, "orders")
      .select($"o_custkey".as("v"), $"o_totalprice".as("p"))
      .crossJoin(broadcast(boundsDf))
      .groupBy($"v")
      .agg(vcAggs.head, vcAggs.tail: _*)
    val exAggs = Ks.flatMap { k =>
      Seq(coalesce(sum(col(s"n_$k")), lit(0L)).as(s"es_$k"),
        coalesce(sum(col(s"n_$k") * $"n"), lit(0L)).as(s"ej_$k"))
    }
    val exact = vc.agg(exAggs.head, exAggs.tail: _*)
      .selectExpr(s"stack(${Ks.size}, " +
        Ks.map(k => s"cast($k as bigint), es_$k, ej_$k").mkString(", ") +
        ") as (pred_id, exact_sel_rows, exact_join_rows)")

    // ---- assembly: estimates (literals) × strategies, ranked ----
    val ests = Ks.map { k =>
      (k.toLong, estSel(k), estJoin(k), filesOpen(k))
    }.toDF("pred_id", "est_sel_rows", "est_join_rows", "files_open")
    val strategies = Seq("bcast_probe", "shuffle").toDF("strategy")
    ests.join(exact, "pred_id")
      .crossJoin(strategies)
      .withColumn("files_total", lit(filesTotal))
      .withColumn("est_cost",
        when($"strategy" === "bcast_probe", $"est_sel_rows" * Workers)
          .otherwise($"est_sel_rows" + nRows))
      .withColumn("exact_cost",
        when($"strategy" === "bcast_probe", $"exact_sel_rows" * Workers)
          .otherwise($"exact_sel_rows" + nRows))
      .withColumn("est_rank", row_number().over(
        Window.partitionBy($"pred_id").orderBy($"est_cost", $"strategy"))
        .cast("long"))
      .withColumn("exact_rank", row_number().over(
        Window.partitionBy($"pred_id").orderBy($"exact_cost", $"strategy"))
        .cast("long"))
      .select($"pred_id", $"strategy", $"est_sel_rows", $"exact_sel_rows",
        $"files_open", $"files_total", $"est_join_rows", $"exact_join_rows",
        $"est_cost", $"exact_cost", $"est_rank", $"exact_rank")
      .orderBy($"pred_id", $"strategy")
  }

  val q205Oracle: String = {
    val kList = Ks.mkString(", ")
    s"""WITH $artifactCtes,
       |hist AS (
       |  SELECT LEAST(CAST(FLOOR((p - pmn) * ${Layout.HistBins}
       |      / (pmx - pmn)) AS BIGINT), ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM src, b GROUP BY 1),
       |sk AS (
       |  SELECT DISTINCT ${Layout.kmvHashSql("v")} AS h
       |  FROM src WHERE v IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
       |ndv AS (
       |  SELECT CASE WHEN COUNT(*) < ${Layout.KmvK}
       |    THEN CAST(COUNT(*) AS BIGINT)
       |    ELSE CAST(${(Layout.KmvK - 1L) * Layout.KmvP}
       |      // GREATEST(MAX(h), 1) AS BIGINT) END AS est_ndv
       |  FROM sk),
       |mcv AS (
       |  SELECT
       |    CAST(COALESCE(SUM(CASE WHEN r <= $McvSlots THEN n * n END), 0)
       |      AS BIGINT) AS mcv_sq,
       |    CAST(COALESCE(SUM(CASE WHEN r <= $McvSlots THEN n END), 0)
       |      AS BIGINT) AS mcv_n
       |  FROM (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, v) AS r
       |        FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS n
       |              FROM src GROUP BY 1))),
       |pt AS (
       |  SELECT k, ${tSql("k")} AS t,
       |    LEAST(CAST(FLOOR((${tSql("k")} - pmn) * ${Layout.HistBins}
       |      / (pmx - pmn)) AS BIGINT), ${Layout.HistBins - 1}) AS tbin
       |  FROM (SELECT UNNEST([$kList]) AS k), b),
       |estsel AS (
       |  SELECT pt.k,
       |    CAST(COALESCE(SUM(CASE WHEN h.bin < pt.tbin THEN h.n
       |      WHEN h.bin = pt.tbin THEN h.n // 2 END), 0) AS BIGINT)
       |      AS est_sel
       |  FROM pt, hist h GROUP BY 1),
       |fo AS (
       |  SELECT pt.k,
       |    CAST(COUNT(CASE WHEN c.mn_p <= pt.t THEN 1 END) AS BIGINT)
       |      AS files_open
       |  FROM pt, cells c GROUP BY 1),
       |vc AS (
       |  SELECT pt.k, s.v, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COUNT(CASE WHEN s.p <= pt.t THEN 1 END) AS BIGINT) AS nk
       |  FROM src s, pt GROUP BY 1, 2),
       |ex AS (
       |  SELECT k, CAST(SUM(nk) AS BIGINT) AS exact_sel,
       |    CAST(SUM(nk * n) AS BIGINT) AS exact_join
       |  FROM vc GROUP BY 1),
       |ests AS (
       |  SELECT e.k, e.est_sel,
       |    CAST((e.est_sel * (m.mcv_sq +
       |      (c.n_rows - m.mcv_n) * (c.n_rows - m.mcv_n)
       |        // GREATEST(n.est_ndv - $McvSlots, 1))) // c.n_rows
       |      AS BIGINT) AS est_join
       |  FROM estsel e, mcv m, ndv n, cat c),
       |costs AS (
       |  SELECT CAST(e.k AS BIGINT) AS pred_id, st.strategy,
       |    e.est_sel AS est_sel_rows, x.exact_sel AS exact_sel_rows,
       |    f.files_open, c.files_total,
       |    e.est_join AS est_join_rows, x.exact_join AS exact_join_rows,
       |    CAST(CASE WHEN st.strategy = 'bcast_probe'
       |      THEN $Workers * e.est_sel ELSE e.est_sel + c.n_rows END
       |      AS BIGINT) AS est_cost,
       |    CAST(CASE WHEN st.strategy = 'bcast_probe'
       |      THEN $Workers * x.exact_sel ELSE x.exact_sel + c.n_rows END
       |      AS BIGINT) AS exact_cost
       |  FROM ests e
       |  JOIN ex x ON x.k = e.k
       |  JOIN fo f ON f.k = e.k,
       |  cat c, (SELECT UNNEST(['bcast_probe', 'shuffle']) AS strategy) st)
       |SELECT pred_id, strategy, est_sel_rows, exact_sel_rows, files_open,
       |  files_total, est_join_rows, exact_join_rows, est_cost, exact_cost,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY pred_id
       |    ORDER BY est_cost, strategy) AS BIGINT) AS est_rank,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY pred_id
       |    ORDER BY exact_cost, strategy) AS BIGINT) AS exact_rank
       |FROM costs ORDER BY pred_id, strategy""".stripMargin
  }

  // ----------------------------------------------------------------- q206

  /** Manifest-aware compaction planner — the Iceberg bin-packing loop
    * over S32's zones. q103 compacts by FILE COUNT (every bucket's
    * debris merges, content-blind); the manifest knows better: sort the
    * standing files by zone (mn_p, mx_p, mn_d, mx_d, rows — a total
    * order on the fixture's distinct-double zones), bin-pack by
    * cumulative row count into ceil(N/[[OutFiles]])-row rewrite groups,
    * and price what a reader gains: for each of the 5 price fifths
    * (last closed, the q202 predicate geometry), the files and rows a
    * manifest-pruned read opens BEFORE (the small z-cell files) vs
    * AFTER (the merged groups' zones = min/max over members). The
    * before/after read amplification in FILE count is the open-cost win
    * compaction buys; rows stay near-constant — exactly the
    * small-file story. PlannerSpec executes the plan for real
    * (reads each group's members, writes the merged file, harvests
    * REAL footers) and pins planned zones == footer zones and the
    * after-counts against a rewritten-manifest pruned read.
    *
    * Scale shape: everything runs on the MANIFEST — |files| metadata
    * rows; the single-partition window is the q192 metadata-window
    * discipline (a production manifest is still ≤ millions of rows; the
    * two-level variant applies verbatim if not). The plan never touches
    * data; only the executor (spec / production rewrite job) does. */
  /** The shared bin-packing plan over a manifest frame: every file row
    * gains its rewrite group id — sort by zone (the 5-key total order),
    * carve by cumulative row count into target-row groups. The target
    * defaults to ceil(frame total / outFiles) computed in-plan (q206's
    * full-rewrite OPTIMIZE plan); the S33 maintenance stream passes an
    * EXPLICIT target derived from the whole view so its small-file-only
    * input still packs to full-size outputs (size tiering — see
    * [[graft.streaming.CompactStream.maintain]]). ONE generator shared
    * by q206, its executing spec, and S33, so the plan graded and the
    * plan executed cannot drift. Metadata-sized: the window runs over
    * |files| manifest rows. */
  private[graft] def planGroups(man: DataFrame,
      outFiles: Int = OutFiles,
      targetRows: Option[Long] = None): DataFrame = {
    val ordW = Window.orderBy(col("mn_p"), col("mx_p"),
      col("mn_d"), col("mx_d"), col("rows"))
    val targetSql = targetRows match {
      case Some(t) => s"${math.max(t, 1L)}"
      case None => s"greatest((sum(rows) over ()) div $outFiles, 1)"
    }
    // Tail fold (ADVICE r16): the cumulative carve's REMAINDER group can
    // pack fewer than target/2 rows — under S33's size-tiered loop such
    // an output would stay in the small tier and be re-read/re-written on
    // every subsequent firing. Fold an undersized tail group into its
    // PREDECESSOR — the largest OCCUPIED group id below g_max, not the
    // literal g_max−1: an oversized file makes `cum div tgt` skip ids,
    // and folding to an unoccupied id would merely renumber the tail
    // instead of merging it (leaving it under target/2 forever). With
    // the occupied-predecessor fold, every planned output is ≥ target/2
    // whenever more than one group exists, making "each row is
    // rewritten at most once by this loop" strictly true. All windows
    // run over |files| metadata rows.
    man
      .withColumn("cum", coalesce(sum(col("rows")).over(
        ordW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tgt", expr(targetSql))
      .withColumn("grp0", expr("cum div tgt"))
      .withColumn("g_rows", expr("sum(rows) over (partition by grp0)"))
      .withColumn("g_max", expr("max(grp0) over ()"))
      .withColumn("g_prev",
        expr("max(case when grp0 <> g_max then grp0 end) over ()"))
      .withColumn("grp", expr("case when grp0 = g_max and grp0 > 0 " +
        "and g_rows < tgt div 2 then coalesce(g_prev, grp0) else grp0 end"))
      .drop("cum", "tgt", "grp0", "g_rows", "g_max", "g_prev")
  }

  def q206CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureArtifacts(s, dir)
    val man = ManifestStream.manifest(s, art)
    // field read by NAME (ADVICE r14 — an aggregate reorder must fail
    // the read, never silently swap columns)
    val filesTotal = man.agg(count(lit(1)).as("files_total"))
      .head().getAs[Long]("files_total")
    val grouped = planGroups(man)
    val groups = grouped.groupBy($"grp")
      .agg(min($"mn_p").as("g_mn"), max($"mx_p").as("g_mx"),
        sum($"rows").as("g_rows"))
    val groupsTotal = groups.count()
    val bounds = s.read.parquet(s"$art/bounds")
      .selectExpr("p_mn as pmn", "p_mx as pmx")
    // the CASE text is shared verbatim with the oracle below
    val loCase = (1 to 5).map(k =>
      s"WHEN k = $k THEN ${fifthLoSql(k)}").mkString("CASE ", " ", " END")
    val hiCase = (1 to 5).map(k =>
      s"WHEN k = $k THEN ${fifthHiSql(k)}").mkString("CASE ", " ", " END")
    val fifths = (1 to 5).map(_.toLong).toDF("k")
      .crossJoin(broadcast(bounds))
      .selectExpr("k", s"$loCase as lo", s"$hiCase as hi")
    def overlap(mn: String, mx: String) =
      col(mx) >= $"lo" &&
        (col(mn) < $"hi" || ($"k" === 5 && col(mn) <= $"hi"))
    val before = fifths.crossJoin(man)
      .groupBy($"k")
      .agg(count(when(overlap("mn_p", "mx_p"), 1)).as("files_before"),
        coalesce(sum(when(overlap("mn_p", "mx_p"), $"rows")), lit(0L))
          .as("rows_before"))
    val after = fifths.crossJoin(groups)
      .groupBy($"k")
      .agg(count(when(overlap("g_mn", "g_mx"), 1)).as("files_after"),
        coalesce(sum(when(overlap("g_mn", "g_mx"), $"g_rows")), lit(0L))
          .as("rows_after"))
    before.join(after, "k")
      .select($"k".as("pred_id"), $"files_before", $"rows_before",
        $"files_after", $"rows_after",
        lit(filesTotal).as("files_total"),
        lit(groupsTotal).as("groups_total"))
      .orderBy($"pred_id")
  }

  val q206Oracle: String = {
    val loCase = (1 to 5).map(k =>
      s"WHEN k = $k THEN ${fifthLoSql(k)}").mkString("CASE ", " ", " END")
    val hiCase = (1 to 5).map(k =>
      s"WHEN k = $k THEN ${fifthHiSql(k)}").mkString("CASE ", " ", " END")
    s"""WITH $artifactCtes,
       |ordered AS (
       |  SELECT nrows, mn_p, mx_p,
       |    COALESCE(SUM(nrows) OVER (
       |      ORDER BY mn_p, mx_p, mn_d, mx_d, nrows
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM cells),
       |g0 AS (
       |  SELECT nrows, mn_p, mx_p, GREATEST(n_rows // $OutFiles, 1) AS tgt,
       |    cum // GREATEST(n_rows // $OutFiles, 1) AS grp0
       |  FROM ordered, cat),
       |g1 AS (
       |  SELECT nrows, mn_p, mx_p, tgt, grp0,
       |    MAX(grp0) OVER () AS g_max,
       |    SUM(nrows) OVER (PARTITION BY grp0) AS g_rows
       |  FROM g0),
       |g2 AS (
       |  SELECT *, MAX(CASE WHEN grp0 <> g_max THEN grp0 END) OVER ()
       |    AS g_prev
       |  FROM g1),
       |gf AS (
       |  SELECT nrows, mn_p, mx_p,
       |    CASE WHEN grp0 = g_max AND grp0 > 0 AND g_rows < tgt // 2
       |      THEN COALESCE(g_prev, grp0) ELSE grp0 END AS grp
       |  FROM g2),
       |grps AS (
       |  SELECT grp,
       |    MIN(mn_p) AS g_mn, MAX(mx_p) AS g_mx,
       |    CAST(SUM(nrows) AS BIGINT) AS g_rows
       |  FROM gf GROUP BY 1),
       |gt AS (SELECT CAST(COUNT(*) AS BIGINT) AS groups_total FROM grps),
       |fifths AS (
       |  SELECT k, $loCase AS lo, $hiCase AS hi
       |  FROM (SELECT UNNEST(range(1, 6)) AS k), b),
       |bf AS (
       |  SELECT f.k,
       |    CAST(COUNT(CASE WHEN c.mx_p >= f.lo AND (c.mn_p < f.hi
       |      OR (f.k = 5 AND c.mn_p <= f.hi)) THEN 1 END) AS BIGINT)
       |      AS files_before,
       |    CAST(COALESCE(SUM(CASE WHEN c.mx_p >= f.lo AND (c.mn_p < f.hi
       |      OR (f.k = 5 AND c.mn_p <= f.hi)) THEN c.nrows END), 0)
       |      AS BIGINT) AS rows_before
       |  FROM fifths f, cells c GROUP BY 1),
       |af AS (
       |  SELECT f.k,
       |    CAST(COUNT(CASE WHEN g.g_mx >= f.lo AND (g.g_mn < f.hi
       |      OR (f.k = 5 AND g.g_mn <= f.hi)) THEN 1 END) AS BIGINT)
       |      AS files_after,
       |    CAST(COALESCE(SUM(CASE WHEN g.g_mx >= f.lo AND (g.g_mn < f.hi
       |      OR (f.k = 5 AND g.g_mn <= f.hi)) THEN g.g_rows END), 0)
       |      AS BIGINT) AS rows_after
       |  FROM fifths f, grps g GROUP BY 1)
       |SELECT CAST(bf.k AS BIGINT) AS pred_id, bf.files_before,
       |  bf.rows_before, af.files_after, af.rows_after,
       |  c.files_total, gt.groups_total
       |FROM bf JOIN af ON af.k = bf.k, cat c, gt
       |ORDER BY pred_id""".stripMargin
  }

  // ----------------------------------------------------------------- q207

  /** The N–C–O–L FK chain as a [[CatalogSpec]] — the spec the graded
    * q207/q208/q209 audits and their oracles read. The carve key only
    * fixes WHICH micro-batch a row replays in — every artifact is
    * batch-INVARIANT (min-K-of-union and + are associative and
    * commutative, partials idempotent under per-batch overwrite), so the
    * merged artifacts equal their one-pass twins for any batching; the
    * table's own key just keeps replays byte-stable.
    *
    * The rn edge (region ⋈ nation) extends the catalog one dimension
    * past the q201/q207 4-chain; the graded q207 audit stays on the
    * 4-chain oracle, while [[graft.plans.CatalogJoinReorder]] prices the
    * full 5-chain (JoinReorderSpec's 16-order leg). The hist columns
    * feed the rule's range-selectivity leg (q197's
    * full-bins-plus-half-straddle rule); the mcv column feeds q209's
    * equality selectivity (pg_stats head-exact / uniform-tail). */
  private[graft] val TpchChainSpec: CatalogSpec = CatalogSpec(
    name = "planner_join",
    tables = Seq(
      CatalogTable("r", "region", "r_regionkey", "r_regionkey"),
      CatalogTable("n", "nation", "n_nationkey", "n_nationkey",
        "n_regionkey"),
      CatalogTable("c", "customer", "c_custkey", "c_nationkey", "c_custkey"),
      CatalogTable("o", "orders", "o_orderkey", "o_custkey", "o_orderkey"),
      // the b slot carries l_suppkey since r20: the q213 9-relation
      // graded audit prices the lineitem ⋈ supplier edge, and riding
      // the already-staged slot costs nothing (it staged NULL before)
      CatalogTable("l", "lineitem", "l_orderkey", "l_orderkey",
        "l_suppkey"),
      // supplier joins the chain catalog in r20 (VERDICT r19 #7): the
      // "two staged legs" that let the graded 9-relation audit ride
      // planner_prep instead of paying a fourth standalone build
      CatalogTable("s", "supplier", "s_suppkey", "s_suppkey")),
    sketches = Seq(
      CatalogColumn("rn_r", "r", "a", "region", "r_regionkey"),
      CatalogColumn("rn_n", "n", "b", "nation", "n_regionkey"),
      CatalogColumn("nc_n", "n", "a", "nation", "n_nationkey"),
      CatalogColumn("nc_c", "c", "a", "customer", "c_nationkey"),
      CatalogColumn("co_c", "c", "b", "customer", "c_custkey"),
      CatalogColumn("co_o", "o", "a", "orders", "o_custkey"),
      CatalogColumn("ol_o", "o", "b", "orders", "o_orderkey"),
      CatalogColumn("ol_l", "l", "a", "lineitem", "l_orderkey"),
      CatalogColumn("ls_l", "l", "b", "lineitem", "l_suppkey"),
      CatalogColumn("ss_s", "s", "a", "supplier", "s_suppkey")),
    hists = Seq(
      CatalogHistCol("ho", "o", "orders", "o_totalprice"),
      CatalogHistCol("hl", "l", "lineitem", "l_quantity")),
    mcvs = Seq(
      // o_custkey's domain scales with |customer| — at 100 TB the full
      // value-count partial is a customer-scaled single-writer file, so
      // the catalog maintains the BOUNDED heavy-hitter artifact
      // (VERDICT r17 #3); q209 and the rule read its head + the exact
      // head/tail mass split, with remainder-ndv from the S29 sketch
      CatalogColumn("co_o", "o", "a", "orders", "o_custkey",
        bounded = true)))

  private def JoinTables: Seq[CatalogTable] = TpchChainSpec.tables
  private def JoinSketchCols: Seq[CatalogColumn] = TpchChainSpec.sketches
  private[graft] def JoinSketchColIds: Seq[String] = JoinSketchCols.map(_.id)

  /** The registered NON-TPC-H catalog (VERDICT r17 #1's done-bar): the
    * LLM-pipeline tables joined on user/doc keys —
    * embeddings ⋈(vec_id = doc_id) documents ⋈(doc_id = user_id)
    * events ⋈(user_id = c_custkey) customer — cataloged by the SAME
    * one-pass stream and priced by the same rule (JoinReorderSpec's
    * registered-set leg). The c_custkey and label histograms feed the
    * q210 rescaled-selectivity audit; the event-type key is djb2-coded
    * into the bigint domain the staged slots carry (the engine's own
    * registered SQL function — reference partitioner/index.js:51 for
    * the hash's provenance). */
  private[graft] val PipelineCatalogSpec: CatalogSpec = CatalogSpec(
    name = "planner_events",
    tables = Seq(
      CatalogTable("em", "embeddings", "vec_id", "vec_id"),
      CatalogTable("dc", "documents", "doc_id", "doc_id"),
      CatalogTable("ev", "events", "event_id", "user_id",
        "djb2(event_type)"),
      CatalogTable("cu", "customer", "c_custkey", "c_custkey")),
    sketches = Seq(
      CatalogColumn("em_vec", "em", "a", "embeddings", "vec_id"),
      CatalogColumn("dc_doc", "dc", "a", "documents", "doc_id"),
      CatalogColumn("ev_uid", "ev", "a", "events", "user_id"),
      CatalogColumn("cu_key", "cu", "a", "customer", "c_custkey")),
    hists = Seq(
      CatalogHistCol("hcu", "cu", "customer", "c_custkey"),
      CatalogHistCol("hem", "em", "embeddings", "label")),
    mcvs = Seq(
      // user_id is corpus-scaled (grows with the user base) → bounded;
      // the event-type code is a 5-value enum → the exact table IS
      // metadata. The q211 skew audit reads both. The descriptor keys
      // the coded column by its REAL base name with the codec recorded
      // (ADVICE r18): the rule hashes an `event_type = '…'` literal
      // with the same djb2 at consult time instead of never matching a
      // fictional "event_code" attribute.
      CatalogColumn("ev_uid", "ev", "a", "events", "user_id",
        bounded = true),
      CatalogColumn("ev_et", "ev", "b", "events", "event_type",
        codec = Some("djb2"))))

  /** S29-style per-batch row-count partial: pure in the batch,
    * overwritten into `rows/batch=<id>`; the standing count is the SUM
    * over partials (associative, commutative — merged == one-pass, the
    * same protocol argument as [[NdvStream]]/[[McvStream]]). This is the
    * catalog's table-cardinality artifact: one row per micro-batch, so a
    * planner reads |batches| rows to know n, never the table. */
  private[graft] def countBatch(batch: DataFrame, batchId: Long,
      root: String): Unit = {
    batch.agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/rows/batch=$batchId")
    ()
  }

  /** [[countBatch]] with the count already in hand: the combined build
    * computes every table's batch count in ONE grouped job (the same
    * action that materializes the persisted batch), so the per-table
    * legs only write their 1-row partial — identical artifact, 9 fewer
    * scans per micro-batch. */
  private def writeCount(s: SparkSession, n: Long, batchId: Long,
      root: String): Unit = {
    import s.implicits._
    Seq(n).toDF("n")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/rows/batch=$batchId")
    ()
  }

  /** Session conf: seconds a USER catalog build is trusted before the
    * next [[ensureCatalog]] call re-probes the base tables' row counts
    * and rebuilds on movement (default 60 — the same cadence as the
    * reorder rule's artifact re-read, [[graft.plans.CatalogJoinReorder
    * .RefreshKey]]). 0 probes on every call. VERDICT r18 #3: without
    * this, a registered spec's artifacts were a build-time snapshot
    * pinned for the JVM lifetime, and the rule's 60s artifact re-read
    * could never SEE new data for user specs. */
  val MaintainKey = "spark.graft.catalog.maintainSec"

  /** A built user catalog: its artifact root, the instant it was last
    * validated, and the file footprint it was staged from (the
    * staleness signature). */
  private final case class UserCatalog(art: String, builtAt: Long,
      sig: Map[String, String])

  /** One registered spec's build/maintain slot: the per-key monitor the
    * probe-and-rebuild runs under (ADVICE r19 — the build used to run
    * INSIDE ConcurrentHashMap.compute, holding the bin lock for the
    * whole staging+replay and making any future nested ensureCatalog a
    * deadlock; the map now only ever computes this trivial holder, and
    * the minutes-scale work happens under the holder's own monitor, so
    * unrelated specs sharing a hash bin never block each other). */
  private final class UserCatalogSlot {
    var cat: UserCatalog = _
  }

  private val cacheJoin =
    new java.util.concurrent.ConcurrentHashMap[String, UserCatalogSlot]

  private[graft] def evictJoinSession(s: SparkSession): Unit =
    cacheJoin.clear()

  /** The staleness signature: the table directory's FILE FOOTPRINT —
    * name, length, and modification time of every entry, a pure
    * metadata listing with no scan (VERDICT r19 #3: the previous
    * signature was per-table row COUNTS, so a same-count in-place
    * overwrite — compaction, dedup rewrite, domain shift — revalidated
    * as unmoved and the catalog kept pricing from dead artifacts
    * forever; a rewrite cannot preserve file names + sizes + mtimes).
    * Single parquet files list as themselves; a directory's top-level
    * entries cover both flat part-file layouts and partitioned writes
    * (adding files under a partition dir moves the dir's own mtime). */
  private def footprintSig(s: SparkSession, dir: String,
      spec: CatalogSpec): Map[String, String] = {
    val hconf = s.sparkContext.hadoopConfiguration
    spec.tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/${t.table}.parquet")
      val fs = p.getFileSystem(hconf)
      val listing =
        if (!fs.exists(p)) "absent"
        else fs.listStatus(p)
          .map(st => s"${st.getPath.getName}:${st.getLen}:" +
            s"${st.getModificationTime}")
          .sorted.mkString(";")
      t.tag -> listing
    }.toMap
  }

  /** The q207 per-table catalog: [[ensureCatalog]] applied to the
    * graded [[TpchChainSpec]] (region through lineitem, 15 concurrent
    * metadata-sized legs per micro-batch). */
  private[graft] def ensureJoinArtifacts(s: SparkSession, dir: String): String =
    ensureCatalog(s, dir, TpchChainSpec)

  /** The REGISTRATION API (VERDICT r17 #1): build (once per session ×
    * sf dir × spec name) the stream-maintained catalog for ANY declared
    * [[CatalogSpec]] — per-table row counts, S29 KMV sketches, S28
    * histograms under staged bounds, and S31 MCV value-count tables,
    * all maintained by ONE streaming pass over a [[ReplayCarves]]-batch
    * replay of the
    * UNION of the declared tables (each micro-batch fans to the literal
    * [[NdvStream.processBatch]] / [[countBatch]] /
    * [[StatsStream.processBatch]] / [[McvStream.processBatch]] bodies
    * per (table, column) — concurrent metadata-sized legs). The union
    * frame is the replay VEHICLE only: each artifact's partials remain
    * pure functions of its own table's batch rows, and the merged
    * artifacts are batch-invariant, so DuckDB recomputes them from the
    * base tables alone. Returns the artifact root — point
    * `spark.graft.join.catalog` at it and [[graft.plans.CatalogJoinReorder]]
    * prices the registered tables from the self-describing descriptors. */
  def ensureCatalog(s: SparkSession, dir: String,
      spec: CatalogSpec): String =
    // the two engine-declared specs ride the combined single-pass build
    // (their artifacts are byte-identical either way); user-registered
    // specs build standalone
    if (spec eq TpchChainSpec) ensureAll(s, dir)._2
    else if (spec eq PipelineCatalogSpec) ensureAll(s, dir)._3
    else {
      // engine specs route by reference identity above, so a USER spec
      // reusing an engine catalog's name would delete/rebuild over the
      // engine's scratch root mid-audit (ADVICE r18) — refuse it, along
      // with the combined build's own staging roots
      val reserved = Set(TpchChainSpec.name, PipelineCatalogSpec.name,
        "planner", "planner_all")
      require(!reserved(spec.name),
        s"catalog spec name '${spec.name}' is reserved for the engine's " +
          "own catalogs — pick another name")
      // STANDING MAINTENANCE (VERDICT r18 #3): a cached user build is
      // trusted for the maintain window; past it, the base tables' file
      // footprints are re-probed and a moved signature re-stages +
      // replays (writeDescriptors invalidates the rule's cached load,
      // so the next query actually sees the new data) — no explicit
      // evict. The probe/rebuild runs under the spec's own slot monitor
      // (ADVICE r19), never inside the map's bin lock.
      val maintainSec = scala.util.Try(
        s.sessionState.conf.getConfString(MaintainKey, "60").toLong)
        .getOrElse(60L)
      val slot = cacheJoin.computeIfAbsent(s"$dir|${spec.name}",
        _ => new UserCatalogSlot)
      slot.synchronized {
        val old = slot.cat
        val now = System.nanoTime()
        slot.cat =
          if (old != null && now - old.builtAt < maintainSec * 1000000000L)
            old
          else if (old != null && footprintSig(s, dir, spec) == old.sig)
            old.copy(builtAt = now) // unmoved — revalidate the window
          else buildUserCatalog(s, dir, spec)
        slot.cat.art
      }
    }

  /** One standalone user-catalog build: stage, bound, replay, describe —
    * the same one-pass stream as the engine catalogs, under the spec's
    * own scratch root. */
  private def buildUserCatalog(s: SparkSession, dir: String,
      spec: CatalogSpec): UserCatalog = {
    import s.implicits._
    val sig = footprintSig(s, dir, spec)
    // staged expressions may use the engine's SQL surface (djb2, …)
    graft.GraftFunctions.registerAll(s)
    val base = graft.Scratch.forSf(spec.name, dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val art = s"$base/stats"
    val incoming = s"$base/incoming"
    stagedTables(s, dir, spec).reduce(_.unionByName(_))
      .repartition(ReplayCarves, $"chunk")
      .write.partitionBy("chunk").mode("overwrite").parquet(incoming)
    // staged histogram bounds (the S28 generation artifact —
    // equi-width counts are additive only under FIXED bounds), off
    // one aggregate of the staged parquet
    val bRows = s.read.parquet(incoming)
      .groupBy($"tbl").agg(min($"h").as("hmn"), max($"h").as("hmx"))
      .collect().map(r => r.getString(0) -> r).toMap
    val histBounds = spec.hists.map { h =>
      val r = bRows(h.tag)
      val (mn, mx) = (r.getAs[Double]("hmn"), r.getAs[Double]("hmx"))
      require(mx > mn,
        s"degenerate histogram bounds for ${h.table}.${h.column}")
      (h.id, h.tag, h.column, mn, mx)
    }
    val q = s.readStream
      .schema("tbl string, a bigint, b bigint, h double, d double, " +
        "chunk int")
      .option("maxFilesPerTrigger", 1).parquet(incoming)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val batch = b.drop("chunk")
        batch.persist()
        val counts = batch.groupBy($"tbl").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        fanOut(specLegs(spec, art, histBounds, batch, batchId, counts))
        batch.unpersist()
        ()
      }
      .start()
    require(q.awaitTermination(600000), "catalog artifact stream timeout")
    writeDescriptors(s, spec, art, histBounds)
    UserCatalog(art, System.nanoTime(), sig)
  }

  /** DRIFT RE-ELECTION for a catalog histogram (VERDICT r18 #2): append
    * one micro-batch of new values to a built catalog's S28 histogram
    * through the S30 generation lifecycle. The build stages each
    * histogram's bounds ONCE (equi-width counts are additive only under
    * fixed bounds), which is correct until a standing stream's key
    * domain outgrows the staged (mn, mx) — from then on every arrival
    * clamps into the edge bin and range selectivity degrades silently,
    * the exact staleness ManifestStream's generation-keyed DriftWindow
    * already fixes for zone maps. This seam applies the SAME machinery
    * ([[graft.streaming.StatsGenStream]]) to the catalog: the first
    * append imports the standing flat artifact as generation 0 (carry =
    * the merged flat bins, bounds = the descriptor staging — no
    * recount), and every appended batch runs the literal S30 body
    * (drift telemetry, bounds re-election spanning the observed raw
    * ranges, mass-preserving rebin). The reorder rule's loader prefers
    * a histogram's CURRENT generation when one exists, so post-election
    * estimates discriminate over the drifted domain again
    * (CatalogHistDriftSpec pins degrade-then-recover; the flat path —
    * and every graded q205–q215 read — is byte-untouched for catalogs
    * never appended to). `batch` must carry (p double); `histId` names
    * the spec's [[CatalogHistCol]]. */
  def appendHistBatch(s: SparkSession, art: String, histId: String,
      batch: DataFrame, batchId: Long): Unit = {
    val genRoot = s"$art/h_$histId/gen"
    if (graft.streaming.StatsGenStream.currentGen(s, genRoot).isEmpty) {
      val hb = s.read.parquet(s"$art/hists")
        .where(col("id") === histId).select("mn", "mx").head()
      graft.streaming.StatsGenStream.stageImported(s, genRoot,
        hb.getDouble(0), hb.getDouble(1),
        StatsStream.mergedHistogram(s, s"$art/h_$histId"))
    }
    graft.streaming.StatsGenStream.append(batch, batchId, genRoot)
    // the appended mass must be visible to the next planning decision
    graft.plans.CatalogJoinReorder.invalidate(art)
  }

  /** MCV-HEAD DRIFT for a built catalog (VERDICT r19 #6): append one
    * micro-batch of new key values to a catalog's S31 MCV artifact
    * through the literal maintenance body — the bounded heavy-hitter
    * partial ([[McvStream.processBatchBounded]], ≤ M+1 rows by
    * construction) for a `bounded`-mode descriptor, the exact
    * value-count partial otherwise — without re-staging or replaying
    * anything. The merged head is a per-value SUM over batch partials,
    * so a NEW heavy hitter appearing after build enters the head the
    * moment its partial lands, and every consumer that reads the head —
    * q209/q211's graded arithmetic, [[graft.plans.CatalogJoinReorder]]'s
    * equality/IN pricing and skew-aware edge charges, and above all
    * [[graft.plans.SkewSaltJoin]]'s salt decision — re-prices from it on
    * its next catalog load (invalidated here, exactly like
    * [[appendHistBatch]]). Histograms needed the S30 generation
    * machinery because equi-width bins are additive only under fixed
    * bounds; the MCV count table is pure addition, so drift needs no
    * re-election — just a partial.
    *
    * `batch` must carry (v bigint) in the artifact's CODED domain (the
    * caller applies the descriptor's codec — djb2 for a coded string
    * key — the same way the staging did); `mcvId` names the spec's
    * [[CatalogColumn]] id; `batchId` must not collide with the build's
    * replay carves (use ids ≥ [[ReplayCarves]]) or the standing partial
    * at that id is overwritten rather than appended beside. */
  def appendMcvBatch(s: SparkSession, art: String, mcvId: String,
      batch: DataFrame, batchId: Long): Unit = {
    val mode = s.read.parquet(s"$art/mcvs")
      .where(col("id") === mcvId).select("mode").head().getString(0)
    if (mode == "bounded")
      McvStream.processBatchBounded(batch, batchId, s"$art/m_$mcvId")
    else
      McvStream.processBatch(batch, batchId, s"$art/m_$mcvId")
    // the appended head must be visible to the next planning decision
    graft.plans.CatalogJoinReorder.invalidate(art)
  }

  /** Per-order (name, est-cost expr, exact-cost expr) over the wide
    * catalog row — the q201Profiles pattern widened to the FULL System-R
    * left-deep enumeration: all 8 orders of the 4-chain whose every
    * prefix is connected, not just the 4 cost-distinct profiles.
    * Commuting first pairs share one CANONICAL expression text, so their
    * costs are exactly equal in both engines and the (cost, join_order)
    * tiebreak ranks identically. Estimated ndv per key column is the
    * q200 KMV estimate read off the maintained sketch (CASE text shared
    * verbatim with the oracle); the cascade is q201's containment rule,
    * integer div at each step. Same expression text runs on Spark (div)
    * and DuckDB (//). */
  private[graft] def q207Orders(div: String): Seq[(String, String, String)] =
    chainOrders(div, "n_o")

  /** q208's twin generator: identical enumeration with the ORDERS
    * cardinality symbol swapped for the histogram-estimated filtered
    * cardinality — the Selinger selectivity × cardinality × order
    * composition as one expression-text change. */
  private[graft] def q208Orders(div: String): Seq[(String, String, String)] =
    chainOrders(div, "est_o")

  /** The q200 KMV estimate over a sketch's (sk_<id>, kth_<id>) columns —
    * identical text in Spark SQL (div) and DuckDB (//), shared by the
    * order generators and q209's tail-selectivity CTE. */
  private def dSql(id: String, div: String): String =
    s"(case when sk_$id < ${Layout.KmvK} then sk_$id " +
      s"else cast(${(Layout.KmvK - 1L) * Layout.KmvP} $div " +
      s"greatest(kth_$id, 1) as bigint) end)"

  private def chainOrders(div: String,
      nO: String): Seq[(String, String, String)] = {
    def d(id: String): String = dSql(id, div)
    val dNC = s"greatest(${d("nc_n")}, ${d("nc_c")})"
    val dCO = s"greatest(${d("co_c")}, ${d("co_o")})"
    val dOL = s"greatest(${d("ol_o")}, ${d("ol_l")})"
    def casc(e2: String, n3: String, d3: String) =
      s"($e2) + ($e2) * $n3 $div $d3"
    val viaNC = casc(s"n_n * n_c $div $dNC", nO, dCO)
    val viaCOn = casc(s"n_c * $nO $div $dCO", "n_n", dNC)
    val viaCOl = casc(s"n_c * $nO $div $dCO", "n_l", dOL)
    val viaOL = casc(s"$nO * n_l $div $dOL", "n_c", dCO)
    Seq(
      ("C.N.O.L", viaNC, "x_nc + x_nco"),
      ("C.O.L.N", viaCOl, "x_co + x_col"),
      ("C.O.N.L", viaCOn, "x_co + x_nco"),
      ("L.O.C.N", viaOL, "x_ol + x_col"),
      ("N.C.O.L", viaNC, "x_nc + x_nco"),
      ("O.C.L.N", viaCOl, "x_co + x_col"),
      ("O.C.N.L", viaCOn, "x_co + x_nco"),
      ("O.L.C.N", viaOL, "x_ol + x_col"))
  }

  /** q207 — OPERATIONAL join-order planning (VERDICT r16 #4): q201
    * enumerated the N–C–O–L chain from exact, audit-computed statistics;
    * here the same System-R left-deep enumeration — widened to all 8
    * connected orders — reads ONLY the maintained per-table artifacts
    * ([[ensureJoinArtifacts]]: row counts + KMV ndv sketches kept
    * current per micro-batch), the way a production optimizer reads its
    * catalog. Estimated cost per order is the q201 cascade (sum of
    * estimated intermediate sizes under step-wise containment); exact
    * cost is the same sum over the TRUE sub-chain join counts; the
    * graded verdict is est_rank vs exact_rank per order — the catalog's
    * estimates must induce the true preference order, including picking
    * the dimension-first optimum and rejecting the fact⋈fact-first
    * order (~7× worse on this chain).
    *
    * Scale shape: every estimate touches |batches|·≤K sketch rows and
    * |batches| count rows per table — planning I/O independent of table
    * size. The exact-truth legs are the audit's own price (5 connected
    * sub-chains, one count-aggregated join each, dimension sides
    * auto-broadcast; the two lineitem probes are the genuine fact
    * scans); a production planner never runs them. Enumeration,
    * cascade arithmetic, and ranking run on one wide 1-row frame; the
    * ranking windows order 8 rows. At SF1000 the est products want
    * DECIMAL headroom (the q199/q201 caveat — machine-checked loud by
    * PlannerSpec's int64-headroom leg over these literal generators). */
  /** Catalog consults: sketch + row-count artifacts composed IN-PLAN
    * into one wide 1-row frame, so the estimate arithmetic is the
    * oracle's SQL text verbatim. r20 optimization (guide §2.3/§2.4 —
    * fewer jobs, one listing): formerly 16 crossJoined branches, each a
    * separate parquet read (its own driver-side file listing + schema
    * inference + broadcast job — measured 1.5s/iteration, the single
    * largest shared cost of the q207–q216 family); now ONE multi-path
    * scan per artifact kind with explicit schemas, tagged by
    * input_file_name, ONE grouped aggregate (each sketch's K smallest
    * distinct hashes as a sorted array, each table's row sum), and one
    * conditional-aggregation pivot to the same wide row. Values are
    * identical: per id, size(slice(sorted distinct h, 1, K)) ==
    * count(limit K) and its last element == max(limit K); h is never
    * NULL (NdvStream filters NULL v before hashing); absent groups
    * coalesce to 0 exactly as the empty-branch aggregates did.
    * Measured 1.5s → 0.19s per consult. */
  private def catalogWide(s: SparkSession, art: String): DataFrame =
    wideStats(s, art, JoinSketchCols.map(_.id), JoinTables.map(_.tag))

  private[graft] def wideStats(s: SparkSession, art: String,
      skIds: Seq[String], tags: Seq[String]): DataFrame = {
    import s.implicits._
    val sk = s.read.schema("h BIGINT")
      .option("recursiveFileLookup", "true")
      .parquet(skIds.map(id => s"$art/d_$id/ndv"): _*)
      .select(concat(lit("d:"), regexp_extract(input_file_name(),
        "/d_([a-z0-9_]+)/ndv/", 1)).as("k"), $"h",
        lit(null).cast("bigint").as("n"))
    val nn = s.read.schema("n BIGINT")
      .option("recursiveFileLookup", "true")
      .parquet(tags.map(t => s"$art/n_$t/rows"): _*)
      .select(concat(lit("n:"), regexp_extract(input_file_name(),
        "/n_([a-z0-9_]+)/rows/", 1)).as("k"),
        lit(null).cast("bigint").as("h"), $"n")
    val g = sk.unionByName(nn)
      .groupBy($"k").agg(
        slice(sort_array(collect_set($"h")), 1, Layout.KmvK).as("hs"),
        sum($"n").as("nn"))
    val piv: Seq[Column] = skIds.flatMap { id => Seq(
      coalesce(max(when($"k" === s"d:$id", size($"hs").cast("long"))),
        lit(0L)).as(s"sk_$id"),
      coalesce(max(when($"k" === s"d:$id",
        try_element_at($"hs", greatest(size($"hs"), lit(1))))),
        lit(0L)).as(s"kth_$id"))
    } ++ tags.map { t =>
      coalesce(max(when($"k" === s"n:$t", $"nn")), lit(0L)).as(s"n_$t")
    }
    g.agg(piv.head, piv.tail: _*)
  }

  /** Exact truth: the 5 connected sub-chains, one count-agg join each
    * (the q201 exact legs verbatim), over a caller-supplied orders
    * frame — the full table for q207, σ(orders) for q208. r20
    * optimization (guide §2.4): the five 1-row aggregates union into ONE
    * tagged frame and pivot back by conditional aggregation — one Spark
    * job instead of five crossJoined branches each materializing its own
    * broadcast; counts unchanged (a count aggregate always emits exactly
    * one row, so the pivot's max-per-tag is that count verbatim). */
  private def exactChainCounts(s: SparkSession, dir: String,
      ordersDf: DataFrame): DataFrame = {
    import s.implicits._
    def t(n: String): DataFrame = Tables(s, dir, n)
    val nc = t("nation").join(t("customer"), $"n_nationkey" === $"c_nationkey")
    val co = t("customer").join(ordersDf, $"c_custkey" === $"o_custkey")
    val ol = ordersDf.join(t("lineitem"), $"o_orderkey" === $"l_orderkey")
    unionPivotCounts(Seq(
      "x_nc" -> nc,
      "x_nco" -> nc.join(ordersDf, $"c_custkey" === $"o_custkey"),
      "x_co" -> co,
      "x_col" -> co.join(t("lineitem"), $"o_orderkey" === $"l_orderkey"),
      "x_ol" -> ol))
  }

  /** Stack named count-aggregates as (k, cnt) rows in one union — a
    * single job whose branches schedule together and share reused
    * exchanges — then pivot to the familiar wide 1-row frame. Each
    * branch's count lands verbatim (one row per count aggregate). */
  private def unionPivotCounts(branches: Seq[(String, DataFrame)]): DataFrame =
    unionPivot1(branches.map { case (k, df) =>
      k -> df.agg(count(lit(1)).as("cnt"))
    })

  /** Pivot named 1-row frames (single BIGINT column `cnt`) into one wide
    * row via ONE union + conditional aggregation. */
  private def unionPivot1(branches: Seq[(String, DataFrame)]): DataFrame = {
    val uni = branches.map { case (k, df) =>
      df.select(lit(k).as("k"), col("cnt"))
    }.reduce(_.unionByName(_))
    val piv = branches.map { case (k, _) =>
      coalesce(max(when(col("k") === k, col("cnt"))), lit(0L)).as(k)
    }
    uni.agg(piv.head, piv.tail: _*)
  }

  /** Shared q207/q208 assembly: stack the 8 order legs over the wide
    * frame, grade, rank (an 8-row window). */
  private def rankedOrders(wide: DataFrame,
      legs: Seq[(String, String, String)]): DataFrame = {
    val rows = wide.selectExpr(s"stack(${legs.size}, " +
      legs.map { case (n, est, exact) =>
        s"'$n', cast(($est) as bigint), cast(($exact) as bigint)"
      }.mkString(", ") + ") as (join_order, est_cost, exact_cost)")
    val byEst = Window.orderBy(col("est_cost"), col("join_order"))
    val byExact = Window.orderBy(col("exact_cost"), col("join_order"))
    rows
      .withColumn("err_milli",
        expr("(1000 * (est_cost - exact_cost)) div greatest(exact_cost, 1)"))
      .withColumn("est_rank", row_number().over(byEst).cast("long"))
      .withColumn("exact_rank", row_number().over(byExact).cast("long"))
      .withColumn("rank_match",
        when(col("est_rank") === col("exact_rank"), 1L).otherwise(0L))
      .orderBy(col("join_order"))
  }

  def q207JoinOrderPlan(s: SparkSession, dir: String): DataFrame = {
    val art = ensureJoinArtifacts(s, dir)
    val wide = catalogWide(s, art)
      .crossJoin(exactChainCounts(s, dir, Tables(s, dir, "orders")))
    rankedOrders(wide, q207Orders("div"))
  }

  val q207Oracle: String = {
    val skCtes = JoinSketchCols.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = JoinTables.map { t =>
      val (tag, table) = (t.tag, t.table)
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val stFrom = (JoinSketchCols.map(c => s"a_${c.id}") ++
      JoinTables.map(t => s"nn_${t.tag}")).mkString(", ")
    val legs = q207Orders("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |st AS (SELECT * FROM $stFrom),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey) AS x_nc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey
       |     JOIN orders ON c_custkey = o_custkey) AS x_nco,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN orders ON c_custkey = o_custkey) AS x_co,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN orders ON c_custkey = o_custkey
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_col,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_ol),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  // ----------------------------------------------------------------- q208

  /** Threshold and straddle-bin over a row carrying the staged histogram
    * bounds (hmn, hmx) — identical text in Spark SQL and DuckDB. The
    * narrow t = hmn + range/64 is q205's flip-inducing width. */
  private val tSelSql = "(hmn + (hmx - hmn) / 64.0)"
  private val tbinSql =
    s"least(cast(floor(($tSelSql - hmn) * ${Layout.HistBins} " +
      s"/ (hmx - hmn)) as bigint), ${Layout.HistBins - 1})"

  /** q208 — SELECTIVITY-aware join-order planning, the graded twin of
    * [[graft.plans.CatalogJoinReorder]]'s selectivity leg: the q207
    * enumeration re-run with orders filtered to the narrow
    * σ(o_totalprice ≤ hmn + range/64), where the ESTIMATED filtered
    * cardinality is read off the catalog's maintained S28 histogram
    * (q197's half-straddle rule) and cascaded through every order —
    * one symbol swap in the shared generator ([[q208Orders]]). The
    * graded outcome is the Selinger FLIP: the filtered fact becomes the
    * cheapest opener ({C,O}-first ranks 1) where q207's unfiltered
    * audit put the dimension pair first — est_rank == exact_rank on all
    * 8 orders against the filtered sub-chain truth. Same scale shape as
    * q207; the estimate side adds one ≤4096-row histogram read. */
  def q208SelectiveJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureJoinArtifacts(s, dir)
    val boundsDf = s.read.parquet(s"$art/hists")
      .where($"col" === "o_totalprice")
      .selectExpr("mn as hmn", "mx as hmx")
    val estW = StatsStream.mergedHistogram(s, s"$art/h_ho")
      .crossJoin(broadcast(boundsDf))
      .agg(
        coalesce(sum(when(expr(s"bin < $tbinSql"), $"n")), lit(0L))
          .as("full_o"),
        coalesce(sum(when(expr(s"bin = $tbinSql"), $"n")), lit(0L))
          .as("strad_o"))
      .selectExpr("full_o + (strad_o div 2) as est_o")
    val sOrders = Tables(s, dir, "orders")
      .crossJoin(broadcast(boundsDf))
      .where(expr(s"o_totalprice <= $tSelSql"))
      .drop("hmn", "hmx")
    val wide = catalogWide(s, art)
      .crossJoin(estW)
      .crossJoin(exactChainCounts(s, dir, sOrders))
    rankedOrders(wide, q208Orders("div"))
  }

  val q208Oracle: String = {
    val skCtes = JoinSketchCols.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = JoinTables.map { t =>
      val (tag, table) = (t.tag, t.table)
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val stFrom = (JoinSketchCols.map(c => s"a_${c.id}") ++
      JoinTables.map(t => s"nn_${t.tag}") :+ "e8").mkString(", ")
    val legs = q208Orders("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |b8 AS (
       |  SELECT MIN(o_totalprice) AS hmn, MAX(o_totalprice) AS hmx
       |  FROM orders),
       |hist8 AS (
       |  SELECT LEAST(CAST(FLOOR((o_totalprice - hmn) * ${Layout.HistBins}
       |      / (hmx - hmn)) AS BIGINT), ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders, b8 GROUP BY 1),
       |pt8 AS (SELECT $tSelSql AS t, $tbinSql AS tbin FROM b8),
       |e8 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN h.bin < p.tbin THEN h.n END), 0)
       |    + COALESCE(SUM(CASE WHEN h.bin = p.tbin THEN h.n END), 0) // 2
       |    AS BIGINT) AS est_o
       |  FROM hist8 h, pt8 p),
       |so AS (
       |  SELECT o_orderkey, o_custkey FROM orders, pt8
       |  WHERE o_totalprice <= t),
       |st AS (SELECT * FROM $stFrom),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey) AS x_nc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey
       |     JOIN so ON c_custkey = o_custkey) AS x_nco,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey) AS x_co,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_col,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM so
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_ol),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  // ----------------------------------------------------------------- q209

  /** q209 — EQUALITY-predicate join ordering off the maintained MCV:
    * the third Selinger leg (q207 = cardinality × order, q208 = range
    * selectivity, here = equality selectivity). The audited predicate is
    * `o_custkey = <the (McvSlots+1)-th most common key>` — deliberately
    * the first value PAST the MCV head, so the estimate is the genuine
    * pg_stats tail rule (uniform over the KMV-estimated remainder:
    * `(n − Σhead) div greatest(ndv_est − k, 1)`) rather than an exact
    * head lookup; the key itself and the head mass both come off the
    * maintained S31 value-count artifact, ndv off the S29 sketch, and
    * the cascade is the SHARED generator with est_o swapped in (the
    * q208 pattern — one symbol). Graded q201-style over all 8 orders
    * against the filtered sub-chain truth: σ(orders) ≈ a dozen rows, so
    * the {C,O}-first flip lands again, est_rank == exact_rank.
    *
    * Scale shape: the MCV consult reads the BOUNDED heavy-hitter
    * artifact's merged head (≤ |batches|·(M+1) rows by construction —
    * VERDICT r17 #3's fix for corpus-scaled key domains; the audited
    * ranking and head mass are the bounded table's own, which the
    * oracle recomputes from the deterministic batch carve); the ndv
    * consult is ≤K rows; truth legs are the q207 exact legs over the
    * equality-filtered orders. */
  def q209EqualityJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureJoinArtifacts(s, dir)
    // the BOUNDED heavy-hitter artifact (VERDICT r17 #3): its merged
    // head — per-value sums over ≤ M+1-row partials — replaces the
    // corpus-scaled full value-count table; head counts are exact for
    // any value inside every batch's top-M, and the oracle recomputes
    // the SAME bounded table from the deterministic batch carve
    val ranked = McvStream.mergedBoundedHead(s, s"$art/m_co_o")
      .withColumn("r", row_number().over(Window.orderBy($"n".desc, $"v")))
    val key = ranked.where($"r" === McvSlots + 1).select($"v".as("k_eq"))
    val headW = ranked.agg(
      coalesce(sum(when($"r" <= McvSlots, $"n")), lit(0L)).as("mcv_n"))
    val sOrders = Tables(s, dir, "orders")
      .crossJoin(broadcast(key))
      .where($"o_custkey" === $"k_eq")
      .drop("k_eq")
    val wide = catalogWide(s, art)
      .crossJoin(headW)
      .crossJoin(exactChainCounts(s, dir, sOrders))
      .selectExpr("*", s"cast((n_o - mcv_n) div " +
        s"greatest(${dSql("co_o", "div")} - $McvSlots, 1) as bigint) " +
        "as est_o")
    rankedOrders(wide, q208Orders("div"))
  }

  val q209Oracle: String = {
    val skCtes = JoinSketchCols.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = JoinTables.map { t =>
      val (tag, table) = (t.tag, t.table)
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val stFrom = (JoinSketchCols.map(c => s"a_${c.id}") ++
      JoinTables.map(t => s"nn_${t.tag}") :+ "e9").mkString(", ")
    val legs = q208Orders("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |bch AS (
       |  SELECT o_custkey AS v,
       |    (${Layout.kmvHashSql("o_orderkey")}) % $ReplayCarves AS chunk
       |  FROM orders),
       |bcnt AS (
       |  SELECT chunk, v, CAST(COUNT(*) AS BIGINT) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY chunk
       |      ORDER BY COUNT(*) DESC, v) AS br
       |  FROM bch GROUP BY 1, 2),
       |cnts AS (
       |  SELECT v, CAST(SUM(n) AS BIGINT) AS n FROM bcnt
       |  WHERE br <= ${McvStream.BoundSlots} GROUP BY 1),
       |rkd AS (
       |  SELECT v, n, ROW_NUMBER() OVER (ORDER BY n DESC, v) AS r
       |  FROM cnts),
       |k9 AS (SELECT v AS k_eq FROM rkd WHERE r = ${McvSlots + 1}),
       |h9 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN r <= $McvSlots THEN n END), 0)
       |    AS BIGINT) AS mcv_n
       |  FROM rkd),
       |e9 AS (
       |  SELECT CAST((n.n_o - h.mcv_n)
       |    // GREATEST(${dSql("co_o", "//")} - $McvSlots, 1) AS BIGINT)
       |    AS est_o
       |  FROM nn_o n, h9 h, a_co_o),
       |so AS (
       |  SELECT o_orderkey, o_custkey FROM orders, k9
       |  WHERE o_custkey = k_eq),
       |st AS (SELECT * FROM $stFrom),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey) AS x_nc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey
       |     JOIN so ON c_custkey = o_custkey) AS x_nco,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey) AS x_co,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_col,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM so
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_ol),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  // ----------------------------------------------------------------- q210

  /** q210's audited threshold over the staged c_custkey bounds (hmn,
    * hmx): a key-range filter at one eighth of the domain — ABOVE the
    * entire user_id range, so the filter does not shrink the
    * events ⋈ customer semi-join at all. Identical text in Spark SQL
    * and DuckDB. */
  private val t210Sql = "(hmn + (hmx - hmn) * 8.0 / 64.0)"
  private val tbin210Sql =
    s"least(cast(floor(($t210Sql - hmn) * ${Layout.HistBins} " +
      s"/ (hmx - hmn)) as bigint), ${Layout.HistBins - 1})"

  /** Per-order cost expressions over the REGISTERED pipeline catalog's
    * wide row — the q207 generator pattern on the
    * EM–DC–EV–CU path (embeddings ⋈ documents ⋈ events ⋈ customer),
    * parameterized by whether each edge side's ndv is RESCALED to its
    * relation's estimated rows (`ndv' = min(ndv, r̂)`). Commuting first
    * pairs share canonical text, as throughout the family. */
  private[graft] def q210Orders(div: String,
      rescaled: Boolean): Seq[(String, String, String)] = {
    def capped(id: String, rows: String): String =
      if (rescaled) s"least(${dSql(id, div)}, $rows)" else dSql(id, div)
    val d12 = s"greatest(${capped("em_vec", "n_em")}, " +
      s"${capped("dc_doc", "n_dc")})"
    val d23 = s"greatest(${capped("dc_doc", "n_dc")}, " +
      s"${capped("ev_uid", "n_ev")})"
    val d34 = s"greatest(${capped("ev_uid", "n_ev")}, " +
      s"${capped("cu_key", "est_c")})"
    val sEd = s"n_em * n_dc $div $d12"
    val sDv = s"n_dc * n_ev $div $d23"
    val sVc = s"n_ev * est_c $div $d34"
    def casc(s2: String, n3: String, d3: String) =
      s"($s2) + ($s2) * $n3 $div $d3"
    Seq(
      ("CU.EV.DC.EM", casc(sVc, "n_dc", d23), "x_vc + x_dvc"),
      ("DC.EM.EV.CU", casc(sEd, "n_ev", d23), "x_ed + x_edv"),
      ("DC.EV.CU.EM", casc(sDv, "est_c", d34), "x_dv + x_dvc"),
      ("DC.EV.EM.CU", casc(sDv, "n_em", d12), "x_dv + x_edv"),
      ("EM.DC.EV.CU", casc(sEd, "n_ev", d23), "x_ed + x_edv"),
      ("EV.CU.DC.EM", casc(sVc, "n_dc", d23), "x_vc + x_dvc"),
      ("EV.DC.CU.EM", casc(sDv, "est_c", d34), "x_dv + x_dvc"),
      ("EV.DC.EM.CU", casc(sDv, "n_em", d12), "x_dv + x_edv"))
  }

  /** q210 — POST-FILTER NDV RESCALING, graded (VERDICT r17 #2): the
    * System-R enumeration over the REGISTERED pipeline catalog's
    * EM–DC–EV–CU path with σ(c_custkey ≤ hmn + range·8/64) — a
    * key-range filter whose range still CONTAINS the entire user_id
    * domain, the classic correlated-predicate setting where the
    * independence assumption breaks: the unrescaled cascade discounts
    * the events ⋈ σ(customer) join by the full c_custkey ndv and wrongly
    * crowns the σ(CU)-opening order, while capping each edge side at its
    * estimated rows (`ndv' = min(ndv, r̂)` — post-filter
    * containment-of-value-sets) prices the semi-join right and FLIPS the
    * best order to the dimension pair. Both cascades are emitted
    * (est_cost rescaled, noscale_cost unrescaled) and graded against the
    * exact sub-chain truth: est_rank == exact_rank on all 8 orders at
    * the audited scales while the noscale ranking's top order differs —
    * the flip, oracle-checked. [[graft.plans.CatalogJoinReorder]] applies
    * the same cap in-engine (JoinReorderSpec's rescale leg pins the flip
    * engine-measured).
    *
    * Scale shape: q207's — estimates touch |batches|·≤K metadata rows
    * per table; the exact legs are the audit's own price. */
  def q210RescaledJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureCatalog(s, dir, PipelineCatalogSpec)
    val spec = PipelineCatalogSpec
    // one-job catalog consult (see catalogWide) — values identical to
    // the former per-branch crossJoin
    val statsW = wideStats(s, art,
      spec.sketches.map(_.id), spec.tables.map(_.tag))
    val boundsDf = s.read.parquet(s"$art/hists")
      .where($"col" === "c_custkey")
      .selectExpr("mn as hmn", "mx as hmx")
    val estW = StatsStream.mergedHistogram(s, s"$art/h_hcu")
      .crossJoin(broadcast(boundsDf))
      .agg(
        coalesce(sum(when(expr(s"bin < $tbin210Sql"), $"n")), lit(0L))
          .as("full_c"),
        coalesce(sum(when(expr(s"bin = $tbin210Sql"), $"n")), lit(0L))
          .as("strad_c"))
      .selectExpr("full_c + (strad_c div 2) as est_c")
    val sCust = Tables(s, dir, "customer")
      .crossJoin(broadcast(boundsDf))
      .where(expr(s"cast(c_custkey as double) <= $t210Sql"))
      .select($"c_custkey")
    val em = Tables(s, dir, "embeddings").select($"vec_id")
    val dc = Tables(s, dir, "documents").select($"doc_id")
    val ev = Tables(s, dir, "events").select($"user_id")
    val ed = em.join(dc, $"vec_id" === $"doc_id")
    val dv = dc.join(ev, $"doc_id" === $"user_id")
    val exactW = unionPivotCounts(Seq(
      "x_ed" -> ed,
      "x_dv" -> dv,
      "x_vc" -> ev.join(sCust, $"user_id" === $"c_custkey"),
      "x_edv" -> ed.join(ev, $"doc_id" === $"user_id"),
      "x_dvc" -> dv.join(sCust, $"user_id" === $"c_custkey")))
    val wide = statsW.crossJoin(estW).crossJoin(exactW)
    val legs = q210Orders("div", rescaled = true)
      .zip(q210Orders("div", rescaled = false)).map {
        case ((name, est, exact), (_, noscale, _)) =>
          (name, est, noscale, exact)
      }
    val rows = wide.selectExpr(s"stack(${legs.size}, " +
      legs.map { case (n, est, noscale, exact) =>
        s"'$n', cast(($est) as bigint), cast(($noscale) as bigint), " +
          s"cast(($exact) as bigint)"
      }.mkString(", ") +
      ") as (join_order, est_cost, noscale_cost, exact_cost)")
    rows
      .withColumn("est_rank", row_number().over(
        Window.orderBy(col("est_cost"), col("join_order"))).cast("long"))
      .withColumn("noscale_rank", row_number().over(
        Window.orderBy(col("noscale_cost"), col("join_order"))).cast("long"))
      .withColumn("exact_rank", row_number().over(
        Window.orderBy(col("exact_cost"), col("join_order"))).cast("long"))
      .withColumn("rank_match",
        when(col("est_rank") === col("exact_rank"), 1L).otherwise(0L))
      .orderBy(col("join_order"))
  }

  val q210Oracle: String = {
    val spec = PipelineCatalogSpec
    val skCtes = spec.sketches.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = spec.tables.map { t =>
      s"nn_${t.tag} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_${t.tag} " +
        s"FROM ${t.table})"
    }.mkString(",\n")
    val stFrom = (spec.sketches.map(c => s"a_${c.id}") ++
      spec.tables.map(t => s"nn_${t.tag}") :+ "e10").mkString(", ")
    val legs = q210Orders("//", rescaled = true)
      .zip(q210Orders("//", rescaled = false)).map {
        case ((n, est, exact), (_, noscale, _)) =>
          s"""  SELECT '$n' AS join_order,
             |    CAST(($est) AS BIGINT) AS est_cost,
             |    CAST(($noscale) AS BIGINT) AS noscale_cost,
             |    CAST(($exact) AS BIGINT) AS exact_cost
             |  FROM st, ex""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |b10 AS (
       |  SELECT MIN(CAST(c_custkey AS DOUBLE)) AS hmn,
       |    MAX(CAST(c_custkey AS DOUBLE)) AS hmx
       |  FROM customer),
       |hist10 AS (
       |  SELECT LEAST(CAST(FLOOR((CAST(c_custkey AS DOUBLE) - hmn)
       |      * ${Layout.HistBins} / (hmx - hmn)) AS BIGINT),
       |      ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM customer, b10 GROUP BY 1),
       |pt10 AS (SELECT $t210Sql AS t, $tbin210Sql AS tbin FROM b10),
       |e10 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN h.bin < p.tbin THEN h.n END), 0)
       |    + COALESCE(SUM(CASE WHEN h.bin = p.tbin THEN h.n END), 0) // 2
       |    AS BIGINT) AS est_c
       |  FROM hist10 h, pt10 p),
       |scu AS (
       |  SELECT c_custkey FROM customer, pt10
       |  WHERE CAST(c_custkey AS DOUBLE) <= t),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
       |     JOIN documents ON vec_id = doc_id) AS x_ed,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |     JOIN events ON doc_id = user_id) AS x_dv,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM events
       |     JOIN scu ON user_id = c_custkey) AS x_vc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
       |     JOIN documents ON vec_id = doc_id
       |     JOIN events ON doc_id = user_id) AS x_edv,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |     JOIN events ON doc_id = user_id
       |     JOIN scu ON user_id = c_custkey) AS x_dvc),
       |st AS (SELECT * FROM $stFrom),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, noscale_cost, exact_cost,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY noscale_cost, join_order)
       |    AS BIGINT) AS noscale_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  // ----------------------------------------------------------------- q211

  /** q211 — SKEW-AWARE PHYSICAL PLANNING off the maintained MCV
    * (VERDICT r17 #6): the catalog's S31 head frequencies decide
    * salt-vs-plain for a shuffle key BEFORE any data moves. The rule is
    * the per-task row budget: hash-partitioning over [[Workers]] tasks
    * gives each task n/[[Workers]] rows under uniformity, and a single
    * key carrying more than that CANNOT be balanced by any hash
    * function — the one thing modulo partitioning cannot fix
    * (partitioner/index.js:17–23's djb2 story) — so the decision is
    * `salt iff max-head-frequency > n div Workers`. Audited over two
    * real candidate keys of the registered events table: `user_id`
    * (corpus-scaled, read from the BOUNDED heavy-hitter head) and the
    * 5-value `event_code` enum (exact S31 table) — at the graded scale
    * the enum trips the salt decision (≈n/5 ≫ n/32) while user_id
    * stays under budget → 'plain'. PlannerSpec's engine leg EXECUTES
    * the decision: the salted repartition collapses the per-partition
    * row spread the plain shuffle of the hot key exhibits, and the
    * plain choice for the uniform key avoids the dim-side salt
    * explosion q89 pays.
    *
    * Scale shape: the consult is the artifact head (≤ |batches|·(M+1)
    * rows bounded / value-domain exact) + |batches| count rows — the
    * decision costs metadata, exactly what a planner must pay before
    * committing a 100 TB shuffle. */
  def q211SkewSaltDecision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureCatalog(s, dir, PipelineCatalogSpec)
    val uidW = McvStream.mergedBoundedHead(s, s"$art/m_ev_uid")
      .agg(coalesce(max($"n"), lit(0L)).as("max_uid"))
    val etW = McvStream.mergedCounts(s, s"$art/m_ev_et")
      .agg(coalesce(max($"n"), lit(0L)).as("max_et"))
    val nW = s.read.parquet(s"$art/n_ev/rows")
      .agg(coalesce(sum($"n"), lit(0L)).as("n_ev"))
    uidW.crossJoin(etW).crossJoin(nW)
      .selectExpr(
        "stack(2, 'event_code', max_et, 'user_id', max_uid) " +
          "as (key, max_head_n)",
        "n_ev")
      .selectExpr(
        "key", "max_head_n", "n_ev as n_rows",
        s"n_ev div $Workers as task_budget",
        s"(1000 * max_head_n) div greatest(n_ev div $Workers, 1) " +
          "as skew_ratio_milli",
        s"case when max_head_n > n_ev div $Workers then 'salt' " +
          "else 'plain' end as decision")
      .orderBy($"key")
  }

  val q211Oracle: String =
    s"""WITH bch AS (
       |  SELECT user_id AS v,
       |    (${Layout.kmvHashSql("event_id")}) % $ReplayCarves AS chunk
       |  FROM events),
       |bcnt AS (
       |  SELECT chunk, v, CAST(COUNT(*) AS BIGINT) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY chunk
       |      ORDER BY COUNT(*) DESC, v) AS br
       |  FROM bch GROUP BY 1, 2),
       |ucnt AS (
       |  SELECT v, CAST(SUM(n) AS BIGINT) AS n FROM bcnt
       |  WHERE br <= ${McvStream.BoundSlots} GROUP BY 1),
       |umax AS (
       |  SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_uid FROM ucnt),
       |ecnt AS (
       |  SELECT ${graft.ops.Sql.djb2("event_type")} AS v,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |emax AS (
       |  SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_et FROM ecnt),
       |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ev FROM events),
       |keys AS (
       |  SELECT 'event_code' AS key, max_et AS max_head_n FROM emax
       |  UNION ALL
       |  SELECT 'user_id', max_uid FROM umax)
       |SELECT key, max_head_n, n_ev AS n_rows,
       |  n_ev // $Workers AS task_budget,
       |  CAST((1000 * max_head_n) // GREATEST(n_ev // $Workers, 1)
       |    AS BIGINT) AS skew_ratio_milli,
       |  CASE WHEN max_head_n > n_ev // $Workers THEN 'salt'
       |    ELSE 'plain' END AS decision
       |FROM keys, ne ORDER BY key""".stripMargin

  // ----------------------------------------------------------------- q212

  /** q212's threshold/straddle-bin text over the pipeline catalog's
    * staged bounds rows — (lmn, lmx) for embeddings.label, (cmn, cmx)
    * for c_custkey. Identical text in Spark SQL and DuckDB. */
  private def tbin212Sql(t: String, mn: String, mx: String): String =
    s"least(cast(floor(($t - $mn) * ${Layout.HistBins} " +
      s"/ ($mx - $mn)) as bigint), ${Layout.HistBins - 1})"

  /** Per-plan (name, est-cost expr, exact-cost expr) for the q212
    * shapes: the bushy two-arm tree vs the two contending left-deep
    * chains, priced by the SAME rescaled arithmetic the rule uses. */
  private[graft] def q212Plans(div: String): Seq[(String, String, String)] = {
    def d(id: String) = dSql(id, div)
    val d12 = s"greatest(least(${d("em_vec")}, est_em), " +
      s"least(${d("dc_doc")}, n_dc))"
    val d23 = s"greatest(least(${d("dc_doc")}, n_dc), " +
      s"least(${d("ev_uid")}, n_ev))"
    val d34 = s"greatest(least(${d("ev_uid")}, n_ev), " +
      s"least(${d("cu_key")}, est_c))"
    val sEd = s"(est_em * n_dc $div $d12)"
    val sVc = s"(n_ev * est_c $div $d34)"
    Seq(
      ("bushy_arms", s"$sEd + $sVc", "x_ed + x_vc"),
      ("ld_cu_first", s"$sVc + $sVc * n_dc $div $d23", "x_vc + x_dvc"),
      ("ld_em_first", s"$sEd + $sEd * n_ev $div $d23", "x_ed + x_edv"))
  }

  /** q212 — the BUSHY WIN, graded (VERDICT r17 #4's oracle leg): under
    * σ(label ≤ 1) on embeddings AND σ(c_custkey ≤ 2) on customer, the
    * EM–DC–EV–CU path's optimum is OUTSIDE the left-deep space — the
    * documents→events edge expands, so a left-deep chain must push ONE
    * reduced arm through the expansion while the bushy tree
    * (σEM ⋈ DC) ⋈ (EV ⋈ σCU) reduces BOTH arms first. The three
    * contending shapes (bushy + the two viable left-deep openers) are
    * priced from the registered catalog by the rule's own rescaled
    * arithmetic and graded against exact sub-chain truth: at the
    * audited sf0.01 scale the bushy tree ranks 1 in BOTH est and exact
    * (est_rank == exact_rank on all three shapes, DuckDB-hash-matched)
    * — the same decision `spark.graft.join.bushy` makes in-engine
    * (JoinReorderSpec's bushy leg pins the physical tree). At sf0.001
    * the expansion is only 2× and exact truth narrowly prefers the
    * left-deep chain — the rank columns record it honestly (both
    * engines compute identical integers either way).
    *
    * Scale shape: q207's — estimates are metadata-frame arithmetic;
    * exact legs are four count-agg joins with the filtered sides
    * broadcast. */
  def q212BushyJoinPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureCatalog(s, dir, PipelineCatalogSpec)
    val spec = PipelineCatalogSpec
    // one-job catalog consult (see catalogWide) — values identical to
    // the former per-branch crossJoin
    val statsW = wideStats(s, art,
      spec.sketches.map(_.id), spec.tables.map(_.tag))
    val lb = s.read.parquet(s"$art/hists").where($"col" === "label")
      .selectExpr("mn as lmn", "mx as lmx")
    val cb = s.read.parquet(s"$art/hists").where($"col" === "c_custkey")
      .selectExpr("mn as cmn", "mx as cmx")
    val estEmW = StatsStream.mergedHistogram(s, s"$art/h_hem")
      .crossJoin(broadcast(lb))
      .agg(coalesce(sum(when(
          expr(s"bin < ${tbin212Sql("1.0", "lmn", "lmx")}"), $"n")), lit(0L))
          .as("full_l"),
        coalesce(sum(when(
          expr(s"bin = ${tbin212Sql("1.0", "lmn", "lmx")}"), $"n")), lit(0L))
          .as("strad_l"))
      .selectExpr("full_l + (strad_l div 2) as est_em")
    val estCW = StatsStream.mergedHistogram(s, s"$art/h_hcu")
      .crossJoin(broadcast(cb))
      .agg(coalesce(sum(when(
          expr(s"bin < ${tbin212Sql("2.0", "cmn", "cmx")}"), $"n")), lit(0L))
          .as("full_c"),
        coalesce(sum(when(
          expr(s"bin = ${tbin212Sql("2.0", "cmn", "cmx")}"), $"n")), lit(0L))
          .as("strad_c"))
      .selectExpr("full_c + (strad_c div 2) as est_c")
    val sem = Tables(s, dir, "embeddings")
      .where(expr("cast(label as double) <= 1.0")).select($"vec_id")
    val scu = Tables(s, dir, "customer")
      .where(expr("cast(c_custkey as double) <= 2.0")).select($"c_custkey")
    val dc = Tables(s, dir, "documents").select($"doc_id")
    val ev = Tables(s, dir, "events").select($"user_id")
    val ed = sem.join(dc, $"vec_id" === $"doc_id")
    val exactW = unionPivotCounts(Seq(
      "x_ed" -> ed,
      "x_vc" -> ev.join(broadcast(scu), $"user_id" === $"c_custkey"),
      "x_edv" -> ed.join(ev, $"doc_id" === $"user_id"),
      "x_dvc" -> dc.join(ev, $"doc_id" === $"user_id")
        .join(broadcast(scu), $"user_id" === $"c_custkey")))
    val wide = statsW.crossJoin(estEmW)
      .crossJoin(estCW).crossJoin(exactW)
    val legs = q212Plans("div")
    val rows = wide.selectExpr(s"stack(${legs.size}, " +
      legs.map { case (n, est, exact) =>
        s"'$n', cast(($est) as bigint), cast(($exact) as bigint)"
      }.mkString(", ") + ") as (plan, est_cost, exact_cost)")
    rows
      .withColumn("est_rank", row_number().over(
        Window.orderBy(col("est_cost"), col("plan"))).cast("long"))
      .withColumn("exact_rank", row_number().over(
        Window.orderBy(col("exact_cost"), col("plan"))).cast("long"))
      .withColumn("rank_match",
        when(col("est_rank") === col("exact_rank"), 1L).otherwise(0L))
      .orderBy(col("plan"))
  }

  val q212Oracle: String = {
    val spec = PipelineCatalogSpec
    val skCtes = spec.sketches.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = spec.tables.map { t =>
      s"nn_${t.tag} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_${t.tag} " +
        s"FROM ${t.table})"
    }.mkString(",\n")
    val stFrom = (spec.sketches.map(c => s"a_${c.id}") ++
      spec.tables.map(t => s"nn_${t.tag}") ++
      Seq("e12l", "e12c")).mkString(", ")
    val legs = q212Plans("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS plan,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |bl AS (
       |  SELECT MIN(CAST(label AS DOUBLE)) AS lmn,
       |    MAX(CAST(label AS DOUBLE)) AS lmx
       |  FROM embeddings),
       |bc AS (
       |  SELECT MIN(CAST(c_custkey AS DOUBLE)) AS cmn,
       |    MAX(CAST(c_custkey AS DOUBLE)) AS cmx
       |  FROM customer),
       |histl AS (
       |  SELECT LEAST(CAST(FLOOR((CAST(label AS DOUBLE) - lmn)
       |      * ${Layout.HistBins} / (lmx - lmn)) AS BIGINT),
       |      ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM embeddings, bl GROUP BY 1),
       |histc AS (
       |  SELECT LEAST(CAST(FLOOR((CAST(c_custkey AS DOUBLE) - cmn)
       |      * ${Layout.HistBins} / (cmx - cmn)) AS BIGINT),
       |      ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM customer, bc GROUP BY 1),
       |e12l AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN h.bin <
       |      ${tbin212Sql("1.0", "lmn", "lmx")} THEN h.n END), 0)
       |    + COALESCE(SUM(CASE WHEN h.bin =
       |      ${tbin212Sql("1.0", "lmn", "lmx")} THEN h.n END), 0) // 2
       |    AS BIGINT) AS est_em
       |  FROM histl h, bl),
       |e12c AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN h.bin <
       |      ${tbin212Sql("2.0", "cmn", "cmx")} THEN h.n END), 0)
       |    + COALESCE(SUM(CASE WHEN h.bin =
       |      ${tbin212Sql("2.0", "cmn", "cmx")} THEN h.n END), 0) // 2
       |    AS BIGINT) AS est_c
       |  FROM histc h, bc),
       |sem AS (
       |  SELECT vec_id FROM embeddings WHERE CAST(label AS DOUBLE) <= 1.0),
       |scu AS (
       |  SELECT c_custkey FROM customer
       |  WHERE CAST(c_custkey AS DOUBLE) <= 2.0),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sem
       |     JOIN documents ON vec_id = doc_id) AS x_ed,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM events
       |     JOIN scu ON user_id = c_custkey) AS x_vc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sem
       |     JOIN documents ON vec_id = doc_id
       |     JOIN events ON doc_id = user_id) AS x_edv,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |     JOIN events ON doc_id = user_id
       |     JOIN scu ON user_id = c_custkey) AS x_dvc),
       |st AS (SELECT * FROM $stFrom),
       |costed AS (
       |$legs
       |)
       |SELECT plan, est_cost, exact_cost,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, plan) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, plan) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, plan)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, plan)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY plan""".stripMargin
  }

  // ----------------------------------------------------------- q214/q215

  /** q214's window thresholds over the staged (hmn, hmx) bounds: a
    * 2/64-wide slice CENTRED in the domain — identical text in Spark
    * SQL and DuckDB. Mid-domain is the point: composing the two
    * one-sided estimates under independence keeps ~24% of the mass
    * (0.5 × 0.47) and misses the flip; estLE(hi) − estLE(lo) prices
    * the ~n/32 window right. */
  private val tLo214Sql = "(hmn + (hmx - hmn) * 30.0 / 64.0)"
  private val tHi214Sql = "(hmn + (hmx - hmn) * 32.0 / 64.0)"
  private def tbin214(t: String): String =
    s"least(cast(floor(($t - hmn) * ${Layout.HistBins} " +
      s"/ (hmx - hmn)) as bigint), ${Layout.HistBins - 1})"

  /** q214 — BETWEEN selectivity join ordering (VERDICT r18 #7): the
    * q208 enumeration with orders filtered to the mid-domain window
    * `o_totalprice BETWEEN lo AND hi`, where the estimated filtered
    * cardinality is the COMPOSED histogram read
    * `estLE(hi) − estLE(lo)` — the rule's own arithmetic
    * ([[graft.plans.CatalogJoinReorder]] pools a lower and an upper
    * bound per attribute before scaling; JoinReorderSpec's BETWEEN leg
    * pins the same flip engine-measured). Graded q201-style over all 8
    * orders against the window-filtered sub-chain truth: the {C,O}
    * openers flip fact-first exactly as q208's one-sided narrow filter
    * did, est_rank == exact_rank. Same scale shape as q208 — the
    * estimate adds one more threshold over the same ≤4096-row
    * histogram read. */
  def q214BetweenJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureJoinArtifacts(s, dir)
    val boundsDf = s.read.parquet(s"$art/hists")
      .where($"col" === "o_totalprice")
      .selectExpr("mn as hmn", "mx as hmx")
    val estW = StatsStream.mergedHistogram(s, s"$art/h_ho")
      .crossJoin(broadcast(boundsDf))
      .agg(
        coalesce(sum(when(expr(s"bin < ${tbin214(tLo214Sql)}"), $"n")),
          lit(0L)).as("full_lo"),
        coalesce(sum(when(expr(s"bin = ${tbin214(tLo214Sql)}"), $"n")),
          lit(0L)).as("strad_lo"),
        coalesce(sum(when(expr(s"bin < ${tbin214(tHi214Sql)}"), $"n")),
          lit(0L)).as("full_hi"),
        coalesce(sum(when(expr(s"bin = ${tbin214(tHi214Sql)}"), $"n")),
          lit(0L)).as("strad_hi"))
      .selectExpr("greatest((full_hi + (strad_hi div 2)) - " +
        "(full_lo + (strad_lo div 2)), 0) as est_o")
    val sOrders = Tables(s, dir, "orders")
      .crossJoin(broadcast(boundsDf))
      .where(expr(s"o_totalprice >= $tLo214Sql and " +
        s"o_totalprice <= $tHi214Sql"))
      .drop("hmn", "hmx")
    val wide = catalogWide(s, art)
      .crossJoin(estW)
      .crossJoin(exactChainCounts(s, dir, sOrders))
    rankedOrders(wide, q208Orders("div"))
  }

  val q214Oracle: String = {
    val skCtes = JoinSketchCols.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = JoinTables.map { t =>
      val (tag, table) = (t.tag, t.table)
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val stFrom = (JoinSketchCols.map(c => s"a_${c.id}") ++
      JoinTables.map(t => s"nn_${t.tag}") :+ "e14").mkString(", ")
    val legs = q208Orders("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |b14 AS (
       |  SELECT MIN(o_totalprice) AS hmn, MAX(o_totalprice) AS hmx
       |  FROM orders),
       |hist14 AS (
       |  SELECT LEAST(CAST(FLOOR((o_totalprice - hmn) * ${Layout.HistBins}
       |      / (hmx - hmn)) AS BIGINT), ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders, b14 GROUP BY 1),
       |pt14 AS (
       |  SELECT $tLo214Sql AS t_lo, $tHi214Sql AS t_hi,
       |    ${tbin214(tLo214Sql)} AS tbin_lo,
       |    ${tbin214(tHi214Sql)} AS tbin_hi
       |  FROM b14),
       |e14 AS (
       |  SELECT CAST(GREATEST(
       |    (COALESCE(SUM(CASE WHEN h.bin < p.tbin_hi THEN h.n END), 0)
       |      + COALESCE(SUM(CASE WHEN h.bin = p.tbin_hi THEN h.n END), 0)
       |        // 2)
       |    - (COALESCE(SUM(CASE WHEN h.bin < p.tbin_lo THEN h.n END), 0)
       |      + COALESCE(SUM(CASE WHEN h.bin = p.tbin_lo THEN h.n END), 0)
       |        // 2), 0) AS BIGINT) AS est_o
       |  FROM hist14 h, pt14 p),
       |so AS (
       |  SELECT o_orderkey, o_custkey FROM orders, pt14
       |  WHERE o_totalprice >= t_lo AND o_totalprice <= t_hi),
       |st AS (SELECT * FROM $stFrom),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey) AS x_nc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey
       |     JOIN so ON c_custkey = o_custkey) AS x_nco,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey) AS x_co,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_col,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM so
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_ol),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  /** q215 — IN-LIST selectivity join ordering (VERDICT r18 #7): the
    * q209 enumeration with orders filtered to
    * `o_custkey IN (k₃₃, k₃₄, k₃₅)` — the three keys just PAST the MCV
    * head, so every list member prices by the uniform tail and the
    * composed estimate is exactly 3 tail slots:
    * `3 · (n − Σhead) div greatest(ndv_est − k, 1)` — Σ estEq over the
    * distinct list values, the rule's own IN arithmetic
    * (JoinReorderSpec's IN-list leg pins the same flip
    * engine-measured). Keys and head mass come off the maintained
    * BOUNDED S31 artifact, ndv off the S29 sketch; graded over all 8
    * orders against the IN-filtered sub-chain truth. Same scale shape
    * as q209. */
  def q215InlistJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureJoinArtifacts(s, dir)
    val ranked = McvStream.mergedBoundedHead(s, s"$art/m_co_o")
      .withColumn("r", row_number().over(Window.orderBy($"n".desc, $"v")))
    val keys = ranked
      .where($"r" > McvSlots && $"r" <= McvSlots + 3)
      .select($"v".as("k_in"))
    val headW = ranked.agg(
      coalesce(sum(when($"r" <= McvSlots, $"n")), lit(0L)).as("mcv_n"))
    val sOrders = Tables(s, dir, "orders")
      .join(broadcast(keys), $"o_custkey" === $"k_in")
      .drop("k_in")
    val wide = catalogWide(s, art)
      .crossJoin(headW)
      .crossJoin(exactChainCounts(s, dir, sOrders))
      .selectExpr("*", s"cast(3 * ((n_o - mcv_n) div " +
        s"greatest(${dSql("co_o", "div")} - $McvSlots, 1)) as bigint) " +
        "as est_o")
    rankedOrders(wide, q208Orders("div"))
  }

  val q215Oracle: String = {
    val skCtes = JoinSketchCols.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = JoinTables.map { t =>
      val (tag, table) = (t.tag, t.table)
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val stFrom = (JoinSketchCols.map(c => s"a_${c.id}") ++
      JoinTables.map(t => s"nn_${t.tag}") :+ "e15").mkString(", ")
    val legs = q208Orders("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |bch AS (
       |  SELECT o_custkey AS v,
       |    (${Layout.kmvHashSql("o_orderkey")}) % $ReplayCarves AS chunk
       |  FROM orders),
       |bcnt AS (
       |  SELECT chunk, v, CAST(COUNT(*) AS BIGINT) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY chunk
       |      ORDER BY COUNT(*) DESC, v) AS br
       |  FROM bch GROUP BY 1, 2),
       |cnts AS (
       |  SELECT v, CAST(SUM(n) AS BIGINT) AS n FROM bcnt
       |  WHERE br <= ${McvStream.BoundSlots} GROUP BY 1),
       |rkd AS (
       |  SELECT v, n, ROW_NUMBER() OVER (ORDER BY n DESC, v) AS r
       |  FROM cnts),
       |k15 AS (SELECT v AS k_in FROM rkd
       |  WHERE r > $McvSlots AND r <= ${McvSlots + 3}),
       |h15 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN r <= $McvSlots THEN n END), 0)
       |    AS BIGINT) AS mcv_n
       |  FROM rkd),
       |e15 AS (
       |  SELECT CAST(3 * ((n.n_o - h.mcv_n)
       |    // GREATEST(${dSql("co_o", "//")} - $McvSlots, 1)) AS BIGINT)
       |    AS est_o
       |  FROM nn_o n, h15 h, a_co_o),
       |so AS (
       |  SELECT o_orderkey, o_custkey FROM orders
       |  JOIN k15 ON o_custkey = k_in),
       |st AS (SELECT * FROM $stFrom),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey) AS x_nc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey
       |     JOIN so ON c_custkey = o_custkey) AS x_nco,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey) AS x_co,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_col,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM so
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_ol),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  // ----------------------------------------------------------------- q213

  /** The 9-relation join graph the graded q213 audit prices: the full
    * TPC-H chain catalog (region–nation–customer–orders–lineitem–
    * supplier) bridged to the registered pipeline catalog
    * (events–documents–embeddings) through customer ⋈ events on
    * c_custkey = user_id — the same region JoinReorderSpec's 9-relation
    * engine leg reorders. Each entry: (tag, cardinality symbol, base
    * table, exact-side table expression). Orders price with the q208
    * σ(orders) estimate (`est_o`) in the o slot. */
  private val NineRels: Map[Char, (String, String)] = Map(
    'R' -> ("n_r", "region"),
    'N' -> ("n_n", "nation"),
    'C' -> ("n_c", "customer"),
    'O' -> ("est_o", "so"),
    'L' -> ("n_l", "lineitem"),
    'S' -> ("n_s", "supplier"),
    'E' -> ("n_ev", "events"),
    'D' -> ("n_dc", "documents"),
    'M' -> ("n_em", "embeddings"))

  /** The tree's 8 edges: (tagA, tagB, denominator symbol, SQL join
    * condition). Denominator symbols resolve in the `den` frame/CTE —
    * greatest of the two sides' KMV estimates, precomputed once so the
    * 9-step cascades stay readable text. */
  private val NineEdges: Seq[(Char, Char, String, String)] = Seq(
    ('R', 'N', "d9_rn", "r_regionkey = n_regionkey"),
    ('N', 'C', "d9_nc", "n_nationkey = c_nationkey"),
    ('C', 'O', "d9_co", "c_custkey = o_custkey"),
    ('O', 'L', "d9_ol", "o_orderkey = l_orderkey"),
    ('L', 'S', "d9_ls", "l_suppkey = s_suppkey"),
    ('C', 'E', "d9_ce", "c_custkey = user_id"),
    ('E', 'D', "d9_ed", "user_id = doc_id"),
    ('D', 'M', "d9_dm", "doc_id = vec_id"))

  /** The denominator definitions, shared Spark/DuckDB via `div`. */
  private def nineDenoms(div: String): Seq[(String, String)] = Seq(
    ("d9_rn", s"greatest(${dSql("rn_r", div)}, ${dSql("rn_n", div)})"),
    ("d9_nc", s"greatest(${dSql("nc_n", div)}, ${dSql("nc_c", div)})"),
    ("d9_co", s"greatest(${dSql("co_c", div)}, ${dSql("co_o", div)})"),
    ("d9_ol", s"greatest(${dSql("ol_o", div)}, ${dSql("ol_l", div)})"),
    ("d9_ls", s"greatest(${dSql("ls_l", div)}, ${dSql("ss_s", div)})"),
    ("d9_ce", s"greatest(${dSql("co_c", div)}, ${dSql("ev_uid", div)})"),
    ("d9_ed", s"greatest(${dSql("ev_uid", div)}, ${dSql("dc_doc", div)})"),
    ("d9_dm", s"greatest(${dSql("dc_doc", div)}, ${dSql("em_vec", div)})"))

  /** The priced subset of the 9-relation order space: four connected
    * left-deep orders spanning the decision's extremes — dimension-
    * first, fact-first, pipeline-first, and the σ(orders)-first opener
    * the narrow window should crown. */
  private val NineOrders: Seq[String] = Seq(
    "R.N.C.O.L.S.E.D.M",
    "L.O.C.N.R.E.D.M.S",
    "M.D.E.C.O.L.S.N.R",
    "O.C.N.R.E.D.M.L.S")

  /** The unique edge joining `tag` to a connected prefix (a tree — at
    * most one exists; orders are authored connected). */
  private def nineEdgeInto(tag: Char, prefix: Set[Char])
      : (Char, Char, String, String) =
    NineEdges.find { case (a, b, _, _) =>
      (a == tag && prefix(b)) || (b == tag && prefix(a))
    }.getOrElse(throw new IllegalArgumentException(
      s"order step $tag does not connect to $prefix"))

  /** Exact-count column name for a relation SUBSET — sorted tags, so
    * prefixes shared between orders compute once. */
  private def nineKey(tags: Set[Char]): String =
    "x9_" + tags.toSeq.sorted.mkString.toLowerCase

  /** Per-tag edge-key columns — every column the tag contributes to any
    * [[NineEdges]] condition. Grouping a base table to these columns
    * with a row-count weight preserves every prefix join count exactly
    * (the join graph is a tree and joins touch only these columns). */
  private val NineKeyCols: Map[Char, Seq[String]] = Map(
    'R' -> Seq("r_regionkey"),
    'N' -> Seq("n_regionkey", "n_nationkey"),
    'C' -> Seq("c_nationkey", "c_custkey"),
    'O' -> Seq("o_custkey", "o_orderkey"),
    'L' -> Seq("l_orderkey", "l_suppkey"),
    'S' -> Seq("s_suppkey"),
    'E' -> Seq("user_id"),
    'D' -> Seq("doc_id"),
    'M' -> Seq("vec_id"))

  /** The column `tag` contributes to an edge (conditions are authored
    * `<aCol> = <bCol>`). */
  private def nineEdgeCol(edge: (Char, Char, String, String),
      tag: Char): String = {
    val parts = edge._4.split(" = ")
    if (tag == edge._1) parts(0) else parts(1)
  }

  /** Boundary key columns of a connected subset: for each tree edge
    * crossing the subset boundary, the inside tag's column — exactly the
    * attributes future joins of any order extension can touch. */
  private def nineBoundaryCols(sub: Set[Char]): Seq[String] =
    NineEdges.collect {
      case e @ (a, b, _, _) if sub(a) && !sub(b) => nineEdgeCol(e, a)
      case e @ (a, b, _, _) if sub(b) && !sub(a) => nineEdgeCol(e, b)
    }.distinct

  /** Every distinct exact prefix (size 2..8) across [[NineOrders]],
    * with a connected ADDITION order to build its join from. */
  private def ninePrefixes: Seq[(String, Seq[Char])] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Char]]
    NineOrders.foreach { o =>
      val tags = o.split("\\.").map(_.head).toSeq
      (2 to 8).foreach { k =>
        val pre = tags.take(k)
        val key = nineKey(pre.toSet)
        if (!seen.contains(key)) seen(key) = pre
      }
    }
    seen.toSeq
  }

  /** Per-order (name, est expr, exact expr) — the q207 convention over
    * the 9-relation space: est = Σ of 7 cascaded intermediate sizes
    * (integer div at each step, denominators off the `d9_*` symbols),
    * exact = Σ of the 7 maintained prefix counts. Identical text in
    * Spark (div) and DuckDB (//). */
  private[graft] def nineOrderLegs(div: String)
      : Seq[(String, String, String)] =
    NineOrders.map { o =>
      val tags = o.split("\\.").map(_.head).toSeq
      val (t0, t1) = (tags.head, tags(1))
      val e01 = nineEdgeInto(t1, Set(t0))
      var size = s"${NineRels(t0)._1} * ${NineRels(t1)._1} $div ${e01._3}"
      val sizes = scala.collection.mutable.Buffer(s"($size)")
      tags.drop(2).zipWithIndex.foreach { case (t, i) =>
        val edge = nineEdgeInto(t, tags.take(i + 2).toSet)
        size = s"($size) * ${NineRels(t)._1} $div ${edge._3}"
        if (i < tags.size - 3) sizes += s"($size)" // root size excluded
      }
      val exact = (2 to 8).map(k => nineKey(tags.take(k).toSet))
        .mkString(" + ")
      (o, sizes.mkString(" + "), exact)
    }

  /** q213 — 9-RELATION selective join-order planning (VERDICT r19 #7,
    * the r18 stretch): the q208 composition lifted past the 4-chain to
    * the TPC-H×pipeline region the engine's own DPccp/GOO enumerations
    * plan — 9 relations, 8 tree edges, two STREAM-MAINTAINED catalogs
    * consulted side by side (the chain artifacts price five edges, the
    * registered pipeline artifacts three, and the bridging
    * customer⋈events edge prices from one of each). Orders are
    * filtered to the narrow q208 window, so the estimate composes
    * selectivity (estLE off the maintained histogram) × cardinality ×
    * 9-relation order from artifacts alone; the exact legs are the 26
    * distinct connected prefixes of the four priced orders, each a
    * count-aggregated join over the σ(orders) sub-region (dimension
    * sides broadcast; prefixes shared between orders compute once).
    * No fourth catalog build: both consulted catalogs ride the one
    * combined planner_prep stream — supplier and l_suppkey joined the
    * chain spec as two staged legs, exactly the "two legs away"
    * VERDICT r19 called out. Scale shape: estimates read ≤4096
    * histogram rows + |batches|·≤K sketch rows per column; a
    * production planner never runs the exact legs. */
  def q213NineJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val artJ = ensureJoinArtifacts(s, dir)
    val artP = ensureCatalog(s, dir, PipelineCatalogSpec)
    val boundsDf = s.read.parquet(s"$artJ/hists")
      .where($"col" === "o_totalprice")
      .selectExpr("mn as hmn", "mx as hmx")
    val estW = StatsStream.mergedHistogram(s, s"$artJ/h_ho")
      .crossJoin(broadcast(boundsDf))
      .agg(
        coalesce(sum(when(expr(s"bin < $tbinSql"), $"n")), lit(0L))
          .as("full_o"),
        coalesce(sum(when(expr(s"bin = $tbinSql"), $"n")), lit(0L))
          .as("strad_o"))
      .selectExpr("full_o + (strad_o div 2) as est_o")
    val sOrders = Tables(s, dir, "orders")
      .crossJoin(broadcast(boundsDf))
      .where(expr(s"o_totalprice <= $tSelSql"))
      .drop("hmn", "hmx")
    // the pipeline catalog's three sketches + three counts, read with
    // the same in-plan branches as catalogWide
    // one-job catalog consult (see catalogWide) — values identical to
    // the former per-branch crossJoin
    val pipeWide = wideStats(s, artP,
      PipelineCatalogSpec.sketches
        .filter(c => Set("em_vec", "dc_doc", "ev_uid")(c.id)).map(_.id),
      PipelineCatalogSpec.tables
        .filter(t => Set("em", "dc", "ev")(t.tag)).map(_.tag))
    // the 26 distinct exact prefix counts, σ(orders) in the o slot.
    // r20 optimization (guide §2.3 "aggregate before you shuffle" /
    // §8 "decide with small rows"): formerly 26 INDEPENDENT multi-way
    // joins over the raw tables (118 scans, measured 2.0–3.5s); now
    // each base table folds ONCE to its edge-key columns with a
    // row-count weight, prefix frames extend one weighted join at a
    // time (memoized on the relation SET, so shared prefixes are shared
    // subplans), collapse to the subset's tree-boundary columns after
    // every step, and each prefix count is Σw — identical to the raw
    // join count because the join graph is a tree and every join
    // condition touches only the grouped columns (weights multiply
    // exactly the rows the raw join would have produced).
    def baseFrame(tag: Char): DataFrame =
      if (tag == 'O') sOrders else Tables(s, dir, NineRels(tag)._2)
    // key-projected inputs (row counts unchanged — the join conditions
    // touch only these columns), each chain streams its one fact-sized
    // side (lineitem) map-side with every other side broadcast-hinted:
    // a prefix count is ONE map-only stage over a columnar key scan
    // plus tiny broadcast builds, instead of a shuffle join per step
    def projRaw(tag: Char): DataFrame =
      baseFrame(tag).select(NineKeyCols(tag).map(col): _*)
    // σ(orders) is probed by ~20 chain branches; materialize its two
    // key columns once per run (a few thousand rows — localCheckpoint
    // in the timed body, never across runs) so each branch reads memory
    // instead of re-running the filter scan
    val sOrderKeys = projRaw('O').localCheckpoint(true)
    def proj(tag: Char): DataFrame =
      if (tag == 'O') sOrderKeys else projRaw(tag)
    def chainFor(pre: Seq[Char]): DataFrame =
      pre.drop(1).zipWithIndex.foldLeft(proj(pre.head)) {
        case (f, (t, i)) =>
          val edge = nineEdgeInto(t, pre.take(i + 1).toSet)
          f.join(broadcast(proj(t)), expr(edge._4))
      }
    // the 13 lineitem-free prefixes stay literal chain counts (small
    // frames, broadcast joins); the 13 LINEITEM prefixes factor over
    // the tree instead: removing L splits a prefix into its O-side
    // component A and (optionally) supplier, so
    //   count(prefix) = Σ_{l ∈ lineitem} m_A(l_orderkey) [· m_S(l_suppkey)]
    // with m_A the A-chain's per-orderkey row multiplicities — ONE
    // map-side pass over the lineitem key columns (9 broadcast left
    // joins + one aggregate of products) replaces 13 independent
    // fact-side joins. Multiplicities multiply exactly the rows the raw
    // join would produce; a non-matching side contributes coalesce(0),
    // exactly the rows the raw join would drop.
    val (lPre, smallPre) = ninePrefixes.partition(_._2.contains('L'))
    val smallW = unionPivotCounts(smallPre.map { case (key, addOrder) =>
      key -> chainFor(addOrder)
    })
    val aOrders = lPre.map { case (_, addOrder) =>
      addOrder.filterNot(t => t == 'L' || t == 'S')
    }.distinct
    val mA = aOrders.zipWithIndex.map { case (aOrder, i) =>
      nineKey(aOrder.toSet) ->
        (chainFor(aOrder).groupBy($"o_orderkey")
          .agg(count(lit(1)).as(s"ma_$i"))
          .withColumnRenamed("o_orderkey", s"oak_$i"), i)
    }.toMap
    val mS = Tables(s, dir, "supplier").groupBy($"s_suppkey")
      .agg(count(lit(1)).as("ms"))
    val lJoined = mA.values.toSeq.sortBy(_._2).foldLeft(
      Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")) {
        case (f, (m, i)) =>
          f.join(broadcast(m), $"l_orderkey" === col(s"oak_$i"), "left")
      }
      .join(broadcast(mS), $"l_suppkey" === $"s_suppkey", "left")
    val lAggs: Seq[Column] = lPre.map { case (key, addOrder) =>
      val i = mA(nineKey(
        addOrder.filterNot(t => t == 'L' || t == 'S').toSet))._2
      val term =
        if (addOrder.contains('S'))
          coalesce(col(s"ma_$i"), lit(0L)) * coalesce($"ms", lit(0L))
        else coalesce(col(s"ma_$i"), lit(0L))
      coalesce(sum(term), lit(0L)).as(key)
    }
    val exacts = smallW.crossJoin(lJoined.agg(lAggs.head, lAggs.tail: _*))
    val wide = catalogWide(s, artJ)
      .crossJoin(pipeWide)
      .crossJoin(estW)
      .crossJoin(exacts)
      .selectExpr(("*" +: nineDenoms("div").map { case (sym, d) =>
        s"($d) as $sym"
      }): _*)
    rankedOrders(wide, nineOrderLegs("div"))
  }

  val q213Oracle: String = {
    val allSketch = JoinSketchCols ++ PipelineCatalogSpec.sketches
      .filter(c => Set("em_vec", "dc_doc", "ev_uid")(c.id))
    val skCtes = allSketch.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val allTabs = JoinTables.map(t => (t.tag, t.table)) ++
      Seq(("ev", "events"), ("dc", "documents"), ("em", "embeddings"))
    val nCtes = allTabs.map { case (tag, table) =>
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val exSubqs = ninePrefixes.map { case (key, addOrder) =>
      val from = addOrder.drop(1).zipWithIndex
        .foldLeft(NineRels(addOrder.head)._2) { case (f, (t, i)) =>
          val edge = nineEdgeInto(t, addOrder.take(i + 1).toSet)
          s"$f JOIN ${NineRels(t)._2} ON ${edge._4}"
        }
      s"    (SELECT CAST(COUNT(*) AS BIGINT) FROM $from) AS $key"
    }.mkString(",\n")
    val denoms = nineDenoms("//").map { case (sym, d) =>
      s"    CAST(($d) AS BIGINT) AS $sym"
    }.mkString(",\n")
    val stFrom = (allSketch.map(c => s"a_${c.id}") ++
      allTabs.map { case (tag, _) => s"nn_$tag" } :+ "e13").mkString(", ")
    val legs = nineOrderLegs("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM den, ex9""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |b13 AS (
       |  SELECT MIN(o_totalprice) AS hmn, MAX(o_totalprice) AS hmx
       |  FROM orders),
       |hist13 AS (
       |  SELECT LEAST(CAST(FLOOR((o_totalprice - hmn) * ${Layout.HistBins}
       |      / (hmx - hmn)) AS BIGINT), ${Layout.HistBins - 1}) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM orders, b13 GROUP BY 1),
       |pt13 AS (SELECT $tSelSql AS t, $tbinSql AS tbin FROM b13),
       |e13 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN h.bin < p.tbin THEN h.n END), 0)
       |    + COALESCE(SUM(CASE WHEN h.bin = p.tbin THEN h.n END), 0) // 2
       |    AS BIGINT) AS est_o
       |  FROM hist13 h, pt13 p),
       |so AS (
       |  SELECT o_orderkey, o_custkey FROM orders, pt13
       |  WHERE o_totalprice <= t),
       |st AS (SELECT * FROM $stFrom),
       |den AS (
       |  SELECT *,
       |$denoms
       |  FROM st),
       |ex9 AS (
       |  SELECT
       |$exSubqs),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  // ----------------------------------------------------------------- q216

  /** q216 — OR-OF-EQUALITIES join ordering (VERDICT r19 #5's graded
    * twin): q215's shape with the filter authored as
    * `o_custkey = k₃₃ OR o_custkey = k₃₄ OR o_custkey = k₃₅` instead of
    * an IN-list — the disjunction Spark does NOT canonicalize to IN,
    * which is exactly why [[graft.plans.CatalogJoinReorder]] prices it
    * explicitly (min(n, Σ estEq), the same composition; JoinReorderSpec's
    * OR leg pins the engine flip). The estimate is byte-identical to
    * q215's — an OR chain over one attribute IS an IN-list — and the
    * exact legs select the same rows through the OR text (scalar
    * subqueries off the same ranked bounded head), so est_rank ==
    * exact_rank grades the equivalence end to end. Same scale shape as
    * q215: keys and head mass off the ≤|batches|·(M+1)-row bounded
    * artifact, ndv off the S29 sketch. */
  def q216OrJoinOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val art = ensureJoinArtifacts(s, dir)
    val ranked = McvStream.mergedBoundedHead(s, s"$art/m_co_o")
      .withColumn("r", row_number().over(Window.orderBy($"n".desc, $"v")))
    // the three tail keys as DRIVER-SIDE literals — the consumer shape
    // the rule's Or branch prices (a 3-row metadata read, exactly how a
    // user authors an OR filter)
    val ks = ranked
      .where($"r" > McvSlots && $"r" <= McvSlots + 3)
      .orderBy($"r").select($"v").collect().map(_.getLong(0))
    val headW = ranked.agg(
      coalesce(sum(when($"r" <= McvSlots, $"n")), lit(0L)).as("mcv_n"))
    val sOrders = Tables(s, dir, "orders")
      .where($"o_custkey" === ks(0) || $"o_custkey" === ks(1) ||
        $"o_custkey" === ks(2))
    val wide = catalogWide(s, art)
      .crossJoin(headW)
      .crossJoin(exactChainCounts(s, dir, sOrders))
      .selectExpr("*", s"cast(3 * ((n_o - mcv_n) div " +
        s"greatest(${dSql("co_o", "div")} - $McvSlots, 1)) as bigint) " +
        "as est_o")
    rankedOrders(wide, q208Orders("div"))
  }

  val q216Oracle: String = {
    val skCtes = JoinSketchCols.map { c =>
      val (id, table, column) = (c.id, c.table, c.column)
      s"""sk_$id AS (
         |  SELECT DISTINCT ${Layout.kmvHashSql(column)} AS h FROM $table
         |  WHERE $column IS NOT NULL ORDER BY h LIMIT ${Layout.KmvK}),
         |a_$id AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS sk_$id,
         |    CAST(COALESCE(MAX(h), 0) AS BIGINT) AS kth_$id
         |  FROM sk_$id)""".stripMargin
    }.mkString(",\n")
    val nCtes = JoinTables.map { t =>
      val (tag, table) = (t.tag, t.table)
      s"nn_$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$tag FROM $table)"
    }.mkString(",\n")
    val stFrom = (JoinSketchCols.map(c => s"a_${c.id}") ++
      JoinTables.map(t => s"nn_${t.tag}") :+ "e16").mkString(", ")
    val legs = q208Orders("//").map { case (n, est, exact) =>
      s"""  SELECT '$n' AS join_order,
         |    CAST(($est) AS BIGINT) AS est_cost,
         |    CAST(($exact) AS BIGINT) AS exact_cost
         |  FROM st, ex""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $skCtes,
       |$nCtes,
       |bch AS (
       |  SELECT o_custkey AS v,
       |    (${Layout.kmvHashSql("o_orderkey")}) % $ReplayCarves AS chunk
       |  FROM orders),
       |bcnt AS (
       |  SELECT chunk, v, CAST(COUNT(*) AS BIGINT) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY chunk
       |      ORDER BY COUNT(*) DESC, v) AS br
       |  FROM bch GROUP BY 1, 2),
       |cnts AS (
       |  SELECT v, CAST(SUM(n) AS BIGINT) AS n FROM bcnt
       |  WHERE br <= ${McvStream.BoundSlots} GROUP BY 1),
       |rkd AS (
       |  SELECT v, n, ROW_NUMBER() OVER (ORDER BY n DESC, v) AS r
       |  FROM cnts),
       |h16 AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN r <= $McvSlots THEN n END), 0)
       |    AS BIGINT) AS mcv_n
       |  FROM rkd),
       |e16 AS (
       |  SELECT CAST(3 * ((n.n_o - h.mcv_n)
       |    // GREATEST(${dSql("co_o", "//")} - $McvSlots, 1)) AS BIGINT)
       |    AS est_o
       |  FROM nn_o n, h16 h, a_co_o),
       |so AS (
       |  SELECT o_orderkey, o_custkey FROM orders
       |  WHERE o_custkey = (SELECT v FROM rkd WHERE r = ${McvSlots + 1})
       |     OR o_custkey = (SELECT v FROM rkd WHERE r = ${McvSlots + 2})
       |     OR o_custkey = (SELECT v FROM rkd WHERE r = ${McvSlots + 3})),
       |st AS (SELECT * FROM $stFrom),
       |ex AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey) AS x_nc,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
       |     JOIN customer ON n_nationkey = c_nationkey
       |     JOIN so ON c_custkey = o_custkey) AS x_nco,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey) AS x_co,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
       |     JOIN so ON c_custkey = o_custkey
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_col,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM so
       |     JOIN lineitem ON o_orderkey = l_orderkey) AS x_ol),
       |costed AS (
       |$legs
       |)
       |SELECT join_order, est_cost, exact_cost,
       |  CAST((1000 * (est_cost - exact_cost))
       |    // GREATEST(exact_cost, 1) AS BIGINT) AS err_milli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
       |    AS est_rank,
       |  CAST(ROW_NUMBER() OVER (ORDER BY exact_cost, join_order) AS BIGINT)
       |    AS exact_rank,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY est_cost, join_order)
       |         = ROW_NUMBER() OVER (ORDER BY exact_cost, join_order)
       |       THEN 1 ELSE 0 END AS BIGINT) AS rank_match
       |FROM costed ORDER BY join_order""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q205_planner_audit" -> q205PlannerAudit _,
    "q206_compaction_plan" -> q206CompactionPlan _,
    "q207_join_order_plan" -> q207JoinOrderPlan _,
    "q208_selective_join_order" -> q208SelectiveJoinOrder _,
    "q209_equality_join_order" -> q209EqualityJoinOrder _,
    "q210_rescaled_join_order" -> q210RescaledJoinOrder _,
    "q211_skew_salt_decision" -> q211SkewSaltDecision _,
    "q212_bushy_join_plan" -> q212BushyJoinPlan _,
    "q213_nine_join_order" -> q213NineJoinOrder _,
    "q214_between_join_order" -> q214BetweenJoinOrder _,
    "q215_inlist_join_order" -> q215InlistJoinOrder _,
    "q216_or_join_order" -> q216OrJoinOrder _,
  )

  val oracles: Map[String, String] = Map(
    "q205_planner_audit" -> q205Oracle,
    "q206_compaction_plan" -> q206Oracle,
    "q207_join_order_plan" -> q207Oracle,
    "q208_selective_join_order" -> q208Oracle,
    "q209_equality_join_order" -> q209Oracle,
    "q210_rescaled_join_order" -> q210Oracle,
    "q211_skew_salt_decision" -> q211Oracle,
    "q212_bushy_join_plan" -> q212Oracle,
    "q213_nine_join_order" -> q213Oracle,
    "q214_between_join_order" -> q214Oracle,
    "q215_inlist_join_order" -> q215Oracle,
    "q216_or_join_order" -> q216Oracle,
  )
}
