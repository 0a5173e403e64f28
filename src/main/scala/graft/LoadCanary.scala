package graft

import org.apache.spark.sql.SparkSession

/** Load canary for [[Bench]] (VERDICT r14 #1): a fixed, deterministic,
  * sub-second probe timed at the start, middle, and end of a bench run,
  * emitted as `"load_index"` (observed / expected quiesced cost) on the
  * bench JSON line.
  *
  * Why it exists: the r14 official stamps inflated ~40% WHOLESALE under
  * sustained driver-machine load, and the outlier re-pass could not help
  * because its isolated re-times ran under the SAME load — the fourth
  * consecutive round a judge had to hand-adjudicate phantom movers. The
  * stamps cannot be trusted without a statement of the machine they were
  * taken on; the canary IS that statement. load_index ≈ 1.0 reads
  * "quiesced, stamps comparable"; ≥ ~1.4 reads "loaded — adjudicate
  * against isolated re-runs, not round-over-round" (Bench warns loudly
  * there).
  *
  * The probe: a pure-CPU whole-stage-codegen'd aggregate over
  * `spark.range` — [[ProbeRows]] rows in 32 fixed partitions, integer
  * arithmetic only. No I/O, no shuffle, no data dependence: its quiesced
  * cost is a machine constant ([[DefaultExpectedSec]], env-overridable
  * via `SPARK_GRAFT_LOAD_EXPECTED`), and CPU contention — the thing that
  * inflates every other stamp — inflates it proportionally. Each probe
  * point warms to a JIT plateau and takes the MIN of [[ProbeIters]]
  * runs, so neither a cold JVM nor a single scheduler hiccup can fake a
  * loaded machine.
  */
object LoadCanary {

  /** Probe size: 4M rows per core at the bench's local[32] — big enough
    * to span many scheduler quanta AND to drown per-job scheduling
    * jitter (a 32M-row probe swung 0.08–0.22 s quiesced across JVM
    * states, a 2.7× spread that would have drowned the 1.4× signal the
    * canary looks for), small enough that three probe points cost a few
    * seconds of a 150+ s run. The quiesced cost of THIS size, fully
    * warmed, is [[DefaultExpectedSec]] — calibrate against that
    * constant, not this comment. */
  val ProbeRows: Long = 128L * 1000 * 1000

  /** Timed runs per probe point (after one untimed warmup). */
  val ProbeIters: Int = 3

  /** The reference machine's quiesced probe cost in seconds, calibrated
    * on the driver box at the bench's local[32] (quiesced probes land
    * 0.10–0.19 while the JVM is still warming; a fully-warmed run's
    * probes settle at ≈ 0.10–0.12). Overridable with
    * `SPARK_GRAFT_LOAD_EXPECTED` for other machines — the index is a
    * ratio, so only the machine constant moves. The run's start probe
    * reads slightly high (Spark still JIT-warming); the emitted index is
    * the MEDIAN of start/middle/end, so the two steady probes carry it. */
  val DefaultExpectedSec: Double = 0.110

  def expectedSec: Double =
    scala.util.Try(sys.env.get("SPARK_GRAFT_LOAD_EXPECTED").map(_.toDouble))
      .toOption.flatten.filter(e => e > 0 && e.isFinite)
      .getOrElse(DefaultExpectedSec)

  /** One timed probe run: the fixed aggregate, evaluated to one row. */
  private def probeOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, ProbeRows, 1L, 32)
      .selectExpr("id % 997 * 31 + (id >> 3) as x")
      .agg(org.apache.spark.sql.functions.sum("x")).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** One probe point: warm to a JIT plateau, then MIN of [[ProbeIters]]
    * timed runs.
    *
    * Plateau warming: a single untimed warmup is NOT enough — C2 tiering
    * of the probe's generated code keeps improving it for ~8 executions
    * (measured: 0.28 → 0.14 s across points in a fresh JVM), which would
    * make the run's start probe read ×2 "loaded" on a quiesced machine.
    * So warm until consecutive runs stop improving by >10% (bounded).
    *
    * Min, not median, of the timed runs: the canary detects SUSTAINED
    * load (the r14 failure mode inflates every run, min included), and
    * min is far more stable across JVM states — transient one-run spikes
    * (GC, scheduler) are exactly what it exists to ignore. Guarded — a
    * probe failure returns -1 and is dropped from the index rather than
    * breaking the bench contract. */
  def probe(spark: SparkSession): Double =
    try {
      var prev = probeOnce(spark)
      var warmups = 1
      while (warmups < 6 && { val t = probeOnce(spark); val improved = t < prev * 0.9; prev = math.min(prev, t); improved })
        warmups += 1
      (1 to ProbeIters).map(_ => probeOnce(spark)).min
    } catch { case e: Throwable =>
      System.err.println(s"[bench] load canary failed: ${e.getMessage}")
      -1.0
    }

  /** The emitted index: median of the (valid) probe points over the
    * expected quiesced cost, 2 decimals. Median across the run's probe
    * points so a transient spike at one point cannot flag a quiesced
    * run — SUSTAINED load (the r14 failure mode) moves all of them. The
    * LOWER middle for even counts: a single-query subset run has only
    * start+end probes, and the start probe reads high on a cold JVM —
    * the upper middle would stamp such runs "loaded" on a quiet box.
    * Returns -1 when no probe succeeded. */
  def index(observedSec: Seq[Double], expected: Double): Double = {
    val valid = observedSec.filter(t => t > 0 && t.isFinite).sorted
    if (valid.isEmpty || expected <= 0) -1.0
    else math.round(100.0 * valid((valid.size - 1) / 2) / expected) / 100.0
  }
}
