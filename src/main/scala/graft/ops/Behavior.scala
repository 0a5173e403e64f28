package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral analytics over the `events` stream table — the product-
  * analytics query family (funnels, cohort retention) that the reference's
  * CloudWatch dashboard gestures at (app.ts:452–502 charts per-stage
  * throughput; a funnel is the same per-stage accounting made user-causal)
  * and that any large-scale event pipeline is eventually asked for.
  *
  * Scale stance: every shuffle is keyed on `user_id` (funnel stages,
  * cohort assignment) or on the small `(cohort_day, day_offset)` grid; no
  * self-join is ever unkeyed. Timestamp arithmetic is integer microseconds
  * (`unix_micros`), matching DuckDB's `epoch_us` truncation of the same
  * nanosecond parquet column, so stage-window comparisons are bit-identical
  * across engines.
  */
object Behavior {

  private val DayUs = 86400L * 1000000L

  // ---------------------------------------------------------------- q83
  /** First-touch conversion funnel view → click → purchase with a 24-hour
    * step window: a user converts a stage iff the stage's event strictly
    * follows the previous stage's first qualifying event within one day.
    * Output is one row per stage with the surviving-user count — the
    * sequential-semi-join shape every event-analytics engine compiles
    * funnels to.
    *
    * Plan shape: each stage is a keyed aggregation on `user_id` (map-side
    * partial min), then an equi-join to the next stage's events — three
    * shuffles, all on `user_id`, reusing one partitioning; the final
    * per-stage counts are single-row aggregates. Nothing is ever
    * all-pairs, and a 100 TB events table moves only its per-user stage
    * minima between stages.
    */
  def q83Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("v_us"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"us" > $"v_us" && $"us" - $"v_us" <= DayUs)
      .groupBy($"user_id").agg(min($"us").as("c_us"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"us" > $"c_us" && $"us" - $"c_us" <= DayUs)
      .groupBy($"user_id").agg(min($"us").as("p_us"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), $"n_users")
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), $"n_users"))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), $"n_users"))
      .orderBy($"stage")
  }

  val q83Oracle: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |v AS (SELECT user_id, MIN(us) AS v_us FROM e
       |      WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT e.user_id, MIN(us) AS c_us FROM e JOIN v USING (user_id)
       |      WHERE event_type = 'click' AND us > v_us AND us - v_us <= $DayUs
       |      GROUP BY e.user_id),
       |p AS (SELECT e.user_id, MIN(us) AS p_us FROM e JOIN c USING (user_id)
       |      WHERE event_type = 'purchase' AND us > c_us AND us - c_us <= $DayUs
       |      GROUP BY e.user_id)
       |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
       |UNION ALL
       |SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
       |UNION ALL
       |SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
       |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Cohort retention: users are cohorted by the DAY of their first
    * `signup` event; for each (cohort day, day offset ≥ 0) the output
    * counts distinct cohort members with ANY event that many days later —
    * the standard retention triangle. Day boundaries are UTC dates on both
    * engines (the session pins UTC), offsets are integer day differences.
    *
    * Plan shape: cohort assignment is one keyed aggregation on `user_id`;
    * the activity join is an equi-join on `user_id`; the retention count
    * is a two-phase distinct aggregation on the (cohort, offset) grid,
    * whose cardinality is days² — metadata-sized at any corpus scale.
    */
  def q85CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
    val cohorts = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"day").as("cohort_day"))
    e.join(cohorts, "user_id")
      .withColumn("day_offset", datediff($"day", $"cohort_day").cast("long"))
      .filter($"day_offset" >= 0)
      .groupBy($"cohort_day", $"day_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .select($"cohort_day".cast("string").as("cohort_day"), $"day_offset", $"n_users")
      .orderBy($"cohort_day", $"day_offset")
  }

  val q85Oracle: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
      |cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM e
      |            WHERE event_type = 'signup' GROUP BY user_id)
      |SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
      |  CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
      |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN cohorts USING (user_id)
      |WHERE date_diff('day', cohort_day, day) >= 0
      |GROUP BY cohort_day, date_diff('day', cohort_day, day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------- q157
  /** Gap-based sessionization — the missing primitive under q83/q85:
    * a user's event stream splits into sessions at every inactivity gap
    * over 30 minutes (the classic analytics rule), and the output is one
    * row per session with its event count, span, and exact value total.
    * The boundary rule is the gaps-and-islands lag test (q76's run-pass
    * shape applied to time): new_session = no predecessor OR gap >
    * 30 min; the session index is the running sum of boundary flags.
    *
    * Determinism: timestamps are integer microseconds (unix_micros /
    * epoch_us — the q83 contract); within-user order totals on
    * (us, event_id); the value total is the exact decimal sum surfaced
    * as double (the q20 dsum discipline).
    *
    * Plan shape: ONE exchange on user_id feeds both windows (lag and the
    * running boundary sum share the same partitioning and ordering —
    * Catalyst plans a single Window node), and the (user_id, session_idx)
    * roll-up's clustering is satisfied by the same hash partitioning, so
    * no second exchange (the q139 rule). Window state is one row of
    * lookback per user; at 100 TB the per-user event count bounds each
    * in-partition sort — the terasort-per-key shape, never global. */
  /** Shared with the S22 stateful streaming sessionizer — one constant,
    * batch and stream boundaries cannot drift. */
  private[graft] val SessionGapUs = 30L * 60L * 1000000L

  def q157Sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"value", unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"us" - $"prev_us" > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_sess").over(wRun))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        min($"us").as("start_us"), max($"us").as("end_us"),
        sum($"value".cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value"))
      .withColumn("duration_us", $"end_us" - $"start_us")
      .select($"user_id", $"session_idx", $"n_events", $"start_us",
        $"end_us", $"duration_us", $"total_value")
      .orderBy($"user_id", $"session_idx")
  }

  val q157Oracle: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
       |l AS (
       |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
       |    AS prev_us FROM e),
       |m AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
       |    THEN 1 ELSE 0 END AS new_sess FROM l),
       |x AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM m)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  MIN(us) AS start_us, MAX(us) AS end_us,
       |  MAX(us) - MIN(us) AS duration_us,
       |  ${Sql.dsum("value")} AS total_value
       |FROM x GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------- q160
  /** Session ENTRY-TYPE attribution — the question q157's sessions exist
    * to answer: which entry action (the session's FIRST event type)
    * drives engagement and value. Every event inherits its session's
    * entry type via a first_value window over the q157 session
    * assignment (same boundary expressions — the shared-rule
    * discipline), then one roll-up per entry type: sessions, events,
    * exact decimal value total. First-touch attribution at session
    * granularity, the standard product-analytics read.
    *
    * Plan shape: q157's single user_id exchange feeds lag + running
    * boundary sum + the (user, session)-partitioned first_value window —
    * all three windows' partitioning is satisfied by the same user hash,
    * so still ONE data exchange; the entry-type roll-up is a ≤ |event
    * types|-group partial agg (metadata-sized — the histogram-is-the-
    * output contract), and the two-phase distinct session count keys on
    * (user, session) — clustered by the same hash. */
  def q160SessionAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"us" - $"prev_us" > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_sess").over(wRun))
    val wSess = Window.partitionBy($"user_id", $"session_idx")
      .orderBy($"us", $"event_id")
    assigned
      .withColumn("entry_type", first($"event_type").over(wSess))
      .groupBy($"entry_type")
      .agg(countDistinct($"user_id", $"session_idx").as("n_sessions"),
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value"))
      .withColumn("events_per_session_milli",
        expr("(n_events * 1000) div n_sessions"))
      .select($"entry_type", $"n_sessions", $"n_events",
        $"events_per_session_milli", $"total_value")
      .orderBy($"entry_type")
  }

  val q160Oracle: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
       |  FROM events),
       |l AS (
       |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
       |    AS prev_us FROM e),
       |m AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
       |    THEN 1 ELSE 0 END AS new_sess FROM l),
       |x AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM m),
       |f AS (
       |  SELECT *, first_value(event_type) OVER (
       |    PARTITION BY user_id, session_idx ORDER BY us, event_id)
       |    AS entry_type FROM x)
       |SELECT entry_type,
       |  CAST(COUNT(DISTINCT (user_id, session_idx)) AS BIGINT) AS n_sessions,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  (CAST(COUNT(*) AS BIGINT) * 1000)
       |    // CAST(COUNT(DISTINCT (user_id, session_idx)) AS BIGINT)
       |    AS events_per_session_milli,
       |  ${Sql.dsum("value")} AS total_value
       |FROM f GROUP BY entry_type
       |ORDER BY entry_type""".stripMargin

  // ---------------------------------------------------------------- q177
  /** Robust per-type anomaly detection over the event stream — the
    * median/MAD outlier rule (Hampel identifier, the standard robust
    * replacement for mean±kσ: one 490-unit spike cannot drag its own
    * threshold the way it drags a mean): an event is anomalous iff
    * |value − median(type)| > 3.5 · MAD(type). Output is the flagged
    * events with the per-type statistics that flagged them — the triage
    * table an on-call reads, and the cleaning pass a metrics pipeline
    * runs before aggregating value fields.
    *
    * Plan: two keyed aggregations over events (median, then MAD of the
    * residuals vs the broadcast 5-row median table), one more broadcast
    * join, map-side filter. Exact `percentile` sorts per type — at
    * fixture scale that is the point (ground truth); at 100 TB the same
    * rule runs over the q95/q97-style fixed-bin histogram (median and MAD
    * read off cumulative bin counts, error ≤ half a bin) with this exact
    * form kept as the audit gate. Doubles compare bit-identically: both
    * engines interpolate even-count medians as the midpoint of the same
    * two doubles (the q46 precedent). */
  /** The per-type robust statistics table — |event_types| rows of
    * (event_type, med, mad). Factored so the S25 streaming gate stages and
    * serves the LITERAL batch statistics (the shared-code-path
    * discipline). */
  private[graft] def robustStats(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
    med.join(mad, "event_type")
  }

  /** The Hampel decision over ANY (event_id, event_type, value) frame
    * against a staged stats table: adds med/mad/dev and the flag — one
    * broadcast join + a map-side projection, shared verbatim by q177 and
    * the S25 stream. */
  private[graft] def anomalyDecided(ev: DataFrame, stats: DataFrame)
      : DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    ev.join(broadcast(stats), "event_type")
      .withColumn("dev", abs($"value" - $"med"))
      .withColumn("is_anomaly", $"dev" > lit(3.5) * $"mad")
  }

  def q177EventAnomalies(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"event_id", $"event_type", $"value")
    anomalyDecided(ev, robustStats(ev))
      .filter($"is_anomaly")
      .select($"event_id", $"event_type", $"value", $"med", $"mad", $"dev")
      .orderBy($"event_id")
  }

  val q177Oracle: String =
    """WITH med AS (SELECT event_type, median(value) AS med
      |  FROM events GROUP BY 1),
      |j AS (
      |  SELECT e.event_id, e.event_type, e.value, m.med
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, median(abs(value - med)) AS mad
      |  FROM j GROUP BY 1)
      |SELECT j.event_id, j.event_type, j.value, j.med, mad.mad AS mad,
      |  abs(j.value - j.med) AS dev
      |FROM j JOIN mad USING (event_type)
      |WHERE abs(j.value - j.med) > 3.5 * mad.mad
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q178
  /** The 100 TB quantile path q177's scaladoc names, delivered and
    * audited: per-type median and MAD read off a FIXED-BIN histogram
    * (width 1.0) instead of an exact per-type sort, with the exact values
    * riding along so the output IS the approximation's error audit in
    * milli. Median = midpoint of the first bin whose cumulative count
    * reaches ⌈n/2⌉; MAD = the same rule over the residual histogram —
    * which is derived by FOLDING the value histogram around the median
    * bin (abs(bin − med_bin)), so the second quantile costs no second
    * pass over events.
    *
    * Scale shape: events are touched once, collapsing map-side into a
    * ≤(bins × types) histogram (the q95/q97 contract); every window after
    * that runs over histogram-sized metadata. Binning error is ≤ half a
    * bin for the median and ≤ 1.5 bins for the folded MAD WHEN the two
    * central ranks share a bin (any continuous-ish distribution); an
    * adversarial bimodal split across distant bins degrades to the
    * lower-median bin — which is exactly what the est-vs-exact audit
    * columns exist to expose before anyone trusts the sketch. All
    * arithmetic after floor() is integer. */
  def q178HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = Tables(s, dir, "events").select($"event_type", $"value")
    val hist = ev
      .groupBy($"event_type", floor($"value").cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val wType = Window.partitionBy($"event_type")
    val wCum = wType.orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("n", sum($"c").over(wType))
      .withColumn("cum", sum($"c").over(wCum))
      .withColumn("target", expr("(n + 1) div 2"))
    // n/target are per-type constants — min() is just the deterministic carry
    val medBin = cum.filter($"cum" >= $"target")
      .groupBy($"event_type").agg(min($"bin").as("med_bin"),
        min($"n").as("n"), min($"target").as("target"))
    val rhist = hist
      .join(broadcast(medBin.select($"event_type", $"med_bin")), "event_type")
      .groupBy($"event_type", abs($"bin" - $"med_bin").as("rbin"))
      .agg(sum($"c").as("c"))
    val wRCum = wType.orderBy($"rbin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val madBin = rhist.withColumn("cum", sum($"c").over(wRCum))
      .join(broadcast(medBin.select($"event_type", $"target")), "event_type")
      .filter($"cum" >= $"target")
      .groupBy($"event_type").agg(min($"rbin").as("mad_bin"))
    medBin.join(madBin, "event_type")
      .join(broadcast(robustStats(ev)), "event_type")
      .withColumn("med_est_milli", $"med_bin" * 1000 + 500)
      .withColumn("med_exact_milli", floor($"med" * 1000).cast("long"))
      .withColumn("mad_est_milli", $"mad_bin" * 1000 + 500)
      .withColumn("mad_exact_milli", floor($"mad" * 1000).cast("long"))
      .select($"event_type", $"n",
        $"med_est_milli", $"med_exact_milli",
        ($"med_est_milli" - $"med_exact_milli").as("med_err_milli"),
        $"mad_est_milli", $"mad_exact_milli",
        ($"mad_est_milli" - $"mad_exact_milli").as("mad_err_milli"))
      .orderBy($"event_type")
  }

  val q178Oracle: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist),
      |medb AS (
      |  SELECT event_type, MIN(bin) AS med_bin, MIN(n) AS n,
      |    MIN((n + 1) // 2) AS target
      |  FROM cum WHERE cum >= (n + 1) // 2 GROUP BY event_type),
      |rhist AS (
      |  SELECT h.event_type, abs(h.bin - m.med_bin) AS rbin,
      |    CAST(SUM(h.c) AS BIGINT) AS c
      |  FROM hist h JOIN medb m USING (event_type) GROUP BY 1, 2),
      |rcum AS (
      |  SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY rbin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM rhist),
      |madb AS (
      |  SELECT r.event_type, MIN(r.rbin) AS mad_bin
      |  FROM rcum r JOIN medb m USING (event_type)
      |  WHERE r.cum >= m.target GROUP BY 1),
      |med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
      |exact AS (
      |  SELECT e.event_type, MIN(m.med) AS med,
      |    median(abs(e.value - m.med)) AS mad
      |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
      |SELECT b.event_type, b.n,
      |  b.med_bin * 1000 + 500 AS med_est_milli,
      |  CAST(floor(x.med * 1000) AS BIGINT) AS med_exact_milli,
      |  b.med_bin * 1000 + 500 - CAST(floor(x.med * 1000) AS BIGINT)
      |    AS med_err_milli,
      |  d.mad_bin * 1000 + 500 AS mad_est_milli,
      |  CAST(floor(x.mad * 1000) AS BIGINT) AS mad_exact_milli,
      |  d.mad_bin * 1000 + 500 - CAST(floor(x.mad * 1000) AS BIGINT)
      |    AS mad_err_milli
      |FROM medb b JOIN madb d USING (event_type) JOIN exact x USING (event_type)
      |ORDER BY b.event_type""".stripMargin

  // ---------------------------------------------------------------- q179
  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et al.
    * 2007) over the analytics export grid — the pre-publication privacy
    * gate: if per-(event_type, day, hour) cells were released, which cells
    * are backed by fewer than k=5 distinct users (re-identification risk),
    * and how diverse is the sensitive attribute (the value band) inside
    * them? Output is the violation list with its evidence — the cells a
    * release job must suppress or generalize before export.
    *
    * Plan: ONE aggregation keyed on the QI grid; both distinct counts run
    * as the standard two-phase partial-distinct expansion on the same
    * grid key. The grid is |types|·days·24 — the output and every
    * post-agg row is metadata-sized at any event volume. */
  def q179KAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"user_id", $"event_type",
        to_date($"ts").cast("string").as("day"),
        hour($"ts").cast("long").as("hr"),
        floor($"value" / 50).cast("long").as("vband"))
      .groupBy($"event_type", $"day", $"hr")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("k_users"),
        countDistinct($"vband").as("l_values"))
      .filter($"k_users" < 5)
      .orderBy($"event_type", $"day", $"hr")
  }

  val q179Oracle: String =
    """SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  CAST(hour(ts) AS BIGINT) AS hr,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS k_users,
      |  CAST(COUNT(DISTINCT CAST(floor(value / 50) AS BIGINT)) AS BIGINT)
      |    AS l_values
      |FROM events
      |GROUP BY event_type, CAST(ts AS DATE), hour(ts)
      |HAVING COUNT(DISTINCT user_id) < 5
      |ORDER BY event_type, day, hr""".stripMargin

  // ---------------------------------------------------------------- q180
  /** Bounded-contribution capping — the preprocessing every
    * differential-privacy aggregation requires (and heavy-user bias
    * control wants anyway): each user contributes at most k=3 events per
    * (user, day); the rest are dropped before counting, so no single user
    * can dominate a released statistic. Output is the per-type audit —
    * events before/after the cap and the capped-away fraction — the
    * sensitivity-bound evidence a DP release attaches.
    *
    * Plan: one window ranked inside (user_id, day) — per-partition sorts
    * bounded by a user's daily volume, the q157 terasort-per-key shape —
    * then one per-type partial agg. The PRODUCTION cap (filter rank ≤ k)
    * plans WindowGroupLimit, forwarding at most k rows per group from
    * each map task; this audit deliberately keeps both sides of the cap
    * (it counts the capped-away mass), so it pays the full window. */
  def q180ContributionCap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val k = 3
    val w = Window.partitionBy($"user_id", $"day")
      .orderBy($"us", $"event_id")
    Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type",
        to_date($"ts").as("day"), unix_micros($"ts").as("us"))
      .withColumn("rn", row_number().over(w))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_before"),
        sum(when($"rn" <= k, 1L).otherwise(0L)).as("n_after"))
      .withColumn("capped_milli",
        expr("(n_before - n_after) * 1000 div n_before"))
      .orderBy($"event_type")
  }

  val q180Oracle: String =
    """WITH ranked AS (
      |  SELECT event_type,
      |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |a AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_before,
      |    CAST(SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_after
      |  FROM ranked GROUP BY event_type)
      |SELECT event_type, n_before, n_after,
      |  ((n_before - n_after) * 1000) // n_before AS capped_milli
      |FROM a ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q195
  /** Calendar gap-fill with linear interpolation — the time-series
    * surface the windowed metrics (q26/q90) leave open: a dashboard or
    * downstream model wants a DENSE per-minute series, but most minutes
    * have no events. Per event type, the minute spine from first to last
    * observed bucket is generated (`sequence`), observed buckets carry
    * their count and integer milli-mean, and every missing bucket is
    * filled by linear interpolation between its nearest observed
    * neighbors — all in int64 (floor(value·1000) before summing: the
    * q184 cast-rounds trap; truncating div for the slope, identical in
    * both engines), with a `filled` provenance flag so consumers can
    * tell measurement from imputation.
    *
    * Scale shape: ONE corpus pass partial-aggregates events to the
    * (type, minute) grid; the spine explode and the two neighbor windows
    * run on that grid — calendar-sized (types × minutes of span), never
    * event-sized. The windows are per-type monotone passes, exactly the
    * q76 gaps-and-islands discipline. Interp products peak at
    * mean_milli·span_ms ≈ 10^15 at fixture scale — int64-safe; a
    * century-long span at milli precision would need the slope factored
    * first (documented bound). */
  def q195GapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val present = Tables(s, dir, "events")
      .groupBy($"event_type",
        (expr("unix_millis(ts) div 60000") * 60000L).as("bucket_ms"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(floor(value * 1000) as bigint)")).as("sum_milli"))
      .withColumn("mean_milli", expr("sum_milli div n_events"))
      .localCheckpoint(true)
    val spine = present.groupBy($"event_type")
      .agg(min($"bucket_ms").as("lo"), max($"bucket_ms").as("hi"))
      .select($"event_type",
        explode(expr("sequence(lo, hi, 60000)")).as("bucket_ms"))
    // both neighbor lookups are GROWING frames (unbounded preceding →
    // accumulating, O(n) per partition); the natural unbounded-FOLLOWING
    // frame for the next neighbor recomputes its frame per row in
    // Spark's WindowExec — O(n²), measured ~2 min on the 43k-minute
    // fixture spine — so "next" is the same growing frame under a
    // DESCENDING sort instead
    val wPrev = Window.partitionBy($"event_type").orderBy($"bucket_ms")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNextDesc = Window.partitionBy($"event_type").orderBy($"bucket_ms".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    spine
      .join(present.select($"event_type", $"bucket_ms", $"n_events",
        $"mean_milli"), Seq("event_type", "bucket_ms"), "left")
      .withColumn("pv", last(when($"mean_milli".isNotNull,
        struct($"bucket_ms", $"mean_milli")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", last(when($"mean_milli".isNotNull,
        struct($"bucket_ms", $"mean_milli")), ignoreNulls = true).over(wNextDesc))
      .select($"event_type", $"bucket_ms",
        coalesce($"n_events", lit(0L)).as("n_events"),
        when($"mean_milli".isNotNull, $"mean_milli")
          .otherwise(expr("pv.mean_milli + ((nv.mean_milli - pv.mean_milli)" +
            " * (bucket_ms - pv.bucket_ms)) div (nv.bucket_ms - pv.bucket_ms)"))
          .as("mean_milli"),
        $"mean_milli".isNull.as("filled"))
      .orderBy($"event_type", $"bucket_ms")
  }

  val q195Oracle: String =
    s"""WITH present AS (
       |  SELECT event_type, (epoch_ms(ts) // 60000) * 60000 AS bucket_ms,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
       |      AS sum_milli
       |  FROM events GROUP BY 1, 2),
       |pm AS (SELECT *, sum_milli // n_events AS mean_milli FROM present),
       |spine AS (
       |  SELECT event_type, unnest(range(lo, hi + 60000, 60000)) AS bucket_ms
       |  FROM (SELECT event_type, MIN(bucket_ms) AS lo, MAX(bucket_ms) AS hi
       |        FROM pm GROUP BY 1)),
       |j AS (
       |  SELECT s.event_type, s.bucket_ms, p.n_events, p.mean_milli,
       |    last_value(p.mean_milli IGNORE NULLS) OVER wp AS pvm,
       |    last_value(CASE WHEN p.mean_milli IS NOT NULL
       |      THEN s.bucket_ms END IGNORE NULLS) OVER wp AS pvb,
       |    first_value(p.mean_milli IGNORE NULLS) OVER wn AS nvm,
       |    first_value(CASE WHEN p.mean_milli IS NOT NULL
       |      THEN s.bucket_ms END IGNORE NULLS) OVER wn AS nvb
       |  FROM spine s
       |  LEFT JOIN pm p
       |    ON p.event_type = s.event_type AND p.bucket_ms = s.bucket_ms
       |  WINDOW wp AS (PARTITION BY s.event_type ORDER BY s.bucket_ms
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |  wn AS (PARTITION BY s.event_type ORDER BY s.bucket_ms
       |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
       |SELECT event_type, bucket_ms,
       |  COALESCE(n_events, 0) AS n_events,
       |  CAST(CASE WHEN mean_milli IS NOT NULL THEN mean_milli
       |    ELSE pvm + ((nvm - pvm) * (bucket_ms - pvb)) // (nvb - pvb)
       |    END AS BIGINT) AS mean_milli,
       |  (mean_milli IS NULL) AS filled
       |FROM j ORDER BY event_type, bucket_ms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q195_gap_fill" -> q195GapFill _,
    "q83_funnel" -> q83Funnel _,
    "q85_cohort_retention" -> q85CohortRetention _,
    "q157_sessionize" -> q157Sessionize _,
    "q160_session_attribution" -> q160SessionAttribution _,
    "q177_event_anomalies" -> q177EventAnomalies _,
    "q178_hist_quantiles" -> q178HistQuantiles _,
    "q179_k_anonymity" -> q179KAnonymity _,
    "q180_contribution_cap" -> q180ContributionCap _,
  )

  val oracles: Map[String, String] = Map(
    "q195_gap_fill" -> q195Oracle,
    "q83_funnel" -> q83Oracle,
    "q85_cohort_retention" -> q85Oracle,
    "q157_sessionize" -> q157Oracle,
    "q160_session_attribution" -> q160Oracle,
    "q177_event_anomalies" -> q177Oracle,
    "q178_hist_quantiles" -> q178Oracle,
    "q179_k_anonymity" -> q179Oracle,
    "q180_contribution_cap" -> q180Oracle,
  )
}
