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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_funnel" -> q83Funnel _,
    "q85_cohort_retention" -> q85CohortRetention _,
  )

  val oracles: Map[String, String] = Map(
    "q83_funnel" -> q83Oracle,
    "q85_cohort_retention" -> q85Oracle,
  )
}
