package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Semantic fixtures for the behavioral-analytics family: the funnel's
  * strictly-ordered within-window stage rule (including the inclusive
  * 24-hour boundary and the out-of-order exclusion) and the cohort
  * triangle's pre-signup exclusion.
  */
class BehaviorSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-behavior-").toString
    rows.map { case (u, t, ts) => (u, t, Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$root/events.parquet")
    root
  }

  test("q83 funnel: ordered within-window stages, inclusive 24h boundary, strict order") {
    val s = spark
    import s.implicits._
    val dir = writeEvents(Seq(
      // user 1: full funnel, each step inside 24h
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // user 2: click 25h after the view — outside the step window
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-02 01:00:00"),
      // user 3: click BEFORE the first view — order must be strict
      (3L, "click", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-01 01:00:00"),
      // user 4: click at exactly +24h (inclusive); purchase at the same
      // instant as the click (NOT strictly after → no conversion)
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "click", "2024-01-02 00:00:00"),
      (4L, "purchase", "2024-01-02 00:00:00"),
    ))
    val out = Behavior.q83Funnel(s, dir)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("1_view", 4L), ("2_click", 2L), ("3_purchase", 1L)))
  }

  test("q85 cohort retention: day-offset counts exclude pre-signup activity and non-signups") {
    val s = spark
    import s.implicits._
    val dir = writeEvents(Seq(
      // user 1: signs up Jan 2; has an event the day BEFORE (excluded),
      // activity on days 0, 1, 3
      (1L, "click", "2024-01-01 10:00:00"),
      (1L, "signup", "2024-01-02 09:00:00"),
      (1L, "view", "2024-01-03 09:00:00"),
      (1L, "purchase", "2024-01-05 09:00:00"),
      // user 2: signs up Jan 3, active days 0 and 1
      (2L, "signup", "2024-01-03 12:00:00"),
      (2L, "click", "2024-01-04 12:00:00"),
      // user 3: never signs up — not in any cohort
      (3L, "view", "2024-01-02 08:00:00"),
      (3L, "click", "2024-01-03 08:00:00"),
    ))
    val out = Behavior.q85CohortRetention(s, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L), ("2024-01-02", 3L, 1L),
      ("2024-01-03", 0L, 1L), ("2024-01-03", 1L, 1L),
    ))
  }

  test("q157 sessionize replays a local gaps-and-islands fold") {
    val s = spark
    import s.implicits._
    val gap = 30L * 60L * 1000000L
    val ev = graft.Tables(s, sf, "events")
      .select($"user_id", $"event_id", $"value",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    def d2(v: Double): BigDecimal =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val ordered = g.sortBy(r => (r._4, r._2))
      // split into sessions at >30min gaps
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, Double, Long)]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e._4 - cur.head._4 > gap) List(e) :: (cur :: done)
          else (e :: cur) :: done
      }.map(_.reverse).reverse
      sessions.zipWithIndex.map { case (es, i) =>
        val uss = es.map(_._4)
        (uid, (i + 1).toLong, es.length.toLong, uss.min, uss.max,
          uss.max - uss.min, es.map(e => d2(e._3)).sum.toDouble)
      }
    }.sortBy(r => (r._1, r._2))
    val got = Behavior.q157Sessionize(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expected)
    // the fixture actually splits: some user has more than one session,
    // and some session has more than one event
    assert(got.exists(_._2 > 1L) && got.exists(_._3 > 1L))
  }

  test("q160 attribution replays a local first-touch fold over q157 sessions") {
    val s = spark
    import s.implicits._
    val gap = 30L * 60L * 1000000L
    val ev = graft.Tables(s, sf, "events")
      .select($"user_id", $"event_id", $"event_type", $"value",
        org.apache.spark.sql.functions.unix_micros($"ts").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4)))
    def d2(v: Double): BigDecimal =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    // sessions per user, each a list of events in (us, event_id) order
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (r._5, r._2))
        .foldLeft(List.empty[List[(Long, Long, String, Double, Long)]]) {
          case (Nil, e) => List(List(e))
          case (cur :: done, e) =>
            if (e._5 - cur.head._5 > gap) List(e) :: (cur :: done)
            else (e :: cur) :: done
        }.map(_.reverse)
    }
    val expected = sessions.groupBy(_.head._3).toSeq.map { case (entry, ss) =>
      val events = ss.flatten
      val n = events.length.toLong
      (entry, ss.length.toLong, n, n * 1000 / ss.length,
        events.map(e => d2(e._4)).sum.toDouble)
    }.sortBy(_._1)
    val got = Behavior.q160SessionAttribution(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // attribution actually discriminates: several entry types appear
    assert(got.length >= 3)
  }

  test("q177 Hampel rule: hand-computed median/MAD thresholds, including the MAD=0 edge") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-behavior-").toString
    // type "m": 1..9 plus a 100 spike → med 5.5, MAD 2.5, threshold 8.75 —
    // only the spike's dev (94.5) crosses; the 9 (dev 4.5) must NOT flag.
    // type "z": nine 10s and one 1000 → MAD is 0, threshold 0 — the robust
    // rule still flags the 1000 (dev > 0) and nothing else.
    val rows =
      (1 to 9).map(i => (i.toLong, "m", i.toDouble)) ++ Seq((10L, "m", 100.0)) ++
      (11 to 19).map(i => (i.toLong, "z", 10.0)) ++ Seq((20L, "z", 1000.0))
    rows.map { case (id, t, v) =>
        (id, t, v, 7L, Timestamp.valueOf("2024-01-01 00:00:00"), "{}")
      }.toDF("event_id", "event_type", "value", "user_id", "ts", "props")
      .write.parquet(s"$root/events.parquet")
    val got = Behavior.q177EventAnomalies(s, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq((10L, "m", 5.5, 2.5), (20L, "z", 10.0, 0.0)))
  }

  test("q178 histogram quantiles: hand-walked bins and fixture error bounds") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-behavior-").toString
    // type "b": 1.2, 2.4, 3.7 → bins 1,2,3; target ⌈4/2⌉=2 → med_bin 2
    // (est 2500 vs exact 2400); residuals fold to rbins {0:1, 1:2} →
    // mad_bin 1 (est 1500 vs exact MAD 1.2 → 1200)
    Seq((1L, "b", 1.2), (2L, "b", 2.4), (3L, "b", 3.7))
      .map { case (id, t, v) =>
        (id, t, v, 7L, Timestamp.valueOf("2024-01-01 00:00:00"), "{}")
      }.toDF("event_id", "event_type", "value", "user_id", "ts", "props")
      .write.parquet(s"$root/events.parquet")
    val row = Behavior.q178HistQuantiles(s, root).collect()
    assert(row.length === 1)
    val r = row.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((3L, 2500L, 2400L, 100L, 1500L, 1200L, 300L)))
    // fixture-scale audit: continuous-ish values keep the median inside
    // half a bin and the folded MAD inside 1.5 bins
    Behavior.q178HistQuantiles(s, sf).collect().foreach { x =>
      assert(math.abs(x.getLong(4)) <= 500L, s"${x.getString(0)} med err")
      assert(math.abs(x.getLong(7)) <= 1500L, s"${x.getString(0)} mad err")
    }
  }

  test("q179 k-anonymity: k<5 cells flag with their l-diversity, k=5 cells pass") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-behavior-").toString
    // cell A: 6 events from only 4 users (k=4 → VIOLATION), values in 3
    // distinct 50-bands (l=3). cell B: 5 events from 5 users → passes.
    val cellA = Seq(
      (1L, 101L, 10.0), (2L, 101L, 60.0), (3L, 102L, 110.0),
      (4L, 103L, 10.0), (5L, 104L, 60.0), (6L, 104L, 10.0))
      .map { case (id, u, v) => (id, "a", v, u, "2024-01-01 10:00:00") }
    val cellB = (11 to 15).map(i =>
      (i.toLong, "b", 10.0, 200L + i, "2024-01-01 10:00:00"))
    (cellA ++ cellB).map { case (id, t, v, u, ts) =>
        (id, t, v, u, Timestamp.valueOf(ts), "{}")
      }.toDF("event_id", "event_type", "value", "user_id", "ts", "props")
      .write.parquet(s"$root/events.parquet")
    val got = Behavior.q179KAnonymity(s, root).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.toSeq === Seq(("a", 10L, 6L, 4L, 3L)))
  }

  test("q180 contribution cap: k=3 per (user, day), the day boundary resets the cap") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-behavior-").toString
    // user 1: 5 clicks on day 1 (2 capped) + 1 click on day 2 (cap resets,
    // survives). user 2: 2 views — under the cap, untouched.
    val rows =
      (1 to 5).map(i => (i.toLong, "click", 1L, s"2024-01-01 0$i:00:00")) ++
      Seq((6L, "click", 1L, "2024-01-02 01:00:00"),
        (7L, "view", 2L, "2024-01-01 01:00:00"),
        (8L, "view", 2L, "2024-01-01 02:00:00"))
    rows.map { case (id, t, u, ts) =>
        (id, t, 1.0, u, Timestamp.valueOf(ts), "{}")
      }.toDF("event_id", "event_type", "value", "user_id", "ts", "props")
      .write.parquet(s"$root/events.parquet")
    val got = Behavior.q180ContributionCap(s, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("click", 6L, 4L, 333L), ("view", 2L, 2L, 0L)))
  }

  test("q195 gap fill: missing minutes interpolate linearly, provenance " +
      "flag separates measurement from imputation") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-gapfill-").toString
    // one type: observed minutes 0 and 3 (means 1.0 and 4.0) — minutes 1
    // and 2 must fill with 2000 and 3000 milli; second type: single
    // bucket, nothing to fill
    Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 00:00:10"), 1.0),
      (2L, "a", Timestamp.valueOf("2024-01-01 00:03:20"), 4.0),
      (3L, "b", Timestamp.valueOf("2024-01-01 00:05:00"), 7.5))
      .toDF("event_id", "event_type", "ts", "value")
      .write.parquet(s"$root/events.parquet")
    val got = Behavior.q195GapFill(s, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    assert(got.toSeq === Seq(
      ("a", base, 1L, 1000L, false),
      ("a", base + 60000, 0L, 2000L, true),
      ("a", base + 120000, 0L, 3000L, true),
      ("a", base + 180000, 1L, 4000L, false),
      ("b", base + 300000, 1L, 7500L, false)))
  }
}
