package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.MetricsStream.MetricPoint

class MetricsStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("1-minute tumbling Sum/Average over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = MetricsStream.tumbling1min(input.toDF())
      .writeStream.format("memory").queryName("metrics1m").outputMode("complete").start()
    input.addData(
      MetricPoint(ts("2024-01-01 10:00:05"), "lambda", 2.0),
      MetricPoint(ts("2024-01-01 10:00:45"), "lambda", 4.0),
      MetricPoint(ts("2024-01-01 10:01:10"), "lambda", 6.0),
      MetricPoint(ts("2024-01-01 10:00:30"), "sqs", 10.0))
    q.processAllAvailable()
    val rows = s.table("metrics1m")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    q.stop()
    val m0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val m1 = Timestamp.valueOf("2024-01-01 10:01:00").getTime
    assert(rows((m0, "lambda")) === ((2L, 6.0, 3.0)))
    assert(rows((m1, "lambda")) === ((1L, 6.0, 6.0)))
    assert(rows((m0, "sqs")) === ((1L, 10.0, 10.0)))
  }

  test("sliding 5-min/1-min windows: a point lands in its 5 covering windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = MetricsStream.sliding5min(input.toDF())
      .writeStream.format("memory").queryName("metrics5m").outputMode("complete").start()
    input.addData(
      MetricPoint(ts("2024-01-01 10:07:30"), "lambda", 2.0),
      MetricPoint(ts("2024-01-01 10:09:30"), "lambda", 4.0))
    q.processAllAvailable()
    val rows = s.table("metrics5m")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    q.stop()
    def m(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00").getTime
    // first point covers 10:03..10:07 starts, second 10:05..10:09 — the
    // 10:05..10:07 overlap carries both
    assert(rows(m("10:03")) === ((1L, 2.0)))
    assert(rows(m("10:04")) === ((1L, 2.0)))
    assert(rows(m("10:05")) === ((2L, 6.0)))
    assert(rows(m("10:06")) === ((2L, 6.0)))
    assert(rows(m("10:07")) === ((2L, 6.0)))
    assert(rows(m("10:08")) === ((1L, 4.0)))
    assert(rows(m("10:09")) === ((1L, 4.0)))
    assert(rows.size === 7)
  }

  test("watermark drops rows later than 10 minutes behind max event time") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = MetricsStream.tumbling1min(input.toDF())
      .writeStream.format("memory").queryName("metricswm").outputMode("update").start()
    input.addData(MetricPoint(ts("2024-01-01 10:00:10"), "lambda", 1.0),
      MetricPoint(ts("2024-01-01 10:30:00"), "lambda", 1.0)) // advances watermark to 10:20
    q.processAllAvailable()
    input.addData(MetricPoint(ts("2024-01-01 10:00:20"), "lambda", 1.0)) // late beyond watermark
    q.processAllAvailable()
    val m0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val counts = s.table("metricswm").filter($"minute_ms" === m0)
      .collect().map(_.getLong(2))
    q.stop()
    // the late row was dropped: minute 10:00 was only ever emitted with cnt=1
    assert(counts.nonEmpty && counts.max === 1L)
  }

  test("session_window: 30-min gap splits sessions, short gaps merge") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = MetricsStream.sessionWindows(input.toDF())
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    input.addData(
      MetricPoint(ts("2024-01-01 10:00:00"), "lambda", 1.0),
      MetricPoint(ts("2024-01-01 10:10:00"), "lambda", 2.0), // 10-min gap → same session
      MetricPoint(ts("2024-01-01 11:00:00"), "lambda", 3.0)) // 50-min gap → new session
    q.processAllAvailable()
    val rows = s.table("sessions").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getDouble(4))).sortBy(_._1)
    q.stop()
    assert(rows.length === 2)
    assert(rows(0)._3 === 2L && rows(0)._4 === 3.0) // merged session, sum 1+2
    assert(rows(1)._3 === 1L && rows(1)._4 === 3.0)
  }

  test("consecutive-breach alarm counts evaluation periods per component") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    // minutes: 10:00 (3 pts, breach), 10:01 (2 pts, breach), 10:02 (3 pts,
    // breach → alarm at 3 consecutive), 10:03 (1 pt, reset)
    val pts = Seq(
      "2024-01-01 10:00:01", "2024-01-01 10:00:02", "2024-01-01 10:00:03",
      "2024-01-01 10:01:01", "2024-01-01 10:01:02",
      "2024-01-01 10:02:01", "2024-01-01 10:02:02", "2024-01-01 10:02:03",
      "2024-01-01 10:03:01",
    ).map(t => MetricPoint(ts(t), "lambda", 1.0))
    val out = MetricsStream.consecutiveBreaches(pts.toDS(), threshold = 1, periods = 3)
      .collect().sortBy(_.minuteMs)
    assert(out.map(_.breached).toSeq === Seq(true, true, true, false))
    assert(out.map(_.consecutive).toSeq === Seq(1, 2, 3, 0))
    assert(out.map(_.alarm).toSeq === Seq(false, false, true, false))
  }

  test("a minute split across micro-batches accumulates without double-counting") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = MetricsStream.consecutiveBreaches(input.toDS(), threshold = 1, periods = 2)
      .writeStream.format("memory").queryName("breachsplit").outputMode("append").start()
    // batch 1: two points in minute 10:00 → breached, consecutive=1
    input.addData(MetricPoint(ts("2024-01-01 10:00:01"), "lambda", 1.0),
      MetricPoint(ts("2024-01-01 10:00:02"), "lambda", 1.0))
    q.processAllAvailable()
    // batch 2: a late fragment of 10:00 (must NOT reset or re-count the
    // run) then a breaching 10:01 (run continues → alarm at periods=2)
    input.addData(MetricPoint(ts("2024-01-01 10:00:03"), "lambda", 1.0))
    q.processAllAvailable()
    input.addData(MetricPoint(ts("2024-01-01 10:01:01"), "lambda", 1.0),
      MetricPoint(ts("2024-01-01 10:01:02"), "lambda", 1.0))
    q.processAllAvailable()
    val rows = s.table("breachsplit")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(5), r.getBoolean(6)))
      .sortBy(r => (r._1, r._2))
    q.stop()
    val m0 = ts("2024-01-01 10:00:00").getTime
    val m1 = ts("2024-01-01 10:01:00").getTime
    // fragment rows: (minute, cumulative cnt, consecutive, alarm)
    assert(rows.contains((m0, 2L, 1, false)))
    assert(rows.contains((m0, 3L, 1, false))) // continuation, still run=1
    assert(rows.contains((m1, 2L, 2, true)))  // adjacent minute → alarm
  }

  test("single-component flood: per-minute partials, not per-point state") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    // One component, 200k points crammed into 3 minutes — the batch shape
    // that OOMed the old it.toSeq materialization. The op must emit one
    // cumulative row per minute with exact counts/sums.
    val base = ts("2024-01-01 10:00:00").getTime
    val flood = s.range(200000).map { i =>
      MetricPoint(new Timestamp(base + (i % 3) * 60000L + (i % 59) * 1000L % 60000L,
        ), "lambda", 1.0)
    }
    val out = MetricsStream.consecutiveBreaches(flood, threshold = 60000, periods = 2)
      .collect().sortBy(_.minuteMs)
    assert(out.length === 3)
    assert(out.map(_.cnt).sum === 200000L)
    assert(out.map(_.sum).sum === 200000.0)
    // 200000 = 66667 + 66667 + 66666 — every minute breaches 60000
    assert(out.map(_.breached).toSeq === Seq(true, true, true))
    assert(out.map(_.consecutive).toSeq === Seq(1, 2, 3))
    assert(out.map(_.alarm).toSeq === Seq(false, true, true))
  }

  test("non-adjacent breached minutes do NOT accumulate a consecutive run") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    // breaches at 10:00, 10:07, 10:15 — isolated, never 'consecutive'
    val pts = Seq(
      "2024-01-01 10:00:01", "2024-01-01 10:00:02",
      "2024-01-01 10:07:01", "2024-01-01 10:07:02",
      "2024-01-01 10:15:01", "2024-01-01 10:15:02",
    ).map(t => MetricPoint(ts(t), "lambda", 1.0))
    val out = MetricsStream.consecutiveBreaches(pts.toDS(), threshold = 1, periods = 3)
      .collect().sortBy(_.minuteMs)
    assert(out.map(_.consecutive).toSeq === Seq(1, 1, 1))
    assert(out.forall(!_.alarm))
  }
}
