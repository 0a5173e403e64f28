package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Behavior

/** S22 stateful streaming sessionization: cross-batch GroupState with
  * event-time timeouts, congruent with batch q157 once the watermark
  * flushes the tail sessions.
  */
class SessionStreamSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet

  test("streamed sessions equal batch q157 after watermark flush") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-sess-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()
    val events = graft.Tables(s, sf, "events")
      .select($"user_id", $"event_id", $"value", $"ts")
    events.write.mode("append").parquet(incoming)
    val schema = "user_id long, event_id long, value double, ts timestamp"
    val q0 = SessionStream.run(
      s.readStream.schema(schema).parquet(incoming), root)
    assert(q0.awaitTermination(120000))
    // sessions closed by an in-batch successor are out; tail sessions
    // (one per user) are still OPEN — the watermark cannot prove silence
    // until later event-time arrives
    val closedEarly = rows(s.read.parquet(s"$root/sessions"))
    // a far-future sentinel event (fresh user) advances the watermark
    // past every open session's timeout; the next run flushes them all
    val maxTs = events.agg(max($"ts")).collect()(0).getTimestamp(0)
    Seq((-1L, -1L, 0.0, new java.sql.Timestamp(maxTs.getTime + 7200000L)))
      .toDF("user_id", "event_id", "value", "ts")
      .write.mode("append").parquet(incoming)
    val q1 = SessionStream.run(
      s.readStream.schema(schema).parquet(incoming), root)
    assert(q1.awaitTermination(120000))
    val all = rows(s.read.parquet(s"$root/sessions"))
    assert(closedEarly.subsetOf(all))
    // congruence: everything except the sentinel's own (still-open)
    // session equals the batch query exactly
    val want = rows(Behavior.q157Sessionize(s, sf))
    assert(all === want)
  }

  test("ordinals survive a timeout: a returning user gets idx 2, not a colliding 1") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-sess2-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()
    val schema = "user_id long, event_id long, value double, ts timestamp"
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    def feed(rows: Seq[(Long, Long, Double, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "event_id", "value", "ts")
        .write.mode("append").parquet(incoming)
      val q = SessionStream.run(
        s.readStream.schema(schema).parquet(incoming), root)
      assert(q.awaitTermination(120000))
    }
    // batch 0: user 7's first session (2 events)
    feed(Seq((7L, 1L, 1.0, ts(0)), (7L, 2L, 2.0, ts(60000))))
    // batch 1: another user far in the future — the watermark passes
    // user 7's timeout and CLOSES session 1 via EventTimeTimeout
    feed(Seq((8L, 3L, 0.0, ts(7200000))))
    // batch 2: user 7 RETURNS after the timeout-close
    feed(Seq((7L, 4L, 4.0, ts(10800000))))
    // batch 3: sentinel to flush user 7's second session
    feed(Seq((9L, 5L, 0.0, ts(999999999))))
    val u7 = s.read.parquet(s"$root/sessions")
      .filter($"user_id" === 7L)
      .select($"session_idx", $"n_events", $"total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(u7 === Seq((1L, 2L, 3.0), (2L, 1L, 4.0)),
      s"returning user's ordinal collided or payload wrong: $u7")
  }

  test("within-gap cross-batch straggler folds monotonically: end_us never regresses") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-sess3-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()
    val schema = "user_id long, event_id long, value double, ts timestamp"
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    def feed(rows: Seq[(Long, Long, Double, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "event_id", "value", "ts")
        .write.mode("append").parquet(incoming)
      val q = SessionStream.run(
        s.readStream.schema(schema).parquet(incoming), root)
      assert(q.awaitTermination(120000))
    }
    // batch 0: user 5 at t=0 and t=60s (open session, lastUs = 60s)
    feed(Seq((5L, 1L, 1.0, ts(0)), (5L, 2L, 2.0, ts(60000))))
    // batch 1: a STRAGGLER at t=30s — out of order across batches, within
    // the gap AND within the watermark. ADVICE r10: this must not rewind
    // lastUs/end_us below the already-seen t=60s event.
    feed(Seq((5L, 3L, 4.0, ts(30000))))
    // batch 2: sentinel advances the watermark and flushes the session
    feed(Seq((9L, 4L, 0.0, ts(999999999))))
    val u5 = s.read.parquet(s"$root/sessions")
      .filter($"user_id" === 5L)
      .select($"session_idx", $"n_events", $"start_us", $"end_us",
        $"duration_us", $"total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    val base = 1700000000000L * 1000L
    assert(u5 === Seq((1L, 3L, base, base + 60000000L, 60000000L, 7.0)),
      s"straggler regressed the session bounds: $u5")
  }

  test("stubTtl bounds expired-user state: ordinals stable within the TTL, retired after it") {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    val root = Files.createTempDirectory("graft-sess4-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()
    val schema = "user_id long, event_id long, value double, ts timestamp"
    val H = 3600000L
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    def feed(rows: Seq[(Long, Long, Double, java.sql.Timestamp)]): Unit = {
      rows.toDF("user_id", "event_id", "value", "ts")
        .write.mode("append").parquet(incoming)
      val q = SessionStream.run(
        s.readStream.schema(schema).parquet(incoming), root,
        stubTtlMs = Some(10L * H))
      assert(q.awaitTermination(120000))
    }
    feed(Seq((7L, 1L, 1.0, ts(0))))          // session 1 opens at t=0
    feed(Seq((8L, 2L, 0.0, ts(2 * H))))      // wm=1.5h: session 1 times out,
                                             // stub armed until 0+gap+10h
    feed(Seq((7L, 3L, 2.0, ts(3 * H))))      // returns WITHIN the TTL:
                                             // ordinal continues at idx 2
    feed(Seq((9L, 4L, 0.0, ts(5 * H))))      // wm=4.5h: session 2 times out,
                                             // stub re-armed until 3.5h+10h
    feed(Seq((10L, 5L, 0.0, ts(25 * H))))    // wm=24.5h > 13.5h: the stub
                                             // itself expires — state removed
    feed(Seq((7L, 6L, 4.0, ts(26 * H))))     // returns AFTER the TTL:
                                             // ordinal restarts at idx 1
    feed(Seq((11L, 7L, 0.0, ts(50 * H))))    // flush the last session
    val base = 1700000000000L * 1000L
    val u7 = s.read.parquet(s"$root/sessions")
      .filter($"user_id" === 7L)
      .select($"start_us", $"session_idx", $"total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(u7 === Seq((base, 1L, 1.0), (base + 3 * H * 1000L, 2L, 2.0),
      (base + 26 * H * 1000L, 1L, 4.0)),
      s"TTL ordinal contract broken: $u7")
  }
}
