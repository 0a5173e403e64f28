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
}
