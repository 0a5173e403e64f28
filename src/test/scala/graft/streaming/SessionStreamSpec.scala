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
}
