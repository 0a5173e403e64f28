package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S28 streaming optimizer-histogram maintenance: the merged streamed
  * histogram is congruent with the one-pass batch histogram under the
  * same staged bounds for any batching, out-of-range arrivals clamp to
  * the edge bins without losing mass, and replay is idempotent.
  */
class StatsStreamSpec extends SparkSpec {

  test("merged stream histogram == one-pass batch histogram under the " +
      "staged bounds, for any batching; totals preserved; replay appends") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-ss-").toString
    val incoming = s"$root/in"
    new java.io.File(incoming).mkdirs()

    val prices = graft.Tables(s, sf, "lineitem")
      .select($"l_extendedprice".as("p"))
    for (chunk <- 0 to 2) {
      prices.filter(pmod(($"p" * 100).cast("long"), lit(3)) === chunk)
        .coalesce(1).write.mode("append").parquet(incoming)
    }
    val bounds = StatsStream.stageBounds(s.read.parquet(incoming))

    val q0 = StatsStream.run(
      s.readStream.schema("p double")
        .option("maxFilesPerTrigger", 1).parquet(incoming), root, bounds)
    assert(q0.awaitTermination(120000))
    assert(new java.io.File(s"$root/hist").listFiles()
      .count(_.getName.startsWith("batch=")) >= 2,
      "fixture must exercise more than one micro-batch")

    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = toMap(StatsStream.mergedHistogram(s, root))
    val onePass = toMap(
      StatsStream.batchHistogram(s.read.parquet(incoming),
        bounds._1, bounds._2))
    assert(merged === onePass,
      "sum of per-batch partials must equal the one-pass histogram")
    assert(merged.values.sum === prices.count(),
      "clamped binning must not lose rows")
    assert(merged.keys.forall(b => b >= 0 && b < 4096))

    // out-of-range arrivals (bounds drift) clamp to the edge bins
    val drifted = Seq(bounds._1 - 1e6, bounds._2 + 1e6, bounds._1)
      .toDF("p")
    val dh = toMap(StatsStream.batchHistogram(drifted, bounds._1, bounds._2))
    assert(dh === Map(0L -> 2L, 4095L -> 1L))

    // replay/extension: one more file, restarted stream — old batch
    // partitions keep their values, the merge absorbs the new rows
    Seq(bounds._1, bounds._2).toDF("p")
      .write.mode("append").parquet(incoming)
    val q1 = StatsStream.run(
      s.readStream.schema("p double")
        .option("maxFilesPerTrigger", 8).parquet(incoming), root, bounds)
    assert(q1.awaitTermination(120000))
    val after = toMap(StatsStream.mergedHistogram(s, root))
    assert(after.values.sum === merged.values.sum + 2)
    assert(after(0L) === merged(0L) + 1)
    assert(after(4095L) === merged.getOrElse(4095L, 0L) + 1)
  }
}
