package graft.ops

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  test("writeSeedKeys chunks JSON files at maxRecordsPerFile and round-trips") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-seed-").toString
    Pipeline.writeSeedKeys(s, 1000, dir, perFile = 100)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    assert(files.nonEmpty)
    // ≤100 records per file (scripts/seed-keys.ts keysPerFile analog)
    files.foreach { f =>
      val lines = scala.io.Source.fromFile(f).getLines().size
      assert(lines <= 100, s"${f.getName} has $lines records")
    }
    val back = s.read.json(dir)
    assert(back.count() === 1000)
    assert(back.select("key_id").distinct().count() === 1000)
    // deterministic surrogate keys: spot-check against the generator query
    val expected = Pipeline.q29SeedKeys(s, sf).filter($"key_id" === 7).head
    val actual = back.filter($"key_id" === 7).select("address", "public_key", "private_key").head
    assert(actual.getString(0) === expected.getAs[String]("address"))
  }
}
