package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class SigningStreamSpec extends SparkSpec {

  private def keyring = graft.ops.Pipeline.keyring(spark)

  test("end-to-end: lake files → dedup → sign → idempotent signatures table") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    val root = Files.createTempDirectory("graft-sign-").toString
    val lakeDir = s"$root/lake"
    val sigDir = s"$root/sigs"
    val ts0 = Timestamp.valueOf("2024-01-05 10:00:00")

    // batch 1: two records, one duplicated within the batch
    Seq(
      ("""{"id": "tx-1", "v": 1}""", ts0, "raw/p0/obj-1.json"),
      ("""{"id": "tx-1", "v": 1}""", ts0, "raw/p0/obj-1b.json"),
      ("""{"id": "tx-2", "v": 2}""", ts0, "raw/p1/obj-2.json"),
    ).toDF("payload", "ts", "s3_path").write.parquet(lakeDir)

    val lake = s.readStream.schema("payload string, ts timestamp, s3_path string")
      .parquet(lakeDir)
    val q1 = SigningStream.run(lake, keyring, sigDir, s"$root/ckpt",
      Trigger.AvailableNow())
    q1.awaitTermination(60000)

    val sigs1 = s.read.parquet(sigDir)
    assert(sigs1.count() === 2) // in-batch duplicate removed
    assert(sigs1.select("pk").distinct().count() === 2)

    // batch 2: replay of tx-2 (new file, same content) + a new record
    Seq(
      ("""{"id": "tx-2", "v": 2}""", ts0, "raw/p1/obj-2-replay.json"),
      ("""{"id": "tx-3", "v": 3}""", ts0, "raw/p2/obj-3.json"),
    ).toDF("payload", "ts", "s3_path").write.mode("append").parquet(lakeDir)
    val q2 = SigningStream.run(
      s.readStream.schema("payload string, ts timestamp, s3_path string").parquet(lakeDir),
      keyring, sigDir, s"$root/ckpt", Trigger.AvailableNow())
    q2.awaitTermination(60000)

    val sigs2 = s.read.parquet(sigDir)
    // tx-2 replay was suppressed by the anti-join upsert (C3 idempotency)
    assert(sigs2.count() === 3)
    assert(sigs2.select("pk").distinct().count() === 3)
    // signatures are the deterministic surrogate: sha2(priv || '|' || payload)
    val row = sigs2.filter($"s3_path" === "raw/p2/obj-3.json").head
    assert(row.getAs[String]("signature").length === 64)

    // the table is Hive-partitioned on the pk prefix, and the per-batch
    // anti-join probe prunes to just the buckets present in the batch:
    // reading one bucket must touch ONLY that bucket's directory
    val buckets = sigs2.select(SigningStream.BucketCol).distinct()
      .collect().map(_.getString(0)).sorted
    assert(buckets.forall(_.length == 2))
    assert(buckets.length >= 2) // 3 random sha-256 prefixes collide w.p. ~1e-4
    val one = buckets.head
    val sigSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "pk string, key_id bigint, address string, signature string, " +
        "s3_path string, pk_bucket string")
    val pruned = SigningStream.existingPks(sigDir, Seq(one), sigSchema)(s)
    pruned.collect() // populate scan metrics
    // Dataset.inputFiles ignores pushed filters — the proof of directory
    // pruning is the scan node's numFiles metric after execution
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val totalFiles = s.read.parquet(sigDir).inputFiles.length
    assert(totalFiles >= buckets.length)
    assert(scan.metrics("numFiles").value < totalFiles,
      s"bucket read not pruned: ${scan.metrics("numFiles").value} of $totalFiles files")
  }

  test("signature seam: the real ECDSA signer plugs into signRecords and verifies") {
    val s = spark
    import s.implicits._
    import graft.functions.SignFns
    val records = Seq(
      ("""{"id": "tx-a", "v": 1}""", "raw/p0/a.json"),
      ("""{"id": "tx-b", "v": 2}""", "raw/p1/b.json"),
      ("""{"id": "tx-c", "v": 3}""", "raw/p2/c.json"),
    ).toDF("payload", "s3_path")
    val signed = SigningStream.signRecords(records, keyring,
      signer = SigningStream.ecdsaSigner)
    // rejoin the keyring to get each row's key, derive the public point,
    // and cryptographically verify every emitted signature
    val ring = keyring.withColumn("pubkey", SignFns.pub($"priv"))
      .select($"key_id", $"pubkey._1".as("qx"), $"pubkey._2".as("qy"))
    val checked = signed
      .join(records, "s3_path")
      .join(ring, "key_id")
      .select(SignFns.verify($"qx", $"qy", $"payload", $"signature").as("valid"))
      .collect()
    assert(checked.length === 3)
    assert(checked.forall(_.getBoolean(0)))
    // the surrogate default is untouched: same records, sha2 signatures
    val sur = SigningStream.signRecords(records, keyring).collect()
    assert(sur.forall(_.getAs[String]("signature").matches("[0-9a-f]{64}")))
  }

  test("legacy flat signatures table is migrated to the bucketed layout") {
    val s = spark
    import s.implicits._
    val sigDir = Files.createTempDirectory("graft-legacy-").toString + "/sigs"
    // a pre-pk_bucket table: flat parquet files at the root, digit-only pk
    // prefixes (the partition-type-inference trap: 07/42 would infer INT)
    val legacy = Seq(
      ("07" + "a" * 62, 1L, "0xaddr1", "s" * 64, "raw/p0/old-1.json"),
      ("42" + "b" * 62, 2L, "0xaddr2", "t" * 64, "raw/p1/old-2.json"),
    ).toDF("pk", "key_id", "address", "signature", "s3_path")
    legacy.write.parquet(sigDir)
    val fs = new org.apache.hadoop.fs.Path(sigDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def rootFlatFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(sigDir))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))

    assert(rootFlatFiles().nonEmpty)
    // batch: a replay of one legacy pk + one new record
    val batch = Seq(
      ("07" + "a" * 62, 1L, "0xaddr1", "s" * 64, "raw/p0/replay.json"),
      ("99" + "c" * 62, 3L, "0xaddr3", "u" * 64, "raw/p2/new-3.json"),
    ).toDF("pk", "key_id", "address", "signature", "s3_path")
    SigningStream.upsert(batch, sigDir)(s)

    // migration: no flat files remain, everything lives in pk_bucket= dirs
    assert(rootFlatFiles().isEmpty)
    // explicit schema: with inference the all-digit buckets (07/42/99) would
    // come back as INTs and "07" would silently become 7
    val after = s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
      "pk string, key_id bigint, address string, signature string, " +
        "s3_path string, pk_bucket string")).parquet(sigDir)
    assert(after.count() === 3) // replayed legacy pk suppressed by anti-join
    assert(after.filter($"pk".startsWith("07")).count() === 1)
    assert(after.filter($"pk".startsWith("07")).select("s3_path").head.getString(0)
      === "raw/p0/old-1.json") // the legacy row, not the replay, survived
    val bucketVals = after.select(SigningStream.BucketCol).distinct()
      .as[String].collect().sorted
    assert(bucketVals.toSeq === Seq("07", "42", "99"))
  }

  test("migration resumes after a crash without losing or duplicating rows") {
    val s = spark
    import s.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "pk string, key_id bigint, address string, signature string, " +
        "s3_path string, pk_bucket string")
    def freshLegacy(): String = {
      val dir = Files.createTempDirectory("graft-legacy-crash-").toString + "/sigs"
      Seq(
        ("07" + "a" * 62, 1L, "0xaddr1", "s" * 64, "raw/p0/old-1.json"),
        ("42" + "b" * 62, 2L, "0xaddr2", "t" * 64, "raw/p1/old-2.json"),
      ).toDF("pk", "key_id", "address", "signature", "s3_path")
        .write.parquet(dir)
      dir
    }
    def rows(dir: String) =
      s.read.schema(schema).parquet(dir).select($"pk").as[String].collect().toSet

    // Crash window A: flat files already moved to the src staging dir,
    // rewrite not yet run (simulated by doing step 1 by hand).
    val dirA = freshLegacy()
    val fsA = new org.apache.hadoop.fs.Path(dirA)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val srcA = new org.apache.hadoop.fs.Path(dirA + ".migrating-src")
    fsA.mkdirs(srcA)
    for (f <- fsA.listStatus(new org.apache.hadoop.fs.Path(dirA))
        if f.isFile && !f.getPath.getName.startsWith("_"))
      assert(fsA.rename(f.getPath,
        new org.apache.hadoop.fs.Path(srcA, f.getPath.getName)))
    SigningStream.migrateLegacyLayout(dirA, schema)(s) // resume
    assert(rows(dirA).size === 2)
    assert(!fsA.exists(srcA))

    // Crash window B: rewrite completed (out dir with _SUCCESS), src still
    // present, buckets not yet moved — a resume must move them exactly once.
    val dirB = freshLegacy()
    SigningStream.migrateLegacyLayout(dirB, schema)(s) // full migration
    val before = rows(dirB)
    SigningStream.migrateLegacyLayout(dirB, schema)(s) // no-op re-run
    assert(rows(dirB) === before, "re-running migration changed the table")
  }
}
