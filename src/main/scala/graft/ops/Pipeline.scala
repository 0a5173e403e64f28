package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.functions.Djb2

/** Seed keypair row (scripts/seed-keys.ts:9–14 analog; surrogate keys). */
case class KeyPair(key_id: Long, file_id: Long, address: String,
    public_key: String, private_key: String)

/** Batch re-expressions of the reference's three pipelines (SURVEY.md §3):
  * EP1 ingest/partitioner, EP2 signing, EP3 key seeding — plus the
  * monitoring aggregations (D1/D2/S2/S3 batch analogs).
  *
  * The `events` fixture stands in for the ingest stream (FIXTURES.md §A);
  * `props` plays the role of the opaque JSON payload, `$.k` the optional
  * record id (reference partitioner/index.js:51).
  */
object Pipeline {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Record key with whole-payload fallback (partitioner/index.js:51:
    * `payload.id || JSON.stringify(payload)`). */
  private def recordKey(props: Column): Column =
    coalesce(get_json_object(props, "$.k"), props)

  private val recordKeySql = "COALESCE(json_extract_string(props, '$.k'), props)"

  /** The sha2-surrogate keyring — single source of truth for the batch
    * pipeline, streaming bench, and specs: signatures must agree
    * bit-for-bit across every path (and with the DuckDB oracle). */
  def keyring(s: SparkSession, n: Int = 100): DataFrame = {
    import s.implicits._
    s.range(n).select(
      $"id".as("key_id"),
      concat(lit("0x"), substring(sha2(concat(lit("addr-"), $"id".cast("string")), 256), 1, 40)).as("address"),
      sha2(concat(lit("priv-"), $"id".cast("string")), 256).as("priv"))
  }

  // ---------------------------------------------------------------- q20
  /** EP1 partitioner: key extract → djb2 → modulo partition label
    * (partitioner/index.js:40–83), aggregated per partition. At 100 TB this
    * is a map-only stage: the hash is a codegen'd expression and the
    * aggregation is partial+final. */
  def q20Partitioner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .withColumn("bucket_partition",
        concat(lit("partition_"), pmod(Djb2.djb2(recordKey($"props")), lit(5L)).cast("string")))
      .groupBy($"bucket_partition")
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .orderBy($"bucket_partition")
  }

  val q20Oracle: String =
    s"""SELECT 'partition_' || CAST(${Sql.pmod("h", 5)} AS VARCHAR) AS bucket_partition,
       |  COUNT(*) AS cnt, ${Sql.dsum("value")} AS sum_value
       |FROM (SELECT ${Sql.djb2(recordKeySql)} AS h, value FROM events)
       |GROUP BY 1 ORDER BY bucket_partition""".stripMargin

  // ---------------------------------------------------------------- q21
  /** SHA-256 record identity (signer/index.js:133–137) + dedup cardinality
    * per event type (S4 idempotency, README.md:120–122). */
  def q21ShaDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .withColumn("pk", sha2($"props", 256))
      .groupBy($"event_type")
      .agg(countDistinct($"pk").as("n_unique"), count(lit(1)).as("cnt"))
      .orderBy($"event_type")
  }

  val q21Oracle: String =
    """SELECT event_type, COUNT(DISTINCT sha256(props)) AS n_unique,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q22
  /** EP2 signing pipeline, batch analog (SURVEY.md §3 EP2): hash → dedup
    * (first-writer-wins, deterministic) → key assignment via djb2 → broadcast
    * join against the 100-key keyring → surrogate deterministic signature.
    *
    * The keyring is derived from `spark.range(100)` with sha2-derived
    * addresses/private keys (real ECDSA is a pluggable UDF; the surrogate is
    * deterministic and oracle-checkable — SURVEY.md §7 F8). The keyring join
    * is an explicit `broadcast` — 100 rows against the full stream, never a
    * shuffle. Dedup partitions by `pk`, the same key the signatures sink
    * upserts on. */
  def q22SignPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ring = keyring(s)
    val keyed = Tables(s, dir, "events")
      .select($"event_id", $"props", recordKey($"props").as("key"))
      .withColumn("pk", sha2($"props", 256))
      .withColumn("key_id", pmod(Djb2.djb2($"key"), lit(100L)))
    val w = Window.partitionBy($"pk").orderBy($"event_id")
    keyed.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .join(broadcast(ring), "key_id")
      .select($"event_id", $"pk", $"key_id", $"address",
        sha2(concat($"priv", lit("|"), $"props"), 256).as("signature"))
      .orderBy($"event_id")
  }

  val q22Oracle: String =
    s"""WITH keyring AS (
       |  SELECT i AS key_id,
       |    '0x' || substr(sha256('addr-' || CAST(i AS VARCHAR)), 1, 40) AS address,
       |    sha256('priv-' || CAST(i AS VARCHAR)) AS priv
       |  FROM range(100) t(i)
       |), keyed AS (
       |  SELECT event_id, props, sha256(props) AS pk,
       |    ${Sql.pmod(Sql.djb2(recordKeySql), 100)} AS key_id,
       |    row_number() OVER (PARTITION BY sha256(props) ORDER BY event_id) AS rn
       |  FROM events)
       |SELECT event_id, pk, keyed.key_id, address,
       |  sha256(priv || '|' || props) AS signature
       |FROM keyed JOIN keyring ON keyring.key_id = keyed.key_id
       |WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** SQS S3-notification envelope construct + extract (F7,
    * signer/index.js:271–273 — implementing the intended extraction, not the
    * reference's double-parse bug). */
  def q23EnvelopeExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val s3key = concat(lit("raw/partition_"), pmod($"event_id", lit(5L)).cast("string"),
      lit("/year=2024/obj-"), $"event_id".cast("string"), lit(".json"))
    // Sort the narrow key first, project after: the range-partitioner's
    // sampling pass would otherwise evaluate the Jackson-backed
    // get_json_object (CodegenFallback) twice over every row.
    Tables(s, dir, "events")
      .select($"event_id")
      .orderBy($"event_id")
      .select($"event_id",
        concat(lit("{\"Records\":[{\"s3\":{\"bucket\":{\"name\":\"data-lake\"},\"object\":{\"key\":\""),
          s3key, lit("\"}}}]}")).as("envelope"))
      .select($"event_id",
        get_json_object($"envelope", "$.Records[0].s3.object.key").as("object_key"))
  }

  val q23Oracle: String =
    s"""SELECT event_id,
       |  json_extract_string(
       |    '{"Records":[{"s3":{"bucket":{"name":"data-lake"},"object":{"key":"'
       |    || 'raw/partition_' || CAST(${Sql.pmod("event_id", 5)} AS VARCHAR)
       |    || '/year=2024/obj-' || CAST(event_id AS VARCHAR) || '.json'
       |    || '"}}}]}',
       |    '$$.Records[0].s3.object.key') AS object_key
       |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Field redaction projection (B5, signer/index.js:51–63). */
  def q24Redact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id", $"event_type", lit("[REDACTED]").as("props"), $"value")
      .orderBy($"event_id")
  }

  val q24Oracle: String =
    """SELECT event_id, event_type, '[REDACTED]' AS props, value
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Hive-style time-partition derivation (F10, app.ts:400:
    * `year=/month=/day=/hour=` lake prefix), aggregated per partition. */
  def q25TimePartition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(year($"ts").cast("long").as("year"), month($"ts").cast("long").as("month"),
        dayofmonth($"ts").cast("long").as("day"), hour($"ts").cast("long").as("hour"))
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .orderBy($"year", $"month", $"day", $"hour")
  }

  val q25Oracle: String =
    s"""SELECT CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
       |  CAST(day(ts) AS BIGINT) AS day, CAST(hour(ts) AS BIGINT) AS hour,
       |  COUNT(*) AS cnt, ${Sql.dsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2, 3, 4 ORDER BY year, month, day, hour""".stripMargin

  // ---------------------------------------------------------------- q26
  /** 1-minute tumbling metrics (D1/D2/S2 batch analog of the CloudWatch
    * Sum/Average statistics, app.ts:452–502). */
  def q26Metrics1min(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(unix_millis(date_trunc("minute", $"ts")).as("minute_ms"), $"event_type")
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"),
        (dsum($"value") / count(lit(1))).as("avg_value"))
      .orderBy($"minute_ms", $"event_type")
  }

  val q26Oracle: String =
    s"""SELECT epoch_ms(date_trunc('minute', ts)) AS minute_ms, event_type,
       |  COUNT(*) AS cnt, ${Sql.dsum("value")} AS sum_value,
       |  ${Sql.dsum("value")} / COUNT(*) AS avg_value
       |FROM events GROUP BY 1, 2 ORDER BY minute_ms, event_type""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Threshold alarm on windowed aggregates (S3, app.ts:547–588): errors>1
    * per minute; `breach3` = 3 consecutive breached evaluation periods.
    *
    * "3 consecutive breaches" = minutes m, m−1, m−2 all present and
    * breached, so instead of a GLOBAL window (lag over an unpartitioned
    * ORDER BY → every minute of history through one task) the two
    * predecessors are fetched by equi-self-joins on `minute_ms` shifted by
    * one and two minutes — fully parallel at any history length, and
    * absent (error-free) minutes reset the run for free because the join
    * finds no row. */
  def q27AlarmBreach(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perMin = Tables(s, dir, "events")
      .filter($"event_type" === "error")
      .groupBy(unix_millis(date_trunc("minute", $"ts")).as("minute_ms"))
      .agg(count(lit(1)).as("err_cnt"))
      .withColumn("breach", $"err_cnt" > 1)
    val prev1 = perMin.select(($"minute_ms" + 60000L).as("minute_ms"),
      $"breach".as("breach_prev1"))
    val prev2 = perMin.select(($"minute_ms" + 120000L).as("minute_ms"),
      $"breach".as("breach_prev2"))
    perMin.join(prev1, Seq("minute_ms"), "left")
      .join(prev2, Seq("minute_ms"), "left")
      .withColumn("breach3", $"breach"
        && coalesce($"breach_prev1", lit(false))
        && coalesce($"breach_prev2", lit(false)))
      .select($"minute_ms", $"err_cnt", $"breach", $"breach3")
      .orderBy($"minute_ms")
  }

  val q27Oracle: String =
    """SELECT minute_ms, err_cnt, breach,
      |  breach AND COALESCE(lag(breach, 1) OVER (ORDER BY minute_ms), false)
      |         AND COALESCE(lag(breach, 2) OVER (ORDER BY minute_ms), false)
      |         AND COALESCE(minute_ms - lag(minute_ms, 2) OVER (ORDER BY minute_ms) = 120000, false)
      |    AS breach3
      |FROM (
      |  SELECT epoch_ms(date_trunc('minute', ts)) AS minute_ms,
      |    COUNT(*) AS err_cnt, COUNT(*) > 1 AS breach
      |  FROM events WHERE event_type = 'error' GROUP BY 1)
      |ORDER BY minute_ms""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Ok/error record split (A3, partitioner/index.js:71–80 +
    * app.ts:412 errorOutputPrefix): one predicate, two sides, re-unioned as
    * per-side totals. */
  def q28ErrorSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .withColumn("side", when($"event_type" === "error", lit("err")).otherwise(lit("ok")))
      .groupBy($"side")
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .orderBy($"side")
  }

  val q28Oracle: String =
    s"""SELECT CASE WHEN event_type = 'error' THEN 'err' ELSE 'ok' END AS side,
       |  COUNT(*) AS cnt, ${Sql.dsum("value")} AS sum_value
       |FROM events GROUP BY 1 ORDER BY side""".stripMargin

  // ---------------------------------------------------------------- q29
  /** EP3 key-seed generator (scripts/seed-keys.ts:32–85): N deterministic
    * surrogate keypairs chunked into files of 100 (`keysPerFile` analog).
    * RSA keygen is the pluggable part; the surrogate is sha2-derived so the
    * oracle can check it. Generation is `spark.range` — fully parallel,
    * no driver loop. */
  def q29SeedKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.range(1000).select(
      $"id".as("key_id"),
      expr("id div 100").as("file_id"),
      concat(lit("0x"), substring(sha2(concat(lit("addr-"), $"id".cast("string")), 256), 1, 40)).as("address"),
      sha2(concat(lit("pub-"), $"id".cast("string")), 256).as("public_key"),
      sha2(concat(lit("priv-"), $"id".cast("string")), 256).as("private_key"))
      .orderBy($"key_id")
  }

  val q29Oracle: String =
    """SELECT i AS key_id, i // 100 AS file_id,
      |  '0x' || substr(sha256('addr-' || CAST(i AS VARCHAR)), 1, 40) AS address,
      |  sha256('pub-' || CAST(i AS VARCHAR)) AS public_key,
      |  sha256('priv-' || CAST(i AS VARCHAR)) AS private_key
      |FROM range(1000) t(i) ORDER BY key_id""".stripMargin

  /** PEM-encode a DER key (RFC 7468: 64-char base64 lines between BEGIN/END
    * markers) — the on-disk format of the reference's seed files. */
  private def pem(label: String, der: Array[Byte]): String = {
    val b64 = java.util.Base64.getMimeEncoder(64, "\n".getBytes("US-ASCII"))
      .encodeToString(der)
    s"-----BEGIN $label-----\n$b64\n-----END $label-----\n"
  }

  /** Real RSA keypair generation (scripts/seed-keys.ts:16–30:
    * `generateKeyPairSync('rsa', { modulusLength: 2048 })` with PEM spki /
    * pkcs8 encodings), distributed (`spark.range` → one keygen per row, no
    * driver loop) and deterministic: each key id seeds its own SHA1PRNG
    * from sha256(seedSecret ‖ id), so a replayed/retried partition
    * regenerates byte-identical keys instead of silently rotating the
    * keyring (the reference's nondeterministic keygen makes retries
    * destructive; determinism is what makes the source idempotent under
    * Spark's task-retry model).
    *
    * Security caveats, stated plainly: with the DEFAULT seedSecret the
    * derivation is public — anyone with this source can regenerate every
    * private key, which is exactly right for test fixtures and exactly
    * wrong for production. A production deployment must pass a secret
    * `seedSecret` (from a real secret store) — or drop determinism
    * entirely and accept that task retries rotate keys. The determinism
    * also relies on SUN-provider SHA1PRNG semantics (`setSeed` REPLACES
    * the state before the first next-bytes call); other JCE providers may
    * mix in entropy instead, so the spec asserts two runs produce
    * identical PEMs and would fail loudly on such a JVM.
    *
    * Not oracle-checkable (DuckDB has no RSA), so q29 keeps the sha2
    * surrogate as its hash-checked twin; PipelineSpec validates PEM
    * structure, key-parseability, determinism, and keysPerFile chunking.
    *
    * Round 5: the Ethereum half of the reference KeyPair is real too —
    * `eth_private_key` is a deterministic secp256k1 scalar and `address`
    * is its keccak256/EIP-55 address (graft.crypto), exactly how ethers
    * derives `wallet.address` from `wallet.privateKey`. */
  def seedKeysRsa(s: SparkSession, n: Int, modulusBits: Int = 2048,
      keysPerFile: Int = 100,
      seedSecret: String = "graft-seed-key"): DataFrame = {
    import s.implicits._
    s.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val rnd = java.security.SecureRandom.getInstance("SHA1PRNG")
        rnd.setSeed(java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$seedSecret-$id".getBytes("UTF-8")))
        val kpg = java.security.KeyPairGenerator.getInstance("RSA")
        kpg.initialize(modulusBits, rnd)
        val kp = kpg.generateKeyPair()
        val pubDer = kp.getPublic.getEncoded   // X.509 SubjectPublicKeyInfo
        val privDer = kp.getPrivate.getEncoded // PKCS#8
        // Real Ethereum side of the reference KeyPair (seed-keys.ts:58–63:
        // ethers Wallet.createRandom → {address, ethPrivateKey}): a
        // deterministic secp256k1 scalar per key id, with the ADDRESS
        // derived from it the way ethers does — keccak256 of the
        // uncompressed public point, EIP-55 checksummed — not a sha2
        // surrogate (q29 keeps the surrogate for the oracle).
        val ethPriv = graft.functions.SignFns.privFromHex(
          graft.crypto.Ecdsa.hex(java.security.MessageDigest.getInstance("SHA-256")
            .digest(s"$seedSecret-eth-$id".getBytes("UTF-8"))))
        val (qx, qy) = graft.crypto.Ecdsa.derivePub(ethPriv, graft.crypto.EcCurve.secp256k1)
        val addr = graft.crypto.Keccak256.ethAddress(qx, qy)
        val ethPrivHex = "0x" + graft.crypto.Ecdsa.hex(
          graft.crypto.Ecdsa.toFixed(ethPriv, 32))
        (id, id / keysPerFile, addr, pem("PUBLIC KEY", pubDer),
          pem("PRIVATE KEY", privDer), ethPrivHex)
      }
    }.toDF("key_id", "file_id", "address", "public_key", "private_key",
      "eth_private_key")
  }

  // ---------------------------------------------------------------- q30
  /** Data-lake write/read round trip (A2/D2 layout, app.ts:400,411): write
    * the partitioned lake (`bucket_partition`/`year`/`month`/`day`), read it
    * back with partition filters — Catalyst prunes directories, so the scan
    * touches only `partition_3`, days 1–10 — and aggregate. The oracle
    * computes the same aggregate straight off `events`, proving the round
    * trip is lossless. */
  def q30LakeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = graft.Scratch.forSf("lake", dir)
    Tables(s, dir, "events")
      .withColumn("bucket_partition",
        concat(lit("partition_"), pmod(Djb2.djb2(recordKey($"props")), lit(5L)).cast("string")))
      .withColumn("year", year($"ts").cast("long"))
      .withColumn("month", month($"ts").cast("long"))
      .withColumn("day", dayofmonth($"ts").cast("long"))
      // Cluster rows by their target directory before the partitioned
      // write: without this every task writes a file into every directory
      // (tasks × dirs small files — the classic lake write mistake at
      // scale); with it each directory gets one file.
      .repartition(col("bucket_partition"), col("year"), col("month"), col("day"))
      .write.mode("overwrite")
      .partitionBy("bucket_partition", "year", "month", "day")
      .parquet(out)
    s.read.parquet(out)
      .filter($"bucket_partition" === "partition_3" && $"day" <= 10)
      .groupBy($"day".cast("long").as("day"))
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .orderBy($"day")
  }

  val q30Oracle: String =
    s"""SELECT CAST(day(ts) AS BIGINT) AS day, COUNT(*) AS cnt,
       |  ${Sql.dsum("value")} AS sum_value
       |FROM (SELECT ts, value, ${Sql.djb2(recordKeySql)} AS h FROM events)
       |WHERE ${Sql.pmod("h", 5)} = 3 AND day(ts) <= 10
       |GROUP BY 1 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q31
  /** KV point lookup (D4 surface, app.ts:127–134): fetch specific
    * signatures by PK — the DynamoDB GetItem analog. The probe keys are
    * broadcast and semi-joined; at scale this is a broadcast-semi-join
    * against a PK-bucketed table, never a scan-and-collect. */
  def q31PointLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = q22SignPipeline(s, dir)
    val probeKeys = Tables(s, dir, "events")
      .filter($"event_id" < 50)
      .select(sha2($"props", 256).as("pk")).distinct()
    sigs.join(broadcast(probeKeys), Seq("pk"), "left_semi")
      .orderBy($"pk")
  }

  val q31Oracle: String =
    // q22's result set as a subquery (inner ORDER BY is inert but must not
    // be textually stripped — the dedup window has its own ORDER BY),
    // probed by an IN-subquery on the PKs
    s"""SELECT pk, event_id, key_id, address, signature FROM ($q22Oracle) sigs
       |WHERE pk IN (SELECT DISTINCT sha256(props) FROM events WHERE event_id < 50)
       |ORDER BY pk""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Sketch aggregation (D5): HyperLogLog++ approximate distinct counts.
    * HLL estimates are engine-specific, so the estimate itself can't be
    * oracle-compared; instead the query surfaces the exact count plus a
    * Spark-computed `within_bounds` check that the estimate lands inside the
    * sketch's documented error envelope (rsd=0.05, 3σ), and the oracle
    * asserts exact count + literal TRUE. HLL is deterministic for a fixed
    * input, so the check is stable run-to-run, and a broken sketch (estimate
    * drifting outside 3σ) flips the boolean → hash mismatch. */
  def q32ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx_users"),
        countDistinct($"user_id").as("exact_users"),
        approx_count_distinct($"props").as("approx_payloads"),
        countDistinct($"props").as("exact_payloads"))
      .select($"event_type", $"exact_users",
        (abs($"approx_users" - $"exact_users").cast("double") /
          $"exact_users".cast("double") <= 0.15).as("users_within_bounds"),
        (abs($"approx_payloads" - $"exact_payloads").cast("double") /
          $"exact_payloads".cast("double") <= 0.15).as("payloads_within_bounds"))
      .orderBy($"event_type")
  }

  val q32Oracle: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS users_within_bounds,
      |  TRUE AS payloads_within_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Scalar-function surface (F1/F11/F12): base64 round trip, exponential
    * backoff (2^n × 100 ms, signer/index.js:102), case/format functions. */
  def q33ScalarMisc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id", $"event_type", $"props")
      .orderBy($"event_id")
      .select(
        $"event_id",
        base64($"props".cast("binary")).as("props_b64"),
        (unbase64(base64($"props".cast("binary"))).cast("string") === $"props").as("roundtrip_ok"),
        (pow(lit(2.0), pmod($"event_id", lit(5L))) * 100).as("backoff_ms"),
        upper($"event_type").as("type_upper"),
        initcap($"event_type").as("type_initcap"),
        format_string("%s:%04d", $"event_type", pmod($"event_id", lit(1000L))).as("shard_label"))
  }

  val q33Oracle: String =
    s"""SELECT event_id,
       |  to_base64(CAST(props AS BLOB)) AS props_b64,
       |  decode(from_base64(to_base64(CAST(props AS BLOB)))) = props AS roundtrip_ok,
       |  pow(2.0, ${Sql.pmod("event_id", 5)}) * 100 AS backoff_ms,
       |  upper(event_type) AS type_upper,
       |  upper(substr(event_type, 1, 1)) || substr(event_type, 2) AS type_initcap,
       |  printf('%s:%04d', event_type, ${Sql.pmod("event_id", 1000)}) AS shard_label
       |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q36
  /** MapType surface (SURVEY §1 / F13): parse the JSON payload into
    * map<string,string> and explode entries — the generic schemaless-props
    * path (works for any key set, not just `k`).
    *
    * Corrupt-input caveat: Spark's PERMISSIVE from_json yields null (row
    * dropped by explode) while DuckDB's json_keys errors — the oracle is
    * only equivalent on well-formed payloads, which the fixture guarantees;
    * the corrupt path is covered by the ingest error split (q28/A3). */
  def q36JsonMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id", explode(from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))))
      .orderBy($"event_id", $"key")
  }

  val q36Oracle: String =
    """SELECT event_id, k AS key, json_extract_string(props, '$.' || k) AS value
      |FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
      |ORDER BY event_id, key""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Typed-Aggregator UDAF (§2 J): exact weighted mean of `value`, weighted
    * by a derived per-event weight. The decimal buffer makes the aggregate
    * order-insensitive (partition merges commute), so the custom UDAF
    * hash-matches the declarative oracle. */
  def q39WeightedMean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wmean = udaf(graft.functions.WeightedMeanAgg)
    Tables(s, dir, "events")
      .select($"event_type", $"value", (pmod($"event_id", lit(7L)) + 1).as("w"))
      .groupBy($"event_type")
      .agg(wmean($"value", $"w").as("weighted_mean"), sum($"w").as("total_w"))
      .orderBy($"event_type")
  }

  val q39Oracle: String =
    s"""SELECT event_type,
       |  ${Sql.dsum(s"value * (${Sql.pmod("event_id", 7)} + 1)", 6)}
       |    / CAST(SUM(${Sql.pmod("event_id", 7)} + 1) AS DOUBLE) AS weighted_mean,
       |  CAST(SUM(${Sql.pmod("event_id", 7)} + 1) AS BIGINT) AS total_w
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q49
  /** StructType JSON parse + canonical serialization (F3, SURVEY §1):
    * `from_json` into a typed struct, field access, and `to_json` with the
    * schema-defined field order — the canonicalization that makes
    * SHA-256 record identities reproducible (the reference depends on JS
    * insertion order, signer/index.js:135; here the schema IS the order). */
  def q49JsonStruct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_id", from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("parsed"))
      .select($"event_id", $"parsed.k".cast("long").as("k"),
        to_json($"parsed").as("canonical_json"))
      .orderBy($"event_id")
  }

  val q49Oracle: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  '{"k":' || json_extract_string(props, '$.k') || '}' AS canonical_json
      |FROM events ORDER BY event_id""".stripMargin

  /** A8/EP3 — the chunked JSON seed-file sink (scripts/seed-keys.ts:68–81):
    * write the keyring as JSON, ≤`perFile` records per file, and return the
    * output path. `maxRecordsPerFile` gives the 1000-per-file chunking
    * without a manual loop; at scale the range partitioning keeps files
    * key-ordered. Exercised by PipelineSpec (file layout + roundtrip). */
  def writeSeedKeys(s: SparkSession, n: Long, dir: String, perFile: Int = 1000): Unit = {
    import s.implicits._
    q29SeedKeys(s, dir)
      .filter($"key_id" < n) // Long-safe (limit(n.toInt) overflows past 2^31)
      .as[KeyPair] // typed boundary: the generator yields Dataset[KeyPair]
      .repartitionByRange(math.max(1, (n / perFile / 4).toInt), $"key_id")
      .sortWithinPartitions($"key_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", perFile)
      .json(dir)
  }

  // ---------------------------------------------------------------- q66
  /** EP2 with the REAL signature seam: the same hash → dedup → key-assign →
    * broadcast-keyring join as q22, but the signature is genuine
    * deterministic ECDSA — RFC 6979 nonce, secp256k1, low-s — from the
    * pure-JVM [[graft.crypto.Ecdsa]] (the behavior the reference delegates
    * to ethers.js: signer/index.js:295). Every row also carries an
    * in-query verification against the key's derived public point, so the
    * result is self-evidencing: `valid` must be uniformly true.
    *
    * Oracle-checked DESPITE the crypto (r5 ran it as the one no_oracle
    * row): the signature hex itself is not SQL-expressible, so the
    * registered projection emits its deterministic, SQL-expressible
    * CONSEQUENCES instead — `valid` (in-query ECDSA verify against the
    * derived public point), `low_s` (s ≤ n/2, a lexicographic compare of
    * fixed-width lowercase hex), and `sig_len`. The DuckDB oracle asserts
    * the expected values (uniformly true / 128) over the q22-shaped
    * deterministic prefix — so a broken sign, verify, or normalization
    * flips a boolean and fails the hash compare. The signature bytes stay
    * pinned by EcdsaSpec (RFC 6979 A.2.5 + secp256k1 vectors). Bounded to
    * 500 records so the bench books signing cost without drowning in it;
    * the public points are derived once per keyring row (bounded), never
    * per record. */
  def q66EcdsaSign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.SignFns
    import graft.crypto.{EcCurve, Ecdsa}
    val c = EcCurve.secp256k1
    val halfN = Ecdsa.hex(Ecdsa.toFixed(c.n.shiftRight(1), c.qlenBytes))
    val ring = keyring(s)
      .withColumn("pubkey", SignFns.pub($"priv"))
      .select($"key_id", $"address", $"priv",
        $"pubkey._1".as("qx"), $"pubkey._2".as("qy"))
    val keyed = Tables(s, dir, "events")
      .filter($"event_id" < 500)
      .select($"event_id", $"props", recordKey($"props").as("key"))
      .withColumn("pk", sha2($"props", 256))
      .withColumn("key_id", pmod(Djb2.djb2($"key"), lit(100L)))
    val w = Window.partitionBy($"pk").orderBy($"event_id")
    keyed.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .join(broadcast(ring), "key_id")
      .withColumn("signature", SignFns.sign($"priv", $"props"))
      .select($"event_id", $"pk", $"key_id", $"address",
        length($"signature").cast("long").as("sig_len"),
        SignFns.verify($"qx", $"qy", $"props", $"signature").as("valid"),
        (substring($"signature", c.qlenBytes * 2 + 1, c.qlenBytes * 2)
          <= lit(halfN)).as("low_s"))
      .orderBy($"event_id")
  }

  /** The q22 deterministic prefix (bounded to event_id < 500) with the
    * crypto columns replaced by their asserted expected values: every
    * signature verifies, is low-s-normalized, and is 128 hex chars. */
  val q66Oracle: String =
    s"""WITH keyring AS (
       |  SELECT i AS key_id,
       |    '0x' || substr(sha256('addr-' || CAST(i AS VARCHAR)), 1, 40) AS address
       |  FROM range(100) t(i)
       |), keyed AS (
       |  SELECT event_id, sha256(props) AS pk,
       |    ${Sql.pmod(Sql.djb2(recordKeySql), 100)} AS key_id,
       |    row_number() OVER (PARTITION BY sha256(props) ORDER BY event_id) AS rn
       |  FROM events WHERE event_id < 500)
       |SELECT event_id, pk, keyed.key_id, address,
       |  CAST(128 AS BIGINT) AS sig_len, true AS valid, true AS low_s
       |FROM keyed JOIN keyring ON keyring.key_id = keyed.key_id
       |WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Sliding (hopping) window metrics — 5-minute windows every 1 minute
    * (D1/D2 generalized beyond q26's tumbling shape; CloudWatch renders
    * exactly this for any period with a finer refresh, app.ts:452–502).
    * Spark's `window(ts, "5 minutes", "1 minute")` expands each event into
    * its 5 covering windows map-side; the aggregation is then the same
    * partial+final shuffle on (window, type) as q26 — the 5× row expansion
    * happens BEFORE the map-side combine, so the exchange still moves one
    * row per (window, type) per task, not 5× the events.
    *
    * Each window is surfaced as its epoch-ms start; the oracle generates
    * the same 5 covering starts per event arithmetically
    * (minute_floor(ts) − k·60s, k = 0..4) — both sides integer-exact.
    */
  def q90SlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "5 minutes", "1 minute"), $"event_type")
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .select(unix_millis($"window.start").as("window_ms"), $"event_type",
        $"cnt", $"sum_value")
      .orderBy($"window_ms", $"event_type")
  }

  val q90Oracle: String =
    s"""SELECT epoch_ms(date_trunc('minute', ts)) - k * 60000 AS window_ms,
       |  event_type, COUNT(*) AS cnt, ${Sql.dsum("value")} AS sum_value
       |FROM events, UNNEST(range(0, 5)) AS u(k)
       |GROUP BY 1, 2 ORDER BY window_ms, event_type""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Multi-format sink/source roundtrip (A2/A8 generalized): the same
    * aggregate written to and re-read from CSV (headered), JSON lines, and
    * ORC, verifying byte-exact fidelity through every text/columnar format
    * the engine serves. Doubles survive the text formats because Spark
    * serializes them with shortest-roundtrip representation; the read
    * schemas are pinned explicitly (never inferred) — the production
    * discipline for text sources. The reference's lake is text-format JSON
    * (app.ts:410 `compressionFormat: 'UNCOMPRESSED'`); this query is that
    * sink plus the two formats a warehouse migration actually encounters.
    *
    * Plan shape: one partial+final aggregation, then each sink is the
    * writeSeedKeys/q30 shape — repartitionByRange on the sort key with a
    * row-count-derived partition target (≤1M rows per file) — so no
    * format ever serializes through a single task: at test scale the
    * target is 1 file, at 100× it grows with the data instead of
    * bottlenecking (VERDICT r7 #4 retired the former `coalesce(1)`). The
    * count that sizes the target is the aggregate's own group-key
    * cardinality — bounded driver metadata, not a data collect. The
    * roundtrip reads prune columns through every format's reader (ORC
    * vectorized, CSV/JSON schema-projected). */
  def q87FormatRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = graft.Scratch.forSf("formats", dir)
    val agg = Tables(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .persist() // ≤|priorities| rows: the sizing count and the 3 format
                 // writes reuse one aggregation instead of 4 scans
    val nGroups = agg.count() // |priorities| — bounded group-key cardinality
    val shaped = agg.repartitionByRange(
      math.max(1, (nGroups / 1000000L).toInt + (if (nGroups % 1000000L == 0) 0 else 1)),
      $"o_orderpriority")
    // maxRecordsPerFile makes the ≤1M-rows-per-file contract hold even if
    // the range partitioning lands skewed (same discipline as writeSeedKeys)
    shaped.write.mode("overwrite").option("maxRecordsPerFile", 1000000)
      .option("header", "true").csv(s"$out/csv")
    shaped.write.mode("overwrite").option("maxRecordsPerFile", 1000000)
      .json(s"$out/json")
    shaped.write.mode("overwrite").option("maxRecordsPerFile", 1000000)
      .orc(s"$out/orc")
    agg.unpersist()
    val schema = "o_orderpriority string, n_orders bigint, total double"
    val csv = s.read.schema(schema).option("header", "true").csv(s"$out/csv")
      .withColumn("format", lit("csv"))
    val json = s.read.schema(schema).json(s"$out/json")
      .withColumn("format", lit("json"))
    val orc = s.read.orc(s"$out/orc")
      .withColumn("format", lit("orc"))
    csv.unionByName(json).unionByName(orc)
      .select($"format", $"o_orderpriority", $"n_orders", $"total")
      .orderBy($"format", $"o_orderpriority")
  }

  val q87Oracle: String =
    s"""WITH agg AS (
       |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |    ${Sql.dsum("o_totalprice")} AS total
       |  FROM orders GROUP BY o_orderpriority)
       |SELECT f.format, a.o_orderpriority, a.n_orders, a.total
       |FROM agg a CROSS JOIN (VALUES ('csv'), ('json'), ('orc')) f(format)
       |ORDER BY f.format, a.o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_partitioner" -> q20Partitioner _,
    "q21_sha_dedup" -> q21ShaDedup _,
    "q22_sign_pipeline" -> q22SignPipeline _,
    "q23_envelope_extract" -> q23EnvelopeExtract _,
    "q24_redact" -> q24Redact _,
    "q25_time_partition" -> q25TimePartition _,
    "q26_metrics_1min" -> q26Metrics1min _,
    "q27_alarm_breach" -> q27AlarmBreach _,
    "q28_error_split" -> q28ErrorSplit _,
    "q29_seed_keys" -> q29SeedKeys _,
    "q30_lake_roundtrip" -> q30LakeRoundtrip _,
    "q31_point_lookup" -> q31PointLookup _,
    "q32_approx_distinct" -> q32ApproxDistinct _,
    "q33_scalar_misc" -> q33ScalarMisc _,
    "q36_json_map" -> q36JsonMap _,
    "q39_weighted_mean" -> q39WeightedMean _,
    "q49_json_struct" -> q49JsonStruct _,
    "q66_ecdsa_sign" -> q66EcdsaSign _,
    "q87_format_roundtrip" -> q87FormatRoundtrip _,
    "q90_sliding_window" -> q90SlidingWindow _,
  )

  val oracles: Map[String, String] = Map(
    "q20_partitioner" -> q20Oracle,
    "q21_sha_dedup" -> q21Oracle,
    "q22_sign_pipeline" -> q22Oracle,
    "q23_envelope_extract" -> q23Oracle,
    "q24_redact" -> q24Oracle,
    "q25_time_partition" -> q25Oracle,
    "q26_metrics_1min" -> q26Oracle,
    "q27_alarm_breach" -> q27Oracle,
    "q28_error_split" -> q28Oracle,
    "q29_seed_keys" -> q29Oracle,
    "q30_lake_roundtrip" -> q30Oracle,
    "q31_point_lookup" -> q31Oracle,
    "q32_approx_distinct" -> q32Oracle,
    "q33_scalar_misc" -> q33Oracle,
    "q36_json_map" -> q36Oracle,
    "q39_weighted_mean" -> q39Oracle,
    "q49_json_struct" -> q49Oracle,
    "q66_ecdsa_sign" -> q66Oracle,
    "q87_format_roundtrip" -> q87Oracle,
    "q90_sliding_window" -> q90Oracle,
  )
}
