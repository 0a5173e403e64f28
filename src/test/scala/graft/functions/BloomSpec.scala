package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** The Bloom prefilter's two load-bearing properties: zero false negatives
  * (a built key ALWAYS probes true — the exact-verify join downstream may
  * shrink, never grow, the result), and genuine pruning (a disjoint probe
  * set mostly probes false at the configured m/k/n operating point).
  */
class BloomSpec extends SparkSpec {

  test("no false negatives: every built key probes true") {
    val s = spark
    import s.implicits._
    val keys = (1L to 5000L).map(_ * 2654435761L).toDF("key")
    val words = BloomFns.build(keys)
    val misses = keys
      .withColumn("hit", BloomFns.mightContain($"key", words))
      .filter(!$"hit").count()
    assert(misses === 0L)
  }

  test("pruning: a disjoint probe set is mostly rejected (FP rate sane)") {
    val s = spark
    import s.implicits._
    val built = (1L to 5000L).toDF("key")
    val words = BloomFns.build(built)
    // Disjoint range — any hit is a false positive. At n=5000, m=2^17,
    // k=5: FP ≈ (1 − e^(−kn/m))^k ≈ 2.4e-4 → expect ~2 of 10k; assert a
    // loose ceiling so the test is deterministic-safe, plus non-vacuity.
    val probes = (1000001L to 1010000L).toDF("key")
    val fp = probes.withColumn("hit", BloomFns.mightContain($"key", words))
      .filter($"hit").count()
    assert(fp <= 50L, s"FP count $fp way above the operating point")
  }

  test("interpreted eval matches codegen") {
    val s = spark
    import s.implicits._
    val keys = (1L to 64L).toDF("key")
    val words = BloomFns.build(keys)
    val h1 = keys.select(pmod(xxhash64($"key"), lit(1L << 31)))
      .collect().map(_.getLong(0))
    val h2 = keys.select(pmod(xxhash64($"key", lit(0x27d4eb2fL)), lit(1L << 31))
      .bitwiseOR(lit(1L))).collect().map(_.getLong(0))
    h1.zip(h2).foreach { case (a, b) =>
      assert(BloomUtil.contains(words, a, b, BloomFns.K, BloomFns.MBits))
    }
  }

  test("q78: bloom path reproduces the exact membership join verbatim") {
    val s = spark
    import s.implicits._
    import graft.functions.{HashFns, TextFns}
    val got = Dedup.q78BloomDelta(s, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash"),
        r.getAs[Boolean]("is_dup"),
        Option(r.getAs[java.lang.Long]("keeper")).map(_.longValue))).toSeq
    // the bloom-free reference: plain left join on the sketch
    val sk = graft.Tables(s, sf, "documents")
      .select($"doc_id", HashFns.simhash32(TextFns.tokens($"text")).as("simhash"))
    val expected = sk.filter($"doc_id" % 10 === 3).as("d")
      .join(sk.filter($"doc_id" % 10 =!= 3).groupBy($"simhash")
        .agg(min($"doc_id").as("keeper")), Seq("simhash"), "left")
      .select($"doc_id", $"simhash", $"keeper".isNotNull.as("is_dup"), $"keeper")
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash"),
        r.getAs[Boolean]("is_dup"),
        Option(r.getAs[java.lang.Long]("keeper")).map(_.longValue))).toSeq
    assert(got === expected)
    assert(got.exists(_._3), "fixture has no membership hits — vacuous")
    assert(got.exists(!_._3), "fixture has no fresh docs — vacuous")
  }
}
