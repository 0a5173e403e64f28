package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.KeyLease.{Leased, SignRequest}

class KeyLeaseSpec extends SparkSpec {

  test("LRU rotation: keys cycle in order, exclusively, batch mode") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    val reqs = (0L until 10L).map(i => SignRequest(i, shard = 0, s"payload-$i"))
    val out = KeyLease.leaseAndAssign(reqs.toDS(), keysPerShard = 4)
      .collect().sortBy(_.eventId)
    // 10 requests over 4 keys → 0,1,2,3,0,1,2,3,0,1
    assert(out.map(_.keyId).toSeq === Seq(0, 1, 2, 3, 0, 1, 2, 3, 0, 1))
    // lease sequence strictly increases → never two concurrent holders
    assert(out.map(_.leaseSeq).toSeq === (1L to 10L))
  }

  test("flooded shard: only event ids are materialized, leases stay exact") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    // 100k requests on ONE shard with fat payloads — the task materializes
    // an 8-byte id per request (not the record), so this must complete and
    // stay exactly LRU-round-robin.
    val pad = "x" * 200
    val reqs = s.range(100000).map(i => SignRequest(i, shard = 0, s"payload-$pad-$i"))
    val out = KeyLease.leaseAndAssign(reqs, keysPerShard = 7)
    val n = out.count()
    assert(n === 100000L)
    val sample = out.filter(_.eventId < 14).collect().sortBy(_.eventId)
    assert(sample.map(_.keyId).toSeq === (0 to 6).toSeq ++ (0 to 6).toSeq)
    // lease sequence is a bijection onto 1..100000 → exclusivity held
    assert(out.map(_.leaseSeq).distinct().count() === 100000L)
  }

  test("state persists across micro-batches and shards are independent") {
    val s = spark
    implicit val sp = s
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[SignRequest]
    val q = KeyLease.leaseAndAssign(input.toDS(), keysPerShard = 3)
      .writeStream.format("memory").queryName("leases").outputMode("append").start()
    input.addData(SignRequest(1, 0, "a"), SignRequest(2, 0, "b"), SignRequest(3, 1, "c"))
    q.processAllAvailable()
    input.addData(SignRequest(4, 0, "d"), SignRequest(5, 1, "e"))
    q.processAllAvailable()
    val rows = s.table("leases").as[Leased].collect().sortBy(_.eventId)
    q.stop()
    // shard 0 rotation continues across batches: keys 0,1 then 2
    assert(rows.filter(_.shard == 0).map(_.keyId).toSeq === Seq(0, 1, 2))
    // shard 1 rotates independently from its own state: 0 then 1
    assert(rows.filter(_.shard == 1).map(_.keyId).toSeq === Seq(0, 1))
  }
}
