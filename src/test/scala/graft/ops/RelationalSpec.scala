package graft.ops

import graft.SparkSpec

/** Plan- and semantics-level checks for the relational scale patterns that
  * the oracle alone can't pin: q89's salted join must actually shuffle on
  * the salted key (a broadcast would silently bypass the mechanism) while
  * returning exactly the plain join's rows.
  */
class RelationalSpec extends SparkSpec {

  test("q89 salted join: SMJ on (key, salt), result equals the plain join") {
    val s = spark
    import s.implicits._
    val df = Relational.q89SaltedJoin(s, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast would bypass the salt mechanism")
    assert(plan.toLowerCase.contains("salt"), "join key lost the salt")
    // exactly the unsalted join's aggregate
    val plain = graft.Tables(s, sf, "orders")
      .join(graft.Tables(s, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_orders"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(plain(r.get(0)) === r.getLong(1),
        s"nation ${r.get(0)} count diverges from the plain join")
    }
  }
}
