package graft

/** Smoke-level invariants over the whole registry: every query runs on
  * sf0.001, returns rows, has an oracle (or is explicitly rows-only), and is
  * deterministic across two executions.
  */
class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is deterministic on sf0.001") {
      val a = fn(spark, sf)
      val rows1 = a.collect()
      val rows2 = fn(spark, sf).collect()
      assert(rows1.nonEmpty || name == "q05_anti_join" || name == "q13_except",
        s"$name returned no rows")
      assert(rows1.toSeq === rows2.toSeq, s"$name is nondeterministic")
    }
  }
}
