package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r15 bench-emission restructure (VERDICT r14 #2): full-precision
  * stamps always ride standalone detail lines; the driver-parsed final
  * line keeps the ladder while it fits and floors at BOUNDED family
  * subtotals + a detail pointer instead of losing resolution. All pure —
  * the stdout contract is pinned without running Spark.
  */
class BenchLineSpec extends AnyFunSuite {

  // a plausible result set: preps + 200 queries at mixed magnitudes
  val results: Seq[(String, Double)] =
    Seq("dedup_prep" -> 2.135, "suffix_prep" -> 11.27, "ann_prep" -> 6.7) ++
      (1 to 200).map(i => f"q${i}%d_some_name_$i" -> (0.05 * (i % 37) + 0.213))

  val keyRe = """"metric":"total","value":(\d+\.\d{3}),"unit":"sec"""".r

  test("full-precision rung when the budget allows") {
    val c = BenchLine.finalLine(results.take(10), "sfX", 1900)
    val (line, rung) = (c.line, c.rung)
    assert(rung === "3 decimals, stripQ=false" && !c.degraded)
    assert(line.length <= 1900)
    assert(keyRe.findFirstIn(line).isDefined)
    assert(line.contains(""""q1":""") && line.endsWith(""""sf":"sfX"}"""))
    assert(line.contains(""""dedup_prep":2.135"""))
  }

  test("family floor under a tight budget: bounded, schema-parseable, pointered") {
    val c = BenchLine.finalLine(results, "sfX", 600)
    val (line, rung) = (c.line, c.rung)
    assert(rung === "family subtotals + detail pointer" && c.degraded)
    assert(line.length <= 600, s"family line must be bounded, got ${line.length}")
    assert(keyRe.findFirstIn(line).isDefined, "driver schema keys intact")
    assert(line.contains(""""detail":"target/bench.json""""))
    assert(line.contains(""""queries":{"""))
    // family keys: decade roll-ups plus untouched prep names
    assert(line.contains(""""q0x":""") && line.contains(""""q19x":"""))
    assert(line.contains(""""dedup_prep":"""))
    // total stays full precision on every rung
    val total = keyRe.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(total - results.map(_._2).sum) < 1e-3)
  }

  test("family subtotals sum the right members and exclude failures") {
    val r = Seq("q10_a" -> 1.0, "q11_b" -> 2.0, "q19_c" -> 4.0,
      "q20_d" -> 8.0, "q7_e" -> -1.0, "x_prep" -> 0.5)
    val line = BenchLine.familyLine(r, "sf")
    assert(line.contains(""""q1x":7.0"""))
    assert(line.contains(""""q2x":8.0"""))
    assert(line.contains(""""x_prep":0.5"""))
    assert(line.contains(""""failed":["q7_e"]"""))
    assert(!line.contains(""""q0x":"""))
  }

  test("detail lines carry every stamp at 3 decimals, each line bounded") {
    val lines = BenchLine.detailLines(results, "sfX")
    assert(lines.size > 1)
    lines.foreach { l =>
      assert(l.length <= BenchLine.DetailChunkChars + 100)
      assert(l.contains(""""metric":"bench_queries""""))
      assert(l.contains(s""""of":${lines.size}"""))
    }
    val all = lines.mkString("\n")
    results.foreach { case (k, v) =>
      assert(all.contains("\"" + k + "\":" + f"$v%.3f"),
        s"stamp for $k missing from detail lines")
    }
    // a SPARK_GRAFT_BENCH_TAIL_BUDGET=600 run still yields full-precision
    // stamps somewhere judge-readable: BenchPrev reads them back
    val recovered = BenchPrev.parse(all, results.map(_._1).toSet)
    assert(recovered.size === results.count(_._2 >= 0))
    assert(math.abs(recovered("suffix_prep") - 11.27) < 1e-9)
  }

  test("load_index rides every rung, including the family floor") {
    val l1 = BenchLine.finalLine(results.take(5), "sf", 1900, Some(1.02)).line
    assert(l1.contains(""""load_index":1.02,"""))
    val l2 = BenchLine.finalLine(results, "sf", 600, Some(2.40)).line
    assert(l2.contains(""""load_index":2.40,"""))
    // -1 (canary failed) is emitted, not hidden
    val l3 = BenchLine.finalLine(results.take(5), "sf", 1900, Some(-1.0)).line
    assert(l3.contains(""""load_index":-1.00,"""))
  }

  test("BenchPrev recovers per-query stamps from a full r15 stdout: " +
    "detail lines preferred over the degraded final line") {
    val names = results.map(_._1).toSet
    val detail = BenchLine.detailLines(results, "sf")
    val fin = BenchLine.finalLine(results, "sf", 600, Some(1.0)).line
    val stdout = (detail :+ fin).mkString("\n")
    val m = BenchPrev.parse(stdout, names)
    // family keys in the final line match no query name; the detail
    // lines supply every stamp at full precision
    assert(m.size === results.size)
    assert(math.abs(m("q17_some_name_17") -
      results.toMap.apply("q17_some_name_17")) < 1e-9)
  }

  test("requeued/requeue_cap_hit ride every rung (VERDICT r16 #1): the " +
    "committed artifact can never again say nothing about the re-pass") {
    val rq = Some((3, true))
    val l1 = BenchLine.finalLine(results.take(5), "sf", 1900,
      Some(1.0), Some(0.9), rq).line
    assert(l1.contains(""""requeued":3,"requeue_cap_hit":true,"""))
    assert(keyRe.findFirstIn(l1).isDefined, "driver schema keys intact")
    // the family floor carries it too
    val l2 = BenchLine.finalLine(results, "sf", 600, Some(1.0), Some(0.9),
      Some((12, false))).line
    assert(l2.contains(""""requeued":12,"requeue_cap_hit":false,"""))
    // and the deciseconds rung still round-trips through BenchPrev with
    // the new keys in place
    val ds = BenchLine.queryLine(Seq("q5_a" -> 4.2), "sf", 1, stripQ = true,
      deci = true, requeue = Some((1, false)))
    assert(math.abs(BenchPrev.parse(ds, Set("q5_a"))("q5_a") - 4.2) < 1e-9)
  }

  test("requeue detail line: names + before/after for every adjudicated " +
    "entry, skipped names bounded, explicitly-empty roster still emitted") {
    val entries = Seq(
      BenchLine.Requeued("q199_join_cardinality", 3.807, 1.2, 1.291),
      BenchLine.Requeued("suffix_prep", 19.1, 8.4, 8.15))
    val skipped = (1 to 15).map(i => s"q${i}_x")
    val l = BenchLine.requeueLine(entries, skipped, 12, "sfX")
    assert(l.contains(""""metric":"bench_requeues""""))
    assert(l.contains(""""requeued":2,"cap":12,"cap_hit":true"""))
    assert(l.contains(
      """"q199_join_cardinality":{"stamped":3.807,"prev":1.200,"final":1.291}"""))
    assert(l.contains(""""suffix_prep":{"stamped":19.100"""))
    // skipped list truncated loudly at MaxSkippedNames
    assert(l.contains(""""q12_x"""") && !l.contains(""""q13_x""""))
    assert(l.contains(""""skipped_more":3"""))
    val empty = BenchLine.requeueLine(Seq.empty, Seq.empty, 12, "sfX")
    assert(empty.contains(""""requeued":0,"cap":12,"cap_hit":false"""))
    assert(empty.contains(""""entries":{},"skipped":[]"""))
  }

  test("deciseconds rung still parses with qunit anchored to its own object") {
    val r = Seq("q5_a" -> 4.2, "q6_b" -> 0.7)
    val ds = BenchLine.queryLine(r, "sf", 1, stripQ = true, deci = true,
      loadIndex = Some(1.0))
    assert(ds.contains(""""qunit":"ds""""))
    val m = BenchPrev.parse(ds, Set("q5_a", "q6_b"))
    assert(math.abs(m("q5_a") - 4.2) < 1e-9)
    assert(math.abs(m("q6_b") - 0.7) < 1e-9)
    // a NEIGHBORING object's qunit must not rescale a 3-decimal line:
    // q9_c lives ONLY in the 3-decimal line that FOLLOWS a ds line, so
    // its stamp can only come from the later object — a too-wide
    // look-behind window would pick up the ds line's qunit and read
    // 0.42 instead of 4.2 (first-seen-wins cannot mask this: the name
    // is absent from the first object)
    val full = BenchLine.queryLine(Seq("q9_c" -> 4.2), "sf", 3, stripQ = false)
    val m2 = BenchPrev.parse(ds + "\n" + full, Set("q5_a", "q9_c"))
    assert(math.abs(m2("q5_a") - 4.2) < 1e-9)
    assert(math.abs(m2("q9_c") - 4.2) < 1e-9,
      s"the ds line's qunit leaked into the following object: $m2")
  }

  test("total_norm rides next to the raw total on query and family " +
    "rungs (VERDICT r19 #4): total / max(load_index, 1), absent " +
    "without a canary") {
    val rs = Seq("q1_a" -> 10.0, "q2_b" -> 20.0)
    val l = BenchLine.queryLine(rs, "sf", 3, stripQ = false,
      loadIndex = Some(1.5))
    assert(l.contains(""""unit":"sec","total_norm":20.000,"""), l)
    // a sub-1.0 reading clamps: normalization never reads better than raw
    val q = BenchLine.queryLine(rs, "sf", 3, stripQ = false,
      loadIndex = Some(0.8))
    assert(q.contains(""""total_norm":30.000,"""), q)
    val n = BenchLine.queryLine(rs, "sf", 3, stripQ = false)
    assert(!n.contains("total_norm"), n)
    val f = BenchLine.familyLine(rs, "sf", loadIndex = Some(2.0))
    assert(f.contains(""""total_norm":15.000,"""), f)
    // failed queries stay out of both totals
    val withFail = rs :+ ("q3_c" -> -1.0)
    val w = BenchLine.queryLine(withFail, "sf", 3, stripQ = false,
      loadIndex = Some(1.5))
    assert(w.contains(""""unit":"sec","total_norm":20.000,"""), w)
  }
}
