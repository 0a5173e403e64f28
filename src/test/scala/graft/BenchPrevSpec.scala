package graft

import org.scalatest.funsuite.AnyFunSuite

/** The outlier re-pass must read previous stamps out of every shape a
  * driver BENCH_r*.json can take — the emit-rung ladder changes keys and
  * units round to round, and the file wraps an ESCAPED copy of the bench
  * stdout (whose `\"queries\"` must not be mistaken for the parsed one).
  */
class BenchPrevSpec extends AnyFunSuite {

  val names = Set("q138_retrieval_trend", "q92_ann_recall_families",
    "dedup_prep", "q01_agg")

  test("deciseconds rung with stripped-digit keys (the r13 shape)") {
    val content =
      """{"n": 13, "tail": "noise \"qunit\":\"ds\" \"queries\":{\"138\":9999} end",
        |"parsed": {"metric": "total", "value": 172.752, "unit": "sec",
        |"qunit": "ds", "queries": {"dedup_prep": 10, "01": 16, "92": 39,
        |"138": 108}, "sf": "/root/testdata/sf0.1"}}""".stripMargin
    val m = BenchPrev.parse(content, names)
    assert(math.abs(m("q138_retrieval_trend") - 10.8) < 1e-9)
    assert(math.abs(m("q92_ann_recall_families") - 3.9) < 1e-9)
    assert(math.abs(m("q01_agg") - 1.6) < 1e-9)
    assert(math.abs(m("dedup_prep") - 1.0) < 1e-9)
  }

  test("deciseconds rung in the driver's PRETTY-PRINTED shape: qunit on " +
    "its own line still scales (the r16 regression — a newline-stopped " +
    "window missed the marker and read every stamp 10x high, which " +
    "silently disabled the re-pass for the whole round)") {
    val content =
      "{\n  \"parsed\": {\n    \"metric\": \"total\",\n" +
        "    \"value\": 241.107,\n    \"unit\": \"sec\",\n" +
        "    \"load_index\": 0.91,\n    \"qunit\": \"ds\",\n" +
        "    \"queries\": {\n      \"dedup_prep\": 19,\n" +
        "      \"138\": 108,\n      \"01\": 16\n    },\n" +
        "    \"sf\": \"/root/testdata/sf0.1\"\n  }\n}"
    val m = BenchPrev.parse(content, names)
    assert(math.abs(m("q138_retrieval_trend") - 10.8) < 1e-9)
    assert(math.abs(m("dedup_prep") - 1.9) < 1e-9)
    // and the REAL committed driver file: the r15 ds stamps must come
    // back in seconds (q151's stamp was 14 ds = 1.4 s — the 8x mover
    // that exposed the regression when it failed to requeue)
    val real = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_r15.json")), "UTF-8")
    val rm = BenchPrev.parse(real, Set("q151_ivf_sweep", "compact_prep"))
    assert(math.abs(rm("q151_ivf_sweep") - 1.4) < 1e-9,
      s"driver-file ds scaling: $rm")
    assert(math.abs(rm("compact_prep") - 26.9) < 1e-9, s"prep stamp: $rm")
  }

  test("full-precision rung with full names and qN short keys") {
    val content =
      """{"parsed": {"metric":"total","value":1.0,"unit":"sec",
        |"queries":{"q138_retrieval_trend":5.312,"q92":2.75,"dedup_prep":0.9},
        |"sf":"x"}}""".stripMargin
    val m = BenchPrev.parse(content, names)
    assert(m("q138_retrieval_trend") === 5.312)
    assert(m("q92_ann_recall_families") === 2.75)
    assert(m("dedup_prep") === 0.9)
    assert(!m.contains("q01_agg"))
  }

  test("failed (-1) stamps, unknown keys, and garbage are dropped, never throw") {
    val content =
      """{"parsed": {"queries": {"138": -1, "zzz": 4, "01": 7}}}"""
    val m = BenchPrev.parse(content, names)
    assert(m === Map("q01_agg" -> 7.0))
    assert(BenchPrev.parse("", names) === Map.empty)
    assert(BenchPrev.parse("{\"parsed\": null}", names) === Map.empty)
    assert(BenchPrev.parse("not json at all", names) === Map.empty)
  }

  test("braces inside string values don't move the window (ADVICE r16): " +
    "an unbalanced '}' in a neighbor key's value must not let a PREVIOUS " +
    "object's qunit leak into this object's ds detection") {
    // first object is a ds-rung line; second is full-precision but its
    // "note" value carries an unbalanced '}' — a brace-blind backward
    // scan walks past the second object's '{' into the first object and
    // reads its qunit, mis-scaling q01's 30.0s stamp to 3.0s
    val content =
      """{"qunit":"ds","queries":{"dedup_prep":10}}
        |{"note":"x } y","queries":{"q01_agg":30.0}}""".stripMargin
    val m = BenchPrev.parse(content, names)
    assert(m("q01_agg") === 30.0, s"window must stop at this object's brace: $m")
    assert(math.abs(m("dedup_prep") - 1.0) < 1e-9, "the ds object still scales")
    // the symmetric trap: an unbalanced '{' inside a string must not
    // satisfy the depth-0 stop early and clip the window BEFORE the
    // object's real qunit marker
    val content2 =
      """{"qunit":"ds","note":"x { y","queries":{"q01_agg":30}}""".stripMargin
    val m2 = BenchPrev.parse(content2, names)
    assert(math.abs(m2("q01_agg") - 3.0) < 1e-9,
      s"qunit before a braced string value must still be seen: $m2")
    // escaped quotes are string CONTENT: the quote-parity walk must not
    // treat \" as a delimiter (an odd backslash run precedes it)
    val content3 =
      """{"note":"a \" } b","qunit":"ds","queries":{"q01_agg":30}}"""
    val m3 = BenchPrev.parse(content3, names)
    assert(math.abs(m3("q01_agg") - 3.0) < 1e-9, s"escaped-quote parity: $m3")
  }

  test("inflation gate: ≥2× over prev AND ≥0.5s absolute") {
    assert(BenchPrev.inflated(10.8, Some(3.0)))
    assert(BenchPrev.inflated(10.8, Some(5.3)))   // the r13 q138 case
    assert(!BenchPrev.inflated(8.9, Some(5.3)))   // < 2×
    assert(!BenchPrev.inflated(0.45, Some(0.1)))  // sub-second noise band
    assert(BenchPrev.inflated(0.9, Some(0.25)))
    assert(!BenchPrev.inflated(10.8, None))       // new query: no baseline
    assert(!BenchPrev.inflated(10.8, Some(0.0)))  // degenerate prev
    assert(!BenchPrev.inflated(-1.0, Some(3.0)))  // failed query stays -1
  }

  test("requeue roster is ratio-ordered descending and capped LAST " +
    "(VERDICT r16 #1): the worst offenders are always adjudicated; the " +
    "r16 failure was the cap exhausting in visit order") {
    // stamps listed in a deliberately adversarial visit order: the
    // mildest mover first, the worst (q199-shaped 3.2×) last
    val stamps = Seq(
      "a_mild" -> 2.1,     // 2.1× over 1.0
      "b_gate" -> 9.0,     // 3.0× but NOT requeueable (gate/dirty)
      "c_worst" -> 3.84,   // 3.2× over 1.2 — must survive any cap ≥ 1
      "d_mid" -> 7.5,      // 2.5× over 3.0
      "e_fine" -> 1.0,     // 1.0× — no trip
      "f_new" -> 50.0)     // no baseline — no trip
    val prev = Map("a_mild" -> 1.0, "b_gate" -> 3.0, "c_worst" -> 1.2,
      "d_mid" -> 3.0, "e_fine" -> 1.0)
    val r = BenchPrev.selectRequeues(stamps, prev, _ != "b_gate", cap = 2)
    assert(r.selected === Seq("c_worst", "d_mid"),
      s"worst inflation first, cap applied after the sort: $r")
    assert(r.skipped === Seq("a_mild") && r.capHit)
    // uncapped: all three trip-line movers, still ratio-ordered
    val r2 = BenchPrev.selectRequeues(stamps, prev, _ != "b_gate", cap = 12)
    assert(r2.selected === Seq("c_worst", "d_mid", "a_mild") && !r2.capHit)
    // equal ratios tie-break by name for a deterministic roster
    val tied = Seq("z_t" -> 4.0, "y_t" -> 4.0)
    val rt = BenchPrev.selectRequeues(tied,
      Map("z_t" -> 2.0, "y_t" -> 2.0), _ => true, cap = 1)
    assert(rt.selected === Seq("y_t") && rt.skipped === Seq("z_t"))
  }

  test("loadIndexOf parses the UNESCAPED stamp only, and normFactor " +
    "clamps sub-1.0 and failed indices to 1 (VERDICT r19 #4)") {
    assert(BenchPrev.loadIndexOf(
      """{"value":1.0,"load_index":1.62,"queries":{}}""") === Some(1.62))
    // the driver file's escaped stdout copy must not match
    assert(BenchPrev.loadIndexOf(
      "{\"wrapped\":\"{\\\"load_index\\\":9.99}\"}") === None)
    assert(BenchPrev.loadIndexOf("no index here") === None)
    assert(BenchPrev.normFactor(Some(2.4)) === 2.4)
    assert(BenchPrev.normFactor(Some(0.8)) === 1.0)   // load only inflates
    assert(BenchPrev.normFactor(Some(-1.0)) === 1.0)  // canary failed
    assert(BenchPrev.normFactor(None) === 1.0)
  }

  test("normalized mover selection (VERDICT r19 #4): a wholesale " +
    "~2.1x-inflated LOADED run trips no phantom movers once divided by " +
    "its canary factor; a genuine mover still trips through the " +
    "normalization; and a loaded BASELINE normalizes down so a real " +
    "regression against it is seen") {
    val prev = Map("q1_a" -> 2.0, "q2_b" -> 3.0)
    val stamps = Seq("q1_a" -> 4.2, "q2_b" -> 6.3) // the r19 q208 shape
    // raw comparison manufactures two phantom movers
    assert(BenchPrev.selectRequeues(stamps, prev, _ => true, 12)
      .selected.size === 2)
    // normalized by this run's 2.2 canary factor: nothing moved
    assert(BenchPrev.selectRequeues(stamps, prev, _ => true, 12,
      curNorm = 2.2).selected.isEmpty)
    // a genuine 5x mover still trips through the same normalization
    val withReal = stamps :+ ("q3_c" -> 33.0)
    val prev3 = prev + ("q3_c" -> 3.0)
    assert(BenchPrev.selectRequeues(withReal, prev3, _ => true, 12,
      curNorm = 2.2).selected === Seq("q3_c"))
    // a baseline stamped under 4x load normalizes DOWN: a quiet 4.2s
    // against its raw 8.0s is a real 2.1x regression
    assert(BenchPrev.selectRequeues(Seq("q1_a" -> 4.2),
      Map("q1_a" -> 8.0), _ => true, 12).selected.isEmpty)
    assert(BenchPrev.selectRequeues(Seq("q1_a" -> 4.2),
      Map("q1_a" -> 8.0), _ => true, 12,
      prevNorm = 4.0).selected === Seq("q1_a"))
  }
}
