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
}
