package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench stdout compact-line contract (VERDICT r15 item 8).
  *
  * The driver keeps only the LAST 2000 stdout chars; BENCH_r12–r14 all
  * parsed null because the full JSON line (four per-query maps per
  * gate) overflowed that window. This spec rebuilds the compact line
  * from the SAME format strings main() uses, at the worst-case shape —
  * all three gates present (sf1 + opt-in sf3 + sf10), every headline
  * query in every map, committed-baseline fields present — and asserts
  * it stays inside the window with headroom, so a future per-gate
  * field addition can't silently null BENCH_r{N} again.
  */
class BenchCompactLineSpec extends AnyFunSuite {

  private def fmt(m: Seq[(String, Double)]): String =
    m.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")

  /** A gate JSON string in interleavedGate's exact field order, with
    * every headline query present in all four per-query maps.
    */
  private def gateJson(): String = {
    val qs = Bench.headline.map { case (n, _) => n -> 123.4567 }
    val committedField =
      s""","baseline_total_sec":123.4567,"ratio_raw":12.3456,"ratios":${fmt(qs)}"""
    val liveField =
      s""","baseline_live":${fmt(qs)},"baseline_live_total_sec":123.4567,"ratio_live":12.3456,"ratios_live":${fmt(qs)}"""
    s"""{"queries":${fmt(qs)},"total_sec":123.4567$committedField$liveField,"rounds":5,"shuffle_width":512,"load1_before":10.00,"load1_gate":10.00,"load_gate_ok":false,"load1_after":10.00,"ext_cores":[12.34,12.34,12.34,12.34,12.34],"dirty_rounds":10,"ext_gate":1.00}"""
  }

  test("stripMaps removes exactly the per-query maps, keeping scalars") {
    val stripped = Bench.stripMaps(gateJson(), Bench.StrippedMapKeys)
    Bench.StrippedMapKeys.foreach { k =>
      assert(!stripped.contains("\"" + k + "\":{"), s"map $k survived")
    }
    for (f <- Seq("total_sec", "ratio_raw", "ratio_live", "rounds",
        "shuffle_width", "load_gate_ok", "baseline_live_total_sec"))
      assert(stripped.contains("\"" + f + "\""), s"scalar $f lost")
    // still balanced JSON-ish braces (no dangling ",}" artifacts)
    assert(!stripped.contains(",}"))
    assert(stripped.count(_ == '{') == stripped.count(_ == '}'))
  }

  test("LoadProbe: own CPU is self, an unreaped busy child reads as external") {
    assume(Bench.LoadProbe.snapshot() != null, "/proc not available")
    def window(burnSelf: Boolean): Double = {
      val s = Bench.LoadProbe.snapshot()
      val w = System.nanoTime()
      if (burnSelf) {
        val stopAt = w + 1200000000L
        var x = 0L
        while (System.nanoTime() < stopAt) { x += 1 } // in-process burn
      } else Thread.sleep(1200)
      Bench.LoadProbe.externalCores(
        s, Bench.LoadProbe.snapshot(), (System.nanoTime() - w) / 1e9)
    }
    // deltas against an adjacent ambient window, so a busy host (the
    // round driver, the sbt server JVM's own log streaming) shifts both
    // sides instead of failing; retried — ambient noise between windows
    // can swamp one attempt
    var ok = false
    var detail = ""
    var attempt = 0
    while (!ok && attempt < 3) {
      attempt += 1
      val ambient = window(burnSelf = false)
      // 1. burning a core IN-PROCESS must not raise the external reading
      val selfBurn = window(burnSelf = true)
      // 2. a spawned, UNREAPED child burning a core IS external (the
      // contaminated-window simulation — BENCH_r16's artifact class)
      val child = new ProcessBuilder("sh", "-c",
        "while :; do :; done").start()
      val withChild =
        try { Thread.sleep(200); window(burnSelf = false) }
        finally child.destroyForcibly()
      ok = selfBurn < ambient + 0.6 && withChild > ambient + 0.5
      detail = s"ambient=$ambient selfBurn=$selfBurn withChild=$withChild"
    }
    assert(ok, s"LoadProbe failed to discriminate in 3 attempts: $detail")
  }

  test("worst-case compact line fits the driver's 2000-char window") {
    val results = Bench.headline.map { case (n, _) => n -> 123.4567 }
    val floorAdjField =
      s""","queries_floor_adj":${fmt(results)}"""
    val gates = Seq("sf1", "sf3", "sf10").map { g =>
      s""","$g":${Bench.stripMaps(gateJson(), Bench.StrippedMapKeys)}"""
    }.mkString
    val compactLine =
      s"""{"metric":"total","value":123.4567,"unit":"sec","queries":${fmt(results)},"total_static_sec":123.4567,"floor_sec":123.4567$floorAdjField$gates,"sf":"/root/testdata/sf0.1"}"""
    // 2000 is the driver window; demand ≥200 chars of headroom so a
    // couple of added scalar fields still fit before this trips.
    assert(compactLine.length <= 1800,
      s"compact line ${compactLine.length} chars — too close to the 2000-char driver window")
  }

  test("compact line is single-line STRICT JSON (r19 driver parse contract)") {
    // r19 (VERDICT r18 item 2): beyond fitting the window, the line must
    // actually PARSE — build.sbt's StdoutOutput + the post-spark.stop()
    // println put it bare at column 0 as the last stdout line; this test
    // pins that what is printed there is strict JSON with the contract
    // fields, so a future formatting slip can't null BENCH_r{N} again.
    val results = Bench.headline.map { case (n, _) => n -> 123.4567 }
    val floorAdjField = s""","queries_floor_adj":${fmt(results)}"""
    val gates = Seq("sf1", "sf3", "sf10").map { g =>
      s""","$g":${Bench.stripMaps(gateJson(), Bench.StrippedMapKeys)}"""
    }.mkString
    val compactLine =
      s"""{"metric":"total","value":123.4567,"unit":"sec","queries":${fmt(results)},"total_static_sec":123.4567,"floor_sec":123.4567$floorAdjField$gates,"sf":"/root/testdata/sf0.1"}"""
    assert(!compactLine.contains("\n") && !compactLine.contains("\r"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    val node = mapper.readTree(compactLine)
    assert(node.get("metric").asText() === "total")
    assert(node.get("value").isNumber && node.get("unit").asText() === "sec")
    assert(node.get("queries").isObject
      && node.get("queries").size() === Bench.headline.size)
    assert(node.get("sf1").get("ratio_live").isNumber)
    assert(node.get("sf10").get("total_sec").isNumber)
  }
}
