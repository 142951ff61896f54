package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench re-time suspect selection (Bench.pickSuspects) — the
  * round-10 history gate (tightened to a 2× tier for >2 s baselines in
  * round 11) plus the throttle gate, now attributed per probe WINDOW.
  * These rules are what keep driver-side BENCH_r{N} per-query
  * attribution honest on a noisy host, so they get a direct unit pin. */
class BenchGateSpec extends AnyFunSuite {

  private val base = Map("q_a" -> 1.0, "q_b" -> 0.2, "q_c" -> 2.0)
  private val quiet: String => Boolean = _ => false
  private val noisy: String => Boolean = _ => true

  test("no baseline and no throttled window selects nothing") {
    assert(Bench.pickSuspects(
      Seq("q_a" -> 9.0, "q_x" -> 50.0), Map.empty, quiet) ==
      (Seq.empty, 0))
  }

  test("history gate: >3x baseline AND >0.5s for sub-2s baselines") {
    val fp = Seq(
      "q_a" -> 3.5,  // 3.5x of 1.0 -> suspect
      "q_b" -> 0.4,  // 2.0x of 0.2 and under the 0.5s floor -> no
      "q_c" -> 3.9,  // 1.95x of 2.0 (2x tier applies, not met) -> no
      "q_x" -> 50.0) // no baseline -> no
    assert(Bench.pickSuspects(fp, base, quiet) == (Seq("q_a"), 1))
  }

  test("history gate floor lowered to 0.5s: a 3x sub-second excursion re-times") {
    // r12's blind spot: q_source_proto_nested read 0.71 s vs a 0.23 s
    // min (3.02x) and sat under the old 1 s floor, never re-timed.
    val fp = Seq("q_b" -> 0.71)   // 3.55x of 0.2, over the 0.5 s floor
    assert(Bench.pickSuspects(fp, base, quiet) == (Seq("q_b"), 1))
  }

  test("history gate tightens to 2x for baselines over 2s") {
    // BENCH_r10's blind spot: q_stream_retract_hist read 6.83 s vs a
    // 4.15 s baseline (1.64x) and sat under the old single 3x trigger.
    val b = Map("q_slow" -> 4.15, "q_edge" -> 2.0)
    val fp = Seq(
      "q_slow" -> 8.7,  // 2.1x of 4.15 -> suspect under the 2x tier
      "q_edge" -> 5.9)  // baseline exactly 2.0 keeps the 3x tier -> no
    assert(Bench.pickSuspects(fp, b, quiet) == (Seq("q_slow"), 1))
  }

  test("history picks the largest ABSOLUTE excess first, capped at 10") {
    val baseline = (1 to 15).map(i => s"q_$i" -> 1.0).toMap
    // q_15 has the largest excess, descending from there
    val fp = (1 to 15).map(i => s"q_$i" -> (3.1 + i))
    val (sus, n) = Bench.pickSuspects(fp, baseline, quiet)
    assert(n == 10 && sus.size == 10)
    assert(sus.head == "q_15" && sus.last == "q_6")
  }

  test("throttle gate: 10 slowest over 3s, even without baselines") {
    val fp = (1 to 12).map(i => s"q_$i" -> (2.0 + i)) // q_2..q_12 > 3s
    val (sus, n) = Bench.pickSuspects(fp, Map.empty, noisy)
    assert(n == 0)
    assert(sus.size == 10 && sus.head == "q_12" && !sus.contains("q_1"))
  }

  test("throttle gate is per window: only queries inside it are suspect") {
    val fp = Seq("q_in" -> 9.0, "q_out" -> 50.0)
    val (sus, n) = Bench.pickSuspects(fp, Map.empty, Set("q_in"))
    assert(n == 0 && sus == Seq("q_in"))
  }

  test("identical gate picks dedup to one set") {
    val baseline = (1 to 20).map(i => s"q_$i" -> 1.0).toMap
    val fp = (1 to 20).map(i => s"q_$i" -> (3.1 + i))
    val (sus, n) = Bench.pickSuspects(fp, baseline, noisy)
    // throttle's 10 slowest and history's 10 largest-excess coincide
    assert(n == 10 && sus.size == 10 && sus.head == "q_20")
  }

  test("disjoint gate picks union up to the cap of 12") {
    // throttle takes the 10 slowest (q_12..q_3); only q_1/q_2 carry
    // baselines, so history contributes exactly those two
    val baseline = Map("q_1" -> 1.0, "q_2" -> 1.0)
    val fp = (1 to 12).map(i => s"q_$i" -> (3.1 + i))
    val (sus, n) = Bench.pickSuspects(fp, baseline, noisy)
    assert(n == 2)
    assert(sus.size == 12 && sus.distinct.size == 12)
    assert(sus.contains("q_1") && sus.contains("q_2"))
  }

  test("baseline parsing tolerates a missing file") {
    // loadBaseline is exercised implicitly by Bench runs; here we only
    // pin that pickSuspects treats an empty map as no history gate.
    assert(Bench.pickSuspects(Seq("q_a" -> 100.0), Map.empty, quiet) ==
      (Seq.empty, 0))
  }

  test("core-basis gate: mismatched or missing basis disables history") {
    // r17's false-red class: mins seeded at the 4-core default read
    // 2-3x hot against a 32-core run (q_stream_cep_skip_past). The
    // baseline records its basis once; any other run basis — or a
    // legacy file without one — gets no history gate at all.
    val b = Map("_basis_cpus" -> 32.0, "q_a" -> 1.0)
    assert(Bench.basisGated(b, 32) == Map("q_a" -> 1.0)) // match: gated
    assert(Bench.basisGated(b, 4).isEmpty)               // mismatch: off
    assert(Bench.basisGated(Map("q_a" -> 1.0), 32).isEmpty) // legacy: off
    assert(Bench.basisGated(Map.empty, 32).isEmpty)      // no file: off
    // end to end: the 4-core run must not select q_a even at 3.5x
    assert(Bench.pickSuspects(Seq("q_a" -> 3.5),
      Bench.basisGated(b, 4), quiet) == (Seq.empty, 0))
  }

  test("baseline min edits carry their seeding readings (ledger discipline)") {
    // The committed workflow seeds a bench_baseline.json min only from
    // two AGREEING quiet first-pass full-run readings; this was prose
    // until r22. Mechanical form: every baseline key is either frozen
    // in the ledger's _legacy list (value carried from rounds <= 21) or
    // maps to its seeding readings — >= 2 of them, within 10% of each
    // other, whose min IS the committed value. Editing a min without
    // recording its readings (or while leaving the key in _legacy with
    // a changed value impossible to distinguish — hence the exact-cover
    // check) fails here.
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val om = new ObjectMapper()
    val baseline = om.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "bench_baseline.json")))
    val ledger = om.readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "bench_baseline_readings.json")))
    val mins = baseline.properties().asScala
      .map(e => e.getKey -> e.getValue.asDouble())
      .toMap - "_basis_cpus"
    val legacy = ledger.get("_legacy").elements().asScala
      .map(_.asText()).toSet
    val seeded = ledger.properties().asScala.map(_.getKey)
      .filterNot(_.startsWith("_")).toSet
    assert(legacy.intersect(seeded).isEmpty,
      s"keys both legacy and seeded: ${legacy.intersect(seeded)}")
    val covered = legacy ++ seeded
    assert(mins.keySet == covered,
      s"uncovered mins: ${mins.keySet -- covered}; " +
        s"stale ledger keys: ${covered -- mins.keySet}")
    seeded.foreach { k =>
      val rs = ledger.get(k).elements().asScala.map(_.asDouble()).toSeq
      assert(rs.size >= 2, s"$k: a fresh min needs >= 2 quiet readings")
      assert(rs.max <= 1.10 * rs.min + 1e-9,
        s"$k: readings disagree beyond 10%: $rs")
      assert(math.abs(rs.min - mins(k)) < 1e-9,
        s"$k: committed min ${mins(k)} != min of readings ${rs.min}")
    }
  }

  test("window throttle rule: under 40 MB/s or halved across the window") {
    assert(Bench.windowThrottled(120.0, 35.0))  // ceiling
    assert(Bench.windowThrottled(35.0, 120.0))  // ceiling, entering quiet
    assert(Bench.windowThrottled(120.0, 55.0))  // halved, entering throttle
    assert(Bench.windowThrottled(55.0, 120.0))  // halved, LEAVING throttle
                                                // above the 40 floor (r11
                                                // advice: symmetric rule)
    assert(!Bench.windowThrottled(120.0, 90.0)) // ordinary drift
    assert(!Bench.windowThrottled(90.0, 120.0)) // ordinary drift, rising
    assert(!Bench.windowThrottled(-1.0, 30.0))  // failed probe: no verdict
    assert(!Bench.windowThrottled(30.0, -1.0))
  }
}
