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
}
