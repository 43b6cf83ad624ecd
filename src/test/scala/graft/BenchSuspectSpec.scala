package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-row environment-inflation verdict
  * ([[Bench.suspectReasons]], r15 verdict item 3). The thresholds are
  * calibrated on the recorded artifacts that motivated the flag:
  * r14's q_sim_ivf_pq driver row (6.845 s median in a contended window,
  * settle-pattern reps) and the r15 356 s calibration run whose canary
  * read quiet — in both, a reader had to compose gc/build/rep signals
  * by hand; the flag composes them mechanically. A deliberately
  * GC-hammered in-spec bench would be flaky by construction, so the
  * verdict is a pure function of one row's collected signals and the
  * firing conditions are pinned here exactly. */
class BenchSuspectSpec extends AnyFunSuite {

  test("clean row: steady reps, negligible GC, warm index -> no suspicion") {
    assert(Bench.suspectReasons(1.0, Seq(1.05, 1.0, 0.98), gcMsTotal = 120, built = Nil).isEmpty)
  }

  test("gc: collector-dominated reps fire, boundary is half the median per rep") {
    // 3 reps, median 1.0 s: >1500 ms total GC = >0.5 s/rep -> fires
    assert(Bench.suspectReasons(1.0, Seq(1.2, 1.0, 0.9), 1600, Nil) == Seq("gc"))
    assert(Bench.suspectReasons(1.0, Seq(1.2, 1.0, 0.9), 1400, Nil).isEmpty)
  }

  test("settle: cold first rep with settled tail fires; a noisy tail does not") {
    // the r15 settle pattern (first rep 2x+, rest at the median)
    assert(Bench.suspectReasons(1.0, Seq(2.4, 1.0, 0.9), 0, Nil) == Seq("settle"))
    // first rep high but the tail ALSO swings -> ambient noise, not a
    // cold entry; the adaptive widening handles it, not this flag
    assert(Bench.suspectReasons(1.0, Seq(2.4, 1.6, 1.0), 0, Nil).isEmpty)
    // steady rows never fire
    assert(Bench.suspectReasons(1.0, Seq(1.1, 1.0, 1.0), 0, Nil).isEmpty)
  }

  test("built: an index build inside a timed rep always marks the row") {
    assert(Bench.suspectReasons(1.0, Seq(1.0, 1.0, 1.0), 0, Seq("pairs_v3")) == Seq("built"))
  }

  test("reasons compose and failed/degenerate rows never flag") {
    assert(Bench.suspectReasons(1.0, Seq(2.5, 1.0, 1.0), 1600, Seq("idx")) ==
      Seq("gc", "settle", "built"))
    assert(Bench.suspectReasons(-1.0, Seq(2.5, 1.0), 99999, Seq("idx")).isEmpty)
    assert(Bench.suspectReasons(1.0, Nil, 99999, Nil).isEmpty)
  }
}
