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
    // the r15 settle pattern (first rep 2x+, rest at the median).
    // disperse stays quiet: a settled cold entry's median is sound.
    assert(Bench.suspectReasons(1.0, Seq(2.4, 1.0, 0.9), 0, Nil) == Seq("settle"))
    // first rep high but the tail ALSO swings -> not a cold entry;
    // >2x scatter under the 3x widening threshold is exactly the
    // disperse band (widening never re-ran it, settle can't explain it)
    assert(Bench.suspectReasons(1.0, Seq(2.4, 1.6, 1.0), 0, Nil) == Seq("disperse"))
    // steady rows never fire
    assert(Bench.suspectReasons(1.0, Seq(1.1, 1.0, 1.0), 0, Nil).isEmpty)
  }

  test("disperse: scattered reps with no settle pattern fire (r16 blind spot)") {
    // the motivating BENCH_r16 row verbatim: q_lexical_diversity reps
    // [15.9, 6.6, 19.0], median 15.9 — first rep == median so settle
    // can't fire, gc share 3% — yet a quiet re-time read 0.322 s. The
    // 2x max/min ratio brands it.
    assert(Bench.suspectReasons(15.9, Seq(15.9, 6.6, 19.0), 1400, Nil) == Seq("disperse"))
    // boundary: exactly 2x does not fire; just above does
    assert(Bench.suspectReasons(1.5, Seq(2.0, 1.0, 1.5), 0, Nil).isEmpty)
    assert(Bench.suspectReasons(1.5, Seq(2.01, 1.0, 1.5), 0, Nil) == Seq("disperse"))
    // sub-noise-floor rows never fire: min is floored at 0.05 s so
    // microsecond-scale jitter on fast rows can't brand them
    assert(Bench.suspectReasons(0.03, Seq(0.03, 0.02, 0.08), 0, Nil).isEmpty)
    assert(Bench.suspectReasons(0.11, Seq(0.11, 0.04, 0.12), 0, Nil) == Seq("disperse"))
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
