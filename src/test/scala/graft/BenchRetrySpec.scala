package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's contention-outlier retry rule (VERDICT r12 #2):
  * a >3× rep spread is the measured signature of a transient host
  * contention window (normal spread is ±30%), the query re-runs after
  * the sweep, and the better median is the official number. Pure
  * functions — the spec pins the decision logic the timing loop uses. */
class BenchRetrySpec extends AnyFunSuite {

  test("needsRetry fires on the contention signature only") {
    // normal host noise (±30%) stays put
    assert(!Bench.needsRetry(Seq(1.0, 1.2, 1.3)))
    assert(!Bench.needsRetry(Seq(0.8, 1.0, 1.05)))
    // exactly at the factor: not an outlier (strict >)
    assert(!Bench.needsRetry(Seq(1.0, 2.0, 3.0)))
    // the r12 incident shape: one rep 12.9x the others
    assert(Bench.needsRetry(Seq(3.7, 4.0, 47.7)))
    assert(Bench.needsRetry(Seq(0.4, 0.41, 4.4)))
    // one rep has no spread to judge (SPARK_GRAFT_REPS=1)
    assert(!Bench.needsRetry(Seq(5.0)))
    assert(!Bench.needsRetry(Nil))
    // a zero min means the timer broke, not the host — no ratio
    assert(!Bench.needsRetry(Seq(0.0, 10.0)))
  }

  test("median is the upper order statistic the suite reports") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0)) == 4.0) // even count: upper
    assert(Bench.median(Seq(7.0)) == 7.0)
  }

  test("betterMedian takes the smaller sweep — contention only inflates") {
    // first sweep poisoned (median 4.0), clean retry (median 1.1)
    assert(Bench.betterMedian(Seq(1.0, 4.0, 40.0), Seq(1.0, 1.1, 1.2)) == 1.1)
    // retry slower than the original (host got busy later): keep first
    assert(Bench.betterMedian(Seq(1.0, 1.1, 1.2), Seq(2.0, 2.1, 2.2)) == 1.1)
  }

  test("retryPick caps the refine worklist at topK, worst spread first") {
    val spreads = Seq("a" -> 4.0, "b" -> 112.0, "c" -> 3.5, "d" -> 9.0)
    // worst-first ordering
    assert(Bench.retryPick(spreads, topK = 4) == Seq("b", "d", "a", "c"))
    // the cap drops the mildest spreads, never the worst (the r16
    // timeout re-ran 19 flagged queries serially with no cap)
    assert(Bench.retryPick(spreads, topK = 2) == Seq("b", "d"))
    assert(Bench.retryPick(Nil) == Nil)
  }

  test("baseline guard: quiet host + in-band ratio only (VERDICT r16 #2)") {
    // the r16 contamination shape: load 2.11 at sweep start
    assert(!Bench.baselineGuardOk(2.11, Some(1.0)))
    // clean host, ratio within host noise: refresh allowed
    assert(Bench.baselineGuardOk(0.4, Some(1.05)))
    assert(Bench.baselineGuardOk(1.49, Some(0.85)))
    assert(Bench.baselineGuardOk(0.4, Some(1.15)))
    // out-of-band ratio on a quiet host: a real shift — do not
    // silently re-anchor (that is what SPARK_GRAFT_BASELINE_FORCE is
    // for, after a human decided the shift is legitimate)
    assert(!Bench.baselineGuardOk(0.4, Some(1.37)))
    assert(!Bench.baselineGuardOk(0.4, Some(0.7)))
    // bootstrap (no committed anchor at this sf): load is the only gate
    assert(Bench.baselineGuardOk(0.4, None))
    assert(!Bench.baselineGuardOk(3.0, None))
    // platform hides loadavg (-1): load check passes, ratio still gates
    assert(Bench.baselineGuardOk(-1.0, Some(1.0)))
    assert(!Bench.baselineGuardOk(-1.0, Some(1.37)))
  }
}
