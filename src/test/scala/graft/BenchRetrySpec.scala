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
}
