package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts._
import graft.ts.RangeQuery.RangeArgs

/** TWA golden values from the reference's own flow tests
  * (reference: tests/flow/test_ts_range.py:278-470, test_agg_twa):
  * TS.RANGE key 10 20 AGGREGATION twa 10 over hand-built series.
  * These exercise the subtle range semantics: boundary interpolation
  * uses neighbouring samples OUTSIDE [from, to]. */
class TwaGoldenSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def twa(points: (Long, Double)*): Seq[(Long, Double)] = {
    val df = points.map { case (t, v) => ("k", t, v) }.toDF("series", "ts", "value")
    RangeQuery.range(df, RangeArgs(from = Some(10L), to = Some(20L),
      aggs = Seq("twa"), bucketMs = 10L))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
  }

  private def close(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("case 1: neighbours on both sides of the range") {
    // samples 8,9,10,13,14,23 (v == t); expected from the reference's
    // hand computation with ta=10, tb=20
    val (v1, v2, v3, v4, v5) = (9.0, 10.0, 13.0, 14.0, 23.0)
    val (t1, t2, t3, t4, t5) = (9.0, 10.0, 13.0, 14.0, 23.0)
    val (ta, tb) = (10.0, 20.0)
    val va = v1 + (v2 - v1) * (ta - t1) / (t2 - t1)
    val vb = v4 + (v5 - v4) * (tb - t4) / (t5 - t4)
    val s = (va + v2) * (t2 - ta) + (v2 + v3) * (t3 - t2) + (v3 + v4) * (t4 - t3) + (vb + v4) * (tb - t4)
    val expected = s / (2 * (tb - ta))
    val got = twa(8L -> 8.0, 9L -> 9.0, 10L -> 10.0, 13L -> 13.0, 14L -> 14.0, 23L -> 23.0)
    assert(got.map(_._1) == Seq(10L))
    assert(close(got.head._2, expected), s"got ${got.head._2} expected $expected")
  }

  test("case 2: prev neighbour before range start, next after range end") {
    val (v1, v2, v3, v4) = (9.0, 13.0, 14.0, 23.0)
    val (t1, t2, t3, t4) = (9.0, 13.0, 14.0, 23.0)
    val (ta, tb) = (10.0, 20.0)
    val va = v1 + (v2 - v1) * (ta - t1) / (t2 - t1)
    val vb = v3 + (v4 - v3) * (tb - t3) / (t4 - t3)
    val s = (va + v2) * (t2 - ta) + (v2 + v3) * (t3 - t2) + (vb + v3) * (tb - t3)
    val expected = s / (2 * (tb - ta))
    val got = twa(8L -> 8.0, 9L -> 9.0, 13L -> 13.0, 14L -> 14.0, 23L -> 23.0)
    assert(got.map(_._1) == Seq(10L) && close(got.head._2, expected))
  }

  test("case 7: sparse series, interpolation from both sides") {
    val (v1, v2, v3) = (9.0, 13.0, 22.0)
    val (t1, t2, t3) = (9.0, 13.0, 22.0)
    val (ta, tb) = (10.0, 20.0)
    val va = v1 + (v2 - v1) * (ta - t1) / (t2 - t1)
    val vb = v2 + (v3 - v2) * (tb - t2) / (t3 - t2)
    val s = (va + v2) * (t2 - ta) + (vb + v2) * (tb - t2)
    val expected = s / (2 * (tb - ta))
    val got = twa(3L -> 3.0, 9L -> 9.0, 13L -> 13.0, 22L -> 22.0)
    assert(got.map(_._1) == Seq(10L) && close(got.head._2, expected))
  }

  test("case 9: no sample before range — interval starts at first sample") {
    val (v1, v2) = (13.0, 28.0)
    val (t1, t2) = (13.0, 28.0)
    val tb = 20.0
    val vb = v1 + (v2 - v1) * (tb - t1) / (t2 - t1)
    val expected = (v1 + vb) * (tb - t1) / (2.0 * (tb - t1))
    val got = twa(13L -> 13.0, 28L -> 28.0)
    assert(got.map(_._1) == Seq(10L) && close(got.head._2, expected))
  }

  test("reverse range produces identical buckets") {
    val df = Seq(("k", 8L, 8.0), ("k", 9L, 9.0), ("k", 13L, 13.0), ("k", 14L, 14.0), ("k", 23L, 23.0))
      .toDF("series", "ts", "value")
    val fwd = RangeQuery.range(df, RangeArgs(Some(10L), Some(20L), Seq("twa"), 10L))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val rev = RangeQuery.range(df, RangeArgs(Some(10L), Some(20L), Seq("twa"), 10L, reverse = true))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(fwd == rev)
  }
}
