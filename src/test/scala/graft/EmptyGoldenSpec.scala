package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ts.RangeQuery
import graft.ts.RangeQuery.RangeArgs

/** EMPTY gap-fill golden values from the reference flow tests
  * (reference: tests/flow/test_ts_range.py test_empty and
  * test_empty_gap_fill_prefix_suffix_whole_range). */
class EmptyGoldenSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private val t1 = Seq((15L, 1.0), (17L, 4.0), (51L, 3.0), (73L, 5.0), (75L, 3.0))
  private val ab = Seq((10L, 100.0), (20L, 110.0))

  private def run(points: Seq[(Long, Double)], from: Long, to: Long,
      agg: String, bucket: Long): Seq[(Long, Double)] = {
    val df = points.map { case (t, v) => ("k", t, v) }.toDF("series", "ts", "value")
    RangeQuery.range(df, RangeArgs(Some(from), Some(to), Seq(agg), bucket, empty = true))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
  }

  private def eq(got: Seq[(Long, Double)], exp: Seq[(Long, Double)]): Unit = {
    assert(got.map(_._1) == exp.map(_._1), s"buckets: got $got expected $exp")
    got.zip(exp).foreach { case ((_, g), (_, e)) =>
      if (e.isNaN) assert(g.isNaN, s"got $got expected $exp")
      else assert(g == e, s"got $got expected $exp")
    }
  }

  test("interior gaps: max fills NaN") {
    eq(run(t1, 0, 100, "max", 10), Seq(10L -> 4.0, 20L -> Double.NaN, 30L -> Double.NaN,
      40L -> Double.NaN, 50L -> 3.0, 60L -> Double.NaN, 70L -> 5.0))
  }

  test("interior gaps: last does LOCF") {
    eq(run(t1, 0, 100, "last", 10), Seq(10L -> 4.0, 20L -> 4.0, 30L -> 4.0,
      40L -> 4.0, 50L -> 3.0, 60L -> 3.0, 70L -> 3.0))
  }

  test("interior gaps: sum fills 0") {
    eq(run(t1, 0, 100, "sum", 10), Seq(10L -> 5.0, 20L -> 0.0, 30L -> 0.0,
      40L -> 0.0, 50L -> 3.0, 60L -> 0.0, 70L -> 8.0))
  }

  test("two-sample series over exact range") {
    eq(run(Seq((10L, 1.0), (30L, 4.0)), 0, 30, "max", 10),
      Seq(10L -> 1.0, 20L -> Double.NaN, 30L -> 4.0))
  }

  test("case 3: whole query range is a gap -> all buckets LOCF from before-range sample") {
    eq(run(ab, 11, 16, "last", 1), (11L to 16L).map(_ -> 100.0))
  }

  test("case 4: buckets before the first-ever sample are dropped") {
    eq(run(ab, 8, 12, "last", 1), Seq(10L -> 100.0, 11L -> 100.0, 12L -> 100.0))
  }

  test("case 5: leading gap fills, buckets after last-ever sample dropped") {
    eq(run(ab, 18, 22, "last", 1), Seq(18L -> 100.0, 19L -> 100.0, 20L -> 110.0))
  }

  test("case 3 with sum: whole-gap range fills zeros") {
    eq(run(ab, 11, 16, "sum", 1), (11L to 16L).map(_ -> 0.0))
  }
}
