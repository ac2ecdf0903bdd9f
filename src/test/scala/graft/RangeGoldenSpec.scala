package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._
import graft.ts.RangeQuery.RangeArgs

/** More golden vectors from the reference flow tests:
  * BUCKETTIMESTAMP (test_ts_range.py test_bucket_timestamp), multi-agg
  * (test_ts_multi_agg.py), GROUPBY/REDUCE (test_ts_mrange_groupby.py
  * test_groupby_reduce), LATEST (test_ts_range.py
  * test_latest_flag_range). */
class RangeGoldenSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def t1 = Seq((15L, 1.0), (17L, 4.0), (51L, 3.0), (73L, 5.0), (75L, 3.0))
    .map { case (t, v) => ("k", t, v) }.toDF("series", "ts", "value")

  test("BUCKETTIMESTAMP start/mid/end, reported ts may exceed the range") {
    def run(to: Long, mode: String) =
      RangeQuery.range(t1, RangeArgs(Some(0L), Some(to), Seq("max"), 10L, bucketTs = mode))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(run(100L, "-") == Seq((10L, 4.0), (50L, 3.0), (70L, 5.0)))
    assert(run(74L, "~") == Seq((15L, 4.0), (55L, 3.0), (75L, 5.0)))
    assert(run(74L, "+") == Seq((20L, 4.0), (60L, 3.0), (80L, 5.0)))
  }

  test("multi-agg returns one column per aggregator in one pass") {
    val s = ((0 until 10).map(i => ("k", 1000L + i, 100.0 + i)) ++
      (0 until 10).map(i => ("k", 2000L + i, 200.0 + i))).toDF("series", "ts", "value")
    val got = RangeQuery.range(s, RangeArgs(aggs = Seq("min", "max", "avg"), bucketMs = 1000L))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1000L, 100.0, 109.0, 104.5), (2000L, 200.0, 209.0, 204.5)))
  }

  test("GROUPBY label REDUCE max over raw samples (reference golden)") {
    val samples = Seq(("s1", 1L, 100.0), ("s1", 2L, 95.0), ("s2", 2L, 55.0), ("s3", 2L, 40.0))
      .toDF("series", "ts", "value")
    val labels = Seq(
      ("s1", Map("metric_family" -> "cpu", "metric_name" -> "user")),
      ("s2", Map("metric_family" -> "cpu", "metric_name" -> "user")),
      ("s3", Map("metric_family" -> "cpu", "metric_name" -> "system")))
      .toDF("series", "labels")
    val got = Multi.mrangeGroupBy(samples, labels,
      Seq(Multi.parsePred("metric_family=cpu")), RangeArgs(),
      groupByLabel = "metric_name", reducer = "max")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("metric_name=system", 2L, 40.0),
      ("metric_name=user", 1L, 100.0),
      ("metric_name=user", 2L, 95.0)))
  }

  test("ALIGN sentinels anchor buckets at query start/end (reference pattern)") {
    // mirrors reference test_aggreataion_alignment: 1200 samples at
    // start+i, count agg 60 aligned at start -> full buckets of 60
    val start = 1511885909L
    val n = 1200
    val s = (0 until n).map(i => ("k", start + i, i.toDouble)).toDF("series", "ts", "value")
    def counts(align: String, from: Option[Long], to: Option[Long]) = {
      val a = RangeQuery.resolveAlign(align, from, to)
      RangeQuery.range(s, RangeArgs(from = from, to = to, aggs = Seq("count"),
        bucketMs = 60L, alignMs = a))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    }
    val atStart = counts("start", Some(start), None)
    assert(atStart.head == (start, 60L) && atStart.size == 20 &&
      atStart.forall(_._2 == 60L))
    assert(counts("-", Some(start), None) == atStart)
    val specific = counts((start + 50).toString, None, None)
    assert(specific.map(_._2).sum == n && specific.head._1 == start + 50 - 60)
    val endTs = start + n - 1
    val atEnd = counts("end", None, Some(endTs))
    assert(atEnd == counts("+", None, Some(endTs)))
    assert(atEnd.map(_._2).sum == n)
    intercept[IllegalArgumentException](RangeQuery.resolveAlign("start", None, None))
  }

  test("LATEST flag on a compaction dest (reference golden)") {
    val src = Seq(("t1", 1L, 1.0), ("t1", 2L, 3.0), ("t1", 11L, 7.0), ("t1", 13L, 1.0))
      .toDF("series", "ts", "value")
    val rule = Compaction.Rule("sum", 10L)
    def vals(df: org.apache.spark.sql.DataFrame, from: Long, to: Long) =
      df.filter(col("ts").between(from, to))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val flushed = Compaction.materialize(src, rule)
    val withLatest = Compaction.materialize(src, rule, includeLatest = true)
    assert(vals(flushed, 0L, 10L) == Seq((0L, 4.0)))
    assert(vals(withLatest, 0L, 10L) == Seq((0L, 4.0), (10L, 8.0)))
    assert(vals(withLatest, 0L, 9L) == Seq((0L, 4.0)))
    assert(vals(withLatest, 11L, 30L) == Seq())
  }
}
