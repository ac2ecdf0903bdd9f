package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._
import graft.ts.RangeQuery.RangeArgs

object SparkTest {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RangeQuerySpec extends AnyFunSuite {
  import SparkTest._
  private val T0 = 1704067200000L
  private val T31 = 1706745599999L
  private val DAY = 86400000L

  test("malformed arguments are rejected at plan time (reference test_negative)") {
    import spark.implicits._
    val df = Seq(("k", 1L, 1.0)).toDF("series", "ts", "value")
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(from = Some(10L), to = Some(5L))))
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(aggs = Seq("avg"), bucketMs = 0)))
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(aggs = Seq("avg"), bucketMs = 10, count = Some(0))))
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(aggs = Seq("avg"), bucketMs = 10, bucketTs = "x")))
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(empty = true)))
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(aggs = Seq("median"), bucketMs = 10)))
    intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(filterByTs = (1L to 129L))))
  }

  test("negative parity sweep: ALIGN / FILTER_BY_TS / FILTER_BY_VALUE edges (r05)") {
    import spark.implicits._
    val df = Seq(("k", 1L, 1.0), ("k", 50L, 2.0)).toDF("series", "ts", "value")
    // ALIGN without AGGREGATION is parse-rejected with the reference
    // string (query_language.c:720)
    val e1 = intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(alignMs = 7L)))
    assert(e1.getMessage.contains("TSDB: ALIGN parameter can only be used with AGGREGATION"))
    // unknown / negative ALIGN tokens (query_language.c:551-556; flow
    // test test_negative.py 'ALIGN 2dd2' / 'start2' / 'end2')
    for (bad <- Seq("2dd2", "start2", "end2", "-5")) {
      val e = intercept[IllegalArgumentException](
        RangeQuery.resolveAlign(bad, Some(0L), Some(10L)))
      assert(e.getMessage.contains("TSDB: unknown ALIGN parameter"), bad)
    }
    assert(RangeQuery.resolveAlign("123", None, None) == 123L)
    // FILTER_BY_TS boundary: exactly 128 accepted, 129 rejected loudly
    // (reference stops consuming at MAX_TS_VALUES_FILTER=128,
    // query_language.c:620-630 — never silently truncate)
    assert(RangeQuery.range(df, RangeArgs(filterByTs = (1L to 128L))).count() == 2)
    val e2 = intercept[IllegalArgumentException](
      RangeQuery.range(df, RangeArgs(filterByTs = (1L to 129L))))
    assert(e2.getMessage.contains("at most 128"))
    // swapped FILTER_BY_VALUE bounds are NOT an error in the reference
    // (parse accepts any two doubles, query_language.c:566-583); the
    // min>max range simply matches nothing
    assert(RangeQuery.range(df,
      RangeArgs(filterByValue = Some((10.0, 1.0)))).count() == 0)
  }

  test("NaN-only buckets follow the reference's per-class validity exactly") {
    // finalizeBucket (filter_iterator.c:389-401): a bucket is emitted
    // iff >= 1 sample is valid under SOME requested aggregator's class;
    // aggCount's class is nonNaN (compaction.c:866-884), so plain count
    // DROPS a NaN-only bucket. Kept buckets apply finalizeEmpty per
    // aggregator: count/sum-family ZERO, last the running carry, other
    // value classes NaN.
    import spark.implicits._
    val nan = Double.NaN
    val df = Seq(("k", 10L, nan), ("k", 20L, nan), ("k", 110L, 5.0))
      .toDF("series", "ts", "value")
    // [count] alone: the NaN-only bucket 0 is dropped, NOT emitted as 0
    val c = RangeQuery.range(df, RangeArgs(aggs = Seq("count"), bucketMs = 100L))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(c.toSeq == Seq((100L, 1L)))
    // [count, countnan]: countnan keeps bucket 0; count finalizeEmpty -> 0
    val cc = RangeQuery.range(df,
        RangeArgs(aggs = Seq("count", "countnan"), bucketMs = 100L))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cc.toSeq == Seq((0L, 0L, 2L), (100L, 1L, 0L)))
    // [sum, last, min, countall] over the kept NaN-only bucket:
    // sum -> 0.0 (finalize_empty_with_ZERO), last -> NaN (unseeded
    // carry), min -> NaN (finalize_empty_with_NAN)
    val m = RangeQuery.range(df,
        RangeArgs(aggs = Seq("sum", "last", "min", "countall"), bucketMs = 100L))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(m(0)._1 == 0L && m(0)._2 == 0.0 && m(0)._3.isNaN && m(0)._4.isNaN)
    assert(m(1) == ((100L, 5.0, 5.0, 5.0)))
    // last carries forward IN RANGE across kept NaN-only buckets
    val df2 = Seq(("k", 10L, 7.0), ("k", 110L, nan), ("k", 210L, nan))
      .toDF("series", "ts", "value")
    val lastCarry = RangeQuery.range(df2,
        RangeArgs(aggs = Seq("last", "countall"), bucketMs = 100L))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(lastCarry.toSeq == Seq((0L, 7.0), (100L, 7.0), (200L, 7.0)))
  }

  test("samples mapping produces long-format epoch-ms rows") {
    val df = TSModel.samples(spark, sf)
    assert(df.columns.toSeq == Seq("series", "ts", "value"))
    val r = df.agg(min("ts"), max("ts"), count("*")).head()
    assert(r.getLong(0) >= T0 && r.getLong(1) <= T31 && r.getLong(2) == 1000)
  }

  test("bucketStart is floor-modulo and negative-safe") {
    import spark.implicits._
    val df = Seq(-100L, -1L, 0L, 1L, 59L, 60L, 61L).toDF("ts")
    val got = df.select(TSModel.bucketStart(col("ts"), 60L)).as[Long].collect().toSeq
    assert(got == Seq(-120L, -60L, 0L, 0L, 0L, 60L, 60L))
    val aligned = df.select(TSModel.bucketStart(col("ts"), 60L, 10L)).as[Long].collect().toSeq
    assert(aligned == Seq(-110L, -50L, -50L, -50L, 10L, 10L, 10L))
  }

  test("agg buckets match a hand computation") {
    import spark.implicits._
    val s = Seq(("a", 0L, 1.0), ("a", 10L, 3.0), ("a", 99L, 5.0), ("a", 100L, 7.0))
      .toDF("series", "ts", "value")
    val got = RangeQuery.range(s, RangeArgs(aggs = Seq("avg", "sum", "count", "first", "last"), bucketMs = 100L))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq((0L, 3.0, 9.0, 3L, 1.0, 5.0), (100L, 7.0, 7.0, 1L, 7.0, 7.0)))
  }

  test("NaN values are skipped by value aggs, counted by countnan") {
    import spark.implicits._
    val s = Seq(("a", 0L, 1.0), ("a", 1L, Double.NaN), ("a", 2L, 3.0))
      .toDF("series", "ts", "value")
    val r = RangeQuery.range(s, RangeArgs(aggs = Seq("avg", "count", "countnan", "countall"), bucketMs = 100L)).head()
    assert(r.getDouble(2) == 2.0 && r.getLong(3) == 2L && r.getLong(4) == 1L && r.getLong(5) == 3L)
  }

  test("NaN-only bucket is dropped without count-family aggs") {
    import spark.implicits._
    val s = Seq(("a", 0L, 1.0), ("a", 150L, Double.NaN))
      .toDF("series", "ts", "value")
    val got = RangeQuery.range(s, RangeArgs(aggs = Seq("avg"), bucketMs = 100L)).collect()
    assert(got.length == 1 && got(0).getLong(1) == 0L)
  }

  test("EMPTY emits only interior gaps, 0-filled for sum") {
    import spark.implicits._
    val s = Seq(("a", 0L, 1.0), ("a", 350L, 2.0)).toDF("series", "ts", "value")
    val got = RangeQuery.range(s, RangeArgs(aggs = Seq("sum"), bucketMs = 100L, empty = true))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 1.0), (100L, 0.0), (200L, 0.0), (300L, 2.0)))
  }

  test("EMPTY + last does LOCF") {
    import spark.implicits._
    val s = Seq(("a", 0L, 1.0), ("a", 350L, 2.0)).toDF("series", "ts", "value")
    val got = RangeQuery.range(s, RangeArgs(aggs = Seq("last"), bucketMs = 100L, empty = true))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 1.0), (100L, 1.0), (200L, 1.0), (300L, 2.0)))
  }

  test("twa single bucket equals plain trapezoid average") {
    import spark.implicits._
    // one bucket, no neighbours: integral of linear segments / span
    val s = Seq(("a", 0L, 0.0), ("a", 10L, 10.0)).toDF("series", "ts", "value")
    val got = Twa.bucketTwa(s, 100L).collect()
    assert(got.length == 1 && math.abs(got(0).getDouble(2) - 5.0) < 1e-12)
  }

  test("twa boundary interpolation covers full bucket when neighbours exist") {
    import spark.implicits._
    // constant series across three buckets -> twa == constant
    val s = (0L to 300L by 50L).map(t => ("a", t, 7.0)).toDF("series", "ts", "value")
    val got = Twa.bucketTwa(s, 100L).collect().map(_.getDouble(2))
    assert(got.forall(v => math.abs(v - 7.0) < 1e-12))
  }

  test("revrange returns same buckets as forward") {
    val samples = TSModel.samples(spark, sf).filter(col("series") === "click_7")
    val fwd = RangeQuery.range(samples, RangeArgs(Some(T0), Some(T31), Seq("max"), DAY))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val rev = RangeQuery.range(samples, RangeArgs(Some(T0), Some(T31), Seq("max"), DAY, reverse = true))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(fwd == rev && fwd.nonEmpty)
  }
}
