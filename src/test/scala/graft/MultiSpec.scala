package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts._
import graft.ts.Multi._
import graft.ts.RangeQuery.RangeArgs

class MultiSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def labelsDf = Seq(
    ("a", Map("type" -> "click", "user" -> "1")),
    ("b", Map("type" -> "click", "user" -> "2")),
    ("c", Map("type" -> "view", "user" -> "1", "extra" -> "x"))
  ).toDF("series", "labels")

  test("label predicate language matches reference semantics") {
    def idx(preds: String*) =
      queryIndex(labelsDf, preds.map(parsePred)).as[String].collect().toSet
    assert(idx("type=click") == Set("a", "b"))
    assert(idx("type=click", "user!=1") == Set("b"))
    assert(idx("type=(click,view)", "extra=") == Set("a", "b"))   // absent
    assert(idx("type=(click,view)", "extra!=") == Set("c"))       // present
    assert(idx("user=(1,2)", "type!=(view)") == Set("a", "b"))
    assert(parsePred("type=(a,b)") == InSet("type", Seq("a", "b")))
    intercept[IllegalArgumentException](requireInclusive(Seq(parsePred("type!=x"))))
  }

  test("randomized: mrange equals independent per-series range calls") {
    // the reference's nrange-compare strategy applied to MRANGE: the
    // multi-series single-pass plan must agree with N single-series
    // pipelines over the matched set, across a random option mix
    val dir = SparkTest.sf
    val samples = TSModel.samples(spark, dir)
    val labels = TSModel.labels(spark, dir)
    val predPool = Seq(
      Seq("type=click"), Seq("type=(view,purchase)"),
      Seq("type=(click,view)", "user=(1,2,3,4)"),
      Seq("type=error", "user!=2"), Seq("type=(signup)", "user!=(9)"))
    val rnd = new scala.util.Random(7)
    for (iter <- 0 until 5) {
      val preds = predPool(rnd.nextInt(predPool.size)).map(parsePred)
      val agg = Seq("avg", "sum", "max", "count", "last")(rnd.nextInt(5))
      val args = RangeArgs(
        from = Some(1704067200000L + rnd.nextInt(10) * 86400000L),
        to = Some(1704067200000L + (15 + rnd.nextInt(16)) * 86400000L),
        aggs = Seq(agg), bucketMs = Seq(1L, 2L, 5L)(rnd.nextInt(3)) * 86400000L,
        count = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(4)) else None,
        reverse = rnd.nextBoolean())
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) "null" else f"${r.get(2).toString.toDouble}%.9f")
      val multi = Multi.mrange(samples, labels, preds, args).collect().map(key).toSet
      val matched = Multi.queryIndex(labels, preds).as[String].collect()
      val singles = matched.flatMap { k =>
        RangeQuery.range(samples.filter(col("series") === k), args).collect().map(key)
      }.toSet
      assert(multi == singles,
        s"iter=$iter agg=$agg args=$args diff=${(multi diff singles) ++ (singles diff multi)}")
    }
  }

  test("mget picks the newest sample per matched series") {
    val s = Seq(("a", 1L, 1.0), ("a", 5L, 9.0), ("b", 3L, 2.0), ("c", 9L, 7.0))
      .toDF("series", "ts", "value")
    val got = mget(s, labelsDf, Seq(parsePred("type=click")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 5L, 9.0), ("b", 3L, 2.0)))
  }

  test("mget lists matched series with no samples as empty replies") {
    // reference TS.MGET returns EVERY matched series; one with no
    // samples gets an empty value array (module.c:2132-2265) — here a
    // null ts/value row
    val lbl = Seq(("a", Map("type" -> "click")), ("ghost", Map("type" -> "click")))
      .toDF("series", "labels")
    val s = Seq(("a", 5L, 9.0)).toDF("series", "ts", "value")
    val got = mget(s, lbl, Seq(parsePred("type=click")))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set(("a", 5L), ("ghost", -1L)))
  }

  test("groupby reduce: per-series agg first, then cross-series reduce") {
    val s = Seq(
      ("a", 10L, 1.0), ("a", 20L, 3.0),   // bucket 0 avg=2
      ("b", 30L, 10.0),                   // bucket 0 avg=10
      ("c", 40L, 100.0))                  // view, excluded by filter below
      .toDF("series", "ts", "value")
    val got = mrangeGroupBy(s, labelsDf, Seq(parsePred("type=click")),
      RangeArgs(aggs = Seq("avg"), bucketMs = 100L), "type", "sum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("type=click", 0L, 12.0)))
  }

  test("groupby forbids first/last/twa reducers") {
    intercept[IllegalArgumentException] {
      mrangeGroupBy(Seq(("a", 1L, 1.0)).toDF("series", "ts", "value"),
        labelsDf, Seq(parsePred("type=click")),
        RangeArgs(aggs = Seq("avg"), bucketMs = 100L), "type", "last")
    }
  }

  test("negative parse parity: GROUPBY+EXCLUDEEMPTY and filterless MGET rejected") {
    // reference tests/flow/test_negative.py shapes:
    // EXCLUDEEMPTY cannot combine with GROUPBY (query_language.c:1003-1007)
    val s = Seq(("a", 1L, 1.0)).toDF("series", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      mrangeGroupBy(s, labelsDf, Seq(parsePred("type=click")),
        RangeArgs(aggs = Seq("avg"), bucketMs = 100L), "type", "sum",
        excludeEmpty = true)
    }
    assert(e.getMessage.contains("EXCLUDEEMPTY is not allowed with GROUPBY"))
    // MGET FILTER needs >= 1 inclusive matcher (query_language.c:903-907)
    intercept[IllegalArgumentException] {
      mget(s, labelsDf, Seq(parsePred("type!=click")))
    }
    // and an empty filter list is as invalid as a filterless command
    intercept[IllegalArgumentException] { mget(s, labelsDf, Nil) }
    // GROUPBY without REDUCE is a WrongArity reply in the reference
    // (query_language.c:1017-1023); the empty reducer is that shape here
    val e2 = intercept[IllegalArgumentException] {
      mrangeGroupBy(s, labelsDf, Seq(parsePred("type=click")),
        RangeArgs(aggs = Seq("avg"), bucketMs = 100L), "type", "")
    }
    assert(e2.getMessage.contains("wrong number of arguments for 'TS.MRANGE' command"))
  }

  test("nrange pivots by ts with NaN gaps") {
    val s = Seq(("a", 0L, 1.0), ("b", 0L, 2.0), ("b", 100L, 3.0))
      .toDF("series", "ts", "value")
    val got = nrange(s, Seq("a", "b"), RangeArgs(aggs = Seq("avg"), bucketMs = 100L))
      .orderBy("ts").collect()
    assert(got(0).getLong(0) == 0L && got(0).getDouble(1) == 1.0 && got(0).getDouble(2) == 2.0)
    assert(got(1).getLong(0) == 100L && got(1).getDouble(1).isNaN && got(1).getDouble(2) == 3.0)
  }

  test("info reports totals and last sample") {
    val s = Seq(("a", 1L, 5.0), ("a", 9L, 7.0)).toDF("series", "ts", "value")
    val r = Multi.info(s).head()
    assert(r.getString(0) == "a" && r.getLong(1) == 2 && r.getLong(2) == 1L &&
      r.getLong(3) == 9L && r.getDouble(4) == 7.0)
  }

  test("LATEST flag surfaces the in-flight compaction bucket; off hides it") {
    // series a: buckets 0 (flushed) and 10 (in-flight). dur = 10
    val s = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 12L, 50.0))
      .toDF("series", "ts", "value")
    val rule = Compaction.Rule("avg", 10L)
    def read(latest: Boolean) =
      RangeQuery.rangeOverDest(s, rule, RangeArgs(latest = latest))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(read(latest = false) == Set((0L, 2.0)))
    assert(read(latest = true) == Set((0L, 2.0), (10L, 50.0)))
    // GET ... LATEST returns the in-flight bucket itself
    val g = Multi.getDest(s, "a", rule, latest = true).head()
    assert(g.getLong(1) == 10L && g.getDouble(2) == 50.0)
    val gOff = Multi.getDest(s, "a", rule, latest = false).head()
    assert(gOff.getLong(1) == 0L && gOff.getDouble(2) == 2.0)
  }

  test("COUNT truncates per series, not globally") {
    val s = (1L to 9L).flatMap(t => Seq(("a", t, 1.0), ("b", t, 2.0)))
      .toDF("series", "ts", "value")
    val out = RangeQuery.range(s, RangeArgs(count = Some(3)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "a") == 3 && out.count(_._1 == "b") == 3)
    assert(out.filter(_._1 == "a").map(_._2).toSeq == Seq(1L, 2L, 3L))
    // reverse: the NEWEST n per series
    val rev = RangeQuery.range(s, RangeArgs(count = Some(2), reverse = true))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rev.filter(_._1 == "b").map(_._2).toSeq == Seq(9L, 8L))
  }
}
