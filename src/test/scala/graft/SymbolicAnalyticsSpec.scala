package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts.{Sax, Smoothing, TopK}

/** Round-10 TS additions: Holt double-exponential smoothing, PromQL
  * topk/bottomk, SAX symbolization — hand-computed recurrences and
  * planted-shape checks (cross-engine parity lives in the
  * ts_range_holt / ts_topk_series / ts_bottomk_series / ts_sax_words
  * oracle entries). */
class SymbolicAnalyticsSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("holt: hand-computed recurrence") {
    val d = Seq(("k", 1000L, 10.0), ("k", 2000L, 12.0),
      ("k", 3000L, 11.0), ("k", 4000L, 15.0)).toDF("series", "ts", "value")
    val out = Smoothing.holt(d, sf = 0.5, tf = 0.5)
      .orderBy("ts").as[(String, Long, Double, Double)].collect().toSeq
    // s1=10, b1=2; s2=.5*12+.5*12=12, b2=.5*2+.5*2=2
    // s3=.5*11+.5*14=12.5, b3=.5*.5+.5*2=1.25
    // s4=.5*15+.5*13.75=14.375, b4=.5*1.875+.5*1.25=1.5625
    assert(out == Seq(
      ("k", 1000L, 10.0, 2.0), ("k", 2000L, 12.0, 2.0),
      ("k", 3000L, 12.5, 1.25), ("k", 4000L, 14.375, 1.5625)))
  }

  test("holt: single-sample series gets trend 0; NaN samples drop") {
    val d = Seq(("a", 1000L, 7.0), ("a", 2000L, Double.NaN),
      ("b", 1000L, 3.0)).toDF("series", "ts", "value")
    val out = Smoothing.holt(d, sf = 0.3, tf = 0.3)
      .orderBy("series").as[(String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 1000L, 7.0, 0.0), ("b", 1000L, 3.0, 0.0)))
  }

  test("holt-winters: constant series is an exact fixed point (level=c, trend=0, season=0)") {
    val d = (1L to 12L).map(i => ("c", i * 1000L, 4.25))
      .toDF("series", "ts", "value")
    val out = Smoothing.holtWinters(d, 0.5, 0.3, 0.4, m = 4)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out.size == 12)
    assert(out.forall { case (_, _, l, t, s) => l == 4.25 && t == 0.0 && s == 0.0 })
  }

  test("holt-winters: hand-computed recurrence with m=2") {
    // v = 10, 20, 12 at alpha=.5 beta=.5 gamma=.5, m=2
    // p1: L=10 T=0 S=0 (fixed-point init step), seas=[0,0]
    // p2 (slot 1): L=.5*(20-0)+.5*(10+0)=15, T=.5*(15-10)+.5*0=2.5,
    //              S=.5*(20-15)+.5*0=2.5, seas=[0,2.5]
    // p3 (slot 0): L=.5*(12-0)+.5*(15+2.5)=14.75,
    //              T=.5*(14.75-15)+.5*2.5=1.125,
    //              S=.5*(12-14.75)+.5*0=-1.375
    val d = Seq(("k", 1000L, 10.0), ("k", 2000L, 20.0), ("k", 3000L, 12.0))
      .toDF("series", "ts", "value")
    val out = Smoothing.holtWinters(d, 0.5, 0.5, 0.5, m = 2)
      .orderBy("ts").as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("k", 1000L, 10.0, 0.0, 0.0),
      ("k", 2000L, 15.0, 2.5, 2.5),
      ("k", 3000L, 14.75, 1.125, -1.375)))
  }

  test("holt-winters: seasonal slots absorb a periodic signal") {
    // strict period-4 signal: after convergence the level flattens and
    // the 4 seasonal slots carry the oscillation
    val cycle = Seq(0.0, 10.0, 0.0, -10.0)
    val d = (0 until 40).map(i => ("p", i * 1000L, 100.0 + cycle(i % 4)))
      .toDF("series", "ts", "value")
    val out = Smoothing.holtWinters(d, 0.3, 0.1, 0.6, m = 4)
      .orderBy("ts").as[(String, Long, Double, Double, Double)].collect()
    val tail = out.takeRight(8)
    // level near the mean, seasonal component near the cycle value
    tail.zipWithIndex.foreach { case ((_, ts, l, _, s), _) =>
      val i = (ts / 1000L).toInt
      assert(math.abs(l - 100.0) < 3.0, s"level $l should hover near 100")
      assert(math.abs(s - cycle(i % 4)) < 3.0,
        s"slot ${i % 4}: season $s should approach ${cycle(i % 4)}")
    }
  }

  test("resets: counts drops per bucket; first sample never a reset") {
    // series c: 1,5,2(reset),4,0(reset) across two 1000ms buckets;
    // series d starts HIGH then climbs — its first sample is not a drop
    val d = Seq(
      ("c", 0L, 1.0), ("c", 100L, 5.0), ("c", 200L, 2.0),
      ("c", 1000L, 4.0), ("c", 1100L, 0.0),
      ("d", 0L, 99.0), ("d", 1000L, 100.0))
      .toDF("series", "ts", "value")
    val out = graft.ts.Rates.resets(d, bucketMs = 1000L)
      .orderBy("series", "bucket").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("c", 0L, 1L), ("c", 1000L, 1L), ("d", 0L, 0L), ("d", 1000L, 0L)))
  }

  test("topk: rank admits the whole tie class at the k boundary") {
    val d = Seq(
      ("s1", 0L, 9.0), ("s2", 0L, 5.0), ("s3", 0L, 5.0), ("s4", 0L, 1.0))
      .toDF("series", "ts", "value")
    val top = TopK.topkSeries(d, k = 2, agg = "avg", bucketMs = 1000L)
      .orderBy("rnk", "series").as[(Long, String, Double, Int)].collect().toSeq
    // s2 and s3 tie at rank 2 -> both kept
    assert(top == Seq((0L, "s1", 9.0, 1), (0L, "s2", 5.0, 2), (0L, "s3", 5.0, 2)))
    val bottom = TopK.topkSeries(d, k = 1, agg = "avg", bucketMs = 1000L,
      bottom = true).as[(Long, String, Double, Int)].collect().toSeq
    assert(bottom == Seq((0L, "s4", 1.0, 1)))
  }

  test("topk: per-bucket independence and aggregator selection") {
    val d = Seq(
      ("s1", 0L, 1.0), ("s1", 10L, 1.0),    // bucket 0: s1 count 2
      ("s2", 20L, 5.0),                      // bucket 0: s2 count 1
      ("s1", 1000L, 1.0), ("s2", 1000L, 2.0), ("s2", 1500L, 2.0))
      .toDF("series", "ts", "value")
    val out = TopK.topkSeries(d, k = 1, agg = "count", bucketMs = 1000L)
      .orderBy("bucket").as[(Long, String, Double, Int)].collect().toSeq
    assert(out == Seq((0L, "s1", 2.0, 1), (1000L, "s2", 2.0, 1)))
  }

  test("sax: ramp maps to sorted alphabet, constant series to all-c") {
    val ramp = (0 until 8).map(i => ("r", i * 1000L, i.toDouble))
    val const = (0 until 4).map(i => ("c", i * 1000L, 5.0))
    val d = (ramp ++ const).toDF("series", "ts", "value")
    val out = Sax.saxWords(d, bucketMs = 2000L)
      .orderBy("series").as[(String, Long, String)].collect().toSeq
    // ramp PAA = [0.5, 2.5, 4.5, 6.5], z = [-1.34, -0.45, 0.45, 1.34]
    assert(out == Seq(("c", 2L, "cc"), ("r", 4L, "abcd")))
  }

  test("sax: word order follows bucket time, not value") {
    // descending ramp must give the reversed word
    val d = (0 until 8).map(i => ("r", i * 1000L, (7 - i).toDouble))
      .toDF("series", "ts", "value")
    val out = Sax.saxWords(d, bucketMs = 2000L)
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("r", 4L, "dcba")))
  }

  test("hw forecast: projection = final fit state + h*trend + the h-th future slot") {
    val rows = Seq(("k", 0L, 10.0), ("k", 10L, 14.0), ("k", 20L, 9.0),
      ("k", 30L, 15.0), ("k", 40L, 8.0)).toDF("series", "ts", "value")
    val m = 2
    val fit = Smoothing.holtWinters(rows, 0.5, 0.3, 0.4, m)
      .orderBy("ts").collect()
    val (lvl, tr) = (fit.last.getDouble(2), fit.last.getDouble(3))
    // reconstruct the final seasonal slots: last write to each slot
    // (sample i -> slot i % m; sample 0 never writes)
    val slots = Array(fit(4).getDouble(4), fit(3).getDouble(4))
    val fc = Smoothing.holtWintersForecast(rows, 0.5, 0.3, 0.4, m,
        horizon = 3, stepMs = 5L)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // n = 5: step h lands on slot (5 + h - 1) % 2 = h % 2... h=1 -> 1,
    // h=2 -> 0, h=3 -> 1 (rounded fit state: compare with slack)
    val exp = Seq(
      (45L, 1L, lvl + 1 * tr + slots(1)),
      (50L, 2L, lvl + 2 * tr + slots(0)),
      (55L, 3L, lvl + 3 * tr + slots(1)))
    fc.zip(exp).foreach { case ((gt, gs, gv), (et, es, ev)) =>
      assert(gt == et && gs == es)
      assert(math.abs(gv - ev) < 1e-6, s"step $gs: $gv vs $ev")
    }
  }

  test("hw forecast: a single-sample series projects the flat init level") {
    val rows = Seq(("solo", 7L, 3.5)).toDF("series", "ts", "value")
    val fc = Smoothing.holtWintersForecast(rows, 0.5, 0.3, 0.4, m = 3,
        horizon = 2, stepMs = 10L)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(fc == Seq((17L, 3.5), (27L, 3.5)))
  }

  test("motifs: planted repeating shape dominates; n_series counts support") {
    // two series share the sawtooth 'ad' (ramp up/down per 2 buckets);
    // one series is a pure ramp contributing 'ab'/'bc'/'cd' once each
    val saw = (0 until 8).map(i => (if (i % 2 == 0) 0.0 else 10.0))
    val rows =
      saw.zipWithIndex.map { case (v, i) => ("s1", i * 1000L, v) } ++
      saw.zipWithIndex.map { case (v, i) => ("s2", i * 1000L, v) } ++
      (0 until 4).map(i => ("ramp", i * 1000L, i.toDouble))
    val out = Sax.motifs(rows.toDF("series", "ts", "value"),
        bucketMs = 1000L, m = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // saw word per series: 'adadadad' (8 buckets) -> 'ad' x4, 'da' x3
    assert(out.head == ("ad", 8L, 2L))
    assert(out(1) == ("da", 6L, 2L))
    assert(out(2)._2 == 1L) // every ramp bigram occurs once, one series
  }

  test("motifs == brute-force n-gram count over the words, random data") {
    val rnd = new scala.util.Random(2026L)
    val rows = (0 until 200).map { _ =>
      (s"s${rnd.nextInt(6)}", rnd.nextInt(40) * 500L, rnd.nextInt(100) / 7.0)
    }.distinct
    val df = rows.toDF("series", "ts", "value")
    val m = 3
    val words = Sax.saxWords(df, bucketMs = 2000L)
      .collect().map(r => (r.getString(0), r.getString(2)))
    val brute = words.flatMap { case (s, w) =>
      (0 to w.length - m).map(i => (w.substring(i, i + m), s))
    }
    val expTop = brute.groupBy(_._1)
      .map { case (mo, occ) => (mo, occ.length.toLong, occ.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy(t => (-t._2, -t._3, t._1)).take(5)
    val got = Sax.motifs(df, bucketMs = 2000L, m = m, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expTop)
  }
}
