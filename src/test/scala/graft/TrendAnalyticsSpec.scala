package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.{col, sum}
import graft.ts.{Anomaly, Histogram, Lttb, Trend}

/** Closed-form cases for the round-10 analytics extensions (MAD
  * outliers, OLS trend/forecast, value histograms, parallel LTTB) —
  * the executable-model complement of the RandomizedWindowsSpec
  * DuckDB differential. */
class TrendAnalyticsSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  // ---- Trend ----

  test("trend: a perfect line is recovered exactly, forecast included") {
    val df = (0L to 10L).map(t => ("s", t, 2.0 * t + 5.0)).toDF("series", "ts", "value")
    val Array(r) = Trend.fit(df, predictAtMs = 100L).collect()
    assert(r.getAs[Long]("n_samples") == 11L)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("predicted") - 205.0) < 1e-9)
  }

  test("trend: degenerate series (single sample) defines no trend") {
    val df = Seq(("a", 5L, 1.0), ("b", 1L, 1.0), ("b", 2L, 3.0))
      .toDF("series", "ts", "value")
    val rows = Trend.fit(df, 10L).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("b"))
  }

  test("trend: NaN samples are invisible to the fit") {
    val df = Seq(("s", 0L, 0.0), ("s", 1L, 1.0), ("s", 2L, Double.NaN))
      .toDF("series", "ts", "value")
    val Array(r) = Trend.fit(df, 0L).collect()
    assert(r.getAs[Long]("n_samples") == 2L)
    assert(math.abs(r.getAs[Double]("slope") - 1.0) < 1e-12)
  }

  test("trend plan: ONE shuffle (hash agg of regression moments)") {
    val df = Seq(("s", 0L, 0.0)).toDF("series", "ts", "value")
    assert(shuffles(Trend.fit(df, 0L)) == 1)
  }

  // ---- MAD ----

  test("mad: a single extreme sample is flagged and does not mask itself") {
    // values 10,11,12,13,14 + outlier 1000: median 12.5, MAD ~1.5 —
    // classic case where the MEAN-based zscore is dragged by the
    // outlier but the median-based score is not
    val vals = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
      .toDF("series", "ts", "value")
    val rows = Anomaly.mad(df, threshold = 3.5).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(5L))
    assert(rows.head.getAs[Double]("mad_score") > 100)
  }

  test("mad: constant-majority series (MAD = 0) flags nothing") {
    val df = Seq(("s", 0L, 5.0), ("s", 1L, 5.0), ("s", 2L, 5.0), ("s", 3L, 99.0))
      .toDF("series", "ts", "value")
    assert(Anomaly.mad(df, threshold = 0.1).collect().isEmpty)
  }

  test("mad plan: ONE shuffle (both percentile windows share the sort)") {
    val df = Seq(("s", 0L, 0.0)).toDF("series", "ts", "value")
    assert(shuffles(Anomaly.mad(df, 1.0)) == 1)
  }

  // ---- Histogram ----

  test("histogram: bins, bounds and out-of-range drops") {
    val df = Seq(
      ("s", 0L, -0.5), // below lo: dropped
      ("s", 1L, 0.0), ("s", 2L, 9.99), // bin 0
      ("s", 3L, 10.0), // bin 1
      ("s", 4L, 35.0), // bin 3
      ("s", 5L, 40.0), // == hi: dropped
      ("s", 6L, Double.NaN))
      .toDF("series", "ts", "value")
    val rows = Histogram.valueHistogram(df, lo = 0.0, hi = 40.0, nbins = 4)
      .collect().sortBy(_.getLong(1))
    assert(rows.map(r => (r.getLong(1), r.getLong(4))).toSeq ==
      Seq((0L, 2L), (1L, 1L), (3L, 1L)))
    assert(rows.head.getAs[Double]("bin_lo") == 0.0)
    assert(rows.head.getAs[Double]("bin_hi") == 10.0)
    assert(rows.last.getAs[Double]("bin_lo") == 30.0)
  }

  test("histogram plan: ONE shuffle, volume bounded by series×bins") {
    val df = Seq(("s", 0L, 0.5)).toDF("series", "ts", "value")
    assert(shuffles(Histogram.valueHistogram(df, 0, 1, 10)) == 1)
  }

  test("histogramQuantile: interpolates inside the rank bin, exact on uniform fill") {
    // 10 values 0..9 in [0,10)/10 bins, one per bin: q=0.5 -> rank 5,
    // cum reaches 5 in bin 4 (values 0..4), interp = 4 + (5-4)/1 = 5.0
    val df = (0 until 10).map(i => ("s", i.toLong, i.toDouble))
      .toDF("series", "ts", "value")
    val r = Histogram.histogramQuantile(df, 0.0, 10.0, 10, 0.5).collect()(0)
    assert(r.getLong(1) == 4L && r.getDouble(2) == 5.0 && r.getLong(3) == 10L)
    // q = 1.0 lands in the last occupied bin's upper edge
    val r2 = Histogram.histogramQuantile(df, 0.0, 10.0, 10, 1.0).collect()(0)
    assert(r2.getLong(1) == 9L && r2.getDouble(2) == 10.0)
  }

  test("histogramQuantile: skewed mass and multi-series independence") {
    // series a: 9 values in bin 0, 1 in bin 9 -> p50 interpolates
    // inside bin 0 at 5/9 of its width; series b: all mass in bin 2
    val rows = (0 until 9).map(i => ("a", i.toLong, 0.5)) ++
      Seq(("a", 9L, 9.5)) ++ (0 until 4).map(i => ("b", i.toLong, 2.5))
    val out = Histogram.histogramQuantile(
        rows.toDF("series", "ts", "value"), 0.0, 10.0, 10, 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("a") == ((0L, 5.0 / 9.0, 10L)))
    assert(out("b") == ((2L, 2.5, 4L)))
  }

  test("ddsketchQuantile: bucket bounds bracket the exact quantile with relative width gamma") {
    // values spanning decades — exactly where a fixed-width histogram's
    // absolute error is useless and DDSketch's relative bound holds
    val rnd = new scala.util.Random(42)
    val vals = (0 until 400).map(_ => math.exp(rnd.nextDouble() * 8 - 2))
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
      .toDF("series", "ts", "value")
    val gamma = 1.02
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val r = Histogram.ddsketchQuantile(df, gamma, q).collect()(0)
      val lo = r.getAs[Double]("q_lo"); val hi = r.getAs[Double]("q_hi")
      // rank-q order statistic (ceil(q*n) smallest — the bucket-walk rank)
      val exact = vals.sorted.apply(math.ceil(q * vals.size).toInt - 1)
      assert(lo <= exact * (1 + 1e-9) && exact <= hi * (1 + 1e-9),
        s"q=$q: exact $exact outside [$lo, $hi)")
      assert(hi / lo < gamma * 1.0001, s"bracket wider than gamma: $lo..$hi")
    }
    // non-positive values are dropped (positive store only)
    val withJunk = df.union(Seq(("s", 999L, -5.0), ("s", 1000L, 0.0))
      .toDF("series", "ts", "value"))
    assert(Histogram.ddsketchHistogram(withJunk, gamma).agg(sum(col("n")))
      .collect()(0).getLong(0) == 400L)
  }

  test("ddsketchHistogram: bucket counts merge across splits (full mergeability)") {
    val vals = (1 to 300).map(i => ("s", i.toLong, i * 0.37))
    val df = vals.toDF("series", "ts", "value")
    val whole = Histogram.ddsketchHistogram(df, 1.05)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val a = Histogram.ddsketchHistogram(df.filter(col("ts") <= 150), 1.05)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val b = Histogram.ddsketchHistogram(df.filter(col("ts") > 150), 1.05)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "split sketches must merge to the whole sketch")
  }

  test("ddsketchQuantileSigned: three stores, value-ordered walk, signed brackets") {
    // a mixed-sign corpus: 100 negatives spanning decades, 7 exact
    // zeros, 200 positives — ranks land in each store at different q
    val rnd = new scala.util.Random(7)
    val negs = (0 until 100).map(_ => -math.exp(rnd.nextDouble() * 6 - 1))
    val poss = (0 until 200).map(_ => math.exp(rnd.nextDouble() * 6 - 1))
    val vals = negs ++ Seq.fill(7)(0.0) ++ poss
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
      .toDF("series", "ts", "value")
    val gamma = 1.05
    val sorted = vals.sorted
    for (q <- Seq(0.1, 0.33, 0.9)) {
      val r = Histogram.ddsketchQuantileSigned(df, gamma, q).collect()(0)
      val store = r.getAs[Long]("store")
      val lo = r.getAs[Double]("q_lo"); val hi = r.getAs[Double]("q_hi")
      val exact = sorted(math.ceil(q * vals.size).toInt - 1)
      assert(store == math.signum(exact).toLong, s"q=$q store $store for $exact")
      assert(lo <= exact * (if (exact < 0) 1 - 1e-9 else 1 + 1e-9) &&
        exact * (if (exact < 0) 1 + 1e-9 else 1 - 1e-9) <= hi,
        s"q=$q: exact $exact outside [$lo, $hi]")
      if (store != 0L)
        assert(math.abs(hi / lo) < gamma * 1.0001 &&
          math.abs(hi / lo) > 1 / (gamma * 1.0001),
          s"relative width on |v| must be gamma: $lo..$hi")
    }
    // q at the zero store: 100 negatives then 7 zeros — rank 104 is a zero
    val qZero = 104.0 / vals.size
    val rz = Histogram.ddsketchQuantileSigned(df, gamma, qZero).collect()(0)
    assert(rz.getAs[Long]("store") == 0L &&
      rz.getAs[Double]("q_lo") == 0.0 && rz.getAs[Double]("q_hi") == 0.0)
    // the signed histogram keeps every non-NaN sample across the stores
    val h = Histogram.ddsketchHistogramSigned(df, gamma)
    assert(h.agg(sum(col("n"))).collect()(0).getLong(0) == vals.size.toLong)
    assert(h.filter(col("store") === 0L).count() == 1)
    // negative bucketing is symmetric: sketch of -v mirrors sketch of v
    val pos = poss.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
      .toDF("series", "ts", "value")
    val neg = poss.zipWithIndex.map { case (v, i) => ("s", i.toLong, -v) }
      .toDF("series", "ts", "value")
    val hp = Histogram.ddsketchHistogramSigned(pos, gamma)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    val hn = Histogram.ddsketchHistogramSigned(neg, gamma)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(hp == hn, "negative store must bucket by magnitude, symmetric to positive")
  }

  // ---- per-source divergence ----

  test("sourceDivergence: identical sources sit at zero, an alien source spikes") {
    val docs = (
      (1L to 4L).map(i => (i, "the cat sat on the mat", "srcA")) ++
      (5L to 8L).map(i => (i, "the cat sat on the mat", "srcB")) ++
      Seq((9L, "zzz qqq vvv kkk jjj xxx", "srcC")))
      .toDF("doc_id", "text", "source")
    val out = graft.pipeline.Text.sourceDivergence(docs, topN = 50, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // A and B are 8/9 of the corpus mass with identical distributions:
    // tiny but equal divergence from the pooled corpus
    assert(out("srcA")._2 == out("srcB")._2 && out("srcA")._3 == out("srcB")._3)
    assert(out("srcC")._2 > out("srcA")._2 * 2,
      s"alien source must spike: ${out("srcC")._2} vs ${out("srcA")._2}")
    assert(out("srcC")._3 > out("srcA")._3 * 2)
    // JS is bounded by ln 2; KL is not
    assert(out.values.forall(_._3 <= math.log(2.0) + 1e-9))
    assert(out("srcA")._1 == 24L, s"vocab-restricted token count")
  }

  test("sourceDivergence: a source with no vocab overlap gets the uniform-smoothing verdict") {
    // topN=2 pins the vocab to the two dominant words; srcZ shares none
    val docs = Seq(
      (1L, "aa aa aa bb bb bb", "big"), (2L, "aa bb aa bb", "big"),
      (3L, "cc dd", "srcZ")).toDF("doc_id", "text", "source")
    val out = graft.pipeline.Text.sourceDivergence(docs, topN = 2, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("srcZ") == 0L && out("big") == 10L)
  }

  // ---- ACF ----

  test("acf: a period-2 series has acf(1) = -1 and acf(2) = +1") {
    val df = (0L until 20L).map(t => ("s", t, (t % 2).toDouble))
      .toDF("series", "ts", "value")
    val got = graft.ts.Trend.acf(df, maxLag = 3)
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toMap
    assert(math.abs(got(1) + 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    assert(math.abs(got(3) + 1.0) < 1e-12)
  }

  test("acf: constant series and too-short overlaps emit nothing") {
    val df = (Seq(("c", 0L, 5.0), ("c", 1L, 5.0), ("c", 2L, 5.0)) ++
      Seq(("t", 0L, 1.0), ("t", 1L, 2.0)))
      .toDF("series", "ts", "value")
    val got = graft.ts.Trend.acf(df, maxLag = 2).collect()
    // 'c' is zero-variance at every lag; 't' has a single pair at
    // lag 1 (corr undefined) and none at lag 2
    assert(got.isEmpty)
  }

  test("acf plan: one exchange (lag windows) + one agg pass") {
    val df = Seq(("s", 0L, 0.0)).toDF("series", "ts", "value")
    assert(shuffles(graft.ts.Trend.acf(df, 3)) <= 2)
  }

  // ---- Rolling ----

  test("rolling quantile: hand-computed interpolation over the trailing frame") {
    val df = Seq(("s", 0L, 4.0), ("s", 1L, 1.0), ("s", 2L, 3.0), ("s", 3L, 2.0))
      .toDF("series", "ts", "value")
    val got = graft.ts.Rolling.rollingQuantile(df, q = 0.5, span = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(got(0L) == 4.0)                    // window [4]
    assert(got(1L) == 2.5)                    // [1,4] -> midpoint
    assert(got(2L) == 3.0)                    // [1,3,4] -> median
    assert(got(3L) == 2.0)                    // trailing 3 = [1,2,3]
    // q extremes degenerate to window min/max
    val mx = graft.ts.Rolling.rollingQuantile(df, q = 1.0, span = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(mx(3L) == 3.0)
  }

  test("hampel: a spike is flagged against its own window; trend-following medians do not page") {
    // linear ramp 0..19 with one spike at t=10: the centered ±3 window
    // median tracks the ramp, so only the spike pages; a global-MAD
    // zscore on the same ramp would flag the endpoints too
    val rows = (0 until 20).map(i =>
      ("s", i.toLong, if (i == 10) 100.0 else i.toDouble))
    val out = graft.ts.Rolling.hampel(
        rows.toDF("series", "ts", "value"), span = 3, k = 3.0)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((10L, 100.0)), out.toSeq.toString)
  }

  test("hampel: zero-MAD window flags ANY deviation with a NULL score") {
    // constant majority: med = 5, MAD = 0 -> the lone 6.0 pages via the
    // mad=0 escape, h_score NULL (undefined scale)
    val rows = (0 until 9).map(i => ("s", i.toLong, 5.0)) ++
      Seq(("s", 9L, 6.0))
    val out = graft.ts.Rolling.hampel(
        rows.toDF("series", "ts", "value"), span = 4, k = 3.0).collect()
    assert(out.length == 1 && out(0).getLong(1) == 9L && out(0).isNullAt(4))
    // fully constant series: nothing pages
    val const = (0 until 9).map(i => ("s", i.toLong, 5.0))
    assert(graft.ts.Rolling.hampel(
      const.toDF("series", "ts", "value"), span = 4, k = 3.0).count() == 0)
  }

  test("winsorize: tails clip to the series percentiles, bulk unchanged") {
    val df = (1L to 100L).map(t => ("s", t, t.toDouble)).toDF("series", "ts", "value")
    val got = graft.ts.Rolling.winsorize(df, 0.10, 0.90)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // p10 of 1..100 = 10.9, p90 = 90.1 (rank interpolation)
    assert(math.abs(got(1L) - 10.9) < 1e-9)
    assert(math.abs(got(100L) - 90.1) < 1e-9)
    assert(got(50L) == 50.0)
  }

  test("rolling/winsorize plans: ONE shuffle each") {
    val df = Seq(("s", 0L, 0.0)).toDF("series", "ts", "value")
    assert(shuffles(graft.ts.Rolling.rollingQuantile(df, 0.5, 4)) == 1)
    assert(shuffles(graft.ts.Rolling.winsorize(df, 0.1, 0.9)) == 1)
  }

  // ---- Seasonal ----

  test("seasonal: rush-hour values are NOT anomalous vs their cohort") {
    // hour 8 always ~100, hour 3 always ~1 over 8 days: a global
    // zscore flags every hour-8 sample; the seasonal score flags none
    val HOUR = 3600000L
    val rows = (0 until 8).flatMap { day =>
      Seq(
        ("s", day * 24L * HOUR + 8 * HOUR, 100.0 + day % 2),
        ("s", day * 24L * HOUR + 3 * HOUR, 1.0 + day % 2))
    }
    val df = rows.toDF("series", "ts", "value")
    assert(graft.ts.Seasonal.anomaly(df, threshold = 2.0).collect().isEmpty)
    // but a planted hour-8 outage (value 0) IS seasonal-anomalous
    val out = graft.ts.Seasonal
      .anomaly(df.unionByName(Seq(("s", 8 * 24L * HOUR + 8 * HOUR, 0.0))
        .toDF("series", "ts", "value")), threshold = 2.0)
      .collect()
    assert(out.map(r => (r.getLong(3), r.getDouble(2))).toSeq == Seq((8L, 0.0)))
  }

  test("seasonal profile: cohort keys and moments") {
    val HOUR = 3600000L
    val df = Seq(
      ("s", 5 * HOUR, 2.0), ("s", 29 * HOUR, 4.0), // hour 5, two days
      ("s", 6 * HOUR, 7.0))
      .toDF("series", "ts", "value")
    val prof = graft.ts.Seasonal.profile(df)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getDouble(3)))).toMap
    assert(prof(5L) == ((2L, 3.0)))
    assert(prof(6L) == ((1L, 7.0)))
  }

  test("seasonal: dow key pins Monday=0 (epoch day 0 was a Thursday)") {
    val DAY = 86400000L
    val df = Seq(("s", 0L, 1.0), ("s", 4 * DAY, 1.0)).toDF("series", "ts", "value")
    val ks = graft.ts.Seasonal.profile(df, mode = "dow")
      .collect().map(_.getLong(1)).sorted.toSeq
    // 1970-01-01 was a Thursday -> 3; 1970-01-05 a Monday -> 0
    assert(ks == Seq(0L, 3L))
  }

  // ---- LTTB ----

  test("lttb: endpoints pinned, planted spike survives downsampling") {
    // 3 buckets of 10; flat series except a spike at ts=15 — the
    // interior bucket must keep the spike (max triangle area), the
    // first/last buckets their first/last points
    val df = (0L until 30L).map(t => ("s", t, if (t == 15) 50.0 else 1.0))
      .toDF("series", "ts", "value")
    val rows = Lttb.downsample(df, bucketMs = 10L).collect().sortBy(_.getLong(1))
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 15L, 29L))
  }

  test("lttb: flat interior bucket ties break to the earliest ts") {
    val df = (0L until 30L).map(t => ("s", t, 1.0)).toDF("series", "ts", "value")
    val rows = Lttb.downsample(df, bucketMs = 10L).collect().sortBy(_.getLong(1))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 10L, 29L))
  }

  // ---- EWMA ----

  test("ewma: hand-computed adjusted weights, constant series fixed point") {
    val df = Seq(("s", 0L, 2.0), ("s", 1L, 4.0), ("s", 2L, 8.0),
      ("c", 0L, 5.0), ("c", 1L, 5.0))
      .toDF("series", "ts", "value")
    val got = graft.ts.Smoothing.ewma(df, alpha = 0.5, span = 16)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(3))).toMap
    // adjusted EWM, newest-first weights 1, .5, .25:
    assert(math.abs(got(("s", 0L)) - 2.0) < 1e-12)
    assert(math.abs(got(("s", 1L)) - (4.0 + 0.5 * 2.0) / 1.5) < 1e-12)
    assert(math.abs(got(("s", 2L)) - (8.0 + 0.5 * 4.0 + 0.25 * 2.0) / 1.75) < 1e-12)
    assert(got(("c", 0L)) == 5.0 && got(("c", 1L)) == 5.0)
  }

  test("ewma: span truncates history; span=1 and alpha=1 degenerate to identity") {
    val df = (0L until 5L).map(t => ("s", t, t.toDouble)).toDF("series", "ts", "value")
    val span2 = graft.ts.Smoothing.ewma(df, alpha = 0.5, span = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // only the previous sample participates: (x_t + .5 x_{t-1}) / 1.5
    assert(math.abs(span2(4L) - (4.0 + 0.5 * 3.0) / 1.5) < 1e-12)
    val ident = graft.ts.Smoothing.ewma(df, alpha = 0.5, span = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    (0L until 5L).foreach(t => assert(ident(t) == t.toDouble))
    val newest = graft.ts.Smoothing.ewma(df, alpha = 1.0, span = 16)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    (0L until 5L).foreach(t => assert(newest(t) == t.toDouble))
  }

  test("ewma plan: ONE shuffle (frame window + fold, no self-join)") {
    val df = Seq(("s", 0L, 0.0)).toDF("series", "ts", "value")
    assert(shuffles(graft.ts.Smoothing.ewma(df, 0.3)) == 1)
  }

  test("lttb: single-bucket series keeps its first point") {
    val df = Seq(("s", 3L, 7.0), ("s", 5L, 9.0)).toDF("series", "ts", "value")
    val rows = Lttb.downsample(df, bucketMs = 100L).collect()
    assert(rows.map(r => (r.getLong(2), r.getDouble(3))).toSeq == Seq((3L, 7.0)))
  }

  test("lttb: one selected point per non-empty bucket on the fixture") {
    val DAY = 86400000L
    val s = graft.ts.TSModel.samples(spark, sf)
    val out = Lttb.downsample(s, DAY).cache()
    try {
      val perBucket = out.groupBy("series", "bucket").count()
        .filter(org.apache.spark.sql.functions.col("count") =!= 1).count()
      assert(perBucket == 0)
      assert(out.count() > 0)
    } finally out.unpersist()
  }
}
