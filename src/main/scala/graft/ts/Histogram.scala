package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-series fixed-width value histograms — beyond-the-reference
 * extension (the value-distribution surface behind latency heatmaps;
 * the reference's aggregator vtable has no histogram, SURVEY §2.4).
 *
 * One hash aggregation by (series, bin) with map-side combine: each
 * partition collapses to at most series×nbins partial counts before
 * the shuffle, so shuffle volume is bounded by the histogram size —
 * independent of sample count. That is the canonical 100-TB shape for
 * distribution sketches (same reasoning as the bounded-histogram
 * quality percentile in CorpusPipeline).
 *
 * Binning: `bin = floor((value - lo) / width)` over [lo, hi), values
 * outside the range are dropped (no clamp — a clamped edge bin lies
 * about the distribution's tails; callers widen the range instead).
 * Empty bins are not emitted (downstream gap-fill can densify with a
 * `sequence` spine, the [[TSModel.bucketSpine]] pattern). The
 * bin bounds are reported as columns so the result is self-describing.
 */
object Histogram {

  /** `(series, bin, bin_lo, bin_hi, n)` per non-empty bin. */
  def valueHistogram(
      samples: DataFrame, lo: Double, hi: Double, nbins: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(nbins > 0 && hi > lo, s"bad histogram spec [$lo,$hi)/$nbins")
    val width = (hi - lo) / nbins
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s.filter(col("value") >= lo && col("value") < hi)
      .groupBy(col("series"),
        floor((col("value") - lo) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("series"), col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        col("n"))
  }

  /**
   * Quantile ESTIMATION from the histogram — the PromQL
   * `histogram_quantile` shape: per series, walk the cumulative bin
   * counts to the bin containing rank `q·total` and interpolate
   * linearly inside it. This is the 100-TB quantile path when the
   * exact per-series quantile is too expensive: the full pass only
   * ever shuffles the bounded (series × nbins) histogram, and the
   * estimate's error is bounded by the bin width the CALLER chose —
   * self-describing precision, unlike a sketch's probabilistic bound.
   * The quantile is of the histogram-captured distribution (values
   * outside [lo, hi) were dropped by [[valueHistogram]]'s no-clamp
   * contract).
   *
   * Plan: the histogram agg, then one ordered cumulative window and
   * one rank pick over the HISTOGRAM-sized frame. Output `(series,
   * bin, quantile_value, n_total, cum, n)` — the exact integer
   * moments of the pick bin PLUS the interpolated value.
   *
   * Hash stability (the round-12 explicit-moments convention): the
   * moments `bin/cum/n/n_total` are integers, bit-stable by
   * construction. `quantile_value` is emitted UNROUNDED: it is a
   * fixed-shape chain of IEEE-754 `+ - * /` (all correctly-rounded
   * and therefore engine-independent) over those integers and the
   * literal `lo/width/q` doubles, evaluated in the same association
   * order on both engines — so the double is bit-identical by
   * construction. A trailing `round(x, 9)` would UNDO that guarantee:
   * decimal rounding of a binary double is implementation-defined at
   * half-way points (Spark rounds via exact BigDecimal HALF_UP,
   * DuckDB via a float multiply), which is precisely how the round-14
   * driver hash failures happened. Interpolated quantiles hit exact
   * decimal halves often (fractions with small denominators `n`), so
   * this operator must never decimal-round its output.
   */
  def histogramQuantile(
      samples: DataFrame, lo: Double, hi: Double, nbins: Int, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    val width = (hi - lo) / nbins
    val w = org.apache.spark.sql.expressions.Window
    val wCum = w.partitionBy(col("series")).orderBy(col("bin"))
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val wAll = w.partitionBy(col("series"))
    valueHistogram(samples, lo, hi, nbins, fromMs, toMs)
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .withColumn("rnk", lit(q) * col("n_total"))
      .filter(col("cum") >= col("rnk"))
      .withColumn("pick", row_number().over(
        w.partitionBy(col("series")).orderBy(col("bin"))))
      .filter(col("pick") === 1)
      .select(col("series"), col("bin"),
        (col("bin_lo")
          + (col("rnk") - (col("cum") - col("n"))) / col("n") * width)
          .as("quantile_value"),
        col("n_total"), col("cum"), col("n"))
  }

  /** DuckDB oracle twin of [[histogramQuantile]] ([[valueHistogramSql]]
    * wrapped in the same cumulative walk + interpolation). */
  def histogramQuantileSql(
      lo: Double, hi: Double, nbins: Int, q: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(q > 0 && q <= 1, s"q $q must be in (0, 1]")
    val width = (hi - lo) / nbins
    s"""WITH h AS (
       |${valueHistogramSql(lo, hi, nbins, fromMs, toMs, cte).replace("\n", "\n  ")}
       |), walked AS (
       |  SELECT series, bin, bin_lo, n,
       |    sum(n) OVER (PARTITION BY series ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(n) OVER (PARTITION BY series) AS n_total
       |  FROM h
       |)
       |SELECT series, bin,
       |  bin_lo + (($q)::DOUBLE * n_total - (cum - n)) / n * ($width)::DOUBLE
       |    AS quantile_value,
       |  n_total, cum, n
       |FROM walked
       |WHERE cum >= ($q)::DOUBLE * n_total
       |QUALIFY row_number() OVER (PARTITION BY series ORDER BY bin) = 1""".stripMargin
  }

  def valueHistogramSql(
      lo: Double, hi: Double, nbins: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(nbins > 0 && hi > lo, s"bad histogram spec [$lo,$hi)/$nbins")
    val width = (hi - lo) / nbins
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)",
      s"value >= ($lo)::DOUBLE", s"value < ($hi)::DOUBLE") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), binned AS (
       |  SELECT series,
       |    CAST(floor((value - ($lo)::DOUBLE) / ($width)::DOUBLE) AS BIGINT) AS bin,
       |    count(*) AS n
       |  FROM f GROUP BY 1, 2
       |)
       |SELECT series, bin,
       |  ($lo)::DOUBLE + bin * ($width)::DOUBLE AS bin_lo,
       |  ($lo)::DOUBLE + (bin + 1) * ($width)::DOUBLE AS bin_hi,
       |  n
       |FROM binned""".stripMargin
  }
}
