package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-series linear trend + forecast — beyond-the-reference extension
 * (the PromQL `deriv` / `predict_linear` pair; the reference has no
 * regression surface, SURVEY §2.4).
 *
 * Ordinary least squares over (ts, value), expressed entirely with
 * Spark's built-in `regr_slope` / `regr_intercept` / `regr_count`
 * aggregates — ONE hash aggregation by series with map-side partial
 * merge (the regression moments are associative), no window, no sort,
 * no second pass. At 100 TB this is the cheapest shape a per-series
 * fit can have: shuffle volume is one moments-row per (series,
 * partition).
 *
 * The forecast column evaluates the fitted line at a caller-supplied
 * timestamp (`predict_linear(series, horizon)`). `slope` is per
 * MILLISECOND (the model's native ts unit); callers wanting per-second
 * rates multiply by 1e3.
 *
 * Degenerate series are dropped, mirroring PromQL semantics: fewer
 * than 2 samples, or all samples on one timestamp (vertical line —
 * `regr_slope` yields NULL) define no trend.
 */
object Trend {

  /** `(series, n_samples, slope, intercept, predicted)` with
    * `predicted` the fitted line at `predictAtMs` and `intercept` its
    * epoch-0 value (PromQL `predict_linear` semantics).
    *
    * CONDITIONING (round 15): the regression runs on `ts − x0` with
    * `x0 = fromMs` (query origin), not raw epoch milliseconds.
    * Regressing on x ~ 1.7e12 makes the engines' independently-ordered
    * moment sums cancel catastrophically — the measured cross-engine
    * intercept wobble was 4e-8 ABSOLUTE (4% of the driver's round-6
    * canonicalization grid; one DuckDB build change from a hash flip).
    * The slope is shift-invariant, the origin value `b0` is O(1)-
    * magnitude and tight, and the epoch intercept/forecast are single
    * well-conditioned affine steps from them (wobble ~1e-12 measured
    * after the shift). No round-9 here: these are full-mantissa
    * generics, and a 1e4-magnitude value's 9th decimal sits near the
    * ulp where decimal-round implementations disagree (PLANS.md
    * round-9 table, rule 4 exception). */
  def fit(
      samples: DataFrame, predictAtMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val x0 = fromMs.getOrElse(0L)
    s.groupBy(col("series"))
      .agg(
        regr_count(col("value"), col("ts") - x0).as("n_samples"),
        regr_slope(col("value"), col("ts") - x0).as("slope"),
        regr_intercept(col("value"), col("ts") - x0).as("b0"))
      .filter(col("slope").isNotNull)
      .select(col("series"), col("n_samples"), col("slope"),
        (col("b0") - col("slope") * x0).as("intercept"),
        (col("slope") * (predictAtMs - x0) + col("b0")).as("predicted"))
  }

  /**
   * Per-series autocorrelation at row-lags 1..`maxLag` — the
   * seasonality/persistence diagnostic (an ACF spike at lag 7 on
   * daily buckets = weekly cycle). Row-lag (k samples back), the
   * standard definition for regularly-bucketed series; irregular
   * series should be bucketed or [[Resample]]d first.
   *
   * Plan: `maxLag` lag windows share ONE exchange+sort by series,
   * then one hash agg computes every lag's Pearson `corr` in a single
   * pass (corr's moments are associative — map-side combined).
   * Degenerate lags (fewer than 2 overlapping pairs, or a constant
   * overlap window) yield NULL corr and are dropped.
   */
  def acf(
      samples: DataFrame, maxLag: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(maxLag >= 1, s"maxLag $maxLag must be >= 1")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("series")).orderBy(col("ts"), col("value"))
    val lagged = (1 to maxLag).foldLeft(s) { (df, k) =>
      df.withColumn(s"lag$k", lag(col("value"), k).over(w))
    }
    // Pearson from guarded moments instead of corr(): under ANSI mode
    // Spark's corr THROWS Divide-by-zero on a zero-variance overlap
    // (DuckDB's returns NULL); moments aggregate NULL-safely and the
    // division is gated in the projection. x is masked to the PAIRED
    // rows so its stddev matches the restriction corr applies.
    val aggs = (1 to maxLag).flatMap { k =>
      val x = when(col(s"lag$k").isNotNull, col("value"))
      Seq(covar_pop(x, col(s"lag$k")).as(s"cov$k"),
        stddev_pop(x).as(s"sx$k"),
        stddev_pop(col(s"lag$k")).as(s"sy$k"))
    }
    val wide = lagged.groupBy(col("series")).agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array((1 to maxLag).map(k =>
      struct(lit(k).as("lag"),
        round(when(col(s"sx$k") > 0 && col(s"sy$k") > 0,
          col(s"cov$k") / (col(s"sx$k") * col(s"sy$k"))), 9).as("acf_value"))): _*)).as("s")
    wide.select(col("series"), stacked)
      .select(col("series"), col("s.lag"), col("s.acf_value"))
      .filter(col("acf_value").isNotNull && !isnan(col("acf_value")))
  }

  def acfSql(
      maxLag: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val lagCols = (1 to maxLag).map(k =>
      s"lag(value, $k) OVER (PARTITION BY series ORDER BY ts, value) AS lag$k")
      .mkString(",\n    ")
    val unions = (1 to maxLag).map(k =>
      s"SELECT series, $k AS lag, round(corr(value, lag$k), 9) AS acf_value FROM lagged GROUP BY series")
      .mkString("\nUNION ALL\n")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), lagged AS (
       |  SELECT series, ts, value,
       |    $lagCols
       |  FROM f
       |)
       |SELECT * FROM ($unions)
       |WHERE acf_value IS NOT NULL AND NOT isnan(acf_value)""".stripMargin
  }

  /**
   * Theil-Sen ROBUST trend over the bucket grid — the median of all
   * pairwise slopes (Theil 1950 / Sen 1968), with intercept =
   * median(v − slope·x). Breakdown point ~29%: a burst of outlier
   * buckets that drags [[fit]]'s OLS line leaves this one untouched —
   * the robust complement the reference lacks entirely.
   *
   * x is the bucket INDEX (bucket − min bucket)/bucketMs, not epoch
   * ms: slopes are per-bucket-step and O(1) magnitude.
   *
   * Hash stability: the grid averages are round-9 PINNED (absorbing
   * the engines' different summation orders onto one decimal grid),
   * and everything downstream — pair slope quotients, median
   * interpolation (avg of the two middle elements), residuals — is a
   * fixed chain of correctly-rounded IEEE ops over those pinned
   * values, so slope/intercept are bit-identical across engines BY
   * CONSTRUCTION and are emitted UNROUNDED. A final round-9 here
   * would be the r14 histogram-quantile bug all over again: slopes
   * are (9-decimal rational)/(small integer) quotients, which land ON
   * exact decimal halves often (e.g. odd 9th digit over xdiff 2), and
   * decimal rounding of exact halves is implementation-defined across
   * engines/builds (HALF_UP vs float-multiply vs rint-to-even).
   *
   * Plan shape: ONE scan → ONE grid agg (round-9 bucket averages) →
   * min-bucket analytic window (same exchange class) → pair self-join
   * on series (x_a < x_b) → one median agg per series → broadcast-
   * sized join back onto the grid (one row per series) → one median
   * residual agg. The pair join is quadratic ONLY in the query's grid
   * (range/bucket rows per series — the corr-matrix family contract);
   * nothing scales with raw sample count past the grid agg. Exact
   * medians on the pair frame are a deliberate query-bounded cost —
   * at production grids the caller widens bucketMs, same contract as
   * the DTW/profile families.
   *
   * Output: `(series, slope, intercept, n_grid, n_pairs)`; series
   * with fewer than 2 grid buckets define no trend and drop.
   */
  def theilSen(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(bucketMs > 0, s"bucketMs $bucketMs must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("series"))
    // The pair stage below is quadratic in the grid, and every stage
    // from the window on is keyed by series — but the grid is a few
    // hundred KB, so AQE coalesces the series exchange to ONE partition
    // and the whole pair/median chain runs as sequential single-task
    // stages (measured r18: 6 jobs × 1 task each). A PINNED keyed
    // repartition (REPARTITION_BY_NUM is exempt from AQE coalescing —
    // the Fanout finding, guide §2.5) feeds the window, the self-join,
    // and both median aggs from the same exchange, so the quadratic
    // work spreads across the session at every scale while adding no
    // exchange the window did not already require.
    val slots = samples.sparkSession.sparkContext.defaultParallelism
    val gx = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(round(avg(col("value")), 9).as("v"))
      .repartition(slots, col("series"))
      .withColumn("x",
        ((col("bucket") - min(col("bucket")).over(w)) / bucketMs).cast("double"))
    val a = gx.select(col("series"), col("x").as("xa"), col("v").as("va"))
    val b = gx.select(col("series"), col("x").as("xb"), col("v").as("vb"))
    // xa < xb guarantees a nonzero divisor (buckets are distinct)
    val slopes = a.join(b, Seq("series"))
      .filter(col("xa") < col("xb"))
      .groupBy(col("series"))
      .agg(percentile(
          (col("vb") - col("va")) / (col("xb") - col("xa")), lit(0.5))
          .as("slope"),
        count(lit(1)).as("n_pairs"))
    gx.join(broadcast(slopes), Seq("series"))
      .groupBy(col("series"), col("slope"), col("n_pairs"))
      .agg(percentile(col("v") - col("slope") * col("x"), lit(0.5))
          .as("intercept"),
        count(lit(1)).as("n_grid"))
      .select(col("series"), col("slope"), col("intercept"),
        col("n_grid"), col("n_pairs"))
  }

  /** DuckDB oracle twin of [[theilSen]] (`median` = quantile_cont 0.5,
    * the same interpolated midpoint as Spark's `percentile`). */
  def theilSenSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), g AS (
       |  SELECT series, ${TSModel.bucketStartSql("ts", bucketMs, alignMs)} AS bucket,
       |    round(avg(value), 9) AS v
       |  FROM f GROUP BY 1, 2
       |), gx AS (
       |  SELECT series, v,
       |    CAST((bucket - min(bucket) OVER (PARTITION BY series)) / $bucketMs AS DOUBLE) AS x
       |  FROM g
       |), sl AS (
       |  SELECT a.series,
       |    median((b.v - a.v) / (b.x - a.x)) AS slope,
       |    count(*) AS n_pairs
       |  FROM gx a JOIN gx b ON a.series = b.series AND a.x < b.x
       |  GROUP BY 1
       |)
       |SELECT g.series, sl.slope,
       |  median(g.v - sl.slope * g.x) AS intercept,
       |  count(*) AS n_grid, sl.n_pairs
       |FROM gx g JOIN sl ON g.series = sl.series
       |GROUP BY g.series, sl.slope, sl.n_pairs""".stripMargin
  }

  def fitSql(
      predictAtMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val x0 = fromMs.getOrElse(0L)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), fit AS (
       |  SELECT series,
       |    CAST(regr_count(value, ts - $x0) AS BIGINT) AS n_samples,
       |    regr_slope(value, ts - $x0) AS slope,
       |    regr_intercept(value, ts - $x0) AS b0
       |  FROM f GROUP BY series
       |)
       |SELECT series, n_samples, slope,
       |  b0 - slope * $x0 AS intercept,
       |  slope * ($predictAtMs - $x0) + b0 AS predicted
       |FROM fit WHERE slope IS NOT NULL""".stripMargin
  }
}
