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
    * `predicted = slope * predictAtMs + intercept`. */
  def fit(
      samples: DataFrame, predictAtMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s.groupBy(col("series"))
      .agg(
        regr_count(col("value"), col("ts")).as("n_samples"),
        regr_slope(col("value"), col("ts")).as("slope"),
        regr_intercept(col("value"), col("ts")).as("intercept"))
      .filter(col("slope").isNotNull)
      .withColumn("predicted", col("slope") * predictAtMs + col("intercept"))
  }

  def fitSql(
      predictAtMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), fit AS (
       |  SELECT series,
       |    regr_count(value, ts) AS n_samples,
       |    regr_slope(value, ts) AS slope,
       |    regr_intercept(value, ts) AS intercept
       |  FROM f GROUP BY series
       |)
       |SELECT series, n_samples, slope, intercept,
       |  slope * $predictAtMs + intercept AS predicted
       |FROM fit WHERE slope IS NOT NULL""".stripMargin
  }
}
