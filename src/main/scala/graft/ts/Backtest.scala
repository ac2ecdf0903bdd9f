package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Rolling-origin forecast backtest — the evaluation primitive a
 * forecasting surface needs to be OPERABLE, not just runnable: fit on
 * history up to a split point, forecast `horizon` buckets past it, and
 * score the forecasts against the actuals the model never saw. One
 * row per series: `(series, n_eval, mae, rmse)` — the numbers an
 * alerting/capacity pipeline thresholds before trusting
 * `predict_linear`-style projections.
 *
 * Semantics:
 *  - the series is first regularized to a bucket-mean grid over
 *    [from, to] (the family's downsample-first contract);
 *  - TRAIN = grid buckets <= split, TEST = grid buckets > split;
 *  - the [[Smoothing.holtForecast]] fold runs on the train grid with
 *    stepMs = bucketMs, so forecast timestamps land exactly on bucket
 *    starts; forecasts are scored only against test buckets that
 *    exist (gaps drop on both engines — n_eval reports the coverage);
 *  - mae/rmse round-9 (stacked float reductions, O(value) magnitude).
 *
 * Plan shape: ONE hash agg raw→grid feeds both splits (the train
 * branch's typed per-series fold is the [[Smoothing.holt]] contract —
 * O(n) per series, parallel across series); the score join is
 * per-(series, bucket) with both sides grid-sized; the metric agg is
 * map-side combinable. Nothing touches raw samples twice.
 */
object Backtest {

  def holtBacktest(
      samples: DataFrame, sf: Double, tf: Double,
      splitMs: Long, horizon: Int, bucketMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(horizon >= 1, s"horizon $horizon must be >= 1")
    fromMs.foreach(f => require(f <= splitMs,
      s"split $splitMs before the window start $f"))
    toMs.foreach(t => require(t > splitMs,
      s"split $splitMs at/after the window end $t — nothing to evaluate"))
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("value"))
    val train = grid.filter(col("bucket") <= splitMs)
      .select(col("series"), col("bucket").as("ts"), col("value"))
    val test = grid.filter(col("bucket") > splitMs)
      .select(col("series"), col("bucket").as("forecast_ts"),
        col("value").as("actual"))
    val fc = Smoothing.holtForecast(train, sf, tf, horizon, bucketMs)
    val err = col("forecast_value") - col("actual")
    fc.join(test, Seq("series", "forecast_ts"))
      .groupBy(col("series"))
      .agg(count(lit(1)).as("n_eval"),
        round(avg(abs(err)), 9).as("mae"),
        round(sqrt(avg(err * err)), 9).as("rmse"))
  }

  /** DuckDB twin: [[Smoothing.holtForecastSql]]'s recursive fold over
    * the SAME bucketed train grid (spliced as its samples CTE), scored
    * against the relational test grid. */
  def holtBacktestSql(
      sf: Double, tf: Double, splitMs: Long, horizon: Int, bucketMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bkt = TSModel.bucketStartSql("ts", bucketMs)
    val lo = fromMs.map(f => s" AND ts >= $f").getOrElse("")
    val hi = toMs.map(t => s" AND ts <= $t").getOrElse("")
    // ONE grid CTE, split by BUCKET on both sides (the engine's knife:
    // the bucket containing the split belongs wholly to train) — a
    // raw-ts split would shear the boundary bucket into two partial
    // averages neither engine computes. The raw fixture CTE is renamed
    // so `samples` can be the train slice holtForecastSql folds over
    // (its nested WITH sees the outer grid lexically). The rename is
    // string surgery on the first CTE's name — loudly reject any cte
    // whose head isn't literally `WITH samples AS` (a silent miss
    // would leave `raw` undefined and fail at SQL parse time with a
    // far-from-the-cause error; ADVICE r12).
    require(cte.startsWith("WITH samples AS"),
      s"holtBacktestSql: cte must start with 'WITH samples AS' " +
        s"(got '${cte.take(32)}…') — the train-slice splice renames that CTE")
    val raw = cte.replaceFirst("WITH samples AS", "WITH raw AS")
    val trainCte =
      s"""WITH samples AS (
         |  SELECT * FROM grid WHERE ts <= $splitMs
         |)""".stripMargin
    s"""$raw, grid AS (
       |  SELECT series, $bkt AS ts, avg(value) AS value
       |  FROM raw WHERE NOT isnan(value)$lo$hi
       |  GROUP BY 1, 2
       |), fc AS (
       |${Smoothing.holtForecastSql(sf, tf, horizon, bucketMs, cte = trainCte)}
       |), test AS (
       |  SELECT series, ts AS forecast_ts, value AS actual
       |  FROM grid WHERE ts > $splitMs
       |)
       |SELECT f.series, CAST(count(*) AS BIGINT) AS n_eval,
       |  round(avg(abs(f.forecast_value - t.actual)), 9) AS mae,
       |  round(sqrt(avg((f.forecast_value - t.actual) * (f.forecast_value - t.actual))), 9) AS rmse
       |FROM fc f JOIN test t USING (series, forecast_ts)
       |GROUP BY f.series""".stripMargin
  }
}
