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

  /** Separator for the composite (series, origin) fold key — the fan-out
    * rides [[Smoothing.holtForecast]]'s per-series contract unchanged.
    * Series names must not contain it (control char, absent from every
    * fixture and any sane series naming). */
  private val OriginSep = "\u0001"

  /**
   * MULTI-origin rolling-origin backtest — the real evaluation sweep
   * ([[holtBacktest]] is its k=1 special case): fit at each origin
   * o ∈ `origins`, forecast `horizon` buckets past it, score against
   * the held-out actuals, and report per (series, origin) rows PLUS a
   * pooled per-series row (origin = NULL, the rollup convention) over
   * all origins' scored forecasts — the number that tells you whether
   * the model works across time, not just at one lucky split.
   *
   * Plan shape: STILL one raw→grid hash agg; the per-origin train
   * slices fan out of the same grid through a crossJoin with the
   * broadcast O(|origins|) frame (never a re-scan of raw), the holt
   * fold runs per (series, origin) composite key — |origins|× the fold
   * work, each O(grid) — and the score join + rollup agg are
   * grid-sized. Origins are a bounded literal list (a query choice),
   * so nothing here scales with data volume except the one grid agg.
   */
  def holtBacktestRolling(
      samples: DataFrame, sf: Double, tf: Double,
      origins: Seq[Long], horizon: Int, bucketMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(origins.nonEmpty, "holtBacktestRolling needs at least one origin")
    require(origins.distinct.size == origins.size,
      s"duplicate origins in ${origins.mkString(",")}")
    require(horizon >= 1, s"horizon $horizon must be >= 1")
    origins.foreach { o =>
      fromMs.foreach(f => require(f <= o, s"origin $o before the window start $f"))
      toMs.foreach(t => require(t > o, s"origin $o at/after the window end $t"))
    }
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("value"))
    val originsDf = broadcast(origins.toDF("origin"))
    val train = grid.crossJoin(originsDf)
      .filter(col("bucket") <= col("origin"))
      .select(concat_ws(OriginSep, col("series"), col("origin")).as("series"),
        col("bucket").as("ts"), col("value"))
    val fc = Smoothing.holtForecast(train, sf, tf, horizon, bucketMs)
      .select(
        element_at(split(col("series"), OriginSep), 1).as("series"),
        element_at(split(col("series"), OriginSep), 2).cast("long").as("origin"),
        col("forecast_ts"), col("forecast_value"))
    val test = grid.crossJoin(originsDf)
      .filter(col("bucket") > col("origin"))
      .select(col("series"), col("origin"),
        col("bucket").as("forecast_ts"), col("value").as("actual"))
    val err = col("forecast_value") - col("actual")
    fc.join(test, Seq("series", "origin", "forecast_ts"))
      .rollup(col("series"), col("origin"))
      .agg(count(lit(1)).as("n_eval"),
        round(avg(abs(err)), 9).as("mae"),
        round(sqrt(avg(err * err)), 9).as("rmse"))
      .filter(col("series").isNotNull) // drop the grand-total row
  }

  /** DuckDB twin of [[holtBacktestRolling]]: one grid CTE, a
    * [[Smoothing.holtForecastSql]] recursion PER origin over its train
    * slice, the union scored against the relational per-origin test
    * grid, ROLLUP(series, origin) minus the grand total. */
  def holtBacktestRollingSql(
      sf: Double, tf: Double, origins: Seq[Long], horizon: Int, bucketMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(origins.nonEmpty, "holtBacktestRollingSql needs at least one origin")
    require(cte.startsWith("WITH samples AS"),
      s"holtBacktestRollingSql: cte must start with 'WITH samples AS' " +
        s"(got '${cte.take(32)}…') — the train-slice splice renames that CTE")
    val bkt = TSModel.bucketStartSql("ts", bucketMs)
    val lo = fromMs.map(f => s" AND ts >= $f").getOrElse("")
    val hi = toMs.map(t => s" AND ts <= $t").getOrElse("")
    val raw = cte.replaceFirst("WITH samples AS", "WITH raw AS")
    val fcs = origins.zipWithIndex.map { case (o, i) =>
      val trainCte =
        s"""WITH samples AS (
           |  SELECT * FROM grid WHERE ts <= $o
           |)""".stripMargin
      s"""fc$i AS (
         |${Smoothing.holtForecastSql(sf, tf, horizon, bucketMs, cte = trainCte)}
         |)""".stripMargin
    }.mkString(", ")
    val fcUnion = origins.zipWithIndex.map { case (o, i) =>
      s"SELECT series, forecast_ts, forecast_value, CAST($o AS BIGINT) AS origin FROM fc$i"
    }.mkString("\n  UNION ALL\n  ")
    s"""$raw, grid AS (
       |  SELECT series, $bkt AS ts, avg(value) AS value
       |  FROM raw WHERE NOT isnan(value)$lo$hi
       |  GROUP BY 1, 2
       |), $fcs, fc AS (
       |  $fcUnion
       |), test AS (
       |  SELECT g.series, o.origin, g.ts AS forecast_ts, g.value AS actual
       |  FROM grid g,
       |       (SELECT CAST(unnest([${origins.mkString(", ")}]) AS BIGINT) AS origin) o
       |  WHERE g.ts > o.origin
       |), rolled AS (
       |  SELECT series, origin, CAST(count(*) AS BIGINT) AS n_eval,
       |    round(avg(abs(f.forecast_value - t.actual)), 9) AS mae,
       |    round(sqrt(avg((f.forecast_value - t.actual) * (f.forecast_value - t.actual))), 9) AS rmse
       |  FROM fc f JOIN test t USING (series, origin, forecast_ts)
       |  GROUP BY ROLLUP (series, origin)
       |)
       |SELECT * FROM rolled WHERE series IS NOT NULL""".stripMargin
  }
}
