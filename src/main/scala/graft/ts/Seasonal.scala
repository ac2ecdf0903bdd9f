package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Seasonal (time-of-day / day-of-week) baselines and seasonal anomaly
 * scoring — beyond-the-reference extension: the standard monitoring
 * primitive for periodic series, where "is this value anomalous"
 * means "versus this hour's usual behaviour", not versus the global
 * series statistics ([[Anomaly.zscore]] flags every rush hour of a
 * traffic series; this does not).
 *
 * The seasonal key is pure epoch arithmetic (`(ts div 3600000) mod
 * 24` for hour-of-day, `(ts div 86400000 + 3) mod 7` for day-of-week
 * — the +3 maps epoch day 0, a Thursday, to 3 under Monday = 0),
 * identical in the DuckDB oracle and timezone-free by construction
 * (the fixture model keeps everything in epoch ms).
 *
 * Plan shapes:
 *  - [[profile]] is one map-side-combined hash agg by (series, key) —
 *    shuffle volume bounded by series×24 (or ×7), independent of
 *    sample count;
 *  - [[anomaly]] scores each sample against its OWN (series, key)
 *    cohort via unordered analytic windows — ONE shuffle, no
 *    profile-join rescan, the same single-pass shape as
 *    [[Anomaly.zscore]] just with the finer partition key.
 */
object Seasonal {

  val HourMs: Long = 3600000L
  val DayMs: Long = 86400000L

  // floor-division + pmod in BOTH engines: epoch ms < 2^53 are exact
  // doubles, and the non-negative modulo keeps pre-epoch timestamps
  // consistent across engines (Spark % and SQL % are both
  // remainder-of-dividend; pmod normalizes)
  private def seasonKey(mode: String): Column = mode match {
    case "hod" => pmod(floor(col("ts") / HourMs).cast("long"), lit(24L)).as("season")
    case "dow" => pmod(floor(col("ts") / DayMs).cast("long") + 3L, lit(7L)).as("season")
    case other => throw new IllegalArgumentException(
      s"seasonal mode $other (expected hod|dow)")
  }

  private def seasonKeySql(mode: String): String = mode match {
    case "hod" => s"(((CAST(floor(ts / $HourMs) AS BIGINT) % 24) + 24) % 24)"
    case "dow" => s"((((CAST(floor(ts / $DayMs) AS BIGINT) + 3) % 7) + 7) % 7)"
    case other => throw new IllegalArgumentException(
      s"seasonal mode $other (expected hod|dow)")
  }

  /** Samples plus their season column (the streaming scorer stages
    * this so the cohort key rides the stream). */
  private[ts] def withSeason(samples: DataFrame, mode: String): DataFrame =
    samples.withColumn("season", seasonKey(mode))

  /** SQL twin of the key for external oracle builders. */
  private[ts] def seasonKeySqlPublic(mode: String): String = seasonKeySql(mode)

  /** `(series, season, n, mu, sigma)` per non-empty cohort. */
  def profile(
      samples: DataFrame, mode: String = "hod",
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s.groupBy(col("series"), seasonKey(mode))
      .agg(count(lit(1)).as("n"),
        avg(col("value")).as("mu"),
        stddev_pop(col("value")).as("sigma"))
  }

  def profileSql(
      mode: String = "hod",
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series, ${seasonKeySql(mode)} AS season,
       |  count(*) AS n, avg(value) AS mu, stddev_pop(value) AS sigma
       |FROM f GROUP BY 1, 2""".stripMargin
  }

  /** `(series, ts, value, season, s_value)` for samples `threshold`
    * cohort-sigmas from their cohort mean (cohorts need >= `minN`
    * members and sigma > 0 to score). */
  def anomaly(
      samples: DataFrame, threshold: Double, mode: String = "hod",
      minN: Long = 5L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series"), col("season"))
    s.withColumn("season", seasonKey(mode))
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sigma", stddev_pop(col("value")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") >= minN && col("sigma") > 0)
      .withColumn("s_value", (col("value") - col("mu")) / col("sigma"))
      .filter(abs(col("s_value")) >= threshold)
      .select(col("series"), col("ts"), col("value"), col("season"), col("s_value"))
  }

  /** Classical additive seasonal-trend decomposition over the
    * bucket-aggregated series (the textbook "decompose" every TS
    * toolkit ships; STL's simpler ancestor — moving-average trend,
    * cohort-mean seasonal indices normalized to sum zero, additive
    * remainder):
    *
    *  1. regularize: per-(series, bucket) mean value — raw samples are
    *     irregular, decomposition wants a regular grid;
    *  2. trend: centered moving average over `period` CONSECUTIVE
    *     observed buckets (ROWS frame ordered by bucket; `period` must
    *     be odd so the window centers exactly). Edges (and any row
    *     whose frame is not full) have NULL trend — the classical
    *     convention, not an extrapolation;
    *  3. seasonal: per-(series, phase) mean of the detrended values,
    *     re-centered so each series' indices sum to zero over one
    *     period (phase = bucket-index mod period);
    *  4. remainder = value − trend − seasonal (NULL where trend is).
    *
    * Plan shape: ONE hash agg to the bucket grid, the trend window and
    * the bucket frame share one exchange by series, the seasonal
    * index table is a series×period-bounded agg re-attached by a
    * broadcast-sized join, remainder is a projection. Nothing touches
    * raw samples twice.
    */
  def decompose(
      samples: DataFrame, bucketMs: Long, period: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"decompose period must be odd and >= 3, got $period")
    val h = (period - 1) / 2
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs).as("bucket"))
      .agg(avg(col("value")).as("value"))
      .withColumn("phase",
        pmod(floor(col("bucket") / bucketMs).cast("long"), lit(period.toLong)))
    val wMa = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(-h, h)
    val detr = grid
      .withColumn("trend",
        when(count(lit(1)).over(wMa) === period, avg(col("value")).over(wMa)))
      .withColumn("detrended", col("value") - col("trend"))
    val idx = detr.groupBy(col("series"), col("phase"))
      .agg(avg(col("detrended")).as("sr"))
      .withColumn("seasonal",
        col("sr") - avg(col("sr")).over(Window.partitionBy(col("series"))))
      .select(col("series"), col("phase"), col("seasonal"))
    // round-9 on trend/seasonal/remainder (the family convention, as
    // holt/holt-winters do): both legs stack >= 2 float reductions whose
    // accumulation order Spark and DuckDB don't pin, so unrounded output
    // hash-diverges in the last ulp (~1e-14) on large fixtures.
    detr.join(idx, Seq("series", "phase"))
      .withColumn("remainder", col("value") - col("trend") - col("seasonal"))
      .select(col("series"), col("bucket"), col("phase"), col("value"),
        round(col("trend"), 9).as("trend"),
        round(col("seasonal"), 9).as("seasonal"),
        round(col("remainder"), 9).as("remainder"))
  }

  def decomposeSql(
      bucketMs: Long, period: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    require(period >= 3 && period % 2 == 1,
      s"decompose period must be odd and >= 3, got $period")
    val h = (period - 1) / 2
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs)
    s"""$cte, grid AS (
       |  SELECT series, $bkt AS bucket, avg(value) AS value,
       |    ((CAST(floor($bkt / $bucketMs) AS BIGINT) % $period) + $period)
       |      % $period AS phase
       |  FROM samples $where
       |  GROUP BY series, $bkt
       |), detr AS (
       |  SELECT series, bucket, phase, value,
       |    CASE WHEN count(*) OVER w = $period THEN avg(value) OVER w END AS trend
       |  FROM grid
       |  WINDOW w AS (PARTITION BY series ORDER BY bucket
       |    ROWS BETWEEN $h PRECEDING AND $h FOLLOWING)
       |), idx AS (
       |  SELECT series, phase,
       |    avg(value - trend) AS sr
       |  FROM detr GROUP BY series, phase
       |), idx2 AS (
       |  SELECT series, phase,
       |    sr - avg(sr) OVER (PARTITION BY series) AS seasonal
       |  FROM idx
       |)
       |SELECT d.series, d.bucket, d.phase, d.value,
       |  round(d.trend, 9) AS trend, round(i.seasonal, 9) AS seasonal,
       |  round(d.value - d.trend - i.seasonal, 9) AS remainder
       |FROM detr d JOIN idx2 i ON d.series = i.series AND d.phase = i.phase""".stripMargin
  }

  /**
   * Seasonal-ADJUSTED anomaly detection — [[decompose]] composed with
   * a z-score on the REMAINDER: flag grid buckets whose remainder
   * deviates more than `threshold` per-series remainder std-devs from
   * that series' remainder mean. The trend leg absorbs level drift and
   * the seasonal leg absorbs periodic load — the thing that makes a
   * plain [[Anomaly.zscore]] page every rush hour — so what's flagged
   * is genuinely unexplained by the series' own structure. The cohort
   * variant ([[anomaly]]) asks "is this Monday odd vs other Mondays";
   * this asks "is this bucket odd after removing trend AND season" —
   * tighter on short ranges where cohorts are thin.
   *
   * NULL-remainder rows (the centered MA's edge buckets) drop before
   * the stats on both engines; rem_z is round-9 (stats over the
   * already-round-9 remainders, one division on top — the family's
   * stacked-reduction convention) and the threshold compares the
   * ROUNDED score, so the flag set is bit-deterministic cross-engine.
   *
   * Plan shape: [[decompose]]'s one grid agg + bounded joins, then two
   * unordered per-series analytic windows and a projection filter —
   * nothing new touches raw samples.
   */
  def remainderAnomaly(
      samples: DataFrame, bucketMs: Long, period: Int, threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(threshold > 0, s"threshold $threshold must be > 0")
    val dec = decompose(samples, bucketMs, period, fromMs, toMs)
      .filter(col("remainder").isNotNull)
    val w = Window.partitionBy(col("series"))
    dec.withColumn("mu", avg(col("remainder")).over(w))
      .withColumn("sigma", stddev_pop(col("remainder")).over(w))
      .filter(col("sigma") > 0)
      .withColumn("rem_z",
        round((col("remainder") - col("mu")) / col("sigma"), 9))
      .filter(abs(col("rem_z")) >= threshold)
      .select(col("series"), col("bucket"), col("value"),
        col("remainder"), col("rem_z"))
  }

  /** DuckDB twin of [[remainderAnomaly]]: [[decomposeSql]] wrapped in
    * the same remainder-stats windows and rounded-score filter. */
  def remainderAnomalySql(
      bucketMs: Long, period: Int, threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String =
    s"""WITH dec AS (
       |${decomposeSql(bucketMs, period, fromMs, toMs, cte).replace("\n", "\n  ")}
       |), scored AS (
       |  SELECT series, bucket, value, remainder,
       |    avg(remainder) OVER (PARTITION BY series) AS mu,
       |    stddev_pop(remainder) OVER (PARTITION BY series) AS sigma
       |  FROM dec WHERE remainder IS NOT NULL
       |)
       |SELECT series, bucket, value, remainder,
       |  round((remainder - mu) / sigma, 9) AS rem_z
       |FROM scored
       |WHERE sigma > 0
       |  AND abs(round((remainder - mu) / sigma, 9)) >= $threshold""".stripMargin

  def anomalySql(
      threshold: Double, mode: String = "hod", minN: Long = 5L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT series, ts, value, ${seasonKeySql(mode)} AS season
       |  FROM samples $where
       |), scored AS (
       |  SELECT series, ts, value, season,
       |    avg(value)        OVER w AS mu,
       |    stddev_pop(value) OVER w AS sigma,
       |    count(*)          OVER w AS n
       |  FROM f
       |  WINDOW w AS (PARTITION BY series, season)
       |)
       |SELECT series, ts, value, season, (value - mu) / sigma AS s_value
       |FROM scored
       |WHERE n >= $minN AND sigma > 0
       |  AND abs((value - mu) / sigma) >= $threshold""".stripMargin
  }
}
