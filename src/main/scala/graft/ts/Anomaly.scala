package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-series z-score outlier detection — beyond-the-reference
 * extension: flag samples whose value deviates from the series mean
 * by >= `threshold` population standard deviations within the query
 * range.
 *
 * Plan shape: the per-series mean/std are unordered analytic windows
 * (`avg/stddev_pop OVER (PARTITION BY series)`) — ONE shuffle by
 * series, a single pass, no self-join against a grouped aggregate
 * (the naive groupBy+join plan shuffles twice and rescans). Constant
 * series (std = 0) flag nothing — there is no deviation scale.
 */
object Anomaly {

  /** `(series, ts, value, z_value)` for |z| >= threshold. */
  def zscore(
      samples: DataFrame, threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series"))
    s.withColumn("mu", avg(col("value")).over(w))
      .withColumn("sigma", stddev_pop(col("value")).over(w))
      .filter(col("sigma") > 0)
      .withColumn("z_value", (col("value") - col("mu")) / col("sigma"))
      .filter(abs(col("z_value")) >= threshold)
      .select(col("series"), col("ts"), col("value"), col("z_value"))
  }

  def zscoreSql(
      threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), scored AS (
       |  SELECT series, ts, value,
       |    avg(value) OVER (PARTITION BY series) AS mu,
       |    stddev_pop(value) OVER (PARTITION BY series) AS sigma
       |  FROM f
       |)
       |SELECT series, ts, value, (value - mu) / sigma AS z_value
       |FROM scored WHERE sigma > 0 AND abs((value - mu) / sigma) >= $threshold""".stripMargin
  }

  /** Robust (MAD-based) outliers: the modified z-score
    * `0.6745 * |value - median| / MAD` (Iglewicz & Hoaglin's B.3
    * estimator — median-based, so a single extreme sample cannot drag
    * the detection threshold the way it drags mean/stddev in
    * [[zscore]]).
    *
    * Plan shape: both medians are EXACT `percentile(…, 0.5)` analytic
    * windows over `PARTITION BY series` — the second window reuses the
    * first's exchange+sort, so the whole two-pass estimator costs ONE
    * shuffle by series and never joins a grouped aggregate back to the
    * samples. Exact percentile holds one series' values per window
    * partition — at 100 TB the scale escape hatch is the same as
    * [[Quantiles]]: `percentile_approx` (t-digest), same query shape.
    * Constant-majority series (MAD = 0) flag nothing — the estimator
    * has no deviation scale there.
    */
  def mad(
      samples: DataFrame, threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series"))
    s.withColumn("med", percentile(col("value"), lit(0.5)).over(w))
      .withColumn("dev", abs(col("value") - col("med")))
      .withColumn("madv", percentile(col("dev"), lit(0.5)).over(w))
      .filter(col("madv") > 0)
      .withColumn("mad_score", lit(0.6745) * col("dev") / col("madv"))
      .filter(col("mad_score") >= threshold)
      .select(col("series"), col("ts"), col("value"), col("mad_score"))
  }

  /**
   * The doc'd hot-series escape hatch for [[mad]], runnable AND
   * verified: both medians via `percentile_approx` (bounded sketch
   * memory per series instead of the full value multiset), with each
   * sketch result's rank-error contract checked in-engine against the
   * multiset it summarizes (element-of-set + rank within
   * `±n/accuracy ±1` of the median rank). Emits one verdict row per
   * series; the oracle recomputes the series universe exactly and
   * expects TRUE — the tolerance-differential pattern of
   * [[Quantiles.bucketQuantilesApproxChecked]].
   */
  def madApproxChecked(
      samples: DataFrame, accuracy: Int = 1000,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(accuracy > 0)
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val eps = 1.0 / accuracy
    def rankOk(cntLe: Column, cntLt: Column, inSet: Column, n: Column): Column =
      inSet === 1 &&
        cntLe >= lit(0.5 - eps) * n - 1 &&
        cntLt <= lit(0.5 + eps) * n + 1
    val med = s.groupBy(col("series"))
      .agg(expr(s"percentile_approx(value, 0.5, $accuracy)").as("med"))
    val dev = s.join(med, Seq("series"))
      .withColumn("dev", abs(col("value") - col("med")))
    val madv = dev.groupBy(col("series"))
      .agg(expr(s"percentile_approx(dev, 0.5, $accuracy)").as("madv"))
    dev.join(madv, Seq("series"))
      .groupBy(col("series"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") <= col("med"), 1L).otherwise(0L)).as("le_m"),
        sum(when(col("value") < col("med"), 1L).otherwise(0L)).as("lt_m"),
        max(when(col("value") === col("med"), 1).otherwise(0)).as("in_m"),
        sum(when(col("dev") <= col("madv"), 1L).otherwise(0L)).as("le_d"),
        sum(when(col("dev") < col("madv"), 1L).otherwise(0L)).as("lt_d"),
        max(when(col("dev") === col("madv"), 1).otherwise(0)).as("in_d"))
      .select(col("series"), col("n"),
        rankOk(col("le_m"), col("lt_m"), col("in_m"), col("n")).as("med_ok"),
        rankOk(col("le_d"), col("lt_d"), col("in_d"), col("n")).as("mad_ok"))
  }

  /** Oracle twin of [[madApproxChecked]]: exact series universe +
    * the expected verdicts. */
  def madApproxCheckedSql(
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series, count(*) AS n, TRUE AS med_ok, TRUE AS mad_ok
       |FROM f GROUP BY series""".stripMargin
  }

  def madSql(
      threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), med AS (
       |  SELECT series, ts, value,
       |    abs(value - quantile_cont(value, 0.5) OVER (PARTITION BY series)) AS dev
       |  FROM f
       |), scored AS (
       |  SELECT series, ts, value, dev,
       |    quantile_cont(dev, 0.5) OVER (PARTITION BY series) AS madv
       |  FROM med
       |)
       |SELECT series, ts, value, 0.6745 * dev / madv AS mad_score
       |FROM scored WHERE madv > 0 AND 0.6745 * dev / madv >= $threshold""".stripMargin
  }
}
