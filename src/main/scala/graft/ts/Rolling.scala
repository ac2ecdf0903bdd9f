package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rolling-window order statistics — beyond-the-reference extension:
 * the trailing-N-samples quantile (`p99 over the last 100 points`),
 * the smoothing/alerting primitive between a global percentile (too
 * slow to adapt) and a single sample (too noisy).
 *
 * Exact linear-interpolated quantile (the `percentile` /
 * `quantile_cont` definition: rank p·(n−1) over the sorted window)
 * computed with higher-order functions on a bounded ROWS frame:
 * `collect_list` over the trailing `span` samples, `array_sort`, then
 * interpolation arithmetic between the two bracketing order
 * statistics. Everything sits above ONE shuffle by series; per-row
 * state is the `span`-bounded window — constant memory, the same
 * scale contract as [[Smoothing]].
 *
 * The DuckDB oracle computes the identical expression over the same
 * frame (`list_sort` + the same interpolation), so the randomized
 * differential covers the interpolation arithmetic itself.
 */
object Rolling {

  /** `(series, ts, value, rq_value)`: the q-quantile of each sample's
    * trailing `span`-sample window (the sample itself included). */
  def rollingQuantile(
      samples: DataFrame, q: Double, span: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile $q outside [0, 1]")
    require(span > 0, s"span $span must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val sorted = array_sort(collect_list(col("value")).over(w))
    // rank r = q*(n-1); interpolate sorted[lo] .. sorted[lo+1]
    val n = size(sorted)
    val r = lit(q) * (n - 1).cast("double")
    val lo = floor(r).cast("int")
    val frac = r - lo.cast("double")
    val vLo = element_at(sorted, lo + 1)
    val vHi = element_at(sorted, least(lo + 2, n))
    val rq: Column = vLo + frac * (vHi - vLo)
    s.select(col("series"), col("ts"), col("value"), rq.as("rq_value"))
  }

  def rollingQuantileSql(
      q: Double, span: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), framed AS (
       |  SELECT series, ts, value,
       |    list_sort(list(value) OVER (PARTITION BY series ORDER BY ts, value
       |      ROWS BETWEEN ${span - 1} PRECEDING AND CURRENT ROW)) AS sorted
       |  FROM f
       |), ranked AS (
       |  SELECT series, ts, value, sorted,
       |    ($q)::DOUBLE * (len(sorted) - 1) AS r,
       |    CAST(floor(($q)::DOUBLE * (len(sorted) - 1)) AS INT) AS lo
       |  FROM framed
       |)
       |SELECT series, ts, value,
       |  sorted[lo + 1] + (r - lo) * (sorted[least(lo + 2, len(sorted))] - sorted[lo + 1])
       |    AS rq_value
       |FROM ranked""".stripMargin
  }

  /**
   * Per-series winsorization: clip values to the series' [qLo, qHi]
   * exact percentiles — the standard heavy-tail taming step before
   * averaging/regression. Two percentile windows sharing ONE exchange
   * by series (the [[Anomaly.mad]] shape), clip is a projection.
   */
  def winsorize(
      samples: DataFrame, qLo: Double, qHi: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(qLo >= 0 && qHi <= 1 && qLo < qHi, s"bad winsor bounds [$qLo, $qHi]")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series"))
    s.withColumn("clip_lo", percentile(col("value"), lit(qLo)).over(w))
      .withColumn("clip_hi", percentile(col("value"), lit(qHi)).over(w))
      .select(col("series"), col("ts"), col("value"),
        least(greatest(col("value"), col("clip_lo")), col("clip_hi"))
          .as("w_value"))
  }

  def winsorizeSql(
      qLo: Double, qHi: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), clipped AS (
       |  SELECT series, ts, value,
       |    quantile_cont(value, $qLo) OVER (PARTITION BY series) AS clip_lo,
       |    quantile_cont(value, $qHi) OVER (PARTITION BY series) AS clip_hi
       |  FROM f
       |)
       |SELECT series, ts, value,
       |  least(greatest(value, clip_lo), clip_hi) AS w_value
       |FROM clipped""".stripMargin
  }
}
