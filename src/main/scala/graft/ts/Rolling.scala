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
   * Hampel outlier filter — the standard robust time-series CLEANING
   * primitive (Pearson's rolling-MAD rule): flag samples farther than
   * `k` scaled deviations from their CENTERED rolling-window median,
   * where the scale is the window's own median absolute deviation ×
   * 1.4826 (the Gaussian consistency constant). Versus [[Anomaly.mad]]
   * (global median) this adapts to trend and level shifts; versus a
   * rolling z-score the median/MAD pair survives the outlier being IN
   * the window — an extreme sample cannot mask itself.
   *
   * Plan: ONE exchange by series; the centered ±span frame collects a
   * bounded array per row, and the median/MAD/deviation kernel is the
   * codegen'd [[graft.functions.HampelStats]] expression (the same
   * interpolated-quantile arithmetic as [[rollingQuantile]], run twice
   * in one primitive loop) — per-row cost O(span log span), memory
   * bounded by the QUERY's span. A
   * zero-MAD window (constant majority) flags any deviation, PromQL-
   * style loud semantics, via the `mad = 0 AND |dev| > 0` escape —
   * exactly mirrored in the oracle.
   *
   * Output: flagged rows `(series, ts, value, med, h_score)` with
   * h_score = |value − med| / (1.4826 · mad), round-9 (NULL when
   * mad = 0 — flagged through the escape, score undefined).
   */
  def hampel(
      samples: DataFrame, span: Int, k: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(span >= 1, s"span $span must be >= 1 (window half-width)")
    require(k > 0, s"k $k must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
      .rowsBetween(-span.toLong, span.toLong)
    // the window ARRAY is materialized as a column ONCE (inlining the
    // window expression makes each textual reference its own
    // collect_list window function — measured 10× slower); the per-row
    // median/MAD/deviation kernel is the codegen'd
    // [[graft.functions.HampelStats]] expression — the interpreted
    // array_sort/transform/element_at composition allocates a lambda
    // frame per element and measured ~4× slower at fixture scale,
    // bit-equal results
    val scored = s
      .withColumn("sorted", array_sort(collect_list(col("value")).over(w)))
      .withColumn("hs", graft.functions.HampelStats(col("sorted"), col("value")))
      .withColumn("med", element_at(col("hs"), 1))
      .withColumn("mad", element_at(col("hs"), 2))
      .withColumn("dev", element_at(col("hs"), 3))
    scored
      .filter((col("mad") > 0 && col("dev") > lit(k) * 1.4826 * col("mad")) ||
        (col("mad") === 0 && col("dev") > 0))
      .select(col("series"), col("ts"), col("value"), col("med"),
        when(col("mad") > 0,
          round(col("dev") / (lit(1.4826) * col("mad")), 9)).as("h_score"))
  }

  /** DuckDB oracle twin of [[hampel]] (the same double quantile
    * interpolation over the same centered frame). `closedOnly = true`
    * additionally restricts to rows with ≥ span following rows in
    * their series — the exact output of the streaming twin
    * ([[StreamMonitors.hampelSlice]]), which never sees the future
    * samples a tail row's centered window needs. */
  def hampelSql(
      span: Int, k: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte, closedOnly: Boolean = false): String = {
    // guard parity with the Column twin [[hampel]]
    require(span >= 1, s"span $span must be >= 1 (window half-width)")
    require(k > 0, s"k $k must be positive")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    def sq(arr: String): String = {
      val n = s"len($arr)"
      val r = s"(0.5 * ($n - 1))"
      val lo = s"CAST(floor($r) AS INT)"
      s"($arr[$lo + 1] + ($r - $lo) * ($arr[least($lo + 2, $n)] - $arr[$lo + 1]))"
    }
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), framed AS (
       |  SELECT series, ts, value,
       |    list_sort(list(value) OVER (PARTITION BY series ORDER BY ts, value
       |      ROWS BETWEEN $span PRECEDING AND $span FOLLOWING)) AS sorted,
       |    row_number() OVER (PARTITION BY series ORDER BY ts DESC, value DESC) AS rn_tail
       |  FROM f
       |), meds AS (
       |  SELECT series, ts, value, ${sq("sorted")} AS med, sorted, rn_tail
       |  FROM framed
       |), devs AS (
       |  SELECT series, ts, value, med,
       |    list_sort(list_transform(sorted, v -> abs(v - med))) AS dsorted,
       |    abs(value - med) AS dev, rn_tail
       |  FROM meds
       |), scored AS (
       |  SELECT series, ts, value, med, dev, ${sq("dsorted")} AS mad, rn_tail
       |  FROM devs
       |)
       |SELECT series, ts, value, med,
       |  CASE WHEN mad > 0 THEN round(dev / (1.4826 * mad), 9) END AS h_score
       |FROM scored
       |WHERE ((mad > 0 AND dev > $k * 1.4826 * mad) OR (mad = 0 AND dev > 0))
       |${if (closedOnly) s"  AND rn_tail > $span" else ""}""".stripMargin
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
