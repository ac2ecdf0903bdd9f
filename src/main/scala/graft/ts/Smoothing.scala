package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Windowed exponentially-weighted moving average — beyond-the-reference
 * extension (the PromQL/pandas smoothing surface; the reference's
 * aggregator vtable has no EWM, SURVEY §2.4).
 *
 * Semantics: pandas `ewm(alpha, adjust=True)` truncated to the last
 * `span` samples —
 *   `ewma_t = Σ_{i=0..span-1} (1-α)^i · x_{t-i} / Σ_{i} (1-α)^i`
 * (missing leading samples simply shorten the sum; no NaN seeding).
 *
 * A true infinite-history EWMA is a sequential recurrence — the one
 * shape a declarative plan cannot express without a quadratic blowup
 * or numeric overflow tricks. The WINDOWED form is the scale-correct
 * reformulation: `collect_list` over a ROWS frame (bounded to `span`
 * values per row, constant memory) + one `aggregate` fold, all inside
 * a single shuffle by series. The truncation error is bounded by
 * `(1-α)^span` (< 1e-5 for the default span 32 at α = 0.3) — the
 * standard streaming-systems trade, stated rather than hidden.
 *
 * The fold iterates the frame NEWEST-first with multiplicative weight
 * decay, so each row's result is independent of partition boundaries
 * and deterministic.
 */
object Smoothing {

  /** `(series, ts, value, ewma)` for every in-range sample. */
  def ewma(
      samples: DataFrame, alpha: Double, span: Int = 32,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0, 1]")
    require(span > 0, s"span $span must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    // (ts, value) order — the family-wide determinism contract; ts
    // alone leaves the ROWS frame nondeterministic on duplicate ts.
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val decay = 1.0 - alpha
    val fold: Column = aggregate(
      reverse(collect_list(col("value")).over(w)),
      struct(lit(0.0).as("num"), lit(0.0).as("den"), lit(1.0).as("wt")),
      (acc, x) => struct(
        (acc("num") + acc("wt") * x).as("num"),
        (acc("den") + acc("wt")).as("den"),
        (acc("wt") * decay).as("wt")),
      acc => acc("num") / acc("den"))
    s.select(col("series"), col("ts"), col("value"), fold.as("ewma"))
  }

  /** Oracle twin: the same truncated-weight sum as an O(span)
    * self-join on per-series row numbers (no list fold needed in
    * SQL; `power` vs the fold's running product agree well inside
    * the compare tolerance). */
  def ewmaSql(
      alpha: Double, span: Int = 32,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val decay = 1.0 - alpha
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), rn AS (
       |  SELECT series, ts, value,
       |    row_number() OVER (PARTITION BY series ORDER BY ts, value) AS rn
       |  FROM f
       |)
       |SELECT a.series, a.ts, a.value,
       |  sum(power(($decay)::DOUBLE, a.rn - b.rn) * b.value)
       |    / sum(power(($decay)::DOUBLE, a.rn - b.rn)) AS ewma
       |FROM rn a JOIN rn b
       |  ON a.series = b.series AND b.rn <= a.rn AND b.rn > a.rn - $span
       |GROUP BY a.series, a.ts, a.value""".stripMargin
  }

  /**
   * Holt double-exponential smoothing (the PromQL `holt_winters`
   * trend-aware variant): per series, in (ts, value) order,
   *
   *   s_1 = v_1,  b_1 = v_2 - v_1   (b_1 = 0 for a 1-sample series)
   *   s_i = sf·v_i + (1-sf)·(s_{i-1} + b_{i-1})
   *   b_i = tf·(s_i - s_{i-1}) + (1-tf)·b_{i-1}
   *
   * Unlike [[ewma]]'s weight sum this recurrence has no truncated
   * window form (the trend term couples every prefix), so the
   * SCALE-CORRECT expression is a per-series sequential scan: ONE
   * shuffle by series (typed groupByKey), then an O(n) in-memory loop
   * emitting every step's (level, trend) — with the declared contract
   * that one series' in-range samples fit an executor (the same
   * contract as the exact-percentile windows; longer histories
   * downsample first — compaction rules exist for exactly that).
   * A typed scan, not a Catalyst `aggregate` fold: SQL lambdas can
   * only APPEND per-step output to the accumulator array, which
   * copies it every step — O(n²) per series — and no higher-order
   * primitive does a stateful scan; the imperative loop is the honest
   * O(n) shape (the [[graft.pipeline.Multimodal]] precedent). The
   * loop's arithmetic is the recurrence in a fixed sequential order,
   * so results are bit-identical across engines — the DuckDB oracle
   * replays it with a recursive CTE and hash-matches without
   * tolerance games (round-9 is applied on both sides only to keep
   * the compare canonical).
   */
  def holt(
      samples: DataFrame, sf: Double, tf: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(sf > 0 && sf < 1, s"sf $sf outside (0, 1)")
    require(tf > 0 && tf < 1, s"tf $tf outside (0, 1)")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val omsf = 1 - sf
    val omtf = 1 - tf
    s.select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (series, it) =>
        // (ts, value) order — the family-wide determinism contract
        val arr = it.map(r => (r._2, r._3)).toArray.sorted
        val out = new Array[(String, Long, Double, Double)](arr.length)
        if (arr.nonEmpty) {
          var level = arr(0)._2
          var trend = if (arr.length > 1) arr(1)._2 - arr(0)._2 else 0.0
          out(0) = (series, arr(0)._1, level, trend)
          var i = 1
          while (i < arr.length) {
            val nl = sf * arr(i)._2 + omsf * (level + trend)
            val nt = tf * (nl - level) + omtf * trend
            level = nl
            trend = nt
            out(i) = (series, arr(i)._1, level, trend)
            i += 1
          }
        }
        out.iterator
      }
      .toDF("series", "ts", "hw_level", "hw_trend")
      .select(col("series"), col("ts"),
        col("hw_level"), col("hw_trend"))
  }

  /** Oracle twin: the recurrence as a recursive CTE over per-series
    * row numbers — step-for-step the same arithmetic. */
  def holtSql(
      sf: Double, tf: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    // WITH RECURSIVE must lead the statement; samplesCte is itself a
    // WITH, so splice RECURSIVE into its head.
    val rec = cte.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$rec, f AS (
       |  SELECT * FROM samples $where
       |), ord AS (
       |  SELECT series, ts, value,
       |    row_number() OVER (PARTITION BY series ORDER BY ts, value) AS rn
       |  FROM f
       |), hw AS (
       |  SELECT o1.series, o1.ts, o1.rn,
       |    CAST(o1.value AS DOUBLE) AS level,
       |    CAST(coalesce(o2.value - o1.value, 0.0) AS DOUBLE) AS trend
       |  FROM ord o1 LEFT JOIN ord o2
       |    ON o2.series = o1.series AND o2.rn = 2
       |  WHERE o1.rn = 1
       |  UNION ALL
       |  SELECT o.series, o.ts, o.rn,
       |    $sf * o.value + ${1 - sf} * (h.level + h.trend),
       |    $tf * (($sf * o.value + ${1 - sf} * (h.level + h.trend)) - h.level)
       |      + ${1 - tf} * h.trend
       |  FROM hw h JOIN ord o ON o.series = h.series AND o.rn = h.rn + 1
       |)
       |SELECT series, ts, level AS hw_level,
       |  trend AS hw_trend
       |FROM hw""".stripMargin
  }

  /**
   * Holt-Winters ADDITIVE triple exponential smoothing — [[holt]]
   * plus a seasonal component of period `m` samples. Per series, in
   * (ts, value) order with 1-based position p and seasonal slot
   * si = (p−1) mod m:
   *
   *   L_p = α·(v_p − S[si]) + (1−α)·(L_{p−1} + T_{p−1})
   *   T_p = β·(L_p − L_{p−1}) + (1−β)·T_{p−1}
   *   S[si] ← γ·(v_p − L_p) + (1−γ)·S[si]
   *
   * Deterministic init (replayable, no heuristic pre-season fit):
   * L_0 = v_1, T_0 = 0, S = 0⃗ — under which the general update leaves
   * sample 1 at exactly (v_1, 0, 0), so EVERY sample takes the same
   * recurrence step. Like [[holt]] this has no windowed form (level,
   * trend and m seasonal slots couple every prefix), so the
   * scale-correct expression is the same per-series O(n) typed scan:
   * one shuffle by series, state = 2 + m doubles, arithmetic in a
   * fixed order — the DuckDB oracle replays it as a recursive CTE
   * carrying the seasonal slots as a DOUBLE[] column and hash-matches.
   */
  def holtWinters(
      samples: DataFrame, alpha: Double, beta: Double, gamma: Double,
      m: Int, fromMs: Option[Long] = None,
      toMs: Option[Long] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha $alpha outside (0, 1)")
    require(beta > 0 && beta < 1, s"beta $beta outside (0, 1)")
    require(gamma > 0 && gamma < 1, s"gamma $gamma outside (0, 1)")
    require(m >= 1, s"season length $m must be >= 1")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val oma = 1 - alpha
    val omb = 1 - beta
    val omg = 1 - gamma
    s.select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (series, it) =>
        val arr = it.map(r => (r._2, r._3)).toArray.sorted
        val out =
          new Array[(String, Long, Double, Double, Double)](arr.length)
        if (arr.nonEmpty) {
          var level = arr(0)._2
          var trend = 0.0
          val seas = new Array[Double](m)
          out(0) = (series, arr(0)._1, level, 0.0, 0.0)
          var i = 1
          while (i < arr.length) {
            val v = arr(i)._2
            val slot = i % m // sample at 1-based pos p: (p-1) mod m
            val si = seas(slot)
            val nl = alpha * (v - si) + oma * (level + trend)
            val nt = beta * (nl - level) + omb * trend
            val ns = gamma * (v - nl) + omg * si
            level = nl
            trend = nt
            seas(slot) = ns
            out(i) = (series, arr(i)._1, nl, nt, ns)
            i += 1
          }
        }
        out.iterator
      }
      .toDF("series", "ts", "hw_level", "hw_trend", "hw_season")
      .select(col("series"), col("ts"),
        col("hw_level"), col("hw_trend"), col("hw_season"))
  }

  /** Oracle twin: the triple recurrence as a recursive CTE whose state
    * row carries the m seasonal slots as a DOUBLE[]. */
  def holtWintersSql(
      alpha: Double, beta: Double, gamma: Double, m: Int,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val rec = cte.replaceFirst("^WITH ", "WITH RECURSIVE ")
    val zeros = Seq.fill(m)("0.0").mkString("[", ", ", "]")
    // sample at rn has 0-based seasonal slot si0 = (rn - 1) % m
    val si = s"h.seas[CAST(((o.rn - 1) % $m) + 1 AS BIGINT)]"
    val L = s"$alpha * (o.value - $si) + ${1 - alpha} * (h.level + h.trend)"
    val T = s"$beta * (($L) - h.level) + ${1 - beta} * h.trend"
    val S = s"$gamma * (o.value - ($L)) + ${1 - gamma} * $si"
    s"""$rec, f AS (
       |  SELECT * FROM samples $where
       |), ord AS (
       |  SELECT series, ts, value,
       |    row_number() OVER (PARTITION BY series ORDER BY ts, value) AS rn
       |  FROM f
       |), hw AS (
       |  SELECT series, ts, rn,
       |    CAST(value AS DOUBLE) AS level,
       |    CAST(0.0 AS DOUBLE) AS trend,
       |    CAST(0.0 AS DOUBLE) AS season,
       |    CAST($zeros AS DOUBLE[]) AS seas
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.series, o.ts, o.rn,
       |    $L, $T, $S,
       |    list_slice(h.seas, 1, (o.rn - 1) % $m)
       |      || [CAST($S AS DOUBLE)]
       |      || list_slice(h.seas, ((o.rn - 1) % $m) + 2, $m)
       |  FROM hw h JOIN ord o ON o.series = h.series AND o.rn = h.rn + 1
       |)
       |SELECT series, ts, level AS hw_level,
       |  trend AS hw_trend, season AS hw_season
       |FROM hw""".stripMargin
  }

  /**
   * Holt linear forecast — the POINT of fitting [[holt]]: project each
   * series `horizon` steps past its last sample,
   * `ŷ(last + h·step) = level_n + h·trend_n` (Holt's linear forecast
   * function), emitting `(series, forecast_ts, step, forecast_value)`.
   *
   * Runs the identical recurrence as [[holt]] in the same per-series
   * typed scan (one shuffle, O(n) per series, same
   * series-fits-an-executor contract) but keeps only the FINAL
   * (level, trend) and emits the `horizon` projected rows — output is
   * series × horizon, independent of history length. The DuckDB
   * oracle replays the recursion, takes the max-rn state row per
   * series (QUALIFY) and cross-joins `generate_series(1, horizon)` —
   * the same arithmetic in the same order, so the projections
   * hash-match.
   */
  def holtForecast(
      samples: DataFrame, sf: Double, tf: Double,
      horizon: Int, stepMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(sf > 0 && sf < 1, s"sf $sf outside (0, 1)")
    require(tf > 0 && tf < 1, s"tf $tf outside (0, 1)")
    require(horizon >= 1, s"horizon $horizon must be >= 1")
    require(stepMs > 0, s"step $stepMs must be positive")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val omsf = 1 - sf
    val omtf = 1 - tf
    s.select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (series, it) =>
        val arr = it.map(r => (r._2, r._3)).toArray.sorted
        if (arr.isEmpty) Iterator.empty
        else {
          var level = arr(0)._2
          var trend = if (arr.length > 1) arr(1)._2 - arr(0)._2 else 0.0
          var i = 1
          while (i < arr.length) {
            val nl = sf * arr(i)._2 + omsf * (level + trend)
            val nt = tf * (nl - level) + omtf * trend
            level = nl
            trend = nt
            i += 1
          }
          val lastTs = arr(arr.length - 1)._1
          (1 to horizon).iterator.map { h =>
            (series, lastTs + h * stepMs, h.toLong, level + h * trend)
          }
        }
      }
      .toDF("series", "forecast_ts", "step", "forecast_value")
      .select(col("series"), col("forecast_ts"), col("step"),
        col("forecast_value"))
  }

  /**
   * Holt-Winters additive forecast — [[holtForecast]] with the
   * seasonal component: `ŷ(last + h·step) = L_n + h·T_n +
   * S[(n + h − 1) mod m]` (the slot the h-th future sample would have
   * taken under [[holtWinters]]' 0-based `i mod m` indexing). Same
   * one-shuffle per-series typed scan; state = 2 + m doubles.
   */
  def holtWintersForecast(
      samples: DataFrame, alpha: Double, beta: Double, gamma: Double,
      m: Int, horizon: Int, stepMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha $alpha outside (0, 1)")
    require(beta > 0 && beta < 1, s"beta $beta outside (0, 1)")
    require(gamma > 0 && gamma < 1, s"gamma $gamma outside (0, 1)")
    require(m >= 1, s"season length $m must be >= 1")
    require(horizon >= 1, s"horizon $horizon must be >= 1")
    require(stepMs > 0, s"step $stepMs must be positive")
    val spark = samples.sparkSession
    import spark.implicits._
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val oma = 1 - alpha
    val omb = 1 - beta
    val omg = 1 - gamma
    s.select(col("series"), col("ts"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (series, it) =>
        val arr = it.map(r => (r._2, r._3)).toArray.sorted
        if (arr.isEmpty) Iterator.empty
        else {
          var level = arr(0)._2
          var trend = 0.0
          val seas = new Array[Double](m)
          var i = 1
          while (i < arr.length) {
            val v = arr(i)._2
            val slot = i % m
            val si = seas(slot)
            val nl = alpha * (v - si) + oma * (level + trend)
            val nt = beta * (nl - level) + omb * trend
            seas(slot) = gamma * (v - nl) + omg * si
            level = nl
            trend = nt
            i += 1
          }
          val lastTs = arr(arr.length - 1)._1
          val n = arr.length
          (1 to horizon).iterator.map { h =>
            (series, lastTs + h * stepMs, h.toLong,
              level + h * trend + seas((n + h - 1) % m))
          }
        }
      }
      .toDF("series", "forecast_ts", "step", "forecast_value")
      .select(col("series"), col("forecast_ts"), col("step"),
        col("forecast_value"))
  }

  /** Oracle twin of [[holtWintersForecast]]: the [[holtWintersSql]]
    * recursion's final state row (QUALIFY max rn, seas as a DOUBLE[])
    * projected over `generate_series(1, horizon)`. */
  def holtWintersForecastSql(
      alpha: Double, beta: Double, gamma: Double, m: Int,
      horizon: Int, stepMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val rec = cte.replaceFirst("^WITH ", "WITH RECURSIVE ")
    val zeros = Seq.fill(m)("0.0").mkString("[", ", ", "]")
    val si = s"h.seas[CAST(((o.rn - 1) % $m) + 1 AS BIGINT)]"
    val L = s"$alpha * (o.value - $si) + ${1 - alpha} * (h.level + h.trend)"
    val T = s"$beta * (($L) - h.level) + ${1 - beta} * h.trend"
    val S = s"$gamma * (o.value - ($L)) + ${1 - gamma} * $si"
    s"""$rec, f AS (
       |  SELECT * FROM samples $where
       |), ord AS (
       |  SELECT series, ts, value,
       |    row_number() OVER (PARTITION BY series ORDER BY ts, value) AS rn
       |  FROM f
       |), hw AS (
       |  SELECT series, ts, rn,
       |    CAST(value AS DOUBLE) AS level,
       |    CAST(0.0 AS DOUBLE) AS trend,
       |    CAST($zeros AS DOUBLE[]) AS seas
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.series, o.ts, o.rn,
       |    $L, $T,
       |    list_slice(h.seas, 1, (o.rn - 1) % $m)
       |      || [CAST($S AS DOUBLE)]
       |      || list_slice(h.seas, ((o.rn - 1) % $m) + 2, $m)
       |  FROM hw h JOIN ord o ON o.series = h.series AND o.rn = h.rn + 1
       |), fin AS (
       |  SELECT series, ts, rn, level, trend, seas FROM hw
       |  QUALIFY rn = max(rn) OVER (PARTITION BY series)
       |), steps AS (
       |  SELECT CAST(unnest(generate_series(1, $horizon)) AS BIGINT) AS step
       |)
       |SELECT series, ts + step * $stepMs AS forecast_ts, step,
       |  level + step * trend
       |    + seas[CAST(((rn + step - 1) % $m) + 1 AS BIGINT)]
       |    AS forecast_value
       |FROM fin CROSS JOIN steps""".stripMargin
  }

  /** Oracle twin of [[holtForecast]]: [[holtSql]]'s recursion UNROUNDED,
    * final state row per series via QUALIFY, projected over
    * `generate_series(1, horizon)`. */
  def holtForecastSql(
      sf: Double, tf: Double, horizon: Int, stepMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    val rec = cte.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$rec, f AS (
       |  SELECT * FROM samples $where
       |), ord AS (
       |  SELECT series, ts, value,
       |    row_number() OVER (PARTITION BY series ORDER BY ts, value) AS rn
       |  FROM f
       |), hw AS (
       |  SELECT o1.series, o1.ts, o1.rn,
       |    CAST(o1.value AS DOUBLE) AS level,
       |    CAST(coalesce(o2.value - o1.value, 0.0) AS DOUBLE) AS trend
       |  FROM ord o1 LEFT JOIN ord o2
       |    ON o2.series = o1.series AND o2.rn = 2
       |  WHERE o1.rn = 1
       |  UNION ALL
       |  SELECT o.series, o.ts, o.rn,
       |    $sf * o.value + ${1 - sf} * (h.level + h.trend),
       |    $tf * (($sf * o.value + ${1 - sf} * (h.level + h.trend)) - h.level)
       |      + ${1 - tf} * h.trend
       |  FROM hw h JOIN ord o ON o.series = h.series AND o.rn = h.rn + 1
       |), fin AS (
       |  SELECT series, ts, level, trend FROM hw
       |  QUALIFY rn = max(rn) OVER (PARTITION BY series)
       |), steps AS (
       |  SELECT CAST(unnest(generate_series(1, $horizon)) AS BIGINT) AS step
       |)
       |SELECT series, ts + step * $stepMs AS forecast_ts, step,
       |  level + step * trend AS forecast_value
       |FROM fin CROSS JOIN steps""".stripMargin
  }
}
