package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Counter semantics over bucketed ranges — beyond-the-reference
 * extension (SURVEY §2.8; the PromQL-style rate family every
 * monitoring stack derives from raw counters):
 *
 *  - `delta`:   last(value) - first(value) per bucket (gauge change);
 *  - `rate`:    delta / (last_ts - first_ts) * 1000 per bucket
 *               (per-SECOND rate; NULL when a bucket has < 2 samples
 *               — a zero-width interval has no rate);
 *  - `increase`: sum of positive sample-to-sample diffs per bucket —
 *               monotone-counter growth that survives counter RESETS
 *               (a decrease means the counter restarted; its absolute
 *               level is discarded, per-bucket growth keeps only the
 *               positive steps).
 *
 * delta/rate are pure aggregations (struct-ordered first/last — ONE
 * partial/final hash aggregate, no window). increase needs the
 * previous sample, so it rides a lag window by series; the bucket
 * aggregation reuses the window's exchange (group keys ⊇ partition
 * key), one shuffle total — the [[Sessions]] shape. NaN samples are
 * excluded up front (counter math over NaN would poison whole
 * buckets; the reference's aggregators skip NaN the same way,
 * src/compaction.c AppendValue guards).
 */
object Rates {

  private def clean(samples: DataFrame,
      fromMs: Option[Long], toMs: Option[Long]): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    s
  }

  /** `(series, bucket, delta_value, rate_value)` per non-empty bucket. */
  def deltaRate(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    val s = clean(samples, fromMs, toMs)
    val tv = struct(col("ts").as("t"), col("value").as("v"))
    s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(
        (max(tv).getField("v") - min(tv).getField("v")).as("delta_value"),
        when(max(col("ts")) > min(col("ts")),
          (max(tv).getField("v") - min(tv).getField("v")) * 1000.0 /
            (max(col("ts")) - min(col("ts"))))
          .as("rate_value"))
  }

  /** `(series, bucket, increase_value)`: reset-aware counter growth.
    * The first sample of each series contributes nothing (no previous
    * sample to diff against); a bucket whose samples are all
    * first-or-decreasing reports 0.0. */
  def increase(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    val s = clean(samples, fromMs, toMs)
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
    s.withColumn("d", col("value") - lag(col("value"), 1).over(w))
      .withColumn("step", when(col("d") > 0, col("d")).otherwise(lit(0.0)))
      .groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(sum(col("step")).as("increase_value"))
  }

  private def rangeWhere(fromMs: Option[Long], toMs: Option[Long]): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val nan = "NOT isnan(value)"
    if (bounds.nonEmpty) s"WHERE $nan AND $bounds" else s"WHERE $nan"
  }

  def deltaRateSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples ${rangeWhere(fromMs, toMs)}
       |)
       |SELECT series, $bkt AS bucket,
       |  (max(struct_pack(t := ts, v := value)).v
       |     - min(struct_pack(t := ts, v := value)).v) AS delta_value,
       |  CASE WHEN max(ts) > min(ts) THEN
       |    (max(struct_pack(t := ts, v := value)).v
       |       - min(struct_pack(t := ts, v := value)).v) * 1000.0
       |      / (max(ts) - min(ts))
       |  END AS rate_value
       |FROM f GROUP BY series, $bkt""".stripMargin
  }

  def increaseSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples ${rangeWhere(fromMs, toMs)}
       |), diffed AS (
       |  SELECT series, ts,
       |    value - lag(value) OVER (PARTITION BY series ORDER BY ts, value) AS d
       |  FROM f
       |)
       |SELECT series, $bkt AS bucket,
       |  sum(CASE WHEN d > 0 THEN d ELSE 0.0 END) AS increase_value
       |FROM diffed GROUP BY series, $bkt""".stripMargin
  }

  /** PromQL `resets`: per-bucket count of counter resets — positions
    * where the value DROPS vs its predecessor (a monotone counter
    * restarted). Same lag-window + bucket-agg shape as [[increase]]:
    * one exchange by series, map-side-combined count. The first sample
    * of a series has no predecessor and can't be a reset. */
  def resets(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    val s = clean(samples, fromMs, toMs)
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
    s.withColumn("d", col("value") - lag(col("value"), 1).over(w))
      .groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(sum(when(col("d") < 0, 1L).otherwise(0L)).as("resets_value"))
  }

  /** PromQL `irate`/`idelta`: the INSTANT rate family — per bucket,
    * only the LAST consecutive sample pair matters (the monitoring
    * primitive for fast-moving counters, where a bucket-wide average
    * smears spikes):
    *
    *  - `idelta_value`: last-pair value difference (gauge semantics,
    *    may be negative);
    *  - `irate_value`: per-second rate off the last pair with counter
    *    RESET handling — a drop means the counter restarted, so the
    *    growth since the reset is the current absolute level
    *    (PromQL's extrapolation-free instant rule); NULL when the
    *    pair is zero-width (identical timestamps).
    *
    * A pair belongs to the bucket of its LATER sample (the same
    * attribution rule as [[increase]]/[[resets]]); a bucket holding
    * only a series' first sample has no pair and emits no row.
    *
    * Plan shape: the lag window and the per-bucket argmax aggregate
    * share ONE exchange by series (group keys ⊇ partition key — the
    * [[Sessions]] shape); the argmax is `max(struct(ts, value, dt,
    * d))`, lexicographic in BOTH engines, so an (unlikely) duplicate
    * (ts, value) at the bucket tail still resolves identically. */
  def instant(
      samples: DataFrame, bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    val s = clean(samples, fromMs, toMs)
    val w = Window.partitionBy(col("series")).orderBy(col("ts"), col("value"))
    val last = max(struct(
      col("ts").as("t"), col("value").as("v"),
      col("dt").as("dt"), col("d").as("d")))
    s.withColumn("d", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dt", col("ts") - lag(col("ts"), 1).over(w))
      .filter(col("d").isNotNull)
      .groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(
        last.getField("d").as("idelta_value"),
        when(last.getField("dt") > 0,
          when(last.getField("d") >= 0, last.getField("d"))
            .otherwise(last.getField("v")) * 1000.0 / last.getField("dt"))
          .as("irate_value"))
  }

  def instantSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples ${rangeWhere(fromMs, toMs)}
       |), diffed AS (
       |  SELECT series, ts, value,
       |    value - lag(value) OVER w AS d,
       |    ts    - lag(ts)    OVER w AS dt
       |  FROM f
       |  WINDOW w AS (PARTITION BY series ORDER BY ts, value)
       |), lastpair AS (
       |  SELECT series, $bkt AS bucket,
       |    max(struct_pack(t := ts, v := value, dt := dt, d := d)) AS s
       |  FROM diffed WHERE d IS NOT NULL
       |  GROUP BY series, $bkt
       |)
       |SELECT series, bucket, s.d AS idelta_value,
       |  CASE WHEN s.dt > 0 THEN
       |    (CASE WHEN s.d >= 0 THEN s.d ELSE s.v END) * 1000.0 / s.dt
       |  END AS irate_value
       |FROM lastpair""".stripMargin
  }

  def resetsSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples ${rangeWhere(fromMs, toMs)}
       |), diffed AS (
       |  SELECT series, ts,
       |    value - lag(value) OVER (PARTITION BY series ORDER BY ts, value) AS d
       |  FROM f
       |)
       |SELECT series, $bkt AS bucket,
       |  CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS resets_value
       |FROM diffed GROUP BY series, $bkt""".stripMargin
  }

  /**
   * Multi-window SLO burn-rate alerting (the Google SRE workbook's
   * multiwindow, multi-burn-rate rule): per series, treat `value` as a
   * consumed-budget count, compute the per-second consumption over a
   * LONG trailing window and over the SHORT tail of that window, and
   * alert where BOTH exceed `threshold × budgetPerSec` — the long
   * window proves the burn is significant, the short one proves it is
   * still happening (no alert on a long-resolved incident).
   *
   * Windows ride the [[Sliding]] hop-grid explode: each sample lands
   * in longMs/hopMs hop buckets (a bounded query constant), so the
   * whole computation is ONE map-side-combined aggregation by
   * (series, window) computing both sums — mergeable partials, no
   * ordered window over raw samples, the scalable shape. A window
   * with no samples in the short tail cannot alert (NULL short sum),
   * matching the "still happening" semantics in both engines.
   *
   * Output: `(series, wstart, burn_short, burn_long)` for alerting
   * windows, round-9; window = [wstart, wstart + longMs), short tail
   * = its last shortMs.
   */
  def burnRate(
      samples: DataFrame, shortMs: Long, longMs: Long, hopMs: Long,
      budgetPerSec: Double, threshold: Double, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(shortMs > 0 && shortMs <= longMs,
      s"short window $shortMs must be in (0, longMs=$longMs]")
    require(hopMs > 0 && longMs % hopMs == 0,
      s"long window ($longMs) must be a multiple of hop ($hopMs)")
    require(budgetPerSec > 0, s"budgetPerSec $budgetPerSec must be > 0")
    val s = clean(samples, fromMs, toMs)
    val wmax: Column = TSModel.bucketStart(col("ts"), hopMs, alignMs)
    val wmin: Column =
      TSModel.bucketStart(col("ts") - longMs, hopMs, alignMs) + hopMs
    val burnL = round(sum(col("value")) / (longMs / 1000.0) / budgetPerSec, 9)
    val burnS = round(
      sum(when(col("ts") >= col("wstart") + (longMs - shortMs), col("value")))
        / (shortMs / 1000.0) / budgetPerSec, 9)
    s.select(col("series"), col("ts"), col("value"),
        explode(sequence(wmin, wmax, lit(hopMs))).as("wstart"))
      .groupBy(col("series"), col("wstart"))
      .agg(burnS.as("burn_short"), burnL.as("burn_long"))
      .filter(col("burn_short") >= threshold && col("burn_long") >= threshold)
  }

  /** DuckDB oracle twin of [[burnRate]]. `closedOnly = true`
    * additionally restricts to windows whose end the series' replay
    * has passed (`wstart + longMs <= max(ts)` over the cleaned
    * samples) — the exact output of the streaming twin
    * ([[StreamMonitors.burnSlice]]), which can never see the samples
    * that would close a trailing partial window. */
  def burnRateSql(
      shortMs: Long, longMs: Long, hopMs: Long,
      budgetPerSec: Double, threshold: Double, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte, closedOnly: Boolean = false): String = {
    // guard parity with the Column twin [[burnRate]]
    require(shortMs > 0 && shortMs <= longMs,
      s"shortMs $shortMs must be in (0, longMs=$longMs]")
    require(hopMs > 0 && longMs % hopMs == 0,
      s"hopMs $hopMs must divide longMs $longMs")
    require(budgetPerSec > 0, s"budgetPerSec $budgetPerSec must be > 0")
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val wmax = TSModel.bucketStartSql("ts", hopMs, alignMs)
    val wmin = s"(${TSModel.bucketStartSql(s"(ts - $longMs)", hopMs, alignMs)} + $hopMs)"
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), ex AS (
       |  SELECT series, ts, value, unnest(range($wmin, $wmax + $hopMs, $hopMs)) AS wstart
       |  FROM f
       |), agg AS (
       |  SELECT series, wstart,
       |    round(sum(CASE WHEN ts >= wstart + ${longMs - shortMs} THEN value END)
       |      / ${shortMs / 1000.0} / $budgetPerSec, 9) AS burn_short,
       |    round(sum(value) / ${longMs / 1000.0} / $budgetPerSec, 9) AS burn_long
       |  FROM ex GROUP BY series, wstart
       |)
       |SELECT agg.series, wstart, burn_short, burn_long FROM agg
       |${if (closedOnly)
          s"JOIN (SELECT series, max(ts) AS mx FROM f GROUP BY 1) m ON agg.series = m.series\n" +
          s"WHERE wstart + $longMs <= m.mx AND burn_short >= $threshold AND burn_long >= $threshold"
        else
          s"WHERE burn_short >= $threshold AND burn_long >= $threshold"}""".stripMargin
  }
}
