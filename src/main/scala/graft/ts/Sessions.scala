package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Session-window aggregation — beyond-the-reference extension (SURVEY
 * §2.8: the reference has tumbling buckets only; activity-burst
 * analysis wants gap-based sessions). A session is a maximal run of
 * consecutive samples of one series with inter-arrival gap <=
 * `gapMs`; a gap > gapMs starts a new session.
 *
 * Plan shape: ONE shuffle by series (the analytic window), then the
 * session aggregation reuses the same partitioning (group keys
 * (series, session_id) are a superset of the window partition key, so
 * Catalyst plans a partial+final agg with no second exchange). On the
 * production bucketed-by-series layout ([[TSModel.writeBucketed]])
 * even the first exchange disappears — the scan already satisfies the
 * window's distribution, the same property BucketedLayoutSpec pins
 * for the range family.
 *
 * This is the batch twin of Structured Streaming's
 * `session_window(col, gap)` — restated on the epoch-ms long domain
 * so it composes with the engine's sample model and aggregator
 * vtable.
 */
object Sessions {

  /**
   * Per-series sessions over `[fromMs, toMs]`:
   * `(series, session_start, session_end, n_samples, <agg>_value)`.
   */
  def sessionRange(
      samples: DataFrame, agg: String, gapMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(gapMs > 0, "session gap must be positive")
    var s = samples
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series")).orderBy(col("ts"))
    val newSession = when(
      col("ts") - lag(col("ts"), 1).over(w) > gapMs, 1).otherwise(0)
    s.withColumn("sid",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("series"), col("sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_samples"),
        Aggs.expr(agg, col("value"), col("ts")))
      .drop("sid")
  }

  /**
   * Gap report — the complement of session windows: one row per
   * inter-arrival gap strictly longer than `thresholdMs`, i.e. the
   * outage/ingest-stall surface an operator actually pages on.
   * `(series, gap_start, gap_end, gap_ms)` where gap_start/gap_end are
   * the bracketing sample timestamps.
   *
   * PRESENCE semantics: a NaN sample is still an arrival (the
   * reference stores it; its value is unusable but its timestamp
   * proves the pipe was alive), so unlike the value aggregators
   * nothing is filtered here. Plan: one lag window by series — the
   * same single exchange as [[sessionRange]], with a projection-level
   * filter on top; zero joins, zero extra shuffles.
   */
  def gaps(
      samples: DataFrame, thresholdMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(thresholdMs > 0, "gap threshold must be positive")
    var s = samples
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val w = Window.partitionBy(col("series")).orderBy(col("ts"))
    s.select(col("series"), col("ts"))
      .distinct()  // duplicate timestamps are one arrival for gap purposes
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("ts") - col("prev_ts") > thresholdMs)
      .select(col("series"), col("prev_ts").as("gap_start"),
        col("ts").as("gap_end"),
        (col("ts") - col("prev_ts")).as("gap_ms"))
  }

  /** DuckDB oracle twin of [[gaps]]. */
  def gapsSql(
      thresholdMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = if (bounds.nonEmpty) s"WHERE $bounds" else ""
    s"""$cte, arrivals AS (
       |  SELECT DISTINCT series, ts FROM samples $where
       |), lagged AS (
       |  SELECT series, ts,
       |    lag(ts) OVER (PARTITION BY series ORDER BY ts) AS prev_ts
       |  FROM arrivals
       |)
       |SELECT series, prev_ts AS gap_start, ts AS gap_end,
       |       ts - prev_ts AS gap_ms
       |FROM lagged WHERE ts - prev_ts > $thresholdMs""".stripMargin
  }

  /** DuckDB oracle twin — the same lag/cumsum session assignment. */
  def sessionRangeSql(
      agg: String, gapMs: Long,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = if (bounds.nonEmpty) s"WHERE $bounds" else ""
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), marked AS (
       |  SELECT series, ts, value,
       |    CASE WHEN ts - lag(ts) OVER (PARTITION BY series ORDER BY ts) > $gapMs
       |         THEN 1 ELSE 0 END AS brk
       |  FROM f
       |), sess AS (
       |  SELECT series, ts, value,
       |    sum(brk) OVER (PARTITION BY series ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked
       |)
       |SELECT series, min(ts) AS session_start, max(ts) AS session_end,
       |       count(*) AS n_samples, ${Aggs.sql(agg)}
       |FROM sess GROUP BY series, sid""".stripMargin
  }
}
