package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sliding (hopping) window aggregation — a beyond-the-reference
 * extension (the reference's AGGREGATION is tumbling-only, SURVEY
 * §2.8; real monitoring pipelines want rolling rates/averages with a
 * hop finer than the window).
 *
 * Semantics: windows are the hop-aligned intervals
 * `[w, w + windowMs)` for `w ≡ alignMs (mod hopMs)`; a window is
 * emitted iff >= 1 sample of the series falls in it. A sample at `ts`
 * belongs to the `windowMs / hopMs` grid starts in
 * `(ts - windowMs, ts]` — emitted via one `explode(sequence(...))`
 * (row blowup = window/hop, a small constant chosen by the caller),
 * then ONE hash aggregation by (series, window start). No self-join,
 * no per-window rescan: the classic stream-processing replication
 * trick, and exactly how Spark's own `window(col, w, s)` slides —
 * re-expressed here on the epoch-ms long domain so it composes with
 * the engine's aggregator vtable ([[Aggs.expr]]) and alignment rules.
 *
 * Scale: shuffle volume = (window/hop) × samples, partitioned by
 * (series, wstart) with map-side partial aggregation; no driver
 * state. For window/hop ratios beyond ~16 a two-level
 * pre-bucket-then-merge plan would win for the algebraic aggregators
 * — deliberately not taken here, since the ratio is a query literal
 * the caller controls and the non-algebraic aggregators (std/var
 * family) don't merge.
 */
object Sliding {

  /**
   * Per-series sliding aggregation of `agg` over `[fromMs, toMs]`
   * (sample-inclusive bounds, reference RANGE convention). Output:
   * `(series, wstart, <agg>_value)` with one row per non-empty
   * window.
   */
  def slidingRange(
      samples: DataFrame, agg: String,
      windowMs: Long, hopMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(windowMs > 0 && hopMs > 0, "window and hop must be positive")
    require(windowMs % hopMs == 0,
      s"window ($windowMs) must be a multiple of hop ($hopMs)")
    var s = samples
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val wmax: Column = TSModel.bucketStart(col("ts"), hopMs, alignMs)
    val wmin: Column =
      TSModel.bucketStart(col("ts") - windowMs, hopMs, alignMs) + hopMs
    s.select(col("series"), col("ts"), col("value"),
        explode(sequence(wmin, wmax, lit(hopMs))).as("wstart"))
      .groupBy(col("series"), col("wstart"))
      .agg(Aggs.expr(agg, col("value"), col("ts")))
  }

  /** DuckDB oracle twin (`cte` supplies `samples` — the fixture CTE by
    * default, a VALUES CTE in the randomized differential). */
  def slidingRangeSql(
      agg: String, windowMs: Long, hopMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = if (bounds.nonEmpty) s"WHERE $bounds" else ""
    val wmax = TSModel.bucketStartSql("ts", hopMs, alignMs)
    val wmin = s"(${TSModel.bucketStartSql(s"(ts - $windowMs)", hopMs, alignMs)} + $hopMs)"
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), ex AS (
       |  SELECT series, ts, value, unnest(range($wmin, $wmax + $hopMs, $hopMs)) AS wstart
       |  FROM f
       |)
       |SELECT series, wstart, ${Aggs.sql(agg)}
       |FROM ex GROUP BY series, wstart""".stripMargin
  }
}
