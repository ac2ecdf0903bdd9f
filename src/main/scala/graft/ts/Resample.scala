package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Linear resampling onto a regular grid — beyond-the-reference
 * extension (the reference only DOWNsamples via bucket aggregation;
 * aligning irregular series onto a common cadence for joins /
 * model-feature matrices needs UPsampling with interpolation).
 *
 * For each series, emit one row per `stepMs`-aligned grid timestamp
 * inside [fromMs, toMs] ∩ [first sample, last sample] (no
 * extrapolation beyond the observed span), with the value linearly
 * interpolated between the bracketing samples (exact sample value
 * when the grid point hits a sample).
 *
 * Plan shape: grid points are generated per series from a grouped
 * min/max (one aggregation), unioned with the samples, and resolved
 * with two frame-bounded analytic windows (last non-null looking
 * back, first non-null looking forward) — everything after the union
 * rides ONE shuffle by series. No join of samples against samples,
 * no per-grid-point probe: the same union trick the EMPTY/LOCF
 * machinery uses ([[TSModel.bucketSpine]]), extended to true
 * interpolation on raw (unbucketed) timestamps.
 */
object Resample {

  /** Smallest grid point >= x: floor(x-1) + step. */
  private def ceilAlign(x: Column, stepMs: Long, alignMs: Long): Column =
    TSModel.bucketStart(x - 1, stepMs, alignMs) + stepMs

  /** `(series, ts, value)` on the step grid. */
  def linear(
      samples: DataFrame, stepMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(stepMs > 0, "step must be positive")
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val grid = s.groupBy(col("series"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .select(col("series"),
        ceilAlign(col("lo"), stepMs, alignMs).as("glo"),
        TSModel.bucketStart(col("hi"), stepMs, alignMs).as("ghi"))
      // a series whose span contains no grid point emits nothing (and
      // an unguarded descending sequence() would throw)
      .filter(col("glo") <= col("ghi"))
      .select(col("series"),
        explode(sequence(col("glo"), col("ghi"), lit(stepMs))).as("ts"))
      .select(col("series"), col("ts"),
        lit(null).cast("double").as("value"), lit(1).as("is_grid"))
    val union = s.select(col("series"), col("ts"), col("value"), lit(0).as("is_grid"))
      .unionByName(grid)
    // samples sort BEFORE a coincident grid point (is_grid breaks the
    // tie), so the backward window sees the sample at ts == grid ts
    val ord = Window.partitionBy(col("series")).orderBy(col("ts"), col("is_grid"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sampleTs = when(col("value").isNotNull, col("ts"))
    union
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(back))
      .withColumn("pt", last(sampleTs, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("value"), ignoreNulls = true).over(fwd))
      .withColumn("nt", first(sampleTs, ignoreNulls = true).over(fwd))
      .filter(col("is_grid") === 1)
      .select(col("series"), col("ts"),
        when(col("pt") === col("ts"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("ts") - col("pt")) / (col("nt") - col("pt")))
          .as("value"))
  }

  def linearSql(
      stepMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val ceilLo = s"(${TSModel.bucketStartSql("(lo - 1)", stepMs, alignMs)} + $stepMs)"
    val floorHi = TSModel.bucketStartSql("hi", stepMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), spans AS (
       |  SELECT series, min(ts) AS lo, max(ts) AS hi FROM f GROUP BY series
       |), grid AS (
       |  SELECT series, unnest(range($ceilLo, $floorHi + $stepMs, ${stepMs}::BIGINT)) AS ts
       |  FROM spans WHERE $ceilLo <= $floorHi
       |), u AS (
       |  SELECT series, ts, value, 0 AS is_grid FROM f
       |  UNION ALL
       |  SELECT series, ts, NULL::DOUBLE AS value, 1 AS is_grid FROM grid
       |), resolved AS (
       |  SELECT series, ts, is_grid,
       |    last_value(value IGNORE NULLS) OVER w_back AS pv,
       |    last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER w_back AS pt,
       |    first_value(value IGNORE NULLS) OVER w_fwd AS nv,
       |    first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS) OVER w_fwd AS nt
       |  FROM u
       |  WINDOW
       |    w_back AS (PARTITION BY series ORDER BY ts, is_grid
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    w_fwd AS (PARTITION BY series ORDER BY ts, is_grid
       |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |)
       |SELECT series, ts,
       |  CASE WHEN pt = ts THEN pv
       |       ELSE pv + (nv - pv) * (ts - pt) / (nt - pt) END AS value
       |FROM resolved WHERE is_grid = 1""".stripMargin
  }
}
