package graft.ts

import org.apache.spark.sql.DataFrame
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
}
