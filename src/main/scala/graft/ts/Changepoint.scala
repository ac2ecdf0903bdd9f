package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CUSUM change detection — beyond-the-reference extension: the
 * normalized cumulative sum of deviations from the series mean,
 * `S_t = Σ_{i≤t}(x_i − μ) / (σ·√N)`, whose maximum excursion is the
 * classic level-shift statistic (a series with a mean shift at time c
 * ramps |S| up to the shift point and back down; |S| stays near 0
 * under no change). Points with `|S_t| ≥ threshold` localize the
 * shift region.
 *
 * Plan shape: μ, σ and N are UNORDERED analytic windows by series and
 * the running sum is an ordered cumulative frame — all four windows
 * resolve over ONE exchange by series (the unordered windows first,
 * the sort feeds the cumulative one), no groupBy+join rescan, no
 * self-join. Deterministic: the cumulative order is (ts, value), a
 * total order up to interchangeable duplicates.
 */
object Changepoint {

  /** `(series, ts, value, cusum_score)` for |S| ≥ threshold (pass 0
    * to emit every scored point, e.g. for plotting the excursion). */
  def cusum(
      samples: DataFrame, threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val wAll = Window.partitionBy(col("series"))
    val wCum = Window.partitionBy(col("series"))
      .orderBy(col("ts"), col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("mu", avg(col("value")).over(wAll))
      .withColumn("sigma", stddev_pop(col("value")).over(wAll))
      .withColumn("nn", count(lit(1)).over(wAll))
      .filter(col("sigma") > 0)
      .withColumn("cusum_score",
        sum(col("value") - col("mu")).over(wCum) /
          (col("sigma") * sqrt(col("nn"))))
      .filter(abs(col("cusum_score")) >= threshold)
      .select(col("series"), col("ts"), col("value"), col("cusum_score"))
  }

  def cusumSql(
      threshold: Double,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), stats AS (
       |  SELECT series, ts, value,
       |    avg(value)        OVER (PARTITION BY series) AS mu,
       |    stddev_pop(value) OVER (PARTITION BY series) AS sigma,
       |    count(*)          OVER (PARTITION BY series) AS nn
       |  FROM f
       |), scored AS (
       |  SELECT series, ts, value,
       |    sum(value - mu) OVER (PARTITION BY series ORDER BY ts, value
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      / (sigma * sqrt(nn)) AS cusum_score
       |  FROM stats WHERE sigma > 0
       |)
       |SELECT series, ts, value, cusum_score FROM scored
       |WHERE abs(cusum_score) >= $threshold""".stripMargin
  }
}
