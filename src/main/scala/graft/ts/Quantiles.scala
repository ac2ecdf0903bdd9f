package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact bucket quantiles — beyond-the-reference extension (the p50 /
 * p90 / p99 latency surface every monitoring stack derives; the
 * reference's aggregator vtable has no percentile, SURVEY §2.4).
 *
 * Uses Spark's EXACT `percentile` aggregate (linear interpolation at
 * rank p·(n-1), the same definition as DuckDB's `quantile_cont`, so
 * the oracle is a direct function-for-function twin). Exact
 * percentiles hold the bucket's values — memory is per (series,
 * bucket) group, bounded by bucket size, not corpus size; at 100 TB
 * with minute buckets that is thousands of doubles per group. For
 * coarse buckets over very hot series the approximate variant
 * (`percentile_approx`, t-digest, bounded memory) is the scale
 * escape hatch — same query shape, declared accuracy trade.
 *
 * NaN samples are excluded up front (the reference's aggregators skip
 * NaN; a NaN would also poison the sort-based percentile). All-NaN
 * buckets therefore vanish, consistent with [[Rates]].
 */
object Quantiles {

  private def pName(q: Double): String = {
    val scaled = q * 100
    require(scaled == scaled.floor && q > 0 && q < 1,
      s"quantile $q must be a whole percent in (0,1)")
    s"p${scaled.toInt}_value"
  }

  /** `(series, bucket, p<q>_value...)` per non-empty bucket. */
  def bucketQuantiles(
      samples: DataFrame, qs: Seq[Double], bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(qs.nonEmpty)
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val aggs = qs.map(q => expr(s"percentile(value, $q)").as(pName(q)))
    s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def bucketQuantilesSql(
      qs: Seq[Double], bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    val cols = qs.map(q => s"quantile_cont(value, $q) AS ${pName(q)}").mkString(",\n  ")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series, $bkt AS bucket,
       |  $cols
       |FROM f GROUP BY series, $bkt""".stripMargin
  }
}
