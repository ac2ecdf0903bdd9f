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

  /**
   * The declared scale escape hatch, runnable AND verified: per-bucket
   * `percentile_approx` (Greenwald–Khanna sketch, bounded memory per
   * group regardless of bucket size — the hot-series path at 100 TB)
   * with its rank-error contract CHECKED IN-ENGINE. The approx result
   * must be an element of the bucket's multiset whose rank sits within
   * `±n/accuracy (±1 slop)` of the target rank; the query emits the
   * boolean verdict per bucket, so the DuckDB oracle (exact bucket
   * recompute + literal TRUE) hash-fails if the sketch ever breaks its
   * bound — a tolerance differential, not a bitwise one (approx vs
   * exact can't bitwise-match by construction).
   *
   * Plan: one agg for (approx, n), one shuffle join back to the bucket
   * rows, one agg for the rank counts — all keyed by (series, bucket).
   */
  def bucketQuantilesApproxChecked(
      samples: DataFrame, q: Double, bucketMs: Long, accuracy: Int = 1000,
      alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(q > 0 && q < 1 && accuracy > 0)
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val keyed = s.select(col("series"),
      TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"),
      col("value"))
    val approx = keyed.groupBy(col("series"), col("bucket"))
      .agg(expr(s"percentile_approx(value, $q, $accuracy)").as("apx"))
    val eps = 1.0 / accuracy
    keyed.join(approx, Seq("series", "bucket"))
      .groupBy(col("series"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") <= col("apx"), 1L).otherwise(0L)).as("cnt_le"),
        sum(when(col("value") < col("apx"), 1L).otherwise(0L)).as("cnt_lt"),
        max(when(col("value") === col("apx"), 1).otherwise(0)).as("in_set"))
      .select(col("series"), col("bucket"), col("n"),
        (col("in_set") === 1 &&
          col("cnt_le") >= lit(q - eps) * col("n") - 1 &&
          col("cnt_lt") <= lit(q + eps) * col("n") + 1).as("rank_ok"))
  }

  /** Oracle twin of [[bucketQuantilesApproxChecked]]: the exact bucket
    * structure + the contract's expected verdict (TRUE everywhere). */
  def bucketQuantilesApproxCheckedSql(
      bucketMs: Long, alignMs: Long = 0L,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++ (if (bounds.nonEmpty) Seq(bounds) else Nil))
      .mkString("WHERE ", " AND ", "")
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |)
       |SELECT series, $bkt AS bucket, count(*) AS n, TRUE AS rank_ok
       |FROM f GROUP BY series, $bkt""".stripMargin
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
