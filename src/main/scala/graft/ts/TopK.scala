package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-series per-bucket top-k / bottom-k — the PromQL
 * `topk(k, ...)` / `bottomk(k, ...)` selection the reference's MRANGE
 * GROUPBY cannot express (it reduces ALL matched series, never ranks
 * them; SURVEY §2.5).
 *
 * Plan: per-(series, bucket) aggregation (ONE partial/final hash agg),
 * then `rank() OVER (PARTITION BY bucket ORDER BY agg_value)` — the
 * aggregate value ALONE, no series tiebreak, so a tie class straddling
 * the k boundary is admitted whole (a series tiebreak would turn
 * rank() into dense per-row numbering and break that contract) — with
 * a `rank <= k` filter, the exact pattern Spark's optimizer rewrites
 * into `WindowGroupLimit`, which keeps only k rows per bucket on the
 * map side BEFORE the rank exchange. Shuffle volume is therefore
 * O(buckets × k × partitions) worst-case, independent of series
 * cardinality — the scale-correct shape for "top 10 of 10 million
 * series". Ties: `rank` over the aggregate value ALONE (round-9
 * collapsed, so float-sum association noise can't split a tie across
 * engines) — a tie ON the k boundary admits the whole tie class in
 * any engine, the same contract as every percentile cut.
 */
object TopK {

  /** `(bucket, series, agg_value, rnk)` for the k top (or bottom)
    * series per bucket by `agg` ∈ {avg,sum,min,max,count}. */
  def topkSeries(
      samples: DataFrame, k: Int, agg: String, bucketMs: Long,
      alignMs: Long = 0L, bottom: Boolean = false,
      fromMs: Option[Long] = None, toMs: Option[Long] = None): DataFrame = {
    require(k > 0, "k must be positive")
    val aggCol = agg match {
      case "avg"   => avg(col("value"))
      case "sum"   => sum(col("value"))
      case "min"   => min(col("value"))
      case "max"   => max(col("value"))
      case "count" => count(col("value")).cast("double")
      case other   => throw new IllegalArgumentException(
        s"unsupported topk aggregator: $other")
    }
    var s = samples.filter(!isnan(col("value")))
    fromMs.foreach(f => s = s.filter(col("ts") >= f))
    toMs.foreach(t => s = s.filter(col("ts") <= t))
    val perSeries = s.groupBy(col("series"),
        TSModel.bucketStart(col("ts"), bucketMs, alignMs).as("bucket"))
      .agg(round(aggCol, 9).as("agg_value"))
    val ord = if (bottom) col("agg_value").asc else col("agg_value").desc
    val w = Window.partitionBy(col("bucket")).orderBy(ord)
    perSeries.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= k)
      .select(col("bucket"), col("series"), col("agg_value"), col("rnk"))
  }

  /** DuckDB twin. */
  def topkSeriesSql(
      k: Int, agg: String, bucketMs: Long, alignMs: Long = 0L,
      bottom: Boolean = false,
      fromMs: Option[Long] = None, toMs: Option[Long] = None,
      cte: String = TSModel.samplesCte): String = {
    val aggSql = agg match {
      case "count" => "count(value) * 1.0"
      case a @ ("avg" | "sum" | "min" | "max") => s"$a(value)"
      case other => throw new IllegalArgumentException(other)
    }
    val dir = if (bottom) "ASC" else "DESC"
    val bkt = TSModel.bucketStartSql("ts", bucketMs, alignMs)
    val bounds = (fromMs.map(f => s"ts >= $f") ++ toMs.map(t => s"ts <= $t"))
      .mkString(" AND ")
    val where = (Seq("NOT isnan(value)") ++
      (if (bounds.nonEmpty) Seq(bounds) else Nil)).mkString("WHERE ", " AND ", "")
    s"""$cte, f AS (
       |  SELECT * FROM samples $where
       |), per_series AS (
       |  SELECT series, $bkt AS bucket, round($aggSql, 9) AS agg_value
       |  FROM f GROUP BY series, $bkt
       |), ranked AS (
       |  SELECT bucket, series, agg_value,
       |    rank() OVER (PARTITION BY bucket ORDER BY agg_value $dir) AS rnk
       |  FROM per_series
       |)
       |SELECT bucket, series, agg_value, rnk FROM ranked WHERE rnk <= $k"""
      .stripMargin
  }
}
